"""Pallas TPU kernels for the hot scoring loops.

TPU-native replacement for the reference's SIMD backends
(``lightmotif/src/pli/platform/avx2.rs`` etc.).  The reference couples
its memory layout to the SIMD width (32-lane Farrar striping with AVX2
``permute`` row lookups); here the layout couples to the VPU geometry:

* the flat sequence ``[Lp]`` is viewed as ``[C, rows]`` int8 --
  ``C = 512`` independent chunks on the *sublane* axis, consecutive
  positions along the *lane* axis.  This is a pure reshape: no data
  movement on input or output (the earlier striped-transpose design
  lost 10x to layout copies);
* the kernel grid tiles the lane axis; each step loads its block plus
  the next one as halo.  Chunk boundaries are handled like the
  reference's wrap rows (``seq.rs:369-381``): the final block's halo is
  the *next chunk's head*, obtained by rolling block 0 one sublane up;
* scoring accumulates ``acc += roll(A_j, -j lanes)`` for motif rows
  ``j = 0..m-1``, where ``A_j[p] = w[j, s[p]]`` is an exact K-way
  select from per-symbol masks computed *once* per block on aligned
  data; rolls replace the misaligned slices a naive windowing would
  need.  The adds run in ascending ``j`` order, so each f32 score is
  bit-identical to the reference's sequential sum
  (``pli/mod.rs:96-105``);
* the discrete path accumulates the u8 matrix in f32 (all addends are
  small non-negative integers: every partial sum is exact) and clamps
  to 255 at the end, which equals the reference's stepwise saturating
  add (partial sums are monotone non-decreasing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import xla_ops

__all__ = ["score_f32", "score_u8", "PAD_LANES", "CHUNKS"]

#: Chunks (sublane axis) of the flat layout.  [256 x 2048] measured
#: ~10% faster than [512 x 1024] on v5e (experiments/perf_variants5.out).
CHUNKS = 256

#: Lane-block size (positions per chunk per grid step).
BLOCK_LANES = 2048

#: Flat sequences consumed by these kernels must be padded to a
#: multiple of CHUNKS * BLOCK_LANES.
PAD_LANES = CHUNKS * BLOCK_LANES

#: Set to True (e.g. in tests) to run kernels through the Pallas
#: interpreter on CPU instead of falling back to the XLA ops.
#: NOTE: the flag is captured at trace time -- after flipping it, call
#: ``jax.clear_caches()`` (or use fresh shapes) so cached executables
#: built with the other backend are not silently reused.
INTERPRET = False


def _select_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                   n_scores, block_lanes, chunks, discrete):
    """Scoring kernel over one lane-block of every chunk.

    ``b0``: this block ``[chunks, block_lanes]``; ``b1``: next block
    (index ``(i+1) % grid``), used as halo; for the last block the halo
    is block 0 rolled one chunk up (next chunk's head).
    """
    i = pl.program_id(0)
    w = m - 1  # halo width

    b0 = b0_ref[:].astype(jnp.int32)
    if w:
        # wrap: for the last block the halo is the next chunk's first
        # lanes (roll sublanes up by one); Mosaic rotates need 32-bit.
        halo_src = b1_ref[:, :w].astype(jnp.int32)
        wrapped = pltpu.roll(halo_src, chunks - 1, axis=0)
        is_last = i == grid - 1
        halo = jnp.where(is_last, wrapped, halo_src)
        window = jnp.concatenate([b0, halo], axis=1)
    else:
        window = b0  # [chunks, block_lanes + m - 1]

    # per-symbol masks, computed once, aligned for every motif row
    masks = [window == s for s in range(k - 1)]
    width = block_lanes + w

    def lookup(j):
        val = jnp.full((chunks, width), tab_ref[j, k - 1])
        for s in range(k - 2, -1, -1):
            val = jnp.where(masks[s], tab_ref[j, s], val)
        return val

    # left-to-right accumulation (reference sum order, bit-exact):
    #   acc_j[p] = sum_{t<=j} w[t, s[p+t]]
    # maintained by shifting the *lookup* left by j lanes via repeated
    # single-lane rolls of the accumulated remainder.
    acc = lookup(0)
    for j in range(1, m):
        # acc[p] += A_j[p + j]: roll A_j left by j lanes (pltpu.roll
        # takes non-negative shifts; left-by-j == right-by-(width-j))
        acc = acc + pltpu.roll(lookup(j), width - j, axis=1)

    acc = acc[:, :block_lanes]

    # mask invalid positions: flat position = c * rows + (i*B + lane)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (chunks, block_lanes), 1)
    pos = c_ids * rows + i * block_lanes + l_ids
    if discrete:
        acc = jnp.minimum(acc, 255.0)
        acc = jnp.where(pos < n_scores, acc, -1.0)
        out_ref[:] = acc.astype(jnp.int32)
    else:
        out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("n_scores", "chunks", "block_lanes", "discrete")
)
def _score_chunked(seq, table, n_scores, chunks, block_lanes, discrete):
    m, k = table.shape
    lp = seq.shape[0]
    assert lp % (chunks * block_lanes) == 0
    rows = lp // chunks
    grid = rows // block_lanes
    view = seq.reshape(chunks, rows)  # free: no data movement

    kernel = functools.partial(
        _select_kernel,
        m=m,
        k=k,
        rows=rows,
        grid=grid,
        n_scores=n_scores,
        block_lanes=block_lanes,
        chunks=chunks,
        discrete=discrete,
    )
    out_dtype = jnp.int32 if discrete else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunks, block_lanes), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (chunks, block_lanes),
                lambda i: (0, (i + 1) % grid),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (chunks, block_lanes), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((chunks, rows), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(table, view, view)
    return out.reshape(-1)  # free: layout already flat-contiguous


def preferred_pad() -> int:
    """Sequence pad multiple for the active platform: the Pallas kernel
    geometry on TPU, the smaller XLA tile multiple elsewhere."""
    if INTERPRET or jax.devices()[0].platform in ("tpu", "axon"):
        return PAD_LANES
    return xla_ops.PAD_MULTIPLE


def _supports_pallas(seq, m: int) -> bool:
    if m - 1 > BLOCK_LANES or seq.shape[0] % PAD_LANES:
        return False
    if seq.shape[0] // CHUNKS < m:  # chunks shorter than the motif
        return False
    if INTERPRET:
        return True
    platform = jax.devices()[0].platform
    return platform in ("tpu", "axon")


def score_f32(seq, pssm, n_scores: int):
    """Exact f32 scores of every window start (Pallas on TPU)."""
    if not _supports_pallas(seq, pssm.shape[0]):
        return xla_ops.score_f32(seq, pssm, n_scores)
    return _score_chunked(seq, pssm, n_scores, CHUNKS, BLOCK_LANES, False)


def score_u8(seq, dm, n_scores: int):
    """Saturated discrete scores (== reference u8 scores) as int32."""
    if not _supports_pallas(seq, dm.shape[0]):
        return xla_ops.score_u8(seq, dm, n_scores)
    table = dm.astype(jnp.float32)
    return _score_chunked(seq, table, n_scores, CHUNKS, BLOCK_LANES, True)
