"""Pallas TPU kernels for the hot scoring loops.

TPU-native replacement for the reference's SIMD backends
(``lightmotif/src/pli/platform/avx2.rs`` etc.).  The reference couples
its memory layout to the SIMD width (32-lane Farrar striping with AVX2
``permute`` row lookups); here the layout couples to the VPU geometry:

* the flat sequence ``[Lp]`` is viewed as ``[8, rows]`` int8 -- eight
  independent chunks on the *sublane* axis (one per VREG row),
  consecutive positions along the *lane* axis.  This is a pure
  reshape: no data movement on input or output;
* the kernel grid tiles the lane axis; each step loads its block plus
  the next one as halo.  Chunk boundaries are handled like the
  reference's wrap rows (``seq.rs:369-381``): the final block's halo is
  the *next chunk's head*, obtained by rolling block 0 one sublane up;
* the per-row lookup ``A_j[p] = w[j, s[p]]`` is ONE hardware sublane
  gather (``take_along_axis`` on the 8-row block against a
  lane-broadcast ``[8, 1]`` table column) -- the true TPU analogue of
  AVX2's ``permutevar8x32_ps`` (``avx2.rs:101-199``), +25% over the
  K-way select chain it replaced in round 1 (selects cost 5 ops per
  looked-up value; the gather costs 1, bringing the kernel within ~6%
  of its no-lookup structural ceiling);
* scoring accumulates ``acc += roll(A_j, -j lanes)`` for motif rows
  ``j = 0..m-1``.  The adds run in ascending ``j`` order, so each f32
  score is bit-identical to the reference's sequential sum
  (``pli/mod.rs:96-105``);
* the discrete path accumulates the u8 matrix in f32 (all addends are
  small non-negative integers: every partial sum is exact) and clamps
  to 255 at the end, which equals the reference's stepwise saturating
  add (partial sums are monotone non-decreasing).

Measured on v5e (experiments/g8_verify.out; >=150 ms rep spans,
full-genome bit parity): 29.3-30.3 Gpos/s exact f32 full-genome
scoring vs 24.3 for the round-1 select chain, within ~6% of the ~32
Gpos/s no-lookup skeleton -- the structural ceiling the serial-order
f32 accumulation imposes.
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

#: Chunks (sublane axis) of the flat layout: exactly the 8 VREG rows,
#: so ``take_along_axis`` row gathers are a single hardware op (they
#: are only supported -- and only fast -- on 8-row arrays).
CHUNKS = 8

#: Lane-block size (positions per chunk per grid step).
BLOCK_LANES = 65536

#: Flat sequences consumed by these kernels must be padded to a
#: multiple of CHUNKS * BLOCK_LANES.
PAD_LANES = CHUNKS * BLOCK_LANES

#: Set to True (e.g. in tests) to run kernels through the Pallas
#: interpreter on CPU instead of falling back to the XLA ops.
#: NOTE: the flag is captured at trace time -- after flipping it, call
#: ``jax.clear_caches()`` (or use fresh shapes) so cached executables
#: built with the other backend are not silently reused.
INTERPRET = False


def _gather_kernel(tab_ref, b0_ref, b1_ref, out_ref, *, m, k, rows, grid,
                   n_scores, block_lanes, discrete):
    """Scoring kernel over one lane-block of every chunk.

    ``b0``: this block ``[8, block_lanes]``; ``b1``: next block
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
        wrapped = pltpu.roll(halo_src, CHUNKS - 1, axis=0)
        is_last = i == grid - 1
        halo = jnp.where(is_last, wrapped, halo_src)
        window = jnp.concatenate([b0, halo], axis=1)
    else:
        window = b0  # [8, block_lanes + m - 1]
    width = block_lanes + w
    sub = jax.lax.broadcasted_iota(jnp.int32, (CHUNKS, 1), 0)
    n_groups = -(-k // CHUNKS)  # 1 for DNA (K=5), 3 for protein (K=21)
    if n_groups > 1:
        win_clipped = [
            jnp.clip(window - g * CHUNKS, 0, CHUNKS - 1)
            for g in range(n_groups)
        ]

    def lookup(j):
        # [8, 1] table column per 8-symbol group: row s' holds
        # w[j, g*8 + s'] (out-of-range rows get the wildcard value;
        # clipped indices never select them wrongly thanks to the
        # range test below) -- built with selects on 8 elements, then
        # lane-broadcast.  The gather out[r, l] = col[idx[r, l]] is
        # one op per VREG: the TPU analogue of permutevar8x32.
        def group_col(g):
            col = jnp.full((CHUNKS, 1), tab_ref[j, k - 1])
            for s in range(min(k - 1, (g + 1) * CHUNKS) - 1,
                           g * CHUNKS - 1, -1):
                col = jnp.where(sub == s - g * CHUNKS, tab_ref[j, s], col)
            return jnp.broadcast_to(col, (CHUNKS, width))

        if n_groups == 1:
            return jnp.take_along_axis(group_col(0), window, axis=0)
        val = jnp.take_along_axis(group_col(0), win_clipped[0], axis=0)
        for g in range(1, n_groups):
            vg = jnp.take_along_axis(group_col(g), win_clipped[g], axis=0)
            val = jnp.where(window >= g * CHUNKS, vg, val)
        return val

    # left-to-right accumulation (reference sum order, bit-exact):
    #   acc_j[p] = sum_{t<=j} w[t, s[p+t]]
    acc = lookup(0)
    for j in range(1, m):
        # acc[p] += A_j[p + j]: roll A_j left by j lanes (pltpu.roll
        # takes non-negative shifts; left-by-j == right-by-(width-j))
        acc = acc + pltpu.roll(lookup(j), width - j, axis=1)

    acc = acc[:, :block_lanes]

    # mask invalid positions: flat position = c * rows + (i*B + lane)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNKS, block_lanes), 0)
    l_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNKS, block_lanes), 1)
    pos = c_ids * rows + i * block_lanes + l_ids
    if discrete:
        acc = jnp.minimum(acc, 255.0)
        acc = jnp.where(pos < n_scores, acc, -1.0)
        out_ref[:] = acc.astype(jnp.int32)
    else:
        out_ref[:] = jnp.where(pos < n_scores, acc, -jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("n_scores", "block_lanes", "discrete")
)
def _score_chunked(seq, table, n_scores, block_lanes, discrete):
    m, k = table.shape
    lp = seq.shape[0]
    assert lp % (CHUNKS * block_lanes) == 0
    rows = lp // CHUNKS
    grid = rows // block_lanes
    view = seq.reshape(CHUNKS, rows)  # free: no data movement

    kernel = functools.partial(
        _gather_kernel,
        m=m,
        k=k,
        rows=rows,
        grid=grid,
        n_scores=n_scores,
        block_lanes=block_lanes,
        discrete=discrete,
    )
    out_dtype = jnp.int32 if discrete else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (CHUNKS, block_lanes), lambda i: (0, i),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (CHUNKS, block_lanes),
                lambda i: (0, (i + 1) % grid),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (CHUNKS, block_lanes), lambda i: (0, i),
            memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((CHUNKS, rows), out_dtype),
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


def _auto_block(m: int) -> int:
    """Block width for a motif of ``m`` rows.  The kernel's scoped
    VMEM grows with m x block (Mosaic keeps ~m lookup/roll temporaries
    of one block live; measured ~1.57 MB per row at 65536 lanes --
    m=65 overflowed the 100 MB budget), so long motifs halve the block
    until m x block <= 2^21 (~50 MB scoped).  Every candidate divides
    BLOCK_LANES, so the PAD_LANES geometry keeps working."""
    b = BLOCK_LANES
    while b > 1024 and m * b > (1 << 21):
        b //= 2
    return b


def _supports_pallas(seq, m: int, block_lanes: int) -> bool:
    if m - 1 > block_lanes or seq.shape[0] % (CHUNKS * block_lanes):
        return False
    if seq.shape[0] // CHUNKS < m:  # chunks shorter than the motif
        return False
    if INTERPRET:
        return True
    platform = jax.devices()[0].platform
    return platform in ("tpu", "axon")


def score_f32(seq, pssm, n_scores: int, block_lanes: int | None = None):
    """Exact f32 scores of every window start (Pallas on TPU).

    ``block_lanes`` overrides the grid-block width (default
    :data:`BLOCK_LANES`); interpret-mode tests use small values so the
    kernel's halo/wrap logic runs on tiny shapes without a TPU.
    """
    bl = _auto_block(pssm.shape[0]) if block_lanes is None else block_lanes
    if not _supports_pallas(seq, pssm.shape[0], bl):
        return xla_ops.score_f32(seq, pssm, n_scores)
    return _score_chunked(seq, pssm, n_scores, bl, False)


def score_u8(seq, dm, n_scores: int, block_lanes: int | None = None):
    """Saturated discrete scores (== reference u8 scores) as int32."""
    bl = _auto_block(dm.shape[0]) if block_lanes is None else block_lanes
    if not _supports_pallas(seq, dm.shape[0], bl):
        return xla_ops.score_u8(seq, dm, n_scores)
    table = dm.astype(jnp.float32)
    return _score_chunked(seq, table, n_scores, bl, True)
