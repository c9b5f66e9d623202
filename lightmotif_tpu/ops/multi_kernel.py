"""Pallas-fused multi-motif prefilter (MXU).

The XLA multi-motif path (:mod:`lightmotif_tpu.ops.multi`) materializes
the im2col window matrix ``X[p, j*K+k]`` and the full ``[L, M]`` int32
score matrix in HBM, which caps it near 110 Gpos*motif/s.  This kernel
fuses the whole prefilter:

* the one-hot window matrix is built **in VMEM** per position tile
  (sublane-shifted copies of the one-hot sequence tile, the in-register
  analogue of the reference CLI's per-motif rescans);
* one bf16 MXU matmul scores the tile against every motif at once --
  exact, because one-hot 0/1 and u8 matrix integers are exactly
  representable in bf16 and every partial sum is an integer < 2^24 in
  the f32 accumulator (integer sums are order-independent, unlike the
  f32 scoring path);
* the per-motif threshold comparison and a halfword bit-pack (a second
  tiny matmul against a power-of-two matrix, exact: sums of distinct
  powers of two <= 65535) happen before anything leaves VMEM.

Output is a ``[L, M/16]`` int32 bit matrix -- 32x less HBM traffic than
int32 scores -- from which candidates are extracted sparsely.

Saturation semantics: raw integer sums are compared against the scaled
threshold *unclamped*; for thresholds <= 255 this is equivalent to the
reference's saturating-u8 comparison (min(raw,255) >= t <=> raw >= t),
and thresholds > 255 are mapped to +inf on the host (no u8 score can
pass, ``pwm/mod.rs:781-784``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["prefilter_any", "prefilter_bits", "pack_filters_any",
           "supports_fused", "BITS_PER_WORD", "TILE", "NEG_GUARD"]

#: Motifs per packed output word (halfword packing keeps the bit-pack
#: matmul exact in f32).
BITS_PER_WORD = 16

#: Maximum positions per grid tile (also the segment alignment unit).
#: The transposed-construction sweep measured monotone gains up to
#: 32768 at every M (experiments/multi_opt2.out); prefilter_any picks
#: the largest power-of-two tile whose [m_pad, tile] score block fits
#: the VMEM budget (every choice divides TILE, so alignment holds).
TILE = 32768

#: Contraction size (one MXU pass).
MAX_MK = 128

#: Lanes per motif row in the window layout: lane ``l`` holds
#: ``(j, s) = (l // lanes, l % lanes)`` with lanes = 8 for nucleotide
#: alphabets and 32 for protein (power-of-two groups keep every
#: construction step vreg-aligned -- lane-granular concats crash this
#: Mosaic build).
LANES_PER_ROW = 8
LANES_PER_ROW_WIDE = 32

#: Motif rows per contraction block (128 lanes / lanes-per-row).
ROWS_PER_BLOCK = MAX_MK // LANES_PER_ROW

#: Cap on summed contraction blocks (exact for integer data, order-free).
MAX_BLOCKS = 4

#: Maximum motif length of the fused path for K <= 8.
MAX_M_ROWS = 2 * ROWS_PER_BLOCK


#: Finite stand-in for "+inf threshold" once thresholds fold into the
#: matmul as ``-t`` (0 x inf would make NaNs): larger than any raw
#: integer score sum (<= 64 rows x 255), exactly representable in bf16.
NEG_GUARD = 65536.0


def _lanes_for(k: int) -> int:
    # strictly fewer symbols than lanes: the top slot of group j=0 is
    # the constant-one lane that carries the folded threshold
    return LANES_PER_ROW if k < LANES_PER_ROW else LANES_PER_ROW_WIDE


def pack_filters(dm_stack: np.ndarray, t_scaled: np.ndarray, k: int):
    """Host-side packing for :func:`prefilter_bits`.

    ``dm_stack``: f32 ``[M, m_max, K]`` zero-padded discrete matrices;
    ``t_scaled``: int ``[M]`` scaled thresholds.  Returns
    ``(filters[n_blocks*128, m_pad], t_eff[1, m_pad])`` where padded
    motif slots get ``+inf`` thresholds (never candidates) and
    thresholds above the u8 range map to ``+inf`` (saturating
    semantics, ``pwm/mod.rs:781-784``).
    """
    mcount, m_max, _ = dm_stack.shape
    lanes = _lanes_for(k)
    rpb = MAX_MK // lanes
    m_pad = -(-mcount // BITS_PER_WORD) * BITS_PER_WORD
    n_blocks = -(-m_max // rpb)
    filters = np.zeros((n_blocks * MAX_MK, m_pad), np.float32)
    for j in range(m_max):
        r = (j // rpb) * MAX_MK + (j % rpb) * lanes
        filters[r:r + k, :mcount] = dm_stack[:, j, :].T
    t_eff = np.full((1, m_pad), np.inf, np.float32)
    t_eff[0, :mcount] = np.where(
        np.asarray(t_scaled) > 255, np.inf, t_scaled).astype(np.float32)
    return filters, t_eff


def pack_filters_any(dm_stack: np.ndarray, t_scaled: np.ndarray, k: int):
    """Threshold-folded filters for :func:`prefilter_any`.

    Same layout as :func:`pack_filters`, plus row ``lanes - 1`` (group
    0's top symbol slot, never a real symbol because ``k < lanes``)
    holds ``-t`` per motif, so the MXU emits ``score - t`` directly.
    Thresholds above the u8-saturation range (and padded motif slots)
    fold to ``-NEG_GUARD``: no integer score sum can reach it, matching
    the reference's "no u8 score can pass" semantics
    (``pwm/mod.rs:781-784``).
    """
    filters, t_eff = pack_filters(dm_stack, t_scaled, k)
    lanes = _lanes_for(k)
    t_fin = np.where(np.isfinite(t_eff[0]), t_eff[0], NEG_GUARD)
    filters[lanes - 1, :] = -t_fin
    return filters


def supports_fused(m_max: int, k: int, n_motifs: int) -> bool:
    if k >= LANES_PER_ROW_WIDE or m_max < 2:
        return False
    rpb = MAX_MK // _lanes_for(k)
    if -(-m_max // rpb) > MAX_BLOCKS:
        return False
    from . import kernels

    if kernels.INTERPRET:
        return True
    return jax.devices()[0].platform in ("tpu", "axon")


def _any_kernel(filt_ref, b0_ref, b1_ref, out_ref, *, m_max, k, tile):
    """Candidate prefilter: per-position max over motifs of
    ``score - t`` (threshold folded into the matmul via the
    constant-one slot), written as one int32 per position.

    The windowed one-hot is built TRANSPOSED -- positions on *lanes*,
    (j, s) slots on *sublanes* -- so each motif row's shift is one
    plain lane roll of a ``[lanes, width]`` block, and the blocks
    assemble with stack+reshape (sublane concat crashes Mosaic).  This
    replaced a 4-level binary sublane-shift tree over ``[tile, 128]``
    and measures 7.7x faster at M=128 / 1.5x at M=1024
    (experiments/multi_opt2.out: 535 / 743 Gpos*motif/s).  Compared
    with :func:`_prefilter_kernel` it also skips the [tile, M] mask
    passes and the bit-pack matmul; per-motif bits are recovered
    downstream from a sparse matmul over surviving positions only.
    """
    w = m_max - 1
    lanes = _lanes_for(k)
    rpb = MAX_MK // lanes
    width = tile + w
    s0 = b0_ref[:].astype(jnp.int32)          # [1, tile]
    halo = b1_ref[:, :w].astype(jnp.int32)    # [1, w]: next tile's head
    seq_row = jnp.concatenate([s0, halo], axis=1)  # [1, width]
    base = jnp.broadcast_to(seq_row, (lanes, width))
    sub = jax.lax.broadcasted_iota(jnp.int32, (MAX_MK, 1), 0)
    smap = sub % lanes                 # row (j, s) compares symbol s
    is_const = sub == (lanes - 1)      # block-0 top slot: constant one
    n_blocks = -(-m_max // rpb)
    scores = None
    for b in range(n_blocks):
        blocks = []
        for r in range(rpb):
            j = b * rpb + r
            blocks.append(base if j == 0 else
                          pltpu.roll(base, width - j, axis=1))
        xt = jnp.stack(blocks, axis=0).reshape(MAX_MK, width)
        oh = xt[:, :tile] == smap
        if b == 0:
            # filter row lanes-1 holds -t, so part = scores - t
            oh = oh | is_const
        part = jax.lax.dot_general(
            filt_ref[b * MAX_MK:(b + 1) * MAX_MK, :],
            oh.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [M, tile]
        scores = part if scores is None else scores + part
    out_ref[:] = jnp.max(scores, axis=0, keepdims=True).astype(jnp.int32)


def _tile_for(m_pad: int) -> int:
    """Largest power-of-two tile (<= TILE) keeping the [m_pad, tile]
    f32 score block near 128 MB of VMEM-resident intermediates."""
    budget = 32 * 1024 * 1024  # f32 elements
    tile = TILE
    while tile > 4096 and m_pad * tile > budget:
        tile //= 2
    return tile


@functools.partial(jax.jit, static_argnames=("m_max", "k", "tile"))
def prefilter_any(seq, filters_t, m_max: int, k: int,
                  tile: int | None = None):
    """Per-position ``max_mo (score - t)`` as int32 ``[1, Lp]``.

    ``seq``: int8 ``[Lp]``, ``Lp`` a multiple of :data:`TILE`;
    ``filters_t``: threshold-folded filters from
    :func:`pack_filters_any`.  A position is a candidate for *some*
    motif iff the output is >= 0.  Validity windows (``n_valid``) are
    NOT applied here -- the sparse per-motif stage and the final keep
    filter handle them (tail extras only cost candidate capacity).
    """
    from . import kernels

    lp = seq.shape[0]
    if tile is None:
        tile = _tile_for(filters_t.shape[1])
    assert lp % tile == 0
    grid = lp // tile
    view = seq.reshape(1, lp)
    kernel = functools.partial(_any_kernel, m_max=m_max, k=k, tile=tile)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, (i + 1) % grid),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, lp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=160 * 1024 * 1024,
        ),
        interpret=kernels.INTERPRET,
    )(filters_t.astype(jnp.bfloat16), view, view)


# ---------------------------------------------------------------------------
# Reference formulation: per-motif bit output.  The production path is
# prefilter_any (above) -- this kernel materializes [L, M/16] hit words
# directly and is retained as the independently-testable reference for
# the any+sparse pipeline (tests/test_multi.py::test_prefilter_bits_parity)
# and as the comparison baseline in experiments/.  At M=1024 it runs at
# half the any-kernel's rate (the [tile, M] mask passes plus a bit-pack
# matmul whose 64-word output pads to a full 128-lane MXU pass).
# ---------------------------------------------------------------------------


def _prefilter_kernel(filt_ref, tsc_ref, nval_ref, pow_ref, b0_ref, b1_ref,
                      out_ref, *, m_max, k, tile, grid, n_words):
    i = pl.program_id(0)
    w = m_max - 1

    s0 = b0_ref[:].astype(jnp.int32)          # [tile, 1]
    halo = b1_ref[:w, :].astype(jnp.int32)    # next tile's head
    seq = jnp.concatenate([s0, halo], axis=0)  # [tile + w, 1]

    # windowed one-hot X[t, j*8 + s] = (seq[t + j] == s), built from
    # vreg-aligned ops only: broadcast the sequence column across all
    # lanes, then compose the per-lane-group sublane shift j = lane//8
    # from its binary digits (log2 passes; lane-granular concats and
    # strided rolls crash this Mosaic build).  Motifs longer than 16
    # rows use extra contraction blocks shifted 16 further each --
    # summed matmuls stay exact (integer data, order-free).
    rows = tile + w
    lanes = _lanes_for(k)
    rpb = MAX_MK // lanes
    base = jnp.broadcast_to(seq, (rows, MAX_MK))
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, MAX_MK), 1)
    group = lane // lanes
    smap = jax.lax.broadcasted_iota(jnp.int32, (tile, MAX_MK), 1) % lanes
    n_blocks = -(-m_max // rpb)
    scores = None
    for b in range(n_blocks):
        block_base = base if b == 0 else pltpu.roll(
            base, rows - b * rpb, 0)
        rows_here = min(m_max - b * rpb, rpb)
        seqw = block_base
        bit = 1
        while bit < rows_here:
            seqw = jnp.where((group & bit) != 0,
                             pltpu.roll(seqw, rows - bit, 0), seqw)
            bit <<= 1
        x = (seqw[:tile] == smap).astype(jnp.bfloat16)  # [tile, 128]
        part = jnp.dot(
            x, filt_ref[b * MAX_MK:(b + 1) * MAX_MK, :],
            preferred_element_type=jnp.float32,
        )  # [tile, M]
        scores = part if scores is None else scores + part

    # per-motif threshold + validity window
    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) + i * tile
    mask = (scores >= tsc_ref[:]) & (pos < nval_ref[:])

    # halfword bit-pack: one [tile, M] @ [M, n_words] matmul against
    # the power-of-two selector (exact: sums of distinct 2^b <= 65535)
    bits = jnp.dot(
        mask.astype(jnp.bfloat16), pow_ref[:],
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = bits.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m_max", "k", "tile"))
def prefilter_bits(seq, filters, t_scaled, n_valid, m_max: int, k: int,
                   tile: int = 8192):
    """Packed hit bits of every motif at every position.

    ``seq``: int8 ``[Lp]`` with ``Lp`` a multiple of ``tile`` (wildcard
    padded); ``filters``: f32/bf16 ``[n_blocks*128, M]`` zero-padded
    stacked discrete matrices
    (``filters[(j//16)*128 + (j%16)*8 + s, mo] = dm[mo][j, s]``),
    ``M`` a multiple of 16; ``t_scaled``: f32 ``[1, M]`` scaled thresholds
    (+inf where the motif can never pass); ``n_valid``: int32 ``[1, M]``
    valid window starts per motif.

    Returns int32 ``[Lp, M // 16]``: bit ``b`` of word ``g`` at row
    ``p`` set iff motif ``g*16 + b`` is a discrete candidate at ``p``.
    """
    from . import kernels

    lp = seq.shape[0]
    n_motifs = filters.shape[1]
    assert lp % tile == 0 and n_motifs % BITS_PER_WORD == 0
    assert filters.shape[0] == \
        -(-m_max // (MAX_MK // _lanes_for(k))) * MAX_MK
    grid = lp // tile
    n_words = n_motifs // BITS_PER_WORD

    # power-of-two bit-pack selector (block-diagonal halfword powers)
    powers = np.zeros((n_motifs, n_words), np.float32)
    for mo in range(n_motifs):
        powers[mo, mo // BITS_PER_WORD] = float(1 << (mo % BITS_PER_WORD))

    view = seq.reshape(lp, 1)
    kernel = functools.partial(
        _prefilter_kernel, m_max=m_max, k=k, tile=tile, grid=grid,
        n_words=n_words)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # filters [128, M]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t_scaled [1, M]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # n_valid [1, M]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # powers [M, n_words]
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: ((i + 1) % grid, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, n_words), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=kernels.INTERPRET,
    )(filters.astype(jnp.bfloat16), t_scaled, n_valid,
      jnp.asarray(powers, jnp.bfloat16), view, view)
