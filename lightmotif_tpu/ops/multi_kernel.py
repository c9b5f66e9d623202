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

__all__ = ["prefilter_any", "prefilter_any16", "prefilter_any8",
           "pack_filters_any", "pack_slots", "supports_fused",
           "BITS_PER_WORD", "TILE", "NEG_GUARD"]

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

#: Cap on summed contraction blocks (exact for integer data,
#: order-free; raw sums stay < NEG_GUARD: 8 * 16 rows * 255 = 32640).
#: Bounds the fused path at m <= 128 for DNA and m <= 32 for protein;
#: short motif sets pay nothing (blocks are derived from m_max).
MAX_BLOCKS = 8

#: Maximum motif length of the fused path for K <= 8.
MAX_M_ROWS = MAX_BLOCKS * ROWS_PER_BLOCK


#: Finite stand-in for "+inf threshold" once thresholds fold into the
#: matmul as ``-t`` (0 x inf would make NaNs): larger than any raw
#: integer score sum (<= 64 rows x 255), exactly representable in bf16.
NEG_GUARD = 65536.0


def _lanes_for(k: int) -> int:
    # strictly fewer symbols than lanes: the top slot of group j=0 is
    # the constant-one lane that carries the folded threshold
    return LANES_PER_ROW if k < LANES_PER_ROW else LANES_PER_ROW_WIDE


def pack_filters(dm_stack: np.ndarray, t_scaled: np.ndarray, k: int):
    """Host-side filter packing (the base layout of
    :func:`pack_filters_any`; a superseded bits-output kernel built on
    it directly was deleted in round 3 -- see git history).

    ``dm_stack``: f32 ``[M, m_max, K]`` zero-padded discrete matrices;
    ``t_scaled``: int ``[M]`` scaled thresholds.  Returns
    ``(filters[n_blocks*128, m_pad], t_eff[1, m_pad])`` where padded
    motif slots get ``+inf`` thresholds (never candidates) and
    thresholds above the u8 range map to ``+inf`` (saturating
    semantics, ``pwm/mod.rs:781-784``).
    """
    mcount = dm_stack.shape[0]
    filters = pack_slots(dm_stack, k)
    t_eff = np.full((1, filters.shape[1]), np.inf, np.float32)
    t_eff[0, :mcount] = np.where(
        np.asarray(t_scaled) > 255, np.inf, t_scaled).astype(np.float32)
    return filters, t_eff


def pack_slots(stack: np.ndarray, k: int) -> np.ndarray:
    """The ``[(j, s) slot, motif]`` filter layout every packer (and the
    kernels' window construction) shares: row ``(j // rpb) * MAX_MK +
    (j % rpb) * lanes + s``, motifs zero-padded to whole
    ``BITS_PER_WORD`` words on the lane axis.  ONE source of truth --
    the u8 and u16 filters desync silently if this rule forks.

    ``stack``: ``[M, m_max, K]`` per-motif per-row cell values (any
    float-convertible dtype)."""
    mcount, m_max, _ = stack.shape
    lanes = _lanes_for(k)
    rpb = MAX_MK // lanes
    m_pad = -(-mcount // BITS_PER_WORD) * BITS_PER_WORD
    n_blocks = -(-m_max // rpb)
    out = np.zeros((n_blocks * MAX_MK, m_pad), np.float32)
    for j in range(m_max):
        r = (j // rpb) * MAX_MK + (j % rpb) * lanes
        out[r:r + k, :mcount] = stack[:, j, :].T
    return out


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


def _any16_kernel(hi_ref, lo_ref, b0_ref, b1_ref, out_ref, *,
                  m_max, k, tile, widths=None):
    """u16 variant of :func:`_any_kernel`: the same transposed one-hot
    drives TWO matmuls against the hi/lo byte planes of the u16
    discretization (:func:`.multi.fine_discretize`), and the combined
    ``256 * hi + lo = sum16 - t16`` replaces the u8 ``score - t``.

    Exactness: hi/lo cells and the folded threshold halves are
    integers <= 1024 (exact bf16); window sums stay < 2^24 in the f32
    accumulators (u16 window sums are <= 65534 + m by the factor
    construction, so the -1024 hi guard is unreachable: 256 * 1024 >
    65534 + m).  ~256x less over-estimate slack than the u8 prefilter
    keeps the ANY-candidate union from saturating at database scale
    (at M ~ 4700 the u8 union covers ~87% of genome positions; the
    candidate list -- and every [cap]-scale stage after it -- shrinks
    to roughly the true discrete-hit density).

    ``widths`` (optional, one per contraction block, non-increasing,
    ``widths[0] == m_pad``): ragged contraction -- block ``b``'s
    matmuls only cover the LAST ``widths[b]`` motif lanes.  Groups are
    length-sorted, so motifs long enough to reach block ``b`` form a
    suffix; on JASPAR2024 only ~8% of live motifs exceed 16 rows, so
    blocks 1+ shrink from 2048 lanes to 256/128 and the prefilter does
    ~40% of the full-width MXU work.  Rows whose motifs need no
    further block fold into the running max as soon as their last
    block lands, keeping the live accumulator at the suffix width.
    """
    w = m_max - 1
    lanes = _lanes_for(k)
    rpb = MAX_MK // lanes
    width = tile + w
    s0 = b0_ref[:].astype(jnp.int32)
    halo = b1_ref[:, :w].astype(jnp.int32)
    seq_row = jnp.concatenate([s0, halo], axis=1)
    base = jnp.broadcast_to(seq_row, (lanes, width))
    sub = jax.lax.broadcasted_iota(jnp.int32, (MAX_MK, 1), 0)
    smap = sub % lanes
    is_const = sub == (lanes - 1)
    n_blocks = -(-m_max // rpb)
    m_pad = hi_ref.shape[1]
    if widths is None:
        widths = (m_pad,) * n_blocks
    assert widths[0] == m_pad and len(widths) == n_blocks
    assert all(a >= b for a, b in zip(widths, widths[1:])), widths
    hi_s = lo_s = None
    best = None
    cur = 0  # first motif lane still accumulating
    for b in range(n_blocks):
        blocks = []
        for r in range(rpb):
            j = b * rpb + r
            blocks.append(base if j == 0 else
                          pltpu.roll(base, width - j, axis=1))
        xt = jnp.stack(blocks, axis=0).reshape(MAX_MK, width)
        oh = xt[:, :tile] == smap
        if b == 0:
            oh = oh | is_const
        ohb = oh.astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        s_b = m_pad - widths[b]
        ph = jax.lax.dot_general(
            hi_ref[b * MAX_MK:(b + 1) * MAX_MK, s_b:], ohb,
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        pl_ = jax.lax.dot_general(
            lo_ref[b * MAX_MK:(b + 1) * MAX_MK, s_b:], ohb,
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        if b == 0:
            hi_s, lo_s = ph, pl_
            continue
        if s_b > cur:
            # motif lanes [cur, s_b) got their last contribution in an
            # earlier block: fold them into the running max and shrink
            # the accumulator to the still-live suffix
            done = 256.0 * hi_s[: s_b - cur] + lo_s[: s_b - cur]
            mx = jnp.max(done, axis=0, keepdims=True)
            best = mx if best is None else jnp.maximum(best, mx)
            hi_s = hi_s[s_b - cur:]
            lo_s = lo_s[s_b - cur:]
            cur = s_b
        hi_s = hi_s + ph
        lo_s = lo_s + pl_
    part16 = 256.0 * hi_s + lo_s
    mx = jnp.max(part16, axis=0, keepdims=True)
    best = mx if best is None else jnp.maximum(best, mx)
    out_ref[:] = best.astype(jnp.int32)


def _any8_kernel(hi_ref, lo_ref, adj_ref, b0_ref, b1_ref, out_ref, *,
                 m_max, k, tile, widths=None):
    """int8-MXU variant of :func:`_any16_kernel` (~1.5x at database
    shape: the int8 matmul path measured ~5x bf16 in isolation;
    the one-hot construction and i32 epilogue bound the rest).

    The byte planes shift by -128 into int8 range; with exactly one
    one-hot 1 per (j, symbol-slot) group the shift is a constant
    ``-128 * R_mo`` per motif (R_mo = slot groups whose contraction
    block covers the motif's lane under ``widths``), folded into a
    per-motif int32 adjustment together with the threshold:

        sum16 - t16 = 256*hs + ls + adj,
        adj = 128 * 257 * R_mo - t16   (never-pass: -2^26).

    No constant-one lane (the bf16 kernel's threshold-fold trick) is
    needed, so the one-hot is the plain symbol match.  All arithmetic
    is integer-exact; candidates (sign of the max) and passing values
    are bit-identical to the u16 bf16 kernel -- only the sentinel
    values of never-pass motifs differ, and those are negative in both
    formulations (tested).
    """
    w = m_max - 1
    lanes = _lanes_for(k)
    rpb = MAX_MK // lanes
    width = tile + w
    s0 = b0_ref[:].astype(jnp.int32)
    halo = b1_ref[:, :w].astype(jnp.int32)
    seq_row = jnp.concatenate([s0, halo], axis=1)
    base = jnp.broadcast_to(seq_row, (lanes, width))
    sub = jax.lax.broadcasted_iota(jnp.int32, (MAX_MK, 1), 0)
    smap = sub % lanes
    n_blocks = -(-m_max // rpb)
    m_pad = hi_ref.shape[1]
    if widths is None:
        widths = (m_pad,) * n_blocks
    assert widths[0] == m_pad and len(widths) == n_blocks
    assert all(a >= b for a, b in zip(widths, widths[1:])), widths
    hi_s = lo_s = None
    best = None
    cur = 0
    for b in range(n_blocks):
        blocks = []
        for r in range(rpb):
            j = b * rpb + r
            blocks.append(base if j == 0 else
                          pltpu.roll(base, width - j, axis=1))
        xt = jnp.stack(blocks, axis=0).reshape(MAX_MK, width)
        oh = (xt[:, :tile] == smap).astype(jnp.int8)
        dn = (((0,), (0,)), ((), ()))
        s_b = m_pad - widths[b]
        ph = jax.lax.dot_general(
            hi_ref[b * MAX_MK:(b + 1) * MAX_MK, s_b:], oh,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        pl_ = jax.lax.dot_general(
            lo_ref[b * MAX_MK:(b + 1) * MAX_MK, s_b:], oh,
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        if b == 0:
            hi_s, lo_s = ph, pl_
            continue
        if s_b > cur:
            done = (256 * hi_s[: s_b - cur] + lo_s[: s_b - cur]
                    + adj_ref[cur:s_b, :])
            mx = jnp.max(done, axis=0, keepdims=True)
            best = mx if best is None else jnp.maximum(best, mx)
            hi_s = hi_s[s_b - cur:]
            lo_s = lo_s[s_b - cur:]
            cur = s_b
        hi_s = hi_s + ph
        lo_s = lo_s + pl_
    part = 256 * hi_s + lo_s + adj_ref[cur:, :]
    mx = jnp.max(part, axis=0, keepdims=True)
    best = mx if best is None else jnp.maximum(best, mx)
    out_ref[:] = best


@functools.partial(jax.jit, static_argnames=("m_max", "k", "tile",
                                              "widths"))
def prefilter_any8(seq, hi8, lo8, adj, m_max: int, k: int,
                   tile: int | None = None,
                   widths: tuple[int, ...] | None = None):
    """int8-MXU ``max_mo (sum16 - t16)`` as int32 ``[1, Lp]``.

    ``hi8``/``lo8``/``adj`` come from
    :func:`.multi.pack_filters_fine_i8`.  Drop-in candidate-equivalent
    replacement for :func:`prefilter_any16` (same u16 resolution; the
    matmuls ride the int8 MXU path)."""
    from . import kernels

    lp = seq.shape[0]
    if tile is None:
        rpb = MAX_MK // _lanes_for(k)
        # two i32 accumulators live in VMEM, like the two f32 planes
        tile = _tile_for(2 * hi8.shape[1], -(-m_max // rpb))
    assert lp % tile == 0
    grid = lp // tile
    view = seq.reshape(1, lp)
    kernel = functools.partial(_any8_kernel, m_max=m_max, k=k, tile=tile,
                               widths=widths)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
    )(hi8, lo8, adj, view, view)


def _tile_for(m_pad: int, n_blocks: int = 1) -> int:
    """Largest power-of-two tile (<= TILE) keeping the [m_pad, tile]
    f32 score block within VMEM.  The budget accounts for Mosaic's
    double buffering (a 4704-motif database at tile 4096 compiled to a
    148 MB scoped allocation and OOM'd the 128 MB VMEM); 8M f32
    elements (32 MB, ~64-70 MB compiled) leaves room for the window
    rolls and the filter block.  Long motifs (several contraction
    blocks) also scale the in-kernel window-construction arrays
    (``[128, tile + m]`` per block, which the unrolled block loop
    keeps live), so the tile shrinks with the block count (an
    m=128 / 8-block set OOM'd scoped VMEM at tile 32768)."""
    budget = 8 * 1024 * 1024  # f32 elements
    tile = TILE
    if n_blocks > 1:
        tile >>= (n_blocks - 1).bit_length()  # 2->16k, 3/4->8k, 8->4k
    while tile > 1024 and m_pad * tile > budget:
        tile //= 2
    return max(tile, 1024)


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
        rpb = MAX_MK // _lanes_for(k)
        tile = _tile_for(filters_t.shape[1], -(-m_max // rpb))
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


@functools.partial(jax.jit, static_argnames=("m_max", "k", "tile",
                                              "widths"))
def prefilter_any16(seq, f_hi, f_lo, m_max: int, k: int,
                    tile: int | None = None,
                    widths: tuple[int, ...] | None = None):
    """u16-resolution ``max_mo (sum16 - t16)`` as int32 ``[1, Lp]``.

    ``f_hi``/``f_lo``: byte-plane filters from
    :func:`.multi.pack_filters_fine` (same slot layout as
    :func:`pack_filters_any`).  A position is a candidate for *some*
    motif iff the output is >= 0; the u16 test has no false negatives
    vs the exact f32 threshold (see :func:`.multi.fine_discretize`),
    so this is a drop-in, ~256x tighter replacement for
    :func:`prefilter_any`.

    ``widths``: optional per-contraction-block motif-lane suffix
    widths (:func:`.multi.ragged_widths`) -- blocks past the first
    multiply only the motifs long enough to reach them."""
    from . import kernels

    lp = seq.shape[0]
    if tile is None:
        rpb = MAX_MK // _lanes_for(k)
        # two filter planes + two accumulators live in VMEM
        tile = _tile_for(2 * f_hi.shape[1], -(-m_max // rpb))
    assert lp % tile == 0
    grid = lp // tile
    view = seq.reshape(1, lp)
    kernel = functools.partial(_any16_kernel, m_max=m_max, k=k, tile=tile,
                               widths=widths)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
    )(f_hi.astype(jnp.bfloat16), f_lo.astype(jnp.bfloat16), view, view)
