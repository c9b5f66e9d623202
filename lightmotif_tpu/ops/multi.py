"""Multi-motif scoring: M position weight matrices in one device pass.

The reference CLI fans (motif x sequence) jobs over OS threads
(``lightmotif-cli/src/main.rs:240-378``); the TPU-native equivalent
scores *all* motifs against a sequence in one MXU program:

* the sequence windows are one-hot "im2col"-expanded to
  ``X[p, j*K + k] = (seq[p+j] == k)`` in bf16 (0/1 exact);
* every motif's discrete u8 matrix flattens to a column of
  ``W[(j,k), M]`` (u8 ints are exact in bf16; motifs shorter than the
  longest are zero-padded, contributing nothing);
* one matmul ``X @ W`` with f32 accumulation produces exact integer
  scores for every (position, motif) pair at full MXU rate -- the
  contraction (m*K ~ 75-128) and output (M >= 128) dimensions both fill
  the systolic array, unlike any single-motif formulation;
* candidates above each motif's scaled threshold compact through one
  fixed-capacity ``nonzero`` and get an exact per-motif f32 rescore.

This is the workload where the TPU design pays off hardest: database
scans (JASPAR has ~2000 motifs) run hundreds of times faster than
motif-at-a-time scanning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: Candidate positions per sparse per-motif block.  Bounds the
#: [block, M] intermediates regardless of how far the exact-count
#: retry ratchets the candidate capacity -- AND sets the work
#: granularity of the live-block loop: per-group device cost is
#: ceil(live / block) * block, so small blocks track the actual
#: candidate count closely.  Swept on whole-JASPAR x 2 strands
#: (experiments/block_size_probe.py): 65536 -> 0.69 s, 16384 ->
#: 0.44 s, 4096 -> 0.39 s, 2048 -> 0.39 s (plateau); 4096 keeps the
#: degenerate tens-of-millions-of-pairs ratchets at thousands (not
#: tens of thousands) of loop iterations.
PHASE_C_BLOCK = 1 << 12

#: Pairs per exact-rescore block (bounds the [blk, m_max] gathers);
#: same rounding-up-to-block live-loop granularity argument.
RESCORE_BLOCK = 1 << 12

__all__ = [
    "stack_motifs",
    "score_multi_u8",
    "rescore_multi",
    "scan_multi_segment",
    "scan_multi_segment_fused",
    "scan_multi_core",
    "fine_discretize",
    "fine_thresholds",
    "pack_filters_fine",
    "pack_filters_fine_i8",
    "ragged_widths",
    "pack_words",
    "gather_windows",
    "pack_motif_group",
    "group_bucket",
]


def fine_discretize(pssm_stack):
    """u16 discretization of a zero-padded PSSM stack for the phase-C
    refined hit test.

    Mirrors the reference's u8 quantization (``pwm/mod.rs:720-805``:
    per-row min offsets, over-estimating ``ceil``) at 16-bit
    resolution, in f64.  The denominator is 65534, leaving one unit of
    headroom so f64 rounding in the division can never push a cell past
    the two-byte split.  Returns ``(data16 uint32 [M, m, K],
    factor [M] f64, offset [M] f64)``.

    Soundness: ``data16[j, s] >= (pssm[j, s] - offsets[j]) / factor``
    cell-wise, so ``sum16 >= (score_f32 - offset) / factor`` for every
    window; with ``t16 = floor((t - offset) / factor)`` a window with
    ``score >= t`` always has ``sum16 >= t16`` (accumulated f64 error
    is < 1e-9 and both sides are integers), i.e. the refined test has
    no false negatives.  256x less over-estimate slack than u8 means
    ~256x fewer false (position, motif) pairs reach the extraction and
    exact-rescore stages at database scale.
    """
    x = np.asarray(pssm_stack, np.float64)
    body = x[:, :, :-1] if x.shape[2] > 1 else x
    with np.errstate(invalid="ignore"):
        finite = np.where(np.isfinite(body), body, -np.inf)
        row_max = finite.max(axis=2)
        row_max = np.where(np.isfinite(row_max), row_max, 0.0)
        max_score = row_max.sum(axis=1)
        repl = np.where(np.isinf(body), -max_score[:, None, None], body)
        offsets = repl.min(axis=2)
        offset = offsets.sum(axis=1)
        span = max_score - offset
        factor = np.where(span > 0, span, 1.0) / 65534.0
        scaled = np.ceil((x - offsets[:, :, None]) / factor[:, None, None])
    data16 = np.clip(
        np.nan_to_num(scaled, nan=0.0, posinf=65535.0, neginf=0.0),
        0, 65535).astype(np.uint32)
    return data16, factor, offset


def fine_thresholds(thresholds, factor, offset):
    """f32 thresholds -> u16 thresholds (floored, like
    ``DiscreteMatrix.scale``).

    FINITE thresholds clamp into the passable range [0, 65535] -- a
    hand-built ``ScoringMatrix`` may put wildcard cells above its row
    body max (``max_score`` sums body columns only, like the
    reference's), so true window scores can exceed ``max_score`` and a
    finite above-range threshold must stay reachable: any window
    scoring past the body max has ``sum16 >= 65535`` (its unclipped
    ceil-sum exceeds 65534, and a clipped cell alone contributes
    65535), mirroring the u8 path's saturate-at-255 semantics
    (``pwm/mod.rs:782-784``).  Only non-finite thresholds map to the
    never-pass sentinel 65536 (``+inf`` padded slots / NaN) that
    :func:`pack_filters_fine` folds to a guard; ``-inf`` / below-range
    clamps to 0 (every window passes, exactly as it should)."""
    t = np.asarray(thresholds, np.float64)
    with np.errstate(invalid="ignore"):
        t16 = np.floor((t - offset) / factor)
    return np.where(
        np.isfinite(t),
        np.minimum(np.maximum(t16, 0.0), 65535.0),
        np.where(t < 0, 0.0, 65536.0),
    ).astype(np.int64)


def unreachable_thresholds(pssm_stack, thresholds):
    """Boolean ``[M]``: thresholds provably no window can reach.

    A finite threshold above every achievable window score still maps
    to a *reachable* u16 threshold (see :func:`fine_thresholds`), so
    saturated windows -- every perfect consensus match -- pass the
    fused filter and die only at the exact rescore.  Real databases
    make this expensive: short JASPAR motifs (m <= 6) cannot reach a
    p <= 1e-6 threshold at all, yet each one's ~L/4^m perfect windows
    flood the candidate/pair stages (~1M false pairs on E. coli,
    measured).  This predicate lets the packer fold such motifs to the
    never-pass guard instead.

    Soundness: the bound is the f64 sum of per-row maxima over ALL
    columns (wildcard included -- sequences may contain wildcards)
    plus an upper bound on f32 sequential-summation rounding
    (m roundings, each < 2^-24 relative of a partial sum bounded by
    the sum of absolute row maxima), so no achievable f32 window score
    can exceed it.  Only thresholds STRICTLY above bound + margin are
    marked unreachable.
    """
    x = np.asarray(pssm_stack, np.float64)
    m = x.shape[1] or 1
    row_max = x.max(axis=2) if x.shape[2] else np.full(x.shape[:2], -np.inf)
    bound = row_max.sum(axis=1)
    t = np.asarray(thresholds, np.float64)
    finite_bound = np.isfinite(bound)
    with np.errstate(invalid="ignore"):
        mag = np.where(np.isfinite(row_max), np.abs(row_max), 0.0).sum(axis=1)
        margin = mag * m * 2.0 ** -23
        above = t > bound + margin
    # bound -inf (some row is all -inf): every window scores -inf, any
    # finite threshold is unreachable
    return np.isfinite(t) & np.where(finite_bound, above, True)


def ragged_widths(f_hi, f_lo, k: int) -> tuple[int, ...]:
    """Per-contraction-block motif-lane suffix widths for the ragged
    fused prefilter.

    Block ``b`` of the ``[(j, s) slot, motif]`` filters only has
    nonzero cells for motifs whose length exceeds ``b * rows_per_
    block``; with length-sorted groups those motifs are a suffix of
    the lane axis.  Returns one width per block (power-of-two >= 128,
    non-increasing, ``widths[0] = m_pad``): the matmul for block ``b``
    can cover just the last ``widths[b]`` lanes.  Derived from the
    packed filter content itself -- correct for ANY motif order (an
    unsorted group simply degrades to full widths), and immune to
    packer drift.
    """
    from . import multi_kernel

    m_pad = f_hi.shape[1]
    n_blocks = f_hi.shape[0] // multi_kernel.MAX_MK
    if m_pad % 128:
        # suffix starts must stay 128-lane aligned for Mosaic slices;
        # sets small enough to have a ragged-unfriendly pad gain
        # nothing from raggedness anyway
        return (m_pad,) * n_blocks
    needs = [m_pad]
    for b in range(1, n_blocks):
        rows = slice(b * multi_kernel.MAX_MK, (b + 1) * multi_kernel.MAX_MK)
        nz = (np.abs(f_hi[rows]) + np.abs(f_lo[rows])).any(axis=0)
        first = int(np.argmax(nz)) if nz.any() else m_pad
        needs.append(m_pad - first)
    # a motif may have all-zero cells in an intermediate block (uniform
    # PSSM rows discretize to 0) yet nonzero cells later: widths must be
    # non-increasing for the kernel's shrinking accumulator, so widen
    # earlier blocks to cover every later one (their extra columns are
    # zero -- harmless)
    for b in range(n_blocks - 2, 0, -1):
        needs[b] = max(needs[b], needs[b + 1])
    widths = [m_pad]
    for need in needs[1:]:
        w = 128
        while w < need:
            w *= 2
        widths.append(min(w, m_pad))
    return tuple(widths)


def pack_filters_fine(data16, t16, k: int):
    """Hi/lo byte filter pair for the phase-C u16 refined test.

    Same ``[(j, s) slot, motif]`` layout as
    :func:`.multi_kernel.pack_filters` so the one block of windowed
    one-hots drives both matmuls; ``part16 = 256 * (X @ hi) + X @ lo
    = sum16 - t16`` exactly (hi/lo bytes and the folded ``-t16``
    halves are integers with magnitude <= 256 or the power-of-two
    guard 1024, all exact in bf16; f32 accumulation of < 2^24 integer
    sums is exact).  The constant slot (row ``lanes - 1``) carries the
    threshold halves; never-pass motifs (sentinel > 65535, and padded
    slots) get a -1024 hi guard no window sum can overcome
    (``256 * 1024 > 65535 + m``).
    """
    from . import multi_kernel

    mcount = data16.shape[0]
    lanes = multi_kernel._lanes_for(k)
    # one layout rule for every packer: multi_kernel.pack_slots
    hi = multi_kernel.pack_slots((data16 >> 8).astype(np.float32), k)
    lo = multi_kernel.pack_slots((data16 & 255).astype(np.float32), k)
    t16 = np.asarray(t16, np.int64)
    never = t16 > 65535
    tc = np.clip(t16, 0, 65535)
    hi[lanes - 1, :mcount] = -np.where(
        never, 1024, tc >> 8).astype(np.float32)
    lo[lanes - 1, :mcount] = -np.where(
        never, 0, tc & 255).astype(np.float32)
    hi[lanes - 1, mcount:] = -1024.0
    return hi, lo


def pack_filters_fine_i8(data16, t16, k: int, widths):
    """int8 byte-plane filters + int32 adjustment for
    :func:`.multi_kernel.prefilter_any8`.

    Cells shift by -128 into int8 range; every matchable slot of every
    (j, symbol) group shifts -- including zero-padded motif rows and
    the groups past ``m_max`` -- because each group contributes exactly
    one one-hot 1 per position, making the shift a per-motif constant
    ``-128 * R_mo`` (``R_mo`` = groups whose contraction block covers
    the motif's lane under the ragged ``widths``).  The constant and
    the threshold fold into ``adj = 128 * 257 * R_mo - t16`` so the
    kernel's ``256 * hs + ls + adj`` equals ``sum16 - t16`` exactly
    for live motifs; never-pass motifs (sentinel > 65535, padded
    slots) get ``adj = -2^26``, below any reachable ``256*hs + ls``.

    Returns ``(hi8 int8, lo8 int8, adj int32 [m_pad, 1])``.
    """
    from . import multi_kernel

    mcount, m_max, _ = data16.shape
    lanes = multi_kernel._lanes_for(k)
    rpb = multi_kernel.MAX_MK // lanes
    bpw = multi_kernel.BITS_PER_WORD
    m_pad = -(-mcount // bpw) * bpw
    n_blocks = -(-m_max // rpb)
    hi = np.zeros((n_blocks * multi_kernel.MAX_MK, m_pad), np.int16)
    lo = np.zeros_like(hi)
    for g in range(n_blocks * rpb):
        r = (g // rpb) * multi_kernel.MAX_MK + (g % rpb) * lanes
        hi[r:r + k] = -128
        lo[r:r + k] = -128
        if g < m_max:
            hi[r:r + k, :mcount] += (data16[:, g, :] >> 8).T
            lo[r:r + k, :mcount] += (data16[:, g, :] & 255).T
    r_mo = np.zeros(m_pad, np.int64)
    for wd in widths:
        r_mo[m_pad - wd:] += rpb
    t = np.full(m_pad, 1 << 26, np.int64)
    tt = np.asarray(t16, np.int64)
    t[:mcount] = np.where(tt > 65535, 1 << 26, np.clip(tt, 0, 65535))
    adj = (128 * 257 * r_mo - t).astype(np.int32).reshape(m_pad, 1)
    return hi.astype(np.int8), lo.astype(np.int8), adj


def stack_motifs(matrices, k: int):
    """Stack per-motif matrices ``[m_i, K]`` into ``[M, m_max, K]`` with
    zero padding, plus the lengths ``[M]``."""
    m_max = max(m.shape[0] for m in matrices)
    out = np.zeros((len(matrices), m_max, k), dtype=np.float32)
    lengths = np.zeros(len(matrices), dtype=np.int32)
    for i, m in enumerate(matrices):
        out[i, : m.shape[0]] = m
        lengths[i] = m.shape[0]
    return out, lengths


def pack_motif_group(ids, gm: int, m_bucket: int, pssm_stack,
                     thresholds, k: int):
    """Pack ONE length-sorted motif group for the fused two-pass scan.

    Shared by the single-chip ``MultiScanner`` and the mesh
    ``sharded_multi_scan`` so the padded-slot sentinels, bucket
    slicing, and u16 fine-filter packing cannot drift apart.

    ``ids``: database indices of the group's motifs; ``gm``: the padded
    group size (every group of a multi-group scan pads to one fixed
    shape so a single compiled program serves them all); ``m_bucket``:
    the group's contraction-block bucket (>= its longest motif).
    Padded motif slots never pass any stage: f32 threshold ``+inf``,
    u16 threshold 65536 -> the -1024 hi guard, zero valid windows.

    Both fused passes run at u16 resolution (``fine_discretize``:
    ~256x less quantization slack than u8 keeps false pairs out of
    extraction + rescore), so groups carry no u8 filters at all.

    Returns host arrays ``{f_hi, f_lo, pssm, th, m_max, count}``.
    """
    mw = min(m_bucket, pssm_stack.shape[1])
    th_g = np.full(gm, np.inf, np.float32)
    th_g[: len(ids)] = thresholds[ids]
    pssm_g = np.zeros((gm, m_bucket, pssm_stack.shape[2]), np.float32)
    pssm_g[: len(ids), :mw] = pssm_stack[ids][:, :mw]
    d16, f16, off16 = fine_discretize(pssm_g)
    t16 = fine_thresholds(th_g, f16, off16)
    # provably-unreachable thresholds (short motifs at tight p-values)
    # fold to the never-pass sentinel: their perfect-match windows
    # would otherwise saturate the u16 filter and flood the pair stages
    t16 = np.where(unreachable_thresholds(pssm_g, th_g), 65536, t16)
    f_hi, f_lo = pack_filters_fine(d16, t16, k)
    widths = ragged_widths(f_hi, f_lo, k)
    hi8, lo8, adj = pack_filters_fine_i8(d16, t16, k, widths)
    # length-class lane starts for the staged exact rescore: pairs
    # whose motif lane sits before rsplits[b-1] have all-zero f32 rows
    # in contraction block b (trailing zero rows add +0.0 exactly --
    # the unstaged rescore adds them too), so the per-pair gather loop
    # can stop at its class boundary.  Derived from effective lengths
    # (last nonzero f32 row), monotone-safe for any motif order.
    from . import multi_kernel

    rpb = multi_kernel.MAX_MK // multi_kernel._lanes_for(k)
    nz_rows = np.abs(pssm_g).sum(axis=2) > 0          # [gm, m_bucket]
    m_eff = np.where(nz_rows.any(axis=1),
                     m_bucket - np.argmax(nz_rows[:, ::-1], axis=1), 0)
    n_blocks = -(-m_bucket // rpb)
    rsplits = []
    for b in range(1, n_blocks):
        sel = np.nonzero(m_eff > b * rpb)[0]
        rsplits.append(int(sel.min()) if sel.size else gm)
    for b in range(len(rsplits) - 2, -1, -1):
        rsplits[b] = min(rsplits[b], rsplits[b + 1])
    # prefix-4 rescore table: entry (mo, code) = the EXACT f32
    # sequential sum of rows 0..3 for the 4-symbol prefix decoded from
    # ``code`` (base-K digits).  One rescore gather replaces the first
    # four value gathers with the mandated add order preserved
    # bit-for-bit (the entry IS the sequential prefix; zero-padded
    # rows contribute +0.0 exactly).  DNA-sized alphabets only: K^4
    # entries per motif (625 at K=5, ~5 MB per 2048-motif group).
    pre4 = None
    if k <= 8 and m_bucket >= 4:
        codes = np.arange(k ** 4)
        pre4 = pssm_g[:, 0, :][:, codes // k ** 3 % k].astype(np.float32)
        for j, sj in ((1, codes // k ** 2 % k), (2, codes // k % k),
                      (3, codes % k)):
            pre4 = pre4 + pssm_g[:, j, :][:, sj]
        pre4 = pre4.reshape(-1)
    return {
        "f_hi": f_hi,
        "f_lo": f_lo,
        "f_hi8": hi8,
        "f_lo8": lo8,
        "adj": adj,
        "pssm": pssm_g,
        "th": th_g,
        "m_max": m_bucket,
        "count": len(ids),
        "widths": widths,
        "rsplits": tuple(rsplits),
        "pre4": pre4,
    }


def group_bucket(m_g: int, rpb: int, multi_group: bool) -> int:
    """A group's motif-length bucket: whole contraction blocks when
    several groups share one compiled program, exact otherwise."""
    return (-(-m_g // rpb) * rpb) if multi_group else m_g


#: Dense-path motif lengths round up to this many PSSM rows, so a whole
#: database compiles at most one dense program per bucket.
DENSE_BUCKET = 32


def pack_dense_motif(pssm_data, k: int):
    """Pad a long motif's PSSM to the dense-path length bucket.

    Returns ``(pssm_pad [m_b, k] f32, m_b)`` with ``m_b`` the next
    :data:`DENSE_BUCKET` multiple.  Appended zero rows add 0.0 to every
    window EXACTLY (any symbol looks up 0), so scores over the padded
    matrix bit-match the true-length ones -- the single-chip and mesh
    dense paths share this rule so their exact-hit behavior cannot
    drift apart.
    """
    data = np.asarray(pssm_data, np.float32)
    m_i = data.shape[0]
    m_b = -(-m_i // DENSE_BUCKET) * DENSE_BUCKET
    pssm_pad = np.zeros((m_b, k), np.float32)
    pssm_pad[:m_i] = data
    return pssm_pad, m_b


def _windows_onehot(seq: jax.Array, m_max: int, k: int) -> jax.Array:
    """``X[p, j, k] = (seq[p+j] == k)`` as bf16, shape ``[Lp, m_max*K]``."""
    lp = seq.shape[0]
    s32 = seq.astype(jnp.int32)
    cols = []
    for j in range(m_max):
        if j:
            shifted = jnp.concatenate(
                [s32[j:], jnp.full((j,), k - 1, jnp.int32)]
            )
        else:
            shifted = s32
        cols.append(shifted)
    win = jnp.stack(cols, axis=1)  # [Lp, m_max]
    onehot = (
        win[:, :, None] == jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    ).astype(jnp.bfloat16)
    return onehot.reshape(lp, m_max * k)


def score_multi_u8(seq: jax.Array, dms: jax.Array, lengths: jax.Array,
                   n_valid: jax.Array) -> jax.Array:
    """Discrete scores of every motif at every position.

    ``dms``: f32/u8 ``[M, m_max, K]`` zero-padded discrete matrices;
    ``lengths``: int32 ``[M]``; ``n_valid``: int32 ``[M]`` number of
    valid window starts per motif.  Returns int32 ``[Lp, M]`` with
    invalid positions set to ``-1`` (saturated to 255 like the
    reference's u8 scores).
    """
    mcount, m_max, k = dms.shape
    x = _windows_onehot(seq, m_max, k)  # [Lp, m_max*K] bf16
    w = dms.astype(jnp.bfloat16).reshape(mcount, m_max * k).T
    scores = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # exact: 0/1 x u8 ints, sums < 2^24
    scores = jnp.minimum(scores, 255)
    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    return jnp.where(pos < n_valid[None, :], scores, -1)


def pack_words(seq: jax.Array):
    """Pack an int8 rank sequence into int32 words (4 symbols each,
    little-endian bytes) for gather-frugal window reads.

    A window gather of ``m`` consecutive symbols costs ``m`` random
    HBM gathers; against the packed words it costs ``(m + 6) // 4``
    (measured: gathers dominate the rescore/phase-C stages at ~8 ns
    each, so 33 -> 9 is a ~3.5x cut on the window side).  One vector
    pass per chunk, amortized inside the same program.
    """
    lp = seq.shape[0]
    pad = (-lp) % 4
    s = seq if not pad else jnp.concatenate(
        [seq, jnp.zeros((pad,), seq.dtype)])
    b = s.astype(jnp.int32).reshape(-1, 4)
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def pack_nibbles(seq: jax.Array):
    """Pack an int8 rank sequence into int32 words of EIGHT 4-bit
    symbols -- the densest window-read packing for alphabets with
    ranks < 16 (DNA; protein K=21 stays on :func:`pack_words`).

    Halves the per-window word-gather count again vs byte packing
    ((m + 14) // 8 instead of (m + 6) // 4: 5 vs 9 reads at the
    jasparfull bucket m=33) -- measured -10%% on the whole rescore
    stage (``experiments/rescore_probe3.out``, ``win_nib``).
    """
    lp = seq.shape[0]
    pad = (-lp) % 8
    s = seq if not pad else jnp.concatenate(
        [seq, jnp.zeros((pad,), seq.dtype)])
    b = s.astype(jnp.int32).reshape(-1, 8)
    out = b[:, 0]
    for i in range(1, 8):
        out = out | (b[:, i] << (4 * i))
    return out


def gather_windows(words: jax.Array, positions: jax.Array, m: int,
                   spw: int = 4):
    """``out[i, j] = seq[positions[i] + j]`` (j < m) from packed words.

    ``spw``: symbols per int32 word -- 4 (byte packing,
    :func:`pack_words`) or 8 (nibble packing, :func:`pack_nibbles`).
    ``positions`` must be pre-clipped to ``[0, len(seq) - 1]``; reads
    past the end return padding symbols, exactly like the clipped
    direct gather they replace (callers mask those windows
    downstream).  Returns int32 ``[n, m]`` symbol ranks.
    """
    n_words = (m + 2 * spw - 2) // spw
    bits = 32 // spw
    shift_w = spw.bit_length() - 1          # /spw as a shift
    w0 = positions.astype(jnp.int32) >> shift_w
    w0 = jnp.minimum(w0, words.shape[0] - n_words)
    widx = w0[:, None] + jnp.arange(n_words, dtype=jnp.int32)[None, :]
    w = words[widx]                                   # [n, n_words]
    r = positions.astype(jnp.int32) - (w0 << shift_w)  # symbol offset
    cols = []
    for j in range(m):
        off = r + j                   # [n] symbol index into the words
        wi = off >> shift_w
        sel = w[:, 0]
        for c in range(1, n_words):
            sel = jnp.where(wi == c, w[:, c], sel)
        cols.append((sel >> ((off & (spw - 1)) * bits))
                    & ((1 << bits) - 1))
    return jnp.stack(cols, axis=1)


def rescore_multi(seq: jax.Array, pssms: jax.Array, positions: jax.Array,
                  motif_ids: jax.Array, n_live=None,
                  pre4=None) -> jax.Array:
    """Exact f32 scores for (position, motif) candidate pairs.

    ``pssms``: f32 ``[M, m_max, K]`` (zero-padded rows add 0.0 exactly);
    sequential j-order adds preserve reference parity.

    Indexing is clipped per motif row, so any position valid for its
    *own* motif (``p <= lp - m_i``) scores exactly even when
    ``p > lp - m_max``: a shorter motif's zero-padded rows contribute
    0.0 whatever symbol the clipped index reads.

    ``n_live`` (traced scalar, optional): number of LIVE leading
    entries; the rest are compaction sentinels the caller masks out
    anyway.  When given, the blocked path loops only over blocks that
    contain live pairs (``lax.fori_loop`` with a traced trip count),
    so device cost scales with the actual pair count instead of the
    static capacity the retry ratchet may have pinned far higher
    (dead entries return 0.0 instead of a clipped-garbage score).

    ``pre4`` (optional ``[M * K^4]`` f32 from
    :func:`pack_motif_group`): per-motif table of the EXACT f32
    sequential sum of rows 0..3 for every 4-symbol prefix.  One gather
    replaces the first four value gathers while preserving the
    mandated add order bit-for-bit (the table entry IS the sequential
    prefix -- `experiments/pairsum_probe.out` prefix rows; pairwise
    association, by contrast, diverges on 73%% of windows and is
    forbidden).  Measured -9%% on the stage
    (``experiments/rescore_probe3.out``, ``prefix4``).
    """
    m_max = pssms.shape[1]
    k = pssms.shape[2]
    lp = seq.shape[0]
    # two flat gathers replace the per-j [cap, K] row gather + select
    # chain (which cost ~0.7 s at 1M pairs x m=33: K elements fetched
    # per row per j).  Gather volume drops K-fold; the adds still run
    # in ascending-j order over the value columns, so f32 parity with
    # score_position is preserved (selection is exact either way).
    # Window symbols read from int32-packed words -- nibble-packed
    # (8/word) for ranks < 16, byte-packed otherwise; the window and
    # PSSM gather streams split the stage cost ~50/50 at ~8 ns/gather
    # (experiments/rescore_probe{,3}.py).
    start = 4 if (pre4 is not None and m_max >= 4 and k <= 8) else 0
    jj = jnp.arange(m_max, dtype=jnp.int32)
    flat = pssms.reshape(-1)
    nib = k <= 16
    words = pack_nibbles(seq) if nib else pack_words(seq)
    spw = 8 if nib else 4

    def block(args):
        pos_b, mo_b = args
        safe = jnp.clip(pos_b, 0, lp - 1)
        sym = gather_windows(words, safe, m_max, spw=spw)  # [blk, m]
        base = mo_b.astype(jnp.int32) * (m_max * k)
        if start:
            code = ((sym[:, 0] * k + sym[:, 1]) * k
                    + sym[:, 2]) * k + sym[:, 3]
            acc = pre4[mo_b.astype(jnp.int32) * (k ** 4) + code]
            val = flat[base[:, None] + jj[None, start:] * k
                       + sym[:, start:]]
            for j in range(m_max - start):
                acc = acc + val[:, j]
            return acc
        val = flat[base[:, None] + jj[None, :] * k + sym]
        acc = val[:, 0]
        for j in range(1, m_max):
            acc = acc + val[:, j]
        return acc

    cap = positions.shape[0]
    blk = RESCORE_BLOCK
    if cap <= blk:
        return block((positions, motif_ids))
    # bound the [blk, m_max] intermediates: a degenerate prefilter can
    # ratchet pairs into the tens of millions (16 GB unblocked)
    cap_pad = -(-cap // blk) * blk
    pad = cap_pad - cap
    pos_p = positions if not pad else jnp.concatenate(
        [positions, jnp.zeros((pad,), positions.dtype)])
    mo_p = motif_ids if not pad else jnp.concatenate(
        [motif_ids, jnp.zeros((pad,), motif_ids.dtype)])
    if n_live is None:
        out = jax.lax.map(
            block, (pos_p.reshape(-1, blk), mo_p.reshape(-1, blk)))
        return out.reshape(-1)[:cap]
    n_blk = cap_pad // blk
    live = jnp.minimum(
        (n_live.astype(jnp.int32) + blk - 1) // blk, n_blk)

    def body(i, out):
        pos_b = jax.lax.dynamic_slice(pos_p, (i * blk,), (blk,))
        mo_b = jax.lax.dynamic_slice(mo_p, (i * blk,), (blk,))
        return jax.lax.dynamic_update_slice(
            out, block((pos_b, mo_b)), (i * blk,))

    out = jax.lax.fori_loop(
        0, live, body, jnp.zeros((cap_pad,), jnp.float32))
    return out[:cap]


def rescore_multi_staged(seq, pssms, positions, motif_ids, n_live,
                         rsplits, rpb: int):
    """Exact f32 rescore with length-class gather depth.

    Same contract as :func:`rescore_multi`, but the per-pair PSSM/
    window gathers (the stage's dominant cost, ~8 ns each) stop at the
    pair's motif-length class instead of the group bucket: stage 0
    sums rows ``j < rpb`` for every pair; stage ``b >= 1`` compacts
    the pairs whose motif lane is past ``rsplits[b-1]`` (their f32
    rows in contraction block ``b`` can be nonzero) and CONTINUES
    their accumulation with rows ``[b*rpb, (b+1)*rpb)``, so the
    ascending-j sequential order -- and hence f32 bit parity -- is
    preserved per pair.  On JASPAR2024 only ~8% of live motifs exceed
    16 rows, so ~half the gather volume disappears.  Short pairs skip
    their trailing all-zero rows entirely; the unstaged path adds
    those +0.0 terms, which cannot change any f32 sum.

    Every per-pair gather runs inside a live-count-bounded 4096-block
    ``fori_loop`` (stage populations are tiny; capacity-scale gathers
    would eat the win).

    **Status: measured a NET LOSS on the flagship workload and NOT
    used by the production scanners** (jasparfull 0.180 vs 0.171 s
    wall; rescore stage 44 vs 30 ms).  JASPAR hits concentrate in the
    long, information-rich motifs, so the long-pair population is far
    above the 8%-of-motifs prior, and the class compaction + rank
    merge overhead exceeds the gather savings.  Kept (with bit-parity
    tests) as the documented negative result; a database whose hits
    sit mostly in short motifs could re-enable it via the ``rsplits``
    argument of :func:`scan_multi_segment_fused`.
    """
    m_max = pssms.shape[1]
    k = pssms.shape[2]
    lp = seq.shape[0]
    flat = pssms.reshape(-1)
    words = pack_words(seq)
    cap = positions.shape[0]
    blk = RESCORE_BLOCK
    cap_pad = -(-cap // blk) * blk
    pad = cap_pad - cap

    def padded(x, fill):
        return x if not pad else jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)])

    pos_p = padded(positions, jnp.int32(0))
    mo_p = padded(motif_ids, jnp.int32(0))
    n_live = n_live.astype(jnp.int32)

    def span_block(pos_b, mo_b, acc_b, j0, j1):
        """acc += sum of rows [j0, j1) in ascending order (one 4096
        block of pairs)."""
        safe = jnp.clip(pos_b + j0, 0, lp - 1)
        sym = gather_windows(words, safe, j1 - j0)
        base = mo_b.astype(jnp.int32) * (m_max * k)
        jj = jnp.arange(j0, j1, dtype=jnp.int32)
        val = flat[base[:, None] + jj[None, :] * k + sym]
        for j in range(j1 - j0):
            acc_b = acc_b + val[:, j]
        return acc_b

    # stage 0: rows [0, min(rpb, m_max)) for every pair
    j1_0 = min(rpb, m_max)
    live0 = jnp.minimum((n_live + blk - 1) // blk, cap_pad // blk)

    def body0(i, out):
        pos_b = jax.lax.dynamic_slice(pos_p, (i * blk,), (blk,))
        mo_b = jax.lax.dynamic_slice(mo_p, (i * blk,), (blk,))
        acc_b = span_block(jnp.clip(pos_b, 0, lp - 1), mo_b,
                           jnp.zeros((blk,), jnp.float32), 0, j1_0)
        return jax.lax.dynamic_update_slice(out, acc_b, (i * blk,))

    acc = jax.lax.fori_loop(
        0, live0, body0, jnp.zeros((cap_pad,), jnp.float32))

    n_blocks = -(-m_max // rpb)
    pair_live = jnp.arange(cap_pad) < n_live
    for b in range(1, n_blocks):
        s_b = rsplits[b - 1]
        j0, j1 = b * rpb, min((b + 1) * rpb, m_max)
        sel = pair_live & (mo_p >= s_b)
        csum = jnp.cumsum(sel.astype(jnp.int32))
        cnt_b = csum[-1]
        liveb = jnp.minimum((cnt_b + blk - 1) // blk, cap_pad // blk)

        # compact the class-b pair indices (blocked queries), then
        # continue their accumulation and write into a side buffer
        def bodyb(i, accb):
            q = i * blk + jnp.arange(1, blk + 1, dtype=jnp.int32)
            idx = jnp.searchsorted(csum, q, side="left").astype(jnp.int32)
            idx = jnp.minimum(idx, cap_pad - 1)
            ok = q <= cnt_b
            pos_b = jnp.where(ok, pos_p[idx], 0)
            mo_b = mo_p[idx]
            a0 = jnp.where(ok, acc[idx], 0.0)
            a1 = span_block(jnp.clip(pos_b, 0, lp - 1), mo_b, a0, j0, j1)
            return jax.lax.dynamic_update_slice(accb, a1, (i * blk,))

        acc_cls = jax.lax.fori_loop(
            0, liveb, bodyb, jnp.zeros((cap_pad,), jnp.float32))

        # merge back by rank (no scatter): pair i's continued sum sits
        # at acc_cls[csum[i] - 1]
        def bodym(i, out):
            sl = lambda x: jax.lax.dynamic_slice(x, (i * blk,), (blk,))
            r = jnp.maximum(sl(csum) - 1, 0)
            upd = jnp.where(sl(sel), acc_cls[r], sl(out))
            return jax.lax.dynamic_update_slice(out, upd, (i * blk,))

        acc = jax.lax.fori_loop(0, live0, bodym, acc)
    return acc[:cap]


@functools.partial(jax.jit, static_argnames=(
    "chunk_len", "cap", "dense", "m_max", "k", "cap_hits", "widths",
    "rsplits"))
def scan_multi_segment_fused(seq, off, n_valid_here, filters_t, pssms,
                             thresholds, chunk_len: int, cap: int,
                             m_max: int, k: int, dense: bool = False,
                             cap_hits: int | None = None,
                             filters_fine=None, widths=None,
                             filters_i8=None, rsplits=None,
                             pre4=None):
    """Fused-prefilter variant of :func:`scan_multi_segment`.

    Uses the Pallas MXU any-candidate prefilter (:mod:`.multi_kernel`):
    one int32 per position instead of a ``[C, M]`` score matrix, then a
    sparse per-motif matmul over the surviving positions, compactions,
    and the exact f32 rescore.  Same return convention, except
    ``counts`` has FOUR entries (see :func:`scan_multi_core`).
    """
    chunk = jax.lax.dynamic_slice(seq, (off,), (chunk_len,))
    return scan_multi_core(chunk, n_valid_here, filters_t, pssms,
                           thresholds, cap, m_max, k, dense, cap_hits,
                           filters_fine, widths, filters_i8, rsplits,
                           pre4)


def scan_multi_core(chunk, n_valid_here, filters_t, pssms, thresholds,
                    cap: int, m_max: int, k: int, dense: bool,
                    cap_hits: int | None = None, filters_fine=None,
                    widths: tuple[int, ...] | None = None,
                    filters_i8=None,
                    rsplits: tuple[int, ...] | None = None,
                    pre4=None):
    """Fused multi-motif scan body on an in-register chunk (shared by
    the single-chip segment loop and the mesh shard path).

    ``filters_t``: threshold-folded u8 filters
    (:func:`.multi_kernel.pack_filters_any`), or ``None`` when
    ``filters_fine`` drives both stages (the production path: the u8
    filters would be dead weight).  Stage 1 computes one
    ``max_mo(score - t)`` int32 per position on the MXU; stage 2
    recovers per-motif hit words for the compacted candidate positions
    with a sparse ``[cap, blocks*128]`` one-hot matmul against the same
    filters (exact integer arithmetic in both stages).

    Two independent capacities (round 3): ``cap`` bounds the ANY-
    candidate positions (which can reach a large fraction of the
    genome at database scale), while ``cap_hits`` (default ``cap``)
    bounds everything downstream of the per-position hit test --
    word/bit extraction, rescore, and the packed output -- which
    scales with actual discrete HITS, typically orders of magnitude
    sparser.  Returns ``(counts[4] = [candidates, hit_need, n_kept,
    valid], packed[3, cap_hits])``: a caller must retry with a larger
    ``cap`` when ``candidates > cap``, and with a larger ``cap_hits``
    when ``hit_need > cap_hits``.

    ``filters_fine`` (optional ``(hi, lo)`` from
    :func:`pack_filters_fine`): phase C tests candidates at u16
    resolution instead of re-running the u8 test -- the same one-hot
    block drives two byte matmuls, and the ~256x smaller
    over-estimate slack keeps false pairs out of the extraction and
    rescore stages (the dominant cost at database scale).  Hits are
    identical either way (the refined test has no false negatives and
    the final keep is the exact f32 compare).
    """
    from . import multi_kernel, xla_ops

    chunk_len = chunk.shape[0]
    mcount = pssms.shape[0]
    shape_src = filters_fine[0] if filters_fine is not None else filters_t
    m_pad = shape_src.shape[1]
    lanes = multi_kernel._lanes_for(k)
    rpb = multi_kernel.MAX_MK // lanes
    n_blocks = shape_src.shape[0] // multi_kernel.MAX_MK
    bpw = multi_kernel.BITS_PER_WORD
    n_words = m_pad // bpw
    ch = cap_hits or cap
    if min(cap, ch) * n_words >= 2**31 or ch * bpw >= 2**31:
        # the staged extraction flattens [min(cap, cap_hits), n_words]
        # (level 1) and [cap_hits, BITS_PER_WORD] (level 2); int32
        # indexing (jnp.nonzero) caps both products.  Reaching this
        # needs a hit ratchet in the hundred millions -- raise
        # actionably instead of overflowing inside jax.
        raise OverflowError(
            f"hit capacity {ch} (x {n_words} words / x {bpw} bits) "
            "exceeds int32 indexing; lower the thresholds or scan "
            "fewer motifs per pass")

    if filters_i8 is not None:
        # int8-MXU prefilter: same u16 resolution and candidate set as
        # prefilter_any16, ~1.5x faster at database shape
        maxv = multi_kernel.prefilter_any8(
            chunk, filters_i8[0], filters_i8[1], filters_i8[2],
            m_max, k, widths=widths)
    elif filters_fine is not None:
        # u16 prefilter: ~256x tighter than u8, so the ANY-candidate
        # union stays sparse even at database scale (the u8 union
        # saturates the genome above ~1k motifs, which forced small
        # motif groups); candidates land near true-discrete-hit density
        maxv = multi_kernel.prefilter_any16(
            chunk, filters_fine[0], filters_fine[1], m_max, k,
            widths=widths)
    else:
        maxv = multi_kernel.prefilter_any(chunk, filters_t, m_max, k)
    any_mask = maxv.reshape(-1) >= 0
    pos_count, pos_idx, pos_valid = xla_ops.compact_mask(any_mask, cap, dense)

    # halfword bit-pack selector (block-diagonal powers of two; sums of
    # distinct 2^b <= 65535 are exact in the f32 accumulator)
    powers = np.zeros((m_pad, n_words), np.float32)
    for mo in range(m_pad):
        powers[mo, mo // bpw] = float(1 << (mo % bpw))
    pow_dev = jnp.asarray(powers, jnp.bfloat16)
    if filters_fine is not None:
        fine_hi = filters_fine[0].astype(jnp.bfloat16)
        fine_lo = filters_fine[1].astype(jnp.bfloat16)
        if filters_t is not None:
            assert fine_hi.shape == filters_t.shape, (
                fine_hi.shape, filters_t.shape)
    else:
        filt_bf = filters_t.astype(jnp.bfloat16)

    nib = k <= 16  # nibble-pack the windows for DNA-sized ranks
    pwords = pack_nibbles(chunk) if nib else pack_words(chunk)
    spw = 8 if nib else 4

    def phase_c(pos_blk):
        """Per-motif hit words for one block of candidate positions.

        One-hot candidate windows (same lane layout as the kernel:
        lane = (j % rpb) * lanes + s, block j // rpb) against the same
        folded filters -> part = score - t, exactly."""
        blk = pos_blk.shape[0]
        safe = jnp.clip(pos_blk, 0, chunk_len - 1)
        win = gather_windows(pwords, safe, m_max, spw=spw)  # [blk, m]
        oh = win[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, lanes), 2)
        pad_rows = n_blocks * rpb - m_max
        if pad_rows:
            oh = jnp.pad(oh, ((0, 0), (0, pad_rows), (0, 0)))
        x = oh.reshape(blk, n_blocks * multi_kernel.MAX_MK)
        x = x.at[:, lanes - 1].set(True)  # constant lane carries -t
        xb = x.astype(jnp.bfloat16)
        if filters_fine is not None:
            # u16 refined test: part = sum16 - t16, exactly (byte
            # matmuls; see pack_filters_fine).  Ragged widths mirror
            # the prefilter kernel: contraction block b only multiplies
            # the last widths[b] motif lanes (the suffix long enough to
            # reach it)
            ws = widths if widths is not None else (
                fine_hi.shape[1],) * n_blocks
            mk = multi_kernel.MAX_MK
            hi_acc = jnp.dot(xb[:, :mk], fine_hi[:mk],
                             preferred_element_type=jnp.float32)
            lo_acc = jnp.dot(xb[:, :mk], fine_lo[:mk],
                             preferred_element_type=jnp.float32)
            for b in range(1, n_blocks):
                s_b = fine_hi.shape[1] - ws[b]
                ph = jnp.dot(xb[:, b * mk:(b + 1) * mk],
                             fine_hi[b * mk:(b + 1) * mk, s_b:],
                             preferred_element_type=jnp.float32)
                pl_ = jnp.dot(xb[:, b * mk:(b + 1) * mk],
                              fine_lo[b * mk:(b + 1) * mk, s_b:],
                              preferred_element_type=jnp.float32)
                hi_acc = hi_acc.at[:, s_b:].add(ph)
                lo_acc = lo_acc.at[:, s_b:].add(pl_)
            part = 256.0 * hi_acc + lo_acc
        else:
            part = jnp.dot(
                xb, filt_bf, preferred_element_type=jnp.float32,
            )  # [blk, m_pad] == score - t
        mask = (part >= 0) \
            & (pos_blk[:, None] < n_valid_here[0][None, :]) \
            & (pos_blk < chunk_len)[:, None]
        wrds = jnp.dot(
            mask.astype(jnp.bfloat16), pow_dev,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [blk, W]
        return wrds, jnp.sum(mask.astype(jnp.int32))

    # the [blk, m_pad] intermediates scale with the candidate capacity,
    # which the exact-count retry can ratchet far past the default;
    # process candidates in fixed blocks so device memory stays bounded
    # (ratcheted caps are powers of two, so they divide evenly).  The
    # block also shrinks with the motif count: at database scale
    # (m_pad in the thousands) a 65536-candidate block would
    # materialize gigabyte [blk, m_pad] intermediates
    blk = PHASE_C_BLOCK
    while blk > 1024 and blk * m_pad > (1 << 26):
        blk //= 2
    if cap > blk:
        # a user-supplied capacity need not divide the block size: pad
        # the candidate list with out-of-range sentinels (masked inside
        # phase_c) so the memory-bounding block split always engages
        cap_pad = -(-cap // blk) * blk
        pos_pad = pos_idx if cap_pad == cap else jnp.concatenate(
            [pos_idx, jnp.full((cap_pad - cap,), chunk_len, pos_idx.dtype)])
        # candidates are front-compacted, so blocks past
        # ceil(pos_count / blk) hold only sentinels (words 0, count 0):
        # loop over LIVE blocks only, and device cost tracks the actual
        # candidate count instead of the ratcheted static capacity
        n_blk = cap_pad // blk
        live = jnp.minimum(
            (pos_count.astype(jnp.int32) + blk - 1) // blk, n_blk)

        def pc_body(i, carry):
            words_acc, pairs = carry
            pos_b = jax.lax.dynamic_slice(pos_pad, (i * blk,), (blk,))
            wrds, cnt = phase_c(pos_b)
            words_acc = jax.lax.dynamic_update_slice(
                words_acc, wrds, (i * blk, 0))
            # saturate instead of wrapping int32: degenerate thresholds
            # can pass billions of (position, motif) pairs, and a
            # wrapped-negative total would skip the cap_hits retry and
            # silently truncate hits.  Saturated totals ratchet
            # cap_hits sky-high and hit the actionable OverflowError
            # guard instead.
            return words_acc, jnp.minimum(pairs + cnt, jnp.int32(1 << 30))

        words, pairs_total = jax.lax.fori_loop(
            0, live, pc_body,
            (jnp.zeros((cap_pad, n_words), jnp.int32), jnp.int32(0)))
        words = words[:cap]
    else:
        words, pairs_total = phase_c(pos_idx)

    # everything below scales with cap_hits (actual hits), not with
    # the candidate capacity: at database scale candidates can cover a
    # quarter of the genome (cap ~ 1M) while real discrete hits stay
    # in the tens of thousands.
    if cap_hits is None:
        cap_hits = cap

    # pair extraction (round 4): iterated lowest-set-bit slots.  The
    # previous three compaction levels (hit rows -> nonzero words ->
    # set bits) paid three cumsum+searchsorted passes whose random
    # gathers dominated the stage (~37 ms on jasparfull); instead, R
    # vector passes over the [cap, W] word matrix peel each candidate
    # row's pairs into a [cap, R] slot grid (ascending (word, bit) ==
    # ascending motif lane), and ONE compaction over the slot mask
    # yields the front-compacted pair list.  R rides the cap_hits
    # ratchet (R = cap_hits / 4096): rows with more pairs than R
    # report hit_need = rmax * 4096 > cap_hits, so the existing retry
    # grows both together -- no new state.
    slots_r = max(64, min(256, cap_hits // 4096))
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (cap, n_words), 1)
    pcnt = jnp.sum(jax.lax.population_count(words), axis=1)  # [cap]
    rmax = jnp.max(pcnt)

    def ext_body(r, carry):
        remaining, lanes_out = carry
        nz = remaining != 0
        any_nz = jnp.any(nz, axis=1)
        widx = jnp.argmax(nz, axis=1).astype(jnp.int32)  # first nonzero
        sel = lane_w == widx[:, None]
        w = jnp.max(jnp.where(sel, remaining, 0), axis=1)
        low = w & -w
        bit = jax.lax.population_count(low - 1)
        lane = jnp.where(any_nz, widx * bpw + bit, mcount)
        lanes_out = jax.lax.dynamic_update_slice(
            lanes_out, lane[:, None], (0, r))
        remaining = jnp.where(sel & any_nz[:, None],
                              remaining & (remaining - 1), remaining)
        return remaining, lanes_out

    # loop only while some row still has unextracted pairs: the trip
    # count tracks the actual worst row, not the static R
    trips = jnp.minimum(rmax, slots_r)
    _, lanes_out = jax.lax.fori_loop(
        0, trips, ext_body,
        (words, jnp.full((cap, slots_r), mcount, jnp.int32)))

    # row-structured compaction: the slot mask is a per-row prefix, so
    # the k-th pair resolves with ONE searchsorted over the per-row
    # count cumsum ([cap] elements, 16 rounds) instead of a cumsum +
    # search over the [cap * R] flat mask (22 rounds over 4M+): the
    # random search gathers are the cost, and this more than halves
    # them (33 -> ~14 ms measured on jasparfull)
    counts_c = jnp.minimum(pcnt, slots_r)
    cs = jnp.cumsum(counts_c)  # [cap] inclusive
    pair_count = cs[-1]
    flat_n = cap * slots_r
    qblk = 4096
    cap_hpad = -(-cap_hits // qblk) * qblk
    q_live = jnp.minimum((pair_count + qblk - 1) // qblk,
                         cap_hpad // qblk)

    def q_body(i, out):
        q = i * qblk + jnp.arange(1, qblk + 1, dtype=jnp.int32)
        row = jnp.searchsorted(cs, q, side="left").astype(jnp.int32)
        row = jnp.minimum(row, cap - 1)
        slot = q - 1 - (cs[row] - counts_c[row])
        idx_b = row * slots_r + jnp.minimum(slot, slots_r - 1)
        return jax.lax.dynamic_update_slice(out, idx_b, (i * qblk,))

    pair_idx = jax.lax.fori_loop(
        0, q_live, q_body,
        jnp.full((cap_hpad,), flat_n, jnp.int32))[:cap_hits]
    pair_idx = jnp.where(
        jnp.arange(cap_hits) < pair_count, pair_idx, flat_n)
    pair_valid = jnp.bool_(True)
    safe_idx = jnp.minimum(pair_idx, flat_n - 1)
    rows = safe_idx // slots_r
    positions = jnp.where(pair_idx < flat_n, pos_idx[rows], chunk_len)
    motif_ids = jnp.minimum(
        jnp.take(lanes_out.reshape(-1), safe_idx), mcount - 1)

    lanes = multi_kernel._lanes_for(k)
    rpb_r = multi_kernel.MAX_MK // lanes
    if rsplits is not None and m_max > rpb_r:
        fscores = rescore_multi_staged(
            chunk, pssms, positions, motif_ids, pair_count,
            rsplits, rpb_r)
    else:
        fscores = rescore_multi(chunk, pssms, positions, motif_ids,
                                n_live=pair_count, pre4=pre4)
    keep = (
        (pair_idx < flat_n)
        & (positions < n_valid_here[0, motif_ids])
        & (fscores >= thresholds[motif_ids])
    )
    n_kept = jnp.sum(keep.astype(jnp.int32))
    # sort kept hits by (position, motif): the compaction emits
    # ascending slot indices, so pair_idx already orders
    # (position, extraction slot) == (position, motif lane)
    key = jnp.where(keep, pair_idx, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    packed = jnp.stack([
        jnp.take(positions, order),
        jnp.take(motif_ids, order),
        jax.lax.bitcast_convert_type(jnp.take(fscores, order), jnp.int32),
    ])
    hit_need = jnp.maximum(
        jnp.maximum(pairs_total, pair_count),
        jnp.where(rmax > slots_r, rmax * 4096, 0),
    )
    valid = (pos_valid & pair_valid).astype(jnp.int32)
    return jnp.stack([pos_count, hit_need, n_kept, valid]), packed


@functools.partial(jax.jit, static_argnames=("chunk_len", "cap", "dense"))
def scan_multi_segment(seq, off, n_valid_here, dms, pssms, lengths,
                       t_scaled, thresholds, chunk_len: int, cap: int,
                       dense: bool = False):
    """Fused multi-motif scan of one segment, fully reduced on device.

    Transfer-frugal protocol (see ``xla_ops.scan_segment``): the
    segment is sliced in-program, accepted hits are front-compacted,
    and the host reads ``counts[2]`` plus a packed ``[3, :n_kept]``
    array of (position, motif_id, score bits).

    ``n_valid_here``: int32 ``[M]`` -- window starts of each motif that
    this segment owns (the caller subtracts the offset and clips).
    """
    from . import xla_ops

    chunk = jax.lax.dynamic_slice(seq, (off,), (chunk_len,))
    dscores = score_multi_u8(chunk, dms, lengths, n_valid_here)  # [C, M]
    mask = (dscores >= t_scaled[None, :]).reshape(-1)
    count, idx, valid = xla_ops.compact_mask(mask, cap, dense)
    mcount = dms.shape[0]
    positions = (idx // mcount).astype(jnp.int32)
    motif_ids = (idx % mcount).astype(jnp.int32)
    fscores = rescore_multi(chunk, pssms, positions, motif_ids,
                            n_live=count)
    keep = (
        (idx < mask.shape[0])
        & (positions < n_valid_here[jnp.minimum(motif_ids, mcount - 1)])
        & (fscores >= thresholds[jnp.minimum(motif_ids, mcount - 1)])
    )
    n_kept = jnp.sum(keep.astype(jnp.int32))
    key = jnp.where(keep, idx, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    packed = jnp.stack([
        jnp.take(positions, order),
        jnp.take(motif_ids, order),
        jax.lax.bitcast_convert_type(jnp.take(fscores, order), jnp.int32),
    ])
    # same 4-entry counts convention as scan_multi_core (its single
    # capacity plays both the candidate and the hit role)
    return jnp.stack(
        [count, count, n_kept, valid.astype(jnp.int32)]), packed
