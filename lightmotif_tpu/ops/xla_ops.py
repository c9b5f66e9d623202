"""Pure-XLA compute primitives for PSSM scanning.

These are the *reference* device implementations: correct, jittable, and
reasonably fast.  The Pallas kernels in :mod:`lightmotif_tpu.ops.kernels`
must match them bit-for-bit (they are the TPU analogue of the reference's
"generic backend parity" test pattern, ``lightmotif/tests/dna.rs``).

Design notes (TPU-first):

* sequences are flat padded ``int8`` arrays -- no Farrar striping; XLA
  picks layouts, and halo handling is a static-offset slice;
* f32 scoring selects PSSM entries with a K-way ``where`` chain (exact --
  no matmul rounding) and accumulates the ``m`` motif-row terms with an
  in-order chain of f32 adds, reproducing the reference's sequential
  summation (``pli/mod.rs:96-105``) so scores are bit-identical;
* the discrete pre-filter one-hot-encodes the sequence to ``int8`` and
  multiplies with the u8 matrix on the MXU, accumulating in ``int32``.
  The int32 sum upper-bounds the reference's saturating-u8 sum, which
  itself upper-bounds the f32 score, so the over-estimate invariant of
  the two-pass scan (``pwm/mod.rs:722-730``) is preserved;
* variable-length hit lists use fixed-capacity compaction
  (``jnp.nonzero(..., size=cap)``) with an exact count for overflow
  detection and host-side retry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pad_length",
    "score_f32",
    "score_u8",
    "max_last",
    "argmax_last",
    "threshold_positions",
    "compact_mask",
    "rescore_positions",
    "scan_segment",
]

#: Pad sequences to a multiple of this many positions (one f32 VREG row
#: of 8x128, times 8 for good measure).
PAD_MULTIPLE = 8192


def pad_length(n: int, multiple: int = PAD_MULTIPLE) -> int:
    return max(multiple, -(-n // multiple) * multiple)


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------


def lookup_rows(seq: jax.Array, pssm: jax.Array) -> jax.Array:
    """``P[j, p] = pssm[j, seq[p]]`` via an exact K-way select chain.

    ``seq``: int8/int32 ``[L]``; ``pssm``: ``[m, K]`` (f32 or int32).
    Returns ``[m, L]``.  The select chain is exact (no arithmetic), so
    f32 parity is preserved.
    """
    k = pssm.shape[1]
    seq = seq.astype(jnp.int32)
    # default: wildcard (rank K-1)
    out = jnp.broadcast_to(pssm[:, k - 1][:, None], (pssm.shape[0], seq.shape[0]))
    for sym in range(k - 2, -1, -1):
        out = jnp.where(seq[None, :] == sym, pssm[:, sym][:, None], out)
    return out


def score_f32(seq: jax.Array, pssm: jax.Array, n_scores: int) -> jax.Array:
    """Score every window start; exact f32 parity with the reference.

    ``seq``: padded int8 ``[Lp]`` (padding = wildcard); ``pssm``:
    f32 ``[m, K]``; ``n_scores``: number of valid positions
    (``len - m + 1``).  Returns f32 ``[Lp]`` where positions >=
    ``n_scores`` are ``-inf``.
    """
    m = pssm.shape[0]
    lp = seq.shape[0]
    lut = lookup_rows(seq, pssm)  # [m, Lp]
    acc = lut[0]
    for j in range(1, m):
        # shift row j left by j: term[p] = pssm[j, seq[p+j]]
        term = jnp.concatenate([lut[j, j:], jnp.zeros((j,), lut.dtype)])
        acc = acc + term
    pos = jax.lax.broadcasted_iota(jnp.int32, (lp,), 0)
    return jnp.where(pos < n_scores, acc, -jnp.inf)


def score_u8(seq: jax.Array, dm: jax.Array, n_scores: int) -> jax.Array:
    """Discrete pre-filter scores in int32 (>= the reference u8 scores).

    ``dm``: uint8 ``[m, K]`` discrete matrix.  Uses a one-hot MXU
    matmul: ``P = onehot(seq) @ dm.T`` accumulated in int32, then a
    static banded sum ``score[p] = sum_j P[p+j, j]``.  Invalid positions
    get ``-1``.
    """
    m, k = dm.shape
    lp = seq.shape[0]
    # One-hot in bf16 (0/1 exact) against the u8 matrix in bf16 (ints
    # 0..255 are exact in bf16), f32 accumulation: every partial product
    # and sum is an exactly-representable integer, so the MXU matmul is
    # exact while running at full bf16 rate.
    onehot = (
        seq.astype(jnp.int32)[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    ).astype(jnp.bfloat16)
    p = jax.lax.dot_general(
        onehot,
        dm.astype(jnp.bfloat16).T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # [Lp, m]
    acc = p[:, 0]
    for j in range(1, m):
        term = jnp.concatenate([p[j:, j], jnp.zeros((j,), jnp.int32)])
        acc = acc + term
    # clamp to u8 range: equals the reference's stepwise saturating add
    # (partial sums are monotone non-decreasing), avx2.rs:292-347
    acc = jnp.minimum(acc, 255)
    pos = jax.lax.broadcasted_iota(jnp.int32, (lp,), 0)
    return jnp.where(pos < n_scores, acc, -1)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


def max_last(scores: jax.Array) -> jax.Array:
    return jnp.max(scores)


def argmax_last(scores: jax.Array) -> jax.Array:
    """Index of the maximum; *last* occurrence wins (reference ``>=``
    tie rule)."""
    m = jnp.max(scores)
    pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    return jnp.max(jnp.where(scores == m, pos, -1))


#: Segment width of the hierarchical compaction.
_SEG = 512

#: Dense compaction uses cumsum+searchsorted up to this capacity and
#: the full-length sort (nonzero) beyond it.
_DENSE_SEARCH_CAP = 1 << 17

#: Queries per searchsorted block in the dense path's live loop.
_QUERY_BLOCK = 1 << 12


def threshold_positions(scores: jax.Array, threshold, cap: int,
                        dense: bool = False):
    """Fixed-capacity compaction of ``scores >= threshold``.

    Returns ``(count, indices[cap], valid)``; see :func:`compact_mask`.
    """
    return compact_mask(scores >= threshold, cap, dense)


def compact_mask(mask: jax.Array, cap: int, dense: bool = False):
    """Fixed-capacity compaction of the set indices of a boolean mask.

    Returns ``(count, indices[cap], valid)``: ``count`` is the exact
    number of set bits; unused index slots hold an out-of-range
    sentinel; ``valid`` is False when the indices are incomplete
    because the set bits spread over more segments than the internal
    capacity (the caller should then retry with the ``dense`` full-sort
    path at the *same* exact-count-sized capacity -- never a blind
    doubling ladder).  ``count > cap`` also requires a retry.

    ``jnp.nonzero`` lowers to a full-length sort on TPU (~50 ms on a
    genome); instead the compaction is hierarchical: per-segment
    candidate counts (one cheap reduction), a tiny sort over the segment
    indices, a gather of only the active segments, and a small sort to
    extract positions.  ``dense=True`` selects the full-sort path
    directly (always valid, exact for any density).
    """
    orig_n = mask.shape[0]
    if dense:
        if cap <= _DENSE_SEARCH_CAP or cap * 32 < orig_n:
            # k-th-set-bit extraction via cumsum + searchsorted: ~3x
            # faster than the full-length sort nonzero lowers to
            # (11.6 ms vs 37.5 ms on a 4M mask at cap 64k); the
            # cap*log(N) random gathers lose past ~512k on masks of a
            # few M -- but when cap << N (the database-scale word
            # compactions: cap ~1M over a 67M flat mask) the gathers
            # are far cheaper than sorting N, so the sort path only
            # takes over when cap is within a factor ~32 of N
            csum = jnp.cumsum(mask.astype(jnp.int32))
            count = csum[-1]
            if cap >= 4 * _QUERY_BLOCK:
                # blocked queries: searchsorted gathers are the cost
                # (cap x log2(N) random reads), and a retry-ratcheted
                # cap routinely sits 1.6x above the live count --
                # loop over live 4096-query blocks only, so device
                # cost tracks the actual set-bit count
                qblk = _QUERY_BLOCK
                cap_pad = -(-cap // qblk) * qblk
                live = jnp.minimum(
                    (count + qblk - 1) // qblk, cap_pad // qblk)

                def body(i, out):
                    q = i * qblk + jnp.arange(1, qblk + 1,
                                              dtype=jnp.int32)
                    idx_b = jnp.searchsorted(
                        csum, q, side="left").astype(jnp.int32)
                    return jax.lax.dynamic_update_slice(
                        out, idx_b, (i * qblk,))

                idx = jax.lax.fori_loop(
                    0, live, body,
                    jnp.full((cap_pad,), orig_n, jnp.int32))[:cap]
            else:
                idx = jnp.searchsorted(
                    csum, jnp.arange(1, cap + 1, dtype=jnp.int32),
                    side="left").astype(jnp.int32)
            idx = jnp.where(jnp.arange(cap) < count, idx, orig_n)
            return count, idx, jnp.bool_(True)
        count = jnp.sum(mask.astype(jnp.int32))
        (idx,) = jnp.nonzero(mask, size=cap, fill_value=orig_n)
        return count, idx.astype(jnp.int32), jnp.bool_(True)
    n = orig_n
    if n % _SEG:
        pad = _SEG - n % _SEG
        mask = jnp.concatenate([mask, jnp.zeros((pad,), jnp.bool_)])
        n = mask.shape[0]
    n_segs = n // _SEG
    seg_cap = max(64, min(n_segs, -(-cap // _SEG)))

    count = jnp.sum(mask.astype(jnp.int32))

    seg_counts = mask.reshape(n_segs, _SEG).sum(axis=1)
    active = seg_counts > 0
    n_active = jnp.sum(active.astype(jnp.int32))
    (seg_ids,) = jnp.nonzero(active, size=seg_cap, fill_value=n_segs)

    base = seg_ids.astype(jnp.int32) * _SEG  # sentinel segs -> n (clipped)
    offs = jax.lax.broadcasted_iota(jnp.int32, (seg_cap, _SEG), 1)
    gpos = jnp.minimum(base[:, None] + offs, n - 1)
    local = mask[gpos.reshape(-1)]
    lmask = local & (
        (base[:, None] + offs).reshape(-1) < orig_n
    ) & (seg_ids[:, None] < n_segs).repeat(_SEG, axis=1).reshape(-1)
    (li,) = jnp.nonzero(lmask, size=cap, fill_value=lmask.shape[0])
    allpos = jnp.concatenate(
        [(base[:, None] + offs).reshape(-1), jnp.array([orig_n], jnp.int32)]
    )
    idx = allpos[jnp.minimum(li, lmask.shape[0])]
    return count, idx.astype(jnp.int32), n_active <= seg_cap


def rescore_positions(seq: jax.Array, pssm: jax.Array, positions: jax.Array):
    """Exact f32 scores of selected window starts.

    ``positions``: int32 ``[cap]`` (may contain out-of-range sentinels --
    callers must mask).  Sequential j-order adds for parity with
    ``ScoringMatrix::score_position`` (``pwm/mod.rs:651-662``).
    """
    m = pssm.shape[0]
    lp = seq.shape[0]
    safe = jnp.minimum(positions, lp - m)
    safe = jnp.maximum(safe, 0)
    acc = jnp.zeros(positions.shape, jnp.float32)
    for j in range(m):
        sym = seq[safe + j].astype(jnp.int32)
        k = pssm.shape[1]
        val = jnp.broadcast_to(pssm[j, k - 1], positions.shape)
        for s in range(k - 2, -1, -1):
            val = jnp.where(sym == s, pssm[j, s], val)
        acc = acc + val
    return acc


# ---------------------------------------------------------------------------
# fused scan step
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("chunk_len", "cap", "dense"),
    donate_argnums=(),
)
def scan_segment(seq, off, n_here, dm, pssm, t_scaled, threshold,
                 chunk_len: int, cap: int, dense: bool = False):
    """Two-pass scan of one segment, sliced and fully reduced on device.

    Built for a remote/tunneled TPU where host<->device bytes dominate:
    the segment slice happens in-program, accepted hits are compacted to
    the *front* of fixed buffers, and the host needs only ``counts``
    (2 ints) plus ``positions[:n_kept]`` / ``scores[:n_kept]``.

    ``off`` and ``n_here`` are dynamic (no recompile per segment);
    ``seq`` must be padded so ``off + chunk_len <= len(seq)`` for every
    segment.  Returns ``(counts[3] = [exact_candidates, n_kept, valid],
    positions[cap], scores[cap])`` with accepted hits front-compacted in
    ascending position order.

    ``dense=False`` uses the cheap hierarchical compaction (best when
    candidates are sparse); ``valid == 0`` in the result means the
    candidates spread over more segments than its internal capacity and
    the caller must retry once with ``dense=True`` (full-length
    ``nonzero``; one sort, exact for any density) at a capacity sized
    from the *exact* candidate count.
    """
    from . import kernels

    chunk = jax.lax.dynamic_slice(seq, (off,), (chunk_len,))
    dscores = kernels.score_u8(chunk, dm, chunk_len)
    pos = jax.lax.broadcasted_iota(jnp.int32, dscores.shape, 0)
    dscores = jnp.where(pos < n_here, dscores, -1)
    count, idx, valid = threshold_positions(dscores, t_scaled, cap, dense)
    fscores = rescore_positions(chunk, pssm, idx)
    keep = (idx < n_here) & (fscores >= threshold)
    # front-compact accepted hits; threshold_positions returns unsorted
    # segment-grouped indices, so order by position for the iterator.
    n_kept = jnp.sum(keep.astype(jnp.int32))
    key = jnp.where(keep, idx, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    positions = jnp.take(idx, order)
    scores = jnp.take(fscores, order)
    # pack (positions, score bits) in one array: one host transfer
    packed = jnp.stack(
        [positions, jax.lax.bitcast_convert_type(scores, jnp.int32)]
    )
    return jnp.stack([count, n_kept, valid.astype(jnp.int32)]), packed
