"""Two-pass thresholded scanner.

TPU re-design of the reference ``Scanner`` (``lightmotif/src/scan.rs``):
the cheap quantized pre-filter and the exact f32 rescore are *fused into
one jitted device program* (``ops.xla_ops.scan_segment``) instead of a
host loop over 256-row blocks:

1. int32 discrete scores for every position via a one-hot MXU matmul
   (an over-estimate of the f32 score, like the reference's u8 matrix);
2. fixed-capacity compaction of candidates above the scaled threshold;
3. exact f32 rescore of the candidates (sequential-order adds);
4. final f32 threshold mask.

Variable-length output is handled with a single exact-count retry: if
candidates overflow (or spread past) the hierarchical compaction, the
segment re-scans once with a dense full-sort compaction sized from the
exact candidate count.  Long sequences are processed in fixed
size segments with a (motif_len - 1)-position halo -- the same overlap
rule as the reference's wrap rows (``seq.rs:369-381``) -- so device
memory stays bounded and compiled programs are reused across segments.
"""

from __future__ import annotations

import functools

import numpy as np

from .matrix import ScoringMatrix
from .ops import xla_ops
from .ops.pipeline import DeviceSequence, _as_device_seq

__all__ = ["Hit", "Scanner", "MultiHit", "MultiScanner"]

#: Number of positions scored per device invocation.  Large enough that
#: a bacterial genome is one dispatch: on a remote/tunneled TPU the
#: per-call round trip, not device time, dominates the scan.
DEFAULT_SEGMENT = 1 << 23

#: Initial candidate-buffer capacity per segment.
DEFAULT_CAPACITY = 1 << 16

#: Hit-buffer head fetched together with the counters in ONE transfer;
#: a second round trip happens only when a segment keeps more hits.
#: On a remote/tunneled TPU each blocking fetch costs a full round
#: trip, so the common sparse-hit case pays exactly one.
HEAD_SLOTS = 8192


def head_width(hint: int, cap: int) -> int:
    """Hit-head fetch width for a sticky ``n_kept`` hint.

    Snapped to a +25% ladder (8192, 16384, 24576, 32768, 40960, 51200,
    64000, 80000, 100000, ...) so shape churn -- every distinct slice
    width is a separate compiled program on the remote chip -- stays
    bounded (~12 widths to 128k, logarithmic beyond) while the head
    transfer wastes at most 25% over the hint.  The previous 8x ladder
    (8192, 65536, 524288) shipped up to 1.83x the live hit payload on
    whole-database scans: 71,730 hits fetched a 131,072-slot head =
    1.57 MB at the tunnel's 15-38 MB/s, ~10 ms of pure padding
    (experiments/headfetch_probe2.out: best wall 0.141 -> 0.131 s on
    jasparfull with the 81,920-slot head).
    """
    width = HEAD_SLOTS
    while width < hint:
        width += max(HEAD_SLOTS, width >> 2)
    return min(cap, width)


def _scan_buffer(cached, dseq_data, need: int, wildcard: int):
    """Device scan buffer padded so every ``[off, off + chunk_len)``
    in-program slice is in bounds; reuses ``dseq_data`` when already big
    enough, otherwise pads on device (the genome never crosses the host
    link)."""
    import jax.numpy as jnp

    if cached is not None and int(cached.shape[0]) >= need:
        return cached
    lp = int(dseq_data.shape[0])
    if lp >= need:
        return dseq_data
    return jnp.concatenate(
        [dseq_data, jnp.full((need - lp,), wildcard, jnp.int8)]
    )


@functools.lru_cache(maxsize=1)
def _dense_motif_scan_fn():
    """Jitted one-pass exact scan of a single motif: full f32 scoring
    with the production kernel + threshold compaction.  No u8
    prefilter and no rescore -- the scores ARE exact, so every
    compacted index is a final hit.  Used for motifs where the u8
    quantization degenerates (long motifs: the ceil over-estimate
    slack grows as ~m/255 of the score span, and by m ~ 100 nearly
    every position passes the discrete test, so two-pass scanning does
    more work than scoring everything at the kernel's 29 Gpos/s).
    """
    import jax
    import jax.numpy as jnp

    from .ops import kernels

    def fn(data, pssm, threshold, n_valid, n_scores: int, cap: int,
           dense: bool):
        # n_scores is a BUCKET-stable upper bound (a function of the
        # padded genome and the bucketed motif length only), so one
        # compiled program serves every true length in the bucket;
        # the per-motif validity boundary arrives as the TRACED
        # n_valid <= n_scores.  Positions in [n_valid, n_scores) hold
        # well-defined garbage (wildcard-padded windows, never NaN --
        # PSSMs contain no +inf) and are masked here.
        scores = kernels.score_f32(data, pssm, n_scores)
        pos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        mask = (scores >= threshold) & (pos < n_valid)
        count, idx, valid = xla_ops.compact_mask(mask, cap, dense)
        safe = jnp.minimum(idx, scores.shape[0] - 1)
        svals = jnp.where(idx < n_valid, scores[safe], -jnp.inf)
        n_kept = jnp.minimum(count, cap)
        packed = jnp.stack(
            [idx, jax.lax.bitcast_convert_type(svals, jnp.int32)])
        return (jnp.stack([count, n_kept, valid.astype(jnp.int32)]),
                packed)

    return jax.jit(fn, static_argnames=("n_scores", "cap", "dense"))


@functools.total_ordering
class Hit:
    """A scored position (reference ``scan.rs:53-92``): ordered by
    (score, position)."""

    __slots__ = ("position", "score")

    def __init__(self, position: int, score: float):
        if np.isnan(score):
            raise ValueError("hit score cannot be NaN")
        self.position = int(position)
        self.score = float(score)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Hit)
            and other.position == self.position
            and other.score == self.score
        )

    def __lt__(self, other) -> bool:
        if self.score != other.score:
            return self.score < other.score
        return self.position < other.position

    def __repr__(self) -> str:  # pragma: no cover
        return f"Hit(position={self.position}, score={self.score})"


def _seq_ranks(seq) -> np.ndarray:
    from .sequence import EncodedSequence, StripedSequence

    if isinstance(seq, StripedSequence):
        seq = seq.unstripe()
    if isinstance(seq, EncodedSequence):
        return np.asarray(seq.data)
    if isinstance(seq, DeviceSequence):
        import jax

        return np.asarray(jax.device_get(seq.data))[: seq.length]
    raise TypeError(f"cannot extract symbols from {type(seq).__name__}")


def _reference_max(pssm, dm, seq, threshold: float,
                   lanes: int = 32, block_size: int = 256):
    """Host replay of the reference's ``Scanner::max`` rising-cutoff
    algorithm (``scan.rs:200-249``), bit-faithful to the AVX2 layout.

    Reproduced quirks:

    - the discrete cutoff starts at ``scale(threshold)`` and rises to
      the *quantized* score of each accepted candidate (``scan.rs:236``),
      so later candidates with a higher exact score but lower quantized
      score can be skipped;
    - candidates are visited in striped order (row within block, then
      lane; position = lane * rows + row) because acceptance depends on
      visit order once the cutoff starts rising;
    - unlike ``Scanner::next`` (``scan.rs:183``), no ``index + m <=
      len`` mask is applied, so default-symbol padding windows past the
      sequence end are scored and can be returned;
    - the first accepted candidate does not raise the cutoff
      (``scan.rs:244-246`` sets ``best`` without ``best_discrete``).
    """
    ranks = _seq_ranks(seq)
    m = len(pssm)
    L = int(ranks.shape[0])
    if L == 0 or m == 0:
        return None
    rows = -(-L // lanes)  # ceil: striped row count (pli/mod.rs:183)
    n_cells = rows * lanes
    default_idx = pssm.alphabet.default_index
    ext = np.full(n_cells + m, default_idx, dtype=np.int64)
    ext[:L] = ranks

    # u8 scores of every striped cell: stepwise saturating adds equal
    # one final clamp because the addends are non-negative
    dmat = np.asarray(dm.data, dtype=np.uint32)
    acc = np.zeros(n_cells, dtype=np.uint32)
    for j in range(m):
        acc += dmat[j][ext[j : j + n_cells]]
    dall = np.minimum(acc, 255)
    # grid[r, c] = dall[c * rows + r]
    grid = dall.reshape(lanes, rows).T

    pmat = np.asarray(pssm.data, dtype=np.float32)

    best = None  # (index, score)
    best_d = int(dm.scale(threshold))
    for row0 in range(0, rows, block_size):
        blk = grid[row0 : min(row0 + block_size, rows)]
        if int(blk.max(initial=0)) < best_d:
            continue
        cand = np.argwhere(blk >= best_d)  # row-major visit order
        if cand.shape[0] == 0:
            continue
        # Vectorized exact rescore of the block's candidate superset
        # (the cutoff can rise while the block is replayed, so this
        # may score a few candidates the scalar loop would skip --
        # harmless, the acceptance replay below still skips them).
        # Elementwise np.float32 adds in ascending-j order are the
        # same IEEE operations as the scalar per-candidate loop, so
        # every score is bit-identical; this removes the O(candidates
        # x m) Python inner loop that made genome-scale permissive
        # thresholds minutes-slow (round-4 verdict item 7) -- host
        # cost is now O(candidates) cheap compares after O(m) numpy
        # passes per block.
        idx_arr = (cand[:, 1].astype(np.int64) * rows
                   + row0 + cand[:, 0])
        acc = np.zeros(idx_arr.shape[0], dtype=np.float32)
        for j in range(m):
            acc = acc + pmat[j, ext[idx_arr + j]]
        d_arr = blk[cand[:, 0], cand[:, 1]]
        for d, index, score in zip(
                d_arr.tolist(), idx_arr.tolist(), acc.tolist()):
            if d < best_d:
                continue
            if best is None:
                best = (index, score)
            elif score > best[1] or (score == best[1] and index > best[0]):
                best = (index, score)
                best_d = d
    return Hit(best[0], best[1]) if best is not None else None


class Scanner:
    """Iterator over hits of a PSSM in a sequence above a threshold."""

    def __init__(
        self,
        pssm: ScoringMatrix,
        seq,
        threshold: float = 0.0,
        block_size: int = DEFAULT_SEGMENT,
        capacity: int = DEFAULT_CAPACITY,
    ):
        self.pssm = pssm
        self.dm = pssm.to_discrete()
        self.seq = seq
        self.threshold = float(threshold)
        self.block_size = int(block_size)
        self.capacity = int(capacity)
        self._dseq = _as_device_seq(seq)
        self._scan_data = None  # lazily-built scan buffer (halo-padded)
        # sticky dense-compaction mode, STARTING dense: at genome scale
        # candidates spread over more segments than the hierarchical
        # pass's internal capacity on almost every realistic threshold,
        # and its validity retry costs a full extra dispatch + tunnel
        # round trip -- while the dense k-th-set-bit compaction
        # (cumsum + blocked searchsorted) now costs only a few ms.
        # Measured: mesh-of-1 fresh scan 276 -> ~60 ms after the
        # equivalent flip (experiments/meshone_probe.py).
        self._dense = True
        self._t_scaled_override = None  # used by max()

    # -- internals ----------------------------------------------------------

    def _scan_segments(self):
        """Yield (positions, scores) arrays of accepted hits per segment.

        Device-round-trip-frugal protocol (the TPU may sit behind a
        slow tunnel): one fused dispatch per segment slices the segment
        in-program and front-compacts accepted hits, and the host
        transfers 2 counters plus only the ``n_kept`` live entries.
        """
        import jax
        import jax.numpy as jnp

        dseq = self._dseq
        m = len(self.pssm)
        n_total = max(dseq.length - m + 1, 0)
        if n_total == 0:
            return

        pssm_dev = jnp.asarray(np.asarray(self.pssm.data, dtype=np.float32))
        dm_dev = jnp.asarray(np.asarray(self.dm.data, dtype=np.uint8))
        t_scaled = getattr(self, "_t_scaled_override", None)
        if t_scaled is None:
            t_scaled = np.int32(self.dm.scale(self.threshold))

        from .ops import kernels

        # segment length is a multiple of the Pallas kernel geometry;
        # each device chunk carries one extra geometry block as halo
        # (covers the motif window and keeps the fast path engaged)
        unit = kernels.preferred_pad()
        if m - 1 > unit:
            raise ValueError(
                f"motif length {m} exceeds the segment halo unit "
                f"({unit}); windows would cross segment boundaries")
        seg = max(unit, min(self.block_size, xla_ops.pad_length(n_total, unit)))
        seg = xla_ops.pad_length(seg, unit)
        chunk_len = seg + unit

        # scan-owned device buffer padded so every in-program slice
        # ``[off, off + chunk_len)`` is in bounds
        n_segments = -(-n_total // seg)
        need = (n_segments - 1) * seg + chunk_len
        data = self._scan_data = _scan_buffer(
            self._scan_data, dseq.data, need,
            self.pssm.alphabet.default_index)

        off = 0
        dense = self._dense
        while off < n_total:
            n_here = min(seg, n_total - off)
            cap = self.capacity
            while True:
                counts, packed = xla_ops.scan_segment(
                    data,
                    np.int32(off),
                    np.int32(n_here),
                    dm_dev,
                    pssm_dev,
                    t_scaled,
                    np.float32(self.threshold),
                    chunk_len,
                    cap,
                    dense,
                )
                # one blocking transfer fetches the counters AND the
                # front-compacted hit head; most segments need nothing
                # more (hits are sparse), so the per-segment cost is a
                # single tunnel round trip
                head = packed[:, : min(cap, HEAD_SLOTS)]
                counts_h, head_h = jax.device_get((counts, head))
                count, n_kept, valid = (int(v) for v in counts_h)
                if count <= cap and valid:
                    break
                # retry with the dense full-sort compaction, sized from
                # the EXACT candidate count (never a doubling ladder);
                # once a scan goes dense it stays dense (same threshold)
                dense = True
                if count > cap:
                    cap = max(cap, 1 << (count - 1).bit_length())
            self.capacity = cap
            self._dense = dense
            if n_kept:
                if n_kept <= head_h.shape[1]:
                    arr = np.asarray(head_h[:, :n_kept])
                else:
                    arr = np.asarray(jax.device_get(packed[:, :n_kept]))
                positions = arr[0]
                scores = arr[1].view(np.float32)
                yield positions + off, scores
            off += seg

    # -- public API -----------------------------------------------------------

    def __iter__(self):
        for positions, scores in self._scan_segments():
            order = np.argsort(positions, kind="stable")
            for p, s in zip(positions[order], scores[order]):
                yield Hit(int(p), float(s))

    def collect(self) -> list:
        return list(self)

    def max(self, mode: str = "exact"):
        """Best hit among the discrete candidates; ties resolve to the
        larger position (``scan.rs:200-249``).

        Parity note: like the reference, the returned hit's exact f32
        score may be *below* the threshold -- candidacy is decided by
        the over-estimating discrete filter, and the best exact score
        among candidates wins.

        ``mode="exact"`` (default) is an intentional deviation: the
        reference progressively RAISES its discrete cutoff to the
        accepted candidate's quantized score (``scan.rs:236``), which
        can skip a later candidate whose exact score is higher but
        whose quantized score is lower (uneven over-estimation).  This
        implementation keeps the cutoff at ``scale(threshold)``, so it
        evaluates a superset of the reference's candidates and always
        returns the true best exact score among them.

        ``mode="reference"`` replays the reference's rising-cutoff
        algorithm exactly (AVX2 geometry: 32 lanes, 256-row blocks,
        striped candidate order, including its unmasked padding windows
        at indices past ``len - m``), for behavioral parity testing.
        """
        if mode == "reference":
            return _reference_max(
                self.pssm, self.dm, self.seq, self.threshold)
        if mode != "exact":
            raise ValueError(f"unknown max mode {mode!r}")
        saved = self.threshold
        best = None
        try:
            # keep every discrete candidate: the f32 keep-filter uses
            # -inf while the u8 cutoff still comes from the threshold
            self.threshold = -np.inf

            import jax

            # _scan_segments derives t_scaled from self.threshold; do it
            # manually so the discrete cutoff stays at the real threshold
            t_scaled = np.int32(self.dm.scale(saved))
            for positions, scores in self._scan_segments_raw(t_scaled):
                if positions.size:
                    i = int(np.lexsort((positions, scores))[-1])
                    cand = Hit(int(positions[i]), float(scores[i]))
                    if best is None or cand > best:
                        best = cand
        finally:
            self.threshold = saved
        return best

    def _scan_segments_raw(self, t_scaled):
        """Like ``_scan_segments`` but with an explicit discrete cutoff
        (used by :meth:`max`, where the f32 filter is disabled)."""
        self._t_scaled_override = t_scaled
        try:
            yield from self._scan_segments()
        finally:
            self._t_scaled_override = None


class MultiHit(Hit):
    """A hit annotated with the motif that produced it."""

    __slots__ = ("motif",)

    def __init__(self, motif: int, position: int, score: float):
        super().__init__(position, score)
        self.motif = int(motif)

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"MultiHit(motif={self.motif}, position={self.position}, "
            f"score={self.score})"
        )


class MultiScanner:
    """Scan many PSSMs over a sequence in one fused device program.

    TPU-native replacement for the reference CLI's (motif x sequence)
    thread pool: all motifs score simultaneously on the MXU
    (:mod:`lightmotif_tpu.ops.multi`).  ``thresholds`` may be a scalar
    or one value per motif.
    """

    def __init__(self, pssms, seq=None, thresholds=0.0,
                 capacity: int = DEFAULT_CAPACITY,
                 single_bucket: bool = False):
        from .ops import multi

        self.pssms = list(pssms)
        if not self.pssms:
            raise ValueError("no motifs given")
        #: bucket every motif group to ONE shared contraction width
        #: (the longest live motif) so a whole-database scan compiles a
        #: single fused program instead of one per length bucket.
        #: Per-scan device cost rises ~1.5x for the short groups, but a
        #: one-shot consumer (the CLI) saves one 10-60 s remote
        #: compile/load per extra program -- the dominant cold/warm
        #: wall on a tunneled chip.  Library users who rescan genomes
        #: keep the per-length buckets (default).
        self.single_bucket = bool(single_bucket)
        k = self.pssms[0].alphabet.size
        self.dms = [p.to_discrete() for p in self.pssms]
        self.pssm_stack, self.lengths = multi.stack_motifs(
            [np.asarray(p.data, np.float32) for p in self.pssms], k
        )
        self.dm_stack, _ = multi.stack_motifs(
            [d.data.astype(np.float32) for d in self.dms], k
        )
        if np.isscalar(thresholds):
            thresholds = [float(thresholds)] * len(self.pssms)
        self.thresholds = np.asarray(thresholds, dtype=np.float32)
        self.t_scaled = np.asarray(
            [d.scale(t) for d, t in zip(self.dms, self.thresholds)],
            dtype=np.int32,
        )
        self.capacity = int(capacity)
        self._dev = None  # device-cached packed motif data
        self._dense_dev = {}  # device-cached padded dense-path PSSMs
        self._dseq = None
        self._bound = None  # identity of the bound host sequence
        self._scan_data = None
        # seed the compaction mode at dense=True: the hierarchical
        # path overflows for essentially every database-scale group
        # (candidates spread over the whole genome), so the dense=False
        # program was compiled once, used once, and retried -- one
        # wasted 30-60 s remote compile plus a round trip per shape.
        # The dense path (cumsum + searchsorted k-th-set-bit) is ~1 ms
        # at the default capacity and always valid.
        self._dense = True
        self._group_state = {}  # per-motif-group (cap, dense) ratchets
        self._head_hint = {}  # per-group last n_kept: sizes the head
        self._routing = None  # cached (fused, short_idx, dense_idx)
        if seq is not None:
            self.bind(seq)

    def bind(self, seq) -> "MultiScanner":
        """Bind a (new) sequence; the packed motif database -- u8
        discretization, filter packing, and device uploads -- is
        reused, so scanning many genomes against one motif set pays the
        preparation cost once.

        Re-binding the *same* object (by identity) is a no-op: repeated
        scans of one genome reuse the device-resident copy instead of
        re-crossing the host link (don't mutate a bound sequence in
        place).
        """
        if seq is not None and self._dseq is not None and (
                seq is self._bound or seq is self._dseq):
            return self
        dseq = _as_device_seq(seq)
        want = self.pssms[0].alphabet
        if dseq.alphabet.symbols != want.symbols:
            raise ValueError(
                f"sequence alphabet {dseq.alphabet.symbols!r} does not "
                f"match the motif set's {want.symbols!r}")
        self._dseq = dseq
        self._bound = seq
        self._scan_data = None
        return self

    def scan(self, seq) -> list:
        """Scan a sequence with this motif set (equivalent to
        ``bind(seq).collect()``)."""
        return self.bind(seq).collect()

    def scan_arrays(self, seq):
        """Like :meth:`scan` but returns the
        ``(motif_ids, positions, scores)`` arrays."""
        return self.bind(seq).collect_arrays()

    #: Cap on the ``[segment, n_motifs]`` discrete-score matrix (int32
    #: elements) so device memory stays bounded for big motif sets.
    MAX_SEGMENT_ELEMS = 128 * 1024 * 1024

    #: Fused-path segment cap for genomes LARGER than one
    #: DEFAULT_SEGMENT.  Multi-segment genomes pipeline: every
    #: program queues back-to-back, ONE counters+heads fetch covers
    #: all of them, and each segment's hit-head transfer overlaps the
    #: next segment's compute -- the 50 Mbp biggenome row measured
    #: 1.117 s at 6 segments vs 1.009 s at 12 (226x AVX2).  Genomes
    #: that fit ONE DEFAULT_SEGMENT stay unsplit: a 2-way E. coli
    #: split measured a steady LOSS (0.271 vs 0.155 s,
    #: experiments/bench_r5_check{2,3}.out) -- the second program's
    #: fixed service cost is not hidden when there is no third
    #: segment behind it.  The plain single-motif Scanner keeps
    #: DEFAULT_SEGMENT outright: it fetches per segment, so splitting
    #: would add round trips instead of overlapping them.
    SEGMENT_CAP = 1 << 22

    #: Motifs per fused-prefilter pass.  Whole databases scan the
    #: device-cached genome once per group; per-group capacities
    #: ratchet and the phase-C/rescore live-block loops bound the
    #: [cap, M] stages, so the limit is where the any-candidate union
    #: stops being sparse.  Re-swept on whole JASPAR2024 x 2 strands
    #: AFTER unreachable-threshold pruning + the u16 first pass + the
    #: live-block loops (experiments/group_size_probe2.py): 512 ->
    #: 0.41 s, 1024 -> 0.38 s, 2048 (one group) -> 0.33 s -- pruning
    #: removed the loose motifs that used to saturate the union above
    #: ~1k motifs (the pre-pruning sweep said 512; its 2048 point cost
    #: 5.0 s).  Databases beyond 2048 LIVE motifs still group, which
    #: also bounds the [slots, M] filter uploads.
    GROUP_MOTIFS = 2048

    #: Motifs longer than this take the dense path (full exact f32
    #: scoring + compaction) instead of the two-pass prefilter.
    #: ``None`` (default) = everything the fused kernel geometry can
    #: serve (8 contraction blocks: DNA m <= 128, protein m <= 32) --
    #: since the u16 any-prefilter (round 3) the discrete test stays
    #: sharp at long m (slack ~m/65534 of the score span; the u8
    #: prefilter degenerated by m ~ 100, which used to force dense at
    #: 64).  Set a number to override the split point.
    DENSE_M_LIMIT: int | None = None

    @classmethod
    def dense_m_limit(cls, k: int) -> int:
        if cls.DENSE_M_LIMIT is not None:
            return cls.DENSE_M_LIMIT
        from .ops import multi_kernel

        return multi_kernel.MAX_BLOCKS * (
            multi_kernel.MAX_MK // multi_kernel._lanes_for(k))

    def _head_slots(self, key, cap: int) -> int:
        """Head-fetch width for one group: counters + the first
        ``head`` hit columns ship in ONE ``device_get``, so sizing the
        head from the group's decaying-max ``n_kept`` hint (snapped to
        the :func:`head_width` ladder for slice-shape stability) lets
        the steady-state hit fetch ride that single round trip instead
        of paying a second ``packed`` transfer.  Undersized heads
        (hits grew, or an earlier segment of a multi-segment scan)
        just fall back to the full ``packed`` fetch."""
        return head_width(self._head_hint.get(key, 0), cap)

    def _collect_raw(self):
        return self._fetch_raw(self._dispatch_raw())

    def _dispatch_raw(self):
        """Dispatch every device program for the bound sequence WITHOUT
        blocking on any result; returns a token for :meth:`_fetch_raw`.

        Splitting dispatch from fetch (round 3) does two things:

        * every (segment x motif-group) program queues back-to-back and
          ALL counters + hit heads come back in ONE transfer at fetch
          time -- a whole-database scan previously paid one blocking
          tunnel round trip per group, with the device idle in between;
        * a streaming consumer (the CLI flights) can dispatch batch
          ``n+1`` before fetching batch ``n``, overlapping device scan
          with host-side p-value/TSV formatting.

        The token pins the device sequence buffer, so a later
        ``bind()`` does not invalidate in-flight work; capacity-ratchet
        retries happen inside the fetch, per entry.
        """
        import jax
        import jax.numpy as jnp

        from .ops import multi

        dseq = self._dseq
        if dseq is None:
            raise ValueError("no sequence bound; use scan(seq)/bind(seq)")
        m_max = int(self.lengths.max())
        n_valid = np.maximum(dseq.length - self.lengths + 1, 0).astype(np.int32)
        n_total = int(n_valid.max(initial=0))
        if n_total == 0:
            return {"entries": []}

        from .ops import multi_kernel

        # segments must tile the fused kernel geometry (the any-kernel
        # tile can be any power-of-two divisor of multi_kernel.TILE)
        unit = max(xla_ops.PAD_MULTIPLE, multi_kernel.TILE)
        if m_max > unit:
            raise ValueError(f"motif longer than the halo unit ({unit})")
        mcount = len(self.pssms)
        k = self.pssms[0].alphabet.size
        if self._routing is None:
            # fixed per scanner (pssms + thresholds are immutable):
            # computed once, not per dispatch -- the streaming CLI
            # dispatches once per flight and the reachability bound +
            # length sort over a whole database cost ~1 ms each.
            #
            # Long motifs bypass the two-pass machinery entirely: the
            # u8 ceil over-estimate slack grows as ~m/255 of the score
            # span, and by m ~ 100 nearly every position is a discrete
            # candidate -- full exact f32 scoring + threshold
            # compaction (the dense path) is both exact and faster.
            # The fused prefilter then only needs the short subset.
            long_sel = self.lengths > self.dense_m_limit(k)
            # motifs whose thresholds provably no window reaches
            # contribute zero hits by construction: drop them from
            # packing entirely -- on JASPAR2024 at p<=1e-6 this halves
            # the motif groups (57% of the database is short motifs
            # that cannot reach the threshold) and skips their dense
            # dispatches
            live_sel = ~multi.unreachable_thresholds(
                self.pssm_stack, self.thresholds)
            short_idx = np.nonzero(~long_sel & live_sel)[0]
            m_short = int(self.lengths[short_idx].max()) \
                if short_idx.size else 0
            fused = short_idx.size > 0 and multi_kernel.supports_fused(
                m_short, k, int(short_idx.size))
            dense_idx = np.nonzero(long_sel & live_sel)[0] if fused \
                else np.zeros(0, np.int64)
            if not fused and short_idx.size == 0 and mcount:
                # every live motif is long (or none is live): dense
                # path alone (no windows pass)
                fused = True
                dense_idx = np.nonzero(live_sel)[0]
                short_idx = np.zeros(0, np.int64)
            # order the short subset by motif length so each group's
            # contraction-block bucket (and with it the phase-C window
            # gathers and the per-pair rescore width) matches its own
            # longest motif
            short_idx = short_idx[np.argsort(
                self.lengths[short_idx], kind="stable")]
            # NOT done: spilling the last contraction block's few
            # stragglers (e.g. JASPAR2024's two m=33 motifs behind
            # 2036 of m<=32) to the dense path.  Measured a net LOSS
            # (0.292 s vs 0.267 s whole-database steady): the saved
            # prefilter block (~26 ms of MXU work across the full
            # group width) is outweighed by each dense entry's
            # genome-length threshold compaction (~12 ms of cumsum +
            # searchsorted per motif) plus its kernel + fetch entries.
            self._routing = {"fused": fused, "short_idx": short_idx,
                             "dense_idx": dense_idx}
        fused = self._routing["fused"]
        short_idx = self._routing["short_idx"]
        dense_idx = self._routing["dense_idx"]
        # the fused any-prefilter materializes one int32 per position
        # (plus bounded [cap, M] stages); the windows path materializes
        # [segment, M] i32 scores PLUS the [segment, m_max*K] bf16
        # one-hot -- budget segments accordingly (bf16 counts half)
        if fused:
            density = 4
        else:
            density = max(mcount, 1) + (m_max * k + 1) // 2
        seg = max(unit, (self.MAX_SEGMENT_ELEMS // density) // unit * unit)
        # adaptive segmentation: genomes that fit one DEFAULT_SEGMENT
        # scan as ONE program (an E. coli-scale 2-way split measured a
        # steady-state LOSS, 0.271 vs 0.155 s -- the extra program's
        # fixed service cost is not hidden); larger genomes split at
        # SEGMENT_CAP so each segment's hit-head transfer overlaps the
        # next segment's compute (50 Mbp: 6 -> 12 segments measured
        # 1.117 -> 1.009 s = 226x AVX2)
        cap = (self.SEGMENT_CAP if n_total > DEFAULT_SEGMENT
               else DEFAULT_SEGMENT)
        seg = max(unit, min(seg, cap, xla_ops.pad_length(n_total, unit)))
        chunk_len = seg + unit

        n_segments = -(-n_total // seg)
        need = (n_segments - 1) * seg + chunk_len
        data = self._scan_data = _scan_buffer(
            self._scan_data, dseq.data, need,
            self.pssms[0].alphabet.default_index)

        # whole databases split into motif groups: each group scans the
        # device-cached genome in the sparse regime the any-prefilter
        # needs (at M in the thousands the union of candidate sets
        # saturates the genome and the [cap, M] stages blow past HBM)
        n_short = int(short_idx.size)
        gsize = min(self.GROUP_MOTIFS, n_short) if fused else mcount
        gstarts = list(range(0, n_short, gsize)) if gsize else []
        multi_group = len(gstarts) > 1

        if self._dev is not None and fused and "groups" not in self._dev:
            self._dev = None  # packed before a backend flip; rebuild
        if self._dev is None:
            # pack + upload the motif database once per scanner
            dev = {}
            if fused:
                rpb = multi_kernel.MAX_MK // multi_kernel._lanes_for(k)
                dev["groups"] = []
                for s in gstarts:
                    ids = short_idx[s:s + gsize]
                    gm = gsize if multi_group else len(ids)
                    # every per-group stack is sliced to the group's
                    # own bucket width (>= every group motif, << the
                    # database maximum): the prefilter's block count,
                    # the phase-C window matmul, and the rescore row
                    # loop all pay only this group's length.  With
                    # single_bucket every group shares the global live
                    # maximum so ONE compiled program serves them all.
                    m_bkt = int(self.lengths[short_idx].max()) \
                        if self.single_bucket \
                        else int(self.lengths[ids].max())
                    g = multi.pack_motif_group(
                        ids, gm,
                        multi.group_bucket(m_bkt, rpb, multi_group),
                        self.pssm_stack, self.thresholds, k)
                    dev["groups"].append({
                        "ids": ids,
                        "count": g["count"],
                        "m_max": g["m_max"],
                        "widths": g["widths"],
                        "rsplits": g["rsplits"],
                        "filt16": (jnp.asarray(g["f_hi"]),
                                   jnp.asarray(g["f_lo"])),
                        "filt8": (jnp.asarray(g["f_hi8"]),
                                  jnp.asarray(g["f_lo8"]),
                                  jnp.asarray(g["adj"])),
                        "pssm": jnp.asarray(g["pssm"]),
                        "th": jnp.asarray(g["th"]),
                        "pre4": (None if g["pre4"] is None
                                 else jnp.asarray(g["pre4"])),
                    })
            dev["dm"] = jnp.asarray(self.dm_stack)
            dev["pssm"] = jnp.asarray(self.pssm_stack)
            dev["len"] = jnp.asarray(self.lengths)
            dev["ts"] = jnp.asarray(self.t_scaled)
            dev["th"] = jnp.asarray(self.thresholds)
            self._dev = dev
        dm_dev = self._dev["dm"]
        pssm_dev = self._dev["pssm"]
        len_dev = self._dev["len"]
        ts_dev = self._dev["ts"]
        th_dev = self._dev["th"]

        def run_one(off, n_here, cap, cap_hits, dense, group):
            if group is not None:
                n_here2d = np.zeros(
                    (1, group["filt16"][0].shape[1]), np.int32)
                n_here2d[0, : group["count"]] = n_here[group["ids"]]
                # rsplits=None: the staged length-class rescore
                # measured a NET LOSS on jasparfull (0.180 vs 0.171 s;
                # hits concentrate in long, information-rich motifs
                # and the class compact/merge overhead eats the gather
                # savings) -- see rescore_multi_staged's docstring
                return multi.scan_multi_segment_fused(
                    data, np.int32(off), jnp.asarray(n_here2d),
                    None, group["pssm"], group["th"],
                    chunk_len, cap, group["m_max"], k, dense,
                    cap_hits, group["filt16"], group["widths"],
                    group["filt8"], None, group["pre4"])
            return multi.scan_multi_segment(
                data, np.int32(off), jnp.asarray(n_here), dm_dev,
                pssm_dev, len_dev, ts_dev, th_dev, chunk_len,
                max(cap, cap_hits), dense)

        def launch_fused(gi, group, off, n_here, cap, cap_hits, dense):
            counts, packed = run_one(off, n_here, cap, cap_hits, dense,
                                     group)
            w = self._head_slots(gi, cap_hits)
            # motif-lane ids < GROUP_MOTIFS fit u16: the head's middle
            # row ships at half width (experiments/headfetch_probe2.out
            # measured a further ~4 ms on jasparfull; the score row
            # must stay exact f32 bits -- recomputing 71k scores on the
            # host costs 50 ms, more than the 4 bytes/slot it saves).
            # Ungrouped entries carry GLOBAL motif ids: cast only when
            # they provably fit.
            mrow = packed[1, :w]
            if group is not None or self.lengths.size <= 0xFFFF:
                mrow = mrow.astype(jnp.uint16)
            head = (packed[0, :w], mrow, packed[2, :w])
            return {
                "kind": "fused", "gi": gi, "group": group, "off": off,
                "n_here": n_here, "cap": cap, "cap_hits": cap_hits,
                "dense": dense, "counts": counts, "packed": packed,
                "head": head,
            }

        dense_fn = _dense_motif_scan_fn()

        def launch_dense(i, pssm_i, n_i, n_b, cap, dense):
            counts, packed = dense_fn(
                dseq.data, pssm_i, np.float32(self.thresholds[i]),
                np.int32(n_i), n_b, cap, dense)
            head = packed[:, : self._head_slots(("dense", i), cap)]
            return {
                "kind": "dense", "i": i, "pssm_i": pssm_i, "n_i": n_i,
                "n_b": n_b, "cap": cap, "dense": dense,
                "counts": counts, "packed": packed, "head": head,
            }

        entries = []
        off = 0 if n_short or not fused else n_total  # dense-only sets
                                                      # skip the loop
        # capacity / dense-compaction state is tracked PER GROUP:
        # candidate density varies wildly across motif groups, and the
        # [cap, W] extraction stages scale with cap -- one hot group
        # must not inflate every other group's work
        # hit counts scale with the group's motif count: seed cap_hits
        # proportionally so a first whole-database scan does not pay a
        # ratchet retry (and its extra compiled program) just to fit
        # the expected hits of a 2048-motif group
        seed_hits = self.capacity * max(1, gsize // 1024)
        while off < n_total:
            n_here = np.clip(n_valid - off, 0, seg).astype(np.int32)
            for gi, group in enumerate(
                    self._dev["groups"] if fused else [None]):
                cap, cap_hits, dense = self._group_state.get(
                    gi, (self.capacity, seed_hits, self._dense))
                entries.append(launch_fused(
                    gi, group, off, n_here, cap, cap_hits, dense))
            off += seg

        # dense path: long motifs scan the device-cached genome with
        # the exact f32 kernel + threshold compaction (one dispatch
        # per motif; no prefilter, no rescore)
        for i in dense_idx:
            i = int(i)
            m_i = int(self.lengths[i])
            n_i = max(dseq.length - m_i + 1, 0)
            if n_i == 0:
                continue
            # motif lengths bucket (ops.multi.pack_dense_motif) so a
            # whole database compiles at most one dense kernel per
            # bucket.  The static n_scores is also bucket-stable --
            # the largest valid range of any length in the bucket --
            # so distinct true lengths share the one compiled
            # program; n_i rides along traced.
            pssm_i = self._dense_dev.get(i)
            if pssm_i is None:
                pssm_pad, m_b = multi.pack_dense_motif(
                    self.pssms[i].data, k)
                pssm_i = self._dense_dev[i] = jnp.asarray(pssm_pad)
            else:
                m_b = int(pssm_i.shape[0])
            n_b = min(dseq.data.shape[0],
                      max(dseq.length - (m_b - multi.DENSE_BUCKET), 0))
            cap, _, dense = self._group_state.get(
                ("dense", i), (self.capacity, self.capacity, self._dense))
            entries.append(launch_dense(i, pssm_i, n_i, n_b, cap, dense))

        return {
            "entries": entries,
            "launch_fused": launch_fused,
            "launch_dense": launch_dense,
        }

    def _fetch_raw(self, token):
        """Block on a :meth:`_dispatch_raw` token and return the hit
        arrays ``(motif_ids, positions, scores)`` ordered by
        (motif, position).  All counters + hit heads transfer in ONE
        ``device_get``; entries whose capacities overflowed (rare in
        steady state -- the per-group ratchets are sticky) retry
        individually against the token's pinned device buffers."""
        import jax

        entries = token["entries"]
        if not entries:
            return [], [], []
        batch = jax.device_get(
            [(e["counts"], e["head"]) for e in entries])

        def settle(e, counts_h, head_h):
            """ONE ratchet-retry + head-or-full-fetch protocol for both
            entry kinds: retry with doubled capacities until the
            counters fit, persist the sticky group state, and return
            ``(entry, hit array [rows, n_kept] or None)``.  The fused
            kind carries a second counter (``hit_need``, bounding the
            extraction stages) and its own relauncher; everything else
            is shared, so a protocol fix lands on both paths at once.
            """
            fused = e["kind"] == "fused"
            while True:
                if fused:
                    count, hit_need, n_kept, valid = (
                        int(v) for v in counts_h)
                else:
                    count, n_kept, valid = (int(v) for v in counts_h)
                    hit_need = 0
                cap, cap_hits = e["cap"], e.get("cap_hits", e["cap"])
                if count <= cap and hit_need <= cap_hits and valid:
                    break
                if count > cap:
                    cap = max(cap, 1 << (count - 1).bit_length())
                if hit_need > cap_hits:
                    cap_hits = max(
                        cap_hits, 1 << (hit_need - 1).bit_length())
                if fused:
                    e = token["launch_fused"](
                        e["gi"], e["group"], e["off"], e["n_here"],
                        cap, cap_hits, True)
                else:
                    e = token["launch_dense"](
                        e["i"], e["pssm_i"], e["n_i"], e["n_b"], cap,
                        True)
                counts_h, head_h = jax.device_get(
                    (e["counts"], e["head"]))
            key = e["gi"] if fused else ("dense", e["i"])
            self._group_state[key] = (
                e["cap"], e.get("cap_hits", e["cap"]), e["dense"])
            # decaying max: one hit-heavy scan stops inflating every
            # later dispatch's head transfer (halves per scan until the
            # recent traffic dominates again)
            self._head_hint[key] = max(
                self._head_hint.get(key, 0) >> 1, n_kept)
            if not n_kept:
                return e, None
            # fused heads are (pos i32, motif u16, score-bits i32)
            # tuples (half-width motif row); dense heads a [2, w] i32
            # array -- either way ``arr[i]`` below yields row i
            if isinstance(head_h, (list, tuple)):
                if n_kept <= head_h[0].shape[0]:
                    return e, tuple(np.asarray(h[:n_kept])
                                    for h in head_h)
            elif n_kept <= head_h.shape[1]:
                return e, np.asarray(head_h[:, :n_kept])
            return e, np.asarray(jax.device_get(e["packed"][:, :n_kept]))

        out_pos, out_mot, out_sc = [], [], []
        for e, (counts_h, head_h) in zip(entries, batch):
            e, arr = settle(e, counts_h, head_h)
            if arr is None:
                continue
            if e["kind"] == "fused":
                out_pos.append(arr[0] + e["off"])
                if e["group"] is not None:
                    ids = np.asarray(e["group"]["ids"])
                    out_mot.append(ids[np.minimum(arr[1], len(ids) - 1)])
                else:
                    out_mot.append(arr[1])
                out_sc.append(arr[2].view(np.float32))
            else:
                out_pos.append(arr[0])
                out_mot.append(
                    np.full(arr.shape[1], e["i"], arr[1].dtype))
                out_sc.append(arr[1].view(np.float32))
        # self.capacity / self._dense stay the per-NEW-group seeds;
        # each group's sticky ratchet lives in _group_state (persists
        # across bind(), like the old scanner-wide stickiness)

        if not out_pos:
            return [], [], []
        positions = np.concatenate(out_pos)
        motif_ids = np.concatenate(out_mot)
        scores = np.concatenate(out_sc)
        order = np.lexsort((positions, motif_ids))
        return motif_ids[order], positions[order], scores[order]

    def dispatch(self):
        """Queue the scan of the bound sequence on the device and
        return an opaque token (no blocking).  Pass it to
        :meth:`fetch`; binding another sequence and dispatching again
        before fetching is allowed -- tokens pin their own device
        buffers -- which is how a streaming consumer overlaps the scan
        of batch ``n+1`` with result handling of batch ``n``."""
        return self._dispatch_raw()

    def fetch(self, token):
        """Hit arrays ``(motif_ids, positions, scores)`` for a
        :meth:`dispatch` token (same form as :meth:`collect_arrays`)."""
        motif_ids, positions, scores = self._fetch_raw(token)
        return (np.asarray(motif_ids, np.int32),
                np.asarray(positions, np.int64),
                np.asarray(scores, np.float32))

    def collect_arrays(self):
        """Hits as three NumPy arrays ``(motif_ids, positions, scores)``
        ordered by (motif, position) -- the allocation-free form for
        database-scale scans (thousands of motifs x genomes), where
        building one Python object per hit dominates wall time."""
        motif_ids, positions, scores = self._collect_raw()
        return (np.asarray(motif_ids, np.int32),
                np.asarray(positions, np.int64),
                np.asarray(scores, np.float32))

    def collect(self) -> list:
        motif_ids, positions, scores = self._collect_raw()
        return [
            MultiHit(int(mo), int(p), float(s))
            for mo, p, s in zip(motif_ids, positions, scores)
        ]
