"""Batched scanning of many sequences in one device pass.

The reference CLI hands each (motif, sequence) pair to a worker thread;
scanning thousands of short FASTA records one device dispatch at a time
would instead be dominated by per-call latency.  ``BatchScanner``
concatenates the records with ``motif_len - 1`` wildcard separators,
runs ONE two-pass scan over the concatenation, and splits the hits back
per record.

Windows that cross a record boundary necessarily touch at least one
separator symbol; they may appear as discrete candidates (wasting a
little capacity) but are dropped exactly by the
``local_position <= len(record) - m`` rule, so the per-record hit sets
equal what :class:`lightmotif_tpu.scanner.Scanner` returns record by
record.
"""

from __future__ import annotations

import numpy as np

from .scanner import Hit, MultiHit, MultiScanner, Scanner
from .sequence import EncodedSequence

__all__ = ["BatchScanner", "BatchReducer", "MultiBatchScanner"]


def _concatenate(seqs, gap: int, alphabet, pad_to: int | None = None):
    """Concatenate records with ``gap`` wildcard separators.

    ``pad_to`` extends the result with trailing wildcards to a fixed
    length, so successive batches reuse one compiled device program
    (hits cannot originate there: every tail window fails the
    ``local <= len(record) - m`` rule)."""
    seqs = list(seqs)
    if not seqs:
        raise ValueError("no sequences given")
    offsets = np.zeros(len(seqs), dtype=np.int64)
    lengths = np.zeros(len(seqs), dtype=np.int64)
    parts = []
    pos = 0
    pad = np.full(gap, alphabet.default_index, dtype=np.uint8)
    for i, s in enumerate(seqs):
        if not isinstance(s, EncodedSequence):
            s = EncodedSequence(s, alphabet)
        offsets[i] = pos
        lengths[i] = len(s)
        parts.append(np.asarray(s.data, dtype=np.uint8))
        parts.append(pad)
        pos += len(s) + gap
    if pad_to is not None and pad_to > pos:
        parts.append(
            np.full(pad_to - pos, alphabet.default_index, dtype=np.uint8))
    data = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    return EncodedSequence(data, alphabet), offsets, lengths


def _split(positions, scores, offsets, lengths, m):
    """Map concatenated-space hits back to (record, local) hits."""
    record = np.searchsorted(offsets, positions, side="right") - 1
    local = positions - offsets[record]
    keep = local <= lengths[record] - m
    return record[keep], local[keep], scores[keep]


class BatchScanner:
    """Scan one PSSM over many sequences in a single device pass."""

    def __init__(self, pssm, seqs, threshold: float = 0.0,
                 pad_to: int | None = None, **kw):
        self.pssm = pssm
        gap = max(len(pssm) - 1, 0)
        self._concat, self._offsets, self._lengths = _concatenate(
            seqs, gap, pssm.alphabet, pad_to)
        self._scanner = Scanner(pssm, self._concat, threshold=threshold, **kw)

    def collect(self) -> list:
        """Per-record hit lists (``[[Hit, ...], ...]``), each ordered by
        position like a per-record :class:`Scanner` run."""
        pos, sc = [], []
        for positions, scores in self._scanner._scan_segments():
            pos.append(positions)
            sc.append(scores)
        out = [[] for _ in self._offsets]
        if pos:
            positions = np.concatenate(pos)
            scores = np.concatenate(sc)
            rec, local, kept = _split(
                positions, scores, self._offsets, self._lengths,
                len(self.pssm))
            for r, p, s in zip(rec, local, kept):
                out[int(r)].append(Hit(int(p), float(s)))
        for hits in out:
            hits.sort(key=lambda h: h.position)
        return out


class BatchReducer:
    """Per-record ``max``/``argmax`` of one PSSM over many records in
    ONE device program.

    The reference's 10 kb argmax bench (``lightmotif-bench/dna.rs:
    77-149``) is dispatch-floor-bound on a single short record here
    (~6.5 us of fixed program overhead vs ~0.3 us of vector work);
    short-record *throughput* workloads should reduce the whole batch
    at once instead.  Records pack into uniform slots of
    ``max(len) + m - 1`` wildcard-padded positions, the production
    scoring kernel runs over the concatenation, and two masked row
    reductions produce per-record results -- only ``2n`` scalars leave
    the device.

    Tie rule per record: the LAST maximal position wins (the
    reference's ``>=`` update, ``pli/mod.rs:146``), including when
    every valid window scores ``-inf`` (ties at ``-inf`` resolve to
    the last valid start, exactly like the host oracle).  Records
    shorter than the motif yield ``(-inf, -1)``.
    """

    def __init__(self, pssm, seqs=None, slot: int | None = None,
                 n_slots: int | None = None):
        import jax

        self.pssm = pssm
        self._m = len(pssm)
        # pinned slot geometry (pad-to-slot): a streaming consumer
        # fixes (slot, n_slots) once and every rebind() reuses the one
        # compiled program -- the same persistent-rebind pattern as
        # MultiBatchScanner.  Each dimension pins independently; an
        # unpinned dimension ratchets instead of tracking each batch
        # exactly, so shapes only ever grow.
        self.slot = int(slot) if slot else 0
        self.n = int(n_slots) if n_slots else 0
        self._pin_slot = bool(slot)
        self._pin_n = bool(n_slots)
        self._pssm_dev = jax.device_put(
            np.asarray(pssm.data, np.float32))
        self._flat = self._n_valid = None
        self._n_records = 0
        self._out = None
        if seqs is not None:
            self.rebind(seqs)

    def rebind(self, seqs) -> "BatchReducer":
        """Bind a new batch of records, reusing the compiled program
        whenever the slot geometry still fits (always, once ``slot`` /
        ``n_slots`` are pinned or after the ratchet settles)."""
        import jax

        from .ops import kernels, xla_ops

        alphabet = self.pssm.alphabet
        m = self._m
        seqs = [s if isinstance(s, EncodedSequence)
                else EncodedSequence(s, alphabet) for s in seqs]
        if not seqs:
            raise ValueError("no sequences given")
        self._lengths = np.asarray([len(s) for s in seqs], np.int64)
        self._n_records = len(seqs)
        need_slot = int(self._lengths.max()) + max(m - 1, 0)
        if ((self._pin_slot and need_slot > self.slot)
                or (self._pin_n and self._n_records > self.n)):
            raise ValueError(
                f"batch needs slot={need_slot} x n={self._n_records}, "
                f"pinned geometry is slot={self.slot} x n={self.n}")
        # uniform slots: every record starts at i * slot, so the score
        # array reshapes to [n, slot] for the row reductions.  The
        # m - 1 tail keeps windows from reading the next record.
        self.slot = max(self.slot, need_slot)
        self.n = max(self.n, self._n_records)
        flat_len = xla_ops.pad_length(
            self.n * self.slot, kernels.preferred_pad())
        flat = np.full(flat_len, alphabet.default_index, np.int8)
        for i, s in enumerate(seqs):
            start = i * self.slot
            flat[start:start + len(s)] = np.asarray(s.data, np.int8)
        n_valid = np.zeros(self.n, np.int32)
        n_valid[:self._n_records] = np.maximum(
            self._lengths - m + 1, 0)
        self._flat = jax.device_put(flat)
        self._n_valid = jax.device_put(n_valid)
        self._out = None
        return self

    def _reduce(self):
        if self._flat is None:
            raise ValueError("no records bound; use rebind(seqs)")
        if self._out is None:
            import jax

            mx, am = _batch_reduce(
                self._flat, self._pssm_dev, self._n_valid,
                self.n, self.slot)
            mx, am = jax.device_get((mx, am))
            # empty ratchet slots beyond the bound batch slice off
            self._out = (np.asarray(mx)[:self._n_records],
                         np.asarray(am)[:self._n_records])
        return self._out

    def max(self) -> np.ndarray:
        """f32 best score per record (``-inf`` when no valid window)."""
        return self._reduce()[0]

    def argmax(self):
        """``(positions int64, scores f32)`` per record; position is
        ``-1`` when the record has no valid window."""
        mx, am = self._reduce()
        return am.astype(np.int64), mx


_BATCH_REDUCE_RUN = None
_BATCH_REDUCE_TRACES = 0  # trace-time counter (tests assert reuse)


def _batch_reduce(flat, pssm, n_valid, n: int, slot: int):
    # one module-level jitted callable: rebinding a BatchReducer (or
    # building a new one) with the same (n, slot, pssm-shape) reuses
    # the compiled executable instead of retracing a fresh closure
    global _BATCH_REDUCE_RUN
    if _BATCH_REDUCE_RUN is None:
        import functools

        import jax

        @functools.partial(jax.jit, static_argnames=("n", "slot"))
        def run(flat, pssm, n_valid, n, slot):
            import jax.numpy as jnp

            from .ops import kernels

            global _BATCH_REDUCE_TRACES
            _BATCH_REDUCE_TRACES += 1
            scores = kernels.score_f32(flat, pssm, n * slot)
            s = scores[: n * slot].reshape(n, slot)
            pos = jax.lax.broadcasted_iota(jnp.int32, (n, slot), 1)
            s = jnp.where(pos < n_valid[:, None], s, -jnp.inf)
            mx = jnp.max(s, axis=1)
            # ties restricted to VALID positions: when mx is -inf the
            # masked tail compares equal too, and the reference's
            # last-max rule must land on the last valid start, not the
            # slot edge
            am = jnp.max(jnp.where((s == mx[:, None])
                                   & (pos < n_valid[:, None]), pos, -1),
                         axis=1)
            return mx, am

        _BATCH_REDUCE_RUN = run
    return _BATCH_REDUCE_RUN(flat, pssm, n_valid, n, slot)


class MultiBatchScanner:
    """Scan many PSSMs over many sequences in a single device pass.

    The packed motif database (discretization, filter packing, device
    uploads) and the compiled device programs persist across
    :meth:`rebind` calls, so a streaming consumer (the CLI's flights)
    pays the preparation cost once and runs one warm executable per
    flight -- the steady-state analogue of the reference CLI's
    long-lived worker threads (``main.rs:500-601``).
    """

    def __init__(self, pssms, seqs=None, thresholds=0.0,
                 pad_to: int | None = None, **kw):
        self.pssms = list(pssms)
        if not self.pssms:
            raise ValueError("no motifs given")
        m_max = max(len(p) for p in self.pssms)
        self.gap = max(m_max - 1, 0)
        self._m = np.asarray([len(p) for p in self.pssms])
        self._offsets = self._lengths = None
        self._scanner = MultiScanner(self.pssms, thresholds=thresholds,
                                     **kw)
        if seqs is not None:
            self.rebind(seqs, pad_to)

    def rebind(self, seqs, pad_to: int | None = None) -> "MultiBatchScanner":
        """Bind a new batch of records, reusing the packed motif set
        (and, when ``pad_to`` keeps shapes fixed, the compiled
        programs)."""
        return self.rebind_prepared(self.prepare(seqs, pad_to))

    def prepare(self, seqs, pad_to: int | None = None):
        """Concatenate records and upload the batch to the device
        WITHOUT binding it.  Thread-safe against a concurrent scan of a
        previously bound batch: a streaming consumer (the CLI) prepares
        flight ``n+1`` in its reader thread while flight ``n`` scans,
        overlapping the host->device transfer with device work."""
        from .ops.pipeline import DeviceSequence

        concat, offsets, lengths = _concatenate(
            seqs, self.gap, self.pssms[0].alphabet, pad_to)
        return DeviceSequence(concat), offsets, lengths

    def rebind_prepared(self, prepared) -> "MultiBatchScanner":
        """Bind a batch previously built by :meth:`prepare`."""
        dseq, self._offsets, self._lengths = prepared
        self._scanner.bind(dseq)
        return self

    def collect_arrays(self):
        """Hits as flat arrays ``(records, motif_ids, positions,
        scores)`` with per-record *local* positions, ordered by
        (motif, concatenated position) -- the allocation-free form for
        streaming consumers."""
        if self._offsets is None:
            raise ValueError("no records bound; use rebind(seqs)")
        return self._split_hits(self._scanner.collect_arrays(),
                                self._offsets, self._lengths)

    def dispatch(self):
        """Queue the scan of the bound batch without blocking; returns
        a token for :meth:`fetch`.  Rebinding and dispatching the next
        batch before fetching this one pipelines flights: the device
        scans batch ``n+1`` while the host formats batch ``n``'s hits
        (tokens snapshot their own record offsets and device
        buffers)."""
        if self._offsets is None:
            raise ValueError("no records bound; use rebind(seqs)")
        return (self._scanner.dispatch(), self._offsets, self._lengths)

    def fetch(self, token):
        """Blocking counterpart of :meth:`dispatch`; same return form
        as :meth:`collect_arrays`."""
        inner, offsets, lengths = token
        return self._split_hits(self._scanner.fetch(inner),
                                offsets, lengths)

    def _split_hits(self, raw, offsets, lengths):
        mo, pos, sc = (np.asarray(raw[0], np.int32),
                       np.asarray(raw[1], np.int64),
                       np.asarray(raw[2], np.float32))
        if pos.size == 0:
            return (np.zeros(0, np.int64), mo, pos, sc)
        rec = np.searchsorted(offsets, pos, side="right") - 1
        local = pos - offsets[rec]
        keep = local <= lengths[rec] - self._m[mo]
        return rec[keep], mo[keep], local[keep], sc[keep]

    def collect(self) -> list:
        """Per-record lists of :class:`MultiHit`, ordered by
        (motif, position)."""
        rec, mo, local, sc = self.collect_arrays()
        out = [[] for _ in self._offsets]
        for r, m, p, s in zip(rec, mo, local, sc):
            out[int(r)].append(MultiHit(int(m), int(p), float(s)))
        for lst in out:
            lst.sort(key=lambda h: (h.motif, h.position))
        return out
