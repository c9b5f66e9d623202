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

__all__ = ["BatchScanner", "MultiBatchScanner"]


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
