"""Batched many-sequence scanning == per-record scanning."""

import numpy as np
import pytest

from lightmotif_tpu import CountMatrix, EncodedSequence
from lightmotif_tpu.batch import BatchScanner, MultiBatchScanner
from lightmotif_tpu.scanner import MultiScanner, Scanner

from .data import build_pssm


def _random_records(rng, n, lo=40, hi=400):
    return [
        EncodedSequence(
            rng.integers(0, 4, size=int(rng.integers(lo, hi)),
                         dtype=np.uint8)
        )
        for _ in range(n)
    ]


def test_batch_scanner_matches_per_record():
    rng = np.random.default_rng(6)
    pssm = build_pssm()
    records = _random_records(rng, 25)
    batch = BatchScanner(pssm, records, threshold=-12.0).collect()
    assert len(batch) == len(records)
    for seq, hits in zip(records, batch):
        want = [(h.position, np.float32(h.score))
                for h in Scanner(pssm, seq, threshold=-12.0)]
        got = [(h.position, np.float32(h.score)) for h in hits]
        assert got == want


def test_batch_scanner_short_records():
    # records shorter than the motif produce no hits and no errors
    rng = np.random.default_rng(7)
    pssm = build_pssm()
    records = [
        EncodedSequence(rng.integers(0, 4, size=n, dtype=np.uint8))
        for n in (3, 15, 200, 14, 60)
    ]
    batch = BatchScanner(pssm, records, threshold=-30.0).collect()
    assert batch[0] == [] and batch[3] == []
    assert len(batch[2]) > 0


def test_multi_batch_scanner_matches_per_record():
    rng = np.random.default_rng(8)
    motifs = []
    for width in (6, 15):
        sites = [
            "".join("ACTG"[j] for j in rng.integers(0, 4, size=width))
            for _ in range(4)
        ]
        cm = CountMatrix.from_sequences(
            EncodedSequence.encode(s) for s in sites)
        motifs.append(cm.to_freq(0.1).to_weight(None).to_scoring())
    records = _random_records(rng, 12)
    batch = MultiBatchScanner(motifs, records, thresholds=-8.0).collect()
    for seq, hits in zip(records, batch):
        want = [
            (h.motif, h.position, np.float32(h.score))
            for h in MultiScanner(motifs, seq, thresholds=-8.0).collect()
        ]
        got = [(h.motif, h.position, np.float32(h.score)) for h in hits]
        assert got == want


def test_multibatch_dispatch_fetch_pipelined():
    """Two batches in flight at once: dispatch(n+1) before fetch(n)
    must return each batch's own hits (tokens pin their buffers)."""
    import numpy as np

    from lightmotif_tpu.batch import MultiBatchScanner

    from .data import build_pssm

    pssm = build_pssm()
    rng = np.random.default_rng(3)
    batches = []
    for b in range(3):
        seqs = [EncodedSequence(rng.integers(0, 4, size=n, dtype=np.uint8))
                for n in (400, 700, 250)]
        batches.append(seqs)

    ms = MultiBatchScanner([pssm], thresholds=-8.0)
    # sequential oracle
    want = []
    for seqs in batches:
        ms.rebind(seqs, pad_to=2048)
        want.append(tuple(np.asarray(a) for a in ms.collect_arrays()))

    # pipelined: keep one token in flight
    got = []
    pending = None
    for seqs in batches:
        token = ms.rebind(seqs, pad_to=2048).dispatch()
        if pending is not None:
            got.append(ms.fetch(pending))
        pending = token
    got.append(ms.fetch(pending))

    assert len(got) == len(want)
    for g, w in zip(got, want):
        for a, b in zip(g, w):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_batch_reducer_matches_host_oracle():
    """BatchReducer: per-record (max, argmax) in one device program ==
    per-record host oracle, last-max tie rule included."""
    from lightmotif_tpu.batch import BatchReducer

    rng = np.random.default_rng(21)
    pssm = build_pssm()
    records = _random_records(rng, 40, lo=10, hi=600)
    # force tie material: one record repeating the same best window
    best = "GTTGACCTTATCAAC"
    records.append(EncodedSequence.encode(best + "AC" + best + best))
    # and one record shorter than the motif
    records.append(EncodedSequence(
        rng.integers(0, 4, size=6, dtype=np.uint8)))
    br = BatchReducer(pssm, records)
    mx = br.max()
    am, sc = br.argmax()
    assert np.array_equal(mx, sc)
    m = len(pssm)
    for i, seq in enumerate(records):
        if len(seq) < m:
            assert am[i] == -1 and mx[i] == -np.inf
            continue
        host = np.asarray(pssm.score_host(seq))
        assert np.float32(mx[i]) == host.max(), i
        assert int(am[i]) == int(np.nonzero(host == host.max())[0][-1]), i


def test_batch_reducer_all_neginf_record():
    """A zero-pseudocount PSSM can score every window -inf; the tie
    must land on the LAST valid start, not the slot edge."""
    from lightmotif_tpu.batch import BatchReducer

    cm = CountMatrix.from_sequences(
        [EncodedSequence.encode("AAAA"), EncodedSequence.encode("AAAA")])
    pssm = cm.to_freq(0.0).to_scoring(None)  # -inf off-consensus
    rec = EncodedSequence.encode("CCCCCCCCCC")  # every window -inf
    br = BatchReducer(pssm, [rec, EncodedSequence.encode("CCAAAACC")])
    am, sc = br.argmax()
    assert sc[0] == -np.inf
    assert int(am[0]) == len(rec) - len(pssm)  # last valid start
    host = np.asarray(pssm.score_host(EncodedSequence.encode("CCAAAACC")))
    assert np.float32(sc[1]) == host.max()
    assert int(am[1]) == int(np.nonzero(host == host.max())[0][-1])


def test_batch_reducer_rebind_reuses_executable():
    """Persistent rebind (round-4 verdict item 6): a second batch of
    DIFFERENT records with pinned slot geometry must reuse the compiled
    program (no new trace) and still match the host oracle."""
    from lightmotif_tpu import batch as batch_mod
    from lightmotif_tpu.batch import BatchReducer

    rng = np.random.default_rng(33)
    pssm = build_pssm()
    m = len(pssm)
    br = BatchReducer(pssm, slot=64 + m - 1, n_slots=8)

    def oracle_check(records):
        mx = br.max()
        am, sc = br.argmax()
        assert mx.shape == (len(records),)
        for i, seq in enumerate(records):
            host = np.asarray(pssm.score_host(seq))
            assert np.float32(mx[i]) == host.max(), i
            assert int(am[i]) == int(
                np.nonzero(host == host.max())[0][-1]), i

    first = _random_records(rng, 8, lo=m, hi=64)
    br.rebind(first)
    oracle_check(first)
    traces = batch_mod._BATCH_REDUCE_TRACES
    # different records, fewer of them: the pad-to-slot geometry keeps
    # the shapes fixed, so no retrace and no recompile
    second = _random_records(rng, 5, lo=m, hi=64)
    br.rebind(second)
    oracle_check(second)
    assert batch_mod._BATCH_REDUCE_TRACES == traces
    # oversized batches fail loudly instead of silently recompiling
    with pytest.raises(ValueError):
        br.rebind(_random_records(rng, 3, lo=200, hi=300))


def test_batch_reducer_partial_pinning():
    """Pinning only one geometry dimension ratchets the other instead
    of rejecting every batch (review finding, round 5)."""
    from lightmotif_tpu.batch import BatchReducer

    rng = np.random.default_rng(44)
    pssm = build_pssm()
    m = len(pssm)
    br = BatchReducer(pssm, n_slots=8)  # slot unpinned -> ratchets
    recs = _random_records(rng, 4, lo=m, hi=40)
    br.rebind(recs)
    mx = br.max()
    assert mx.shape == (4,)
    host = np.asarray(pssm.score_host(recs[0]))
    assert np.float32(mx[0]) == host.max()
    with pytest.raises(ValueError):
        br.rebind(_random_records(rng, 9, lo=m, hi=40))  # n pinned
    br2 = BatchReducer(pssm, slot=60 + m - 1)  # n unpinned
    br2.rebind(_random_records(rng, 3, lo=m, hi=60))
    assert br2.max().shape == (3,)
    with pytest.raises(ValueError):
        br2.rebind(_random_records(rng, 2, lo=100, hi=120))
