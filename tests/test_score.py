"""Golden scoring tests (reference ``lightmotif/tests/dna.rs``)."""

import numpy as np
import pytest

from lightmotif_tpu import EncodedSequence
from lightmotif_tpu.ops.pipeline import Pipeline

from .data import EXPECTED, SEQUENCE, build_pssm


@pytest.fixture(scope="module")
def pssm():
    return build_pssm()


@pytest.fixture(scope="module")
def seq():
    return EncodedSequence.encode(SEQUENCE)


@pytest.fixture(scope="module", params=["xla", "pallas"])
def pipeline(request):
    return Pipeline(backend=request.param)


def test_score_position(pssm, seq):
    # dna.rs:175-199: scalar scoring matches Bio.motifs golden values
    for i in range(len(seq) - len(pssm) + 1):
        assert pssm.score_position(seq, i) == pytest.approx(
            EXPECTED[i], abs=1e-5
        ), f"position {i}"


def test_score(pipeline, pssm, seq):
    # dna.rs:65-91
    scores = pipeline.score(pssm, seq).unstripe()
    assert len(scores) == len(EXPECTED)
    for i in range(len(scores)):
        assert scores[i] == pytest.approx(EXPECTED[i], abs=1e-5), f"position {i}"


def test_score_exact_vs_scalar(pipeline, pssm, seq):
    # device scores must be bit-identical to the sequential scalar sums
    scores = np.asarray(pipeline.score(pssm, seq).unstripe())
    scalar = np.array(
        [
            pssm.score_position(seq, i)
            for i in range(len(seq) - len(pssm) + 1)
        ],
        dtype=np.float32,
    )
    assert np.array_equal(scores, scalar)


def test_score_striped_input(pipeline, pssm, seq):
    striped = seq.to_striped()
    striped.configure(pssm)
    scores = pipeline.score(pssm, striped).unstripe()
    assert scores[0] == pytest.approx(EXPECTED[0], abs=1e-5)


def test_score_discrete(pipeline, pssm, seq):
    # dna.rs:93-120: unscaled discrete scores over-estimate f32 scores
    dm = pssm.to_discrete()
    dscores = pipeline.score_discrete(dm, seq).unstripe()
    assert len(dscores) == len(EXPECTED)
    for i in range(len(dscores)):
        assert dm.unscale(int(dscores[i])) >= EXPECTED[i], f"position {i}"


def test_argmax(pipeline, pssm, seq):
    # dna.rs:122-139
    scores = pipeline.score(pssm, seq)
    assert scores.argmax() == 18


def test_threshold(pipeline, pssm, seq):
    # dna.rs:141-173
    scores = pipeline.score(pssm, seq)
    assert sorted(scores.threshold(-10.0)) == [18, 27, 32]
    assert sorted(scores.threshold(-15.0)) == [10, 13, 14, 18, 24, 27, 32, 35, 40, 47]


def test_readme_example(pipeline, pssm, seq):
    # README.md:62-92 / BASELINE correctness anchor
    scores = pipeline.score(pssm, seq)
    assert scores[0] == pytest.approx(-23.07094, abs=1e-5)
    assert scores.argmax() == 18
    assert scores[18] == pytest.approx(-5.50167, abs=1e-5)


def test_argmax_last_tie():
    # tie rule: the reference's `>=` update keeps the last maximum
    from lightmotif_tpu.scores import StripedScores

    s = StripedScores(np.array([1.0, 3.0, 3.0, 2.0], np.float32), 4)
    assert s.argmax() == 2


def test_score_empty(pipeline, pssm):
    scores = pipeline.score(pssm, EncodedSequence.encode("ACGT"))
    assert len(scores) == 0


def test_score_protein(pipeline):
    # K=21 path: exact parity with the sequential host oracle
    from lightmotif_tpu import PROTEIN, CountMatrix

    rng = np.random.default_rng(7)
    sites = [
        "".join(PROTEIN.symbols[i] for i in rng.integers(0, 20, size=8))
        for _ in range(6)
    ]
    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(s, PROTEIN) for s in sites
    )
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    seq = EncodedSequence(
        rng.integers(0, 20, size=500, dtype=np.uint8).astype(np.uint8), PROTEIN
    )
    scores = np.asarray(pipeline.score(pssm, seq).unstripe())
    host = pssm.score_host(seq)
    assert np.array_equal(scores, host)


def test_scan_protein():
    # two-pass scanner on the protein alphabet matches brute force
    from lightmotif_tpu import PROTEIN, CountMatrix
    from lightmotif_tpu.scanner import Scanner

    rng = np.random.default_rng(11)
    sites = [
        "".join(PROTEIN.symbols[i] for i in rng.integers(0, 20, size=6))
        for _ in range(4)
    ]
    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(s, PROTEIN) for s in sites
    )
    pssm = cm.to_freq(0.1).to_weight(None).to_scoring()
    seq = EncodedSequence(
        rng.integers(0, 21, size=400, dtype=np.uint8).astype(np.uint8), PROTEIN
    )
    host = pssm.score_host(seq)
    threshold = float(np.sort(host)[-5])
    got = {(h.position, np.float32(h.score)) for h in Scanner(pssm, seq, threshold=threshold)}
    want = {
        (i, s) for i, s in enumerate(host.astype(np.float32)) if s >= threshold
    }
    assert got == want


def test_score_max_device(pipeline, pssm, seq):
    # fused device max/argmax == host reduction (last-max tie rule)
    mx, am = pipeline.score_max(pssm, seq)
    scores = np.asarray(pipeline.score(pssm, seq).unstripe())
    assert mx == scores.max()
    assert am == 18
    # tie rule: last maximal position wins
    host = scores.copy()
    last = int(np.where(host == host.max())[0][-1])
    assert am == last


def test_striped_scores_offset():
    """offset(MatrixCoordinates) == col * rows + row (scores.rs:153-157),
    consistent with the striped matrix() view."""
    from lightmotif_tpu import MatrixCoordinates, StripedScores

    data = np.arange(70, dtype=np.float32)
    ss = StripedScores(data, length=70, columns=32)
    mat = ss.matrix()  # [rows, cols]
    rows = mat.shape[0]
    for row, col in [(0, 0), (1, 0), (0, 1), (rows - 1, 2), (2, 31)]:
        off = ss.offset(MatrixCoordinates(row, col))
        assert off == col * rows + row
        if off < 70:
            assert mat[row, col] == data[off]


def test_packed_transfer_path():
    # 4-bit host->device transfer packing must be lossless (the TPU
    # default; forced on here so CPU tests cover the unpack program)
    from lightmotif_tpu.ops import pipeline

    rng = np.random.default_rng(17)
    enc = EncodedSequence(rng.integers(0, 5, size=3001, dtype=np.uint8))
    saved = pipeline.PACK_TRANSFER
    pipeline.PACK_TRANSFER = True
    try:
        packed = pipeline.DeviceSequence(enc)
    finally:
        pipeline.PACK_TRANSFER = saved
    pipeline.PACK_TRANSFER = False
    try:
        plain = pipeline.DeviceSequence(enc)
    finally:
        pipeline.PACK_TRANSFER = saved
    assert np.array_equal(np.asarray(packed.data), np.asarray(plain.data))
    pssm = build_pssm()
    pipe = pipeline.Pipeline()
    s1 = pipe.score(pssm, packed)
    s2 = pipe.score(pssm, plain)
    assert np.array_equal(s1.unstripe(), s2.unstripe())


def test_packed_transfer_2bit_regimes():
    """The 2-bit transfer path must be lossless in every regime: no
    exceptions (pure ACGT), sparse wildcards (exception scatter, incl.
    position 0), and exception overflow (falls back to 4-bit)."""
    from lightmotif_tpu.ops import pipeline

    rng = np.random.default_rng(23)
    cases = {
        "clean": rng.integers(0, 4, size=4096, dtype=np.uint8),
        "sparse_wild": None,
        "dense_wild": rng.integers(0, 5, size=4096, dtype=np.uint8),
        "all_wild": np.full(4096, 4, dtype=np.uint8),
    }
    sw = rng.integers(0, 4, size=4096, dtype=np.uint8)
    sw[0] = 4          # exception at index 0 (the pad-slot value)
    sw[17] = 4
    sw[4095] = 4
    cases["sparse_wild"] = sw
    for name, ranks in cases.items():
        enc = EncodedSequence(ranks)
        saved = pipeline.PACK_TRANSFER
        try:
            pipeline.PACK_TRANSFER = True
            packed = pipeline.DeviceSequence(enc)
            pipeline.PACK_TRANSFER = False
            plain = pipeline.DeviceSequence(enc)
        finally:
            pipeline.PACK_TRANSFER = saved
        assert np.array_equal(
            np.asarray(packed.data), np.asarray(plain.data)), name
