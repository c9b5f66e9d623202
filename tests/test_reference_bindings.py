"""The reference's own Python-bindings tests, run verbatim against us.

Mirrors ``lightmotif-py/lightmotif/tests/{test_scanner,test_sequence,
test_pvalue}.py`` so a user of the reference bindings can switch
imports and keep their test suite green.
"""

import numpy as np
import pytest

import lightmotif_tpu as lightmotif

SEQUENCE = "ATGTCCCAACAACGATACCCCGAGCCCATCGCCGTCATCGGCTCGGCATGCAGATTCCCAGGCG"


def test_scanner_flow():
    # lightmotif-py tests/test_scanner.py::TestScanner::test_scan
    motif = lightmotif.create(["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"])
    frequencies = motif.counts.normalize(0.1)
    pssm = frequencies.log_odds()
    seq = lightmotif.stripe(SEQUENCE)

    hits = list(lightmotif.scan(pssm, seq))
    assert len(hits) == 0

    hits = list(lightmotif.scan(pssm, seq, threshold=-10.0))
    assert len(hits) == 3
    hits.sort(key=lambda h: h.position)
    assert hits[0].score == pytest.approx(-5.50167, abs=1e-5)
    assert hits[1].score == pytest.approx(-6.4345555, abs=1e-5)
    assert hits[2].score == pytest.approx(-8.961102, abs=1e-5)


def test_sequence_flow():
    # lightmotif-py tests/test_sequence.py::TestEncodedSequence
    s1 = lightmotif.EncodedSequence("ATGC")
    s2 = lightmotif.EncodedSequence("ATGCTTAGATAC")
    A, C, T, G, N = range(5)
    assert len(s1) == 4 and len(s2) == 12
    assert [s1[i] for i in range(4)] == [A, T, G, C]
    assert [s2[i] for i in range(7)] == [A, T, G, C, T, T, A]
    with pytest.raises(IndexError):
        _ = s1[10]


def test_pvalue_ma0045():
    # lightmotif-py tests/test_pvalue.py::TestMA0045
    ma0045 = lightmotif.CountMatrix({
        "A": [3, 7, 9, 3, 11, 11, 11, 3, 4, 3, 8, 8, 9, 9, 11, 2],
        "C": [5, 0, 1, 6, 0, 0, 0, 3, 1, 4, 5, 1, 0, 5, 0, 7],
        "T": [2, 4, 3, 1, 0, 1, 1, 6, 1, 1, 0, 1, 3, 0, 0, 5],
        "G": [4, 3, 1, 4, 3, 2, 2, 2, 8, 6, 1, 4, 2, 0, 3, 0],
        "N": [0] * 16,
    }).normalize(pseudocount=0.25).log_odds()

    assert ma0045.pvalue(8.7708, method="tfmpvalue") == pytest.approx(
        0.00032910, abs=1e-5)
    assert ma0045.pvalue(8.7708, method="meme") == pytest.approx(
        0.00032910, abs=1e-5)
    assert ma0045.score(0.00033, method="tfmpvalue") == pytest.approx(
        8.756855, abs=1e-5)
    assert ma0045.score(0.00033, method="meme") == pytest.approx(
        8.765, abs=1e-3)


def test_load_flows(tmp_path):
    # lightmotif-py tests/test_load.py (jaspar16 flavor)
    import io as _io
    import os
    import pathlib

    text = (
        ">MA0001.3 AGL3\n"
        "A  [ 0  3 79 40 66 48 65 11 65  0 ]\n"
        "C  [94 75  4  3  1  2  5  2  3  3 ]\n"
        "G  [ 1  0  3  4  1  0  5  3 28 88 ]\n"
        "T  [ 2 19 11 50 29 47 22 81  1  6 ]\n"
    ).encode()

    motifs = list(lightmotif.load(_io.BytesIO(text), "jaspar16"))
    assert len(motifs) == 1 and motifs[0].name == "MA0001.3"

    p = tmp_path / "m.jaspar"
    p.write_bytes(text)
    assert list(lightmotif.load(str(p), "jaspar16"))[0].name == "MA0001.3"
    assert list(lightmotif.load(os.fsencode(str(p)), "jaspar16"))[0].name == "MA0001.3"
    assert list(lightmotif.load(pathlib.Path(p), "jaspar16"))[0].name == "MA0001.3"


def test_rust_readme_flow():
    # the reference README's Rust quick-start, verbatim shapes
    # (README.md:55-90), with bit-equal scores
    counts = lightmotif.CountMatrix.from_sequences(
        lightmotif.EncodedSequence.encode(s)
        for s in ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"])
    pssm = counts.to_freq(0.1).to_scoring(None)
    encoded = lightmotif.EncodedSequence.encode(SEQUENCE)
    striped = encoded.to_striped()
    striped.configure(pssm)
    scores = pssm.score(striped)
    v = scores.unstripe()
    assert np.float32(scores[0]) == np.float32(-23.07094)
    assert np.float32(v[0]) == np.float32(-23.07094)
    assert scores.argmax() == 18
    assert scores.threshold(10.0) == []
