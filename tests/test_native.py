"""Native C++ host-runtime tests (encode, fused FASTA ingestion)."""

import io

import numpy as np
import pytest

from lightmotif_tpu import DNA, PROTEIN, EncodedSequence, InvalidSymbolError
from lightmotif_tpu import native
from lightmotif_tpu.fasta import read_fasta_encoded

pytestmark = pytest.mark.skipif(
    native.get() is None, reason="no C++ toolchain available"
)


def test_native_builds():
    mod = native.get()
    assert mod is not None
    assert hasattr(mod, "encode")
    assert hasattr(mod, "parse_fasta")


def test_encode_matches_numpy():
    rng = np.random.default_rng(0)
    text = "".join(rng.choice(list("ACGTN"), size=10_000))
    seq = EncodedSequence.encode(text)  # native path
    lut = DNA.lut
    expected = lut[np.frombuffer(text.encode(), dtype=np.uint8)]
    assert np.array_equal(seq.data, expected)


def test_encode_invalid_position():
    with pytest.raises(InvalidSymbolError) as e:
        EncodedSequence.encode("ACGT" * 100 + "z")
    assert e.value.char == "z"


def test_encode_lossy_native():
    seq = EncodedSequence.encode_lossy("AC?GT")
    assert str(seq) == "ACNGT"


def test_count_symbols_native():
    mod = native.get()
    seq = EncodedSequence.encode("ATGCAAGGAGATTCTAGAT")
    counts = mod.count_symbols(seq.data.tobytes(), DNA.size)
    assert counts == seq.count_symbols().tolist()


def test_parse_fasta_encoded():
    data = ">s1 first seq\nACGT\nACGT\n>s2\nNNNN\nacgt\n"
    records = read_fasta_encoded(io.StringIO(data))
    assert len(records) == 2
    name, desc, seq = records[0]
    assert name == "s1"
    assert desc == "first seq"
    assert str(seq) == "ACGTACGT"
    name2, desc2, seq2 = records[1]
    assert name2 == "s2"
    assert desc2 is None
    # lowercase letters are not in the strict LUT -> wildcard (lossy)
    assert str(seq2) == "NNNNNNNN"


def test_parse_fasta_encoded_protein():
    data = ">p\nMKVLAT\n"
    records = read_fasta_encoded(io.StringIO(data), PROTEIN)
    assert str(records[0][2]) == "MKVLAT"


def test_parse_fasta_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    parts = []
    for i in range(5):
        seq = "".join(rng.choice(list("ACGT"), size=1000))
        parts.append(f">seq{i} desc {i}\n")
        for j in range(0, 1000, 73):
            parts.append(seq[j : j + 73] + "\n")
    path = tmp_path / "multi.fa"
    path.write_text("".join(parts))

    from lightmotif_tpu.fasta import read_fasta

    native_recs = read_fasta_encoded(str(path))
    py_recs = list(read_fasta(str(path)))
    assert len(native_recs) == len(py_recs) == 5
    for (n1, d1, s1), r2 in zip(native_recs, py_recs):
        assert n1 == r2.name
        assert d1 == r2.description
        assert str(s1) == r2.sequence
