import pytest
import numpy as np

from lightmotif_tpu import DNA, EncodedSequence, StripedSequence

A, C, T, G, N = 0, 1, 2, 3, 4


def test_encode_roundtrip():
    seq = EncodedSequence.encode("ATGTCCCAAC")
    assert str(seq) == "ATGTCCCAAC"
    assert list(seq) == [A, T, G, T, C, C, C, A, A, C]


def test_stripe_u4():
    # seq.rs:510-524: ATGCA striped over 4 columns
    seq = EncodedSequence.encode("ATGCA")
    striped = seq.to_striped(columns=4)
    assert striped.rows == 2
    assert striped.data[0].tolist() == [A, G, A, N]
    assert striped.data[1].tolist() == [T, C, N, N]


def test_stripe_u2():
    seq = EncodedSequence.encode("ATGCA")
    striped = seq.to_striped(columns=2)
    assert striped.rows == 3
    assert striped.data[0].tolist() == [A, C]
    assert striped.data[1].tolist() == [T, A]
    assert striped.data[2].tolist() == [G, N]


def test_configure_wrap():
    # seq.rs:527-541
    seq = EncodedSequence.encode("ATGCA")
    striped = seq.to_striped(columns=4)
    striped.configure_wrap(2)
    assert striped.rows == 4
    assert striped.data[0].tolist() == [A, G, A, N]
    assert striped.data[1].tolist() == [T, C, N, N]
    assert striped.data[2].tolist() == [G, A, N, N]
    assert striped.data[3].tolist() == [C, N, N, N]


def test_index():
    # seq.rs:544-570
    seq = EncodedSequence.encode("ATGCA")
    striped = seq.to_striped(columns=4)
    assert [striped[i] for i in range(5)] == [A, T, G, C, A]

    striped2 = seq.to_striped(columns=2)
    assert [striped2[i] for i in range(5)] == [A, T, G, C, A]
    striped2.configure_wrap(4)
    assert striped2.rows == 7
    assert [striped2[i] for i in range(5)] == [A, T, G, C, A]


def test_count_symbols():
    # seq.rs:573-598
    seq = EncodedSequence.encode("ATGCAAGGAGATTCTAGAT")
    striped = seq.to_striped()
    assert np.array_equal(seq.count_symbols(), striped.count_symbols())
    striped.configure_wrap(32)
    assert np.array_equal(seq.count_symbols(), striped.count_symbols())


def test_unstripe():
    seq = EncodedSequence.encode("ATGTCCCAACAACGATACC")
    striped = seq.to_striped(columns=4)
    striped.configure_wrap(3)
    assert striped.unstripe() == seq


def test_reverse_complement():
    seq = EncodedSequence.encode("ATGCAN")
    assert str(seq.reverse_complement()) == "NTGCAT"


def test_empty():
    seq = EncodedSequence.encode("")
    striped = seq.to_striped(columns=2)
    assert striped.rows == 0


def test_constructor_accepts_text():
    # reference constructor parity (lightmotif-py test_sequence.py)
    s1 = EncodedSequence("ATGC")
    A, C, T, G, N = range(5)
    assert len(s1) == 4
    assert [s1[i] for i in range(4)] == [A, T, G, C]
    with pytest.raises(IndexError):
        _ = s1[10]
    mem = memoryview(np.asarray(s1))
    assert mem[0] == A


def test_buffer_protocol_encoded():
    # reference lightmotif-py test_sequence.py::test_memoryview
    # (EncodedSequence exposes a 1-D read-only u8 buffer,
    # lib.rs:218-245)
    A, C, T, G, N = range(5)
    s1 = EncodedSequence.encode("ATGC")
    mem = memoryview(s1)
    assert len(mem) == 4
    assert mem.shape == (4,)
    assert mem.format == "B"
    assert [mem[i] for i in range(4)] == [A, T, G, C]
    with pytest.raises(TypeError):
        mem[0] = 2  # read-only, as in the reference


def test_buffer_protocol_striped():
    # reference StripedSequence buffer: shape [columns, rows], element
    # [c, r] == striped data[r, c] (lib.rs:303-318,334-365); for a
    # 4-symbol sequence rows == 1 so mem[i, 0] walks the sequence
    A, C, T, G, N = range(5)
    s1 = EncodedSequence.encode("ATGC").to_striped()
    mem = memoryview(s1)
    assert mem.ndim == 2
    assert mem.shape[0] == s1.columns and mem.shape[1] == s1.rows
    assert mem[0, 0] == A
    assert mem[1, 0] == T
    assert mem[2, 0] == G
    assert mem[3, 0] == C
    # a longer sequence: buffer[c, r] must equal element c*rows + r
    s2 = EncodedSequence.encode(
        "ATGTCCCAACAACGATACCCCGAGCCCATCGCCGTCATCGGCTCGGCATGCAGATTCCCAGGCG"
    ).to_striped(columns=4)
    mem2 = memoryview(s2)
    rows = s2.rows
    for c in range(4):
        for r in range(rows):
            assert mem2[c, r] == s2[c * rows + r]
