import numpy as np
import pytest

from lightmotif_tpu import (
    DNA,
    PROTEIN,
    Background,
    EncodedSequence,
    InvalidDataError,
    InvalidSymbolError,
    Pseudocounts,
)


def test_dna_order():
    # reference order is ACTGN, not ACGT (abc.rs:106-135)
    assert DNA.symbols == "ACTGN"
    assert DNA.size == 5
    assert DNA.default_index == 4
    assert DNA.default_symbol == "N"


def test_protein_order():
    assert PROTEIN.symbols == "ACDEFGHIKLMNPQRSTVWYX"
    assert PROTEIN.size == 21
    assert PROTEIN.default_symbol == "X"


def test_dna_complement():
    assert DNA.complement_index(0) == 2  # A -> T
    assert DNA.complement_index(1) == 3  # C -> G
    assert DNA.complement_index(2) == 0  # T -> A
    assert DNA.complement_index(3) == 1  # G -> C
    assert DNA.complement_index(4) == 4  # N -> N


def test_background_validation():
    # abc.rs:594-598
    Background(DNA, [0.3, 0.2, 0.2, 0.3, 0.0])
    with pytest.raises(InvalidDataError):
        Background(DNA, [0.1, 0.1, 0.1, 0.1, 0.0])
    with pytest.raises(InvalidDataError):
        Background(DNA, [1.2, -0.2, 0.0, 0.0, 0.0])


def test_background_uniform():
    bg = Background.uniform(DNA)
    assert bg.frequencies.tolist() == [0.25, 0.25, 0.25, 0.25, 0.0]
    bgp = Background.uniform(PROTEIN)
    assert bgp.frequencies[PROTEIN.default_index] == 0.0
    assert np.allclose(bgp.frequencies[:-1], 1.0 / 20.0)


def test_background_from_counts():
    # abc.rs:377-388 doctest
    bg = Background.from_counts(DNA, [2, 2, 5, 1, 0])
    assert bg["A"] == pytest.approx(0.2)
    assert bg["C"] == pytest.approx(0.2)
    assert bg["T"] == pytest.approx(0.5)
    assert bg["G"] == pytest.approx(0.1)


def test_background_from_sequence():
    # abc.rs:410-421 doctest: TTATGTTACC
    seq = EncodedSequence.encode("TTATGTTACC")
    bg = Background.from_sequence(seq)
    assert bg["A"] == pytest.approx(0.2)
    assert bg["C"] == pytest.approx(0.2)
    assert bg["T"] == pytest.approx(0.5)
    assert bg["G"] == pytest.approx(0.1)


def test_pseudocounts_scalar():
    p = Pseudocounts(DNA, 0.1)
    assert p.counts.tolist() == pytest.approx([0.1, 0.1, 0.1, 0.1, 0.0])


def test_encode_invalid():
    with pytest.raises(InvalidSymbolError):
        EncodedSequence.encode("ATGZ")
    seq = EncodedSequence.encode_lossy("ATGZ")
    assert str(seq) == "ATGN"
