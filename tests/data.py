"""Shared test fixtures: golden values from the reference test suite.

SEQUENCE/PATTERNS and the EXPECTED scores (computed with Bio.motifs)
mirror ``lightmotif/tests/dna.rs:19-38``; MA0045 counts mirror
``lightmotif/src/pwm/dist.rs:252-277`` (JASPAR database matrix).
"""

SEQUENCE = "ATGTCCCAACAACGATACCCCGAGCCCATCGCCGTCATCGGCTCGGCATGCAGATTCCCAGGCG"
PATTERNS = ["GTTGACCTTATCAAC", "GTTGATCCAGTCAAC"]

EXPECTED = [
    -23.07094, -18.678621, -15.219191, -17.745737,
    -18.678621, -23.07094, -17.745737, -19.611507,
    -27.463257, -29.989803, -14.286304, -26.53037,
    -15.219191, -10.826873, -10.826873, -22.138054,
    -38.774437, -30.922688, -5.50167, -24.003826,
    -18.678621, -15.219191, -35.315006, -17.745737,
    -10.826873, -30.922688, -23.07094, -6.4345555,
    -31.855574, -23.07094, -15.219191, -31.855574,
    -8.961102, -26.53037, -27.463257, -14.286304,
    -15.219191, -26.53037, -23.07094, -18.678621,
    -14.286304, -18.678621, -26.53037, -16.152077,
    -17.745737, -18.678621, -17.745737, -14.286304,
    -30.922688, -18.678621,
]

# JASPAR MA0045 counts in reference column order A,C,T,G,N
MA0045_COUNTS = [
    [3, 5, 2, 4, 0],
    [7, 0, 4, 3, 0],
    [9, 1, 3, 1, 0],
    [3, 6, 1, 4, 0],
    [11, 0, 0, 3, 0],
    [11, 0, 1, 2, 0],
    [11, 0, 1, 2, 0],
    [3, 3, 6, 2, 0],
    [4, 1, 1, 8, 0],
    [3, 4, 1, 6, 0],
    [8, 5, 0, 1, 0],
    [8, 1, 1, 4, 0],
    [9, 0, 3, 2, 0],
    [9, 5, 0, 0, 0],
    [11, 0, 0, 3, 0],
    [2, 7, 5, 0, 0],
]


def build_pssm(pseudo=0.1):
    """The canonical 2-pattern PSSM used throughout the golden tests."""
    from lightmotif_tpu import CountMatrix, EncodedSequence

    cm = CountMatrix.from_sequences(
        EncodedSequence.encode(p) for p in PATTERNS
    )
    return cm.to_freq(pseudo).to_weight(None).to_scoring()


def build_ma0045(pseudo=0.25):
    from lightmotif_tpu import DNA, CountMatrix

    cm = CountMatrix(DNA, MA0045_COUNTS)
    return cm.to_freq(pseudo).to_scoring(None)
