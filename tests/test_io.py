"""Motif-format parser tests.

Synthetic fixtures cover the format features; when the reference mount
is available, its real test files (JASPAR pfm, TRANSFAC, MEME/DREME/
STREME, UniPROBE) are parsed too and record counts checked against the
reference test expectations (``lightmotif-io/tests/*.rs``).
"""

import io
import os

import numpy as np
import pytest

from lightmotif_tpu import DNA, PROTEIN
from lightmotif_tpu.io import (
    ParseError,
    load,
    loads,
    read_jaspar,
    read_jaspar16,
    read_meme,
    read_transfac,
    read_uniprobe,
)

REF = "/root/reference/lightmotif-io/tests"


JASPAR16 = """\
>MA0001.3\tAGL3
A  [     0      0     82     40     56     35     65     25     64      0 ]
C  [    92     79      1      4      0      0      1      4      0      0 ]
G  [     0      0      2      3      1      0      4      3     28     92 ]
T  [     3     16     10     48     38     60     25     63      3      3 ]
"""

JASPAR_RAW = """\
>MA0002.1 RUNX1
10 12  4  1  2  2  0  0  0  8 13
 2  2  7  1  0  8  0  0  1  2  2
 3  1  1  0 23  0 26 26  0  0  4
11 11 14 24  1 16  0  0 25 16  7
"""

TRANSFAC = """\
ID  test_motif
BF  Pseudomonas aeruginosa
P0      A      T      G      C
00      0      0      2      0      G
01      0      2      0      0      T
02      0      2      0      0      T
03      0      0      2      0      G
04      2      0      0      0      A
XX
//
"""

MEME = """\
MEME version 4

ALPHABET= ACGT

strands: + -

Background letter frequencies
A 0.303 C 0.183 G 0.306 T 0.209

MOTIF crp
letter-probability matrix: alength= 4 w= 3 nsites= 17 E= 4.1e-009
 0.000000  0.176471  0.000000  0.823529
 0.000000  0.058824  0.647059  0.294118
 0.000000  0.058824  0.000000  0.941176
URL http://example.com/crp

MOTIF lexA
letter-probability matrix: alength= 4 w= 2 nsites= 14 E= 3.2e-035
 0.214286  0.000000  0.000000  0.785714
 0.857143  0.000000  0.071429  0.071429
"""

UNIPROBE = """\
Cha4 primary
A:\t0.17\t0.22\t0.11
C:\t0.25\t0.13\t0.15
G:\t0.33\t0.39\t0.57
T:\t0.25\t0.26\t0.17
"""


def test_jaspar16_basic():
    recs = list(read_jaspar16(io.StringIO(JASPAR16)))
    assert len(recs) == 1
    r = recs[0]
    assert r.id == "MA0001.3"
    assert r.description == "AGL3"
    m = r.matrix()
    assert len(m) == 10
    # column order internal: A C T G N
    assert m.data[0].tolist() == [0, 92, 3, 0, 0]
    assert m.data[9].tolist() == [0, 0, 3, 92, 0]


def test_jaspar_raw():
    recs = list(read_jaspar(io.StringIO(JASPAR_RAW)))
    assert len(recs) == 1
    m = recs[0].matrix()
    assert len(m) == 11
    # jaspar raw order is A C G T
    assert m.data[0].tolist() == [10, 2, 11, 3, 0]


def test_transfac_basic():
    recs = list(read_transfac(io.StringIO(TRANSFAC)))
    assert len(recs) == 1
    r = recs[0]
    assert r.id == "test_motif"
    counts = r.to_counts()
    assert len(counts) == 5
    assert counts.data[0].tolist() == [0, 0, 0, 2, 0]  # G
    assert counts.data[4].tolist() == [2, 0, 0, 0, 0]  # A


def test_meme_basic():
    f = read_meme(io.StringIO(MEME))
    assert f.version == "4"
    assert f.background is not None
    assert f.background["A"] == pytest.approx(0.303)
    assert len(f.records) == 2
    crp, lexa = f.records
    assert crp.id == "crp"
    assert crp.w == 3
    assert crp.nsites == 17
    assert crp.url == "http://example.com/crp"
    assert crp.evalue == pytest.approx(4.1e-9)
    m = crp.matrix()
    # MEME column order ACGT -> internal ACTGN
    assert m.data[0, 0] == pytest.approx(0.0)
    assert m.data[0, 2] == pytest.approx(0.823529)  # T
    assert lexa.id == "lexA"
    assert len(lexa.matrix()) == 2


def test_uniprobe_basic():
    recs = list(read_uniprobe(io.StringIO(UNIPROBE)))
    assert len(recs) == 1
    r = recs[0]
    assert r.id == "Cha4 primary"
    m = r.matrix()
    assert len(m) == 3
    assert m.data[0, 0] == pytest.approx(0.17)
    assert m.data[0, 3] == pytest.approx(0.33)  # G


def test_load_motifs():
    motifs = list(loads(JASPAR16, format="jaspar16"))
    assert len(motifs) == 1
    assert motifs[0].name == "MA0001.3"
    assert motifs[0].counts is not None
    assert motifs[0].pssm is not None
    assert len(motifs[0].pssm) == 10


def test_load_motif_subclasses():
    import lightmotif_tpu as lm

    (j,) = loads(JASPAR16, format="jaspar16")
    assert isinstance(j, lm.JasparMotif) and isinstance(j, lm.Motif)
    (t,) = loads(TRANSFAC, format="transfac")
    assert isinstance(t, lm.TransfacMotif)
    assert t.id is not None or t.accession is not None
    memes = list(loads(MEME, format="meme"))
    assert all(isinstance(m, lm.MemeMotif) for m in memes)
    assert memes[0].background is not None
    (u,) = loads(UNIPROBE, format="uniprobe")
    assert isinstance(u, lm.UniprobeMotif)


def test_load_bytes_and_filelike(tmp_path):
    path = tmp_path / "m.jaspar"
    path.write_text(JASPAR16)
    assert len(list(load(str(path)))) == 1
    assert len(list(load(JASPAR16.encode()))) == 1
    with open(path, "rb") as fh:
        assert len(list(load(fh))) == 1


def test_load_gzip(tmp_path):
    import gzip

    path = tmp_path / "m.jaspar.gz"
    with gzip.open(path, "wt") as fh:
        fh.write(JASPAR16)
    assert len(list(load(str(path)))) == 1


# -- real files from the reference mount (skipped when absent) -------------

needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference mount")


@needs_ref
def test_ref_mx000001():
    with open(f"{REF}/MX000001.transfac") as fh:
        recs = list(read_transfac(fh))
    assert len(recs) == 1
    r = recs[0]
    assert r.id == "prodoric_MX000001"
    counts = r.to_counts()
    assert len(counts) == 15
    # first row is G=2
    assert counts.data[0].tolist() == [0, 0, 0, 2, 0]


@needs_ref
def test_ref_m00005():
    with open(f"{REF}/M00005.transfac") as fh:
        recs = list(read_transfac(fh))
    assert len(recs) == 1
    r = recs[0]
    assert r.accession == "M00005"
    assert r.id == "V$AP4_01"
    assert r.name == "AP-4"
    assert len(r.to_counts()) == 18
    assert len(r.sites) == 5


@needs_ref
@pytest.mark.parametrize(
    "name,version,count,alphabet",
    [
        ("DNA.meme", "4", 2, DNA),
        ("DREME.meme", "5.5.6", 16, DNA),
        ("MEME.meme", "5.5.6 (Release date: Wed Jun 19 13:59:04 2024 -0700)", 3, DNA),
        ("STREME.meme", "5.5.6 (Release date: Wed Jun 19 13:59:04 2024 -0700)", 7, DNA),
        (
            "autoclust_7_64_17_streme.txt",
            "5.5.7 (Release date: Wed Jun 19 13:59:04 2024 -0700)",
            9,
            PROTEIN,
        ),
    ],
)
def test_ref_meme_files(name, version, count, alphabet):
    with open(f"{REF}/{name}") as fh:
        f = read_meme(fh, alphabet)
        # records stream lazily: drain while the handle is open
        assert f.version == version
        assert len(f.records) == count
    for rec in f.records:
        m = rec.matrix()
        assert len(m) > 0
        assert np.allclose(m.data.sum(axis=1), 1.0, atol=0.02)


@needs_ref
def test_ref_dna_meme_background():
    with open(f"{REF}/DNA.meme") as fh:
        f = read_meme(fh, DNA)
    # the prologue (version/background) parses eagerly, so reading it
    # after the handle closes is fine
    assert f.background is not None
    assert f.background["A"] == pytest.approx(0.303)
    assert f.background["C"] == pytest.approx(0.183)
    assert f.background["G"] == pytest.approx(0.209)
    assert f.background["T"] == pytest.approx(0.306)


@needs_ref
def test_ref_uniprobe_files():
    for name, expected in [("Cha4.uniprobe", 1), ("Gal4.uniprobe", 1)]:
        with open(f"{REF}/{name}") as fh:
            recs = list(read_uniprobe(fh))
        assert len(recs) >= expected
        for r in recs:
            assert len(r.matrix()) > 0


@needs_ref
def test_ref_jaspar_pfm():
    with open(f"{REF}/MA0001.3.pfm") as fh:
        recs = list(read_jaspar16(fh))
    assert len(recs) == 1
    assert recs[0].id.startswith("MA0001")


def test_load_missing_bytes_path_raises():
    with pytest.raises(FileNotFoundError):
        list(load(b"no_such_motif_file.jaspar"))


def test_load_data_keyword():
    """Explicit in-memory content via load(data=...) (str and bytes)."""
    motifs = list(load(data=JASPAR16))
    assert len(motifs) == 1 and motifs[0].name == "MA0001.3"
    motifs = list(load(data=JASPAR16.encode()))
    assert len(motifs) == 1 and motifs[0].name == "MA0001.3"
    with pytest.raises(TypeError):
        list(load(io.StringIO(JASPAR16), data=JASPAR16))
    with pytest.raises(TypeError):
        list(load())


# ---------------------------------------------------------------------------
# malformed / truncated input (reference: nom error paths,
# lightmotif-io/src/error.rs)
# ---------------------------------------------------------------------------


def test_jaspar_raw_wrong_row_count():
    with pytest.raises(ParseError):
        list(read_jaspar(io.StringIO(">M1\n1 2 3\n4 5 6\n7 8 9\n")))


def test_jaspar_raw_bad_token():
    with pytest.raises(ParseError):
        list(read_jaspar(io.StringIO(">M1\n1 x 3\n1 2 3\n1 2 3\n1 2 3\n")))


def test_jaspar16_truncated_record():
    # header with no matrix lines (EOF mid-record)
    with pytest.raises(ParseError):
        list(read_jaspar16(io.StringIO(">MA0000.1 empty\n")))


def test_jaspar16_bad_line():
    with pytest.raises(ParseError):
        list(read_jaspar16(io.StringIO(">M\nA  1 2 3\n")))  # no brackets


def test_jaspar16_duplicate_symbol():
    text = ">M\nA [ 1 2 ]\nA [ 3 4 ]\n"
    with pytest.raises(ParseError):
        list(read_jaspar16(io.StringIO(text)))


def test_jaspar16_ragged_columns():
    text = ">M\nA [ 1 2 ]\nC [ 3 ]\nG [ 0 0 ]\nT [ 0 0 ]\n"
    with pytest.raises(ParseError):
        list(read_jaspar16(io.StringIO(text)))


def test_transfac_unknown_p0_symbol():
    text = "ID x\nP0 A C G Z\n00 1 2 3 4\n//\n"
    with pytest.raises(ParseError):
        list(read_transfac(io.StringIO(text)))


def test_transfac_bad_matrix_row():
    text = "ID x\nP0 A C G T\n00 1 2 three 4\n//\n"
    with pytest.raises(ParseError):
        list(read_transfac(io.StringIO(text)))


def test_meme_motif_without_matrix():
    text = "MEME version 4\n\nMOTIF broken\n"
    with pytest.raises(ParseError):
        list(read_meme(io.StringIO(text)))


def test_meme_truncated_matrix():
    text = (
        "MEME version 4\n\nMOTIF trunc\n"
        "letter-probability matrix: alength= 4 w= 3 nsites= 5 E= 1e-5\n"
        " 0.25 0.25 0.25 0.25\n"
    )
    with pytest.raises(ParseError):
        list(read_meme(io.StringIO(text)))


def test_meme_bad_row_width():
    text = (
        "MEME version 4\n\nMOTIF wide\n"
        "letter-probability matrix: alength= 4 w= 1\n"
        " 0.1 0.1 0.1 0.1 0.1 0.1 0.1\n"
    )
    with pytest.raises(ParseError):
        list(read_meme(io.StringIO(text)))


def test_uniprobe_bad_value():
    with pytest.raises(ParseError):
        list(read_uniprobe(io.StringIO("name\nA:\t0.1\tbad\n")))


def test_meme_is_streaming():
    """Motif records parse lazily: the second record must not be
    consumed from the handle until requested."""
    handle = io.StringIO(MEME)
    f = read_meme(handle)
    it = iter(f)
    first = next(it)
    assert first.id == "crp"
    # lexA's matrix lines are still unread (only crp + its URL block)
    assert "0.857143" in handle.read()


def test_meme_records_materialize():
    f = read_meme(io.StringIO(MEME))
    assert len(f) == 2  # len() drains the stream
    assert [r.id for r in f] == ["crp", "lexA"]  # re-iterable afterwards


# ---------------------------------------------------------------------------
# full real databases (reference bench data, lightmotif-io/benches/)
# ---------------------------------------------------------------------------

BENCH = "/root/reference/lightmotif-io/benches"
needs_bench = pytest.mark.skipif(
    not os.path.isdir(BENCH), reason="reference bench data not mounted"
)


@needs_bench
def test_jaspar2024_meme_database():
    """The full JASPAR 2024 database (2,346 motifs, 1.2 MB) parses
    streaming; every matrix row sums to ~1."""
    with open(f"{BENCH}/JASPAR2024.meme") as fh:
        f = read_meme(fh)
        assert f.version == "4"
        assert f.background["A"] == pytest.approx(0.25)
        n = 0
        first = None
        for rec in f:
            if first is None:
                first = rec
            n += 1
            assert rec.w == len(rec.matrix())
        assert n == 2346
    assert first.id == "MA0004.1"
    assert first.name == "Arnt"
    assert first.w == 6
    m = first.matrix()
    assert m.data[0, DNA.symbols.index("C")] == pytest.approx(0.8)


@needs_bench
def test_prodoric_transfac_database():
    """The full PRODORIC TRANSFAC dump (353 records) parses; MX000001
    comes out with the bench motif's consensus."""
    with open(f"{BENCH}/prodoric.transfac") as fh:
        recs = list(read_transfac(fh))
    assert len(recs) == 353
    first = recs[0]
    assert first.id == "MX000001"
    cm = first.to_counts()
    assert len(cm) == 15
    assert cm.consensus()[:5] == "GTTGA"


def test_meme_partial_then_records_raises():
    """.records after partially consuming the stream raises instead of
    silently returning a truncated list (review finding)."""
    f = read_meme(io.StringIO(MEME))
    next(iter(f))
    with pytest.raises(RuntimeError):
        _ = f.records


def test_meme_list_materializes_consistently():
    """list(MemeFile) (which probes __len__ as a length hint mid-iter)
    returns the full record list."""
    recs = list(read_meme(io.StringIO(MEME)))
    assert [r.id for r in recs] == ["crp", "lexA"]


def test_meme_second_iteration_after_partial_raises():
    """Starting a second iteration after a partial first one raises --
    silently resuming the shared stream would skip the consumed motifs
    (ADVICE round 2)."""
    f = read_meme(io.StringIO(MEME))
    next(iter(f))
    with pytest.raises(RuntimeError):
        iter(f)
    # full materialization first -> iteration replays from the list
    f2 = read_meme(io.StringIO(MEME))
    assert len(f2) == 2
    assert [r.id for r in f2] == ["crp", "lexA"]
    assert [r.id for r in f2] == ["crp", "lexA"]
