"""CLI end-to-end tests (reference ``lightmotif-cli``)."""

import gzip

import pytest

from lightmotif_tpu.cli import main

MATRICES = """\
>motif1\ttest
A  [  0  0  0  0  2  0  0  0  1  1  0  0  2  2  0 ]
C  [  0  0  0  0  0  1  2  1  0  0  0  2  0  0  2 ]
G  [  2  0  0  2  0  0  0  0  0  1  0  0  0  0  0 ]
T  [  0  2  2  0  0  1  0  1  1  0  2  0  0  0  0 ]
"""

FASTA = """\
>seq1 a test sequence
ATGTCCCAACAACGATACCCCGAGCCCATCGCC
GTCATCGGCTCGGCATGCAGATTCCCAGGCG
>seq2
GTTGACCTTATCAACGTTGACCTTATCAAC
"""


@pytest.fixture()
def files(tmp_path):
    m = tmp_path / "motifs.jaspar16"
    m.write_text(MATRICES)
    s = tmp_path / "seqs.fa"
    s.write_text(FASTA)
    o = tmp_path / "out.tsv"
    return str(m), str(s), str(o)


def run(files, *extra):
    m, s, o = files
    rc = main(["-m", m, "--format", "jaspar16", "-s", s, "-o", o, "-q", *extra])
    assert rc == 0
    with open(o) as fh:
        lines = fh.read().splitlines()
    header = lines[0].split("\t")
    assert header == [
        "seq_index", "seq_name", "motif_index", "motif_name",
        "pos", "strand", "score", "pvalue",
    ]
    return [line.split("\t") for line in lines[1:]]


def test_scan_finds_planted_sites(files):
    rows = run(files, "--abs-threshold", "-10")
    # seq2 contains the motif twice (positions 0 and 15)
    seq2 = [r for r in rows if r[1] == "seq2"]
    positions = sorted(int(r[4]) for r in seq2)
    assert {0, 15} <= set(positions)
    for r in seq2:
        assert r[5] == "+"
        assert float(r[7]) <= 1.0


def test_pvalue_threshold(files):
    rows = run(files, "-P", "1e-4")
    assert all(float(r[7]) <= 1e-3 for r in rows)
    seq2 = [r for r in rows if r[1] == "seq2"]
    assert len(seq2) >= 2


def test_reverse_strand(files, tmp_path):
    rows = run(files, "--abs-threshold", "-10", "--reverse")
    strands = {r[5] for r in rows}
    assert "+" in strands
    # the planted motif's reverse complement appears on the - strand of
    # a sequence containing the forward motif? only if palindromic; at
    # minimum the scan must not crash and may emit - hits
    assert strands <= {"+", "-"}


def test_rel_threshold(files):
    rows = run(files, "--rel-threshold", "0.8")
    assert all(r[5] == "+" for r in rows)


def test_gzip_inputs(tmp_path):
    m = tmp_path / "motifs.gz"
    with gzip.open(m, "wt") as fh:
        fh.write(MATRICES)
    s = tmp_path / "seqs.fa.gz"
    with gzip.open(s, "wt") as fh:
        fh.write(FASTA)
    o = tmp_path / "out.tsv"
    rc = main(["-m", str(m), "--format", "jaspar16", "-s", str(s),
               "-o", str(o), "-q", "--abs-threshold", "-10"])
    assert rc == 0
    assert len(open(o).read().splitlines()) >= 3


def test_mesh_matches_single(files):
    m, s, o = files
    rows_single = run(files, "--abs-threshold", "-12")
    rows_mesh = run(files, "--abs-threshold", "-12", "--mesh")
    key = lambda r: (r[0], r[2], int(r[4]), r[5])
    assert sorted(map(key, rows_single)) == sorted(map(key, rows_mesh))


def test_batched_records_match_serial(tmp_path):
    """>8 records trigger the batched device pass; rows must equal the
    serial per-record scan."""
    import numpy as np

    m = tmp_path / "motifs.jaspar16"
    m.write_text(MATRICES)
    rng = np.random.default_rng(12)
    fasta = []
    for i in range(12):
        s = "".join("ACGT"[j] for j in rng.integers(0, 4, size=120))
        fasta.append(f">rec{i}\n{s}\n")
    s1 = tmp_path / "many.fa"
    s1.write_text("".join(fasta))
    o1 = tmp_path / "o1.tsv"
    rc = main(["-m", str(m), "--format", "jaspar16", "-s", str(s1),
               "-o", str(o1), "-q", "--abs-threshold", "-14", "--reverse"])
    assert rc == 0
    rows_batch = open(o1).read().splitlines()[1:]

    # serial reference: one record per file
    rows_serial = []
    for i, rec in enumerate(fasta):
        sf = tmp_path / f"one{i}.fa"
        sf.write_text(rec)
        of = tmp_path / f"oo{i}.tsv"
        main(["-m", str(m), "--format", "jaspar16", "-s", str(sf),
              "-o", str(of), "-q", "--abs-threshold", "-14", "--reverse"])
        for line in open(of).read().splitlines()[1:]:
            cols = line.split("\t")
            cols[0] = str(i + 1)
            cols[1] = f"rec{i}"
            rows_serial.append("\t".join(cols))

    def key(r):
        c = r.split("\t")
        return (int(c[0]), c[3], int(c[4]), c[5])

    assert sorted(rows_batch, key=key) == sorted(rows_serial, key=key)


def test_no_direct_no_reverse_many_records(tmp_path):
    """Empty strand set must not crash the batched path."""
    import numpy as np

    m = tmp_path / "motifs.jaspar16"
    m.write_text(MATRICES)
    rng = np.random.default_rng(3)
    fasta = "".join(
        f">r{i}\n" + "".join("ACGT"[j] for j in rng.integers(0, 4, 60)) + "\n"
        for i in range(12)
    )
    s = tmp_path / "many.fa"
    s.write_text(fasta)
    o = tmp_path / "o.tsv"
    rc = main(["-m", str(m), "--format", "jaspar16", "-s", str(s),
               "-o", str(o), "-q", "--no-direct"])
    assert rc == 0
    assert open(o).read().splitlines()[1:] == []


def test_streaming_flights_match_single_pass(tmp_path):
    """A multi-record file split into many bounded flights produces
    exactly the single-pass output (flat-RSS streaming; round-1 VERDICT
    item 6)."""
    import numpy as np

    m = tmp_path / "motifs.jaspar16"
    m.write_text(MATRICES)
    rng = np.random.default_rng(17)
    recs = []
    for i in range(40):
        body = "".join("ACGT"[c] for c in rng.integers(0, 4, size=400))
        # plant the strong motif in some records
        if i % 7 == 0:
            body = body[:100] + "GTTGACCTTATCAAC" + body[115:]
        recs.append(f">r{i}\n{body}\n")
    s = tmp_path / "many.fa"
    s.write_text("".join(recs))

    def run_with(flight_bytes, name):
        o = tmp_path / name
        rc = main(["-m", str(m), "--format", "jaspar16", "-s", str(s),
                   "-o", str(o), "-q", "--abs-threshold", "-8",
                   "--flight-bytes", str(flight_bytes)])
        assert rc == 0
        return o.read_text()

    # ~417 bytes/record + gap: 2k flights hold ~4 records -> ~10 flights
    streamed = run_with(2048, "flights.tsv")
    single = run_with(1 << 26, "single.tsv")
    assert streamed == single
    assert streamed.count("\n") > 5  # sanity: hits were found


def test_streaming_solo_record(tmp_path):
    """A record larger than the flight bound takes the segmented solo
    path and still matches the batched output for the other records."""
    import numpy as np

    m = tmp_path / "motifs.jaspar16"
    m.write_text(MATRICES)
    rng = np.random.default_rng(23)
    big = "".join("ACGT"[c] for c in rng.integers(0, 4, size=9000))
    big = big[:500] + "GTTGACCTTATCAAC" + big[515:]
    small = "".join("ACGT"[c] for c in rng.integers(0, 4, size=300))
    s = tmp_path / "mix.fa"
    s.write_text(f">small1\n{small}\n>big\n{big}\n>small2\n{small}\n")

    def run_with(flight_bytes, name):
        o = tmp_path / name
        rc = main(["-m", str(m), "--format", "jaspar16", "-s", str(s),
                   "-o", str(o), "-q", "--abs-threshold", "-8",
                   "--flight-bytes", str(flight_bytes)])
        assert rc == 0
        return o.read_text()

    streamed = run_with(4096, "solo.tsv")     # big record goes solo
    single = run_with(1 << 26, "whole.tsv")
    assert streamed == single
    assert ">big" not in streamed and "\tbig\t" in streamed
