"""Gibbs sampler tests (reference ``lightmotif/src/sampler.rs:622-763``).

The reference pins a Rust Xoshiro RNG and asserts exact information
content; RNG streams differ across languages, so these tests assert the
*algorithmic* contract instead: determinism for a fixed numpy seed,
planted-motif recovery in oops mode, zoops convergence via patience,
and count/background bookkeeping invariants.
"""

import numpy as np
import pytest

from lightmotif_tpu import PROTEIN, EncodedSequence
from lightmotif_tpu.sampler import Sampler, SamplerData, sample_motifs

# the reference's 30 HTH protein sequences (sampler.rs:635-666)
PROTEIN_SEQS = [
    "IIDLTYIQNKSQKETGDILGISQMHVSRLQRKAVKKLR",
    "RFGLDLKKEKTQREIAKELGISRSWSRIEKRALMKMF",
    "VVFNQLLVDRRVSITAENLGLTQPAVSNALKRLRTSLQ",
    "FHFNRYLTRRRRIEIAHALCLTERQIKIWFQNRRMKWK",
    "LTAALAATRGNQIRAADLLGLNRNTLRKKIRDLDIQVY",
    "IRYRRMNLKHTQRSLAKALKISHVSVSQWERGDSEPTG",
    "MNAYTVSRLALDAGVSVHIVRDYLLRGLLRPV",
    "LDMVMQYTRGNQTRAALMMGINRGTLRKKLKKYGMN",
    "FRRKQSLNSKEKEEVAKKCGITPLQVRVWFINKRMRSK",
    "SALLNKIALMGTEKTAEAVGVDKSQISRWKRLMIPKFS",
    "THPDGMQIKITRQEIGQIVGCSRETVGRILKMLEDQNL",
    "ITLKDYAMRFGQTKTAKDLGVYQSAINKAIHAGRKIFL",
    "YKKDVIDHFGTQRAVAKALGISDAAVSQWKEVIPEKDA",
    "ISDHLADSNFDIASVAQHVCLSPSRLSHLFRQQLGISV",
    "FSPREFRLTMTRGDIGNYLGLTVETISRLLGRFQKSGM",
    "ARWLDEDNKSTLQELADRYGVSAERVRQLEKNANKKLR",
    "LTTALRHTQGHKQEAARLLGWGRNTLTRKLRELGME",
    "MKAKKQETAATMKDVALKAKVSTATVSRALMNPDKVSQ",
    "LQELRRSDRLHLKDAAALLGVSEMTIRRDLNNHSAPVV",
    "MATIKDVARLAGVSVAWSRVINNSPRASE",
    "MKPVTLYDVAEYAGVSYQTVSRVVNQASHVSA",
    "LLNEVGIEGLTTRKLAQKLGVEQPTLYWVKNKRALLD",
    "IVEELLRGEMSQRELKNELGAGIATITRGSNSLRAAPV",
    "LIAALEKAGWVQAKAARLLGMTPRQVAYRIQIMDITMP",
    "RFGLVGEEEKTQKDVAIMGISQSYISRLEKRIIKRLR",
    "QAGRLIAAGTPRQKVAIIYDVGVSTLYKTFPAGDR",
    "MATIKDVAKRANVSTTTVSHVINKTRFVAE",
    "MATLKDIAIEAGVSLATVSRVLNDDPTLNV",
    "DHISQTGMPPTRAEIAQRLGFRSPNAAEEHLKALARKG",
    "SSILNRIAIRGQRRVADALGINESQISRWRGDFIPRMG",
]


@pytest.fixture(scope="module")
def data():
    return SamplerData(
        [EncodedSequence.encode(s, PROTEIN) for s in PROTEIN_SEQS]
    )


def test_oops_deterministic(data):
    r1 = sample_motifs(data, width=17, steps=21, rng=42)
    r2 = sample_motifs(data, width=17, steps=21, rng=42)
    assert r1.z == r2.z
    assert np.array_equal(r1.counts.data, r2.counts.data)
    assert r1.pssm.information_content() == r2.pssm.information_content()


def test_oops_information_content(data):
    result = sample_motifs(data, width=17, steps=21, rng=42)
    ic = result.pssm.information_content()
    # the reference reaches IC ~= 11.55 after 20 steps with its RNG;
    # any sane sampler lands in the same band for this dataset
    assert 5.0 < ic < 40.0


def test_oops_bookkeeping(data):
    sampler = Sampler(data, width=17, rng=np.random.default_rng(7))
    totals = sum(c.sum() for c in data.counts)
    for _ in range(10):
        next(sampler)
        # motif counts + background counts account for every symbol
        assert sampler.motif.sum() + sampler.background_counts.sum() == totals
        # each active sequence contributes exactly `width` motif symbols
        assert sampler.motif.sum() == sampler.active.sum() * 17
        assert (sampler.motif >= 0).all()
        assert (sampler.background_counts >= 0).all()


def test_zoops_converges(data):
    sampler = Sampler(
        data, width=17, rng=np.random.default_rng(42),
        mode="zoops", seeds=5, inertia=10, patience=10,
    )
    steps = list(zip(range(2000), sampler))
    assert sampler.converged
    assert len(steps) < 2000


def test_planted_motif_recovery():
    # plant GTTGACCTTATCAAC at a random position in random background
    rng = np.random.default_rng(5)
    motif = "GTTGACCTTATCAAC"
    seqs = []
    planted = []
    for _ in range(20):
        bg = "".join(rng.choice(list("ACGT"), size=60))
        pos = int(rng.integers(0, 60 - len(motif)))
        seqs.append(bg[:pos] + motif + bg[pos + len(motif):])
        planted.append(pos)
    data = SamplerData([EncodedSequence.encode(s) for s in seqs])
    sampler = Sampler(data, width=15, rng=np.random.default_rng(11))
    last = None
    for i, last in zip(range(300), sampler):
        pass
    # most inferred starts should agree on the planted alignment up to a
    # global phase shift (Gibbs samplers without phase-shift moves --
    # including the reference -- converge to shifted local optima)
    from collections import Counter

    shifts = Counter(s - p for s, p in zip(sampler.starts, planted))
    shift, hits = shifts.most_common(1)[0]
    assert abs(shift) <= 3, shifts
    assert hits >= 15, (sampler.starts, planted)
    assert last.pssm.information_content() > 10


def test_width_too_large():
    data = SamplerData([EncodedSequence.encode("ACGT")])
    with pytest.raises(ValueError):
        Sampler(data, width=10)


def test_batched_oops_recovers_planted_motif():
    from lightmotif_tpu.sampler_batch import sample_oops_batch

    rng = np.random.default_rng(5)
    motif = "GTTGACCTAT"
    seqs = []
    for i in range(20):
        s = list("".join("ACGT"[j] for j in rng.integers(0, 4, size=120)))
        pos = int(rng.integers(0, 110))
        s[pos:pos + 10] = list(motif)
        seqs.append("".join(s))

    res = sample_oops_batch(seqs, width=10, steps=150, chains=32, seed=1)
    assert res.information_content.shape == (32,)
    consensus = res.count_matrix().consensus()
    matches = sum(a == b for a, b in zip(consensus, motif))
    assert matches >= 8, consensus
    # deterministic under the threefry PRNG
    res2 = sample_oops_batch(seqs, width=10, steps=150, chains=32, seed=1)
    assert np.array_equal(res.starts, res2.starts)
    # per-chain accessors
    pssm = res.pssm()
    assert len(pssm) == 10


def test_batched_zoops_includes_planted_sequences():
    from lightmotif_tpu.sampler_batch import sample_zoops_batch

    rng = np.random.default_rng(5)
    motif = "GTTGACCTAT"
    seqs = []
    for i in range(16):
        s = list("".join("ACGT"[j] for j in rng.integers(0, 4, size=150)))
        pos = int(rng.integers(0, 140))
        s[pos:pos + 10] = list(motif)
        seqs.append("".join(s))

    res = sample_zoops_batch(seqs, width=10, steps=300, chains=32,
                             seed=2, seeds=4)
    b = res.best
    assert int(res.active[b].sum()) >= 12  # most sequences included
    consensus = res.count_matrix().consensus()
    assert sum(a == b_ for a, b_ in zip(consensus, motif)) >= 8, consensus
    res2 = sample_zoops_batch(seqs, width=10, steps=300, chains=32,
                              seed=2, seeds=4)
    assert np.array_equal(res.starts, res2.starts)
