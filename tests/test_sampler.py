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


# ---------------------------------------------------------------------------
# batched-sampler step parity vs the host sampler (VERDICT round-1 item)
# ---------------------------------------------------------------------------


def _batch_inputs(seqs, width, k=5):
    import jax.numpy as jnp

    n = len(seqs)
    lp = max(len(s) for s in seqs)
    mat = np.full((n, lp), 4, np.uint8)
    totals = np.zeros((n, k), np.float32)
    valid = np.zeros(n, np.int32)
    for i, s in enumerate(seqs):
        mat[i, : len(s)] = s.data
        totals[i] = np.bincount(s.data, minlength=k).astype(np.float32)
        valid[i] = len(s) - width + 1
    return jnp.asarray(mat), jnp.asarray(totals), jnp.asarray(valid)


def test_batch_step_math_matches_host_sampler():
    """The batched sampler's per-step transforms (counts, background,
    PSSM, hold-out scores, sampling distribution) reproduce the host
    sampler's numbers from an identical state."""
    import jax
    import jax.numpy as jnp

    from lightmotif_tpu.sampler import Sampler, SamplerData
    from lightmotif_tpu.sampler_batch import (
        counts_of, pssm_of, score_holdouts)

    rng = np.random.default_rng(5)
    seqs = [
        EncodedSequence(rng.integers(0, 4, size=60, dtype=np.uint8))
        for _ in range(6)
    ]
    width, k = 8, 5
    host = Sampler(SamplerData(seqs), width=width,
                   rng=np.random.default_rng(3))
    starts = [3, 11, 0, 52, 20, 7]
    host.starts = list(starts)
    host.motif[:] = 0
    host.background_counts[:] = 0
    for i in range(6):
        host._add_counts(i, +1)

    z = 2
    host._exclude(z)
    counts_h, pssm_h = host._prepare_pssm()
    scores_h = pssm_h.score_host(seqs[z])

    mat, totals, valid = _batch_inputs(seqs, width)
    starts_b = jnp.asarray(np.asarray(starts, np.int32)[None, :])
    act_f = jnp.asarray(
        (np.arange(6) != z).astype(np.float32)[None, :])
    counts_b, bgc_b = counts_of(mat, totals, starts_b, act_f, width, k)
    pssm_b, ic_b = pssm_of(counts_b, bgc_b, k)

    # integer bookkeeping must agree exactly
    assert np.array_equal(np.asarray(counts_b[0]),
                          np.asarray(counts_h.data, np.float32))
    assert np.array_equal(np.asarray(bgc_b[0]),
                          host.background_counts.astype(np.float32))
    # PSSM and IC agree to f32 rounding (vectorized vs sequential ops)
    np.testing.assert_allclose(
        np.asarray(pssm_b[0]), np.asarray(pssm_h.data), rtol=2e-6,
        atol=2e-6)
    np.testing.assert_allclose(
        float(ic_b[0]), pssm_h.information_content(), rtol=2e-6)

    # given the SAME pssm array, the batched scorer is bit-exact vs the
    # host oracle (ascending-j f32 adds in both)
    scores_same = score_holdouts(
        mat[z][None, :], jnp.asarray(pssm_h.data)[None], valid[z][None],
        width, k)
    assert np.array_equal(np.asarray(scores_same[0]), scores_h)

    # sampling distribution: softmax(score * ln2 / T) == normalized
    # 2^(score/T) weights of the host sampler
    t = 1.3
    probs_b = np.asarray(jax.nn.softmax(
        scores_same[0] * (np.log(2.0) / t)))
    w = np.exp2(scores_h.astype(np.float64) / t)
    np.testing.assert_allclose(probs_b, w / w.sum(), rtol=1e-5, atol=1e-9)


def test_batch_step_trajectory_matches_host_forced_draws():
    """5 OOPS steps with identical forced draws: the batched step math,
    driven step-for-step, lands on the host sampler's exact integer
    counts and starts."""
    import jax.numpy as jnp

    from lightmotif_tpu.sampler import Sampler, SamplerData
    from lightmotif_tpu.sampler_batch import (
        counts_of, pssm_of, score_holdouts)

    rng = np.random.default_rng(11)
    seqs = [
        EncodedSequence(rng.integers(0, 4, size=40, dtype=np.uint8))
        for _ in range(5)
    ]
    width, k = 6, 5
    forced_z = [1, 4, 0, 2, 3]
    forced_pick = [7, 0, 21, 13, 30]

    class ForcedRng:
        """Replays preset hold-out and categorical draws."""

        def __init__(self):
            self.z_it = iter(forced_z)
            self.pick_it = iter(forced_pick)

        def integers(self, lo, hi):
            return next(self.z_it)

        def choice(self, n, p=None):
            return next(self.pick_it)

    host = Sampler(SamplerData(seqs), width=width, rng=np.random.default_rng(0))
    host.rng = ForcedRng()
    init_starts = list(host.starts)
    for _ in range(5):
        next(host)

    # batched math, same forced draws
    mat, totals, valid = _batch_inputs(seqs, width)
    starts_b = np.asarray(init_starts, np.int32)[None, :]
    for z, pick in zip(forced_z, forced_pick):
        act_f = jnp.asarray(
            (np.arange(5) != z).astype(np.float32)[None, :])
        counts_b, bgc_b = counts_of(
            mat, totals, jnp.asarray(starts_b), act_f, width, k)
        pssm_b, _ = pssm_of(counts_b, bgc_b, k)
        # the categorical pick is forced, so only the support matters
        scores_b = score_holdouts(
            mat[z][None, :], pssm_b, valid[z][None], width, k)
        assert np.isfinite(np.asarray(scores_b[0, pick]))
        starts_b = starts_b.copy()
        starts_b[0, z] = pick

    assert starts_b[0].tolist() == host.starts
    act_all = jnp.ones((1, 5), jnp.float32)
    counts_b, _ = counts_of(mat, totals, jnp.asarray(starts_b), act_all,
                            width, k)
    assert np.array_equal(
        np.asarray(counts_b[0]),
        host.count_matrix().data.astype(np.float32))


def test_batch_sampler_resume_bitexact():
    """steps=A then state-resume B == one run of A+B, bit-identically
    (explicit PyTree carry; SURVEY §5 stop/resume)."""
    from lightmotif_tpu.sampler_batch import sample_oops_batch

    rng = np.random.default_rng(21)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=120))
            for _ in range(8)]
    full = sample_oops_batch(seqs, width=9, steps=40, chains=6, seed=3)
    part = sample_oops_batch(seqs, width=9, steps=15, chains=6, seed=3)
    rest = sample_oops_batch(seqs, width=9, steps=25, chains=6, seed=3,
                             state=part.state)
    assert np.array_equal(rest.starts, full.starts)
    assert np.array_equal(rest.information_content,
                          full.information_content)
    assert int(rest.state.step) == 40


def test_batch_zoops_resume_bitexact():
    """ZOOPS resume carries the step counter, so inertia and patience
    windows continue seamlessly across the boundary."""
    from lightmotif_tpu.sampler_batch import sample_zoops_batch

    rng = np.random.default_rng(22)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=100))
            for _ in range(7)]
    kw = dict(width=8, chains=5, seed=9, seeds=2, inertia=10, patience=12)
    full = sample_zoops_batch(seqs, steps=36, **kw)
    part = sample_zoops_batch(seqs, steps=14, **kw)
    rest = sample_zoops_batch(seqs, steps=22, state=part.state, **kw)
    assert np.array_equal(rest.starts, full.starts)
    assert np.array_equal(rest.active, full.active)
    assert np.array_equal(rest.information_content,
                          full.information_content)
