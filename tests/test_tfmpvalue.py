"""TFM-PVALUE golden tests (reference ``lightmotif-tfmpvalue/src/lib.rs:472-598``,
values cross-checked against pytfmpval)."""

import pytest

from lightmotif_tpu.tfmpvalue import TfmPvalue

from .data import build_ma0045


def almost_eq(x, y, places):
    assert round(x * 10**places) == round(y * 10**places), (x, y)


@pytest.fixture(scope="module")
def pssm():
    return build_ma0045()


def test_approximate_pvalue(pssm):
    tfmp = TfmPvalue(pssm)
    it = iter(tfmp.approximate_pvalue(10.0))

    i = next(it)
    almost_eq(i.granularity, 1e-1, places=5)
    almost_eq(i.range[0], 5.74842561e-5, places=7)
    almost_eq(i.range[1], 0.000185822369, places=7)
    assert not i.converged

    i = next(it)
    almost_eq(i.granularity, 1e-2, places=7)
    almost_eq(i.range[0], 0.000119815, places=5)
    almost_eq(i.range[1], 0.000129149, places=7)
    assert not i.converged

    i = next(it)
    almost_eq(i.range[0], 0.000124890, places=7)
    almost_eq(i.range[1], 0.000126113, places=7)

    i = next(it)
    almost_eq(i.range[0], 0.00012567, places=5)
    almost_eq(i.range[1], 0.000126059, places=5)

    i = next(it)
    almost_eq(i.range[0], 0.00012601, places=5)

    i = next(it)
    almost_eq(i.range[0], 0.00012601, places=5)

    i = next(it)
    almost_eq(i.granularity, 1e-7, places=5)
    almost_eq(i.range[0], 0.0001260, places=5)
    assert i.converged

    assert next(it, None) is None


def test_pvalue(pssm):
    tfmp = TfmPvalue(pssm)
    almost_eq(tfmp.pvalue(8.882756), 0.0003, places=5)
    almost_eq(tfmp.pvalue(12.657785), 0.00001, places=5)
    almost_eq(tfmp.pvalue(19.1), 1e-10, places=5)


def test_score(pssm):
    tfmp = TfmPvalue(pssm)
    almost_eq(tfmp.score(0.00001), 12.657785, places=4)
    almost_eq(tfmp.score(0.0003), 8.882756, places=5)
    almost_eq(tfmp.score(1e-10), 19.1, places=5)


def test_wide_matrix_fine_granularity():
    """m=20 at granularity 1e-5 completes fast (vectorized int64 DP).

    Guards the np.add.at DP path (``tfmpvalue.py::_distribution_np``)
    against regressing to dict-loop speeds; the reference's IntMap DP
    (``lightmotif-tfmpvalue/src/lib.rs:132-183``) handles this scale.
    """
    import time

    import numpy as np

    from lightmotif_tpu import DNA, CountMatrix

    rng = np.random.default_rng(7)
    counts = rng.integers(0, 40, size=(20, 4))
    rows = np.concatenate([counts, np.zeros((20, 1), int)], axis=1)
    pssm = CountMatrix(DNA, rows.tolist()).to_freq(0.1).to_scoring(None)
    tfmp = TfmPvalue(pssm)
    score = 0.8 * float(np.asarray(pssm.data)[:, :4].max(axis=1).sum())

    t0 = time.perf_counter()
    last = None
    for it in tfmp.approximate_pvalue(score):
        last = it
        if it.granularity <= 1e-5:
            break
    wall = time.perf_counter() - t0
    assert last is not None and last.granularity <= 1e-5
    lo, hi = last.range
    assert 0.0 < lo <= hi < 1.0
    assert (hi - lo) / hi < 1e-2  # range nearly collapsed at 1e-5
    assert wall < 5.0  # dict DP took minutes here


def test_roundtrip_property():
    """pvalue(score(p)) == p-neighborhood and monotonicity, random PSSMs.

    Property test pinning ``_lookup_score``'s total/pvalues bookkeeping
    (reference quirks at ``lib.rs:229-287``): the score->pvalue->score
    round trip must be stable and pvalue must be antitone in score.
    """
    import numpy as np

    from lightmotif_tpu import DNA, CountMatrix

    rng = np.random.default_rng(42)
    for trial in range(5):
        m = int(rng.integers(4, 12))
        counts = rng.integers(0, 25, size=(m, 4))
        rows = np.concatenate([counts, np.zeros((m, 1), int)], axis=1)
        pssm = CountMatrix(DNA, rows.tolist()).to_freq(0.1).to_scoring(None)
        tfmp = TfmPvalue(pssm)
        smax = float(np.asarray(pssm.data)[:, :4].max(axis=1).sum())
        smin = float(np.asarray(pssm.data)[:, :4].min(axis=1).sum())

        probes = [smin + f * (smax - smin) for f in (0.55, 0.7, 0.85)]
        pvals = [tfmp.pvalue(s) for s in probes]
        # antitone: higher score -> p-value no larger
        assert pvals[0] >= pvals[1] >= pvals[2], (trial, probes, pvals)
        backs = []
        for s, p in zip(probes, pvals):
            if p <= 0.0:
                backs.append(None)
                continue  # beyond representable tail
            s_back = tfmp.score(p)
            p_back = tfmp.pvalue(s_back)
            backs.append(s_back)
            # score(p) returns a score whose exact p-value covers p
            # (>= p): the distribution is discrete, p itself may be
            # unattainable, and the reference's equality quirk
            # (lib.rs:252-263) can step one level low -- but coverage
            # must hold.
            assert p_back >= p * (1.0 - 1e-9), (trial, s, p, s_back, p_back)
        # score antitone in p: larger p-value -> smaller-or-equal score
        got = [b for b in backs if b is not None]
        assert all(a <= b + 1e-9 for a, b in zip(got, got[1:])), (trial, backs)


def test_doctest_example():
    # lib.rs:306-326 doctest
    from lightmotif_tpu import DNA, CountMatrix

    pssm = (
        CountMatrix(
            DNA,
            [
                [1, 0, 1, 0, 0],
                [0, 1, 1, 0, 0],
                [0, 0, 0, 2, 0],
                [0, 0, 2, 0, 0],
            ],
        )
        .to_freq(0.1)
        .to_scoring(None)
    )
    tfmp = TfmPvalue(pssm)
    for it in tfmp.approximate_pvalue(10.0):
        if it.converged or it.granularity <= 0.001:
            p = it.range[0]
            break
    assert 0.0 <= p <= 1.0
