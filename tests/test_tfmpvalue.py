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
