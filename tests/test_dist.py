"""ScoreDistribution golden tests (reference ``pwm/dist.rs:236-300``)."""

import numpy as np
import pytest

from lightmotif_tpu import ScoreDistribution

from .data import build_ma0045


def almost_eq(x, y, places):
    assert round(x * 10**places) == round(y * 10**places), (x, y)


@pytest.fixture(scope="module")
def cdf():
    return ScoreDistribution(build_ma0045())


def test_pvalue(cdf):
    almost_eq(cdf.pvalue(8.89385), 0.0003, places=5)
    almost_eq(cdf.pvalue(12.66480), 0.00001, places=5)
    almost_eq(cdf.pvalue(17.71508), 1e-9, places=9)


def test_score(cdf):
    almost_eq(cdf.score(0.00001), 12.66480, places=5)
    almost_eq(cdf.score(0.0003), 8.89385, places=5)
    almost_eq(cdf.score(1e-9), 17.71508, places=4)


def test_pvalue_bounds(cdf):
    assert cdf.pvalue(-1e6) == 1.0
    assert cdf.pvalue(1e6) == 0.0
    assert 0.0 < cdf.min_pvalue() < 1.0


def test_score_bounds(cdf):
    assert cdf.score(1.0) == cdf.unscale(cdf.min_score_)
    assert cdf.score(0.0) == cdf.unscale(cdf.max_score_)


def test_sample(cdf):
    import numpy as np

    rng = np.random.default_rng(42)
    samples = [cdf.sample(rng) for _ in range(100)]
    assert all(np.isfinite(samples))


def test_pvalue_nonfinite_scalar_vector_parity(cdf):
    """pvalues() raises the same exceptions the scalar int(round(x))
    path does for non-finite scores -- casting inf/nan through
    astype(int64) silently yielded an arbitrary clamped p-value."""
    with pytest.raises(OverflowError):
        cdf.pvalue(np.inf)
    with pytest.raises(OverflowError):
        cdf.pvalues([1.0, np.inf])
    with pytest.raises(ValueError):
        cdf.pvalue(np.nan)
    with pytest.raises(ValueError):
        cdf.pvalues([np.nan, 1.0])
