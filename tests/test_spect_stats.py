"""Statistical validations of the SPECT count machinery — the automated
counterpart of the fork's 理论测试/ analysis scripts (SURVEY §4.7:
test_conditional_binomial_dose.py, 泊松统计比较.py): binomial thinning of
Poisson counts, split independence, and Anscombe variance stabilization
(kair_tpu/utils/spect.py, data/dataset_spect.py)."""

import numpy as np

from kair_tpu.utils.spect import (anscombe, binomial_thin, inverse_anscombe,
                                  poisson_log_likelihood)


def test_binomial_thinning_is_poisson():
    """If N ~ Poisson(λ) and low ~ Binomial(N, p), then low ~ Poisson(pλ):
    mean AND variance must both equal pλ (the dose-reduction model the
    fork's dataset_spect relies on)."""
    rng = np.random.default_rng(0)
    lam, p, n = 80.0, 0.125, 400_000
    counts = rng.poisson(lam, n).astype(np.float64)
    low = binomial_thin(counts, p, rng=np.random.default_rng(1))
    assert abs(low.mean() - p * lam) < 0.05
    assert abs(low.var() - p * lam) / (p * lam) < 0.02


def test_thinned_split_independence():
    """The binomial split of a Poisson count into (low, rest) yields
    INDEPENDENT Poisson variables — zero covariance (the property that
    makes use_binomial_resampling a valid noise2noise-style pairing,
    fork test_conditional_binomial_dose.py)."""
    rng = np.random.default_rng(2)
    lam, p, n = 50.0, 0.25, 400_000
    counts = rng.poisson(lam, n).astype(np.float64)
    low = binomial_thin(counts, p, rng=np.random.default_rng(3))
    rest = counts - low
    corr = np.corrcoef(low, rest)[0, 1]
    assert abs(corr) < 0.01, corr
    assert abs(rest.mean() - (1 - p) * lam) < 0.1


def test_anscombe_variance_stabilization():
    """var(anscombe(Poisson(λ))) ≈ 1 for λ ≳ 10 (the reason the 'anscombe'
    normalization mode exists), and the unbiased inverse applied to the
    TRANSFORMED-DOMAIN mean recovers λ to <0.3% (Makitalo-Foi's inverse
    targets E[anscombe(k)] → λ; a per-sample inverse keeps Jensen bias)."""
    rng = np.random.default_rng(4)
    for lam in (10.0, 30.0, 100.0):
        x = rng.poisson(lam, 200_000).astype(np.float64)
        v = anscombe(x).var()
        assert abs(v - 1.0) < 0.08, (lam, v)
        back = float(inverse_anscombe(
            np.asarray([anscombe(x).mean()]), unbiased=True)[0])
        assert abs(back - lam) / lam < 0.003, (lam, back)


def test_poisson_ll_prefers_true_rate():
    """The PLL metric must peak at the true rate (harness sanity: PLL is
    used to rank SPECT reconstructions, eval/harness.py)."""
    rng = np.random.default_rng(5)
    target = rng.poisson(40.0, 50_000).astype(np.float64)
    ll_true = poisson_log_likelihood(np.full_like(target, 40.0), target)
    ll_low = poisson_log_likelihood(np.full_like(target, 30.0), target)
    ll_high = poisson_log_likelihood(np.full_like(target, 55.0), target)
    assert ll_true > ll_low and ll_true > ll_high
