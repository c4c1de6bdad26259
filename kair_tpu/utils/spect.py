"""SPECT (bone-scan) normalisation utilities
(fork reference: utils/utils_spect.py:3-35)."""

from __future__ import annotations

import numpy as np


def normalize_spect(img: np.ndarray, method: str = "log",
                    max_pixel: float = 150) -> np.ndarray:
    if method == "log":
        return np.log(img + 1.0) / np.log(max_pixel + 1.0)
    if method == "anscombe":
        return np.sqrt(img + 3 / 8) / np.sqrt(max_pixel + 3 / 8)
    if method == "linear":
        return img / max_pixel
    raise ValueError(f"Unknown normalization method: {method}")


def denormalize_spect(img: np.ndarray, method: str = "log",
                      max_pixel: float = 150) -> np.ndarray:
    if method == "log":
        return np.exp(img * np.log(max_pixel + 1.0)) - 1.0
    if method == "anscombe":
        return (np.sqrt(max_pixel + 3 / 8) * img) ** 2 - 3 / 8
    if method == "linear":
        return img * max_pixel
    raise ValueError(f"Unknown normalization method: {method}")


def poisson_log_likelihood(pred_counts: np.ndarray, target_counts: np.ndarray,
                           epsilon: float = 1e-9) -> float:
    """Mean Poisson log-likelihood k·logλ − λ (reference utils_image.pll
    utils_image.py:833-861 semantics, counts domain)."""
    lam = np.clip(pred_counts, epsilon, None)
    k = np.clip(target_counts, 0, None)
    return float(np.mean(k * np.log(lam) - lam))


def anscombe(counts: np.ndarray) -> np.ndarray:
    """Variance-stabilising Anscombe transform 2*sqrt(k + 3/8): Poisson
    counts → approximately unit-variance Gaussian (the assumption the fork
    validates in 理论测试/test_anscombe_gaussian.py / anscombe_poisson_
    comparison.py before using sqrt-domain losses)."""
    return 2.0 * np.sqrt(np.clip(counts, 0, None) + 3.0 / 8.0)


def inverse_anscombe(y: np.ndarray, unbiased: bool = True) -> np.ndarray:
    """Algebraic (biased) or closed-form approximately-unbiased inverse
    (Makitalo & Foi's asymptotic expansion)."""
    if not unbiased:
        return (y / 2.0) ** 2 - 3.0 / 8.0
    return ((y / 2.0) ** 2 - 1.0 / 8.0
            + np.sqrt(1.5) / 4.0 / np.clip(y, 1e-6, None)
            - 11.0 / 8.0 / np.clip(y, 1e-6, None) ** 2
            + 5.0 * np.sqrt(1.5) / 8.0 / np.clip(y, 1e-6, None) ** 3)


def binomial_thin(counts: np.ndarray, dose_fraction: float,
                  rng: np.random.Generator) -> np.ndarray:
    """Simulate a reduced-dose acquisition from full-dose counts by
    binomial thinning: each detected event survives independently with
    probability `dose_fraction`. If the full-dose image is Poisson(λ), the
    thinned image is exactly Poisson(dose_fraction·λ) — the conditional-
    binomial identity the fork validates in 理论测试/
    test_conditional_binomial_dose.py and 测试二项重采样.py."""
    if not 0.0 <= dose_fraction <= 1.0:
        raise ValueError(f"dose_fraction must be in [0,1], got {dose_fraction}")
    k = np.clip(np.round(counts), 0, None).astype(np.int64)
    return rng.binomial(k, dose_fraction).astype(np.float32)
