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
