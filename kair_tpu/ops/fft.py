"""FFT utilities for deep-unfolding restoration (USRNet's data term).

NHWC counterparts of the reference helpers (network_usrnet_v1.py:32-98,
modern-complex form of the legacy real-pair helpers in
network_usrnet.py:29-160): PSF→OTF, sf-fold zero-stuffing up/downsampling,
and distinct-block splitting. XLA lowers jnp.fft to its native FFT — no
custom kernel needed (SURVEY.md §7.4).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def p2o(psf: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """PSF (N,h,w,C) → OTF (N,H,W,C) complex64: zero-pad to `shape`, roll so
    the kernel center lands at the origin, FFT over the spatial axes
    (reference network_usrnet_v1.py:47-67)."""
    n, kh, kw, c = psf.shape
    otf = jnp.zeros((n, shape[0], shape[1], c), psf.dtype)
    otf = otf.at[:, :kh, :kw, :].set(psf)
    otf = jnp.roll(otf, (-(kh // 2), -(kw // 2)), axis=(1, 2))
    return jnp.fft.fftn(otf, axes=(1, 2))


def upsample_zero(x: jnp.ndarray, sf: int) -> jnp.ndarray:
    """S^T y: zero-stuffed sf-fold upsampling, sample at (0,0) of each block
    (reference network_usrnet_v1.py:70-81)."""
    n, h, w, c = x.shape
    z = jnp.zeros((n, h * sf, w * sf, c), x.dtype)
    return z.at[:, ::sf, ::sf, :].set(x)


def downsample_keep(x: jnp.ndarray, sf: int) -> jnp.ndarray:
    """S: keep the upper-left pixel of each sf×sf block
    (reference network_usrnet_v1.py:84-92)."""
    return x[:, ::sf, ::sf, :]


def splits_mean(a: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Mean over the sf×sf distinct-block aliases of a (N,H,W,C) spectrum —
    fused form of `splits(...).mean(-1)` (reference
    network_usrnet_v1.py:32-44 + DataNet :187-188)."""
    n, h, w, c = a.shape
    b = a.reshape(n, sf, h // sf, sf, w // sf, c)
    return b.mean(axis=(1, 3))
