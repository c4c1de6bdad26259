"""USRNet — deep unfolding network for non-blind SR/deblur
(reference: models/network_usrnet_v1.py, the torch>=1.8 complex form of
network_usrnet.py:309-344).

Structure: n_iter × [closed-form FFT data step D (parameter-free) →
learned prior P (bias-free ResUNet)] with per-iteration hyper-params
(α_i, β_i) from HyPaNet. The unfolding loop is unrolled at trace time
(n_iter=8 static) — each iteration's FFTs and convs fuse independently
under XLA; the data step is pure jnp.fft (XLA-native FFT on TPU).

Inputs (NHWC): x (N,h,w,C) LR image, k (N,kh,kw,1) blur PSF, sf scalar int
(static), sigma (N,1,1,1) noise level.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.models.drunet import UNetRes
from kair_tpu.ops.blocks import Conv, upsample_nearest
from kair_tpu.ops.fft import p2o, splits_mean, upsample_zero


def data_step(x, FB, FBC, F2B, FBFy, alpha, sf: int):
    """Closed-form Wiener-like data-term solution in the Fourier domain
    (reference DataNet, network_usrnet_v1.py:179-194)."""
    alpha_c = alpha.astype(jnp.complex64)
    FR = FBFy + jnp.fft.fftn(alpha * x, axes=(1, 2))
    x1 = FB * FR
    FBR = splits_mean(x1, sf)
    invW = splits_mean(F2B.astype(jnp.complex64), sf)
    invWBR = FBR / (invW + alpha_c)
    FCBinvWBR = FBC * jnp.tile(invWBR, (1, sf, sf, 1))
    FX = (FR - FCBinvWBR) / alpha_c
    return jnp.real(jnp.fft.ifftn(FX, axes=(1, 2)))


class HyPaNet(nn.Module):
    """(σ, sf) → 2·n_iter positive hyper-params via a 1×1-conv MLP
    (reference network_usrnet_v1.py:204-218)."""
    in_nc: int = 2
    out_nc: int = 16
    channel: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.channel, 1, padding=0, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(Conv(self.channel, 1, padding=0, dtype=self.dtype, name="fc2")(x))
        x = jax.nn.softplus(Conv(self.out_nc, 1, padding=0, dtype=self.dtype, name="fc3")(x))
        return x + 1e-6


class USRNet(nn.Module):
    """reference network_usrnet_v1.py:226-280."""
    n_iter: int = 8
    h_nc: int = 64
    in_nc: int = 4
    out_nc: int = 3
    nc: Tuple[int, ...] = (64, 128, 256, 512)
    nb: int = 2
    act_mode: str = "R"
    downsample_mode: str = "strideconv"
    upsample_mode: str = "convtranspose"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, k, sf, sigma, train: bool = False):
        sf = int(sf)  # static under jit
        n, h, w, c = x.shape

        FB = p2o(k.astype(jnp.float32), (h * sf, w * sf))          # (N,H,W,1)
        FBC = jnp.conj(FB)
        F2B = jnp.abs(FB) ** 2
        STy = upsample_zero(x.astype(jnp.float32), sf)
        FBFy = FBC * jnp.fft.fftn(STy, axes=(1, 2))
        x = upsample_nearest(x, sf)

        sf_map = jnp.full_like(sigma, float(sf))
        ab = HyPaNet(2, self.n_iter * 2, self.h_nc, dtype=self.dtype,
                     name="h")(jnp.concatenate([sigma, sf_map], axis=-1))

        # bias-free ResUNet prior (reference ResUNet, :107-166 — structure of
        # UNetRes with bias=False)
        prior = UNetRes(self.in_nc, self.out_nc, self.nc, self.nb,
                        self.act_mode, self.downsample_mode,
                        self.upsample_mode, bias=False, dtype=self.dtype,
                        name="p")

        for i in range(self.n_iter):
            alpha = ab[:, :, :, i:i + 1]
            beta = ab[:, :, :, self.n_iter + i:self.n_iter + i + 1]
            x = data_step(x.astype(jnp.float32), FB, FBC, F2B, FBFy, alpha, sf)
            beta_map = jnp.broadcast_to(beta, (n, x.shape[1], x.shape[2], 1))
            x = prior(jnp.concatenate([x.astype(self.dtype or x.dtype),
                                       beta_map.astype(self.dtype or x.dtype)],
                                      axis=-1), train=train)
        return x
