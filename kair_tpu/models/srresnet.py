"""SRResNet-family backbones: MSRResNet0/1, SRResNet, DPSR's
MSRResNet_prior, SRMD.

References:
  MSRResNet0  network_msrresnet.py:38-83 (head → nb ResBlocks+conv shortcut
              → upsampler(s) → HR convs, final conv bias=False)
  MSRResNet1  network_msrresnet.py:89-135 (bilinear-residual variant)
  MSRResNet_prior (DPSR) network_dpsr.py:42-76 (in_nc=4: img+σ channel; nc 96)
  SRMD        network_srmd.py:26-77 (input = img ⊕ 15-dim PCA kernel ⊕ σ,
              plain conv stack, single ×scale pixelshuffle tail)

All share one flax implementation parameterised like the reference.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.ops.blocks import (Conv, ConvBlock, ResBlock, UpsampleConvTranspose,
                                 UpsamplePixelShuffle, UpsampleUpConv,
                                 pixel_shuffle, resize_bilinear, upsample_nearest)

_UP = {
    "upconv": UpsampleUpConv,
    "pixelshuffle": UpsamplePixelShuffle,
    "convtranspose": UpsampleConvTranspose,
}


class MSRResNet0(nn.Module):
    """reference network_msrresnet.py:38-83; also DPSR MSRResNet_prior
    (network_dpsr.py:42) with in_nc=4, nc=96."""
    in_nc: int = 3
    out_nc: int = 3
    nc: int = 64
    nb: int = 16
    upscale: int = 4
    act_mode: str = "R"
    upsample_mode: str = "upconv"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        up = _UP[self.upsample_mode]
        h = Conv(self.nc, dtype=self.dtype, name="head")(x)
        b = h
        for i in range(self.nb):
            b = ResBlock(self.nc, mode="C" + self.act_mode + "C",
                         dtype=self.dtype, name=f"body{i:02d}")(b, train=train)
        b = Conv(self.nc, dtype=self.dtype, name="body_tail")(b)
        h = h + b
        if self.upscale == 3:
            h = up(self.nc, 3, self.act_mode, dtype=self.dtype, name="up0")(h, train=train)
        else:
            for i in range(int(math.log2(self.upscale))):
                h = up(self.nc, 2, self.act_mode, dtype=self.dtype,
                       name=f"up{i}")(h, train=train)
        h = ConvBlock(self.nc, mode="C" + self.act_mode,
                      dtype=self.dtype, name="hr")(h, train=train)
        return ConvBlock(self.out_nc, mode="C", bias=False,
                         dtype=self.dtype, name="tail")(h, train=train)


class MSRResNet1(nn.Module):
    """bilinear-base residual variant (reference network_msrresnet.py:89-135)."""
    in_nc: int = 3
    out_nc: int = 3
    nc: int = 64
    nb: int = 16
    upscale: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = lambda v: nn.leaky_relu(v, 0.1)
        fea = act(Conv(self.nc, dtype=self.dtype, name="conv_first")(x))
        out = fea
        for i in range(self.nb):
            idn = out
            h = nn.relu(Conv(self.nc, dtype=self.dtype, name=f"trunk{i:02d}_conv1")(out))
            out = idn + Conv(self.nc, dtype=self.dtype, name=f"trunk{i:02d}_conv2")(h)
        if self.upscale == 4:
            out = act(pixel_shuffle(Conv(self.nc * 4, dtype=self.dtype, name="upconv1")(out), 2))
            out = act(pixel_shuffle(Conv(self.nc * 4, dtype=self.dtype, name="upconv2")(out), 2))
        else:
            r = self.upscale
            out = act(pixel_shuffle(Conv(self.nc * r * r, dtype=self.dtype, name="upconv1")(out), r))
        out = Conv(self.out_nc, dtype=self.dtype, name="conv_last")(
            act(Conv(self.nc, dtype=self.dtype, name="HRconv")(out)))
        base = resize_bilinear(x, (x.shape[1] * self.upscale, x.shape[2] * self.upscale))
        return out + base


class SRMD(nn.Module):
    """SRMD: degradation-map-conditioned SR (reference network_srmd.py:26-77).
    Input x is NHWC concat(img, 15-dim PCA kernel map, σ map) = in_nc ch."""
    in_nc: int = 19
    out_nc: int = 3
    nc: int = 128
    nb: int = 12
    upscale: int = 4
    act_mode: str = "R"
    upsample_mode: str = "pixelshuffle"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBlock(self.nc, mode="C" + self.act_mode[-1],
                      dtype=self.dtype, name="head")(x, train=train)
        for i in range(self.nb - 2):
            h = ConvBlock(self.nc, mode="C" + self.act_mode,
                          dtype=self.dtype, name=f"body{i:02d}")(h, train=train)
        up = _UP[self.upsample_mode]
        return up(self.out_nc, self.upscale, "", dtype=self.dtype,
                  name="tail")(h, train=train)
