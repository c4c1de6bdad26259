"""RRDB / ESRGAN generators.

References:
  RRDB (old KAIR style)  network_rrdb.py:14-54  — head → nb RRDB + conv
      shortcut → upsampler(s) → HR convs
  RRDBNet (ESRGAN/BSRGAN style) network_rrdbnet.py:74-104 — nearest-upsample
      ×2(,×2) + convs
  RRDBNet_noUp (fork, SPECT) network_rrdbnet.py:106-125 — no upsampling head
"""

from __future__ import annotations

import math
from typing import Any, Optional

from flax import linen as nn

from kair_tpu.ops.blocks import (Conv, ConvBlock, RRDB as RRDBBlock,
                                 UpsampleConvTranspose, UpsamplePixelShuffle,
                                 UpsampleUpConv, upsample_nearest)

_UP = {
    "upconv": UpsampleUpConv,
    "pixelshuffle": UpsamplePixelShuffle,
    "convtranspose": UpsampleConvTranspose,
}


class RRDB(nn.Module):
    """old-style ESRGAN generator (reference network_rrdb.py:14-54)."""
    in_nc: int = 3
    out_nc: int = 3
    nc: int = 64
    nb: int = 23
    gc: int = 32
    upscale: int = 4
    act_mode: str = "L"
    upsample_mode: str = "upconv"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv(self.nc, dtype=self.dtype, name="head")(x)
        b = h
        for i in range(self.nb):
            b = RRDBBlock(self.nc, self.gc, dtype=self.dtype, name=f"body{i:02d}")(b)
        b = Conv(self.nc, dtype=self.dtype, name="body_tail")(b)
        h = h + b
        up = _UP[self.upsample_mode]
        if self.upscale == 3:
            h = up(self.nc, 3, self.act_mode, dtype=self.dtype, name="up0")(h, train=train)
        else:
            for i in range(int(math.log2(self.upscale))):
                h = up(self.nc, 2, self.act_mode, dtype=self.dtype,
                       name=f"up{i}")(h, train=train)
        h = ConvBlock(self.nc, mode="C" + self.act_mode, dtype=self.dtype,
                      name="hr")(h, train=train)
        return ConvBlock(self.out_nc, mode="C", dtype=self.dtype,
                         name="tail")(h, train=train)


class RRDBNet(nn.Module):
    """ESRGAN/BSRGAN-style generator (reference network_rrdbnet.py:74-104)."""
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    sf: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = lambda v: nn.leaky_relu(v, 0.2)
        fea = Conv(self.nf, dtype=self.dtype, name="conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDBBlock(self.nf, self.gc, dtype=self.dtype,
                              name=f"rrdb{i:02d}")(trunk)
        fea = fea + Conv(self.nf, dtype=self.dtype, name="trunk_conv")(trunk)
        fea = act(Conv(self.nf, dtype=self.dtype, name="upconv1")(upsample_nearest(fea, 2)))
        if self.sf == 4:
            fea = act(Conv(self.nf, dtype=self.dtype, name="upconv2")(upsample_nearest(fea, 2)))
        return Conv(self.out_nc, dtype=self.dtype, name="conv_last")(
            act(Conv(self.nf, dtype=self.dtype, name="HRconv")(fea)))


class RRDBNetNoUp(nn.Module):
    """fork's SPECT variant without upsampling (reference network_rrdbnet.py:106-125)."""
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = lambda v: nn.leaky_relu(v, 0.2)
        fea = Conv(self.nf, dtype=self.dtype, name="conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDBBlock(self.nf, self.gc, dtype=self.dtype,
                              name=f"rrdb{i:02d}")(trunk)
        fea = fea + Conv(self.nf, dtype=self.dtype, name="trunk_conv")(trunk)
        return Conv(self.out_nc, dtype=self.dtype, name="conv_last")(
            act(Conv(self.nf, dtype=self.dtype, name="HRconv")(fea)))
