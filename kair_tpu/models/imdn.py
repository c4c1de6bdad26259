"""IMDN lightweight SR (reference: models/network_imdn.py:33-66)."""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from kair_tpu.ops.blocks import (Conv, IMDBlock, UpsampleConvTranspose,
                                 UpsamplePixelShuffle, UpsampleUpConv)

_UP = {
    "upconv": UpsampleUpConv,
    "pixelshuffle": UpsamplePixelShuffle,
    "convtranspose": UpsampleConvTranspose,
}


class IMDN(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nc: int = 64
    nb: int = 8
    upscale: int = 4
    act_mode: str = "L"
    upsample_mode: str = "pixelshuffle"
    negative_slope: float = 0.05
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv(self.nc, dtype=self.dtype, name="head")(x)
        b = h
        for i in range(self.nb):
            b = IMDBlock(self.nc, negative_slope=self.negative_slope,
                         dtype=self.dtype, name=f"body{i:02d}")(b)
        b = Conv(self.nc, dtype=self.dtype, name="body_tail")(b)
        h = h + b
        up = _UP[self.upsample_mode]
        return up(self.out_nc, self.upscale, "", dtype=self.dtype,
                  name="tail")(h, train=train)
