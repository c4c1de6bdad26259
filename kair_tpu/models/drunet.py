"""DRUNet (UNetRes) denoiser prior (reference: models/network_unet.py:21-87).

4-scale residual U-Net: head conv → (nb ResBlocks + ×2 down) ×3 → nb body
ResBlocks → (×2 up + nb ResBlocks) ×3 with additive skips → tail conv.
Downsample kernels are 2×2 stride-2 'VALID' convs; upsamples are 2×2
stride-2 transpose convs (reference defaults strideconv/convtranspose).
Inputs must be padded to a multiple of 8 outside jit (the reference pads at
runtime, commented at network_unet.py:60-63; the eval harness owns padding
here so shapes stay static).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

from flax import linen as nn

from kair_tpu.ops.blocks import (Conv, DownsampleAvgPool, DownsampleMaxPool,
                                 DownsampleStrideConv, ResBlock,
                                 UpsampleConvTranspose, UpsamplePixelShuffle,
                                 UpsampleUpConv)

_DOWN = {
    "strideconv": DownsampleStrideConv,
    "maxpool": DownsampleMaxPool,
    "avgpool": DownsampleAvgPool,
}
_UP = {
    "convtranspose": UpsampleConvTranspose,
    "pixelshuffle": UpsamplePixelShuffle,
    "upconv": UpsampleUpConv,
}


class UNetRes(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nc: Tuple[int, ...] = (64, 128, 256, 512)
    nb: int = 4
    act_mode: str = "R"
    downsample_mode: str = "strideconv"
    upsample_mode: str = "convtranspose"
    bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x0, train: bool = False):
        down = _DOWN[self.downsample_mode]
        up = _UP[self.upsample_mode]
        mode = "C" + self.act_mode + "C"

        def res_stack(h, ch, name):
            for i in range(self.nb):
                h = ResBlock(ch, mode=mode, bias=self.bias, dtype=self.dtype,
                             name=f"{name}_b{i:02d}")(h, train=train)
            return h

        x1 = Conv(self.nc[0], use_bias=self.bias, dtype=self.dtype, name="head")(x0)
        x2 = down(self.nc[1], 2, "", bias=self.bias, dtype=self.dtype, name="down1_pool")(
            res_stack(x1, self.nc[0], "down1"), train=train)
        x3 = down(self.nc[2], 2, "", bias=self.bias, dtype=self.dtype, name="down2_pool")(
            res_stack(x2, self.nc[1], "down2"), train=train)
        x4 = down(self.nc[3], 2, "", bias=self.bias, dtype=self.dtype, name="down3_pool")(
            res_stack(x3, self.nc[2], "down3"), train=train)
        x = res_stack(x4, self.nc[3], "body")
        x = res_stack(up(self.nc[2], 2, "", bias=self.bias, dtype=self.dtype, name="up3_up")(x + x4, train=train),
                      self.nc[2], "up3")
        x = res_stack(up(self.nc[1], 2, "", bias=self.bias, dtype=self.dtype, name="up2_up")(x + x3, train=train),
                      self.nc[1], "up2")
        x = res_stack(up(self.nc[0], 2, "", bias=self.bias, dtype=self.dtype, name="up1_up")(x + x2, train=train),
                      self.nc[0], "up1")
        return Conv(self.out_nc, use_bias=self.bias, dtype=self.dtype,
                    name="tail")(x + x1)
