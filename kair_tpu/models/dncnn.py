"""DnCNN / IRCNN / FDnCNN denoisers (reference: models/network_dncnn.py).

Plain conv stacks; the entire network is one XLA fusion chain on TPU —
no custom kernels needed. Residual formulation (`return x - n`,
network_dncnn.py:69-71) is preserved for checkpoint parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.ops.blocks import Conv, ConvBlock


class DnCNN(nn.Module):
    """DnCNN (reference: network_dncnn.py:40-71).

    act_mode 'R' = released-checkpoint form (BN merged); 'BR' = training
    form with batch norm.
    """
    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64
    nb: int = 17
    act_mode: str = "BR"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert "R" in self.act_mode or "L" in self.act_mode
        h = ConvBlock(self.nc, mode="C" + self.act_mode[-1],
                      dtype=self.dtype, name="head")(x, train=train)
        for i in range(self.nb - 2):
            h = ConvBlock(self.nc, mode="C" + self.act_mode,
                          dtype=self.dtype, name=f"body{i:02d}")(h, train=train)
        n = Conv(self.out_nc, dtype=self.dtype, name="tail")(h)
        return x - n


class IRCNN(nn.Module):
    """IRCNN denoiser: 7 dilated convs (reference: network_dncnn.py:77-116).

    Dilations 1,2,3,4,3,2,1 with matching padding keep the output the same
    spatial size; dilated convs lower cleanly to XLA's rhs_dilation.
    """
    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dils = [1, 2, 3, 4, 3, 2, 1]
        h = x
        for i, d in enumerate(dils):
            out = self.out_nc if i == len(dils) - 1 else self.nc
            h = Conv(out, 3, padding=d, dilation=d, dtype=self.dtype,
                     name=f"conv{i}")(h)
            if i < len(dils) - 1:
                h = nn.relu(h)
        return x - h


class FDnCNN(nn.Module):
    """FDnCNN: DnCNN + noise-level-map input channel, no residual/BN
    (reference: network_dncnn.py:128-149). Input is concat(L, sigma_map)."""
    in_nc: int = 2
    out_nc: int = 1
    nc: int = 64
    nb: int = 20
    act_mode: str = "R"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBlock(self.nc, mode="C" + self.act_mode[-1],
                      dtype=self.dtype, name="head")(x, train=train)
        for i in range(self.nb - 2):
            h = ConvBlock(self.nc, mode="C" + self.act_mode,
                          dtype=self.dtype, name=f"body{i:02d}")(h, train=train)
        return Conv(self.out_nc, dtype=self.dtype, name="tail")(h)
