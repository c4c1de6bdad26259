"""FFDNet noise-map denoiser (reference: models/network_ffdnet.py:27-69).

Space-to-depth (pixel-unshuffle ×2) → conv stack on [features ⊕ σ-map] →
depth-to-space. The reference's runtime replication-pad to even sizes
(`network_ffdnet.py:54-59`) is dynamic-shape-hostile under XLA; we pad
outside jit (eval harness pads to even before calling) and additionally
handle it in `apply_padded` for convenience.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.ops.blocks import Conv, ConvBlock, pixel_shuffle, pixel_unshuffle


class FFDNet(nn.Module):
    in_nc: int = 1
    out_nc: int = 1
    nc: int = 64
    nb: int = 15
    act_mode: str = "R"
    sf: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, sigma, train: bool = False):
        """x: NHWC with H,W multiples of 2; sigma: (N,1,1,1) noise level."""
        h = pixel_unshuffle(x, self.sf)
        m = jnp.broadcast_to(sigma.astype(h.dtype),
                             (h.shape[0], h.shape[1], h.shape[2], 1))
        h = jnp.concatenate([h, m], axis=-1)
        h = ConvBlock(self.nc, mode="C" + self.act_mode[-1],
                      dtype=self.dtype, name="head")(h, train=train)
        for i in range(self.nb - 2):
            h = ConvBlock(self.nc, mode="C" + self.act_mode,
                          dtype=self.dtype, name=f"body{i:02d}")(h, train=train)
        h = Conv(self.out_nc * self.sf ** 2, dtype=self.dtype, name="tail")(h)
        return pixel_shuffle(h, self.sf)
