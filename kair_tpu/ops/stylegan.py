"""StyleGAN2 resampling ops — XLA-native replacements for the reference's
CUDA extensions (SURVEY.md §2.3):

  upfirdn2d          models/op/upfirdn2d.cpp + upfirdn2d_kernel.cu (293 LoC)
                     → one lax.conv_general_dilated: zero-stuffing is
                     lhs_dilation, FIR filtering is a depthwise conv,
                     downsampling is the window stride. XLA fuses the lot.
  fused_leaky_relu   models/op/fused_bias_act.cpp + kernel (118 LoC)
                     → plain jnp expression (bias-add + leaky-relu + scale);
                     XLA fuses it into the surrounding convs for free.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_kernel(k) -> jnp.ndarray:
    """1-D taps → normalised 2-D FIR kernel (reference
    network_faceenhancer.py:31-39)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / k.sum()


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)) -> jnp.ndarray:
    """NHWC upsample→pad→FIR→downsample (semantics of the reference CUDA op,
    op/upfirdn2d.py:9-188). pad may be negative (crop)."""
    c = x.shape[-1]
    kh, kw = kernel.shape
    # FIR filtering after zero-stuffing == correlation with the flipped kernel
    w = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    w = jnp.broadcast_to(w[:, :, None, None], (kh, kw, 1, c))
    # torch's zero-stuffing yields length h*up (trailing zeros after the last
    # sample); lhs_dilation yields (h-1)*up+1, so add up-1 to the tail pad
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(down, down),
        padding=((pad[0], pad[1] + up - 1), (pad[0], pad[1] + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def fused_leaky_relu(x: jnp.ndarray, bias=None, negative_slope: float = 0.2,
                     scale: float = 2 ** 0.5) -> jnp.ndarray:
    """bias-add + leaky-relu + √2 gain (reference op/fused_act.py:20-88)."""
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jax.nn.leaky_relu(x, negative_slope) * scale


def upsample2(x, kernel, factor: int = 2):
    """reference Upsample (network_faceenhancer.py:42-60)."""
    k = make_kernel(kernel) * (factor ** 2)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1))


def downsample2(x, kernel, factor: int = 2):
    """reference Downsample (network_faceenhancer.py:63-81)."""
    k = make_kernel(kernel)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, k, up=1, down=factor, pad=(pad0, pad1))


def blur(x, kernel, pad: Tuple[int, int], upsample_factor: int = 1):
    """reference Blur (network_faceenhancer.py:84-100)."""
    k = make_kernel(kernel)
    if upsample_factor > 1:
        k = k * (upsample_factor ** 2)
    return upfirdn2d(x, k, pad=pad)
