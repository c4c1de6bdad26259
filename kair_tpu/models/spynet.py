"""SpyNet optical flow (reference: network_vrt.py:342-457).

6-level coarse-to-fine pyramid: 2× avg-pool pyramid, per-level
[ref ⊕ warp(supp, 2·up(flow)) ⊕ up(flow)] → 5-conv BasicModule → residual
flow. Inputs are resized to /32 multiples; returned flows are rescaled to
the requested level sizes (reference :429-455).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kair_tpu.ops.blocks import Conv, resize_bilinear
from kair_tpu.ops.warp import flow_warp


def _resize_bilinear_align(x, size):
    """bilinear resize with align_corners=True (torch F.interpolate),
    needed for the ×2 flow upsampling (reference :408)."""
    n, h, w, c = x.shape
    ho, wo = size
    # align_corners=True: out[i] samples in at i*(h-1)/(ho-1)
    ys = jnp.linspace(0.0, h - 1, ho)
    xs = jnp.linspace(0.0, w - 1, wo)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[None, :, None, None].astype(x.dtype)
    wx = (xs - x0)[None, None, :, None].astype(x.dtype)
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class BasicModule(nn.Module):
    """5× 7×7 convs 8→32→64→32→16→2 (reference network_vrt.py:342-357)."""
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        for i, (c, act) in enumerate([(32, True), (64, True), (32, True),
                                      (16, True), (2, False)]):
            x = Conv(c, 7, 1, 3, dtype=self.dtype, name=f"conv{i}")(x)
            if act:
                x = nn.relu(x)
        return x


class SpyNet(nn.Module):
    """reference network_vrt.py:359-457. Input NHWC RGB [0,1] pairs."""
    return_levels: Tuple[int, ...] = (5,)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, ref, supp):
        n, h, w, _ = ref.shape
        w_floor = math.floor(math.ceil(w / 32.0) * 32.0)
        h_floor = math.floor(math.ceil(h / 32.0) * 32.0)
        ref = resize_bilinear(ref, (h_floor, w_floor))
        supp = resize_bilinear(supp, (h_floor, w_floor))

        mean = jnp.asarray([0.485, 0.456, 0.406], ref.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], ref.dtype)
        refs = [(ref - mean) / std]
        supps = [(supp - mean) / std]
        for _ in range(5):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), (2, 2)))
            supps.insert(0, nn.avg_pool(supps[0], (2, 2), (2, 2)))

        modules = [BasicModule(dtype=self.dtype, name=f"basic{i}")
                   for i in range(6)]

        flow = jnp.zeros((n, refs[0].shape[1] // 2, refs[0].shape[2] // 2, 2),
                         ref.dtype)
        flow_list: List[Tuple[int, jnp.ndarray]] = []
        for level in range(6):
            up = _resize_bilinear_align(
                flow, (flow.shape[1] * 2, flow.shape[2] * 2)) * 2.0
            # pad one row/col if pyramid size is odd (reference :410-413)
            if up.shape[1] != refs[level].shape[1]:
                up = jnp.concatenate([up, up[:, -1:]], axis=1)
            if up.shape[2] != refs[level].shape[2]:
                up = jnp.concatenate([up, up[:, :, -1:]], axis=2)
            warped = flow_warp(supps[level], up, "bilinear", "border")
            flow = modules[level](
                jnp.concatenate([refs[level], warped, up], axis=-1)) + up

            if level in self.return_levels:
                scale = 2 ** (5 - level)
                out = resize_bilinear(flow, (h // scale, w // scale))
                out = out * jnp.asarray(
                    [float(w // scale) / float(w_floor // scale),
                     float(h // scale) / float(h_floor // scale)], out.dtype)
                flow_list.insert(0, (level, out))

        flows = [f for _, f in flow_list]
        return flows[0] if len(flows) == 1 else flows

