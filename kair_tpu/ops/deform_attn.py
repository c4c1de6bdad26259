"""Guided deformable attention — TPU-native replacement for the reference's
867-line CUDA kernel (models/op/deform_attn_cuda_kernel.cu; orchestration
deform_attn_cuda_pt110.cpp:64-120; wrapper op/deform_attn.py:53-110).

Semantics (matching the CUDA path exactly):
  for each query pixel p and head h, gather S = clip_size·kh·kw deformable
  key/value samples — per deformable channel-group g, bilinear samples of
  the KV feature maps at p + kernel_tap − pad + offset[n,g,tap] from clip
  frame n — then softmax-attend the single query over the S keys.

TPU design: the irregular bilinear gather becomes a batched
`take_along_axis` gather (vmapped over deformable groups), and the
attention is a tiny per-pixel (1×S)·(S×hd) contraction batched over every
pixel — XLA fuses the whole thing; gradients come for free (the reference
needed 500 lines of hand-written backward kernels).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from kair_tpu.ops.warp import _sample_bilinear


def deform_attention(q: jnp.ndarray, k_feat: jnp.ndarray, v_feat: jnp.ndarray,
                     offset: jnp.ndarray, kernel: Tuple[int, int] = (3, 3),
                     heads: int = 12, deformable_groups: int = 12) -> jnp.ndarray:
    """q (B,H,W,C); k_feat/v_feat (B, clip, H, W, C) already rotated so that
    clip index n is the KV frame the CUDA path pairs with this query
    (kv[(n+j)%clip], deform_attn_cuda_pt110.cpp:101-105);
    offset (B, clip, H, W, dg*K*2) with (dg, K, (y,x)) channel layout.
    Returns (B,H,W,C)."""
    b, h, w, c = q.shape
    clip = k_feat.shape[1]
    kh, kw = kernel
    K = kh * kw
    dg = deformable_groups
    cg = c // dg
    hd = c // heads
    scale = hd ** -0.5
    pad = kh // 2

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=q.dtype),
                          jnp.arange(w, dtype=q.dtype), indexing="ij")
    off = offset.reshape(b, clip, h, w, dg, K, 2)

    # one vmapped gather over (clip, K, dg) instead of a clip*K python loop
    # of per-group gathers (2*clip*K separate gather subgraphs dominated
    # the HLO and underused the TPU's gather throughput)
    ky = (jnp.arange(K) // kw - pad).astype(q.dtype)          # (K,)
    kx = (jnp.arange(K) % kw - pad).astype(q.dtype)
    fy = gy[None, None, None, :, :, None] + ky[None, None, :, None, None, None] \
        + off[..., 0].transpose(0, 1, 5, 2, 3, 4)             # (B,clip,K,H,W,dg)
    fx = gx[None, None, None, :, :, None] + kx[None, None, :, None, None, None] \
        + off[..., 1].transpose(0, 1, 5, 2, 3, 4)
    # layout: (clip, K, dg, B, H, W)
    fy = fy.transpose(1, 2, 5, 0, 3, 4)
    fx = fx.transpose(1, 2, 5, 0, 3, 4)
    kf = k_feat.reshape(b, clip, h, w, dg, cg).transpose(1, 4, 0, 2, 3, 5)
    vf = v_feat.reshape(b, clip, h, w, dg, cg).transpose(1, 4, 0, 2, 3, 5)

    def over_clip(feat_c, fy_c, fx_c):                # feat (dg,B,H,W,cg)
        def over_tap(fy_t, fx_t):                     # fy_t (dg,B,H,W)
            return jax.vmap(lambda fg, yy, xx: _sample_bilinear(
                fg, yy, xx, "zeros"))(feat_c, fy_t, fx_t)
        return jax.vmap(over_tap)(fy_c, fx_c)         # (K,dg,B,H,W,cg)

    ks = jax.vmap(over_clip)(kf, fy, fx)              # (clip,K,dg,B,H,W,cg)
    vs = jax.vmap(over_clip)(vf, fy, fx)
    # → (B,H,W,S=clip*K,C=dg*cg); S ordered clip-major then tap (matches
    # the loop order of the CUDA path)
    k_s = ks.transpose(3, 4, 5, 0, 1, 2, 6).reshape(b, h, w, clip * K, c)
    v_s = vs.transpose(3, 4, 5, 0, 1, 2, 6).reshape(b, h, w, clip * K, c)

    S = clip * K
    qh = q.reshape(b, h, w, heads, hd) * scale
    kh_ = k_s.reshape(b, h, w, S, heads, hd)
    vh_ = v_s.reshape(b, h, w, S, heads, hd)
    attn = jnp.einsum("bxynd,bxysnd->bxyns", qh, kh_,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bxyns,bxysnd->bxynd", attn, vh_,
                     preferred_element_type=q.dtype)
    return out.reshape(b, h, w, c)
