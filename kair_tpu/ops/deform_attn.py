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

from kair_tpu.ops.warp import _sample_bilinear, resolve_deform_impl


def deform_attention(q: jnp.ndarray, k_feat: jnp.ndarray, v_feat: jnp.ndarray,
                     offset: jnp.ndarray, kernel: Tuple[int, int] = (3, 3),
                     heads: int = 12, deformable_groups: int = 12,
                     impl: str = "gather",
                     _interpret: bool = False) -> jnp.ndarray:
    """q (B,H,W,C); k_feat/v_feat (B, clip, H, W, C) already rotated so that
    clip index n is the KV frame the CUDA path pairs with this query
    (kv[(n+j)%clip], deform_attn_cuda_pt110.cpp:101-105);
    offset (B, clip, H, W, dg*K*2) with (dg, K, (y,x)) channel layout.
    Returns (B,H,W,C).

    impl: 'auto'   — fused on TPU, gather elsewhere (resolve_deform_impl;
                     from the round-5 on-chip A/B, runs/tpu_r5/deform_*.log);
          'gather' — XLA patch gathers (cost ∝ index rows, any frame size);
          'mxu'    — Pallas 2-hot-matmul sampling (ops/pallas/bilin_mm.py,
                     cost ∝ H·W, wins at small frames where GDA runs);
          'fused'  — single Pallas pass sampling + online-softmax attention
                     (ops/pallas/gda_block.py; needs heads == groups, the
                     released-RVRT shape). Falls back loudly otherwise."""
    impl = resolve_deform_impl(impl)
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

    # gather granularity (measured on v5e, see ops/warp.py): python loop
    # over (clip, dg) with the K taps vmapped inside — many small index
    # sets beat one big vmapped gather on the TPU gather path (1.5x,
    # commit 026d939; re-confirmed round 3: merging the group dim into the
    # index rows is 1.5x SLOWER), while the HLO stays at clip*dg subgraphs
    # instead of 2*clip*K*dg. k and v share every coordinate, so they ride
    # ONE (2,2,2*cg) patch gather — TPU gather cost scales with index rows,
    # and this halves them (12.2 → 7.2 ms/clip-gather on v5e).
    ky = (jnp.arange(K) // kw - pad).astype(q.dtype)          # (K,)
    kx = (jnp.arange(K) % kw - pad).astype(q.dtype)

    if impl == "fused":
        from kair_tpu.ops.pallas.gda_block import gda_fused, gda_supported
        if gda_supported(c, heads, dg, h, w, clip, K):
            return gda_fused(q, k_feat, v_feat, offset, kernel, heads, dg,
                             256, _interpret)
        from kair_tpu.utils.logger import warn_once
        warn_once(f"gda-fused-{h}x{w}x{c}-{heads}h{dg}g",
                  f"deform_attention impl='fused' unsupported at {h}x{w} "
                  f"c={c} heads={heads} dg={dg}: using the gather path")
        impl = "gather"
    if impl == "mxu":
        from kair_tpu.ops.pallas.bilin_mm import (bilinear_sample_mm,
                                                  route_impl)
        impl = route_impl(impl, h, w, 2 * cg, "deform_attention")
    if impl == "mxu":
        kf = k_feat.reshape(b, clip, h, w, dg, cg)
        vf = v_feat.reshape(b, clip, h, w, dg, cg)
        both = jnp.concatenate([kf, vf], axis=-1)             # (b,n,h,w,g,2cg)
        slabs = both.transpose(0, 1, 4, 2, 3, 5).reshape(
            b * clip * dg, h, w, 2 * cg)
        off_t = off.transpose(0, 1, 4, 5, 2, 3, 6)            # (b,n,g,K,h,w,2)
        fy = (gy[None, None, None, None] + ky[:, None, None]
              + off_t[..., 0]).reshape(b * clip * dg, K * h * w)
        fx = (gx[None, None, None, None] + kx[:, None, None]
              + off_t[..., 1]).reshape(b * clip * dg, K * h * w)
        samp = bilinear_sample_mm(slabs, fy, fx, 256, _interpret)
        s7 = samp.reshape(b, clip, dg, K, h, w, 2 * cg)
        s7 = s7.transpose(0, 4, 5, 1, 3, 2, 6)                # (b,h,w,n,K,g,·)
        k_s = s7[..., :cg].reshape(b, h, w, clip * K, c)
        v_s = s7[..., cg:].reshape(b, h, w, clip * K, c)
        return _attend(q, k_s, v_s, heads, hd, scale, b, h, w, c, clip * K)

    k_parts = []
    v_parts = []
    for n_c in range(clip):
        kf = k_feat[:, n_c].reshape(b, h, w, dg, cg)
        vf = v_feat[:, n_c].reshape(b, h, w, dg, cg)
        kg_parts, vg_parts = [], []
        for g in range(dg):
            fy_g = gy[None, None] + ky[:, None, None, None] \
                + off[:, n_c, :, :, g, :, 0].transpose(3, 0, 1, 2)  # (K,B,H,W)
            fx_g = gx[None, None] + kx[:, None, None, None] \
                + off[:, n_c, :, :, g, :, 1].transpose(3, 0, 1, 2)
            both = jnp.concatenate([kf[:, :, :, g, :], vf[:, :, :, g, :]],
                                   axis=-1)                   # (B,H,W,2cg)
            s = jax.vmap(lambda fy, fx: _sample_bilinear(
                both, fy, fx, "zeros"))(fy_g, fx_g)           # (K,B,H,W,2cg)
            s = s.transpose(1, 2, 3, 0, 4)                    # (B,H,W,K,2cg)
            kg_parts.append(s[..., :cg])
            vg_parts.append(s[..., cg:])
        # channel order dg-major (matches k_feat reshape)
        k_parts.append(jnp.concatenate(kg_parts, axis=-1))    # (B,H,W,K,C)
        v_parts.append(jnp.concatenate(vg_parts, axis=-1))
    # S = clip*K ordered clip-major then tap (the CUDA path's loop order)
    k_s = jnp.concatenate(k_parts, axis=3)                    # (B,H,W,S,C)
    v_s = jnp.concatenate(v_parts, axis=3)
    return _attend(q, k_s, v_s, heads, hd, scale, b, h, w, c, clip * K)


def _attend(q, k_s, v_s, heads, hd, scale, b, h, w, c, S):
    """Per-pixel attention of one query over its S deformable samples
    (deform_attn_cuda_pt110.cpp:107-118)."""
    qh = q.reshape(b, h, w, heads, hd) * scale
    kh_ = k_s.reshape(b, h, w, S, heads, hd)
    vh_ = v_s.reshape(b, h, w, S, heads, hd)
    attn = jnp.einsum("bxynd,bxysnd->bxyns", qh, kh_,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bxyns,bxysnd->bxynd", attn, vh_,
                     preferred_element_type=q.dtype)
    return out.reshape(b, h, w, c)
