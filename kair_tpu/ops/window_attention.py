"""Windowed multi-head self-attention (the SwinIR/VRT hot loop).

Reference semantics: models/network_swinir.py:65-151 (WindowAttention with
relative position bias and shift mask) operating on windows produced by
window_partition (:33-46). TPU-native design:

* window partition/reverse are pure reshape+transpose — free under XLA
  (no data movement until fused into the next matmul's layout).
* attention runs as batched einsum over (B, nW, heads, N, N) with N = ws²
  (64 for 8×8) — small contractions, but thousands of windows batch onto
  the MXU.
* the shift mask and relative-position index are static (numpy at trace
  time) for fixed (H, W, window, shift) — recompiles only on shape change.
* `window_msa` is the swap point for the Pallas fused kernel
  (kair_tpu.ops.pallas.window_msa) — same signature, chosen by flag.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // ws) * (w // ws), ws * ws, c)


def window_reverse(xw: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B, nW, ws*ws, C) → (B, H, W, C)."""
    b, nw, n, c = xw.shape
    x = xw.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@lru_cache(maxsize=64)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static (Wh*Ww, Wh*Ww) index into the (2Wh-1)(2Ww-1) bias table
    (reference network_swinir.py:92-103)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


@lru_cache(maxsize=64)
def shift_window_labels(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N) int32 per-token region labels for shifted windows
    (reference calculate_mask regions, network_swinir.py:216-239)."""
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, h - ws), slice(h - ws, h - shift), slice(h - shift, h)):
        for wsl in (slice(0, w - ws), slice(w - ws, w - shift), slice(w - shift, w)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    mw = img_mask.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    return np.ascontiguousarray(mw.reshape(-1, ws * ws))


@lru_cache(maxsize=64)
def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static (nW, N, N) 0/-100 mask for shifted windows
    (reference calculate_mask, network_swinir.py:216-239)."""
    mw = shift_window_labels(h, w, ws, shift)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def shift_attn_mask_graph(h: int, w: int, ws: int, shift: int):
    """The same (nW, N, N) mask built IN-GRAPH from the (nW, N) labels —
    the materialized literal costs MBs of HLO per shifted block at real
    image sizes (the compile-time bottleneck of full-size SwinIR)."""
    lab = jnp.asarray(shift_window_labels(h, w, ws, shift))
    return jnp.where(lab[:, None, :] != lab[:, :, None], -100.0, 0.0)


def window_msa(xw: jnp.ndarray,
               qkv_kernel: jnp.ndarray, qkv_bias: Optional[jnp.ndarray],
               proj_kernel: jnp.ndarray, proj_bias: jnp.ndarray,
               bias_table: jnp.ndarray, rel_index: jnp.ndarray,
               num_heads: int,
               mask: Optional[jnp.ndarray] = None,
               use_pallas: bool = False) -> jnp.ndarray:
    """Fused W-MSA on windows.

    xw          (B, nW, N, C)
    qkv_kernel  (C, 3C)  qkv_bias (3C,) or None
    proj_kernel (C, C)   proj_bias (C,)
    bias_table  ((2Wh-1)(2Ww-1), nH); rel_index (N, N) int
    mask        (nW, N, N) or None
    → (B, nW, N, C)
    """
    if use_pallas:
        from kair_tpu.ops.pallas.window_msa import window_msa_pallas
        return window_msa_pallas(xw, qkv_kernel, qkv_bias, proj_kernel,
                                 proj_bias, bias_table, rel_index, num_heads,
                                 mask)

    b, nw, n, c = xw.shape
    hd = c // num_heads
    scale = hd ** -0.5
    qkv = jnp.einsum("bwnc,cd->bwnd", xw, qkv_kernel.astype(xw.dtype),
                     preferred_element_type=xw.dtype)
    if qkv_bias is not None:
        qkv = qkv + qkv_bias.astype(xw.dtype)
    qkv = qkv.reshape(b, nw, n, 3, num_heads, hd)
    q = qkv[:, :, :, 0].transpose(0, 1, 3, 2, 4) * scale   # (b,nw,nh,n,hd)
    k = qkv[:, :, :, 1].transpose(0, 1, 3, 2, 4)
    v = qkv[:, :, :, 2].transpose(0, 1, 3, 2, 4)

    attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                      preferred_element_type=jnp.float32)
    # jnp-convert the table first: numpy fancy-indexing by a traced index
    # fails under jit (rel_index may be numpy or traced)
    rel_bias = jnp.asarray(bias_table)[rel_index.reshape(-1)].reshape(
        n, n, num_heads)
    attn = attn + rel_bias.transpose(2, 0, 1)[None, None].astype(attn.dtype)
    if mask is not None:
        attn = attn + mask[None, :, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(xw.dtype)

    out = jnp.einsum("bwhnm,bwhmd->bwhnd", attn, v,
                     preferred_element_type=xw.dtype)
    out = out.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)
    out = jnp.einsum("bwnc,cd->bwnd", out, proj_kernel.astype(xw.dtype),
                     preferred_element_type=xw.dtype) + proj_bias.astype(xw.dtype)
    return out
