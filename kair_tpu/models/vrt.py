"""VRT — Video Restoration Transformer (reference: models/network_vrt.py:1231-1620).

Layout: (B, D, H, W, C) "NDHWC" end-to-end. Every Conv3d in the reference
has kernel (1,3,3) (per-frame 2-D convs), so frames fold into the batch for
all convolutions; only the TMSA attention mixes frames through 3-D windows.

Components:
  WindowAttention3D  joint self-attention (3-D rel-pos bias) + mutual
                     attention between the two frame halves of a (2,h,w)
                     window with sine position encoding
                     (network_vrt.py:588-727)
  TMSA / TMSAG       (shifted) 3-D-window transformer blocks with GEGLU MLP
                     (:728-948)
  RTMSA              residual self-attention-only group, stage 8 (:952-995)
  Stage              reshape(down/up) + TMSAG(mutual, (2,h,w) windows) +
                     TMSAG(self) + flow-guided DCN parallel warping +
                     GEGLU fusion (:998-1105)
  VRT                SpyNet flows, nearest4 image pre-warping, 7-stage
                     U-shape + RTMSA tail, PixelShuffle reconstruction
                     (:1231-1620)

Deformable alignment runs on kair_tpu.ops.warp.modulated_deform_conv
(gather+einsum; the reference needs torchvision's CUDA kernel).
"""

from __future__ import annotations

import functools
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from kair_tpu.models.spynet import SpyNet
from kair_tpu.ops.blocks import Conv, pixel_shuffle, resize_bilinear
from kair_tpu.ops.warp import flow_warp, modulated_deform_conv

_gelu = lambda x: jax.nn.gelu(x, approximate=False)


# ----------------------------------------------------------------------------
# static helpers
# ----------------------------------------------------------------------------

def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window/shift to the input extent (reference :479-494)."""
    ws = list(window_size)
    ss = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            ws[i] = x_size[i]
            if ss is not None:
                ss[i] = 0
    return (tuple(ws), tuple(ss)) if shift_size is not None else tuple(ws)


@functools.lru_cache(maxsize=64)
def compute_mask_3d(D, H, W, window_size, shift_size) -> np.ndarray:
    """(nW, N, N) 0/-100 mask for shifted 3-D windows (reference :497-514)."""
    img_mask = np.zeros((D, H, W), np.int32)
    cnt = 0
    for d in (slice(-window_size[0]), slice(-window_size[0], -shift_size[0] or None),
              slice(-shift_size[0] or None, None)):
        for h in (slice(-window_size[1]), slice(-window_size[1], -shift_size[1] or None),
                  slice(-shift_size[1] or None, None)):
            for w in (slice(-window_size[2]), slice(-window_size[2], -shift_size[2] or None),
                      slice(-shift_size[2] or None, None)):
                img_mask[d, h, w] = cnt
                cnt += 1
    wd, wh, ww = window_size
    m = img_mask.reshape(D // wd, wd, H // wh, wh, W // ww, ww)
    m = m.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    attn = m[:, None, :] - m[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=64)
def compute_mask_labels_3d(D, H, W, window_size, shift_size):
    """(labels (8, N) int32, window index (nW,)) — the factored form of
    compute_mask_3d: per-token REGION LABELS for the 8 boundary-corner
    patterns; the (N, N) mask is `where(label_i != label_j, -100, 0)`
    computed in-graph. Keeps the trace-time constant at kilobytes (the
    (8, N, N) f32 pattern stack alone was ~95 MB of VRT's HLO)."""
    img_mask = np.zeros((D, H, W), np.int32)
    cnt = 0
    for d in (slice(-window_size[0]), slice(-window_size[0], -shift_size[0] or None),
              slice(-shift_size[0] or None, None)):
        for h in (slice(-window_size[1]), slice(-window_size[1], -shift_size[1] or None),
                  slice(-shift_size[1] or None, None)):
            for w in (slice(-window_size[2]), slice(-window_size[2], -shift_size[2] or None),
                      slice(-shift_size[2] or None, None)):
                img_mask[d, h, w] = cnt
                cnt += 1
    wd, wh, ww = window_size
    nd, nh, nw = D // wd, H // wh, W // ww
    m = img_mask.reshape(nd, wd, nh, wh, nw, ww)
    m = m.transpose(0, 2, 4, 1, 3, 5).reshape(nd, nh, nw, wd * wh * ww)
    labels = np.zeros((8, wd * wh * ww), np.int32)
    for ild in (0, 1):
        for ilh in (0, 1):
            for ilw in (0, 1):
                labels[4 * ild + 2 * ilh + ilw] = m[
                    (nd - 1) if ild else 0,
                    (nh - 1) if ilh else 0,
                    (nw - 1) if ilw else 0]
    di = (np.arange(nd) == nd - 1).astype(np.int32) * 4
    hi = (np.arange(nh) == nh - 1).astype(np.int32) * 2
    wi = (np.arange(nw) == nw - 1).astype(np.int32)
    idx = (di[:, None, None] + hi[None, :, None]
           + wi[None, None, :]).reshape(-1)
    assert np.array_equal(labels[idx], m.reshape(-1, m.shape[-1])), \
        "mask label factorization mismatch"
    return labels, idx


@functools.lru_cache(maxsize=64)
def rel_position_coords_3d(wd, wh, ww) -> np.ndarray:
    """(3, N) token coordinates — the tiny constant from which the (N, N)
    relative-position index is computed IN-GRAPH (the materialized index
    was ~26 MB of VRT's HLO as an inline literal)."""
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))
    return coords.reshape(3, -1).astype(np.int32)


def rel_position_index_3d_graph(wd, wh, ww, n):
    """In-graph (n, n) index into the 3-D bias table."""
    c = jnp.asarray(rel_position_coords_3d(wd, wh, ww)[:, :n])
    rel = c[:, :, None] - c[:, None, :]
    return ((rel[0] + wd - 1) * (2 * wh - 1) * (2 * ww - 1)
            + (rel[1] + wh - 1) * (2 * ww - 1)
            + (rel[2] + ww - 1))


@functools.lru_cache(maxsize=64)
def rel_position_index_3d(wd, wh, ww) -> np.ndarray:
    """(N, N) index into the (2wd-1)(2wh-1)(2ww-1) bias table
    (reference get_position_index, :688-706)."""
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))
    flat = coords.reshape(3, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= (2 * ww - 1)
    return rel.sum(-1)


@functools.lru_cache(maxsize=16)
def sine_position_encoding(h, w, num_pos_feats, temperature=10000,
                           normalize=True) -> np.ndarray:
    """(h*w, 2*num_pos_feats) DETR-style sine encoding
    (reference get_sine_position_encoding, :708-727)."""
    scale = 2 * math.pi
    y_embed = np.cumsum(np.ones((h, w)), axis=0)
    x_embed = np.cumsum(np.ones((h, w)), axis=1)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2)
    return pos.reshape(h * w, -1).astype(np.float32)


def window_partition_3d(x, ws):
    """(B,D,H,W,C) → (B, nW, N, C) with the reference window order
    (network_vrt.py:443-457)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // ws[0], ws[0], h // ws[1], ws[1], w // ws[2], ws[2], c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    nw = (d // ws[0]) * (h // ws[1]) * (w // ws[2])
    return x.reshape(b, nw, ws[0] * ws[1] * ws[2], c)


def window_reverse_3d(xw, ws, d, h, w):
    b = xw.shape[0]
    x = xw.reshape(b, d // ws[0], h // ws[1], w // ws[2], ws[0], ws[1], ws[2], -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


# ----------------------------------------------------------------------------
# attention / blocks
# ----------------------------------------------------------------------------

def _mha(q, k, v, bias, mask, dtype):
    """q,k,v (B,nW,nh,N,hd); bias (nh,N,N) or None; mask (nW,N,N) or None."""
    attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                      preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias[None, None].astype(attn.dtype)
    if mask is not None:
        attn = attn + mask[None, :, None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(dtype)
    return jnp.einsum("bwhnm,bwhmd->bwhnd", attn, v,
                      preferred_element_type=dtype)


class WindowAttention3D(nn.Module):
    """Joint self + mutual attention (reference :588-686)."""
    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    mut_attn: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xw, mask=None):
        b, nw, n, c = xw.shape
        nh = self.num_heads
        hd = c // nh
        scale = hd ** -0.5
        ws = self.window_size
        dtype = xw.dtype

        def qkv_proj(inp, name):
            kern = self.param(f"{name}_kernel", nn.initializers.normal(0.02),
                              (c, 3 * c))
            y = jnp.einsum("bwnc,cd->bwnd", inp, kern.astype(dtype))
            if self.qkv_bias:
                bias = self.param(f"{name}_bias", nn.initializers.zeros, (3 * c,))
                y = y + bias.astype(dtype)
            y = y.reshape(b, nw, n, 3, nh, hd)
            q = y[:, :, :, 0].transpose(0, 1, 3, 2, 4)
            k = y[:, :, :, 1].transpose(0, 1, 3, 2, 4)
            v = y[:, :, :, 2].transpose(0, 1, 3, 2, 4)
            return q, k, v

        # self attention with 3-D relative position bias
        bias_table = self.param("rel_bias_table", nn.initializers.normal(0.02),
                                ((2 * ws[0] - 1) * (2 * ws[1] - 1) * (2 * ws[2] - 1),
                                 nh))
        # index computed IN-GRAPH from (3, N) coords: a materialized
        # (N, N) index literal costs ~0.6 MB of HLO per block
        rel_idx = rel_position_index_3d_graph(*ws, n)
        rel_bias = jnp.asarray(bias_table)[rel_idx.reshape(-1)]
        rel_bias = rel_bias.reshape(n, n, nh).transpose(2, 0, 1)

        q, k, v = qkv_proj(xw, "qkv_self")
        out_self = _mha(q * scale, k, v, rel_bias,
                        mask[:, :n, :n] if mask is not None else None, dtype)
        out_self = out_self.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)

        if self.mut_attn:
            # sine positional encoding over the (h, w) slice, repeated for
            # the 2 frames (reference :648)
            pos = jnp.asarray(sine_position_encoding(ws[1], ws[2], c // 2))
            pos2 = jnp.concatenate([pos, pos], axis=0).astype(dtype)  # (N, C)
            q, k, v = qkv_proj(xw + pos2[None, None], "qkv_mut")
            half = n // 2
            q1, q2 = q[:, :, :, :half], q[:, :, :, half:]
            k1, k2 = k[:, :, :, :half], k[:, :, :, half:]
            v1, v2 = v[:, :, :, :half], v[:, :, :, half:]
            hmask = mask[:, :half, :half] if mask is not None else None
            x1_aligned = _mha(q2 * scale, k1, v1, None, hmask, dtype)
            x2_aligned = _mha(q1 * scale, k2, v2, None, hmask, dtype)
            mut = jnp.concatenate([x1_aligned, x2_aligned], axis=3)
            mut = mut.transpose(0, 1, 3, 2, 4).reshape(b, nw, n, c)
            out = jnp.concatenate([mut, out_self], axis=-1)
            proj_in = 2 * c
        else:
            out = out_self
            proj_in = c

        kern = self.param("proj_kernel", nn.initializers.normal(0.02),
                          (proj_in, c))
        pbias = self.param("proj_bias", nn.initializers.zeros, (c,))
        return jnp.einsum("bwnd,dc->bwnc", out, kern.astype(dtype)) + pbias.astype(dtype)


class GEGLU(nn.Module):
    """Gated-GELU MLP (reference Mlp_GEGLU, :560-586)."""
    hidden: int
    out: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(self.hidden, dtype=self.dtype, name="fc11")(x)
        g = nn.Dense(self.hidden, dtype=self.dtype, name="fc12")(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(_gelu(a) * g)


class TMSA(nn.Module):
    """One (shifted) 3-D-window attention block (reference :728-850).
    geglu=False gives RVRT's STL (plain fc1-GELU-fc2 MLP,
    network_rvrt.py:337-358,443-559)."""
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (6, 8, 8)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mut_attn: bool = True
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    geglu: bool = True
    fuse_block: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        ws, ss = get_window_size((d, h, w), self.window_size, self.shift_size)

        if (self.fuse_block and self.mut_attn and self.geglu
                and tuple(ws) == (2, 8, 8) and d % 2 == 0
                and h % 8 == 0 and w % 8 == 0):
            return self._fused(x, ws, ss)
        if (self.fuse_block and not self.mut_attn and self.geglu
                and tuple(ws[1:]) == (8, 8) and d % ws[0] == 0
                and h % 8 == 0 and w % 8 == 0):
            # VRT's second (self-only) TMSAG of every stage + the RTMSA
            # tail (reference :855-995, :1318-1366): (wd,8,8) windows —
            # wd=6 (384 tokens), wd=1 for the per-frame indep_reconsts
            # blocks (reference :1358), wd=2 for 2-frame clips
            return self._fused_self6(x, ws, ss)
        if self.fuse_block and not self.mut_attn and not self.geglu:
            # RVRT STL blocks (network_rvrt.py:337-358): self-only attention
            # + plain MLP == the SwinIR block on 3-D windows
            if (tuple(ws) == (2, 8, 8) and d % 2 == 0 and h % 8 == 0
                    and w % 8 == 0):
                return self._fused_stl2(x, ws, ss)
            from kair_tpu.ops.pallas.swin_block import strip_w_max
            if (ws[0] == 1 and tuple(ws[1:]) == (8, 8) and h % 8 == 0
                    and w % 16 == 0 and w <= strip_w_max(c)):
                # same scoped-VMEM width cap as SwinBlock: one strip
                # program holds 8·W tokens
                return self._fused_stl1(x, ws, ss)
        if self.fuse_block:
            from kair_tpu.utils.logger import warn_once
            warn_once(
                f"tmsa-xla-fallback-{d}x{h}x{w}-{tuple(ws)}-"
                f"{self.mut_attn}-{self.geglu}",
                f"TMSA fuse_block=True fell back to the XLA path at "
                f"D{d}xH{h}xW{w}, window {tuple(ws)}, mut_attn="
                f"{self.mut_attn}, geglu={self.geglu} (slower): fused "
                "kernels cover (2,8,8) mutual+GEGLU, (wd,8,8) self+GEGLU "
                "(D%wd==0), (2,8,8) self-only, and (1,8,8) self-only "
                "(W%16==0, W within the strip VMEM cap) geometries")

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        pad_d = (ws[0] - d % ws[0]) % ws[0]
        pad_b = (ws[1] - h % ws[1]) % ws[1]
        pad_r = (ws[2] - w % ws[2]) % ws[2]
        if pad_d or pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_d), (0, pad_b), (0, pad_r), (0, 0)))
        dp, hp, wp = y.shape[1:4]

        if any(s > 0 for s in ss):
            y = jnp.roll(y, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
            # compact masks: 8 per-token label rows + in-graph compare and
            # gather — NOT the (nW, N, N) trace-time literal, which costs
            # MBs of HLO per block and made the 13-stage VRT uncompilable
            labels, widx = compute_mask_labels_3d(dp, hp, wp, ws, ss)
            lab = jnp.asarray(labels)
            pats = jnp.where(lab[:, None, :] != lab[:, :, None], -100.0, 0.0)
            mask = pats[jnp.asarray(widx)]
        else:
            mask = None

        yw = window_partition_3d(y, ws)
        yw = WindowAttention3D(self.dim, ws, self.num_heads, self.qkv_bias,
                               self.mut_attn, dtype=self.dtype,
                               name="attn")(yw, mask)
        y = window_reverse_3d(yw, ws, dp, hp, wp)

        if any(s > 0 for s in ss):
            y = jnp.roll(y, (ss[0], ss[1], ss[2]), axis=(1, 2, 3))
        if pad_d or pad_b or pad_r:
            y = y[:, :d, :h, :w, :]
        x = shortcut + y

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        if self.geglu:
            return x + GEGLU(int(c * self.mlp_ratio), c, dtype=self.dtype,
                             name="mlp")(y)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(_gelu(y))
        return x + y

    def _fused(self, x, ws, ss):
        """Fused Pallas block (ops/pallas/tmsa_block.py): the SAME
        submodules declare the params (outputs are dead code), so the param
        tree is identical to the standard path regardless of geometry."""
        import numpy as np
        from kair_tpu.ops.pallas.tmsa_block import (make_tmsa_biases,
                                                    tmsa_block_pallas,
                                                    tmsa_flat_params,
                                                    tmsa_mask_patterns)
        b, d, h, w, c = x.shape
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        _ = norm1(jnp.zeros((1, c), x.dtype))
        attn = WindowAttention3D(self.dim, ws, self.num_heads, self.qkv_bias,
                                 True, dtype=self.dtype, name="attn")
        _ = attn(jnp.zeros((1, 1, 128, c), x.dtype))
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        _ = norm2(jnp.zeros((1, c), x.dtype))
        mlp = GEGLU(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")
        _ = mlp(jnp.zeros((1, c), x.dtype))
        p = {"norm1": norm1.variables["params"],
             "attn": attn.variables["params"],
             "norm2": norm2.variables["params"],
             "mlp": mlp.variables["params"]}
        flat = tmsa_flat_params(p)
        pos = sine_position_encoding(ws[1], ws[2], c // 2)
        pos2 = jnp.asarray(np.concatenate([pos, pos], axis=0))
        rel_idx = rel_position_index_3d(*ws)[:128, :128]
        shifted = any(s > 0 for s in ss)
        if shifted:
            pats = tmsa_mask_patterns(d, h, w, ws, ss)
            x_in = jnp.roll(x, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
        else:
            pats, x_in = None, x
        bias_self, bias_mut = make_tmsa_biases(
            p["attn"]["rel_bias_table"], rel_idx, self.num_heads, pats)
        y = tmsa_block_pallas(x_in, flat, pos2, self.num_heads,
                              bias_self, bias_mut, shifted)
        if shifted:
            y = jnp.roll(y, (ss[0], ss[1], ss[2]), axis=(1, 2, 3))
        return y

    def _fused_self6(self, x, ws, ss):
        """Fused self-only + GEGLU (wd,8,8) block
        (ops/pallas/self6_block.py) — wd=6 for the stage self groups and
        the RTMSA head, wd=1 for the per-frame indep_reconsts tail
        (reference :1358), wd=2 for D==2 clips. Same param-declaration
        scheme as `_fused`: the standard submodules run on dummies so the
        tree is identical to the XLA path."""
        from kair_tpu.ops.pallas.self6_block import (make_self6_rel,
                                                     self6_block_pallas)
        from kair_tpu.ops.pallas.tmsa_block import tmsa_mask_patterns
        b, d, h, w, c = x.shape
        wd = ws[0]
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        _ = norm1(jnp.zeros((1, c), x.dtype))
        attn = WindowAttention3D(self.dim, ws, self.num_heads, self.qkv_bias,
                                 False, dtype=self.dtype, name="attn")
        _ = attn(jnp.zeros((1, 1, wd * 64, c), x.dtype))
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        _ = norm2(jnp.zeros((1, c), x.dtype))
        mlp = GEGLU(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")
        _ = mlp(jnp.zeros((1, c), x.dtype))
        ap = attn.variables["params"]
        flat = (ap["qkv_self_kernel"], ap.get("qkv_self_bias"),
                ap["proj_kernel"], ap["proj_bias"],
                norm1.variables["params"]["scale"],
                norm1.variables["params"]["bias"],
                norm2.variables["params"]["scale"],
                norm2.variables["params"]["bias"],
                mlp.variables["params"]["fc11"]["kernel"],
                mlp.variables["params"]["fc11"]["bias"],
                mlp.variables["params"]["fc12"]["kernel"],
                mlp.variables["params"]["fc12"]["bias"],
                mlp.variables["params"]["fc2"]["kernel"],
                mlp.variables["params"]["fc2"]["bias"])
        rel = make_self6_rel(ap["rel_bias_table"], self.num_heads, wd)
        shifted = any(s > 0 for s in ss)
        if shifted:
            pats = tmsa_mask_patterns(d, h, w, ws, ss)
            x_in = jnp.roll(x, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
        else:
            pats, x_in = None, x
        y = self6_block_pallas(x_in, flat, self.num_heads, rel, pats, shifted,
                               wd=wd)
        if shifted:
            y = jnp.roll(y, (ss[0], ss[1], ss[2]), axis=(1, 2, 3))
        return y

    def _declare_stl_params(self, ws, c, n_tokens, dtype):
        """Instantiate the standard-path submodules on dummies so the param
        tree is identical to the XLA path, and return the flat tuple the
        fused STL kernels consume."""
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        _ = norm1(jnp.zeros((1, c), dtype))
        attn = WindowAttention3D(self.dim, ws, self.num_heads, self.qkv_bias,
                                 False, dtype=self.dtype, name="attn")
        _ = attn(jnp.zeros((1, 1, n_tokens, c), dtype))
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        _ = norm2(jnp.zeros((1, c), dtype))
        hidden = int(c * self.mlp_ratio)
        fc1 = nn.Dense(hidden, dtype=self.dtype, name="mlp_fc1")
        _ = fc1(jnp.zeros((1, c), dtype))
        fc2 = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")
        _ = fc2(jnp.zeros((1, hidden), dtype))
        ap = attn.variables["params"]
        flat = (ap["qkv_self_kernel"], ap.get("qkv_self_bias"),
                ap["proj_kernel"], ap["proj_bias"],
                norm1.variables["params"]["scale"],
                norm1.variables["params"]["bias"],
                norm2.variables["params"]["scale"],
                norm2.variables["params"]["bias"],
                fc1.variables["params"]["kernel"],
                fc1.variables["params"]["bias"],
                fc2.variables["params"]["kernel"],
                fc2.variables["params"]["bias"])
        return flat, ap["rel_bias_table"]

    def _fused_stl2(self, x, ws, ss):
        """Fused self-only (2,8,8) block (ops/pallas/stl_block.py)."""
        from kair_tpu.ops.pallas.stl_block import (make_stl2_bias,
                                                   stl2_block_pallas)
        from kair_tpu.ops.pallas.tmsa_block import tmsa_mask_patterns
        b, d, h, w, c = x.shape
        flat, bias_table = self._declare_stl_params(ws, c, 128, x.dtype)
        rel_idx = rel_position_index_3d(*ws)
        shifted = any(s > 0 for s in ss)
        pats = tmsa_mask_patterns(d, h, w, ws, ss) if shifted else None
        bias = make_stl2_bias(bias_table, rel_idx, self.num_heads, pats)
        x_in = jnp.roll(x, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3)) \
            if shifted else x
        y = stl2_block_pallas(x_in, flat, self.num_heads, bias, shifted)
        if shifted:
            y = jnp.roll(y, (ss[0], ss[1], ss[2]), axis=(1, 2, 3))
        return y

    def _fused_stl1(self, x, ws, ss):
        """Self-only (1,8,8) block: per-frame 2-D windows — routed onto the
        SwinIR strip kernel with the 3-D bias table/index/mask."""
        from kair_tpu.ops.pallas.swin_block import swin_block_pallas_2d
        b, d, h, w, c = x.shape
        flat, bias_table = self._declare_stl_params(ws, c, 64, x.dtype)
        (qkv_k, qkv_b, proj_k, proj_b, ln1s, ln1b, ln2s, ln2b,
         fc1k, fc1b, fc2k, fc2b) = flat
        rel_idx = rel_position_index_3d(1, 8, 8)        # (64, 64)
        shifted = ss[1] > 0 or ss[2] > 0
        mask = jnp.asarray(compute_mask_3d(1, h, w, ws, (0, ss[1], ss[2]))) \
            if shifted else None
        x2 = x.reshape(b * d, h, w, c)
        if shifted:
            x2 = jnp.roll(x2, (-ss[1], -ss[2]), axis=(1, 2))
        y = swin_block_pallas_2d(x2, qkv_k, qkv_b, proj_k, proj_b,
                                 bias_table, rel_idx, self.num_heads,
                                 ln1s, ln1b, ln2s, ln2b,
                                 fc1k, fc1b, fc2k, fc2b, mask)
        if shifted:
            y = jnp.roll(y, (ss[1], ss[2]), axis=(1, 2))
        return y.reshape(b, d, h, w, c)


class TMSAPair(nn.Module):
    """One unshifted + one shifted TMSA — the scan period of TMSAG."""
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift_size: Tuple[int, int, int]
    mut_attn: bool
    mlp_ratio: float
    qkv_bias: bool
    geglu: bool
    fuse_block: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, _=None):
        x = TMSA(self.dim, self.num_heads, self.window_size, (0, 0, 0),
                 self.mut_attn, self.mlp_ratio, self.qkv_bias,
                 geglu=self.geglu, fuse_block=self.fuse_block,
                 dtype=self.dtype, name="a")(x)
        x = TMSA(self.dim, self.num_heads, self.window_size, self.shift_size,
                 self.mut_attn, self.mlp_ratio, self.qkv_bias,
                 geglu=self.geglu, fuse_block=self.fuse_block,
                 dtype=self.dtype, name="b")(x)
        return x, None


class TMSAG(nn.Module):
    """Group of TMSA blocks alternating no-shift / shift (reference :855-948).

    Even depths run as nn.scan over TMSAPair (params stacked on a leading
    depth//2 axis): the block body is traced/compiled ONCE instead of
    `depth` times — the full 13-stage VRT's unrolled HLO is otherwise too
    large to compile (and slow everywhere). Odd depths fall back to the
    python loop with per-block params (blk00, blk01, ...)."""
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (6, 8, 8)
    shift_size: Optional[Tuple[int, int, int]] = None
    mut_attn: bool = True
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    geglu: bool = True
    fuse_block: bool = False
    remat: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        ss = tuple(i // 2 for i in self.window_size) \
            if self.shift_size is None else self.shift_size
        if self.depth % 2 == 0 and self.depth > 0:
            inner = nn.remat(TMSAPair) if self.remat else TMSAPair
            scan = nn.scan(inner, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           length=self.depth // 2)
            x, _ = scan(self.dim, self.num_heads, self.window_size, ss,
                        self.mut_attn, self.mlp_ratio, self.qkv_bias,
                        self.geglu, self.fuse_block, dtype=self.dtype,
                        name="pairs")(x, None)
            return x
        for i in range(self.depth):
            blk = TMSA(self.dim, self.num_heads, self.window_size,
                       (0, 0, 0) if i % 2 == 0 else ss, self.mut_attn,
                       self.mlp_ratio, self.qkv_bias, geglu=self.geglu,
                       fuse_block=self.fuse_block, dtype=self.dtype,
                       name=f"blk{i:02d}")
            x = nn.remat(lambda m, v: m(v))(blk, x) if self.remat else blk(x)
        return x


class RTMSA(nn.Module):
    """x + Linear(TMSAG_self(x)) — stage-8 tail block (reference :952-995)."""
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    fuse_block: bool = False
    remat: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        y = TMSAG(self.dim, self.depth, self.num_heads, self.window_size,
                  mut_attn=False, mlp_ratio=self.mlp_ratio,
                  qkv_bias=self.qkv_bias, fuse_block=self.fuse_block,
                  remat=self.remat, dtype=self.dtype,
                  name="group")(x)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="linear")(y)


class DCNv2PackFlowGuided(nn.Module):
    """Flow-guided deformable alignment (reference :267-338)."""
    dim: int
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.0
    pa_frames: int = 2
    deform_impl: str = "auto"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, x_flow_warpeds: List, x_current, flows: List):
        # offset net over [warped features, current, flows]
        feat = jnp.concatenate(list(x_flow_warpeds) + [x_current] + list(flows),
                               axis=-1)
        h = nn.leaky_relu(Conv(self.dim, dtype=self.dtype, name="off0")(feat), 0.1)
        h = nn.leaky_relu(Conv(self.dim, dtype=self.dtype, name="off1")(h), 0.1)
        h = nn.leaky_relu(Conv(self.dim, dtype=self.dtype, name="off2")(h), 0.1)
        # final offset conv is zero-initialised (reference init_offset :310-314)
        out = nn.Conv(3 * 9 * self.deformable_groups, (3, 3), padding=1,
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      dtype=self.dtype, name="off3")(h)
        K = 9
        dg = self.deformable_groups
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))
        # add flow (flipped to (y,x)) per tap (reference :320-332)
        n_chunks = self.pa_frames // 2
        offs = jnp.split(offset, n_chunks, axis=-1)
        offs_out = []
        for off_c, flow in zip(offs, flows):
            fl = flow[..., ::-1]                      # (x,y) -> (y,x)
            rep = jnp.tile(fl, (1, 1, 1, off_c.shape[-1] // 2))
            offs_out.append(off_c + rep)
        offset = jnp.concatenate(offs_out, axis=-1)
        mask = nn.sigmoid(mask)

        weight = self.param("dcn_kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.dim))
        bias = self.param("dcn_bias", nn.initializers.zeros, (self.dim,))
        return modulated_deform_conv(x, offset, mask, weight, bias,
                                     stride=1, padding=1, dilation=1,
                                     deformable_groups=dg,
                                     impl=self.deform_impl)


class Stage(nn.Module):
    """reshape + TMSAG(mutual) + TMSAG(self) + parallel warping
    (reference :998-1105)."""
    in_dim: int
    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    mul_attn_ratio: float = 0.75
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    pa_frames: int = 2
    deformable_groups: int = 16
    reshape: str = "none"
    max_residue_magnitude: float = 10.0
    fuse_block: bool = False
    deform_impl: str = "auto"
    remat: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, flows_backward: List, flows_forward: List):
        b, d, h, w, c = x.shape
        # reshape (reference :1043-1056); 'down' channel order (neiw neih c)
        if self.reshape == "none":
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="resh_norm")(x)
        elif self.reshape == "down":
            x = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 2, 4, 5, 3, 6)      # b d h w neiw neih c
            x = x.reshape(b, d, h // 2, w // 2, 4 * c)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="resh_norm")(x)
            x = nn.Dense(self.dim, dtype=self.dtype, name="resh_linear")(x)
        elif self.reshape == "up":
            # 'n (neiw neih c) d h w -> n d (h neih) (w neiw) c'
            co = c // 4
            x = x.reshape(b, d, h, w, 2, 2, co)       # neiw neih c
            x = x.transpose(0, 1, 2, 5, 3, 4, 6)      # b d h neih w neiw c
            x = x.reshape(b, d, h * 2, w * 2, co)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="resh_norm")(x)
            x = nn.Dense(self.dim, dtype=self.dtype, name="resh_linear")(x)

        depth1 = int(self.depth * self.mul_attn_ratio)
        y = TMSAG(self.dim, depth1, self.num_heads,
                  (2, self.window_size[1], self.window_size[2]),
                  mut_attn=True, mlp_ratio=self.mlp_ratio,
                  qkv_bias=self.qkv_bias, fuse_block=self.fuse_block,
                  remat=self.remat, dtype=self.dtype,
                  name="group1")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear1")(y) + x
        y = TMSAG(self.dim, self.depth - depth1, self.num_heads,
                  self.window_size, mut_attn=False, mlp_ratio=self.mlp_ratio,
                  qkv_bias=self.qkv_bias, fuse_block=self.fuse_block,
                  remat=self.remat, dtype=self.dtype,
                  name="group2")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y) + x

        if self.pa_frames:
            pa_deform = DCNv2PackFlowGuided(
                self.dim, self.deformable_groups, self.max_residue_magnitude,
                self.pa_frames, deform_impl=self.deform_impl,
                dtype=self.dtype, name="pa_deform")
            aligner = {2: _aligned_2frames, 4: _aligned_4frames,
                       6: _aligned_6frames}[self.pa_frames]
            x_backward, x_forward = aligner(x, flows_backward, flows_forward,
                                            pa_deform)
            fused = GEGLU(self.dim * 3, self.dim, dtype=self.dtype,
                          name="pa_fuse")(
                jnp.concatenate([x, x_backward, x_forward], axis=-1))
            x = fused
        return x


# ----------------------------------------------------------------------------
# parallel warping (reference :1107-1228); frame loops are python (D static)
# ----------------------------------------------------------------------------

def _aligned_2frames(x, flows_backward, flows_forward, pa_deform):
    n = x.shape[1]
    fb = flows_backward[0]
    ff = flows_forward[0]
    x_backward = [jnp.zeros_like(x[:, -1])]
    for i in range(n - 1, 0, -1):
        x_i = x[:, i]
        flow = fb[:, i - 1]
        x_i_warped = flow_warp(x_i, flow, "bilinear")
        x_backward.insert(0, pa_deform(x_i, [x_i_warped], x[:, i - 1], [flow]))
    x_forward = [jnp.zeros_like(x[:, 0])]
    for i in range(0, n - 1):
        x_i = x[:, i]
        flow = ff[:, i]
        x_i_warped = flow_warp(x_i, flow, "bilinear")
        x_forward.append(pa_deform(x_i, [x_i_warped], x[:, i + 1], [flow]))
    return jnp.stack(x_backward, 1), jnp.stack(x_forward, 1)


def _aligned_4frames(x, flows_backward, flows_forward, pa_deform):
    """reference get_aligned_feature_4frames (:1129-1167)."""
    n = x.shape[1]
    x_backward = [jnp.zeros_like(x[:, -1])]
    for i in range(n, 1, -1):
        x_i = x[:, i - 1]
        flow1 = flows_backward[0][:, i - 2]
        if i == n:
            x_ii = jnp.zeros_like(x[:, n - 2])
            flow2 = jnp.zeros_like(flows_backward[1][:, n - 3])
        else:
            x_ii = x[:, i]
            flow2 = flows_backward[1][:, i - 2]
        x_i_w = flow_warp(x_i, flow1, "bilinear")
        x_ii_w = flow_warp(x_ii, flow2, "bilinear")
        x_backward.insert(0, pa_deform(
            jnp.concatenate([x_i, x_ii], -1), [x_i_w, x_ii_w],
            x[:, i - 2], [flow1, flow2]))
    x_forward = [jnp.zeros_like(x[:, 0])]
    for i in range(-1, n - 2):
        x_i = x[:, i + 1]
        flow1 = flows_forward[0][:, i + 1]
        if i == -1:
            x_ii = jnp.zeros_like(x[:, 1])
            flow2 = jnp.zeros_like(flows_forward[1][:, 0])
        else:
            x_ii = x[:, i]
            flow2 = flows_forward[1][:, i]
        x_i_w = flow_warp(x_i, flow1, "bilinear")
        x_ii_w = flow_warp(x_ii, flow2, "bilinear")
        x_forward.append(pa_deform(
            jnp.concatenate([x_i, x_ii], -1), [x_i_w, x_ii_w],
            x[:, i + 2], [flow1, flow2]))
    return jnp.stack(x_backward, 1), jnp.stack(x_forward, 1)


def _aligned_6frames(x, flows_backward, flows_forward, pa_deform):
    """reference get_aligned_feature_6frames (:1169-1228)."""
    n = x.shape[1]
    x_backward = [jnp.zeros_like(x[:, -1])]
    for i in range(n + 1, 2, -1):
        x_i = x[:, i - 2]
        flow1 = flows_backward[0][:, i - 3]
        if i == n + 1:
            x_ii = jnp.zeros_like(x[:, -1]); flow2 = jnp.zeros_like(flows_backward[1][:, -1])
            x_iii = jnp.zeros_like(x[:, -1]); flow3 = jnp.zeros_like(flows_backward[2][:, -1])
        elif i == n:
            x_ii = x[:, i - 1]; flow2 = flows_backward[1][:, i - 3]
            x_iii = jnp.zeros_like(x[:, -1]); flow3 = jnp.zeros_like(flows_backward[2][:, -1])
        else:
            x_ii = x[:, i - 1]; flow2 = flows_backward[1][:, i - 3]
            x_iii = x[:, i]; flow3 = flows_backward[2][:, i - 3]
        ws_ = [flow_warp(a, f, "bilinear") for a, f in
               ((x_i, flow1), (x_ii, flow2), (x_iii, flow3))]
        x_backward.insert(0, pa_deform(
            jnp.concatenate([x_i, x_ii, x_iii], -1), ws_, x[:, i - 3],
            [flow1, flow2, flow3]))
    x_forward = [jnp.zeros_like(x[:, 0])]
    for i in range(0, n - 1):
        x_i = x[:, i]
        flow1 = flows_forward[0][:, i]
        if i == 0:
            x_ii = jnp.zeros_like(x[:, 0]); flow2 = jnp.zeros_like(flows_forward[1][:, 0])
            x_iii = jnp.zeros_like(x[:, 0]); flow3 = jnp.zeros_like(flows_forward[2][:, 0])
        elif i == 1:
            x_ii = x[:, i - 1]; flow2 = flows_forward[1][:, i - 1]
            x_iii = jnp.zeros_like(x[:, 0]); flow3 = jnp.zeros_like(flows_forward[2][:, 0])
        else:
            x_ii = x[:, i - 1]; flow2 = flows_forward[1][:, i - 1]
            x_iii = x[:, i - 2]; flow3 = flows_forward[2][:, i - 2]
        ws_ = [flow_warp(a, f, "bilinear") for a, f in
               ((x_i, flow1), (x_ii, flow2), (x_iii, flow3))]
        x_forward.append(pa_deform(
            jnp.concatenate([x_i, x_ii, x_iii], -1), ws_, x[:, i + 1],
            [flow1, flow2, flow3]))
    return jnp.stack(x_backward, 1), jnp.stack(x_forward, 1)


# ----------------------------------------------------------------------------
# main VRT
# ----------------------------------------------------------------------------

def _conv2d_frames(x, fn):
    """Apply a per-frame 2-D op to (B,D,H,W,C) (every reference Conv3d has
    kernel (1,3,3) — a per-frame 2-D conv; frames fold into the batch)."""
    b, d, h, w, c = x.shape
    y = fn(x.reshape(b * d, h, w, c))
    return y.reshape(b, d, *y.shape[1:])


class VRT(nn.Module):
    """reference network_vrt.py:1231-1620."""
    upscale: int = 4
    in_chans: int = 3
    out_chans: int = 3
    window_size: Tuple[int, int, int] = (6, 8, 8)
    depths: Tuple[int, ...] = (8, 8, 8, 8, 8, 8, 8, 4, 4, 4, 4, 4, 4)
    embed_dims: Tuple[int, ...] = (120,) * 7 + (180,) * 6
    num_heads: Tuple[int, ...] = (6,) * 13
    mul_attn_ratio: float = 0.75
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    num_feat: int = 64
    pa_frames: int = 2
    deformable_groups: int = 16
    nonblind_denoising: bool = False
    # stage-8 blocks using per-frame (1,h,w) windows; None = last two
    # (reference :1270 indep_reconsts=[11,12]; [] for frame interpolation)
    indep_reconsts: Optional[Tuple[int, ...]] = None
    fuse_block: bool = False
    deform_impl: str = "auto"
    remat: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, D, H, W, C) [+1 noise channel when nonblind]."""
        b, d, h, w, _ = x.shape

        if not self.pa_frames:
            # video frame interpolation (reference :1454-1467): no flows,
            # mean-subtract, fuse all frames, 7x7 reflection-padded head
            x_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            x = x - x_mean
            conv_first = Conv(self.embed_dims[0], dtype=self.dtype,
                              name="conv_first")
            feat = _conv2d_frames(x, conv_first)
            feat_out = self._features(feat, [], [])
            feat = feat + nn.Dense(self.embed_dims[0], dtype=self.dtype,
                                   name="conv_after_body")(feat_out)
            # cat(unbind(x, D), channel): frame-major channel packing
            fused = feat.transpose(0, 2, 3, 1, 4).reshape(
                b, h, w, d * self.embed_dims[0])
            fused = nn.leaky_relu(
                Conv(self.num_feat, 1, 1, 0, dtype=self.dtype,
                     name="linear_fuse")(fused), 0.2)
            fused = jnp.pad(fused, ((0, 0), (3, 3), (3, 3), (0, 0)),
                            mode="reflect")
            out = Conv(self.out_chans, 7, 1, 0, dtype=self.dtype,
                       name="conv_last")(fused)
            # split channel into 3-channel output frames (reference :1465)
            frames = out.reshape(b, h, w, -1, 3).transpose(0, 3, 1, 2, 4)
            return frames + x_mean

        if self.nonblind_denoising:
            x, noise_map = x[..., :self.in_chans], x[..., self.in_chans:]
        x_lq = x

        # flows + nearest4 image pre-warp
        spynet = SpyNet(return_levels=(2, 3, 4, 5), dtype=self.dtype,
                        name="spynet")
        flows_backward, flows_forward = self._get_flows(x, spynet)
        xb, xf = self._aligned_image_2frames(x, flows_backward[0],
                                             flows_forward[0])
        feat = jnp.concatenate([x, xb, xf], axis=-1)
        if self.nonblind_denoising:
            feat = jnp.concatenate([feat, noise_map], axis=-1)

        conv_first = Conv(self.embed_dims[0], dtype=self.dtype, name="conv_first")
        feat = _conv2d_frames(feat, conv_first)

        feat_out = self._features(feat, flows_backward, flows_forward)
        feat = feat + nn.Dense(self.embed_dims[0], dtype=self.dtype,
                               name="conv_after_body")(feat_out)

        if self.upscale == 1:
            conv_last = Conv(self.out_chans, dtype=self.dtype, name="conv_last")
            out = _conv2d_frames(feat, conv_last)
            return out + x_lq

        # video SR reconstruction (reference Upsample, :517-556)
        cbu = Conv(self.num_feat, dtype=self.dtype, name="conv_before_upsample")
        feat = _conv2d_frames(feat, lambda a: nn.leaky_relu(cbu(a), 0.01))
        s = self.upscale
        i = 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            up_conv = Conv(self.num_feat * r * r, dtype=self.dtype,
                           name=f"upsample{i}")
            feat = _conv2d_frames(
                feat, lambda a, up_conv=up_conv, r=r: nn.leaky_relu(
                    pixel_shuffle(up_conv(a), r), 0.1))
            s //= r
            i += 1
        up_tail = Conv(self.num_feat, dtype=self.dtype, name="upsample_tail")
        feat = _conv2d_frames(feat, up_tail)
        conv_last = Conv(self.out_chans, dtype=self.dtype, name="conv_last")
        out = _conv2d_frames(feat, conv_last)

        # + bilinearly upscaled input (trilinear with D unchanged == per-frame
        # bilinear, reference :1452-1453)
        base = jax.vmap(lambda f: resize_bilinear(
            f, (h * self.upscale, w * self.upscale)), in_axes=1, out_axes=1)(x_lq)
        return out + base

    # ------------------------------------------------------------------
    def _features(self, x, flows_backward, flows_forward):
        """7-stage U-shape + RTMSA tail (reference forward_features :1580-1620)."""
        reshapes = ["none", "down", "down", "down", "up", "up", "up"]
        stage_args = dict(mul_attn_ratio=self.mul_attn_ratio,
                          mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                          pa_frames=self.pa_frames,
                          deformable_groups=self.deformable_groups,
                          fuse_block=self.fuse_block,
                          deform_impl=self.deform_impl,
                          remat=self.remat, dtype=self.dtype)
        scales = [1, 2, 4, 8, 4, 2, 1]

        def stage(i, inp, fb, ff):
            return Stage(self.embed_dims[i - 1] if i else self.embed_dims[0],
                         self.embed_dims[i], self.depths[i], self.num_heads[i],
                         self.window_size, reshape=reshapes[i],
                         max_residue_magnitude=10.0 / scales[i],
                         name=f"stage{i + 1}", **stage_args)(inp, fb, ff)

        x1 = stage(0, x, flows_backward[0::4], flows_forward[0::4])
        x2 = stage(1, x1, flows_backward[1::4], flows_forward[1::4])
        x3 = stage(2, x2, flows_backward[2::4], flows_forward[2::4])
        x4 = stage(3, x3, flows_backward[3::4], flows_forward[3::4])
        xx = stage(4, x4, flows_backward[2::4], flows_forward[2::4])
        xx = stage(5, xx + x3, flows_backward[1::4], flows_forward[1::4])
        xx = stage(6, xx + x2, flows_backward[0::4], flows_forward[0::4])
        xx = xx + x1

        # stage-8 head: LN + Linear projection embed_dims[6] → embed_dims[7]
        # (reference :1344-1351)
        xx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="stage8_norm")(xx)
        xx = nn.Dense(self.embed_dims[7], dtype=self.dtype,
                      name="stage8_linear")(xx)
        indep = self.indep_reconsts if self.indep_reconsts is not None \
            else tuple(range(len(self.depths) - 2, len(self.depths)))
        for j in range(7, len(self.depths)):
            # reconstruction blocks in indep_reconsts use per-frame (1,h,w)
            # windows (reference :1358)
            ws8 = (1, self.window_size[1], self.window_size[2]) \
                if j in indep else self.window_size
            xx = RTMSA(self.embed_dims[j], self.depths[j], self.num_heads[j],
                       ws8, self.mlp_ratio, self.qkv_bias,
                       fuse_block=self.fuse_block, remat=self.remat,
                       dtype=self.dtype, name=f"stage8_{j - 7}")(xx)

        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(xx)

    # ------------------------------------------------------------------
    def _get_flows(self, x, spynet):
        """2/4/6-frame flow sets (reference get_flows :1457-1556)."""
        b, d, h, w, c = x.shape
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        # both directions in ONE SpyNet call (batch-parallel pyramid →
        # half the sequential tiny-conv chain; exact equality)
        m = x1.shape[0]
        both = spynet(jnp.concatenate([x1, x2], axis=0),
                      jnp.concatenate([x2, x1], axis=0))
        fb = [f[:m].reshape(b, d - 1, h // 2 ** i, w // 2 ** i, 2)
              for f, i in zip(both, range(4))]
        ff = [f[m:].reshape(b, d - 1, h // 2 ** i, w // 2 ** i, 2)
              for f, i in zip(both, range(4))]
        if self.pa_frames == 2:
            return fb, ff
        fb2, ff2 = self._flows_4frames(ff, fb)
        if self.pa_frames == 4:
            return fb + fb2, ff + ff2
        fb3, ff3 = self._flows_6frames(ff, fb, ff2, fb2)
        return fb + fb2 + fb3, ff + ff2 + ff3

    @staticmethod
    def _flows_4frames(flows_forward, flows_backward):
        """(t,t+2) flow composition (reference get_flow_4frames :1508-1532)."""
        d = flows_forward[0].shape[1]
        fb2, ff2 = [], []
        for flows in flows_backward:
            lst = []
            for i in range(d - 1, 0, -1):
                fn1 = flows[:, i - 1]
                fn2 = flows[:, i]
                lst.insert(0, fn1 + flow_warp(fn2, fn1))
            fb2.append(jnp.stack(lst, 1))
        for flows in flows_forward:
            lst = []
            for i in range(1, d):
                fn1 = flows[:, i]
                fn2 = flows[:, i - 1]
                lst.append(fn1 + flow_warp(fn2, fn1))
            ff2.append(jnp.stack(lst, 1))
        return fb2, ff2

    @staticmethod
    def _flows_6frames(ff, fb, ff2, fb2):
        """(t,t+3) composition (reference get_flow_6frames :1534-1558)."""
        d = ff2[0].shape[1]
        fb3, ff3 = [], []
        for flows, flows2 in zip(fb, fb2):
            lst = []
            for i in range(d - 1, 0, -1):
                fn1 = flows2[:, i - 1]
                fn2 = flows[:, i + 1]
                lst.insert(0, fn1 + flow_warp(fn2, fn1))
            fb3.append(jnp.stack(lst, 1))
        for flows, flows2 in zip(ff, ff2):
            lst = []
            for i in range(2, d + 1):
                fn1 = flows2[:, i - 1]
                fn2 = flows[:, i - 2]
                lst.append(fn1 + flow_warp(fn2, fn1))
            ff3.append(jnp.stack(lst, 1))
        return fb3, ff3

    @staticmethod
    def _aligned_image_2frames(x, fb, ff):
        """nearest4 input pre-warping (reference :1560-1578)."""
        n = x.shape[1]
        xb = [jnp.tile(jnp.zeros_like(x[:, -1]), (1, 1, 1, 4))]
        for i in range(n - 1, 0, -1):
            xb.insert(0, flow_warp(x[:, i], fb[:, i - 1], "nearest4"))
        xf = [jnp.tile(jnp.zeros_like(x[:, 0]), (1, 1, 1, 4))]
        for i in range(0, n - 1):
            xf.append(flow_warp(x[:, i], ff[:, i], "nearest4"))
        return jnp.stack(xb, 1), jnp.stack(xf, 1)
