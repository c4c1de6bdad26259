"""Fused self-attention + GEGLU TMSA block for (wd,8,8) windows — Pallas TPU.

Covers the VRT geometries the (2,8,8) mutual kernel can't: the second
(self-only) TMSAG of every stage and the RTMSA tail (reference
network_vrt.py:855-995, stage 8 :1318-1366) run 3-D windows of wd frames ×
8×8 spatial (wd=6 → 384 tokens; wd=1 for the per-frame indep_reconsts
blocks :1358; wd=2 for 2-frame clips) with GEGLU MLPs. One program per
(batch, wd-frame slab, 8-row band, w-chunk) computes the ENTIRE block —
LN1 → W-MSA(rel-pos bias, shift mask) → residual → LN2 → GEGLU MLP →
residual — in VMEM; bands are chunked along W so the unrolled body stays
under the 16 MB scoped-VMEM stack limit (_token_budget).

Shift masks: at shift (3,4,4) ((0,4,4) when D==6) the windows take at most
8 distinct mask patterns (is_last_d × is_last_h × is_last_w); the
(8,384,384) bf16 pattern stack stays VMEM-resident (2.4 MB) and each
window selects its pattern at runtime from the program position — the
(nW,N,N) literal the reference materializes would be MBs of HLO.

Softmax rides the rowsum-lane fold (pack_qkv_fused rowsum_lane): v's
first pad lane is the constant 1, so the PV matmul's column hd is the
softmax denominator — no separate ones-matmul per (window, head).

Differentiable: under jax.grad the forward switches to the max-safe
softmax and the backward recomputes through a jnp reference (remat
memory profile — only the block input is saved).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kair_tpu.ops.pallas.swin_block import _gelu_fast
from kair_tpu.ops.pallas.window_msa import (_HD_PAD, fold_ln_affine,
                                            pack_qkv_fused)

N6 = 384                                   # 6*8*8 tokens per window


def _token_budget(c: int) -> int:
    """Max tokens per program before the unrolled body's f32 intermediates
    threaten the 16 MB scoped-VMEM stack (measured: 3072 tokens at C=120
    needed 20.75 MB)."""
    return 2048 if c <= 128 else 1024


def pack_proj_self(proj_kernel, num_heads: int):
    """(C, C) projection → (nh*32, C) with zero pad rows per head."""
    c = proj_kernel.shape[-1]
    hd = proj_kernel.shape[0] // num_heads
    wp = proj_kernel.reshape(num_heads, hd, c)
    wp = jnp.pad(wp, ((0, 0), (0, _HD_PAD - hd), (0, 0)))
    return wp.reshape(num_heads * _HD_PAD, c)


def make_self6_rel(bias_table, num_heads: int, wd: int = 6):
    """(nh, N, N) f32 rel-pos bias for (wd,8,8) windows, index built
    IN-GRAPH from the tiny (3,N) coords constant (the materialized (N,N)
    index would be ~0.6 MB of HLO per distinct block config)."""
    from kair_tpu.models.vrt import rel_position_index_3d_graph
    n_tok = wd * 64
    idx = rel_position_index_3d_graph(wd, 8, 8, n_tok)
    rel = jnp.asarray(bias_table)[idx.reshape(-1)].reshape(n_tok, n_tok,
                                                           num_heads)
    return rel.transpose(2, 0, 1).astype(jnp.float32)


def _kernel(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, rel_ref, mask_ref,
            ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
            fc11w_ref, fc11b_ref, fc12w_ref, fc12b_ref,
            fc2w_ref, fc2b_ref, out_ref, *,
            num_heads: int, n_win: int, shifted: bool,
            nd: int, nh_: int, nw_blk: int, safe: bool, rs_lane, wd: int,
            affine_folded: bool = False):
    g_w = n_win
    n_tok = wd * 64
    c = x_ref.shape[-1]
    w = x_ref.shape[3]
    # (wd, 8, W, C) → (G windows, wd, 8, 8, C) → token-major (G*N, C)
    x4 = x_ref[0].reshape(wd, 8, g_w, 8, c).transpose(2, 0, 1, 3, 4)
    x0 = x4.reshape(g_w * n_tok, c)
    dtype = x0.dtype

    def layernorm(v, s_ref, b_ref):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
        y = (vf - mu) * jax.lax.rsqrt(var + 1e-5)
        if affine_folded:
            # inference: affines live in the packed qkv/fc1 weights (_impl)
            return y.astype(dtype)
        return (y * s_ref[:] + b_ref[:]).astype(dtype)

    h = layernorm(x0, ln1s_ref, ln1b_ref)
    qkv = (jnp.dot(h, wqkv_ref[:], preferred_element_type=jnp.float32)
           + bqkv_ref[:]).astype(dtype)

    if shifted:
        ild = jnp.where(pl.program_id(1) == nd - 1, 1, 0)
        ilh = jnp.where(pl.program_id(2) == nh_ - 1, 1, 0)
        base_idx = 4 * ild + 2 * ilh
        # last window along w = last w-chunk AND last window in the chunk
        ilw_blk = pl.program_id(3) == nw_blk - 1

    cols = []
    for hd_i in range(num_heads):
        base = hd_i * 3 * _HD_PAD
        q = qkv[:, base:base + _HD_PAD]
        k = qkv[:, base + _HD_PAD:base + 2 * _HD_PAD]
        v = qkv[:, base + 2 * _HD_PAD:base + 3 * _HD_PAD]
        outs = []
        for g in range(g_w):
            qg = q[g * n_tok:(g + 1) * n_tok]
            kg = k[g * n_tok:(g + 1) * n_tok]
            s = jax.lax.dot_general(qg, kg, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + rel_ref[hd_i].astype(jnp.float32)
            if shifted:
                idx = base_idx + (jnp.where(ilw_blk, 1, 0)
                                  if g == g_w - 1 else 0)
                s = s + mask_ref[idx].astype(jnp.float32)
            if safe:
                s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            eb = e.astype(dtype)
            o = jnp.dot(eb, v[g * n_tok:(g + 1) * n_tok],
                        preferred_element_type=jnp.float32)
            if rs_lane is not None:
                rs = o[:, rs_lane:rs_lane + 1]
            else:
                rs = jnp.dot(eb, jnp.ones((n_tok, 8), dtype),
                             preferred_element_type=jnp.float32)[:, :1]
            outs.append(o * (1.0 / rs))
        cols.append(jnp.concatenate(outs, axis=0))

    acc = jnp.concatenate(cols, axis=-1).astype(dtype)
    attn = jnp.dot(acc, wp_ref[:], preferred_element_type=jnp.float32) \
        + bp_ref[:]
    x1 = x0.astype(jnp.float32) + attn

    h2 = layernorm(x1, ln2s_ref, ln2b_ref)
    a = jnp.dot(h2, fc11w_ref[:], preferred_element_type=jnp.float32) \
        + fc11b_ref[:]
    a = _gelu_fast(a)
    gte = jnp.dot(h2, fc12w_ref[:], preferred_element_type=jnp.float32) \
        + fc12b_ref[:]
    hid = (a * gte).astype(dtype)
    mlp = jnp.dot(hid, fc2w_ref[:], preferred_element_type=jnp.float32) \
        + fc2b_ref[:]
    y = (x1 + mlp).astype(dtype)

    y4 = y.reshape(g_w, wd, 8, 8, c).transpose(1, 2, 0, 3, 4)
    out_ref[0] = y4.reshape(wd, 8, w, c)


def _impl(meta, x, flat, rel, mask_pats):
    num_heads, shifted, interpret, safe, wd = meta
    (qkv_k, qkv_b, proj_k, proj_b,
     ln1s, ln1b, ln2s, ln2b,
     fc11k, fc11b, fc12k, fc12b, fc2k, fc2b) = flat
    b, d, h, w, c = x.shape
    assert d % wd == 0 and h % 8 == 0 and w % 8 == 0
    hd = c // num_heads
    scale = hd ** -0.5
    nd, nh_, n_win = d // wd, h // 8, w // 8
    rs_lane = hd if hd < _HD_PAD else None

    # windows per program, chunked along w: the unrolled per-window body
    # keeps ~14 B/token of f32 intermediates live — a full 64-wide C=120
    # band (3072 tokens) blows the 16 MB scoped-VMEM stack limit. Largest
    # divisor of n_win that keeps tokens under budget.
    tok_budget = _token_budget(c)
    g_blk = max(g for g in range(1, n_win + 1)
                if n_win % g == 0 and g * wd * 64 <= tok_budget) \
        if wd * 64 <= tok_budget else 1
    nw_blk = n_win // g_blk

    wqkv, bqkv = pack_qkv_fused(qkv_k, qkv_b, num_heads, scale,
                                rowsum_lane=rs_lane is not None)
    wp = pack_proj_self(proj_k, num_heads)
    fold_ln = not safe
    if fold_ln:
        wqkv, bqkv = fold_ln_affine(wqkv, bqkv, ln1s, ln1b)
        fc11k, fc11b = fold_ln_affine(fc11k, fc11b, ln2s, ln2b)
        fc12k, fc12b = fold_ln_affine(fc12k, fc12b, ln2s, ln2b)
    wqkv, wp = wqkv.astype(x.dtype), wp.astype(x.dtype)

    slab = pl.BlockSpec(
        (1, wd, 8, g_blk * 8, c),
        lambda i, j, k2, l: (i, j, k2, l, 0),
        memory_space=pltpu.VMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, n_win=g_blk, shifted=shifted,
        nd=nd, nh_=nh_, nw_blk=nw_blk, safe=safe, rs_lane=rs_lane, wd=wd,
        affine_folded=fold_ln)
    return pl.pallas_call(
        kernel,
        grid=(b, nd, nh_, nw_blk),
        in_specs=[slab] + [vmem()] * 16,
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv.astype(jnp.float32), wp, proj_b.astype(jnp.float32),
      # rel bias is per-head-resident; bf16 keeps the (nh,384,384) stack at
      # 1.8 MB of VMEM (f32 would be 3.5), masks likewise (2.4 MB for 8)
      rel.astype(jnp.bfloat16), jnp.asarray(mask_pats).astype(jnp.bfloat16),
      ln1s.astype(jnp.float32), ln1b.astype(jnp.float32),
      ln2s.astype(jnp.float32), ln2b.astype(jnp.float32),
      fc11k.astype(x.dtype), fc11b.astype(jnp.float32),
      fc12k.astype(x.dtype), fc12b.astype(jnp.float32),
      fc2k.astype(x.dtype), fc2b.astype(jnp.float32))


def window_pattern_index6(d: int, h: int, w: int, shifted: bool,
                          wd: int = 6) -> np.ndarray:
    """(nW,) int index of each (wd,8,8) window's shift-mask pattern in
    partition order — 4·is_last_d + 2·is_last_h + is_last_w."""
    nd, nh_, nw = d // wd, h // 8, w // 8
    if not shifted:
        return np.zeros(nd * nh_ * nw, np.int32)
    di = (np.arange(nd) == nd - 1).astype(np.int32) * 4
    hi = (np.arange(nh_) == nh_ - 1).astype(np.int32) * 2
    wi = (np.arange(nw) == nw - 1).astype(np.int32)
    return (di[:, None, None] + hi[None, :, None]
            + wi[None, None, :]).reshape(-1)


def _reference_self6(x, flat, num_heads, rel, mask_pats, widx, wd=6):
    """jnp mirror of the fused kernel on (B,D,H,W,C) — the differentiable
    recompute path for the custom VJP (max-safe softmax)."""
    (qkv_k, qkv_b, proj_k, proj_b,
     ln1s, ln1b, ln2s, ln2b,
     fc11k, fc11b, fc12k, fc12b, fc2k, fc2b) = flat
    b, d, h, w, c = x.shape
    n_tok = wd * 64
    nd, nh_, nw_ = d // wd, h // 8, w // 8
    n_windows = nd * nh_ * nw_
    hd = c // num_heads
    scale = hd ** -0.5
    dtype = x.dtype

    xw = x.reshape(b, nd, wd, nh_, 8, nw_, 8, c)
    xw = xw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, n_windows, n_tok, c)

    def ln(v, s, bb):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
        return (((vf - mu) * jax.lax.rsqrt(var + 1e-5)) * s + bb).astype(dtype)

    hn = ln(xw, ln1s, ln1b)
    y = jnp.einsum("bwnc,cd->bwnd", hn, qkv_k.astype(dtype),
                   preferred_element_type=jnp.float32)
    if qkv_b is not None:
        y = y + qkv_b
    y = y.astype(dtype).reshape(b, n_windows, n_tok, 3, num_heads, hd)
    q = y[:, :, :, 0].transpose(0, 1, 3, 2, 4) * scale
    k = y[:, :, :, 1].transpose(0, 1, 3, 2, 4)
    v = y[:, :, :, 2].transpose(0, 1, 3, 2, 4)

    bias_w = rel[None] + jnp.take(jnp.asarray(mask_pats), jnp.asarray(widx),
                                  axis=0)[:, None]      # (nW, nh, N, N)

    s = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                   preferred_element_type=jnp.float32)
    s = s + bias_w[None].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    o = jnp.einsum("bwhnm,bwhmd->bwhnd", p, v,
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 1, 3, 2, 4).reshape(b, n_windows, n_tok, c)

    attn = jnp.einsum("bwnd,dc->bwnc", o.astype(dtype), proj_k.astype(dtype),
                      preferred_element_type=jnp.float32) + proj_b
    x1 = xw.astype(jnp.float32) + attn

    h2 = ln(x1, ln2s, ln2b)
    a = jnp.dot(h2, fc11k.astype(dtype),
                preferred_element_type=jnp.float32) + fc11b
    a = a * 0.5 * (1.0 + jax.lax.erf(a * 0.7071067811865475))
    g = jnp.dot(h2, fc12k.astype(dtype),
                preferred_element_type=jnp.float32) + fc12b
    hid = (a * g).astype(dtype)
    mlp = jnp.dot(hid, fc2k.astype(dtype),
                  preferred_element_type=jnp.float32) + fc2b
    y = (x1 + mlp).astype(dtype)

    y = y.reshape(b, nd, nh_, nw_, wd, 8, 8, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_self6(meta, x, flat, rel, mask_pats):
    return _impl(meta, x, flat, rel, mask_pats)


def _fused_self6_fwd(meta, x, flat, rel, mask_pats):
    num_heads, shifted, interpret, _, wd = meta
    y = _impl((num_heads, shifted, interpret, True, wd), x, flat, rel,
              mask_pats)
    return y, (x, flat, rel, mask_pats)


def _fused_self6_bwd(meta, res, g):
    num_heads, shifted, _, _, wd = meta
    x, flat, rel, mask_pats = res
    widx = window_pattern_index6(x.shape[1], x.shape[2], x.shape[3], shifted,
                                 wd)
    _, vjp = jax.vjp(
        lambda xx, ff, rr, mm: _reference_self6(xx, ff, num_heads, rr, mm,
                                                widx, wd),
        x, flat, rel, mask_pats)
    return vjp(g.astype(x.dtype))


_fused_self6.defvjp(_fused_self6_fwd, _fused_self6_bwd)


def self6_block_pallas(x, flat, num_heads: int, rel, mask_pats,
                       shifted: bool, interpret: bool = False,
                       safe: bool = False, wd: int = 6):
    """Fused self-only + GEGLU block on (B, D, H, W, C), window (wd,8,8).

    x          already 3-D-rolled by the caller for shifted blocks
    flat       (qkv_kernel, qkv_bias, proj_kernel(C,C), proj_bias,
                ln1s, ln1b, ln2s, ln2b, fc11_k, fc11_b, fc12_k, fc12_b,
                fc2_k, fc2_b)
    rel        (nh, N, N) rel-pos bias (make_self6_rel), N = wd*64
    mask_pats  (8, N, N) shift patterns (tmsa_mask_patterns) or None
    wd         window depth: 6 (VRT stage groups/RTMSA head) or 1 (the
               per-frame (1,8,8) indep_reconsts tail, reference :1358)
    Requires D % wd == 0, H % 8 == 0, W % 8 == 0."""
    n_tok = wd * 64
    if mask_pats is None:
        mask_pats = np.zeros((1, n_tok, n_tok), np.float32)
    mask_pats = jnp.asarray(np.asarray(mask_pats, np.float32))
    meta = (num_heads, shifted, interpret, safe, wd)
    return _fused_self6(meta, x, flat, rel, mask_pats)
