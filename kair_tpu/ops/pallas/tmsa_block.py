"""Fully-fused VRT TMSA block — Pallas TPU kernel for (2, 8, 8) windows.

One program per (batch, frame-pair, window-row) computes the ENTIRE TMSA
block (reference network_vrt.py:728-850) for all W/8 windows of the strip
in VMEM:

    h   = LayerNorm1(x)
    s   = self-MSA(h)                 3-D rel-pos bias (+ shift mask)
    m   = mutual-MSA(h + sine_pos)    each frame's queries attend the OTHER
                                      frame's keys/values (the anti-diagonal
                                      64-blocks of the full 128x128 scores;
                                      output halves swap back)
    x   = x + proj([m | s])           proj: (2C, C)
    x   = x + fc2(gelu(fc11(LN2(x))) * fc12(LN2(x)))   (GEGLU)

A (2,8,8) window is 128 tokens — exactly one MXU M-tile — so self and
mutual attention are one (128,128) score matmul each per head. vs the XLA
path this removes the LayerNorm/attention/MLP HBM round-trips per block
(the measured bottleneck at ~170 GB/s effective stream bandwidth).

Shifted blocks: the caller applies the 3-D roll; the mask has at most 8
distinct per-window patterns (interior/boundary along each axis), kept
VMEM-resident and selected per window from the program position.

Differentiable: the op carries a custom VJP — the forward under
differentiation runs the Pallas kernel with the max-safe softmax
(training logits are unbounded), and the backward recomputes through a
jnp reference (`_reference_tmsa`, remat memory profile) exactly like
ops/pallas/swin_block.py. Numerics vs the XLA TMSA are asserted in
tests/test_pallas_tmsa.py (interpret mode), gradients likewise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kair_tpu.ops.pallas.swin_block import _gelu_fast
from kair_tpu.ops.pallas.window_msa import (_HD_PAD, _NEG, fold_ln_affine,
                                            pack_qkv_fused)

N = 128          # tokens per (2,8,8) window
HALF = 64


def pack_proj2(proj_kernel, num_heads: int):
    """VRT proj (2C, C): rows are [mut channels (C) | self channels (C)],
    each head-major — pad each head's hd rows to 32 → (2*nh*32, C)."""
    c2, c = proj_kernel.shape
    hd = c2 // 2 // num_heads

    def part(rows):
        w = rows.reshape(num_heads, hd, c)
        w = jnp.pad(w, ((0, 0), (0, _HD_PAD - hd), (0, 0)))
        return w.reshape(num_heads * _HD_PAD, c)

    return jnp.concatenate([part(proj_kernel[:c2 // 2]),
                            part(proj_kernel[c2 // 2:])], axis=0)


def make_tmsa_biases(bias_table, rel_idx, num_heads: int,
                     mask_patterns: Optional[np.ndarray]):
    """Self/mutual score-bias pattern stacks (P, nh, 128, 128) f32.

    mask_patterns: (P, 128, 128) shift masks (None → P=1, no mask).
    Self bias = 3-D rel-pos bias (+ mask). Mutual bias = −1e9 on the
    diagonal frame-blocks, top-left 64x64 mask quadrant on the
    anti-diagonal blocks (reference hmask, network_vrt.py:652-656)."""
    rel = jnp.asarray(bias_table)[np.asarray(rel_idx).reshape(-1)]
    rel = rel.reshape(N, N, num_heads).transpose(2, 0, 1).astype(jnp.float32)
    if mask_patterns is None:
        mask_patterns = np.zeros((1, N, N), np.float32)
    p = mask_patterns.shape[0]
    bias_self = rel[None] + jnp.asarray(mask_patterns)[:, None]

    mut = np.full((N, N), _NEG, np.float32)
    mut[:HALF, HALF:] = 0.0
    mut[HALF:, :HALF] = 0.0
    hmask = mask_patterns[:, :HALF, :HALF]
    mut_m = np.broadcast_to(mut, (p, N, N)).copy()
    mut_m[:, :HALF, HALF:] += hmask
    mut_m[:, HALF:, :HALF] += hmask
    bias_mut = jnp.broadcast_to(jnp.asarray(mut_m)[:, None],
                                (p, num_heads, N, N))
    return bias_self, jnp.asarray(bias_mut)


def _attend(qkv, bias, g, h, dtype, safe: bool = False, rs_lane=None):
    """One (128,128) attention for window g, head h on packed qkv."""
    base = h * 3 * _HD_PAD
    q = qkv[:, base:base + _HD_PAD]
    k = qkv[:, base + _HD_PAD:base + 2 * _HD_PAD]
    v = qkv[:, base + 2 * _HD_PAD:base + 3 * _HD_PAD]
    qg = q[g * N:(g + 1) * N]
    kg = k[g * N:(g + 1) * N]
    s = jax.lax.dot_general(qg, kg, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias
    if safe:
        # training path: logits are unbounded mid-training — pay the
        # row-max pass (inference through released checkpoints keeps the
        # max-free softmax: bounded scores can't overflow f32 exp)
        s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    # VPU-lean softmax (see swin_block._block_body): 1/sum folded onto the
    # (128,32) PV output rows; with rs_lane, v's first pad lane is the
    # constant 1 (pack_qkv_fused rowsum_lane) so PV column rs_lane IS the
    # row sum — no separate ones-matmul per (window, head)
    eb = e.astype(dtype)
    o = jnp.dot(eb, v[g * N:(g + 1) * N],
                preferred_element_type=jnp.float32)
    if rs_lane is not None:
        rs = o[:, rs_lane:rs_lane + 1]
    else:
        rs = jnp.dot(eb, jnp.ones((N, 8), dtype),
                     preferred_element_type=jnp.float32)[:, :1]
    return o * (1.0 / rs)


def _kernel(x_ref, wqkv_s_ref, bqkv_s_ref, wqkv_m_ref, bqkv_m_ref,
            pos_ref, wp_ref, bp_ref, bias_self_ref, bias_mut_ref,
            ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
            fc11w_ref, fc11b_ref, fc12w_ref, fc12b_ref,
            fc2w_ref, fc2b_ref, out_ref, *,
            num_heads: int, n_win: int, shifted: bool,
            nd: int, nh_: int, nw_blk: int = 1, safe: bool = False,
            ln2_folded: bool = False,
            rs_lane=None):
    g_w = n_win
    c = x_ref.shape[-1]
    w = x_ref.shape[3]
    # (2, 8, W, C) → (G windows, 2, 8, 8, C) → token-major (G*128, C)
    x4 = x_ref[0].reshape(2, 8, g_w, 8, c).transpose(2, 0, 1, 3, 4)
    x0 = x4.reshape(g_w * N, c)
    dtype = x0.dtype

    def layernorm(v, s_ref, b_ref, folded=False):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
        y = (vf - mu) * jax.lax.rsqrt(var + 1e-5)
        if folded:
            # inference: LN2 affine lives in the packed fc11/fc12 weights
            # (LN1 can't fold — the mutual path adds pos AFTER the affine)
            return y.astype(dtype)
        return (y * s_ref[:] + b_ref[:]).astype(dtype)

    h = layernorm(x0, ln1s_ref, ln1b_ref)
    qkv_s = (jnp.dot(h, wqkv_s_ref[:], preferred_element_type=jnp.float32)
             + bqkv_s_ref[:]).astype(dtype)
    hm = (h.reshape(g_w, N, c) + pos_ref[:]).reshape(g_w * N, c).astype(dtype)
    qkv_m = (jnp.dot(hm, wqkv_m_ref[:], preferred_element_type=jnp.float32)
             + bqkv_m_ref[:]).astype(dtype)

    if shifted:
        # pattern = 4*is_last_d + 2*is_last_h + is_last_w (runtime from the
        # program position; patterns are VMEM-resident)
        ild = jnp.where(pl.program_id(1) == nd - 1, 1, 0)
        ilh = jnp.where(pl.program_id(2) == nh_ - 1, 1, 0)
        # last window along w = last w-chunk AND last window in the chunk
        ilw_blk = pl.program_id(3) == nw_blk - 1

    mut_cols, self_cols = [], []
    for hd_i in range(num_heads):
        m_list, s_list = [], []
        for g in range(g_w):
            if shifted:
                idx = 4 * ild + 2 * ilh \
                    + jnp.where(ilw_blk & (g == g_w - 1), 1, 0)
                bs = bias_self_ref[idx, hd_i]
                bm = bias_mut_ref[idx, hd_i]
            else:
                bs = bias_self_ref[0, hd_i]
                bm = bias_mut_ref[0, hd_i]
            s_list.append(_attend(qkv_s, bs.astype(jnp.float32), g, hd_i,
                                  dtype, safe, rs_lane))
            om = _attend(qkv_m, bm.astype(jnp.float32), g, hd_i, dtype, safe,
                         rs_lane)
            # anti-diagonal attention: output halves swap back so token t
            # of frame 1 carries frame-2→frame-1 alignment and vice versa
            m_list.append(jnp.concatenate([om[HALF:], om[:HALF]], axis=0))
        mut_cols.append(jnp.concatenate(m_list, axis=0))
        self_cols.append(jnp.concatenate(s_list, axis=0))

    acc = jnp.concatenate(mut_cols + self_cols, axis=-1).astype(dtype)
    attn = jnp.dot(acc, wp_ref[:], preferred_element_type=jnp.float32) \
        + bp_ref[:]
    x1 = x0.astype(jnp.float32) + attn

    h2 = layernorm(x1, ln2s_ref, ln2b_ref, folded=ln2_folded)
    a = jnp.dot(h2, fc11w_ref[:], preferred_element_type=jnp.float32) \
        + fc11b_ref[:]
    a = _gelu_fast(a)
    gte = jnp.dot(h2, fc12w_ref[:], preferred_element_type=jnp.float32) \
        + fc12b_ref[:]
    hid = (a * gte).astype(dtype)
    mlp = jnp.dot(hid, fc2w_ref[:], preferred_element_type=jnp.float32) \
        + fc2b_ref[:]
    y = (x1 + mlp).astype(dtype)

    y4 = y.reshape(g_w, 2, 8, 8, c).transpose(1, 2, 0, 3, 4)
    out_ref[0] = y4.reshape(2, 8, w, c)


def _impl(meta, x, flat, pos, bias_self, bias_mut):
    num_heads, shifted, interpret, safe = meta
    (qkv_s_k, qkv_s_b, qkv_m_k, qkv_m_b, proj_k, proj_b,
     ln1s, ln1b, ln2s, ln2b, fc11k, fc11b, fc12k, fc12b, fc2k, fc2b) = flat
    b, d, h, w, c = x.shape
    assert d % 2 == 0 and h % 8 == 0 and w % 8 == 0
    hd = c // num_heads
    scale = hd ** -0.5
    nd, nh_, n_win = d // 2, h // 8, w // 8

    rs_lane = hd if hd < _HD_PAD else None
    wqkv_s, bqkv_s = pack_qkv_fused(qkv_s_k, qkv_s_b, num_heads, scale,
                                    rowsum_lane=rs_lane is not None)
    wqkv_m, bqkv_m = pack_qkv_fused(qkv_m_k, qkv_m_b, num_heads, scale,
                                    rowsum_lane=rs_lane is not None)
    wp = pack_proj2(proj_k, num_heads)
    fold_ln2 = not safe
    if fold_ln2:
        # LN2 only — the mutual qkv input adds pos AFTER the LN1 affine
        fc11k, fc11b = fold_ln_affine(fc11k, fc11b, ln2s, ln2b)
        fc12k, fc12b = fold_ln_affine(fc12k, fc12b, ln2s, ln2b)
    wqkv_s, wqkv_m, wp = (t.astype(x.dtype) for t in (wqkv_s, wqkv_m, wp))

    # w-chunking against the 16 MB scoped-VMEM stack (see
    # self6_block._token_budget; this kernel holds TWO qkv sets so the
    # budget is tighter). Largest divisor of n_win under budget.
    tok_budget = 1024 if c <= 128 else 768
    g_blk = max(g for g in range(1, n_win + 1)
                if n_win % g == 0 and g * N <= tok_budget) \
        if N <= tok_budget else 1
    nw_blk = n_win // g_blk

    slab = pl.BlockSpec(
        (1, 2, 8, g_blk * 8, c),
        lambda i, j, k2, l: (i, j, k2, l, 0),
        memory_space=pltpu.VMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, n_win=g_blk, shifted=shifted,
        nd=nd, nh_=nh_, nw_blk=nw_blk, safe=safe, rs_lane=rs_lane,
        ln2_folded=fold_ln2)
    bias_dtype = jnp.float32 if bias_self.shape[0] == 1 else jnp.bfloat16
    return pl.pallas_call(
        kernel,
        grid=(b, nd, nh_, nw_blk),
        in_specs=[slab] + [vmem()] * 19,
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), x.dtype),
        interpret=interpret,
    )(x, wqkv_s, bqkv_s.astype(jnp.float32), wqkv_m,
      bqkv_m.astype(jnp.float32), pos.astype(x.dtype), wp,
      proj_b.astype(jnp.float32),
      bias_self.astype(bias_dtype), bias_mut.astype(bias_dtype),
      ln1s.astype(jnp.float32), ln1b.astype(jnp.float32),
      ln2s.astype(jnp.float32), ln2b.astype(jnp.float32),
      fc11k.astype(x.dtype), fc11b.astype(jnp.float32),
      fc12k.astype(x.dtype), fc12b.astype(jnp.float32),
      fc2k.astype(x.dtype), fc2b.astype(jnp.float32))


def window_pattern_index(d: int, h: int, w: int, shifted: bool) -> np.ndarray:
    """(nW,) int index of each (2,8,8) window's shift-mask pattern in
    partition order — 4·is_last_d + 2·is_last_h + is_last_w (matches the
    kernel's program-position selection; 0 everywhere when unshifted)."""
    nd, nh_, nw = d // 2, h // 8, w // 8
    if not shifted:
        return np.zeros(nd * nh_ * nw, np.int32)
    di = (np.arange(nd) == nd - 1).astype(np.int32) * 4
    hi = (np.arange(nh_) == nh_ - 1).astype(np.int32) * 2
    wi = (np.arange(nw) == nw - 1).astype(np.int32)
    return (di[:, None, None] + hi[None, :, None]
            + wi[None, None, :]).reshape(-1)


def _reference_tmsa(x, flat, pos, num_heads, bias_self, bias_mut, widx):
    """jnp mirror of the fused TMSA kernel on (B,D,H,W,C) — the
    differentiable recompute path for the custom VJP (max-safe softmax,
    matching the safe forward). widx (nW,) numpy selects each window's
    bias pattern."""
    (qkv_s_k, qkv_s_b, qkv_m_k, qkv_m_b, proj_k, proj_b,
     ln1s, ln1b, ln2s, ln2b, fc11k, fc11b, fc12k, fc12b, fc2k, fc2b) = flat
    b, d, h, w, c = x.shape
    nd, nh_, nw_ = d // 2, h // 8, w // 8
    n_windows = nd * nh_ * nw_
    hd = c // num_heads
    scale = hd ** -0.5
    dtype = x.dtype

    xw = x.reshape(b, nd, 2, nh_, 8, nw_, 8, c)
    xw = xw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, n_windows, N, c)

    def ln(v, s, bb):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean((vf - mu) ** 2, axis=-1, keepdims=True)
        return (((vf - mu) * jax.lax.rsqrt(var + 1e-5)) * s + bb).astype(dtype)

    def qkv_heads(inp, kern, bias):
        y = jnp.einsum("bwnc,cd->bwnd", inp, kern.astype(dtype),
                       preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias
        y = y.astype(dtype).reshape(b, n_windows, N, 3, num_heads, hd)
        return (y[:, :, :, 0].transpose(0, 1, 3, 2, 4),
                y[:, :, :, 1].transpose(0, 1, 3, 2, 4),
                y[:, :, :, 2].transpose(0, 1, 3, 2, 4))

    def mha(q, k, v, bias_w):
        # bias_w (nW, nh, N, N) f32; safe softmax (the training forward)
        s = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                       preferred_element_type=jnp.float32)
        s = s + bias_w[None].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        return jnp.einsum("bwhnm,bwhmd->bwhnd", p, v,
                          preferred_element_type=jnp.float32)

    hn = ln(xw, ln1s, ln1b)
    wsel = jnp.asarray(widx)
    bs = jnp.take(bias_self, wsel, axis=0)
    bm = jnp.take(bias_mut, wsel, axis=0)

    q, k, v = qkv_heads(hn, qkv_s_k, qkv_s_b)
    os_ = mha(q * scale, k, v, bs)                       # (b,nW,nh,N,hd) f32
    os_ = os_.transpose(0, 1, 3, 2, 4).reshape(b, n_windows, N, c)

    hm = hn + pos[None, None].astype(dtype)
    q, k, v = qkv_heads(hm, qkv_m_k, qkv_m_b)
    om = mha(q * scale, k, v, bm)
    om = jnp.concatenate([om[:, :, :, HALF:], om[:, :, :, :HALF]], axis=3)
    om = om.transpose(0, 1, 3, 2, 4).reshape(b, n_windows, N, c)

    acc = jnp.concatenate([om, os_], axis=-1).astype(dtype)
    attn = jnp.einsum("bwnd,dc->bwnc", acc, proj_k.astype(dtype),
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

    y = y.reshape(b, nd, nh_, nw_, 2, 8, 8, c)
    y = y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_tmsa(meta, x, flat, pos, bias_self, bias_mut):
    """meta = (num_heads, shifted, interpret, safe). Forward = Pallas
    kernel; under differentiation the forward switches to the max-safe
    softmax and the backward recomputes through `_reference_tmsa`
    (remat profile — only the block input is saved)."""
    return _impl(meta, x, flat, pos, bias_self, bias_mut)


def _fused_tmsa_fwd(meta, x, flat, pos, bias_self, bias_mut):
    num_heads, shifted, interpret, _ = meta
    safe_meta = (num_heads, shifted, interpret, True)
    y = _impl(safe_meta, x, flat, pos, bias_self, bias_mut)
    return y, (x, flat, pos, bias_self, bias_mut)


def _fused_tmsa_bwd(meta, res, g):
    num_heads, shifted, _, _ = meta
    x, flat, pos, bias_self, bias_mut = res
    widx = window_pattern_index(x.shape[1], x.shape[2], x.shape[3], shifted)
    _, vjp = jax.vjp(
        lambda xx, ff, pp, bs, bm: _reference_tmsa(
            xx, ff, pp, num_heads, bs, bm, widx),
        x, flat, pos, bias_self, bias_mut)
    return vjp(g.astype(x.dtype))


_fused_tmsa.defvjp(_fused_tmsa_fwd, _fused_tmsa_bwd)


def tmsa_block_pallas(x, flat, pos, num_heads: int,
                      bias_self, bias_mut, shifted: bool,
                      interpret: bool = False, safe: bool = False):
    """Fused TMSA block on (B, D, H, W, C), window (2, 8, 8).

    x        already 3-D-rolled by the caller for shifted blocks
    flat     (qkv_self_kernel, qkv_self_bias, qkv_mut_kernel, qkv_mut_bias,
              proj_kernel(2C,C), proj_bias, ln1s, ln1b, ln2s, ln2b,
              fc11_k, fc11_b, fc12_k, fc12_b, fc2_k, fc2_b)
    pos      (128, C) sine position encoding (2-frame tile)
    bias_*   (P, nh, 128, 128) pattern stacks from make_tmsa_biases
    Requires D % 2 == 0, H % 8 == 0, W % 8 == 0.

    Differentiable: under jax.grad the forward runs max-safe and the
    backward recomputes through the jnp reference."""
    meta = (num_heads, shifted, interpret, safe)
    return _fused_tmsa(meta, x, flat, pos, bias_self, bias_mut)


def tmsa_mask_patterns(dp, hp, wp_, ws, ss) -> np.ndarray:
    """(8, 128, 128) shift-mask patterns indexed 4*is_last_d + 2*is_last_h
    + is_last_w, sampled from the full window-mask grid (only boundary
    windows carry non-zero masks, so 8 corner samples cover every
    window)."""
    from kair_tpu.models.vrt import compute_mask_3d

    m = np.asarray(compute_mask_3d(dp, hp, wp_, ws, ss))
    ndw, nhw, nww = dp // ws[0], hp // ws[1], wp_ // ws[2]
    m = m.reshape(ndw, nhw, nww, m.shape[-2], m.shape[-1])
    pats = np.zeros((8,) + m.shape[3:], np.float32)
    for ild in (0, 1):
        for ilh in (0, 1):
            for ilw in (0, 1):
                pats[4 * ild + 2 * ilh + ilw] = m[
                    (ndw - 1) if ild else 0,
                    (nhw - 1) if ilh else 0,
                    (nww - 1) if ilw else 0]
    return pats


def tmsa_flat_params(p):
    """TMSA param subtree (norm1, attn.*, norm2, mlp.*) → the flat tuple
    tmsa_block_pallas consumes."""
    a = p["attn"]
    return (a["qkv_self_kernel"], a.get("qkv_self_bias"),
            a["qkv_mut_kernel"], a.get("qkv_mut_bias"),
            a["proj_kernel"], a["proj_bias"],
            p["norm1"]["scale"], p["norm1"]["bias"],
            p["norm2"]["scale"], p["norm2"]["bias"],
            p["mlp"]["fc11"]["kernel"], p["mlp"]["fc11"]["bias"],
            p["mlp"]["fc12"]["kernel"], p["mlp"]["fc12"]["bias"],
            p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"])
