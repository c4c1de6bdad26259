"""Fused RVRT STL block — Pallas TPU kernel for self-only (2,8,8) windows.

RVRT's swin transformer layers (reference network_rvrt.py:337-358, used by
`RSTBWithInputConv` at :658-707) are TMSA blocks with mut_attn=False and a
plain GELU MLP — mathematically the SwinIR block on 3-D windows. Two
geometries appear:

* window (1,8,8): per-frame 2-D windows → routed straight onto the SwinIR
  strip kernel (ops/pallas/swin_block.swin_block_pallas_2d) with the 3-D
  bias table/rel-index/mask — see models/vrt.TMSA._fused_stl.
* window (2,8,8): one window = 128 tokens spanning a frame pair → this
  module: one program per (batch, frame-pair, window-row) computes the
  whole block for all W/8 windows in VMEM, reusing the SwinIR block body
  (`_block_body`) with runtime shift-mask pattern selection like the TMSA
  kernel.

Differentiable via custom VJP (forward switches to the max-safe softmax
under differentiation, backward recomputes through a jnp reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kair_tpu.ops.pallas.swin_block import _block_body
from kair_tpu.ops.pallas.window_msa import (_HD_PAD, fold_ln_affine,
                                            pack_weights_fused)

N = 128


def make_stl2_bias(bias_table, rel_idx, num_heads: int, mask_patterns):
    """(P, nh, 128, 128) f32 score-bias patterns for (2,8,8) self attention:
    3-D rel-pos bias (+ shift-mask pattern). mask_patterns (P,128,128) or
    None (P=1)."""
    rel = jnp.asarray(bias_table)[np.asarray(rel_idx).reshape(-1)]
    rel = rel.reshape(N, N, num_heads).transpose(2, 0, 1).astype(jnp.float32)
    if mask_patterns is None:
        return rel[None]
    return rel[None] + jnp.asarray(mask_patterns)[:, None]


def _stl2_kernel(x_ref, *refs, num_heads: int, scale: float, n_win: int,
                 shifted: bool, nd: int, nh_: int, nw_blk: int, safe: bool,
                 affine_folded: bool = False):
    out_ref = refs[-1]
    g_w = n_win
    c = x_ref.shape[-1]
    w = x_ref.shape[3]
    x4 = x_ref[0].reshape(2, 8, g_w, 8, c).transpose(2, 0, 1, 3, 4)
    x0 = x4.reshape(g_w * N, c)
    if shifted:
        ild = jnp.where(pl.program_id(1) == nd - 1, 1, 0)
        ilh = jnp.where(pl.program_id(2) == nh_ - 1, 1, 0)
        # last window along w = last w-chunk AND last window in the chunk
        ilw_blk = pl.program_id(3) == nw_blk - 1
        idx_fn = lambda g: 4 * ild + 2 * ilh \
            + jnp.where(ilw_blk & (g == g_w - 1), 1, 0)
    else:
        idx_fn = lambda g: 0
    y = _block_body(x0, *refs[:-1], num_heads=num_heads, scale=scale,
                    g_blk=g_w, bias_mode="select", safe=safe,
                    bias_idx_fn=idx_fn, affine_folded=affine_folded)
    y4 = y.reshape(g_w, 2, 8, 8, c).transpose(1, 2, 0, 3, 4)
    out_ref[0] = y4.reshape(2, 8, w, c)


def _impl(meta, x, flat, bias_pats):
    num_heads, shifted, interpret, safe = meta
    (qkv_k, qkv_b, proj_k, proj_b,
     ln1s, ln1b, ln2s, ln2b, fc1k, fc1b, fc2k, fc2b) = flat
    b, d, h, w, c = x.shape
    assert d % 2 == 0 and h % 8 == 0 and w % 8 == 0
    hd = c // num_heads
    scale = hd ** -0.5
    nd, nh_, n_win = d // 2, h // 8, w // 8

    wqkv, bqkv, wp = pack_weights_fused(qkv_k, qkv_b, proj_k, num_heads,
                                        scale)
    fold_ln = not safe
    if fold_ln:
        wqkv, bqkv = fold_ln_affine(wqkv, bqkv, ln1s, ln1b)
        fc1k, fc1b = fold_ln_affine(fc1k, fc1b, ln2s, ln2b)
    wqkv, wp = wqkv.astype(x.dtype), wp.astype(x.dtype)

    # w-chunking against the 16 MB scoped-VMEM stack (single qkv set +
    # plain MLP — same budget as the GEGLU kernel)
    from kair_tpu.ops.pallas.self6_block import _token_budget
    tok_budget = _token_budget(c)
    g_blk = max(g for g in range(1, n_win + 1)
                if n_win % g == 0 and g * N <= tok_budget) \
        if N <= tok_budget else 1
    nw_blk = n_win // g_blk

    slab = pl.BlockSpec((1, 2, 8, g_blk * 8, c),
                        lambda i, j, k2, l: (i, j, k2, l, 0),
                        memory_space=pltpu.VMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _stl2_kernel, num_heads=num_heads, scale=scale, n_win=g_blk,
        shifted=shifted, nd=nd, nh_=nh_, nw_blk=nw_blk, safe=safe,
        affine_folded=fold_ln)
    bias_dtype = jnp.float32 if bias_pats.shape[0] == 1 else jnp.bfloat16
    return pl.pallas_call(
        kernel,
        grid=(b, nd, nh_, nw_blk),
        in_specs=[slab] + [vmem()] * 13,
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), x.dtype),
        interpret=interpret,
    )(x, wqkv, bqkv.astype(jnp.float32), wp, proj_b.astype(jnp.float32),
      bias_pats.astype(bias_dtype),
      ln1s.astype(jnp.float32), ln1b.astype(jnp.float32),
      ln2s.astype(jnp.float32), ln2b.astype(jnp.float32),
      fc1k.astype(x.dtype), fc1b.astype(jnp.float32),
      fc2k.astype(x.dtype), fc2b.astype(jnp.float32))


def _reference_stl2(x, flat, num_heads, bias_pats, widx):
    """jnp mirror (max-safe softmax) — the VJP recompute path. widx (nW,)
    numpy pattern index per window in partition order."""
    (qkv_k, qkv_b, proj_k, proj_b,
     ln1s, ln1b, ln2s, ln2b, fc1k, fc1b, fc2k, fc2b) = flat
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

    hn = ln(xw, ln1s, ln1b)
    y = jnp.einsum("bwnc,cd->bwnd", hn, qkv_k.astype(dtype),
                   preferred_element_type=jnp.float32)
    if qkv_b is not None:
        y = y + qkv_b
    y = y.astype(dtype).reshape(b, n_windows, N, 3, num_heads, hd)
    q = y[:, :, :, 0].transpose(0, 1, 3, 2, 4) * scale
    k = y[:, :, :, 1].transpose(0, 1, 3, 2, 4)
    v = y[:, :, :, 2].transpose(0, 1, 3, 2, 4)

    bias_w = jnp.take(bias_pats, jnp.asarray(widx), axis=0)
    s = jnp.einsum("bwhnd,bwhmd->bwhnm", q, k,
                   preferred_element_type=jnp.float32)
    s = s + bias_w[None].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
    o = jnp.einsum("bwhnm,bwhmd->bwhnd", p, v,
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 1, 3, 2, 4).reshape(b, n_windows, N, c).astype(dtype)

    attn = jnp.einsum("bwnd,dc->bwnc", o, proj_k.astype(dtype),
                      preferred_element_type=jnp.float32) + proj_b
    x1 = xw.astype(jnp.float32) + attn
    h2 = ln(x1, ln2s, ln2b)
    hid = jnp.dot(h2, fc1k.astype(dtype),
                  preferred_element_type=jnp.float32) + fc1b
    hid = (hid * 0.5 * (1.0 + jax.lax.erf(
        hid * 0.7071067811865475))).astype(dtype)
    mlp = jnp.dot(hid, fc2k.astype(dtype),
                  preferred_element_type=jnp.float32) + fc2b
    y = (x1 + mlp).astype(dtype)
    y = y.reshape(b, nd, nh_, nw_, 2, 8, 8, c)
    return y.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_stl2(meta, x, flat, bias_pats):
    return _impl(meta, x, flat, bias_pats)


def _fused_stl2_fwd(meta, x, flat, bias_pats):
    num_heads, shifted, interpret, _ = meta
    y = _impl((num_heads, shifted, interpret, True), x, flat, bias_pats)
    return y, (x, flat, bias_pats)


def _fused_stl2_bwd(meta, res, g):
    num_heads, shifted, _, _ = meta
    x, flat, bias_pats = res
    from kair_tpu.ops.pallas.tmsa_block import window_pattern_index
    widx = window_pattern_index(x.shape[1], x.shape[2], x.shape[3], shifted)
    _, vjp = jax.vjp(
        lambda xx, ff, bp: _reference_stl2(xx, ff, num_heads, bp, widx),
        x, flat, bias_pats)
    return vjp(g.astype(x.dtype))


_fused_stl2.defvjp(_fused_stl2_fwd, _fused_stl2_bwd)


def stl2_block_pallas(x, flat, num_heads: int, bias_pats, shifted: bool,
                      interpret: bool = False, safe: bool = False):
    """Fused self-only TMSA block on (B,D,H,W,C), window (2,8,8).

    x already 3-D-rolled by the caller for shifted blocks; flat =
    (qkv_kernel, qkv_bias, proj_kernel, proj_bias, ln1s, ln1b, ln2s, ln2b,
    fc1_kernel, fc1_bias, fc2_kernel, fc2_bias); bias_pats (P, nh, 128,
    128) from make_stl2_bias (P=8 shifted / 1 unshifted)."""
    meta = (num_heads, shifted, interpret, safe)
    return _fused_stl2(meta, x, flat, bias_pats)
