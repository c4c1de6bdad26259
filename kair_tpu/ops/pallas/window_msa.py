"""Pallas fused window multi-head self-attention (TPU).

Replaces the XLA einsum chain in kair_tpu.ops.window_attention.window_msa
(the SwinIR/VRT hot loop, reference network_swinir.py:105-145) with ONE
kernel per window-pair:

* two ws²=64-token windows are packed into a 128-row tile — the MXU's
  native M dimension — and attention over the pair is computed as a single
  (128,128) score matmul with a block-diagonal −1e9 mask (off-diagonal
  probabilities vanish in the softmax, so one (128,128)@(128,hd) PV matmul
  serves both windows);
* per-head q/k/v projections are taken by slicing the WEIGHTS host-side
  (static (nh, C, hd_pad) layout, hd padded to 32 lanes) instead of lane-
  slicing activations inside the kernel;
* relative-position bias and the shifted-window mask are folded into the
  score bias in VMEM — no HBM round-trips between qkv, scores, softmax,
  PV, and the output projection.

Numerics match the XLA path to ~1e-5 (see tests/test_pallas.py); softmax
runs in fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HD_PAD = 32
_NEG = -1e9


def _kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
            wp_ref, bp_ref, bias_ref, out_ref, *, num_heads: int,
            scale: float, pairs_per_block: int, bias_is_constant: bool):
    """G window pairs per program: x (G,128,C) → out (G,128,C)."""
    g_blk = pairs_per_block
    c = x_ref.shape[-1]
    x = x_ref[:].reshape(g_blk * 128, c)           # (G*128, C)
    dtype = x.dtype

    def head(h):
        # q/k drop back to dtype before the scores matmul — f32 operands
        # would run the MXU at fp32 rate (accumulation stays f32)
        q = ((jnp.dot(x, wq_ref[h], preferred_element_type=jnp.float32)
              + bq_ref[h]) * scale).astype(dtype)  # (G*128, 32)
        k = (jnp.dot(x, wk_ref[h], preferred_element_type=jnp.float32)
             + bk_ref[h]).astype(dtype)
        v = (jnp.dot(x, wv_ref[h], preferred_element_type=jnp.float32)
             + bv_ref[h]).astype(dtype)
        outs = []
        for g in range(g_blk):
            qg = q[g * 128:(g + 1) * 128]
            kg = k[g * 128:(g + 1) * 128]
            s = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (128, 128)
            bias = bias_ref[0, h] if bias_is_constant else bias_ref[g, h]
            s = s.astype(jnp.float32) + bias.astype(jnp.float32)
            # max-free softmax: bounded scores can't overflow f32 exp, and
            # the -1e9 pair mask maps to exp->0; saves 2 VPU passes
            e = jnp.exp(s)
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            outs.append(jnp.dot(p.astype(dtype), v[g * 128:(g + 1) * 128],
                                preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=0)            # (G*128, 32)

    acc = jnp.concatenate([head(h) for h in range(num_heads)],
                          axis=-1).astype(dtype)        # (G*128, nh*32)
    y = jnp.dot(acc, wp_ref[:], preferred_element_type=jnp.float32) + bp_ref[:]
    out_ref[:] = y.astype(dtype).reshape(g_blk, 128, c)


@functools.lru_cache(maxsize=16)
def _blockdiag_neg(n: int = 64) -> np.ndarray:
    m = np.full((2 * n, 2 * n), _NEG, np.float32)
    m[:n, :n] = 0.0
    m[n:, n:] = 0.0
    return m


def fold_ln_affine(kernel, bias, ln_scale, ln_bias):
    """Fold a LayerNorm affine into the matmul that consumes it (exact,
    f32 pack-time algebra — residuals bypass LN):
        (y·s + b) @ W + c  =  y @ (s[:,None]·W) + (b@W + c)
    Returns the folded (kernel, bias). Inference-only: the training
    backwards compute dln·/d· from the original parameterization, so every
    caller gates this on `not safe`."""
    f32 = jnp.float32
    k32 = kernel.astype(f32)
    return (ln_scale.astype(f32)[:, None] * k32,
            ln_bias.astype(f32) @ k32 + bias.astype(f32))


def pack_qkv_fused(qkv_kernel, qkv_bias, num_heads: int, scale: float,
                   rowsum_lane: bool = False):
    """Host-side relayout for the ONE-matmul qkv path: (C, 3C) →
    wqkv (C, nh*3*32) with per-head [q|k|v] 32-lane blocks, and
    bqkv (nh*96,). The attention scale is folded into the q columns
    (weights AND bias), removing a VPU pass in the kernel.

    One (T,C)@(C,576) matmul fills MXU lanes; the old per-head layout
    issued 18 matmuls with N=32 (25% output-lane utilization) — the
    dominant cost of the fused block measured on v5e.

    rowsum_lane (requires hd < 32): sets each head's FIRST PAD LANE of v
    to the constant 1 (zero weights + bias 1), so the PV matmul's column
    `hd` comes out as the softmax row-sum Σₖ e — the kernel reads the
    denominator there instead of issuing a separate ones-matmul per
    (pair, head) (measured 3.4 → 2.5-2.8 ms per fused-block call on v5e).
    The projection's pad rows are zero, so the extra lane never leaks."""
    c = qkv_kernel.shape[0]
    hd = c // num_heads
    assert not (rowsum_lane and hd >= _HD_PAD)
    wq, wk, wv = jnp.split(qkv_kernel, 3, axis=1)
    if qkv_bias is None:
        qkv_bias = jnp.zeros((3 * c,), qkv_kernel.dtype)
    bq, bk, bv = jnp.split(qkv_bias, 3)

    def heads_w(w):                           # (C, C) -> (nh, C, 32)
        w = w.reshape(c, num_heads, hd).transpose(1, 0, 2)
        return jnp.pad(w, ((0, 0), (0, 0), (0, _HD_PAD - hd)))

    def heads_b(b):                           # (C,) -> (nh, 32)
        return jnp.pad(b.reshape(num_heads, hd),
                       ((0, 0), (0, _HD_PAD - hd)))

    # interleave per head: [q_h | k_h | v_h] blocks of 32 lanes
    wqkv = jnp.stack([heads_w(wq) * scale, heads_w(wk), heads_w(wv)], axis=1)
    wqkv = wqkv.transpose(2, 0, 1, 3).reshape(c, num_heads * 3 * _HD_PAD)
    bv = heads_b(bv)
    if rowsum_lane:
        bv = bv.at[:, hd].set(1.0)
    bqkv = jnp.stack([heads_b(bq) * scale, heads_b(bk), bv],
                     axis=1).reshape(-1)
    return wqkv, bqkv


def pack_weights_fused(qkv_kernel, qkv_bias, proj_kernel, num_heads: int,
                       scale: float, rowsum_lane: bool = False):
    """pack_qkv_fused + the padded head-major projection rows."""
    c = qkv_kernel.shape[0]
    hd = c // num_heads
    wqkv, bqkv = pack_qkv_fused(qkv_kernel, qkv_bias, num_heads, scale,
                                rowsum_lane=rowsum_lane)
    wp = proj_kernel.reshape(num_heads, hd, c)
    wp = jnp.pad(wp, ((0, 0), (0, _HD_PAD - hd), (0, 0)))
    wp = wp.reshape(num_heads * _HD_PAD, c)
    return wqkv, bqkv, wp


def pack_weights(qkv_kernel, qkv_bias, proj_kernel, num_heads: int):
    """Host-side relayout: (C,3C) qkv → per-head padded (nh,C,32) blocks and
    (nh*32, C) projection with zero pad rows."""
    c = qkv_kernel.shape[0]
    hd = c // num_heads
    wq, wk, wv = jnp.split(qkv_kernel, 3, axis=1)          # (C, C) each

    def to_heads(w):
        w = w.reshape(c, num_heads, hd).transpose(1, 0, 2)  # (nh, C, hd)
        return jnp.pad(w, ((0, 0), (0, 0), (0, _HD_PAD - hd)))

    if qkv_bias is None:
        qkv_bias = jnp.zeros((3 * c,), qkv_kernel.dtype)
    bq, bk, bv = jnp.split(qkv_bias, 3)

    def to_head_bias(b):
        b = b.reshape(num_heads, hd)
        return jnp.pad(b, ((0, 0), (0, _HD_PAD - hd)))

    # proj: input rows follow concat([head0(32), head1(32), ...]) layout
    wp = proj_kernel.reshape(num_heads, hd, c)
    wp = jnp.pad(wp, ((0, 0), (0, _HD_PAD - hd), (0, 0)))
    wp = wp.reshape(num_heads * _HD_PAD, c)

    return (to_heads(wq), to_heads(wk), to_heads(wv),
            to_head_bias(bq), to_head_bias(bk), to_head_bias(bv), wp)


def make_pair_bias(bias_table, rel_index, num_heads: int,
                   mask: Optional[jnp.ndarray], n_pairs_per_batch: int,
                   n_pad: Optional[int] = None):
    """(n_pairs, nh, 128, 128) f32 score bias: rel-pos bias on the diagonal
    64-blocks (+ per-window shift mask), −1e9 off-diagonal.

    n_pad: pad each window's token count n → n_pad (ws=7 windows of 49
    tokens ride the 64-token kernels this way): padded KEY columns get −1e9
    (their probabilities vanish exactly under exp), padded QUERY rows get 0
    bias over the real keys — their outputs are finite garbage the caller
    slices off."""
    n = rel_index.shape[0]
    # jnp-convert the table first: numpy fancy-indexing by a traced index
    # fails under jit (rel_index may be numpy or traced)
    rel = jnp.asarray(bias_table)[rel_index.reshape(-1)].reshape(
        n, n, num_heads)
    rel = rel.transpose(2, 0, 1).astype(jnp.float32)        # (nh, 64, 64)
    if mask is None:
        per_win = jnp.broadcast_to(rel[None], (2 * n_pairs_per_batch, num_heads, n, n))
    else:
        per_win = rel[None] + mask[:, None].astype(jnp.float32)
    if n_pad is not None and n_pad > n:
        per_win = jnp.pad(per_win, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        per_win = jnp.pad(per_win, ((0, 0), (0, 0), (0, 0), (0, n_pad - n)),
                          constant_values=_NEG)
    w0 = per_win[0::2]                                       # (n_pairs, nh, n, n)
    w1 = per_win[1::2]
    top = jnp.concatenate([w0, jnp.full_like(w0, _NEG)], axis=-1)
    bot = jnp.concatenate([jnp.full_like(w1, _NEG), w1], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def window_msa_pallas(xw, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                      bias_table, rel_index, num_heads: int,
                      mask=None, interpret: bool = False):
    """Drop-in for window_attention.window_msa (same signature).

    xw (B, nW, N, C) with N = ws²; nW must be even (guaranteed for
    H, W multiples of window size with ≥2 windows)."""
    b, nw, n, c = xw.shape
    if nw % 2 != 0 or n % 64 != 0 or n != 64:
        # fall back to the XLA path for odd geometries
        from kair_tpu.ops.window_attention import window_msa
        return window_msa(xw, qkv_kernel, qkv_bias, proj_kernel, proj_bias,
                          bias_table, rel_index, num_heads, mask,
                          use_pallas=False)

    hd = c // num_heads
    scale = hd ** -0.5
    n_pairs = nw // 2

    # pairs per program: amortise per-program overheads; must divide n_pairs
    g_blk = 1
    for cand in (8, 4, 2):
        if n_pairs % cand == 0:
            g_blk = cand
            break

    wq, wk, wv, bq, bk, bv, wp = pack_weights(qkv_kernel, qkv_bias,
                                              proj_kernel, num_heads)
    # matmul operands in the input dtype (bf16 inference → full MXU rate;
    # f32 tests stay exact); biases stay f32 — VPU adds
    wq, wk, wv, wp = (w.astype(xw.dtype) for w in (wq, wk, wv, wp))
    pair_bias = make_pair_bias(bias_table, rel_index, num_heads, mask,
                               n_pairs).astype(jnp.bfloat16)
    bias_is_constant = mask is None
    if bias_is_constant:
        pair_bias = pair_bias[:1]                  # identical for every pair

    x_pairs = xw.reshape(b * n_pairs, 2 * n, c)

    grid = (b * n_pairs // g_blk,)
    kernel = functools.partial(_kernel, num_heads=num_heads, scale=scale,
                               pairs_per_block=g_blk,
                               bias_is_constant=bias_is_constant)

    if bias_is_constant:
        bias_spec = pl.BlockSpec((1, num_heads, 2 * n, 2 * n),
                                 lambda i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        n_bias_blocks = n_pairs // g_blk
        bias_spec = pl.BlockSpec((g_blk, num_heads, 2 * n, 2 * n),
                                 lambda i: (jax.lax.rem(i, n_bias_blocks), 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g_blk, 2 * n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bk
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bp
            bias_spec,
        ],
        out_specs=pl.BlockSpec((g_blk, 2 * n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_pairs, 2 * n, c), xw.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * n_pairs * (2 * 128 * c * 3 * num_heads * _HD_PAD +
                                 num_heads * 4 * 128 * 128 * _HD_PAD +
                                 2 * 128 * num_heads * _HD_PAD * c),
            bytes_accessed=b * n_pairs * 128 * c * 4 * 2,
            transcendentals=b * n_pairs * num_heads * 128 * 128,
        ),
    )(x_pairs, wq, wk, wv, bq, bk, bv, wp,
      proj_bias.astype(jnp.float32), pair_bias)

    return out.reshape(b, nw, n, c)
