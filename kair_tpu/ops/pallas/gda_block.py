"""Fused guided-deformable-attention Pallas kernel: sample + attend in one
VMEM pass.

The composed path (ops/deform_attn.py) materializes the (B,H,W,S,C) sampled
key/value tensors in HBM between the bilinear-sampling stage and the
per-pixel attention — the kernel analog of what the reference's CUDA
orchestration does in two launches (deform_attn_cuda_pt110.cpp:64-120:
im2col sampling buffer, then batched GEMM + softmax). This kernel does the
whole thing per (batch·group, row-tile) program:

  for s = (clip n, tap t) in S:                      # S = clip·kh·kw
      samp_s = Ry_s @ slab_n * Cx_s @ P              # 2-hot MXU sampling
                                                     # (see bilin_mm.py)
      score  = rowsum(q ⊙ samp_s[:, :cg]) · scale    # this group IS the
                                                     # head: heads == dg
      online-softmax accumulate (flash-attention style running max /
      denominator / value accumulator — no (rt, S) score buffer, no
      sampled K/V ever leaves VMEM)

Requires heads == deformable_groups and C % heads == 0 (true of every
released RVRT config: attention_heads = deformable_groups = 12,
network_rvrt.py:786-789) so each head attends over exactly the channels
its group sampled. The wrapper falls back to the composed path otherwise.

Backward: exact gradients via jax.vjp of the composed gather-path
implementation (same math, rematerialized) — the fused kernel is the
inference/serving fast path; training keeps the composed path's
(already scatter-free, when impl='mxu') backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from kair_tpu.ops.pallas.bilin_mm import (MXU_MAX_HW, _fold_matrix, _pad_cs,
                                          hat_weights, max_lanes_for_rt,
                                          mxu_precision)


def _gda_kernel(coords_ref, slab_ref, q_ref, p_ref, out_ref, *, h: int,
                w: int, csp: int, cg: int, clip: int, K: int, tg: int):
    """Tap-grouped body: `tg` taps of one clip are stacked along the
    sublane (row) dim and sampled with ONE matmul pair per group instead
    of one pair per tap — 18 small matmuls/program (r5 trace: ~48% MXU,
    14.6 ms/call at RVRT shapes) become ceil(K/tg)·clip larger ones. The
    sample matmul emits the compute dtype directly (the MXU accumulates
    f32 either way; this skips the old f32 materialize+cast pass over
    the (rt, csp·w) intermediate)."""
    rt = q_ref.shape[1]
    dt = slab_ref.dtype
    f32 = jnp.float32
    prec = mxu_precision(dt)

    q = q_ref[0].astype(f32)                      # (rt, cg), pre-scaled
    ihf = jax.lax.broadcasted_iota(jnp.int32, (rt, h), 1).astype(f32)
    iwf = jax.lax.broadcasted_iota(jnp.int32, (rt, w), 1).astype(f32)

    m_run = jnp.full((rt, 1), -jnp.inf, f32)
    l_run = jnp.zeros((rt, 1), f32)
    acc = jnp.zeros((rt, cg), f32)

    cds = coords_ref[0]                           # (rt, S*2)
    for n in range(clip):
        slab_n = slab_ref[0, n]                   # (h, csp*w)
        for t0 in range(0, K, tg):
            ts = range(t0, min(t0 + tg, K))
            rys, cxs = [], []
            for t_ in ts:
                s = n * K + t_
                fy = cds[:, 2 * s: 2 * s + 1]
                fx = cds[:, 2 * s + 1: 2 * s + 2]
                # hat-function 2-hot weights (see bilin_mm.hat_weights:
                # the compare-mask form is un-lowerable in Mosaic)
                rys.append(hat_weights(ihf, fy).astype(dt))
                cxs.append(jnp.tile(hat_weights(iwf, fx).astype(dt),
                                    (1, csp)))
            ry_g = jnp.concatenate(rys, axis=0) if len(rys) > 1 else rys[0]
            cx_g = jnp.concatenate(cxs, axis=0) if len(cxs) > 1 else cxs[0]
            a = jnp.dot(ry_g, slab_n, preferred_element_type=dt,
                        precision=prec)           # (|ts|·rt, csp·w)
            m = a * cx_g
            samp = jnp.dot(m, p_ref[:], preferred_element_type=f32,
                           precision=prec)        # (|ts|·rt, csp) f32
            for i, _ in enumerate(ts):
                k_s = samp[i * rt:(i + 1) * rt, :cg]
                v_s = samp[i * rt:(i + 1) * rt, cg: 2 * cg]
                score = jnp.sum(q * k_s, axis=1, keepdims=True)  # (rt, 1)
                m_new = jnp.maximum(m_run, score)
                alpha = jnp.exp(m_run - m_new)
                beta = jnp.exp(score - m_new)
                l_run = l_run * alpha + beta
                acc = acc * alpha + beta * v_s
                m_run = m_new

    out = acc / jnp.maximum(l_run, 1e-30)
    out_ref[0] = out.astype(out_ref.dtype)


# VMEM budget for one tap-group's live intermediates (a, m, cx_g — each
# |ts|·rt × csp·w in the compute dtype): sized so the group triple stays
# well under the ~16 MB scoped-VMEM stack next to the slab block and the
# pipeline's double buffers.
_GDA_GROUP_BYTES = 8 << 20


def _pick_tg(K: int, rt: int, lanes: int, itemsize: int) -> int:
    per_tap = 3 * rt * lanes * itemsize
    return max(1, min(K, _GDA_GROUP_BYTES // per_tap))


def gda_supported(c: int, heads: int, dg: int, h: int, w: int, clip: int,
                  K: int, rt: int = 256) -> bool:
    """Shape gate: head/group channel alignment + the bilin_mm VMEM limits
    + S*2 coordinate lanes must stay a reasonable block."""
    if heads != dg or c % heads or (c // dg) != (c // heads):
        return False
    cs = 2 * (c // dg)
    lanes = _pad_cs(cs, w) * w
    return h * w <= MXU_MAX_HW and lanes <= max_lanes_for_rt(rt)


def _fused_fwd_impl(q, k_feat, v_feat, offset, kernel, heads, dg, rt,
                    interpret, tg=0):
    b, h, w, c = q.shape
    clip = k_feat.shape[1]
    kh, kw = kernel
    K = kh * kw
    S = clip * K
    cg = c // dg
    cs = 2 * cg
    scale = (c // heads) ** -0.5
    pad = kh // 2
    csp = _pad_cs(cs, w)
    r = h * w
    rp = -(-r // rt) * rt
    G = b * dg
    dt = q.dtype

    # ---- coordinates: (G, R, S*2), s-major interleaved (fy, fx) ---------
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ky = (jnp.arange(K) // kw - pad).astype(jnp.float32)
    kx = (jnp.arange(K) % kw - pad).astype(jnp.float32)
    off = offset.reshape(b, clip, h, w, dg, K, 2).astype(jnp.float32)
    off = off.transpose(0, 4, 2, 3, 1, 5, 6)      # (b, g, h, w, n, K, 2)
    fy = gy[None, None, :, :, None, None] + ky[None, None, None, None, None] \
        + off[..., 0]                              # (b, g, h, w, n, K)
    fx = gx[None, None, :, :, None, None] + kx[None, None, None, None, None] \
        + off[..., 1]
    coords = jnp.stack([fy, fx], axis=-1)          # (b, g, h, w, n, K, 2)
    coords = coords.reshape(G, r, S * 2)
    if rp != r:
        coords = jnp.pad(coords, ((0, 0), (0, rp - r), (0, 0)),
                         constant_values=-2.0)

    # ---- KV slab: (G, clip, h, csp*w), lanes c-major [c*w + x] ----------
    kf = k_feat.reshape(b, clip, h, w, dg, cg)
    vf = v_feat.reshape(b, clip, h, w, dg, cg)
    both = jnp.concatenate([kf, vf], axis=-1)      # (b, clip, h, w, g, cs)
    if csp != cs:
        both = jnp.pad(both, ((0, 0),) * 5 + ((0, csp - cs),))
    slab = both.transpose(0, 4, 1, 2, 5, 3).reshape(G, clip, h, csp * w)

    # ---- q per group (== head): (G, R, cg), pre-scaled ------------------
    qg = (q * scale).reshape(b, h, w, dg, cg).transpose(0, 3, 1, 2, 4)
    qg = qg.reshape(G, r, cg)
    if rp != r:
        qg = jnp.pad(qg, ((0, 0), (0, rp - r), (0, 0)))

    p = _fold_matrix(w, csp, slab.dtype)
    if not tg:
        tg = _pick_tg(K, rt, csp * w, jnp.dtype(dt).itemsize)

    out = pl.pallas_call(
        functools.partial(_gda_kernel, h=h, w=w, csp=csp, cg=cg, clip=clip,
                          K=K, tg=tg),
        grid=(G, rp // rt),
        in_specs=[
            pl.BlockSpec((1, rt, S * 2), lambda gi, ri: (gi, ri, 0)),
            pl.BlockSpec((1, clip, h, csp * w), lambda gi, ri: (gi, 0, 0, 0)),
            pl.BlockSpec((1, rt, cg), lambda gi, ri: (gi, ri, 0)),
            pl.BlockSpec((csp * w, csp), lambda gi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rt, cg), lambda gi, ri: (gi, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((G, rp, cg), dt),
        interpret=interpret,
    )(coords, slab, qg, p)

    out = out[:, :r].reshape(b, dg, h, w, cg)
    return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)


def _composed(q, k_feat, v_feat, offset, kernel, heads, dg):
    """The XLA gather-path reference (exact same math) — used for the
    backward pass and as the correctness oracle."""
    from kair_tpu.ops.deform_attn import deform_attention
    return deform_attention(q, k_feat, v_feat, offset, kernel, heads, dg,
                            impl="gather")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def gda_fused(q, k_feat, v_feat, offset, kernel=(3, 3), heads=12, dg=12,
              rt: int = 256, interpret: bool = False, tg: int = 0):
    """Fused GDA forward. Same contract as ops.deform_attn.deform_attention
    (q (B,H,W,C); k/v (B,clip,H,W,C) pre-rotated; offset
    (B,clip,H,W,dg·K·2)). Caller must check gda_supported first."""
    return _fused_fwd_impl(q, k_feat, v_feat, offset, kernel, heads, dg,
                           rt, interpret, tg)


def _gda_vjp_fwd(q, k_feat, v_feat, offset, kernel, heads, dg, rt,
                 interpret, tg):
    out = _fused_fwd_impl(q, k_feat, v_feat, offset, kernel, heads, dg,
                          rt, interpret, tg)
    return out, (q, k_feat, v_feat, offset)


def _gda_vjp_bwd(kernel, heads, dg, rt, interpret, tg, res, g):
    q, k_feat, v_feat, offset = res
    _, pullback = jax.vjp(
        lambda a, b, c, d: _composed(a, b, c, d, kernel, heads, dg),
        q, k_feat, v_feat, offset)
    return pullback(g)


gda_fused.defvjp(_gda_vjp_fwd, _gda_vjp_bwd)
