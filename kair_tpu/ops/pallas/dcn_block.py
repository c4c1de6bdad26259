"""Fused DCNv2 Pallas kernel: deformable sampling + modulation + the conv
matmul in one VMEM pass.

The composed path (ops/warp.modulated_deform_conv) materializes the
(N, Ho, Wo, dg·K·cg) im2col tensor in HBM between the sampling stage and
the weight matmul — ~18 MB per 64² VRT stage call — which is exactly what
the reference's torchvision CUDA op avoids. This kernel streams it: per
(batch, row-tile, group) program

    samp_t = Ry_t @ slab_g * Cx_t @ P        # 2-hot MXU sampling per tap
    cols   = concat_t(samp_t · mask_t)       # (rt, K·cg) in VMEM only
    out   += cols @ W_g                      # partial conv, accumulated
                                             # across the group grid dim

The group axis is the innermost grid dimension so the output block stays
resident while partial products accumulate (same revisit pattern as
bilin_mm's backward dF). Backward: exact gradients via jax.vjp of the
composed path (already scatter-free when impl='mxu').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from kair_tpu.ops.pallas.bilin_mm import (MXU_MAX_HW, _fold_matrix, _pad_cs,
                                          hat_weights, max_lanes_for_rt,
                                          mxu_precision)


def _dcn_kernel(coords_ref, mask_ref, slab_ref, w_ref, p_ref, out_ref, *,
                h: int, w: int, csp: int, cg: int, K: int, tg: int):
    """Tap-grouped body (same restructure as gda_block._gda_kernel): `tg`
    taps are stacked along the sublane dim and sampled with one matmul
    pair per group instead of one per tap; the sample matmul emits the
    compute dtype directly (MXU accumulates f32 either way)."""
    rt = mask_ref.shape[2]                    # block is (1, 1, rt, K)
    dt = slab_ref.dtype
    f32 = jnp.float32
    prec = mxu_precision(dt)

    ihf = jax.lax.broadcasted_iota(jnp.int32, (rt, h), 1).astype(f32)
    iwf = jax.lax.broadcasted_iota(jnp.int32, (rt, w), 1).astype(f32)
    cds = coords_ref[0, 0]                    # (rt, K*2)
    msk = mask_ref[0, 0]                      # (rt, K)
    slab = slab_ref[0, 0]                     # (h, csp*w)

    cols = []
    for t0 in range(0, K, tg):
        ts = range(t0, min(t0 + tg, K))
        rys, cxs = [], []
        for t_ in ts:
            fy = cds[:, 2 * t_: 2 * t_ + 1]
            fx = cds[:, 2 * t_ + 1: 2 * t_ + 2]
            # hat-function 2-hot weights (see bilin_mm.hat_weights: the
            # compare-mask form is un-lowerable in Mosaic)
            rys.append(hat_weights(ihf, fy).astype(dt))
            cxs.append(jnp.tile(hat_weights(iwf, fx).astype(dt), (1, csp)))
        ry_g = jnp.concatenate(rys, axis=0) if len(rys) > 1 else rys[0]
        cx_g = jnp.concatenate(cxs, axis=0) if len(cxs) > 1 else cxs[0]
        a = jnp.dot(ry_g, slab, preferred_element_type=dt, precision=prec)
        mm = a * cx_g
        samp = jnp.dot(mm, p_ref[:], preferred_element_type=f32,
                       precision=prec)                       # (|ts|·rt,csp)
        for i, t_ in enumerate(ts):
            cols.append(samp[i * rt:(i + 1) * rt, :cg]
                        * msk[:, t_: t_ + 1].astype(f32))
    cols2 = jnp.concatenate(cols, axis=1).astype(dt)              # (rt,K*cg)

    part = jnp.dot(cols2, w_ref[0], preferred_element_type=f32,
                   precision=mxu_precision(dt))                   # (rt,cout)

    @pl.when(pl.program_id(2) == 0)
    def _zero():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += part.astype(out_ref.dtype)


def dcn_supported(h: int, w: int, cin: int, dg: int, stride: int,
                  dilation: int, rt: int = 256) -> bool:
    cg = cin // dg
    lanes = _pad_cs(cg, w) * w
    return (stride == 1 and dilation == 1 and cin % dg == 0
            and h * w <= MXU_MAX_HW and lanes <= max_lanes_for_rt(rt))


def _dcn_fused_fwd(x, offset, mask, weight, stride, padding, dilation, dg,
                   rt, interpret):
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    K = kh * kw
    cg = cin // dg
    csp = _pad_cs(cg, w)
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    r = ho * wo
    rp = -(-r // rt) * rt
    dt = x.dtype

    base_y = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    base_x = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    gy, gx = jnp.meshgrid(base_y, base_x, indexing="ij")
    ky, kx = jnp.meshgrid(jnp.arange(kh, dtype=jnp.float32) * dilation,
                          jnp.arange(kw, dtype=jnp.float32) * dilation,
                          indexing="ij")
    ky = ky.reshape(-1)
    kx = kx.reshape(-1)

    off = offset.reshape(n, ho, wo, dg, K, 2).astype(jnp.float32)
    # (n, dg, ho, wo, K)
    dy = off[..., 0].transpose(0, 3, 1, 2, 4)
    dx = off[..., 1].transpose(0, 3, 1, 2, 4)
    fy = gy[None, None, :, :, None] + ky[None, None, None, None] + dy
    fx = gx[None, None, :, :, None] + kx[None, None, None, None] + dx
    coords = jnp.stack([fy, fx], axis=-1).reshape(n, dg, r, K * 2)
    msk = mask.reshape(n, ho, wo, dg, K).transpose(0, 3, 1, 2, 4)
    msk = msk.reshape(n, dg, r, K).astype(jnp.float32)
    if rp != r:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, rp - r), (0, 0)),
                         constant_values=-2.0)
        msk = jnp.pad(msk, ((0, 0), (0, 0), (0, rp - r), (0, 0)))

    xg = x.reshape(n, h, w, dg, cg)
    if csp != cg:
        xg = jnp.pad(xg, ((0, 0),) * 4 + ((0, csp - cg),))
    slab = xg.transpose(0, 3, 1, 4, 2).reshape(n, dg, h, csp * w)

    # per-group weight slice, col layout [tap, cg]: torch HWIO Cin = [g, cg]
    wg = weight.reshape(K, dg, cg, cout).transpose(1, 0, 2, 3)
    wg = wg.reshape(dg, K * cg, cout).astype(dt)

    p = _fold_matrix(w, csp, slab.dtype)
    from kair_tpu.ops.pallas.gda_block import _pick_tg
    tg = _pick_tg(K, rt, csp * w, jnp.dtype(dt).itemsize)

    out = pl.pallas_call(
        functools.partial(_dcn_kernel, h=h, w=w, csp=csp, cg=cg, K=K, tg=tg),
        grid=(n, rp // rt, dg),
        in_specs=[
            pl.BlockSpec((1, 1, rt, K * 2),
                         lambda ni, ri, gi: (ni, gi, ri, 0)),
            pl.BlockSpec((1, 1, rt, K), lambda ni, ri, gi: (ni, gi, ri, 0)),
            pl.BlockSpec((1, 1, h, csp * w),
                         lambda ni, ri, gi: (ni, gi, 0, 0)),
            pl.BlockSpec((1, K * cg, cout), lambda ni, ri, gi: (gi, 0, 0)),
            pl.BlockSpec((csp * w, csp), lambda ni, ri, gi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rt, cout), lambda ni, ri, gi: (ni, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((n, rp, cout), jnp.float32),
        interpret=interpret,
    )(coords, msk[..., :K], slab, wg, p)

    return out[:, :r].reshape(n, ho, wo, cout).astype(dt)


def _composed(x, offset, mask, weight, stride, padding, dilation, dg):
    from kair_tpu.ops.warp import modulated_deform_conv
    return modulated_deform_conv(x, offset, mask, weight, None, stride,
                                 padding, dilation, dg, impl="gather")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def dcn_fused(x, offset, mask, weight, stride=1, padding=1, dilation=1,
              dg=1, rt: int = 256, interpret: bool = False):
    """Fused DCNv2 forward (bias added by the caller). Same contract as
    ops.warp.modulated_deform_conv; check dcn_supported first."""
    return _dcn_fused_fwd(x, offset, mask, weight, stride, padding,
                          dilation, dg, rt, interpret)


def _vjp_fwd(x, offset, mask, weight, stride, padding, dilation, dg, rt,
             interpret):
    out = _dcn_fused_fwd(x, offset, mask, weight, stride, padding, dilation,
                         dg, rt, interpret)
    return out, (x, offset, mask, weight)


def _vjp_bwd(stride, padding, dilation, dg, rt, interpret, res, g):
    x, offset, mask, weight = res
    _, pullback = jax.vjp(
        lambda a, o, m, w: _composed(a, o, m, w, stride, padding, dilation,
                                     dg), x, offset, mask, weight)
    return pullback(g)


dcn_fused.defvjp(_vjp_fwd, _vjp_bwd)
