"""Bilinear gather as 2-hot MXU matmuls — Pallas TPU kernel.

The guided-deformable-attention sampling stage (reference CUDA
deform_attn_cuda_kernel.cu:85-258, our XLA port ops/deform_attn.py) is
gather-bound on TPU: the per-(clip, group) patch gathers move ~200 bytes
per index row through the gather pipeline at ~60M rows/s, ~35x off HBM
speed-of-light.  This kernel removes the gather entirely: a bilinear
sample is a 2-hot row mix times a 2-hot column mix,

    out[r, c] = sum_{y,x} Ry[r, y] * feat[y, x, c] * Cx[r, x]

with Ry/Cx the (1-w, w) interpolation weights scattered at (floor, floor+1)
— built in VMEM as the hat function max(1-|iota-coord|, 0), never
materialized in HBM.  (The hat IS the 2-hot scatter for every real
coordinate, borders and zero-ring included; the earlier iota==floor
compare form died in Mosaic — an i1 mask from a broadcast compare cannot
be relayouted against a lane-replicated select operand, r4 on-chip
finding.)  The whole
sample is then two MXU matmuls and one elementwise multiply:

    A   = Ry @ slab            # slab (H, Cs*W), c-major lanes  [MXU]
    M   = A * tile(Cx, Cs)     # lane-tiled column weights      [VPU]
    out = M @ P                # P[(c*W+x), c'] = [c==c'] 0/1 fold [MXU]

Out-of-range coordinates simply match no iota row/column, which IS the
'zeros' padding semantics of the reference sampler (grid_sample
padding_mode='zeros', deform_attn_cuda_kernel.cu:85-117).

Cost model (per slab of G groups, R rows): 2*R*H*(Cs*W) + 2*R*(Cs*W)*Cs
FLOPs, all MXU — at RVRT's GDA shapes (H=W=64, Cs=48, R=36864, G=24)
about 610 GFLOP per deform_attention call, vs ~14 ms of gather today.
The matmul cost scales with H*W, the gather cost with R only, so the
wrapper keeps the gather path for large frames (see deform_attn.py).

Differentiable: the custom VJP's backward is itself all-MXU (`_bwd_kernel`
— transposed matmuls for dF, sign-one-hot folds for dfy/dfx), replacing
the gather path's scatter-add; the jnp patch-gather reference
(ops/warp._sample_bilinear_patch) remains the oracle (BWD_PALLAS switch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from kair_tpu.ops.warp import _sample_bilinear_patch


def mxu_precision(dt):
    """Dot precision for a kernel whose operands are dtype `dt`.

    r5 on-chip finding: Mosaic lowers f32 matmuls at DEFAULT precision to
    one-pass bf16 on the MXU — ~1e-2 absolute error vs the f32 gather
    oracle (probe_mosaic r5, pre-fix log). f32 operands therefore request
    HIGHEST (multi-pass, near-f32); bf16 operands keep DEFAULT (native
    one-pass bf16 — the production path's numerics)."""
    return jax.lax.Precision.HIGHEST if dt == jnp.float32 else None


def hat_weights(iota_f: jnp.ndarray, coord: jnp.ndarray) -> jnp.ndarray:
    """2-hot bilinear weights as the hat function max(1-|i-c|, 0).

    Identical values to scattering (1-frac, frac) at (floor, floor+1)
    for every real c — including borders and the out-of-range zero ring
    — but pure f32 arithmetic: no i1 masks (Mosaic cannot relayout a
    broadcast-compare mask against a lane-replicated select operand)."""
    return jnp.maximum(1.0 - jnp.abs(iota_f - coord), 0.0)


def _kernel(coords_ref, slab_ref, p_ref, out_ref, *, h: int, w: int,
            csp: int, variant: str = "fold"):
    # all intermediates stay 2-D (Mosaic-friendly): per-row scalars are
    # (Rt, 1) columns from a static lane slice, never 1-D vectors
    cds = coords_ref[0]                      # (Rt, 2)
    fy = cds[:, 0:1]
    fx = cds[:, 1:2]
    rt = cds.shape[0]
    dt = slab_ref.dtype

    # int iota + cast: tpu.iota is integer-only
    ihf = jax.lax.broadcasted_iota(jnp.int32, (rt, h), 1).astype(jnp.float32)
    ry = hat_weights(ihf, fy).astype(dt)
    iwf = jax.lax.broadcasted_iota(jnp.int32, (rt, w), 1).astype(jnp.float32)
    cx = hat_weights(iwf, fx).astype(dt)

    prec = mxu_precision(dt)
    a = jnp.dot(ry, slab_ref[0], preferred_element_type=jnp.float32,
                precision=prec)
    if variant == "iota":
        # tile-free fallback: expanded column weights straight from the
        # lane index (lanes are c-major, x = lane % W)
        xl = jax.lax.broadcasted_iota(jnp.int32, (rt, csp * w), 1) % w
        cxe = hat_weights(xl.astype(jnp.float32), fx).astype(dt)
    else:
        cxe = jnp.tile(cx, (1, csp))
    m = a.astype(dt) * cxe
    if variant == "reduce":
        # lanes are c-major (c*W + x): split and sum the W lanes per c
        out = jnp.sum(m.reshape(rt, csp, w), axis=2)
    else:
        out = jnp.dot(m, p_ref[:], preferred_element_type=jnp.float32,
                      precision=prec)
    out_ref[0] = out.astype(dt)


# largest frame area the MXU sampling path accepts before loudly falling
# back to gathers (cost ∝ H·W vs rows-only). Round-5 on-chip data at the
# released 6x64px clip shapes (runs/tpu_r5/deform_{vrt,rvrt}.log): VRT
# DCN mxu 78.8 ms/clip vs 127.4 gather (mxu wins below the bound), RVRT
# GDA mxu 185.7 vs 149.7 gather (the per-(pair,head) kernel launches
# dominate — model-, not size-, limited). Both lose to impl='fused'
# (59.7 / 141.3 ms), which is the TPU default via 'auto'; this gate only
# protects an explicit impl='mxu' request, so the 96² VMEM-derived bound
# stands.
MXU_MAX_HW = 96 * 96
# lane-dim budget: one program holds a few (rt, csp*w) f32 intermediates —
# cap csp·w so one rt×lanes f32 buffer stays ≤ 4 MB inside the 16 MB
# scoped-VMEM stack. Derived from the caller's row tile rt (ADVICE r3: the
# old 4096-lane constant silently assumed rt=256).
MXU_BUF_BYTES = 4 << 20


def max_lanes_for_rt(rt: int) -> int:
    return MXU_BUF_BYTES // (4 * rt)


def _pad_cs(cs: int, w: int) -> int:
    csp = cs
    while (csp * w) % 128:
        csp += 1
    return csp


def route_impl(impl: str, h: int, w: int, cs: int, tag: str,
               rt: int = 256) -> str:
    """Gate the 'mxu' sampling path by frame size AND padded lane width
    (widths sharing no factor with 128 pad csp toward 128 — the lane dim,
    not h*w, is the real VMEM constraint). `rt` must match the row tile
    the caller passes to bilinear_sample_mm. Falls back loudly."""
    if impl != "mxu":
        return impl
    lanes = _pad_cs(cs, w) * w
    max_lanes = max_lanes_for_rt(rt)
    if h * w <= MXU_MAX_HW and lanes <= max_lanes:
        return impl
    from kair_tpu.utils.logger import warn_once
    warn_once(f"{tag}-mxu-size-{h}x{w}x{cs}",
              f"{tag} impl='mxu' disabled at {h}x{w} (cs={cs}: "
              f"{lanes} lanes, limits {MXU_MAX_HW} px² / {max_lanes} "
              f"lanes at rt={rt}): using the gather path")
    return "gather"


def _fold_matrix(w: int, csp: int, dtype) -> jnp.ndarray:
    """(csp*w, csp) 0/1: P[c*w+x, c'] = [c == c'] — sums each c's W lanes."""
    lane_c = jnp.arange(csp * w) // w
    return (lane_c[:, None] == jnp.arange(csp)[None, :]).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bilinear_sample_mm(feat: jnp.ndarray, fy: jnp.ndarray, fx: jnp.ndarray,
                       rt: int = 256, interpret: bool = False,
                       variant: str = "fold") -> jnp.ndarray:
    """Bilinear 'zeros' sampling of feat (G, H, W, Cs) at float pixel
    coordinates fy/fx (G, R) → (G, R, Cs), computed on the MXU (no gather).

    Equivalent to ops.warp._sample_bilinear_patch on each slab. R and Cs
    are padded internally; H*W must be small enough that one (H, Cs*W)
    slab fits VMEM (the deformable wrapper routes large frames to the
    gather path).
    """
    return _fwd_impl(feat, fy, fx, rt, interpret, variant)


def _fwd_impl(feat, fy, fx, rt, interpret, variant="fold"):
    g, h, w, cs = feat.shape
    r = fy.shape[1]
    # lane dim Cs*W must tile cleanly; pad Cs up so (Cs*W) % 128 == 0
    csp = _pad_cs(cs, w)
    rp = -(-r // rt) * rt

    slab = feat
    if csp != cs:
        slab = jnp.pad(slab, ((0, 0), (0, 0), (0, 0), (0, csp - cs)))
    # c-major lanes: slab[g, y, c*W + x]
    slab = slab.transpose(0, 1, 3, 2).reshape(g, h, csp * w)
    coords = jnp.stack([fy, fx], axis=-1)
    if rp != r:
        coords = jnp.pad(coords, ((0, 0), (0, rp - r), (0, 0)),
                         constant_values=-2.0)
    coords = coords.astype(jnp.float32)
    p = _fold_matrix(w, csp, slab.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, csp=csp, variant=variant),
        grid=(g, rp // rt),
        in_specs=[
            pl.BlockSpec((1, rt, 2), lambda gi, ri: (gi, ri, 0)),
            pl.BlockSpec((1, h, csp * w), lambda gi, ri: (gi, 0, 0)),
            pl.BlockSpec((csp * w, csp), lambda gi, ri: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rt, csp), lambda gi, ri: (gi, ri, 0)),
        out_shape=jax.ShapeDtypeStruct((g, rp, csp), slab.dtype),
        interpret=interpret,
    )(coords, slab, p)
    return out[:, :r, :cs]


def _sample_ref(feat, fy, fx):
    """jnp reference with identical semantics (one patch gather per row)."""
    return _sample_bilinear_patch(feat, fy[..., None], fx[..., None])[..., 0, :]


def _bwd_kernel(coords_ref, slab_ref, p_ref, px_ref, g_ref,
                dslab_ref, dcoords_ref, *, h: int, w: int, csp: int):
    """All-MXU backward: with the 2-hot factorization
    out[r,·] = Ry[r]·F·Cx[r], the grads are transposed matmuls —
      dF   = Σ_r Ryᵀ (g_e ⊙ Cxe)            (scatter-free, unlike the
                                              gather path's scatter-add)
      dfy  = Σ_y Sy ⊙ ((g_e ⊙ Cxe) @ Fᵀ)     Sy = ∂Ry/∂fy ∈ {-1, 0, +1}
      dfx  = Σ_x Sx ⊙ (((Ry@F) ⊙ g_e) @ Px)
    g_e expands dout across the W lanes of each channel via the fixed
    fold matrix transposed (g @ Pᵀ)."""
    cds = coords_ref[0]
    fy = cds[:, 0:1]
    fx = cds[:, 1:2]
    rt = cds.shape[0]
    dt = slab_ref.dtype
    f32 = jnp.float32

    # hat weights + their fy/fx derivative: d hat/d c = sign(i - c) on the
    # open support |i-c| < 1 (ceil(hat) is the 0/1 support indicator), 0
    # outside. At integer coords sign(0)=0 picks the symmetric subgradient
    # where the compare form picked (-1 at floor, +1 at floor+1) — both
    # valid; the floor kink is measure-zero (test_pallas_bilin grads stay
    # off it, like the gather oracle's floor() does).
    ihf = jax.lax.broadcasted_iota(jnp.int32, (rt, h), 1).astype(f32)
    dyv = ihf - fy
    ryf = jnp.maximum(1.0 - jnp.abs(dyv), 0.0)
    sy = (jnp.sign(dyv) * jnp.ceil(ryf)).astype(dt)
    ry = ryf.astype(dt)
    iwf = jax.lax.broadcasted_iota(jnp.int32, (rt, w), 1).astype(f32)
    dxv = iwf - fx
    cxf = jnp.maximum(1.0 - jnp.abs(dxv), 0.0)
    sx = (jnp.sign(dxv) * jnp.ceil(cxf)).astype(dt)
    cx = cxf.astype(dt)
    cxe = jnp.tile(cx, (1, csp))

    prec = mxu_precision(dt)
    gout = g_ref[0].astype(dt)                                  # (Rt, csp)
    g_e = jax.lax.dot_general(gout, p_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=f32,
                              precision=prec).astype(dt)
    m2 = g_e * cxe                                              # (Rt, cspW)

    # dF accumulated across the R-tile grid dim (constant out block)
    dsl = jax.lax.dot_general(ry, m2, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32,
                              precision=prec)                   # (H, cspW)

    @pl.when(pl.program_id(1) == 0)
    def _zero():
        dslab_ref[0] = jnp.zeros_like(dslab_ref[0])

    dslab_ref[0] += dsl.astype(dslab_ref.dtype)

    # coordinate grads
    a2 = jax.lax.dot_general(m2, slab_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32,
                             precision=prec)                    # (Rt, H)
    dfy = jnp.sum(sy.astype(f32) * a2, axis=1, keepdims=True)
    a = jnp.dot(ry, slab_ref[0], preferred_element_type=f32,
                precision=prec).astype(dt)
    b2 = jnp.dot((a * g_e).astype(dt), px_ref[:],
                 preferred_element_type=f32,
                 precision=prec)                                # (Rt, W)
    dfx = jnp.sum(sx.astype(f32) * b2, axis=1, keepdims=True)
    dcoords_ref[0] = jnp.concatenate([dfy, dfx], axis=1)


def _fold_matrix_x(w: int, csp: int, dtype) -> jnp.ndarray:
    """(csp*w, w) 0/1: Px[c*w+x, x'] = [x == x'] — sums each x across c."""
    lane_x = jnp.arange(csp * w) % w
    return (lane_x[:, None] == jnp.arange(w)[None, :]).astype(dtype)


def _bwd_impl(feat, fy, fx, g, rt, interpret):
    gq, h, w, cs = feat.shape
    r = fy.shape[1]
    csp = _pad_cs(cs, w)
    rp = -(-r // rt) * rt

    slab = feat
    if csp != cs:
        slab = jnp.pad(slab, ((0, 0), (0, 0), (0, 0), (0, csp - cs)))
    slab = slab.transpose(0, 1, 3, 2).reshape(gq, h, csp * w)
    coords = jnp.stack([fy, fx], axis=-1)
    gz = g
    if csp != cs:
        gz = jnp.pad(gz, ((0, 0), (0, 0), (0, csp - cs)))
    if rp != r:
        coords = jnp.pad(coords, ((0, 0), (0, rp - r), (0, 0)),
                         constant_values=-2.0)
        gz = jnp.pad(gz, ((0, 0), (0, rp - r), (0, 0)))
    coords = coords.astype(jnp.float32)
    p = _fold_matrix(w, csp, slab.dtype)
    px = _fold_matrix_x(w, csp, slab.dtype)

    dslab, dcoords = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, csp=csp),
        grid=(gq, rp // rt),
        in_specs=[
            pl.BlockSpec((1, rt, 2), lambda gi, ri: (gi, ri, 0)),
            pl.BlockSpec((1, h, csp * w), lambda gi, ri: (gi, 0, 0)),
            pl.BlockSpec((csp * w, csp), lambda gi, ri: (0, 0)),
            pl.BlockSpec((csp * w, w), lambda gi, ri: (0, 0)),
            pl.BlockSpec((1, rt, csp), lambda gi, ri: (gi, ri, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, csp * w), lambda gi, ri: (gi, 0, 0)),
            pl.BlockSpec((1, rt, 2), lambda gi, ri: (gi, ri, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gq, h, csp * w), jnp.float32),
            jax.ShapeDtypeStruct((gq, rp, 2), jnp.float32),
        ],
        interpret=interpret,
    )(coords, slab, p, px, gz.astype(slab.dtype))

    dfeat = dslab.reshape(gq, h, csp, w).transpose(0, 1, 3, 2)[..., :cs]
    dfeat = dfeat.astype(feat.dtype)
    dfy = dcoords[:, :r, 0].astype(fy.dtype)
    dfx = dcoords[:, :r, 1].astype(fx.dtype)
    return dfeat, dfy, dfx


# backward implementation switch: the MXU kernel (scatter-free transposed
# matmuls) vs jax.vjp through the jnp gather reference (the oracle)
BWD_PALLAS = True


def _vjp_fwd(feat, fy, fx, rt, interpret, variant):
    return _fwd_impl(feat, fy, fx, rt, interpret, variant), (feat, fy, fx)


def _vjp_bwd(rt, interpret, variant, res, g):
    feat, fy, fx = res
    if BWD_PALLAS:
        return _bwd_impl(feat, fy, fx, g, rt, interpret)
    _, pullback = jax.vjp(_sample_ref, feat, fy, fx)
    return pullback(g)


bilinear_sample_mm.defvjp(_vjp_fwd, _vjp_bwd)
