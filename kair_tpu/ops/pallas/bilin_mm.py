"""Bilinear gather as 2-hot MXU matmuls — Pallas TPU kernel.

The guided-deformable-attention sampling stage (reference CUDA
deform_attn_cuda_kernel.cu:85-258, our XLA port ops/deform_attn.py) is
gather-bound on TPU: the per-(clip, group) patch gathers move ~200 bytes
per index row through the gather pipeline at ~60M rows/s, ~35x off HBM
speed-of-light.  This kernel removes the gather entirely: a bilinear
sample is a 2-hot row mix times a 2-hot column mix,

    out[r, c] = sum_{y,x} Ry[r, y] * feat[y, x, c] * Cx[r, x]

with Ry/Cx the (1-w, w) interpolation weights scattered at (floor, floor+1)
— built in VMEM from iota compares, never materialized in HBM.  The whole
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

Differentiable: custom VJP recomputes through the jnp patch-gather
reference (ops/warp._sample_bilinear_patch), the same pattern as the
fused attention kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from kair_tpu.ops.warp import _sample_bilinear_patch


def _kernel(coords_ref, slab_ref, p_ref, out_ref, *, h: int, w: int,
            csp: int, variant: str = "fold"):
    # all intermediates stay 2-D (Mosaic-friendly): per-row scalars are
    # (Rt, 1) columns from a static lane slice, never 1-D vectors
    cds = coords_ref[0]                      # (Rt, 2)
    fy = cds[:, 0:1]
    fx = cds[:, 1:2]
    rt = cds.shape[0]
    dt = slab_ref.dtype

    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0).astype(dt)                # (Rt, 1)
    wx = (fx - x0).astype(dt)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    ih = jax.lax.broadcasted_iota(jnp.int32, (rt, h), 1)
    ry = (jnp.where(ih == y0i, 1.0 - wy, 0.0)
          + jnp.where(ih == y0i + 1, wy, 0.0)).astype(dt)
    iw = jax.lax.broadcasted_iota(jnp.int32, (rt, w), 1)
    cx = (jnp.where(iw == x0i, 1.0 - wx, 0.0)
          + jnp.where(iw == x0i + 1, wx, 0.0)).astype(dt)

    a = jnp.dot(ry, slab_ref[0], preferred_element_type=jnp.float32)
    if variant == "iota":
        # tile-free fallback: expanded column weights straight from the
        # lane index (lanes are c-major, x = lane % W)
        xl = jax.lax.broadcasted_iota(jnp.int32, (rt, csp * w), 1) % w
        cxe = (jnp.where(xl == x0i, 1.0 - wx, 0.0)
               + jnp.where(xl == x0i + 1, wx, 0.0)).astype(dt)
    else:
        cxe = jnp.tile(cx, (1, csp))
    m = a.astype(dt) * cxe
    if variant == "reduce":
        # lanes are c-major (c*W + x): split and sum the W lanes per c
        out = jnp.sum(m.reshape(rt, csp, w), axis=2)
    else:
        out = jnp.dot(m, p_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(dt)


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
    csp = cs
    while (csp * w) % 128:
        csp += 1
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


def _vjp_fwd(feat, fy, fx, rt, interpret, variant):
    return _fwd_impl(feat, fy, fx, rt, interpret, variant), (feat, fy, fx)


def _vjp_bwd(rt, interpret, variant, res, g):
    feat, fy, fx = res
    _, pullback = jax.vjp(_sample_ref, feat, fy, fx)
    return pullback(g)


bilinear_sample_mm.defvjp(_vjp_fwd, _vjp_bwd)
