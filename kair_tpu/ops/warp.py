"""Spatial sampling ops: grid_sample, flow_warp, modulated deformable conv.

TPU-native counterparts of the reference's warping stack:
  flow_warp / grid_sample  network_vrt.py:208-264 (torch F.grid_sample,
      align_corners=True default, bilinear/nearest/nearest4)
  modulated deformable conv (DCNv2)  network_vrt.py:20-89 +
      torchvision.ops.deform_conv2d call at network_vrt.py:337

Design: all sampling is expressed as vectorised bilinear gathers
(one-hot-free `take_along_axis` on a flattened spatial axis) + einsum —
XLA lowers gathers efficiently on TPU and fuses the corner-weight
arithmetic; the K=kh*kw deformable taps become a (N,H,W,K,Cin) gather
followed by one big (K*Cin → Cout) contraction on the MXU, replacing the
reference's im2col CUDA kernels (deform_attn_cuda_kernel.cu:191).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def resolve_deform_impl(impl: str) -> str:
    """Resolve deform impl 'auto' from the backend: the fused Pallas
    kernels (gda_block / dcn_block) only compile for real TPU targets,
    and the round-5 on-chip A/B (runs/tpu_r5/deform_{vrt,rvrt}.log)
    measured 'fused' fastest at both released shapes — VRT 59.7 ms/clip
    vs 127.4 gather, RVRT 141.3 vs 149.7 — so 'auto' picks 'fused' on
    TPU and the XLA gather path everywhere else (CPU tests, GPU)."""
    if impl != "auto":
        return impl
    platform = jax.devices()[0].platform
    return "fused" if platform not in ("cpu", "gpu", "cuda", "rocm") \
        else "gather"


def _gather_2d(x: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """x (N,H,W,C); iy/ix (N,Ho,Wo) int32 (assumed in-bounds) →
    (N,Ho,Wo,C)."""
    n, h, w, c = x.shape
    flat = x.reshape(n, h * w, c)
    idx = (iy * w + ix).reshape(n, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(n, iy.shape[1], iy.shape[2], c)


def _sample_bilinear(x, fy, fx, padding_mode: str):
    """Bilinear sample at float pixel coords fy/fx (N,Ho,Wo) → (N,Ho,Wo,C).
    padding 'zeros' | 'border'."""
    if padding_mode == "zeros":
        return _sample_bilinear_patch(x, fy, fx)
    n, h, w, c = x.shape
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    def corner(yc, xc):
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        v = _gather_2d(x, yi, xi)
        if padding_mode == "zeros":
            valid = ((yc >= 0) & (yc <= h - 1) & (xc >= 0) & (xc <= w - 1))
            v = v * valid[..., None].astype(v.dtype)
        return v

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    wx = wx.astype(x.dtype)
    wy = wy.astype(x.dtype)
    return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
            v10 * wy * (1 - wx) + v11 * wy * wx)


def _sample_bilinear_patch(x, fy, fx):
    """Bilinear 'zeros' sampling as ONE (2,2,C) patch gather per pixel on a
    zero-padded map, instead of 4 separate corner gathers — TPU gather
    cost scales with the number of index rows, and the deformable-conv
    stack (108 samples per pa_deform call) is gather-bound."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = (fy - y0)[..., None].astype(x.dtype)
    wx = (fx - x0)[..., None].astype(x.dtype)
    # patch start in padded coords; valid iff BOTH corners map inside the
    # one-pixel zero ring (fy ∈ [-1, h)) — farther out the true result is 0
    sy = jnp.clip(y0 + 1, 0, h).astype(jnp.int32)
    sx = jnp.clip(x0 + 1, 0, w).astype(jnp.int32)
    valid = ((fy >= -1) & (fy < h) & (fx >= -1) & (fx < w))

    ho, wo = fy.shape[1], fy.shape[2]
    idx = jnp.stack([sy.reshape(n, -1), sx.reshape(n, -1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def per_image(xp_i, idx_i):
        return jax.lax.gather(xp_i, idx_i, dn, slice_sizes=(2, 2, c),
                              mode=jax.lax.GatherScatterMode.CLIP)

    patch = jax.vmap(per_image)(xp, idx)          # (N, P, 2, 2, C)
    patch = patch.reshape(n, ho, wo, 2, 2, c)
    out = (patch[:, :, :, 0, 0] * (1 - wy) * (1 - wx)
           + patch[:, :, :, 0, 1] * (1 - wy) * wx
           + patch[:, :, :, 1, 0] * wy * (1 - wx)
           + patch[:, :, :, 1, 1] * wy * wx)
    return out * valid[..., None].astype(x.dtype)


def _sample_nearest(x, fy, fx, padding_mode: str):
    n, h, w, c = x.shape
    yr = jnp.round(fy)
    xr = jnp.round(fx)
    yi = jnp.clip(yr, 0, h - 1).astype(jnp.int32)
    xi = jnp.clip(xr, 0, w - 1).astype(jnp.int32)
    v = _gather_2d(x, yi, xi)
    if padding_mode == "zeros":
        valid = ((yr >= 0) & (yr <= h - 1) & (xr >= 0) & (xr <= w - 1))
        v = v * valid[..., None].astype(v.dtype)
    return v


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                padding_mode: str = "zeros",
                align_corners: bool = True) -> jnp.ndarray:
    """torch F.grid_sample on NHWC. grid (N,Ho,Wo,2) in [-1,1], (x,y) order."""
    n, h, w, c = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        fx = (gx + 1) * 0.5 * (w - 1)
        fy = (gy + 1) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1) * w - 1) * 0.5
        fy = ((gy + 1) * h - 1) * 0.5
    if mode == "bilinear":
        return _sample_bilinear(x, fy, fx, padding_mode)
    if mode == "nearest":
        return _sample_nearest(x, fy, fx, padding_mode)
    raise NotImplementedError(mode)


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, interp_mode: str = "bilinear",
              padding_mode: str = "zeros",
              align_corners: bool = True) -> jnp.ndarray:
    """Warp NHWC x by flow (N,H,W,2) in pixels, (x,y) order
    (reference network_vrt.py:208-264)."""
    n, h, w, _ = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing="ij")
    vx = gx[None] + flow[..., 0]
    vy = gy[None] + flow[..., 1]

    if interp_mode == "nearest4":
        # 4 nearest-corner samples stacked on channels; reference channel
        # order (floorx,floory),(floorx,ceily),(ceilx,floory),(ceilx,ceily)
        # (network_vrt.py:242-253)
        o00 = _sample_nearest(x, jnp.floor(vy), jnp.floor(vx), padding_mode)
        o01 = _sample_nearest(x, jnp.ceil(vy), jnp.floor(vx), padding_mode)
        o10 = _sample_nearest(x, jnp.floor(vy), jnp.ceil(vx), padding_mode)
        o11 = _sample_nearest(x, jnp.ceil(vy), jnp.ceil(vx), padding_mode)
        return jnp.concatenate([o00, o01, o10, o11], axis=-1)

    if interp_mode == "bilinear":
        return _sample_bilinear(x, vy, vx, padding_mode)
    if interp_mode == "nearest":
        return _sample_nearest(x, vy, vx, padding_mode)
    raise NotImplementedError(interp_mode)


def modulated_deform_conv(x: jnp.ndarray, offset: jnp.ndarray,
                          mask: jnp.ndarray, weight: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          stride: int = 1, padding: int = 1,
                          dilation: int = 1,
                          deformable_groups: int = 1,
                          impl: str = "gather",
                          _interpret: bool = False) -> jnp.ndarray:
    """DCNv2 (torchvision deform_conv2d semantics) on NHWC.

    x      (N, H, W, Cin)
    offset (N, Ho, Wo, dg*2*K)  — torch layout: per group, K y-offsets
           interleaved (y,x) pairs: channel 2k = Δy_k, 2k+1 = Δx_k
    mask   (N, Ho, Wo, dg*K)    — already sigmoided
    weight (kh, kw, Cin, Cout)  HWIO
    impl   'auto' (fused on TPU, gather elsewhere — resolve_deform_impl)
           | 'gather' (XLA patch gathers) | 'mxu' (Pallas 2-hot-matmul
           sampling, ops/pallas/bilin_mm.py) | 'fused' (single Pallas
           sample+conv pass, ops/pallas/dcn_block.py — fastest measured,
           runs/tpu_r5/deform_vrt.log)
    """
    impl = resolve_deform_impl(impl)
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    K = kh * kw
    dg = deformable_groups
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jnp.arange(ho, dtype=x.dtype) * stride - padding
    base_x = jnp.arange(wo, dtype=x.dtype) * stride - padding
    gy, gx = jnp.meshgrid(base_y, base_x, indexing="ij")        # (Ho,Wo)
    ky, kx = jnp.meshgrid(jnp.arange(kh, dtype=x.dtype) * dilation,
                          jnp.arange(kw, dtype=x.dtype) * dilation,
                          indexing="ij")
    ky = ky.reshape(-1)                                          # (K,)
    kx = kx.reshape(-1)

    off = offset.reshape(n, ho, wo, dg, K, 2)
    dy = off[..., 0]                                             # (N,Ho,Wo,dg,K)
    dx = off[..., 1]
    m = mask.reshape(n, ho, wo, dg, K)

    cg = cin // dg
    xg = x.reshape(n, h, w, dg, cg)

    if impl == "fused":
        from kair_tpu.ops.pallas.dcn_block import dcn_fused, dcn_supported
        if dcn_supported(h, w, cin, dg, stride, dilation):
            out = dcn_fused(x, offset, mask, weight, stride, padding,
                            dilation, dg, 256, _interpret)
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out
        from kair_tpu.utils.logger import warn_once
        warn_once(f"dcn-fused-{h}x{w}x{cin}-{dg}g",
                  f"modulated_deform_conv impl='fused' unsupported at "
                  f"{h}x{w} cin={cin} dg={dg}: using the gather path")
        impl = "gather"
    if impl == "mxu":
        from kair_tpu.ops.pallas.bilin_mm import (bilinear_sample_mm,
                                                  route_impl)
        impl = route_impl(impl, h, w, cg, "modulated_deform_conv")
    if impl == "mxu":
        slabs = xg.transpose(0, 3, 1, 2, 4).reshape(n * dg, h, w, cg)
        # rows tap-major per (n, g), matching the gather path's col order
        fy = (gy[None, None, None] + ky[:, None, None]
              + dy.transpose(0, 3, 4, 1, 2)).reshape(n * dg, K * ho * wo)
        fx = (gx[None, None, None] + kx[:, None, None]
              + dx.transpose(0, 3, 4, 1, 2)).reshape(n * dg, K * ho * wo)
        samp = bilinear_sample_mm(slabs, fy, fx, 256, _interpret)
        s6 = samp.reshape(n, dg, K, ho, wo, cg)
        s6 = s6 * m.transpose(0, 3, 4, 1, 2)[..., None].astype(s6.dtype)
        cols = s6.transpose(0, 3, 4, 1, 2, 5).reshape(n, ho, wo, dg * K * cg)
    else:
        cols = _dcn_cols_gather(xg, gy, gx, ky, kx, dy, dx, m,
                                n, ho, wo, K, dg, cg)
    # weight reorder to match col layout: dg groups × K × cg — torch weight
    # is (kh,kw,Cin,Cout) with Cin = dg*cg ordered [g, cg]
    wmat = weight.reshape(K, dg, cg, cout).transpose(1, 0, 2, 3).reshape(
        dg * K * cg, cout)
    out = jnp.einsum("nhwk,ko->nhwo", cols, wmat.astype(cols.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _dcn_cols_gather(xg, gy, gx, ky, kx, dy, dx, m, n, ho, wo, K, dg, cg):
    # gather granularity (measured on v5e): python loop over dg with a
    # vmapped K-tap gather inside — 1.5x faster than one (dg,K)-vmapped
    # gather (many small index sets beat one big one on the TPU gather
    # path) while keeping the HLO at dg subgraphs per call, not dg*K
    # (the fully unrolled loop made the 13-stage VRT uncompilable)
    outs = []
    for g in range(dg):
        fy_g = gy[None, None] + ky[:, None, None, None] \
            + dy[:, :, :, g, :].transpose(3, 0, 1, 2)     # (K,N,Ho,Wo)
        fx_g = gx[None, None] + kx[:, None, None, None] \
            + dx[:, :, :, g, :].transpose(3, 0, 1, 2)
        s = jax.vmap(lambda fy, fx: _sample_bilinear(
            xg[:, :, :, g, :], fy, fx, "zeros"))(fy_g, fx_g)
        s = s * m[:, :, :, g, :].transpose(3, 0, 1, 2)[..., None]
        outs.append(s.transpose(1, 2, 3, 0, 4).reshape(n, ho, wo, K * cg))
    return jnp.concatenate(outs, axis=-1) if dg > 1 else outs[0]
