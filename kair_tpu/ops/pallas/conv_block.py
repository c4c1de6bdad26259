"""Fused 3x3 conv + bias + residual (+ cyclic un-roll) strip kernel.

Motivation (round-5 TPU trace, runs/tpu_r5/trace of the SwinIR headline
bench): each RSTB tail costs ~3.15 ms/iter as four XLA ops — the
phase-thread un-roll (slice 0.40 ms + concat fusion 0.42 ms: a full
94 MB feature-map HBM round-trip), the 3x3 conv (1.75 ms, emitted in a
{3,0,2,1} layout), and a residual-add/relayout fusion (0.59 ms). This
kernel computes

    out = conv3x3_SAME(jnp.roll(y, (phase, phase), (1, 2))) + bias + res

in ONE pass over 8-row output strips: the un-roll is folded into the
read (row phase via mod-indexed strip views, column phase via an
in-VMEM sublane roll), the conv is 9 shifted (8W, C) x (C, C) MXU
matmuls accumulated in f32, and the residual rides along in the same
VMEM window. No intermediate feature map ever touches HBM.

Reference counterpart: the torch path runs nn.Conv2d on the un-rolled
map (network_swinir.py:419-494 RSTB conv + residual); the roll fold has
no reference analog (torch pays the roll).

Differentiable: custom VJP recomputes through the jnp reference (same
remat pattern as swin_block.py) so training paths stay exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3x3_residual_reference(y, res, kernel, bias, phase: int = 0):
    """jnp reference: roll -> SAME conv3x3 -> +bias +res (NHWC, HWIO)."""
    x = jnp.roll(y, (phase, phase), axis=(1, 2)) if phase else y
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    out = out + bias.astype(jnp.float32)
    return (out + res.astype(jnp.float32)).astype(y.dtype)


def _kernel(yA, yB, yC, r, w, b, out, *, nr: int, phase: int, width: int):
    s = lax.rem(pl.program_id(0), nr)
    f32 = jnp.float32

    x = jnp.concatenate([yA[0], yB[0], yC[0]], axis=0)      # (24, W, C)
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    # conv zero-padding rows in UN-ROLLED space: row -1 (strip 0) and row H
    # (last strip) — the cyclic wrap from the roll itself is real data
    x = jnp.where((s == 0) & (rows == 7 - phase), 0, x)
    x = jnp.where((s == nr - 1) & (rows == 16 - phase), 0, x)

    cols = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # column tap dj: un-rolled col v reads storage col (v + dj - phase) mod W
    # = roll(x, phase - dj); conv padding zeroes v=0 (dj=-1) / v=W-1 (dj=+1)
    r_m = jnp.where(cols == 0, 0, jnp.roll(x, phase + 1, axis=1))
    r_0 = jnp.roll(x, phase, axis=1) if phase else x
    r_p = jnp.where(cols == width - 1, 0, jnp.roll(x, phase - 1, axis=1))

    c = x.shape[-1]
    acc = jnp.zeros((8 * width, c), f32)
    for di in (-1, 0, 1):
        lo = 8 + di - phase
        for dj, rv in ((-1, r_m), (0, r_0), (1, r_p)):
            xs = rv[lo:lo + 8].reshape(8 * width, c)
            acc += jnp.dot(xs, w[di + 1, dj + 1],
                           preferred_element_type=f32)
    acc += b[0].astype(f32)
    acc += r[0].reshape(8 * width, c).astype(f32)
    out[0] = acc.reshape(8, width, c).astype(out.dtype)


def _impl(meta, y, res, kernel, bias):
    phase, interpret = meta
    bsz, h, w, c = y.shape
    nr = h // 8
    strip = lambda off: pl.BlockSpec(
        (1, 8, w, c),
        lambda i, off=off: (i // nr, lax.rem(lax.rem(i, nr) + off + nr, nr),
                            0, 0),
        memory_space=pltpu.VMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 8, w, c),
                            lambda i: (i // nr, lax.rem(i, nr), 0, 0),
                            memory_space=pltpu.VMEM)
    kfn = functools.partial(_kernel, nr=nr, phase=phase, width=w)
    return pl.pallas_call(
        kfn,
        grid=(bsz * nr,),
        in_specs=[strip(-1), strip(0), strip(1), strip(0),
                  vmem(), vmem()],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), y.dtype),
        interpret=interpret,
    )(y, y, y, res, kernel.astype(y.dtype),
      bias.reshape(1, -1).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv_res(meta, y, res, kernel, bias):
    return _impl(meta, y, res, kernel, bias)


def _conv_res_fwd(meta, y, res, kernel, bias):
    return _impl(meta, y, res, kernel, bias), (y, kernel, bias)


def _conv_res_bwd(meta, saved, g):
    phase = meta[0]
    y, kernel, bias = saved
    # recompute through the jnp reference (res enters additively: dres = g)
    zero_res = jnp.zeros_like(y)
    _, vjp = jax.vjp(
        lambda yy, kk, bb: conv3x3_residual_reference(
            yy, zero_res, kk, bb, phase), y, kernel, bias)
    dy, dk, db = vjp(g)
    return dy, g.astype(y.dtype), dk, db


_conv_res.defvjp(_conv_res_fwd, _conv_res_bwd)


def conv_vmem_ok(w: int, c: int) -> bool:
    """Three rolled copies of the 24-row window + f32 accumulator must fit
    scoped VMEM; W*C <= 64k covers the SwinIR-M strip regime (<= 256px at
    C=180) with ~6 MB to spare."""
    return w * c <= 64 * 1024


def conv3x3_residual(y, res, kernel, bias, phase: int = 0,
                     interpret: bool = False):
    """out = conv3x3_SAME(roll(y, (phase, phase))) + bias + res, NHWC.

    Pallas strip kernel when the geometry allows (H % 8 == 0, W fits
    VMEM); jnp reference otherwise. kernel (3,3,C,C) HWIO, bias (C,)."""
    bsz, h, w, c = y.shape
    # CPU/GPU (tests, eval fallbacks): the jnp reference IS the fast exact
    # path there — Mosaic only compiles for real TPU targets (same backend
    # gate as ops/warp.resolve_deform_impl)
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu", "cuda", "rocm")
    if (not (on_tpu or interpret) or h % 8 != 0 or h < 16
            or not conv_vmem_ok(w, c) or kernel.shape[:2] != (3, 3)):
        return conv3x3_residual_reference(y, res, kernel, bias, phase)
    return _conv_res((phase, interpret), y, res, kernel, bias)
