"""Fused GDA kernel (ops/pallas/gda_block.py) vs the composed gather path
— equality in interpret mode, gradient parity, and the support gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kair_tpu.ops.deform_attn import deform_attention
from kair_tpu.ops.pallas.gda_block import gda_fused, gda_supported


def make_case(b=1, clip=2, h=16, w=16, c=48, dg=6, heads=6, K=9, seed=0,
              off_scale=3.0):
    rng = np.random.RandomState(seed)
    q = rng.randn(b, h, w, c).astype(np.float32)
    k = rng.randn(b, clip, h, w, c).astype(np.float32)
    v = rng.randn(b, clip, h, w, c).astype(np.float32)
    off = (rng.randn(b, clip, h, w, dg * K * 2) * off_scale).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(off)


def test_fused_equals_gather_interpret():
    q, k, v, off = make_case()
    want = deform_attention(q, k, v, off, (3, 3), 6, 6, impl="gather")
    got = gda_fused(q, k, v, off, (3, 3), 6, 6, 256, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_impl_dispatch_interpret():
    q, k, v, off = make_case(seed=1)
    want = deform_attention(q, k, v, off, (3, 3), 6, 6, impl="gather")
    got = deform_attention(q, k, v, off, (3, 3), 6, 6, impl="fused",
                           _interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_large_offsets_out_of_frame():
    """Samples pushed outside the frame must contribute zeros-keys (score
    against zero vector) exactly like the gather path's zeros padding."""
    q, k, v, off = make_case(seed=2, off_scale=30.0)
    want = deform_attention(q, k, v, off, (3, 3), 6, 6, impl="gather")
    got = gda_fused(q, k, v, off, (3, 3), 6, 6, 256, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_grad_matches_gather():
    q, k, v, off = make_case(h=8, w=8, c=24, dg=3, heads=3, seed=3)

    def loss_fused(q, k, v, off):
        o = gda_fused(q, k, v, off, (3, 3), 3, 3, 256, True)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def loss_gather(q, k, v, off):
        o = deform_attention(q, k, v, off, (3, 3), 3, 3, impl="gather")
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, off)
    gg = jax.grad(loss_gather, argnums=(0, 1, 2, 3))(q, k, v, off)
    for a, b in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_support_gate():
    # released RVRT shape: ok
    assert gda_supported(288, 12, 12, 64, 64, 2, 9)
    # heads != groups: reject
    assert not gda_supported(288, 12, 6, 64, 64, 2, 9)
    # frame too large for the VMEM slab: reject
    assert not gda_supported(288, 12, 12, 256, 256, 2, 9)


@pytest.mark.slow
def test_rvrt_deform_fused_matches_gather():
    """Full tiny-RVRT forward with deform_impl='fused' == default path —
    also covers the batched (b·t) GDA call the non-gather impls use
    (models/rvrt.py GuidedDeformAttnPack)."""
    from unittest import mock
    from kair_tpu.models.rvrt import RVRT

    def tiny(impl):
        return RVRT(upscale=4, clip_size=2, window_size=(2, 4, 4),
                    num_blocks=(1, 1, 1), depths=(1, 1, 1),
                    embed_dims=(16, 16, 16), num_heads=(2, 2, 2),
                    inputconv_groups=(1, 1, 1, 1, 1, 1),
                    deformable_groups=2, attention_heads=2,
                    attention_window=(3, 3), deform_impl=impl)

    import kair_tpu.ops.pallas.gda_block as gb
    orig = gb._fused_fwd_impl
    patch = mock.patch.object(
        gb, "_fused_fwd_impl",
        lambda q, k, v, o, kern, hh, dgg, rt, _i, tg=0: orig(
            q, k, v, o, kern, hh, dgg, rt, True, tg))

    rng = np.random.RandomState(5)
    lqs = rng.rand(1, 4, 64, 64, 3).astype(np.float32)
    model_g = tiny("gather")
    variables = model_g.init(jax.random.PRNGKey(0), lqs)
    want = np.asarray(model_g.apply(variables, lqs))
    with patch:
        got = np.asarray(tiny("fused").apply(variables, lqs))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_fused_dispatch_falls_back_loudly():
    # heads != dg → gather fallback, same numbers
    q, k, v, off = make_case(c=48, dg=6, heads=3, seed=4)
    want = deform_attention(q, k, v, off, (3, 3), 3, 6, impl="gather")
    got = deform_attention(q, k, v, off, (3, 3), 3, 6, impl="fused",
                           _interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_tap_group_remainder():
    """Forced tg=2 exercises the grouped-matmul path with a ragged last
    group (K=9 -> groups 2,2,2,2,1); must stay exactly equal to auto-tg."""
    q, k, v, off = make_case(seed=5)
    want = deform_attention(q, k, v, off, (3, 3), 6, 6, impl="gather")
    got = gda_fused(q, k, v, off, (3, 3), 6, 6, 256, True, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
