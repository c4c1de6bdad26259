"""Fused DCNv2 kernel (ops/pallas/dcn_block.py) vs the composed gather
path — equality in interpret mode, gradients, the support gate, and the
modulated_deform_conv dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kair_tpu.ops.pallas.dcn_block import dcn_fused, dcn_supported
from kair_tpu.ops.warp import modulated_deform_conv


def make_case(n=1, h=16, w=16, cin=12, cout=10, dg=3, kh=3, kw=3, seed=0,
              off_scale=3.0):
    rng = np.random.RandomState(seed)
    K = kh * kw
    x = rng.randn(n, h, w, cin).astype(np.float32)
    offset = (rng.randn(n, h, w, dg * 2 * K) * off_scale).astype(np.float32)
    mask = 1 / (1 + np.exp(-rng.randn(n, h, w, dg * K))).astype(np.float32)
    weight = (rng.randn(kh, kw, cin, cout) * 0.1).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    return tuple(map(jnp.asarray, (x, offset, mask, weight, bias)))


def test_fused_equals_gather_interpret():
    x, offset, mask, weight, bias = make_case()
    want = modulated_deform_conv(x, offset, mask, weight, bias,
                                 deformable_groups=3, impl="gather")
    got = dcn_fused(x, offset, mask, weight, 1, 1, 1, 3, 256, True) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_dispatch_interpret():
    x, offset, mask, weight, bias = make_case(seed=1)
    want = modulated_deform_conv(x, offset, mask, weight, bias,
                                 deformable_groups=3, impl="gather")
    got = modulated_deform_conv(x, offset, mask, weight, bias,
                                deformable_groups=3, impl="fused",
                                _interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_out_of_frame_offsets():
    x, offset, mask, weight, bias = make_case(seed=2, off_scale=30.0)
    want = modulated_deform_conv(x, offset, mask, weight, bias,
                                 deformable_groups=3, impl="gather")
    got = dcn_fused(x, offset, mask, weight, 1, 1, 1, 3, 256, True) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_grad_matches_gather():
    x, offset, mask, weight, _ = make_case(h=8, w=8, cin=8, cout=6, dg=2,
                                           seed=3)

    def mk(fn):
        def loss(x, o, m, w_):
            out = fn(x, o, m, w_)
            return jnp.sum(out * jnp.sin(jnp.arange(out.size)
                                         ).reshape(out.shape))
        return loss

    lf = mk(lambda a, o, m, w_: dcn_fused(a, o, m, w_, 1, 1, 1, 2, 256,
                                          True))
    lg = mk(lambda a, o, m, w_: modulated_deform_conv(
        a, o, m, w_, None, deformable_groups=2, impl="gather"))
    gf = jax.grad(lf, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    gg = jax.grad(lg, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for a, b in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_support_gate():
    # VRT stage shape: ok
    assert dcn_supported(64, 64, 120, 12, 1, 1)
    # stride/dilation != 1: composed path only
    assert not dcn_supported(64, 64, 120, 12, 2, 1)
    assert not dcn_supported(64, 64, 120, 12, 1, 2)
    # frame too big for a VMEM slab
    assert not dcn_supported(256, 256, 120, 12, 1, 1)


def test_vrt_dcn_fused_matches_gather():
    """VRT's DCNv2PackFlowGuided with deform_impl='fused' == gather at the
    module level (offsets from real convs, flow-guided)."""
    from unittest import mock
    from kair_tpu.models.vrt import DCNv2PackFlowGuided
    import kair_tpu.ops.pallas.dcn_block as db

    rng = np.random.RandomState(4)
    b, h, w, c = 1, 16, 16, 8
    x = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    xw = [jnp.asarray(rng.rand(b, h, w, c), jnp.float32)]
    cur = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
    flows = [jnp.asarray(rng.rand(b, h, w, 2) * 2 - 1, jnp.float32)]

    def build(impl):
        return DCNv2PackFlowGuided(c, deformable_groups=2, pa_frames=2,
                                   deform_impl=impl)

    m_g = build("gather")
    variables = m_g.init(jax.random.PRNGKey(0), x, xw, cur, flows)
    want = np.asarray(m_g.apply(variables, x, xw, cur, flows))
    orig = db._dcn_fused_fwd
    with mock.patch.object(
            db, "_dcn_fused_fwd",
            lambda *a: orig(*a[:-1], True)):
        got = np.asarray(build("fused").apply(variables, x, xw, cur, flows))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
