"""MXU 2-hot-matmul bilinear sampling (ops/pallas/bilin_mm.py) equality
vs the gather path, incl. the deform_attention impl='mxu' route."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kair_tpu.ops.pallas.bilin_mm import bilinear_sample_mm, _sample_ref


def _rand_coords(rng, g, r, h, w):
    # mostly in-range, some in the zero ring, some far outside, some exact
    fy = rng.uniform(-2.5, h + 1.5, size=(g, r)).astype(np.float32)
    fx = rng.uniform(-2.5, w + 1.5, size=(g, r)).astype(np.float32)
    fy[:, : r // 8] = np.round(fy[:, : r // 8])   # integer coords (w=0 edge)
    fy[:, -1] = h - 1.0
    fx[:, -1] = w - 1.0
    return jnp.asarray(fy), jnp.asarray(fx)


@pytest.mark.parametrize("h,w,cs,r", [(16, 16, 48, 300), (8, 24, 24, 64),
                                      (12, 8, 7, 513)])
def test_bilinear_mm_matches_gather_ref(h, w, cs, r):
    rng = np.random.default_rng(0)
    g = 3
    feat = jnp.asarray(rng.standard_normal((g, h, w, cs)), jnp.float32)
    fy, fx = _rand_coords(rng, g, r, h, w)
    got = bilinear_sample_mm(feat, fy, fx, 128, True)
    want = _sample_ref(feat, fy, fx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bilinear_mm_grads_match_reference():
    rng = np.random.default_rng(1)
    g, h, w, cs, r = 2, 10, 12, 8, 50
    feat = jnp.asarray(rng.standard_normal((g, h, w, cs)), jnp.float32)
    fy, fx = _rand_coords(rng, g, r, h, w)
    # keep coords off integer points (floor kink) for finite-diff-free compare
    fy = jnp.clip(fy, -1.9, h + 0.9) + 0.017
    fx = jnp.clip(fx, -1.9, w + 0.9) + 0.013
    ct = jnp.asarray(rng.standard_normal((g, r, cs)), jnp.float32)

    def loss_k(f, y, x):
        return jnp.sum(bilinear_sample_mm(f, y, x, 64, True) * ct)

    def loss_r(f, y, x):
        return jnp.sum(_sample_ref(f, y, x) * ct)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(feat, fy, fx)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(feat, fy, fx)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_deform_attention_mxu_matches_gather():
    from kair_tpu.ops.deform_attn import deform_attention
    rng = np.random.default_rng(2)
    b, clip, h, w, c = 1, 2, 16, 16, 24
    heads = dg = 4
    q = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((b, clip, h, w, c)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((b, clip, h, w, c)), jnp.float32)
    off = jnp.asarray(
        rng.uniform(-6, 6, size=(b, clip, h, w, dg * 9 * 2)), jnp.float32)
    want = deform_attention(q, kf, vf, off, (3, 3), heads, dg)
    got = deform_attention(q, kf, vf, off, (3, 3), heads, dg,
                           impl="mxu", _interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_rvrt_deform_mxu_matches_gather():
    """Full tiny-RVRT forward with deform_impl='mxu' == default path."""
    from unittest import mock
    from kair_tpu.models.rvrt import RVRT

    def tiny(impl):
        return RVRT(upscale=4, clip_size=2, window_size=(2, 4, 4),
                    num_blocks=(1, 1, 1), depths=(1, 1, 1),
                    embed_dims=(16, 16, 16), num_heads=(2, 2, 2),
                    inputconv_groups=(1, 1, 1, 1, 1, 1),
                    deformable_groups=2, attention_heads=2,
                    attention_window=(3, 3), deform_impl=impl)

    import kair_tpu.ops.pallas.bilin_mm as bm
    orig = bm._fwd_impl
    patch = mock.patch.object(
        bm, "_fwd_impl",
        lambda f, y, x, rt, _i, *v: orig(f, y, x, rt, True, *v))

    rng = np.random.RandomState(3)
    lqs = rng.rand(1, 4, 64, 64, 3).astype(np.float32)
    model_g = tiny("gather")
    variables = model_g.init(jax.random.PRNGKey(0), lqs)
    want = np.asarray(model_g.apply(variables, lqs))
    with patch:
        got = np.asarray(tiny("mxu").apply(variables, lqs))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_modulated_deform_conv_mxu_matches_gather():
    from kair_tpu.ops.warp import modulated_deform_conv
    rng = np.random.default_rng(4)
    n, h, w, cin, cout, dg = 2, 12, 20, 8, 10, 2
    K = 9
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.float32)
    offset = jnp.asarray(rng.uniform(-4, 4, (n, h, w, dg * 2 * K)),
                         jnp.float32)
    mask = jax.nn.sigmoid(
        jnp.asarray(rng.standard_normal((n, h, w, dg * K)), jnp.float32))
    weight = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    want = modulated_deform_conv(x, offset, mask, weight, bias,
                                 deformable_groups=dg)
    got = modulated_deform_conv(x, offset, mask, weight, bias,
                                deformable_groups=dg, impl="mxu",
                                _interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_vrt_deform_mxu_matches_gather():
    """Full tiny-VRT forward (8 stages, all flow-pyramid scales) with
    deform_impl='mxu' == default path (f32 reassociation noise only)."""
    from unittest import mock
    from pathlib import Path
    from kair_tpu.models.vrt import VRT

    def tiny(impl):
        return VRT(upscale=4, in_chans=3, out_chans=3,
                   window_size=(2, 8, 8), depths=(2,) * 8,
                   embed_dims=(12,) * 7 + (16,), num_heads=(2,) * 8,
                   pa_frames=2, deformable_groups=2, deform_impl=impl)

    import kair_tpu.ops.pallas.bilin_mm as bm
    orig = bm._fwd_impl
    z = np.load(Path(__file__).parent / "fixtures" / "model_vrt.npz")
    x = z["x"].transpose(0, 1, 3, 4, 2)
    model_g = tiny("gather")
    variables = model_g.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model_g.apply(variables, x))
    with mock.patch.object(
            bm, "_fwd_impl",
            lambda f, fy, fx, rt, _i, *v: orig(f, fy, fx, rt, True, *v)):
        got = np.asarray(tiny("mxu").apply(variables, x))
    d = np.abs(got - want)
    assert d.max() < 2e-3 and d.mean() < 5e-5, (d.max(), d.mean())


@pytest.mark.parametrize("variant", ["reduce", "iota"])
def test_bilinear_mm_variants_match(variant):
    rng = np.random.default_rng(6)
    g, h, w, cs, r = 2, 16, 16, 48, 200
    feat = jnp.asarray(rng.standard_normal((g, h, w, cs)), jnp.float32)
    fy, fx = _rand_coords(rng, g, r, h, w)
    got = bilinear_sample_mm(feat, fy, fx, 128, True, variant)
    want = _sample_ref(feat, fy, fx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_route_impl_gates_large_frames():
    from kair_tpu.ops.pallas.bilin_mm import route_impl
    assert route_impl("mxu", 64, 64, 48, "t") == "mxu"
    assert route_impl("gather", 64, 64, 48, "t") == "gather"
    # area over the px² limit
    assert route_impl("mxu", 128, 128, 48, "t") == "gather"
    # lane blow-up: w=95 pads csp to 128 → 12160 lanes
    assert route_impl("mxu", 95, 95, 48, "t") == "gather"


def test_integer_coord_subgradient_divergence_is_pinned():
    """At EXACT-integer coordinates the hat weight has a kink; the Pallas
    backward picks the symmetric subgradient sign(0)*ceil(1) = 0 where the
    gather oracle's floor() form picks the one-sided derivative
    feat[y0+1] - feat[y0]. Both are valid subgradients (measure-zero set);
    this test pins the known divergence so it isn't accidentally 'fixed'
    into silently changing training numerics (ADVICE r4)."""
    rng = np.random.default_rng(11)
    g, h, w, cs = 1, 8, 8, 8
    feat = jnp.asarray(rng.standard_normal((g, h, w, cs)), jnp.float32)
    fy = jnp.asarray([[3.0, 5.0]], jnp.float32)      # exact integers
    fx = jnp.asarray([[2.0, 6.0]], jnp.float32)
    ct = jnp.asarray(rng.standard_normal((g, 2, cs)), jnp.float32)

    _, dfy_k, dfx_k = jax.grad(
        lambda f, y, x: jnp.sum(bilinear_sample_mm(f, y, x, 128, True) * ct),
        argnums=(0, 1, 2))(feat, fy, fx)
    _, dfy_o, dfx_o = jax.grad(
        lambda f, y, x: jnp.sum(_sample_ref(f, y, x) * ct),
        argnums=(0, 1, 2))(feat, fy, fx)

    # kernel: symmetric subgradient == 0 at the kink
    np.testing.assert_array_equal(np.asarray(dfy_k), 0.0)
    np.testing.assert_array_equal(np.asarray(dfx_k), 0.0)
    # oracle: one-sided derivative, generically nonzero — the divergence
    assert float(jnp.abs(dfy_o).max()) > 1e-3
    assert float(jnp.abs(dfx_o).max()) > 1e-3
