"""Pallas window-MSA kernel vs the XLA reference path (interpret mode on
CPU; the real-TPU run happens in bench/verify)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kair_tpu.ops.pallas.window_msa import window_msa_pallas
from kair_tpu.ops.window_attention import (relative_position_index,
                                           shift_attn_mask, window_msa)


def _setup(b=1, nw=4, n=64, c=60, nh=6, seed=0):
    rng = np.random.RandomState(seed)
    xw = jnp.asarray(rng.randn(b, nw, n, c).astype(np.float32) * 0.5)
    qkv_k = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.05)
    qkv_b = jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.05)
    pk = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05)
    pb = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)
    ws = int(np.sqrt(n))
    bt = jnp.asarray(rng.randn((2 * ws - 1) ** 2, nh).astype(np.float32) * 0.05)
    ri = jnp.asarray(relative_position_index(ws, ws))
    return xw, qkv_k, qkv_b, pk, pb, bt, ri, nh, ws


def test_pallas_matches_xla_nomask():
    xw, qkv_k, qkv_b, pk, pb, bt, ri, nh, ws = _setup()
    want = window_msa(xw, qkv_k, qkv_b, pk, pb, bt, ri, nh, None)
    got = window_msa_pallas(xw, qkv_k, qkv_b, pk, pb, bt, ri, nh, None,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_pallas_matches_xla_shifted_mask():
    xw, qkv_k, qkv_b, pk, pb, bt, ri, nh, ws = _setup(b=2, nw=8)
    # 8 windows ⇔ 16x32 image of 8-px windows; shift 4
    mask = jnp.asarray(shift_attn_mask(16, 32, ws, ws // 2))
    assert mask.shape[0] == 8
    want = window_msa(xw, qkv_k, qkv_b, pk, pb, bt, ri, nh, mask)
    got = window_msa_pallas(xw, qkv_k, qkv_b, pk, pb, bt, ri, nh, mask,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_pallas_no_qkv_bias():
    xw, qkv_k, _, pk, pb, bt, ri, nh, ws = _setup()
    want = window_msa(xw, qkv_k, None, pk, pb, bt, ri, nh, None)
    got = window_msa_pallas(xw, qkv_k, None, pk, pb, bt, ri, nh, None,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_swinir_with_pallas_flag_matches():
    """SwinIR(use_pallas=True) == SwinIR(use_pallas=False) in interpret mode.

    The flag routes through ops.window_attention.window_msa(use_pallas=...),
    so patch the pallas entry to interpret mode for CPU."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR
    import kair_tpu.ops.pallas.window_msa as pm

    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 1), jnp.float32)
    ref_model = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
                       num_heads=(4,), window_size=8, mlp_ratio=2.0,
                       upsampler="", use_pallas=False)
    variables = ref_model.init(jax.random.PRNGKey(0), x)
    want = ref_model.apply(variables, x)

    orig = pm.window_msa_pallas
    with mock.patch.object(pm, "window_msa_pallas",
                           lambda *a, **kw: orig(*a, **{**kw, "interpret": True})):
        pl_model = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
                          num_heads=(4,), window_size=8, mlp_ratio=2.0,
                          upsampler="", use_pallas=True)
        got = pl_model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_block_matches_standard():
    """SwinIR(fuse_block=True) with adapted params == standard forward."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR, fused_block_params
    import kair_tpu.ops.pallas.swin_block as sb

    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 1), jnp.float32)
    std = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
                 num_heads=(4,), window_size=8, mlp_ratio=2.0, upsampler="")
    variables = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(variables, x)

    fused_vars = {"params": fused_block_params(variables["params"])}
    orig = sb.swin_block_pallas
    orig2d = sb.swin_block_pallas_2d
    with mock.patch.object(sb, "swin_block_pallas",
                           lambda *a, **kw: orig(*a, **{**kw, "interpret": True})), \
         mock.patch.object(sb, "swin_block_pallas_2d",
                           lambda *a, **kw: orig2d(*a, **{**kw, "interpret": True})):
        fused = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
                       num_heads=(4,), window_size=8, mlp_ratio=2.0,
                       upsampler="", fuse_block=True)
        got = fused.apply(fused_vars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_block_2d_strip_path_matches():
    """The (B,H,W,C) strip kernel (in-kernel window partition) == standard
    forward, including shifted blocks, on a multi-strip multi-pair grid."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR, fused_block_params
    import kair_tpu.ops.pallas.swin_block as sb

    # 32x32, depths=4 → two shifted + two unshifted blocks; W/16 = 2 pairs
    # per strip, 4 strips per image, batch 2
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 1), jnp.float32)
    std = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(4,),
                 num_heads=(4,), window_size=8, mlp_ratio=2.0, upsampler="")
    variables = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(variables, x)

    fused_vars = {"params": fused_block_params(variables["params"])}
    calls = []
    orig2d = sb.swin_block_pallas_2d

    def spy2d(*a, **kw):
        calls.append(1)
        return orig2d(*a, **{**kw, "interpret": True})

    with mock.patch.object(sb, "swin_block_pallas_2d", spy2d):
        fused = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(4,),
                       num_heads=(4,), window_size=8, mlp_ratio=2.0,
                       upsampler="", fuse_block=True)
        got = fused.apply(fused_vars, x)
    assert len(calls) == 4          # every block took the strip path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_block_2d_gradients_match_standard():
    """grad through the fused (custom VJP) path == grad through the XLA
    path for both input and every parameter, incl. the rel-pos bias table
    (trainable) on shifted + unshifted blocks."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR, fused_block_params
    import kair_tpu.ops.pallas.swin_block as sb

    x = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 1), jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(3).rand(1, 16, 16, 1), jnp.float32)
    kw = dict(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
              num_heads=(4,), window_size=8, mlp_ratio=2.0, upsampler="")
    std = SwinIR(**kw)
    variables = std.init(jax.random.PRNGKey(0), x)

    def loss_std(p):
        return jnp.mean((std.apply({"params": p}, x) - tgt) ** 2)

    g_std = jax.grad(loss_std)(variables["params"])
    g_std_fused_naming = fused_block_params(
        jax.tree_util.tree_map(np.asarray, g_std))

    fused = SwinIR(**kw, fuse_block=True)
    fp = fused_block_params(variables["params"])

    orig2d = sb.swin_block_pallas_2d
    with mock.patch.object(sb, "swin_block_pallas_2d",
                           lambda *a, **k: orig2d(*a, **{**k, "interpret": True})):
        def loss_fused(p):
            return jnp.mean((fused.apply({"params": p}, x, train=True)
                             - tgt) ** 2)
        g_fused = jax.grad(loss_fused)(fp)

    flat_want = jax.tree_util.tree_leaves_with_path(g_std_fused_naming)
    flat_got = jax.tree_util.tree_leaves_with_path(g_fused)
    assert len(flat_want) == len(flat_got)
    for (pw, w_), (pg, g_) in zip(flat_want, flat_got):
        assert pw == pg
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   atol=5e-5, rtol=1e-3,
                                   err_msg=str(pw))


@pytest.mark.slow
def test_fused_block_training_smoke():
    """A few optimizer steps through the fused path must reduce the loss."""
    from unittest import mock
    import optax
    from kair_tpu.models.swinir import SwinIR
    import kair_tpu.ops.pallas.swin_block as sb

    x = jnp.asarray(np.random.RandomState(4).rand(2, 16, 16, 1), jnp.float32)
    tgt = x
    model = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
                   num_heads=(4,), window_size=8, mlp_ratio=2.0,
                   upsampler="", fuse_block=True)
    orig2d = sb.swin_block_pallas_2d
    with mock.patch.object(sb, "swin_block_pallas_2d",
                           lambda *a, **k: orig2d(*a, **{**k, "interpret": True})):
        variables = model.init(jax.random.PRNGKey(0), x)
        params = variables["params"]
        opt = optax.adam(3e-3)
        ost = opt.init(params)

        def loss_fn(p):
            return jnp.mean((model.apply({"params": p}, x, train=True)
                             - tgt) ** 2)

        losses = []
        for _ in range(8):
            l, g = jax.value_and_grad(loss_fn)(params)
            up, ost = opt.update(g, ost)
            params = optax.apply_updates(params, up)
            losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_fused_block_odd_geometry_inference():
    """fuse_block=True on a 56x56 input (7x7=49 windows — odd pair count,
    W%16!=0) routes through the window-pair kernel with a dummy padding
    window and must match the standard path (ADVICE r1)."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR, fused_block_params
    import kair_tpu.ops.pallas.swin_block as sb

    x = jnp.asarray(np.random.RandomState(5).rand(1, 56, 56, 1), jnp.float32)
    kw = dict(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
              num_heads=(4,), window_size=8, mlp_ratio=2.0, upsampler="")
    std = SwinIR(**kw)
    variables = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(variables, x)

    orig = sb.swin_block_pallas
    with mock.patch.object(sb, "swin_block_pallas",
                           lambda *a, **k: orig(*a, **{**k, "interpret": True})):
        fused = SwinIR(**kw, fuse_block=True)
        fp = {"params": fused_block_params(variables["params"])}
        got = fused.apply(fp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("hw", [(28, 28), (21, 35)])
def test_fused_block_ws7_inference(hw):
    """ws=7 — 49-token windows, the JPEG-CAR SwinIR geometry
    (main_test_swinir.py:170-172) — rides the 64-token window-pair kernel
    via zero-padded tokens + a −1e9 key mask. (28,28): 16 windows (even
    pairs); (21,35): 15 windows (odd — exercises the dummy-window pad).
    depths=(2,) covers both the unshifted and the shift=3 masked block."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR, fused_block_params
    import kair_tpu.ops.pallas.swin_block as sb

    x = jnp.asarray(np.random.RandomState(9).rand(1, *hw, 1), jnp.float32)
    kw = dict(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
              num_heads=(4,), window_size=7, mlp_ratio=2.0, upsampler="")
    std = SwinIR(**kw)
    variables = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(variables, x)

    orig = sb.swin_block_pallas
    with mock.patch.object(sb, "swin_block_pallas",
                           lambda *a, **k: orig(*a, **{**k, "interpret": True})):
        fused = SwinIR(**kw, fuse_block=True)
        fp = {"params": fused_block_params(variables["params"])}
        got = fused.apply(fp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_block_train_off_fused_geometry():
    """Init at a fused geometry, then train on a W%16!=0 crop: the param
    structure must be identical across branches (static-config layout) and
    grads must flow through the flat-param jnp fallback (ADVICE r1)."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR
    import kair_tpu.ops.pallas.swin_block as sb

    model = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
                   num_heads=(4,), window_size=8, mlp_ratio=2.0,
                   upsampler="", fuse_block=True)
    x_init = jnp.asarray(np.random.RandomState(6).rand(1, 16, 16, 1),
                         jnp.float32)
    orig2d = sb.swin_block_pallas_2d
    with mock.patch.object(sb, "swin_block_pallas_2d",
                           lambda *a, **k: orig2d(*a, **{**k, "interpret": True})):
        variables = model.init(jax.random.PRNGKey(0), x_init)

    x = jnp.asarray(np.random.RandomState(7).rand(1, 24, 24, 1), jnp.float32)

    def loss_fn(p):
        return jnp.mean(model.apply({"params": p}, x, train=True) ** 2)

    l, g = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(l))
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


def test_fused_2d_safe_softmax_survives_logit_spike():
    """safe=True (the training forward) must stay finite when attention
    logits exceed the f32 exp overflow bound (~88); the max-free inference
    variant would NaN here (ADVICE r1)."""
    from kair_tpu.ops.pallas.swin_block import swin_block_pallas_2d

    rng = np.random.RandomState(8)
    c, nh = 24, 4
    x = jnp.asarray(rng.rand(1, 8, 16, c) * 30.0, jnp.float32)  # big tokens
    qkv_k = jnp.asarray(rng.randn(c, 3 * c), jnp.float32) * 1.0
    pk = jnp.asarray(rng.randn(c, c), jnp.float32) * 0.05
    pb = jnp.zeros((c,), jnp.float32)
    ws = 8
    bt = jnp.asarray(rng.randn((2 * ws - 1) ** 2, nh), jnp.float32) * 0.05
    ri = jnp.asarray(relative_position_index(ws, ws))
    ones, zeros = jnp.ones((c,)), jnp.zeros((c,))
    hid = c * 2
    fc1k = jnp.asarray(rng.randn(c, hid), jnp.float32) * 0.05
    fc2k = jnp.asarray(rng.randn(hid, c), jnp.float32) * 0.05

    def run(safe):
        return swin_block_pallas_2d(
            x, qkv_k, None, pk, pb, bt, ri, nh, ones, zeros, ones, zeros,
            fc1k, jnp.zeros((hid,)), fc2k, zeros, None,
            interpret=True, safe=safe)

    # sanity: this input really does overflow the max-free softmax
    unsafe = np.asarray(run(safe=False))
    assert not np.isfinite(unsafe).all(), \
        "test input no longer overflows — raise the scale"
    out = np.asarray(run(safe=True))
    assert np.isfinite(out).all()

    # under differentiation the custom-VJP forward must force safe=True
    # even when the caller leaves safe=False (e.g. VRT's _fused_stl1 has
    # no train flag): grads stay finite on the same overflowing input
    def loss(xx):
        return jnp.mean(swin_block_pallas_2d(
            xx, qkv_k, None, pk, pb, bt, ri, nh, ones, zeros, ones, zeros,
            fc1k, jnp.zeros((hid,)), fc2k, zeros, None,
            interpret=True, safe=False) ** 2)

    l, g = jax.value_and_grad(loss)(x)
    assert np.isfinite(float(l))
    assert np.isfinite(np.asarray(g)).all()


def test_fused_block_hd32_no_rowsum_lane():
    """hd == 32 leaves no free pad lane, so the kernels must take the
    ones-matmul row-sum path (RVRT's C=192/6-head geometry). Equality vs
    the standard block at C=128, 4 heads."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR, fused_block_params
    import kair_tpu.ops.pallas.swin_block as sb

    x = jnp.asarray(np.random.RandomState(11).rand(1, 16, 16, 1), jnp.float32)
    kw = dict(upscale=1, in_chans=1, embed_dim=128, depths=(2,),
              num_heads=(4,), window_size=8, mlp_ratio=2.0, upsampler="")
    std = SwinIR(**kw)
    variables = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(variables, x)

    fused_vars = {"params": fused_block_params(variables["params"])}
    orig2d = sb.swin_block_pallas_2d
    with mock.patch.object(sb, "swin_block_pallas_2d",
                           lambda *a, **k: orig2d(*a, **{**k, "interpret": True})):
        fused = SwinIR(**kw, fuse_block=True)
        got = fused.apply(fused_vars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
