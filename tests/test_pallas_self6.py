"""Fused (6,8,8) self-attention + GEGLU Pallas kernel vs the XLA TMSA
module (interpret mode). Covers VRT's second TMSAG of each stage and the
RTMSA tail geometries (reference network_vrt.py:855-995)."""

from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kair_tpu.models.vrt import TMSA

C, NH = 24, 4
WS = (6, 8, 8)


def _ab(shift, d=6, h=16, w=16, seed=3, ws=WS):
    x = jnp.asarray(np.random.RandomState(seed).rand(1, d, h, w, C) * 0.5,
                    jnp.float32)
    std = TMSA(C, NH, ws, shift, mut_attn=False, geglu=True)
    variables = std.init(jax.random.PRNGKey(0), x)
    want = np.asarray(std.apply(variables, x))

    import kair_tpu.ops.pallas.self6_block as s6
    fused = TMSA(C, NH, ws, shift, mut_attn=False, geglu=True,
                 fuse_block=True)
    orig = s6.self6_block_pallas
    with mock.patch.object(s6, "self6_block_pallas",
                           lambda *a, **k: orig(*a, **{**k, "interpret": True})):
        fused_vars = fused.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(fused_vars) == \
            jax.tree_util.tree_structure(variables)
        got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_self6_fused_unshifted_matches():
    _ab((0, 0, 0))


def test_self6_fused_shifted_matches():
    # D == 6 clamps the d-shift to 0 (get_window_size) — the VRT 6-frame
    # training geometry
    _ab((3, 4, 4))


def test_self6_fused_multi_slab_shifted():
    # D=12: two 6-frame slabs — exercises the is_last_d pattern selection
    _ab((3, 4, 4), d=12, h=24, w=16, seed=4)


def test_self1_fused_per_frame_windows_match():
    # the (1,8,8) indep_reconsts tail (reference :1358): per-frame 2-D
    # windows ride the same kernel with wd=1
    _ab((0, 4, 4), ws=(1, 8, 8), d=3, h=16, w=24, seed=6)
    _ab((0, 0, 0), ws=(1, 8, 8), d=2, h=16, w=16, seed=7)


def test_self6_fused_w_chunked_grid_matches():
    # force the w-chunked grid (scoped-VMEM guard): budget of one window
    # per program, shifted masks must still pick is_last_w correctly
    import kair_tpu.ops.pallas.self6_block as s6
    with mock.patch.object(s6, "_token_budget", lambda c: 384):
        _ab((3, 4, 4), d=6, h=16, w=32, seed=9)
        _ab((0, 0, 0), d=6, h=16, w=32, seed=10)


def test_self2_fused_2frame_clip_matches():
    # D=2 clips clamp (6,8,8) windows to (2,8,8) (get_window_size) — the
    # self-TMSAG geometry of 2-frame training runs
    _ab((3, 4, 4), ws=(6, 8, 8), d=2, h=16, w=16, seed=8)


def test_self6_fused_gradients_match():
    """Grads through the custom VJP (jnp-reference recompute) == grads of
    the standard XLA path."""
    import kair_tpu.ops.pallas.self6_block as s6

    x = jnp.asarray(np.random.RandomState(5).rand(1, 6, 16, 16, C) * 0.5,
                    jnp.float32)
    std = TMSA(C, NH, WS, (3, 4, 4), mut_attn=False, geglu=True)
    variables = std.init(jax.random.PRNGKey(1), x)

    def loss_std(p):
        return jnp.mean(std.apply({"params": p}, x) ** 2)

    want_l, want_g = jax.value_and_grad(loss_std)(variables["params"])

    fused = TMSA(C, NH, WS, (3, 4, 4), mut_attn=False, geglu=True,
                 fuse_block=True)
    orig = s6.self6_block_pallas
    with mock.patch.object(s6, "self6_block_pallas",
                           lambda *a, **k: orig(*a, **{**k, "interpret": True})):
        def loss_fused(p):
            return jnp.mean(fused.apply({"params": p}, x) ** 2)
        got_l, got_g = jax.value_and_grad(loss_fused)(variables["params"])

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(want_g),
            jax.tree_util.tree_leaves_with_path(got_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5,
                                   rtol=2e-3, err_msg=str(kp))


@pytest.mark.slow
def test_vrt_model_fuse_block_fires_self6_and_matches():
    """Whole-model wiring: a fused tiny VRT must actually DISPATCH to the
    (6,8,8) self kernel (Stage group2 + the (6,8,8) RTMSA tail) and the
    (2,8,8) mutual kernel — and equal the XLA model. Guards against the
    round-3 regression where fuse_block was never plumbed into group2/RTMSA
    so the self6 kernel was dead code (vrt.py:729,1007)."""
    import kair_tpu.ops.pallas.self6_block as s6
    import kair_tpu.ops.pallas.tmsa_block as tb
    from kair_tpu.models.vrt import VRT

    cfg = dict(upscale=4, embed_dims=(24,) * 7 + (32,) * 6,
               depths=(2,) * 7 + (2,) * 6, num_heads=(2,) * 13,
               deformable_groups=2, pa_frames=2)
    x = jnp.asarray(np.random.RandomState(7).rand(1, 6, 64, 64, 3),
                    jnp.float32)
    std = VRT(**cfg)
    variables = std.init(jax.random.PRNGKey(0), x)
    want = np.asarray(std.apply(variables, x))

    calls = {"self6": 0, "mutual": 0}
    orig6, origt = s6.self6_block_pallas, tb.tmsa_block_pallas

    def wrap6(*a, **k):
        calls["self6"] += 1
        return orig6(*a, **{**k, "interpret": True})

    def wrapt(*a, **k):
        calls["mutual"] += 1
        return origt(*a, **{**k, "interpret": True})

    fused = VRT(**cfg, fuse_block=True)
    with mock.patch.object(s6, "self6_block_pallas", wrap6), \
            mock.patch.object(tb, "tmsa_block_pallas", wrapt):
        fused_vars = fused.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(fused_vars) == \
            jax.tree_util.tree_structure(variables)
        got = np.asarray(fused.apply(variables, x))

    assert calls["self6"] > 0, "self TMSAG/RTMSA never hit the fused kernel"
    assert calls["mutual"] > 0
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
