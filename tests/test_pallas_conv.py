"""Fused conv3x3+residual(+un-roll) strip kernel (ops/pallas/conv_block.py)
vs the jnp reference — forward, VJP, and the SwinIR fused-tail model path.
Runs in interpret mode on CPU (the real-TPU compile is exercised by
scripts/probe_mosaic.py and the driver bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kair_tpu.ops.pallas.conv_block import (_conv_res,
                                            conv3x3_residual_reference)


@pytest.mark.parametrize("shape,phase", [
    ((2, 16, 16, 12), 0),
    ((2, 16, 16, 12), 4),
    ((1, 32, 24, 20), 4),
    ((1, 24, 16, 8), 3),
])
def test_conv_residual_kernel_matches_reference(shape, phase):
    rng = np.random.RandomState(0)
    b, h, w, c = shape
    y = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    r = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)
    ref = conv3x3_residual_reference(y, r, k, bias, phase)
    got = _conv_res((phase, True), y, r, k, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_conv_residual_kernel_vjp_matches_reference():
    rng = np.random.RandomState(1)
    b, h, w, c, phase = 1, 16, 16, 10, 4
    y = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    r = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)

    f_ref = lambda *a: jnp.sum(jnp.sin(
        conv3x3_residual_reference(*a, phase)))
    f_pal = lambda *a: jnp.sum(jnp.sin(_conv_res((phase, True), *a)))
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(y, r, k, bias)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2, 3))(y, r, k, bias)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_swinir_fused_tail_param_tree_and_equality():
    """fuse_block inference (fused conv tail; on CPU it routes through the
    exact jnp reference) must keep the param tree checkpoint-identical to
    the plain path and produce the same outputs."""
    from unittest import mock
    from kair_tpu.models.swinir import SwinIR, fused_block_params
    import kair_tpu.ops.pallas.swin_block as sb

    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 1), jnp.float32)
    std = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(4,),
                 num_heads=(4,), window_size=8, mlp_ratio=2.0, upsampler="")
    variables = std.init(jax.random.PRNGKey(0), x)
    want = std.apply(variables, x)

    fused_vars = {"params": fused_block_params(variables["params"])}
    fused = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(4,),
                   num_heads=(4,), window_size=8, mlp_ratio=2.0,
                   upsampler="", fuse_block=True)
    orig2d = sb.swin_block_pallas_2d
    with mock.patch.object(
            sb, "swin_block_pallas_2d",
            lambda *a, **kw: orig2d(*a, **{**kw, "interpret": True})):
        got = fused.apply(fused_vars, x)
        # same tree both ways: init of the fused model must be loadable
        # into the standard one modulo the flat-block adaptation
        fused_init = fused.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    paths = lambda tree: {jax.tree_util.keystr(p)
                          for p, _ in jax.tree_util.tree_leaves_with_path(tree)}
    assert paths(fused_init["params"]) == paths(fused_vars["params"])
