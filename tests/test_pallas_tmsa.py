"""Fused TMSA Pallas kernel vs the XLA TMSA module (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kair_tpu.models.vrt import (TMSA, compute_mask_3d,
                                 rel_position_index_3d,
                                 sine_position_encoding)
from kair_tpu.ops.pallas.tmsa_block import (make_tmsa_biases,
                                            tmsa_block_pallas,
                                            tmsa_flat_params,
                                            tmsa_mask_patterns)

C, NH = 24, 4
WS = (2, 8, 8)


def _setup(shift):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(1, 4, 16, 16, C) * 0.5, jnp.float32)
    model = TMSA(C, NH, WS, shift, mut_attn=True, geglu=True)
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x))
    flat = tmsa_flat_params(variables["params"])
    pos = sine_position_encoding(8, 8, C // 2)
    pos2 = jnp.concatenate([jnp.asarray(pos)] * 2, axis=0)
    rel_idx = rel_position_index_3d(*WS)[:128, :128]
    return x, variables, want, flat, pos2, rel_idx


def test_tmsa_fused_unshifted_matches():
    x, variables, want, flat, pos2, rel_idx = _setup((0, 0, 0))
    bt = variables["params"]["attn"]["rel_bias_table"]
    bias_self, bias_mut = make_tmsa_biases(bt, rel_idx, NH, None)
    got = np.asarray(tmsa_block_pallas(x, flat, pos2, NH, bias_self,
                                       bias_mut, shifted=False,
                                       interpret=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_tmsa_fused_shifted_matches():
    ss = (1, 4, 4)
    x, variables, want, flat, pos2, rel_idx = _setup(ss)
    bt = variables["params"]["attn"]["rel_bias_table"]
    pats = tmsa_mask_patterns(4, 16, 16, WS, ss)
    bias_self, bias_mut = make_tmsa_biases(bt, rel_idx, NH, pats)
    xr = jnp.roll(x, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
    got = tmsa_block_pallas(xr, flat, pos2, NH, bias_self, bias_mut,
                            shifted=True, interpret=True)
    got = np.asarray(jnp.roll(got, (ss[0], ss[1], ss[2]), axis=(1, 2, 3)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_tmsag_fuse_block_matches_under_scan():
    """TMSAG(fuse_block=True) — fused TMSA kernel inside the nn.scan pair —
    must produce the SAME param tree as the standard path and matching
    outputs (interpret mode)."""
    from unittest import mock
    from kair_tpu.models.vrt import TMSAG
    import kair_tpu.ops.pallas.tmsa_block as tb

    x = jnp.asarray(np.random.RandomState(9).rand(1, 4, 16, 16, C) * 0.5,
                    jnp.float32)
    std = TMSAG(C, 4, NH, WS, mut_attn=True)
    variables = std.init(jax.random.PRNGKey(1), x)
    want = np.asarray(std.apply(variables, x))

    fused = TMSAG(C, 4, NH, WS, mut_attn=True, fuse_block=True)
    orig = tb.tmsa_block_pallas
    with mock.patch.object(tb, "tmsa_block_pallas",
                           lambda *a, **k: orig(*a, **{**k, "interpret": True})):
        fused_vars = fused.init(jax.random.PRNGKey(1), x)
        # identical param structure AND values (same submodules declare them)
        assert jax.tree_util.tree_structure(fused_vars) == \
            jax.tree_util.tree_structure(variables)
        got = np.asarray(fused.apply(variables, x))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_tmsa_fused_grads_match_xla():
    """Custom-VJP grads of the fused TMSA block == XLA autodiff (the
    trainable fused video attention of VERDICT r2 #3)."""
    ss = (1, 4, 4)
    x, variables, _, flat, pos2, rel_idx = _setup(ss)
    model = TMSA(C, NH, WS, ss, mut_attn=True, geglu=True)

    def loss_std(v, a):
        return jnp.sum(model.apply(v, a) ** 2)

    gx, gax = jax.jit(jax.grad(loss_std, argnums=(0, 1)))(variables, x)

    fused = TMSA(C, NH, WS, ss, mut_attn=True, geglu=True, fuse_block=True)

    def loss_fused(v, a):
        return jnp.sum(fused.apply(v, a) ** 2)

    from unittest import mock
    import kair_tpu.ops.pallas.tmsa_block as tb
    orig = tb.tmsa_block_pallas
    with mock.patch.object(tb, "tmsa_block_pallas",
                           lambda *a, **k: orig(*a, **{**k, "interpret": True})):
        gf, gaf = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(variables, x)

    np.testing.assert_allclose(np.asarray(gaf), np.asarray(gax),
                               atol=2e-4, rtol=1e-3)
    flatx = jax.tree_util.tree_leaves_with_path(gx)
    flatf = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in flatx:
        np.testing.assert_allclose(
            np.asarray(flatf[path]), np.asarray(leaf), atol=2e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path))


def test_tmsa_fused_w_chunked_grid_matches():
    """w wide enough to trigger the scoped-VMEM w-chunking (tokens >
    budget): shifted masks must still pick is_last_w on the LAST chunk
    only."""
    # D == 2 == ws[0] clamps the d-shift to 0 (get_window_size) — pass the
    # clamped shift so the direct kernel call matches the module
    ss = (0, 4, 4)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(1, 2, 16, 72, C) * 0.5, jnp.float32)
    model = TMSA(C, NH, WS, ss, mut_attn=True, geglu=True)
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x))
    flat = tmsa_flat_params(variables["params"])
    pos = sine_position_encoding(8, 8, C // 2)
    pos2 = jnp.concatenate([jnp.asarray(pos)] * 2, axis=0)
    rel_idx = rel_position_index_3d(*WS)[:128, :128]
    bt = variables["params"]["attn"]["rel_bias_table"]
    pats = tmsa_mask_patterns(2, 16, 72, WS, ss)
    bias_self, bias_mut = make_tmsa_biases(bt, rel_idx, NH, pats)
    import kair_tpu.ops.pallas.tmsa_block as tb
    xr = jnp.roll(x, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))
    got = tmsa_block_pallas(xr, flat, pos2, NH, bias_self, bias_mut,
                            shifted=True, interpret=True)
    got = np.asarray(jnp.roll(got, (ss[0], ss[1], ss[2]), axis=(1, 2, 3)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
