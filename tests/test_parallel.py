"""Multi-device tests on the virtual 8-CPU mesh: data-parallel training
equivalence and shard_map halo-tiled inference correctness — capabilities
the reference can only test by running real multi-GPU jobs (SURVEY.md §4.6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kair_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_state, shard_batch
from kair_tpu.parallel.tiled import make_sharded_tiled_fn


requires_8dev = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@requires_8dev
def test_data_parallel_training_matches_single_device():
    """Same batch, same init → sharded step == single-device step."""
    from kair_tpu.train.trainer import PlainTrainer

    opt = {"netG": {"net_type": "dncnn", "in_nc": 1, "out_nc": 1,
                    "nc": 8, "nb": 4, "act_mode": "R"},
           "train": {"G_lossfn_type": "l1", "G_optimizer_lr": 1e-3,
                     "G_scheduler_milestones": [10000], "E_decay": 0}}
    trainer = PlainTrainer(opt)
    rng = np.random.RandomState(0)
    batch = {"L": rng.rand(8, 16, 16, 1).astype(np.float32),
             "H": rng.rand(8, 16, 16, 1).astype(np.float32)}

    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.make_train_step(donate=False)

    # single device
    s1, m1 = step(state, batch)

    # 8-device data parallel
    mesh = make_mesh(data=8, tile=1)
    state_r = replicate_state(mesh, state)
    batch_s = shard_batch(mesh, batch)
    s8, m8 = step(state_r, batch_s)

    assert abs(float(m1["G_loss"]) - float(m8["G_loss"])) < 1e-6
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               s1.params, s8.params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-6


@requires_8dev
def test_sharded_tiled_inference_denoiser():
    """Halo-tiled DnCNN over 8 row-bands == monolithic forward."""
    from kair_tpu.models.dncnn import DnCNN

    model = DnCNN(1, 1, 16, 4, "R")  # receptive field 9 (4 conv3x3)
    x = np.random.RandomState(1).rand(1, 64, 48, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    fn = lambda a: model.apply(variables, a)

    want = np.asarray(fn(x))
    mesh = make_mesh(data=1, tile=8)
    tiled = make_sharded_tiled_fn(fn, mesh, halo=8, sf=1)
    got = np.asarray(tiled(x))
    np.testing.assert_allclose(got, want, atol=1e-5)


@requires_8dev
def test_sharded_tiled_inference_sr():
    """Halo-tiled ×4 SR (MSRResNet1's bilinear-residual is halo-friendly in
    its conv trunk? use MSRResNet0: pure conv) matches monolithic output."""
    from kair_tpu.models.srresnet import MSRResNet0

    model = MSRResNet0(1, 1, 8, 2, 4, "R", "upconv")
    x = np.random.RandomState(2).rand(1, 32, 24, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    fn = lambda a: model.apply(variables, a)

    want = np.asarray(fn(x))
    mesh = make_mesh(data=1, tile=8)
    # receptive field of 2 resblocks + head/tail ≈ 17 → halo 12 rows of LR
    tiled = make_sharded_tiled_fn(fn, mesh, halo=12, sf=4)
    got = np.asarray(tiled(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@requires_8dev
def test_sharded_tiled_swinir_window_local():
    """SwinIR windows are tile-local: halo = window_size gives near-exact
    tiled outputs for the unshifted path and close for shifted."""
    from kair_tpu.models.swinir import SwinIR

    model = SwinIR(upscale=1, in_chans=1, embed_dim=16, depths=(2,),
                   num_heads=(2,), window_size=8, mlp_ratio=2.0, upsampler="")
    x = np.random.RandomState(3).rand(1, 64, 32, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    fn = lambda a: model.apply(variables, a)

    want = np.asarray(fn(x))
    mesh = make_mesh(data=1, tile=8)
    tiled = make_sharded_tiled_fn(fn, mesh, halo=16, sf=1)
    got = np.asarray(tiled(x))
    close = np.abs(got - want) < 1e-4
    assert close.mean() > 0.995, close.mean()
