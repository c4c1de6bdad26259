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


@requires_8dev
def test_tensor_parallel_training_matches_single_device():
    """dp(2) x tp(2) x tile(2) sharded SwinIR train step == single-device
    step (GSPMD inserts the Megatron collectives; numerics must agree)."""
    from kair_tpu.parallel.tp import TP_RULES, shard_state, tp_state_shardings
    from kair_tpu.train.trainer import PlainTrainer

    opt = {"netG": {"net_type": "swinir", "upscale": 2, "in_nc": 3,
                    "embed_dim": 16, "depths": [2], "num_heads": [2],
                    "window_size": 8, "mlp_ratio": 2.0,
                    "upsampler": "pixelshuffledirect", "img_size": 16},
           "train": {"G_lossfn_type": "l1", "G_optimizer_lr": 1e-3,
                     "G_scheduler_milestones": [10000], "E_decay": 0.999}}
    trainer = PlainTrainer(opt)
    rng = np.random.RandomState(0)
    batch = {"L": rng.rand(8, 16, 16, 3).astype(np.float32),
             "H": rng.rand(8, 32, 32, 3).astype(np.float32)}
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.make_train_step(donate=False)
    s1, m1 = step(state, batch)

    mesh = make_mesh(data=2, model=2, tile=2)
    # the rules must actually shard the attention/MLP weights over 'model'
    specs = tp_state_shardings(mesh, state.params)
    sharded_paths = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, s in jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(lambda s: s.spec, specs,
                                   is_leaf=lambda x: hasattr(x, "spec")))
        if "model" in str(s)]
    assert any("qkv_kernel" in p for p in sharded_paths)
    assert any("fc1" in p for p in sharded_paths)

    state_tp = shard_state(mesh, state)
    batch_tp = shard_batch(mesh, batch)
    s2, m2 = step(state_tp, batch_tp)

    np.testing.assert_allclose(float(m1["G_loss"]), float(m2["G_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@requires_8dev
def test_tp_indivisible_dims_fall_back_to_replicated():
    """A 'model'-sharded dim that doesn't divide the axis must not crash —
    the rule falls back to replicated for that leaf."""
    from kair_tpu.parallel.tp import tp_state_shardings

    mesh = make_mesh(data=2, model=2, tile=2)
    params = {"blk": {"qkv_kernel": jnp.zeros((6, 18)),   # 18 % 2 == 0
                      "fc1": {"kernel": jnp.zeros((6, 13))}}}  # 13 % 2 != 0
    specs = tp_state_shardings(mesh, params)
    assert "model" in str(specs["blk"]["qkv_kernel"].spec)
    assert str(specs["blk"]["fc1"]["kernel"].spec) == "PartitionSpec()"


def test_first_slurm_hostname():
    """Compressed SLURM nodelist syntax (the reference resolves via
    scontrol, utils_dist.py:38-42; our fallback parser must agree)."""
    from kair_tpu.parallel.launch import first_slurm_hostname

    assert first_slurm_hostname("node01") == "node01"
    assert first_slurm_hostname("node1,node2") == "node1"
    assert first_slurm_hostname("node[01-04]") == "node01"
    assert first_slurm_hostname("node[01-04,07],other[1-2]") == "node01"
    assert first_slurm_hostname("gpu-a[003-008]-ib") == "gpu-a003-ib"
    assert first_slurm_hostname("host[7]") == "host7"


def test_grid_sharded_dncnn_exact_nonreplicated():
    """2-D (4x2) tile grid with a NON-replicated input: per-device slice is
    1/8 of the image, halos ppermute-exchanged, and the stitched output is
    bit-near the monolithic forward INCLUDING true borders (the clamped
    window reproduces conv zero-pad semantics there)."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.dncnn import DnCNN
    from kair_tpu.parallel.mesh import make_grid_mesh
    from kair_tpu.parallel.tiled import grid_sharding, make_grid_sharded_fn

    mesh = make_grid_mesh(4, 2, jax.devices()[:8])
    dn = DnCNN(1, 1, 8, 4, "R")
    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 1).astype(np.float32)
    variables = dn.init(jax.random.PRNGKey(1), x)
    fn = lambda a: dn.apply(variables, a)

    want = np.asarray(jax.jit(fn)(x))
    xs = jax.device_put(x, grid_sharding(mesh))
    # the sharded input really is distributed: each addressable shard holds
    # a (16, 32) tile, not the full image
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(1, 16, 32, 1)}
    tiled = make_grid_sharded_fn(fn, mesh, halo=4, sf=1)
    got = np.asarray(tiled(xs))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_grid_sharded_swinir_window_aligned():
    """SwinIR on a 2x4 grid with window-aligned tiles + halo: interior
    seams and borders match the monolithic forward (window partition stays
    aligned because tile size, halo, and clamp offsets are all multiples
    of the window)."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.swinir import SwinIR
    from kair_tpu.parallel.mesh import make_grid_mesh
    from kair_tpu.parallel.tiled import grid_sharding, make_grid_sharded_fn

    mesh = make_grid_mesh(2, 4, jax.devices()[:8])
    model = SwinIR(upscale=1, in_chans=1, embed_dim=24, depths=(2,),
                   num_heads=(4,), window_size=8, mlp_ratio=2.0, upsampler="")
    rng = np.random.RandomState(2)
    x = rng.rand(1, 64, 128, 1).astype(np.float32)   # tiles 32x32
    variables = model.init(jax.random.PRNGKey(3), x)
    fn = lambda a: model.apply(variables, a)

    want = np.asarray(jax.jit(fn)(x))
    xs = jax.device_put(x, grid_sharding(mesh))
    tiled = make_grid_sharded_fn(fn, mesh, halo=16, sf=1)
    got = np.asarray(tiled(xs))
    np.testing.assert_allclose(got, want, atol=2e-5)


@requires_8dev
@pytest.mark.slow
def test_grid_sharded_video_vrt_matches_host_loop():
    """Mesh-sharded VIDEO tiled inference (VERDICT r2 #5): a tiny VRT's
    spatial tile grid runs across a 2x2 device mesh in ONE program —
    per-device input strictly smaller than the frame — and equals the
    host-loop clamped-window tiling (eval.video_test.test_clip_grid)
    bit-for-bit."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.vrt import VRT
    from kair_tpu.eval.video_test import test_clip_grid
    from kair_tpu.parallel.mesh import make_grid_mesh
    from kair_tpu.parallel.tiled import (make_grid_sharded_video_fn,
                                         video_grid_sharding)

    model = VRT(upscale=4, in_chans=3, out_chans=3, window_size=(2, 8, 8),
                depths=(2,) * 8, embed_dims=(12,) * 7 + (16,),
                num_heads=(2,) * 8, pa_frames=2, deformable_groups=2)
    rng = np.random.RandomState(0)
    x = rng.rand(1, 2, 96, 96, 3).astype(np.float32)
    # init at the WINDOW geometry (tile+2*halo): VRT's rel-bias tables
    # clamp with window extent at the /8 scale, so window size must be a
    # multiple of 64 for geometry-independent params
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:, :, :64, :64])
    fn = lambda a: model.apply(variables, a)

    halo, tile = 8, (48, 48)
    want = test_clip_grid(jax.jit(fn), x, sf=4, tile=tile, halo=halo)

    mesh = make_grid_mesh(2, 2, jax.devices()[:4])
    xs = jax.device_put(x, video_grid_sharding(mesh))
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(1, 2, 48, 48, 3)}   # strictly smaller tiles
    tiled = make_grid_sharded_video_fn(fn, mesh, halo=halo, sf=4)
    got = np.asarray(tiled(xs))
    assert got.shape == (1, 2, 384, 384, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@requires_8dev
def test_cli_train_data_parallel(tmp_path):
    """cli.train with gpu_ids [0..7] builds the ('data',) mesh and runs
    sharded steps out of the box (the reference needs torchrun+DDP for
    this, main_train_psnr.py:36-60)."""
    import json
    import os

    import imageio.v2 as iio

    from kair_tpu.cli import train as cli_train

    rng = np.random.RandomState(0)
    (tmp_path / "trainH").mkdir()
    for i in range(16):
        iio.imwrite(str(tmp_path / "trainH" / f"im{i}.png"),
                    (rng.rand(48, 48) * 255).astype(np.uint8))
    opt = {
        "task": "dp_smoke", "model": "plain",
        "gpu_ids": list(range(8)), "scale": 1, "n_channels": 1,
        "path": {"root": str(tmp_path / "runs")},
        "datasets": {"train": {
            "name": "t", "dataset_type": "dncnn",
            "dataroot_H": str(tmp_path / "trainH"), "H_size": 16,
            "sigma": 25, "sigma_test": 25, "dataloader_shuffle": True,
            "dataloader_num_workers": 0, "dataloader_batch_size": 8}},
        "netG": {"net_type": "dncnn", "in_nc": 1, "out_nc": 1, "nc": 8,
                 "nb": 3, "act_mode": "R", "init_type": "orthogonal",
                 "init_gain": 0.2},
        "train": {"G_lossfn_type": "l1", "G_optimizer_lr": 1e-3,
                  "G_scheduler_milestones": [1000], "E_decay": 0,
                  "manual_seed": 0, "checkpoint_print": 1,
                  "checkpoint_save": 1000, "checkpoint_test": 1000},
    }
    opt_path = tmp_path / "opt.json"
    opt_path.write_text(json.dumps(opt))
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        state = cli_train.main(argv=["--opt", str(opt_path),
                                     "--max_steps", "3"])
    finally:
        os.chdir(cwd)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # params were mesh-placed (replicated over all 8 devices)
    assert len(leaves[0].sharding.device_set) == 8
