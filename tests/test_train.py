"""Training-layer tests: losses, schedulers, and an end-to-end smoke train
(tiny DnCNN on synthetic data; loss must drop and PSNR must beat the noisy
input — the reference has no such automated test, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest


# ----------------------------------------------------------------------------
# losses
# ----------------------------------------------------------------------------

def test_loss_values():
    import jax.numpy as jnp
    from kair_tpu.train import losses as L

    a = jnp.ones((2, 8, 8, 3)) * 0.5
    b = jnp.ones((2, 8, 8, 3)) * 0.25
    assert abs(float(L.l1_loss(a, b)) - 0.25) < 1e-6
    assert abs(float(L.l2_loss(a, b)) - 0.0625) < 1e-6
    assert abs(float(L.l2sum_loss(a, b)) - 0.0625 * a.size) < 1e-3
    assert abs(float(L.charbonnier_loss(a, a)) - np.sqrt(1e-9)) < 1e-6
    # ssim of identical images = 1 → loss 0
    assert float(L.ssim_loss(a, a)) < 1e-6
    assert float(L.ssim(a, a)) > 0.999


def test_ssim_matches_reference_torch():
    """Train-time SSIM vs the reference loss_ssim implementation."""
    import sys, types
    sys.path.insert(0, "/root/reference")
    for m in ("lpips", "pytorch_fid"):
        sys.modules.setdefault(m, types.ModuleType(m))
    import torch
    from models.loss_ssim import ssim as ref_ssim
    from kair_tpu.train.losses import ssim

    rng = np.random.RandomState(0)
    a = rng.rand(2, 3, 32, 32).astype(np.float32)
    b = np.clip(a + rng.randn(*a.shape).astype(np.float32) * 0.1, 0, 1)
    want = float(ref_ssim(torch.from_numpy(a), torch.from_numpy(b)))
    got = float(ssim(a.transpose(0, 2, 3, 1), b.transpose(0, 2, 3, 1)))
    assert abs(got - want) < 1e-5


def test_gan_losses():
    import jax.numpy as jnp
    from kair_tpu.train.losses import gan_loss

    logits = jnp.array([0.0, 2.0, -2.0])
    # BCE-with-logits at logit 0 vs label 1 = ln 2
    v = float(gan_loss(jnp.zeros(4), True, "gan"))
    assert abs(v - np.log(2)) < 1e-6
    assert float(gan_loss(logits, True, "wgan")) == -float(np.mean(logits))
    assert float(gan_loss(logits, False, "lsgan")) == pytest.approx(float(np.mean(logits ** 2)), rel=1e-6)


def test_poisson_ll():
    import jax.numpy as jnp
    from kair_tpu.train.losses import poisson_ll_loss

    # minimum at pred == target
    t = jnp.full((1, 4, 4, 1), 0.5)
    l_eq = float(poisson_ll_loss(t, t))
    l_neq = float(poisson_ll_loss(t * 0.8, t))
    assert l_eq < l_neq


# ----------------------------------------------------------------------------
# schedulers
# ----------------------------------------------------------------------------

def test_multistep():
    from kair_tpu.train.schedulers import multistep

    s = multistep(1e-3, [100, 200], 0.5)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(5e-4)
    assert float(s(250)) == pytest.approx(2.5e-4)


def test_cosine_restarts():
    from kair_tpu.train.schedulers import cosine_annealing_restarts

    s = cosine_annealing_restarts(1e-3, [100, 100], [1, 0.5], eta_min=0.0)
    assert float(s(0)) == pytest.approx(1e-3, rel=1e-5)
    assert float(s(50)) == pytest.approx(5e-4, rel=1e-2)
    assert float(s(100)) == pytest.approx(5e-4, rel=1e-5)  # restart at half weight


# ----------------------------------------------------------------------------
# regularizers
# ----------------------------------------------------------------------------

def test_regularizers():
    import jax.numpy as jnp
    from kair_tpu.train.regularizers import regularizer_clip, regularizer_orth

    params = {"conv": {"kernel": jnp.ones((3, 3, 4, 8)) * 2.0,
                       "bias": jnp.array([2.0, -2.0, 0.1])}}
    clipped = regularizer_clip(params)
    assert float(clipped["conv"]["kernel"][0, 0, 0, 0]) == pytest.approx(2.0 - 1e-4)
    assert float(clipped["conv"]["bias"][1]) == pytest.approx(-2.0 + 1e-4)
    orth = regularizer_orth(params)
    # singular values pulled toward [0.5, 1.5]
    mat = np.asarray(orth["conv"]["kernel"]).reshape(-1, 8)
    s = np.linalg.svd(mat, compute_uv=False)
    s0 = np.linalg.svd(np.asarray(params["conv"]["kernel"]).reshape(-1, 8),
                       compute_uv=False)
    assert s.max() <= s0.max()


# ----------------------------------------------------------------------------
# end-to-end smoke train through the CLI machinery
# ----------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainH")
    rng = np.random.RandomState(0)
    import cv2
    for i in range(8):
        img = (rng.rand(48, 48) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 2.0)  # smooth → learnable
        cv2.imwrite(str(root / f"im{i}.png"), img)
    return str(root)


def test_smoke_train(tiny_dataset, tmp_path):
    from kair_tpu import config
    from kair_tpu.cli.train import build_trainer
    from kair_tpu.data.base import Loader
    from kair_tpu.data.datasets import define_dataset
    import jax

    opt_json = {
        "task": "smoke", "model": "plain", "gpu_ids": [0],
        "scale": 1, "n_channels": 1,
        "datasets": {"train": {
            "dataset_type": "dncnn", "dataroot_H": tiny_dataset,
            "H_size": 32, "sigma": 25, "dataloader_batch_size": 4}},
        "netG": {"net_type": "dncnn", "in_nc": 1, "out_nc": 1,
                 "nc": 16, "nb": 5, "act_mode": "R"},
        "path": {"root": str(tmp_path)},
        "train": {"G_lossfn_type": "l1", "G_optimizer_lr": 1e-3,
                  "G_scheduler_milestones": [100000], "E_decay": 0.99},
    }
    p = tmp_path / "opt.json"
    p.write_text(json.dumps(opt_json))
    opt = config.parse(str(p), is_train=True)

    trainer = build_trainer(opt)
    ds = define_dataset(opt["datasets"]["train"])
    loader = Loader(ds, 4, seed=0)
    batch0 = next(iter(loader.epoch(0)))
    arrays0 = {k: v for k, v in batch0.items() if isinstance(v, np.ndarray)}
    state = trainer.init_state(jax.random.PRNGKey(0), arrays0)
    step = trainer.make_train_step(donate=False)

    losses = []
    for epoch in range(20):
        for batch in loader.epoch(epoch):
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            state, m = step(state, arrays)
            losses.append(float(m["G_loss"]))
    assert np.mean(losses[-6:]) < np.mean(losses[:6]) * 0.8, losses
    assert int(state.step) == len(losses)
    # EMA params exist and differ from params but are close
    d = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(),
                               state.params, state.ema_params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_eval_loop(tiny_dataset, tmp_path):
    """evaluate() on the test split returns finite PSNR/SSIM."""
    import jax
    from kair_tpu import config
    from kair_tpu.cli.train import build_trainer, evaluate
    from kair_tpu.data.base import Loader
    from kair_tpu.data.datasets import define_dataset

    opt_json = {
        "task": "smoke2", "model": "plain", "gpu_ids": [0],
        "scale": 1, "n_channels": 1,
        "datasets": {"test": {"dataset_type": "dncnn", "dataroot_H": tiny_dataset,
                              "sigma": 25, "sigma_test": 25}},
        "netG": {"net_type": "dncnn", "in_nc": 1, "out_nc": 1,
                 "nc": 16, "nb": 5, "act_mode": "R"},
        "path": {"root": str(tmp_path)},
        "train": {"G_lossfn_type": "l1", "G_optimizer_lr": 1e-3,
                  "G_scheduler_milestones": [1000]},
    }
    p = tmp_path / "opt.json"
    p.write_text(json.dumps(opt_json))
    opt = config.parse(str(p), is_train=True)
    trainer = build_trainer(opt)
    ds = define_dataset(opt["datasets"]["test"])
    loader = Loader(ds, 1, shuffle=False, drop_last=False)
    batch0 = next(iter(loader.epoch(0)))
    state = trainer.init_state(
        jax.random.PRNGKey(0),
        {k: v for k, v in batch0.items() if isinstance(v, np.ndarray)})
    psnr, ssim = evaluate(trainer, state, loader)
    assert np.isfinite(psnr) and 0 <= ssim <= 1
