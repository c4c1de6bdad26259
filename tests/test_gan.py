"""GAN trainer + discriminator tests."""

import numpy as np
import pytest


def _opt(gan_type="lsgan", d_type="discriminator_patchgan"):
    return {
        "netG": {"net_type": "msrresnet0", "in_nc": 3, "out_nc": 3,
                 "nc": 8, "nb": 2, "scale": 2, "act_mode": "R",
                 "upsample_mode": "upconv"},
        "netD": {"net_type": d_type, "in_nc": 3, "base_nc": 16,
                 "n_layers": 2, "norm_type": "spectral"},
        "train": {"G_lossfn_type": "l1", "G_lossfn_weight": 1.0,
                  "F_lossfn_weight": 0,
                  "gan_type": gan_type, "D_lossfn_weight": 0.1,
                  "G_optimizer_lr": 1e-4, "D_optimizer_lr": 1e-4,
                  "G_scheduler_milestones": [10000],
                  "D_scheduler_milestones": [10000],
                  "E_decay": 0.99},
    }


@pytest.mark.slow
def test_discriminators_run():
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.discriminator import (PatchGAN, UNetDiscriminator,
                                               VGGStyleDiscriminator)

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    d = PatchGAN(3, 16, 3)
    v = d.init(key, x)
    out = d.apply(v, x)
    assert out.shape[0] == 2 and out.shape[3] == 1

    d = UNetDiscriminator(3, 8)
    v = d.init(key, x)
    assert d.apply(v, x).shape == (2, 32, 32, 1)

    d = VGGStyleDiscriminator(96, 3, 8)
    x96 = jnp.zeros((2, 96, 96, 3))
    v = d.init(key, x96)
    assert d.apply(v, x96).shape == (2, 1)


def test_spectral_norm_scales_weight():
    """After SN, the conv's effective spectral norm is ~1."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.discriminator import SNConv

    m = SNConv(8, 3, 1, 1, spectral=True)
    x = jnp.ones((1, 8, 8, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    # run several power iterations to converge u
    spectral = v["spectral"]
    for _ in range(20):
        _, mut = m.apply({"params": v["params"], "spectral": spectral}, x,
                         train=True, mutable=["spectral"])
        spectral = mut["spectral"]
    k = np.asarray(v["params"]["kernel"]).reshape(-1, 8)
    u = np.asarray(spectral["u"])
    vvec = k @ u
    vvec /= np.linalg.norm(vvec)
    u2 = k.T @ vvec
    sigma = float(vvec @ (k @ (u2 / np.linalg.norm(u2))))
    true_sigma = np.linalg.svd(k, compute_uv=False)[0]
    assert abs(sigma - true_sigma) / true_sigma < 1e-3


@pytest.mark.parametrize("gan_type", ["lsgan", "gan", "ragan", "wgan", "softplusgan"])
def test_gan_smoke_train(gan_type):
    import jax
    from kair_tpu.train.gan import GanTrainer

    trainer = GanTrainer(_opt(gan_type))
    rng = np.random.RandomState(0)
    batch = {"L": rng.rand(2, 16, 16, 3).astype(np.float32),
             "H": rng.rand(2, 32, 32, 3).astype(np.float32)}
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_gd = trainer.make_train_step(update_g=True)
    step_d = trainer.make_train_step(update_g=False)

    for i in range(1, 5):
        fn = step_gd if trainer.should_update_g(i) else step_d
        state, metrics = fn(state, batch)
    assert np.isfinite(float(metrics["D_total"]))
    assert "G_loss" in metrics
    assert int(state.step) == 4


def test_d_update_cadence():
    from kair_tpu.train.gan import GanTrainer

    opt = _opt()
    opt["train"]["D_update_ratio"] = 2
    opt["train"]["D_init_iters"] = 2
    t = GanTrainer(opt)
    assert [t.should_update_g(i) for i in range(1, 7)] == \
        [False, False, False, True, False, True]


# ----------------------------------------------------------------------------
# StyleGAN2 regularizers vs the reference torch implementations
# (reference models/loss.py:222-290) with identical closed-form D/G nets
# ----------------------------------------------------------------------------

def _ref_losses():
    import sys, types
    sys.path.insert(0, "/root/reference")
    for m in ("lpips", "pytorch_fid", "torchvision"):
        sys.modules.setdefault(m, types.ModuleType(m))
    from models import loss as ref_loss
    return ref_loss


def test_r1_penalty_matches_torch_oracle():
    import torch
    import jax.numpy as jnp
    from kair_tpu.train.losses import r1_penalty

    ref = _ref_losses()
    rng = np.random.RandomState(0)
    x = rng.randn(3, 2, 4, 4).astype(np.float32)
    w = rng.randn(32, 5).astype(np.float32) * 0.3

    xt = torch.from_numpy(x).requires_grad_(True)
    pred = torch.tanh(xt.reshape(3, -1) @ torch.from_numpy(w)).sum(1)
    want = float(ref.r1_penalty(pred, xt))

    d_fn = lambda img: jnp.sum(
        jnp.tanh(img.reshape(3, -1) @ jnp.asarray(w)), axis=1)
    got = float(r1_penalty(d_fn, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_g_path_regularize_matches_torch_oracle():
    import torch
    from unittest import mock
    import jax.numpy as jnp
    from kair_tpu.train.losses import g_path_regularize

    ref = _ref_losses()
    rng = np.random.RandomState(1)
    b, nl, d, c, h, w_ = 2, 3, 8, 3, 4, 4
    latents = rng.randn(b, nl, d).astype(np.float32)
    wmat = rng.randn(nl * d, c * h * w_).astype(np.float32) * 0.3
    noise_raw = rng.randn(b, c, h, w_).astype(np.float32)
    mean_pl = 0.7

    lt = torch.from_numpy(latents).requires_grad_(True)
    fake = torch.tanh(lt.reshape(b, -1) @ torch.from_numpy(wmat)
                      ).reshape(b, c, h, w_)
    with mock.patch.object(torch, "randn_like",
                           lambda t: torch.from_numpy(noise_raw)):
        want_pen, want_len, want_mean = ref.g_path_regularize(fake, lt, mean_pl)

    def g_fn(z):
        return jnp.tanh(z.reshape(b, -1) @ jnp.asarray(wmat)
                        ).reshape(b, c, h, w_)

    noise = noise_raw / np.sqrt(h * w_)
    got_pen, got_len, got_mean = g_path_regularize(
        g_fn, jnp.asarray(latents), mean_pl, noise=jnp.asarray(noise))
    np.testing.assert_allclose(float(got_pen), float(want_pen), rtol=1e-4)
    np.testing.assert_allclose(float(got_len), float(want_len), rtol=1e-5)
    np.testing.assert_allclose(float(got_mean), float(want_mean), rtol=1e-5)


def test_gradient_penalty_matches_torch_oracle():
    import torch
    import jax.numpy as jnp
    from kair_tpu.train.losses import gradient_penalty_loss

    ref = _ref_losses()
    rng = np.random.RandomState(2)
    b, c, h, w_ = 3, 2, 4, 4
    real = rng.randn(b, c, h, w_).astype(np.float32)
    fake = rng.randn(b, c, h, w_).astype(np.float32)
    wmat = rng.randn(c * h * w_, 1).astype(np.float32) * 0.3
    alpha = rng.rand(b, 1, 1, 1).astype(np.float32)

    class TorchD(torch.nn.Module):
        def forward(self, x):
            return torch.tanh(x.reshape(x.shape[0], -1)
                              @ torch.from_numpy(wmat))

    import unittest.mock as mock
    with mock.patch.object(torch, "rand",
                           lambda *a, **k: torch.from_numpy(alpha)):
        want = float(ref.gradient_penalty_loss(
            TorchD(), torch.from_numpy(real), torch.from_numpy(fake)))

    d_fn = lambda x: jnp.tanh(x.reshape(b, -1) @ jnp.asarray(wmat))
    got = float(gradient_penalty_loss(
        d_fn, jnp.asarray(real), jnp.asarray(fake),
        alpha=jnp.asarray(alpha), channel_axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gan_train_step_with_r1_and_gp():
    """D step with R1 + WGAN-GP regularizers enabled (the GPEN/StyleGAN2
    training story): one jitted step, finite losses, D params move."""
    import jax
    from kair_tpu.train.gan import GanTrainer

    opt = _opt("wgan")
    opt["train"]["D_r1_weight"] = 10.0
    opt["train"]["D_gp_weight"] = 10.0
    trainer = GanTrainer(opt)
    rng = np.random.RandomState(1)
    batch = {"L": rng.rand(2, 16, 16, 3).astype(np.float32),
             "H": rng.rand(2, 32, 32, 3).astype(np.float32)}
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    d_before = jax.tree_util.tree_leaves(state.params_d)[0].copy()
    state, metrics = trainer.make_train_step(update_g=True)(state, batch)
    assert np.isfinite(float(metrics["D_total"]))
    d_after = jax.tree_util.tree_leaves(state.params_d)[0]
    assert not np.allclose(np.asarray(d_before), np.asarray(d_after))


def test_g_path_regularize_on_stylegan_generator():
    """Path-length regularization through the actual StyleGAN2 synthesis
    network (GPEN training smoke, reference loss.py:239-251 usage)."""
    import jax
    import jax.numpy as jnp
    from kair_tpu.models.gpen import StyleGANGenerator
    from kair_tpu.train.losses import g_path_regularize

    from kair_tpu.models.gpen import _CHANNELS

    model = StyleGANGenerator(size=16, style_dim=8, n_mlp=2,
                              channel_multiplier=1)
    rng = np.random.RandomState(2)
    b = 2
    n_latent = 6                      # log2(16)*2 - 2
    ch = _CHANNELS(1)
    # isconcat noise: channel count matches the feature map (encoder
    # features in FullGenerator; random here)
    noises = [jnp.asarray(rng.randn(b, r, r, ch[r]).astype(np.float32))
              for r in (4, 8, 16)]
    latent1 = jnp.asarray(rng.randn(b, 8).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), latent1, noises)

    def g_fn(lat):
        # (B, n_latent, D) per-layer latents -> synthesis only. The module
        # repeats a single w; feed w and let it broadcast (path reg over
        # the broadcast latent is the standard single-w variant).
        return model.apply(variables, lat, noises, input_is_latent=True)

    # input_is_latent path takes (B, D) and repeats internally; wrap so the
    # regularizer sees the (B, n_latent, D) convention via explicit repeat
    def g_fn_multi(lat_multi):
        return g_fn(lat_multi[:, 0])

    lat_multi = jnp.repeat(latent1[:, None, :], n_latent, axis=1)
    pen, plen, pmean = g_path_regularize(
        g_fn_multi, lat_multi, 0.0, rng=jax.random.PRNGKey(3))
    assert np.isfinite(float(pen)) and np.isfinite(float(plen))
    assert float(plen) > 0
