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
