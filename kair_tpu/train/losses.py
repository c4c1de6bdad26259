"""Training losses (functional, jit-friendly).

Menu matches the reference trainer's selections
(model_plain.py:181-205 / models/loss.py / models/loss_ssim.py):
l1, l2, l2sum, ssim, charbonnier, poisson (fork), plus TV and GAN losses
(gan/ragan=BCE-with-logits, lsgan=MSE, wgan, softplusgan — loss.py:136-173)
used by the GAN trainer (model_gan.py:122-160).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def l2sum_loss(pred, target):
    return jnp.sum((pred - target) ** 2)


def charbonnier_loss(pred, target, eps: float = 1e-9):
    """reference loss.py:208-219 (note: eps is added UNsquared, matching the
    reference exactly)."""
    diff = pred - target
    return jnp.mean(jnp.sqrt(diff * diff + eps))


def tv_loss(x, weight: float = 1.0):
    """Total variation (reference loss.py:179-204); x is NHWC."""
    n, h, w, c = x.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, : h - 1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, : w - 1, :]) ** 2)
    return weight * 2 * (h_tv / count_h + w_tv / count_w) / n


def _ssim_window(window_size: int = 11, sigma: float = 1.5):
    g = jnp.exp(-((jnp.arange(window_size) - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred, target, window_size: int = 11):
    """Differentiable SSIM on NHWC [0,1] images with SAME padding per-channel
    depthwise windows (reference loss_ssim.py:27-47)."""
    c = pred.shape[-1]
    w2d = _ssim_window(window_size).astype(pred.dtype)
    kernel = jnp.broadcast_to(w2d[:, :, None, None], (window_size, window_size, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = filt(pred), filt(target)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(pred * pred) - mu1_sq
    s2 = filt(target * target) - mu2_sq
    s12 = filt(pred * target) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(ssim_map)


def ssim_loss(pred, target):
    """1 - SSIM (train objective; reference SSIMLoss returns ssim, selected
    negatively by convention — we expose the minimizable form)."""
    return 1.0 - ssim(pred, target)


def denormalize_spect(img, method: str = "linear", max_pixel: float = 150.0):
    """Undo SPECT normalisation back to counts (reference loss.py:310-319 and
    utils_spect semantics)."""
    if method == "log":
        return jnp.exp(img * math.log(max_pixel + 1.0)) - 1.0
    if method == "anscombe":
        return (math.sqrt(max_pixel + 3.0 / 8.0) * img) ** 2 - 3.0 / 8.0
    if method == "linear":
        return img * max_pixel
    raise ValueError(f"Unknown normalization method: {method}")


def poisson_ll_loss(pred, target, normalization_method: str = "linear",
                    max_pixel: float = 150.0, epsilon: float = 1e-9):
    """Negative Poisson log-likelihood in the counts domain
    (fork, reference loss.py:294-345)."""
    lam = jnp.clip(denormalize_spect(pred, normalization_method, max_pixel), epsilon, None)
    k = jnp.clip(denormalize_spect(target, normalization_method, max_pixel), 0.0, None)
    return -jnp.mean(k * jnp.log(lam) - lam)


def gan_loss(logits, target_is_real: bool, gan_type: str = "gan",
             real_label: float = 1.0, fake_label: float = 0.0):
    """Functional GANLoss (reference loss.py:136-173). For 'ragan' callers
    pass relativised logits, same as the reference does at the call site
    (model_gan.py:242-251)."""
    gan_type = gan_type.lower()
    if gan_type in ("gan", "ragan"):
        label = real_label if target_is_real else fake_label
        target = jnp.full_like(logits, label)
        # BCEWithLogits
        return jnp.mean(jnp.clip(logits, 0, None) - logits * target +
                        jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if gan_type == "lsgan":
        label = real_label if target_is_real else fake_label
        return jnp.mean((logits - label) ** 2)
    if gan_type == "wgan":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    if gan_type == "softplusgan":
        return jnp.mean(jax.nn.softplus(-logits)) if target_is_real \
            else jnp.mean(jax.nn.softplus(logits))
    raise NotImplementedError(f"GAN type [{gan_type}] is not found")


def get_loss_fn(name: str, opt_train: Optional[dict] = None) -> Callable:
    """Loss selection mirroring model_plain.py:181-205."""
    opt_train = opt_train or {}
    if name == "l1":
        return l1_loss
    if name == "l2":
        return l2_loss
    if name == "l2sum":
        return l2sum_loss
    if name == "ssim":
        return ssim_loss
    if name == "charbonnier":
        return partial(charbonnier_loss,
                       eps=opt_train.get("G_charbonnier_eps") or 1e-9)
    if name == "poisson":
        return partial(
            poisson_ll_loss,
            normalization_method=opt_train.get("G_poisson_normalization_method") or "linear",
            max_pixel=opt_train.get("G_poisson_max_pixel") or 150.0,
            epsilon=opt_train.get("G_poisson_epsilon") or 1e-9)
    raise NotImplementedError(f"Loss type [{name}] is not found.")


# ----------------------------------------------------------------------------
# StyleGAN2 training regularizers (reference models/loss.py:222-290)
# ----------------------------------------------------------------------------

def r1_penalty(d_fn: Callable, real_img):
    """R1 gradient penalty on real data (reference loss.py:222-237):
    mean over batch of the squared L2 norm of d D(real)/d real.

    d_fn: real_img -> per-sample prediction (any trailing shape)."""
    grad = jax.grad(lambda img: jnp.sum(d_fn(img)))(real_img)
    b = grad.shape[0]
    return jnp.mean(jnp.sum(jnp.square(grad).reshape(b, -1), axis=1))


def g_path_regularize(g_fn: Callable, latents, mean_path_length,
                      noise=None, rng=None, decay: float = 0.01):
    """StyleGAN2 path-length regularization (reference loss.py:239-251).

    g_fn: latents (B, n_latent, D) -> fake image (B, H, W, C) — this
    framework's NHWC layout; the default noise is normalized by
    sqrt(H*W) = sqrt(shape[1]*shape[2]) (the reference normalizes by its
    NCHW shape[2]*shape[3], loss.py:240-241 — same quantity). Pass
    `noise` explicitly for any other layout.

    Returns (path_penalty, mean(path_lengths), new_mean_path_length) — the
    last is stop-gradiented, carry it as training state."""
    fake, vjp = jax.vjp(g_fn, latents)
    if noise is None:
        hw = fake.shape[1] * fake.shape[2] if fake.ndim == 4 else fake.size
        noise = jax.random.normal(rng, fake.shape, fake.dtype) / math.sqrt(hw)
    grad = vjp(noise)[0]                                  # (B, n_latent, D)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grad), axis=2),
                                     axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths)
                                            - mean_path_length)
    path_penalty = jnp.mean(jnp.square(path_lengths - path_mean))
    return (path_penalty, jax.lax.stop_gradient(jnp.mean(path_lengths)),
            jax.lax.stop_gradient(path_mean))


def gradient_penalty_loss(d_fn: Callable, real_data, fake_data,
                          alpha=None, rng=None, weight=None,
                          channel_axis: int = -1):
    """WGAN-GP gradient penalty (reference loss.py:254-290): the gradient
    of D at a random interpolate must have unit L2 norm over the channel
    axis. channel_axis=-1 for our NHWC tensors (the reference's dim=1 is
    NCHW's channel)."""
    b = real_data.shape[0]
    if alpha is None:
        alpha = jax.random.uniform(rng, (b,) + (1,) * (real_data.ndim - 1),
                                   real_data.dtype)
    interp = alpha * real_data + (1.0 - alpha) * fake_data
    out, vjp = jax.vjp(d_fn, interp)
    grads = vjp(jnp.ones_like(out))[0]
    if weight is not None:
        grads = grads * weight
    norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=channel_axis) + 0.0)
    gp = jnp.mean(jnp.square(norms - 1.0))
    if weight is not None:
        gp = gp / jnp.mean(weight)
    return gp
