"""Fork evaluation harness — counterpart of `ModelBase.evaluate_metrics`
(model_base.py:280-569): per-image, per-channel PSNR/SSIM(/LPIPS) at GLOBAL
(max over the whole val set) and LOCAL (per-image max) count normalisation,
optional re-Poissoned evaluation of the model output with repeat-sampled
local LPIPS, Poisson log-likelihood, and per-image loss.

LPIPS is optional (zero-egress: weights may be absent) — pass an
``lpips_fn(img_a_uint8_rgb, img_b_uint8_rgb) -> float`` or None.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from kair_tpu.utils import image as im
from kair_tpu.utils.spect import denormalize_spect, poisson_log_likelihood


def _channel_metrics(e_ch, h_ch, max_val, lpips_fn):
    """reference _compute_channel_metrics (model_base.py:357-380)."""
    e = np.clip(e_ch, 0, max_val)
    h = np.clip(h_ch, 0, max_val)
    if max_val > 0:
        e8 = (e / max_val * 255).astype(np.uint8)
        h8 = (h / max_val * 255).astype(np.uint8)
    else:
        e8 = np.zeros_like(e, np.uint8)
        h8 = np.zeros_like(h, np.uint8)
    e_rgb = np.stack([e8] * 3, axis=2)
    h_rgb = np.stack([h8] * 3, axis=2)
    psnr = im.calculate_psnr(e_rgb, h_rgb)
    ssim = im.calculate_ssim(e_rgb, h_rgb)
    lp = float(lpips_fn(e_rgb, h_rgb)) if lpips_fn else float("nan")
    return psnr, ssim, lp


def evaluate_images(
    imgs_e: Sequence[np.ndarray], imgs_h: Sequence[np.ndarray],
    lpips_fn: Optional[Callable] = None,
    add_poisson_noise: bool = False,
    lpips_local_repeat_n: int = 1,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, float]:
    """Images are HWC in the COUNTS domain (already denormalised).
    Returns averaged global/local PSNR/SSIM/LPIPS (+ PLL)."""
    rng = rng or np.random.default_rng(0)
    max_val_global = max(float(np.max(h)) for h in imgs_h)

    sums: Dict[str, float] = {k: 0.0 for k in
                              ("psnr", "ssim", "lpips", "psnr_local",
                               "ssim_local", "lpips_local", "pll")}
    n_total = 0
    for e_img, h_img in zip(imgs_e, imgs_h):
        if add_poisson_noise:
            # re-Poisson the estimate to compare like-with-like against the
            # Poisson-noisy H (fork semantics, model_base.py:404-470)
            e_used = rng.poisson(np.clip(e_img, 0, None)).astype(np.float64)
        else:
            e_used = e_img
        max_val_local = max(float(np.max(h_img)), 1e-12)
        nch = e_img.shape[2]
        for ch in range(nch):
            pg, sg, lg = _channel_metrics(e_used[:, :, ch], h_img[:, :, ch],
                                          max_val_global, lpips_fn)
            pl, sl, _ = _channel_metrics(e_used[:, :, ch], h_img[:, :, ch],
                                         max_val_local, None)
            if add_poisson_noise and lpips_fn and lpips_local_repeat_n > 1:
                lls = []
                for _ in range(lpips_local_repeat_n):
                    e_rs = rng.poisson(np.clip(e_img[:, :, ch], 0, None))
                    _, _, ll = _channel_metrics(e_rs, h_img[:, :, ch],
                                                max_val_local, lpips_fn)
                    lls.append(ll)
                ll = float(np.mean(lls))
            else:
                _, _, ll = _channel_metrics(e_used[:, :, ch], h_img[:, :, ch],
                                            max_val_local, lpips_fn)
            sums["psnr"] += pg
            sums["ssim"] += sg
            sums["lpips"] += lg
            sums["psnr_local"] += pl
            sums["ssim_local"] += sl
            sums["lpips_local"] += ll
            n_total += 1
        sums["pll"] += poisson_log_likelihood(np.clip(e_used, 0, None), h_img)
    out = {k: v / max(n_total, 1) for k, v in sums.items()}
    out["pll"] = sums["pll"] / max(len(imgs_e), 1)
    return out


def evaluate_model(eval_step: Callable, loader, normalization: dict,
                   lpips_fn: Optional[Callable] = None,
                   add_poisson_noise: bool = False,
                   lpips_local_repeat_n: int = 1,
                   loss_fn: Optional[Callable] = None) -> Dict[str, float]:
    """Run eval_step(batch)->E over a loader, denormalise to counts
    (reference _collect_test_data, model_base.py:308-349), compute metrics."""
    method = (normalization or {}).get("type", "linear")
    max_pixel = (normalization or {}).get("max_pixel", 150)
    imgs_e, imgs_h = [], []
    loss_sum, n = 0.0, 0
    for batch in loader.epoch(0):
        e = np.asarray(eval_step(batch))
        h = np.asarray(batch["H"])
        if loss_fn is not None:
            loss_sum += float(loss_fn(e, h))
        for i in range(e.shape[0]):
            imgs_e.append(denormalize_spect(e[i], method, max_pixel))
            imgs_h.append(denormalize_spect(h[i], method, max_pixel))
            n += 1
    metrics = evaluate_images(imgs_e, imgs_h, lpips_fn, add_poisson_noise,
                              lpips_local_repeat_n)
    metrics["loss"] = loss_sum / max(n, 1)
    return metrics
