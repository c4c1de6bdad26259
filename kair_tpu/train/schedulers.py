"""LR schedules as pure step→lr functions (optax-compatible).

The reference uses torch MultiStepLR and a cosine-annealing-with-restarts
scheduler configured by (periods, restart_weights, eta_min)
(model_plain.py:227-240). The latter signature is the BasicSR
CosineAnnealingRestartLR contract; we implement those semantics.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from typing import Callable, List, Sequence

import jax.numpy as jnp
import numpy as np


def multistep(base_lr: float, milestones: Sequence[int], gamma: float = 0.5) -> Callable:
    """lr = base * gamma^(#milestones passed) (torch MultiStepLR semantics)."""
    ms = np.asarray(sorted(milestones))

    def schedule(step):
        n = jnp.sum(step >= jnp.asarray(ms)) if ms.size else 0
        return base_lr * gamma ** n

    return schedule


def cosine_annealing_restarts(base_lr: float, periods: Sequence[int],
                              restart_weights=1, eta_min: float = 0.0) -> Callable:
    """BasicSR-style CosineAnnealingRestartLR: piecewise cosine cycles of
    lengths `periods`, each scaled by its restart weight.  A scalar period
    means a single cycle (the VRT options write `G_scheduler_periods: 300000`,
    reference options/vrt/001:96)."""
    if isinstance(periods, (int, float)):
        periods = [int(periods)]
    periods = list(periods)
    if isinstance(restart_weights, (int, float)):
        restart_weights = [restart_weights] * len(periods)
    assert len(restart_weights) == len(periods)
    cum = np.cumsum([0] + periods)

    starts = jnp.asarray(cum[:-1], dtype=jnp.float32)
    lens = jnp.asarray(periods, dtype=jnp.float32)
    weights = jnp.asarray(restart_weights, dtype=jnp.float32)

    def schedule(step):
        step = jnp.minimum(jnp.asarray(step, jnp.float32), float(cum[-1]) - 1.0)
        idx = jnp.clip(jnp.searchsorted(jnp.asarray(cum[1:], jnp.float32), step,
                                        side="right"), 0, len(periods) - 1)
        t = (step - starts[idx]) / lens[idx]
        w = weights[idx]
        return eta_min + w * 0.5 * (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t))

    return schedule


def get_schedule(opt_train: dict) -> Callable:
    """Scheduler selection mirroring model_plain.py:227-240."""
    stype = opt_train.get("G_scheduler_type") or "MultiStepLR"
    lr = opt_train["G_optimizer_lr"]
    if stype == "MultiStepLR":
        return multistep(lr, opt_train.get("G_scheduler_milestones") or [],
                         opt_train.get("G_scheduler_gamma") or 0.5)
    if stype == "CosineAnnealingWarmRestarts":
        return cosine_annealing_restarts(
            lr, opt_train["G_scheduler_periods"],
            opt_train.get("G_scheduler_restart_weights") or 1,
            opt_train.get("G_scheduler_eta_min") or 0.0)
    raise NotImplementedError(f"scheduler [{stype}]")
