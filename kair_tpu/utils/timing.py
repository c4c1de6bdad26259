"""Reliable device timing through the axon tunnel.

`block_until_ready` acks before queued work completes on the tunnelled
runtime (see .claude/skills/verify/SKILL.md), so all timing here chains K
iterations through a data dependency inside one jitted fori_loop and
fetches a scalar; per-iter cost = (t_K - t_1)/(K-1).
"""

from __future__ import annotations

import time
from typing import Callable


def chained_seconds(step: Callable, x0, k: int, trials: int = 3) -> float:
    """Best wall time for k chained `x = step(x)` iterations + scalar fetch."""
    import jax
    import jax.numpy as jnp

    def chain(a):
        out = jax.lax.fori_loop(0, k, lambda _, acc: step(acc), a)
        return jnp.sum(jax.tree_util.tree_leaves(out)[0])

    fn = jax.jit(chain)
    float(fn(x0))  # compile
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(fn(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_seconds(step: Callable, x0, k_long: int = 16,
                     trials: int = 3) -> float:
    """Per-iteration device time with tunnel overhead removed."""
    t_long = chained_seconds(step, x0, k_long, trials)
    t_short = chained_seconds(step, x0, 1, trials)
    return max((t_long - t_short) / (k_long - 1), 1e-9)
