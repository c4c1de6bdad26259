"""Model summary: #params, FLOPs, #activations, peak memory — the analog
of the reference's hook-based counters (utils/utils_modelsummary.py:27-48)
and the challenge benchmark report (main_challenge_sr.py:99-171).

FLOPs come from XLA's own cost analysis of the compiled program (exact for
the lowered computation, including fusions), not per-module hooks.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


# Published bf16 peak TFLOP/s per chip, keyed by substrings of
# jax.devices()[0].device_kind (used for MFU self-scores; unknown kinds —
# e.g. CPU — report None rather than a wrong number).
PEAK_BF16_TFLOPS = {
    "v6e": 918.0, "v6": 918.0,
    "v5e": 197.0, "v5 lite": 197.0, "v5litepod": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
}


def peak_for_device_kind(kind: str) -> Optional[float]:
    k = kind.lower()
    for sub in ("v5litepod", "v5 lite", "v6e", "v5e", "v5p", "v6", "v4"):
        if sub in k:
            return PEAK_BF16_TFLOPS[sub]
    return None


def count_params(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def describe_model(model, variables) -> str:
    n = count_params(variables.get("params", variables))
    return (f"{type(model).__name__}: {n:,} params "
            f"({n * 4 / 1e6:.2f} MB fp32)")


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """Compile fn(*args) and return XLA's cost analysis
    (flops, bytes accessed, ...)."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # some backends return a list per computation
        ca = ca[0]
    return dict(ca or {})


def activation_count(fn: Callable, *args) -> int:
    """Total intermediate activation elements (eval_shape of all outputs of
    the jaxpr equations) — analog of get_model_activation
    (utils_modelsummary.py:48)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    total = 0
    for eqn in jaxpr.eqns:
        for var in eqn.outvars:
            aval = var.aval
            if hasattr(aval, "shape"):
                total += int(np.prod(aval.shape)) if aval.shape else 1
    return total


def summary_report(model, variables, x, extra_args=()) -> str:
    """main_challenge_sr-style report (main_challenge_sr.py:99-171)."""
    fn = lambda a: model.apply(variables, a, *extra_args)
    ca = cost_analysis(fn, x)
    n_params = count_params(variables.get("params", variables))
    flops = ca.get("flops", float("nan"))
    lines = [
        describe_model(model, variables),
        f"input {tuple(x.shape)}",
        f"FLOPs: {flops / 1e9:.2f} G",
        f"bytes accessed: {ca.get('bytes accessed', float('nan')) / 1e6:.1f} MB",
    ]
    return "\n".join(lines)
