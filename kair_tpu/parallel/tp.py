"""Tensor parallelism via parameter sharding specs.

The reference has no TP (SURVEY §2.5 — it scales by DDP only); this is the
TPU-native extension for models whose params exceed one chip: annotate
weight shardings over a 'model' mesh axis and let GSPMD insert the
collectives. The Megatron pairing keeps comms minimal for transformer
blocks: fc1/qkv column-parallel (output dim sharded), fc2/proj row-parallel
(input dim sharded) — one psum per block on the row-parallel matmul.

Specs are matched by parameter path, so the same rules cover params, EMA
params and optimizer moments (optax state mirrors the param tree and the
path contains the same names).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, spec) — first match wins; default replicated.
# Covers SwinIR/VRT/RVRT block params (qkv_kernel/proj_kernel raw params,
# fc1/fc2 nn.Dense) and generic transformer naming.
TP_RULES: List[Tuple[str, P]] = [
    (r"qkv(_self|_mut)?_kernel$", P(None, "model")),   # column-parallel
    (r"qkv(_self|_mut)?_bias$", P("model")),
    (r"proj_kernel$", P("model", None)),               # row-parallel
    (r"fc1/kernel$|fc1_kernel$", P(None, "model")),    # column-parallel
    (r"fc1/bias$|fc1_bias$", P("model")),
    (r"fc2/kernel$|fc2_kernel$", P("model", None)),    # row-parallel
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "name", k))))
    return "/".join(parts)


def tp_state_shardings(mesh: Mesh, state, rules: Sequence = None):
    """Pytree of NamedSharding for a TrainState (params/EMA/opt moments):
    TP specs where a rule matches the leaf path, replicated otherwise.
    Leaves whose matched dimension does not divide the 'model' axis fall
    back to replicated (GSPMD requires even shards)."""
    rules = list(rules if rules is not None else TP_RULES)
    model_size = mesh.shape.get("model", 1)

    def spec(path, leaf):
        p = _path_str(path)
        for pat, s in rules:
            if re.search(pat, p):
                # check divisibility of each sharded dim
                ok = hasattr(leaf, "shape") and len(s) <= getattr(leaf, "ndim", 0)
                if ok:
                    for d, axis in enumerate(s):
                        if axis == "model" and leaf.shape[d] % model_size:
                            ok = False
                if ok:
                    return NamedSharding(mesh, s)
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_state(mesh: Mesh, state, rules: Sequence = None):
    """Place a TrainState with TP param shardings (replicated elsewhere)."""
    shardings = tp_state_shardings(mesh, state, rules)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
