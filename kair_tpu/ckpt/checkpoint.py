"""Native pytree checkpointing with KAIR-style auto-resume naming.

The reference saves per-component torch files ``{iter}_{G|E|optimizerG|...}.pth``
(model_base.py:158-245) and resumes from the max-iter file
(utils_option.py:213-235). We keep the same file-naming contract (so
`config.find_last_checkpoint` works unchanged) but each file is a single
msgpack-serialised JAX pytree, saved from host RAM (device→host copy is the
analog of the reference's `.cpu()` move in model_base.py:160-165).

The fork's rolling retention (delete older checkpoints of the same tag,
model_plain.py:149-176) and best-model tracking (model_base.py:170-196)
are provided as `prune_old` / `save_best`.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(tree: Any, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # to_state_dict handles flax.struct dataclasses (e.g. TrainState) and
    # optax named tuples; msgpack only packs plain containers.
    data = serialization.msgpack_serialize(_to_host(serialization.to_state_dict(tree)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic publish
    return path


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    tree = serialization.msgpack_restore(data)
    if target is not None:
        tree = serialization.from_state_dict(target, tree)
    return tree


def save_tagged(save_dir: str, step: int, tag: str, tree: Any) -> str:
    """Save ``{step}_{tag}.ckpt`` (reference naming: model_base.py:158)."""
    return save_pytree(tree, os.path.join(save_dir, f"{step}_{tag}.ckpt"))


def prune_old(save_dir: str, tag: str, keep_step: int) -> None:
    """Delete all ``*_{tag}.ckpt`` except ``keep_step`` (fork rolling
    retention, model_plain.py:149-176)."""
    for f in glob.glob(os.path.join(save_dir, f"*_{tag}.ckpt")):
        m = re.findall(rf"(\d+)_{tag}\.ckpt", f)
        if m and int(m[0]) != keep_step:
            os.remove(f)


def save_best(save_dir: str, metric_name: str, tag: str, tree: Any) -> str:
    """Save ``bestmodel/best_{metric}_{tag}.ckpt``, replacing any previous
    best (fork: model_base.py:170-196)."""
    best_dir = os.path.join(save_dir, "bestmodel")
    os.makedirs(best_dir, exist_ok=True)
    for f in glob.glob(os.path.join(best_dir, f"best_{metric_name}_*_{tag}.ckpt")):
        os.remove(f)
    return save_pytree(tree, os.path.join(best_dir, f"best_{metric_name}_{tag}.ckpt"))
