"""Video trainer — counterpart of ModelVRT (model_vrt.py:16-77): the plain
trainer plus flow-network parameter freezing for the first `fix_iter`
steps and a separate LR multiplier for `fix_keys` params (e.g. 'spynet').

Implemented with optax.multi_transform over a name mask — the functional
analog of the reference's requires_grad flipping + param groups."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from kair_tpu.train.schedulers import get_schedule
from kair_tpu.train.trainer import PlainTrainer, TrainState


def _name_mask(params, keys: Sequence[str]):
    """Pytree of 'flow'/'normal' labels: 'flow' if any key is in the path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path):
        s = "/".join(str(getattr(p, "key", p)) for p in path)
        return "flow" if any(k in s for k in keys) else "normal"

    labels = [label(p) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


class VideoTrainer(PlainTrainer):
    """PlainTrainer + fix_keys/fix_iter/fix_lr_mul (model_vrt.py:27-77)."""

    def __init__(self, opt: dict, dtype: Optional[Any] = None):
        super().__init__(opt, extra_keys=(), dtype=dtype)
        ot = self.opt_train
        self.fix_iter = ot.get("fix_iter") or 0
        self.fix_keys = tuple(ot.get("fix_keys") or ())
        self.fix_lr_mul = ot.get("fix_lr_mul") or 1.0

        if self.fix_iter and self.fix_keys:
            schedule = get_schedule(ot)
            betas = ot.get("G_optimizer_betas") or [0.9, 0.999]

            def adam(mult):
                return optax.adam(lambda s: schedule(s) * mult,
                                  b1=betas[0], b2=betas[1])

            def frozen_then_scaled():
                """zero updates before fix_iter, scaled lr after
                (reference optimize_parameters :64-77)."""
                inner = adam(self.fix_lr_mul)

                def init(params):
                    return inner.init(params)

                def update(updates, state, params=None):
                    # step count lives in the adam state (mu counts steps via
                    # scale_by_adam's count)
                    new_updates, new_state = inner.update(updates, state, params)
                    count = new_state[0].count
                    gate = (count > self.fix_iter).astype(jnp.float32)
                    gated = jax.tree_util.tree_map(lambda u: u * gate, new_updates)
                    return gated, new_state

                return optax.GradientTransformation(init, update)

            self.tx = optax.multi_transform(
                {"normal": adam(1.0), "flow": frozen_then_scaled()},
                lambda params: _name_mask(params, self.fix_keys))
            clip = ot.get("G_optimizer_clipgrad") or 0
            if clip and clip > 0:
                self.tx = optax.chain(optax.clip_by_global_norm(clip), self.tx)
