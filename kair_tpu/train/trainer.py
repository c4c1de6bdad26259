"""The plain (supervised pixel-loss) trainer — TPU-native counterpart of the
reference ModelPlain / ModelPlain2 / ModelPlain4 stack
(model_plain.py:16-341, model_plain2.py, model_plain4.py).

Design (functional, pjit-ready; NOT a port of the torch class hierarchy):

* all mutable training state lives in one ``TrainState`` pytree
  (params, optional batch_stats, optimizer state, EMA params, step) —
  checkpointing is one `save_pytree` (vs 5 torch files, model_base.py:158).
* `make_train_step` builds ONE jitted function doing forward + loss + grads
  + optimizer + EMA; under pjit the gradient mean over the data axis is an
  XLA psum, replacing DDP backward hooks (utils_dist.py).
* feed variants are data, not classes: ``extra_keys`` routes the FFDNet σ-map
  ((L, C) — model_plain2.py:9-19) and USRNet ((L, k, sf, σ) —
  model_plain4.py:8-23) inputs.
* bf16: pass ``dtype=jnp.bfloat16`` to the model for MXU-rate compute with
  fp32 params/loss — the TPU analog of the fork's AMP (model_plain.py:32-37,
  273-290); no GradScaler is needed in bf16.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from kair_tpu.train.losses import get_loss_fn
from kair_tpu.train.regularizers import regularizer_clip, regularizer_orth
from kair_tpu.train.schedulers import get_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    batch_stats: Optional[Any] = None


def build_optimizer(opt_train: dict) -> Tuple[optax.GradientTransformation, Callable]:
    """Adam(+wd) with MultiStep/cosine schedule and optional global-norm
    gradient clipping (reference model_plain.py:210-240, 283-296)."""
    schedule = get_schedule(opt_train)
    wd = opt_train.get("G_optimizer_wd") or 0
    betas = opt_train.get("G_optimizer_betas") or [0.9, 0.999]
    if wd and wd > 0:
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    else:
        tx = optax.adam(schedule, b1=betas[0], b2=betas[1])
    clip = opt_train.get("G_optimizer_clipgrad") or 0
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, schedule


class PlainTrainer:
    """Config-driven supervised trainer.

    Parameters
    ----------
    opt : parsed option tree (kair_tpu.config.parse)
    extra_keys : batch keys fed to the model after 'L'
        () for plain, ('C',) for plain2/FFDNet, ('k','sf','sigma') for
        plain4/USRNet (reference select_model.py:9-33 mapping).
    """

    def __init__(self, opt: dict, extra_keys: Sequence[str] = (),
                 dtype: Optional[Any] = None):
        from kair_tpu.models.registry import define_g

        self.opt = opt
        self.opt_train = opt["train"]
        self.model = define_g(opt, dtype=dtype)
        self.loss_fn = get_loss_fn(self.opt_train["G_lossfn_type"] or "l1",
                                   self.opt_train)
        self.loss_weight = self.opt_train.get("G_lossfn_weight") or 1.0
        self.tx, self.schedule = build_optimizer(self.opt_train)
        self.ema_decay = self.opt_train.get("E_decay") or 0
        self.extra_keys = tuple(extra_keys)

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_batch: Dict[str, Any]) -> TrainState:
        args = [sample_batch["L"]] + [sample_batch[k] for k in self.extra_keys]
        variables = self.model.init(rng, *[jnp.asarray(a) for a in args])
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if self.ema_decay > 0 else None,
            batch_stats=batch_stats)

    # ------------------------------------------------------------------
    def make_train_step(self, donate: bool = True) -> Callable:
        """Returns jitted (state, batch) -> (state, metrics)."""
        model, loss_fn, w = self.model, self.loss_fn, self.loss_weight
        tx, ema_decay, extra_keys = self.tx, self.ema_decay, self.extra_keys
        has_bn = False  # plain conv nets in eval parity mode carry no BN col.

        def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
            args = [batch["L"]] + [batch[k] for k in extra_keys]

            def loss_of(params):
                variables = {"params": params}
                if state.batch_stats is not None:
                    variables["batch_stats"] = state.batch_stats
                    out, mut = model.apply(variables, *args, train=True,
                                           mutable=["batch_stats"])
                    e = out
                    new_stats = mut["batch_stats"]
                else:
                    e = model.apply(variables, *args, train=True)
                    new_stats = None
                loss = w * loss_fn(e.astype(jnp.float32),
                                   batch["H"].astype(jnp.float32))
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if ema_decay > 0:
                new_ema = jax.tree_util.tree_map(
                    lambda e_, p: e_ * ema_decay + p * (1 - ema_decay),
                    state.ema_params, new_params)
            else:
                new_ema = state.ema_params
            new_state = TrainState(step=state.step + 1, params=new_params,
                                   opt_state=new_opt, ema_params=new_ema,
                                   batch_stats=new_stats)
            return new_state, {"G_loss": loss}

        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    # ------------------------------------------------------------------
    def make_eval_step(self, use_ema: bool = False) -> Callable:
        model, extra_keys = self.model, self.extra_keys

        def eval_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
            params = state.ema_params if (use_ema and state.ema_params is not None) \
                else state.params
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            args = [batch["L"]] + [batch[k] for k in extra_keys]
            return model.apply(variables, *args)

        return jax.jit(eval_fn)

    # ------------------------------------------------------------------
    def apply_regularizers(self, state: TrainState, current_step: int) -> TrainState:
        """Host-side periodic weight regularization
        (reference model_plain.py:300-310)."""
        ot = self.opt_train
        save_every = self.opt["train"].get("checkpoint_save") or 0
        orth = ot.get("G_regularizer_orthstep") or 0
        clip = ot.get("G_regularizer_clipstep") or 0
        params = state.params
        if orth > 0 and current_step % orth == 0 and \
                (save_every == 0 or current_step % save_every != 0):
            params = regularizer_orth(params)
        if clip > 0 and current_step % clip == 0 and \
                (save_every == 0 or current_step % save_every != 0):
            params = regularizer_clip(params)
        return state.replace(params=params)

    # ------------------------------------------------------------------
    def current_lr(self, step: int) -> float:
        return float(self.schedule(step))
