"""GAN trainer — counterpart of the reference ModelGAN
(model_gan.py:13-374): G + D (+ VGG-F perceptual) alternating updates with
gan/lsgan/wgan/softplusgan/ragan objectives.

Functional TPU design: one ``GANTrainState`` pytree holds both networks'
params/opt-states (+ D's spectral-norm iteration vectors + EMA). A single
jitted step computes the G update (pixel + perceptual + adversarial
against a frozen D — the analog of requires_grad=False flipping,
model_gan.py:227-228 — is just not differentiating w.r.t. D) and the D
update (real/fake halves; stop_gradient on E replaces .detach()). The
reference's separate real/fake backwards exist only to appease DDP+BN
in-place autograd (model_gan.py:264-268) — irrelevant here, one fused
backward is mathematically identical.

G update cadence (D_update_ratio / D_init_iters, model_gan.py:234) is a
static python flag → two jit specializations.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from kair_tpu.train.losses import (gan_loss, get_loss_fn,
                                   gradient_penalty_loss, r1_penalty)
from kair_tpu.train.schedulers import multistep


@flax.struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    spectral_d: Optional[Any] = None
    ema_params: Optional[Any] = None


class GanTrainer:
    def __init__(self, opt: dict, dtype: Optional[Any] = None,
                 vgg_variables: Optional[Any] = None):
        from kair_tpu.models.registry import define_d, define_g

        self.opt = opt
        ot = opt["train"]
        self.opt_train = ot
        self.model_g = define_g(opt, dtype=dtype)
        self.model_d = define_d(opt, dtype=dtype)

        self.pixel_weight = ot.get("G_lossfn_weight") or 0
        self.pixel_loss = get_loss_fn(ot.get("G_lossfn_type") or "l1", ot) \
            if self.pixel_weight > 0 else None

        self.feature_weight = ot.get("F_lossfn_weight") or 0
        self.vgg_variables = vgg_variables
        if self.feature_weight > 0:
            from kair_tpu.models.vgg import VGG19Features
            fl = ot.get("F_feature_layer") or 34
            self.vgg = VGG19Features(
                feature_layers=tuple(fl) if isinstance(fl, (list, tuple)) else (fl,),
                use_input_norm=bool(ot.get("F_use_input_norm", True)),
                use_range_norm=bool(ot.get("F_use_range_norm", False)),
                dtype=dtype)
            self.f_weights = ot.get("F_weights") or 1.0
            self.f_lossfn = get_loss_fn(ot.get("F_lossfn_type") or "l1", ot)
            if vgg_variables is None:
                raise ValueError(
                    "F_lossfn_weight > 0 requires converted VGG19 weights "
                    "(kair_tpu.models.vgg.convert_vgg19_features on a local "
                    "torchvision vgg19 .pth); refusing random features")

        self.gan_type = ot.get("gan_type") or "gan"
        self.d_weight = ot.get("D_lossfn_weight") or 1.0
        self.d_update_ratio = ot.get("D_update_ratio") or 1
        self.d_init_iters = ot.get("D_init_iters") or 0
        self.ema_decay = ot.get("E_decay") or 0
        # StyleGAN2-style D regularizers (reference loss.py:222-290; the
        # reference defines them for GPEN-style training without wiring
        # them into ModelGAN — here they're first-class options)
        self.r1_weight = ot.get("D_r1_weight") or 0
        self.gp_weight = ot.get("D_gp_weight") or 0
        self.reg_seed = int(ot.get("D_reg_seed") or 0)

        g_lr = ot.get("G_optimizer_lr") or 1e-4
        d_lr = ot.get("D_optimizer_lr") or 1e-4
        self.sched_g = multistep(g_lr, ot.get("G_scheduler_milestones") or [],
                                 ot.get("G_scheduler_gamma") or 0.5)
        self.sched_d = multistep(d_lr, ot.get("D_scheduler_milestones") or [],
                                 ot.get("D_scheduler_gamma") or 0.5)
        self.tx_g = optax.adam(self.sched_g)
        self.tx_d = optax.adam(self.sched_d)

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_batch) -> GANTrainState:
        rng_g, rng_d = jax.random.split(rng)
        l = jnp.asarray(sample_batch["L"])
        h = jnp.asarray(sample_batch["H"])
        vars_g = self.model_g.init(rng_g, l)
        vars_d = self.model_d.init(rng_d, h)
        params_g = vars_g["params"]
        params_d = vars_d["params"]
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g, params_d=params_d,
            opt_g=self.tx_g.init(params_g), opt_d=self.tx_d.init(params_d),
            spectral_d=vars_d.get("spectral"),
            ema_params=jax.tree_util.tree_map(jnp.copy, params_g)
            if self.ema_decay > 0 else None)

    # ------------------------------------------------------------------
    def _d_apply(self, params_d, spectral, x, train):
        variables = {"params": params_d}
        if spectral is not None:
            variables["spectral"] = spectral
            out, mut = self.model_d.apply(variables, x, train=train,
                                          mutable=["spectral"] if train else [])
            if train:
                return out, mut["spectral"]
            return out, spectral
        return self.model_d.apply(variables, x, train=train), None

    def make_train_step(self, update_g: bool = True) -> Callable:
        gan_type = self.gan_type

        def step_fn(state: GANTrainState, batch):
            L, H = batch["L"], batch["H"]
            metrics = {}

            # ---------------- G update ----------------
            def g_loss_fn(params_g):
                e = self.model_g.apply({"params": params_g}, L, train=True)
                e32 = e.astype(jnp.float32)
                h32 = H.astype(jnp.float32)
                total = 0.0
                logs = {}
                if self.pixel_weight > 0:
                    gl = self.pixel_weight * self.pixel_loss(e32, h32)
                    total += gl
                    logs["G_loss"] = gl
                if self.feature_weight > 0:
                    fe = self.vgg.apply(self.vgg_variables, e32)
                    fh = self.vgg.apply(self.vgg_variables, h32)
                    if not isinstance(fe, (list, tuple)):
                        fe, fh = [fe], [fh]
                    ws = self.f_weights if isinstance(self.f_weights, (list, tuple)) \
                        else [self.f_weights] * len(fe)
                    fl = sum(w * self.f_lossfn(a, jax.lax.stop_gradient(b))
                             for w, a, b in zip(ws, fe, fh))
                    total += self.feature_weight * fl
                    logs["F_loss"] = self.feature_weight * fl
                pred_fake, _ = self._d_apply(state.params_d, state.spectral_d,
                                             e, train=False)
                if gan_type in ("gan", "lsgan", "wgan", "softplusgan"):
                    dl = self.d_weight * gan_loss(pred_fake, True, gan_type)
                else:  # ragan (model_gan.py:246-251)
                    pred_real, _ = self._d_apply(state.params_d, state.spectral_d,
                                                 H, train=False)
                    pred_real = jax.lax.stop_gradient(pred_real)
                    dl = self.d_weight * 0.5 * (
                        gan_loss(pred_real - jnp.mean(pred_fake, 0, keepdims=True),
                                 False, gan_type) +
                        gan_loss(pred_fake - jnp.mean(pred_real, 0, keepdims=True),
                                 True, gan_type))
                total += dl
                logs["D_loss"] = dl
                return total, (e, logs)

            if update_g:
                (_, (e, logs)), grads_g = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(state.params_g)
                upd, opt_g = self.tx_g.update(grads_g, state.opt_g, state.params_g)
                params_g = optax.apply_updates(state.params_g, upd)
                metrics.update(logs)
            else:
                e = self.model_g.apply({"params": state.params_g}, L, train=True)
                params_g, opt_g = state.params_g, state.opt_g

            e_det = jax.lax.stop_gradient(e)

            # ---------------- D update ----------------
            def d_loss_fn(params_d):
                pred_real, sp1 = self._d_apply(params_d, state.spectral_d, H, True)
                pred_fake, sp2 = self._d_apply(params_d, sp1, e_det, True)
                if gan_type in ("gan", "lsgan", "wgan", "softplusgan"):
                    loss = gan_loss(pred_real, True, gan_type) + \
                        gan_loss(pred_fake, False, gan_type)
                else:  # ragan (model_gan.py:279-288)
                    loss = 0.5 * gan_loss(
                        pred_real - jax.lax.stop_gradient(jnp.mean(pred_fake, 0, keepdims=True)),
                        True, gan_type) + 0.5 * gan_loss(
                        pred_fake - jax.lax.stop_gradient(jnp.mean(pred_real, 0, keepdims=True)),
                        False, gan_type)
                if self.r1_weight > 0:
                    loss += self.r1_weight * r1_penalty(
                        lambda img: self._d_apply(params_d, state.spectral_d,
                                                  img, False)[0], H)
                if self.gp_weight > 0:
                    rng = jax.random.fold_in(
                        jax.random.PRNGKey(self.reg_seed), state.step)
                    loss += self.gp_weight * gradient_penalty_loss(
                        lambda img: self._d_apply(params_d, state.spectral_d,
                                                  img, False)[0],
                        H, e_det, rng=rng)
                return loss, (sp2, jnp.mean(pred_real), jnp.mean(pred_fake))

            (d_total, (spectral_d, d_real, d_fake)), grads_d = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(state.params_d)
            upd_d, opt_d = self.tx_d.update(grads_d, state.opt_d, state.params_d)
            params_d = optax.apply_updates(state.params_d, upd_d)
            metrics.update({"D_total": d_total, "D_real": d_real, "D_fake": d_fake})

            ema = state.ema_params
            if self.ema_decay > 0 and update_g:
                ema = jax.tree_util.tree_map(
                    lambda e_, p: e_ * self.ema_decay + p * (1 - self.ema_decay),
                    state.ema_params, params_g)

            return GANTrainState(step=state.step + 1, params_g=params_g,
                                 params_d=params_d, opt_g=opt_g, opt_d=opt_d,
                                 spectral_d=spectral_d, ema_params=ema), metrics

        return jax.jit(step_fn)

    def should_update_g(self, current_step: int) -> bool:
        """reference model_gan.py:234."""
        return (current_step % self.d_update_ratio == 0 and
                current_step > self.d_init_iters)
