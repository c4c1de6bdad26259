"""SPECT training entry — counterpart of the fork's
main_train_spect_psnr.py (:204-708): multi-val-set evaluation (clean +
re-Poissoned with repeat-sampled local LPIPS), best-PSNR/SSIM model
retention, CSV metric history + correlation plots regenerated every eval,
and ``--restart`` to wipe the task dir (fork :226-241).

    python -m kair_tpu.cli.train_spect --opt SPECToptions/generated/foo.json
"""

from __future__ import annotations

import argparse
import os
import shutil
import time
from typing import Optional

import numpy as np

from kair_tpu import config as opt_util
from kair_tpu.ckpt import checkpoint as ck
from kair_tpu.data.base import Loader
from kair_tpu.data.datasets import define_dataset
from kair_tpu.eval.harness import evaluate_model
from kair_tpu.utils.logger import setup_logger
from kair_tpu.utils.metrics_log import MetricsLogger


def main(json_path: Optional[str] = None, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", type=str, default=json_path, required=json_path is None)
    parser.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"])
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--restart", action="store_true",
                        help="wipe the task dir and start fresh (fork :226)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from kair_tpu.train.select import define_trainer

    opt = opt_util.parse(args.opt, is_train=True)
    if args.restart and os.path.isdir(opt["path"]["task"]):
        shutil.rmtree(opt["path"]["task"])
    for d in ("models", "images", "options"):
        os.makedirs(opt["path"][d], exist_ok=True)
    opt_util.save(opt)
    logger = setup_logger("train_spect", os.path.join(opt["path"]["log"], "train.log"))
    mlog = MetricsLogger(opt["path"]["log"])

    seed = opt["train"].get("manual_seed") or 1234
    np.random.seed(seed)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    trainer = define_trainer(opt, dtype=dtype)

    train_loader = None
    val_loaders = {}
    for phase, ds_opt in opt["datasets"].items():
        if phase == "train":
            train_loader = Loader(define_dataset(ds_opt),
                                  ds_opt.get("dataloader_batch_size") or 16,
                                  seed=seed)
        elif phase.startswith("test") or phase.startswith("val"):
            val_loaders[phase] = (ds_opt,
                                  Loader(define_dataset(ds_opt), 1,
                                         shuffle=False, drop_last=False))
    assert train_loader is not None

    batch0 = next(iter(train_loader.epoch(0)))
    arrays0 = {k: v for k, v in batch0.items() if isinstance(v, np.ndarray)}
    state = trainer.init_state(jax.random.PRNGKey(seed), arrays0)
    init_iter, init_path = opt_util.find_last_checkpoint(opt["path"]["models"], "S")
    if init_path and os.path.exists(init_path):
        logger.info(f"resume from {init_path} @ {init_iter}")
        state = ck.load_pytree(init_path, target=state)
    current_step = int(init_iter)

    from kair_tpu.parallel.mesh import (data_parallel_mesh, replicate_state,
                                        shard_batch)
    mesh = data_parallel_mesh(opt.get("num_gpu"), arrays0, logger.info)
    if mesh is not None:
        state = replicate_state(mesh, state)

    step = trainer.make_train_step()
    eval_step = trainer.make_eval_step(use_ema=opt["train"].get("E_decay", 0) > 0)

    ot = opt["train"]
    print_every = ot.get("checkpoint_print") or 200
    save_every = ot.get("checkpoint_save") or 500
    test_every = ot.get("checkpoint_test") or 500
    max_iter = args.max_steps or ot.get("max_iter") or 10 ** 8
    lpips_repeat = ot.get("lpips_local_repeat_n") or 1
    best = {"psnr": -1.0, "ssim": -1.0}

    # real LPIPS numbers the moment weights are present (see
    # models/lpips_jax.load_lpips_default for where to drop them)
    from kair_tpu.models.lpips_jax import load_lpips_default
    _lp = load_lpips_default()
    lpips_fn = _lp[2] if _lp else None
    if _lp:
        logger.info("LPIPS weights found - global/local LPIPS enabled")
    else:
        logger.info("LPIPS weights absent (KAIR_LPIPS_DIR / model_zoo/lpips)"
                    " - LPIPS metrics reported as nan")

    def run_evals(state):
        all_metrics = {}
        for name, (ds_opt, loader) in val_loaders.items():
            for poisson in ((False, True) if ds_opt.get("eval_repoisson")
                            else (False,)):
                fn = lambda batch: eval_step(state, {
                    k: v for k, v in batch.items() if isinstance(v, np.ndarray)})
                m = evaluate_model(fn, loader, ds_opt.get("normalization"),
                                   lpips_fn=lpips_fn,
                                   add_poisson_noise=poisson,
                                   lpips_local_repeat_n=lpips_repeat)
                tag = f"{name}{'_poisson' if poisson else ''}"
                for k, v in m.items():
                    if np.isfinite(v):
                        all_metrics[f"{tag}_{k}"] = v
                logger.info(f"[{tag}] " + " ".join(
                    f"{k}:{v:.4f}" for k, v in m.items() if np.isfinite(v)))
        return all_metrics

    t0 = time.time()
    for epoch in range(10 ** 9):
        for batch in train_loader.epoch(epoch + seed):
            if current_step >= max_iter:
                ck.save_tagged(opt["path"]["models"], current_step, "S", state)
                return state
            current_step += 1
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            if mesh is not None:
                arrays = shard_batch(mesh, arrays)
            state, m = step(state, arrays)

            if current_step % print_every == 0:
                logger.info(f"<iter:{current_step:8,d}> "
                            f"G_loss:{float(m['G_loss']):.3e} "
                            f"it/s:{current_step / (time.time() - t0):.2f}")
            if current_step % save_every == 0:
                ck.save_tagged(opt["path"]["models"], current_step, "S", state)
                ck.prune_old(opt["path"]["models"], "S", current_step)
            if current_step % test_every == 0 and val_loaders:
                metrics = run_evals(state)
                mlog.log(current_step, metrics)
                mlog.plot_correlations([(a, b) for a in metrics for b in metrics
                                        if a < b][:6])
                first = next(iter(val_loaders))
                psnr = metrics.get(f"{first}_psnr", -1)
                ssim = metrics.get(f"{first}_ssim", -1)
                if psnr > best["psnr"]:
                    best["psnr"] = psnr
                    ck.save_best(opt["path"]["models"], "psnr", "S", state)
                if ssim > best["ssim"]:
                    best["ssim"] = ssim
                    ck.save_best(opt["path"]["models"], "ssim", "S", state)


if __name__ == "__main__":
    main()
