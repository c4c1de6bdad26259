"""GAN training entry — counterpart of main_train_gan.py (:61-254) with the
fork's observability: CSV metric history + correlation plots
(main_train_spect_psnr.py:138-201) and best-PSNR/SSIM model retention
(model_base.py:170-196).

    python -m kair_tpu.cli.train_gan --opt options/train_gan.json
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np

from kair_tpu import config as opt_util
from kair_tpu.ckpt import checkpoint as ck
from kair_tpu.data.base import Loader
from kair_tpu.data.datasets import define_dataset, make_train_loader
from kair_tpu.utils import image as im
from kair_tpu.utils.logger import setup_logger
from kair_tpu.utils.metrics_log import MetricsLogger


def main(json_path: Optional[str] = None, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", type=str, default=json_path, required=json_path is None)
    parser.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"])
    parser.add_argument("--max_steps", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from kair_tpu.train.gan import GanTrainer

    opt = opt_util.parse(args.opt, is_train=True)
    for d in ("models", "images", "options"):
        os.makedirs(opt["path"][d], exist_ok=True)
    opt_util.save(opt)
    logger = setup_logger("train_gan", os.path.join(opt["path"]["log"], "train.log"))
    mlog = MetricsLogger(opt["path"]["log"])

    seed = opt["train"].get("manual_seed") or 1234
    np.random.seed(seed)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    trainer = GanTrainer(opt, dtype=dtype)

    train_loader = test_loader = None
    for phase, ds_opt in opt["datasets"].items():
        if phase == "train":
            train_loader = make_train_loader(
                ds_opt, ds_opt.get("dataloader_batch_size") or 16,
                seed=seed, info=logger.info)
        elif phase == "test":
            test_loader = Loader(define_dataset(ds_opt), 1, shuffle=False,
                                 drop_last=False)
    assert train_loader is not None

    batch0 = next(iter(train_loader.epoch(0)))
    arrays0 = {k: v for k, v in batch0.items() if isinstance(v, np.ndarray)}
    state = trainer.init_state(jax.random.PRNGKey(seed), arrays0)

    init_iter, init_path = opt_util.find_last_checkpoint(
        opt["path"]["models"], "GAN")
    if init_path and os.path.exists(init_path):
        logger.info(f"resume from {init_path} @ {init_iter}")
        state = ck.load_pytree(init_path, target=state)
    current_step = int(init_iter)

    from kair_tpu.parallel.mesh import (data_parallel_mesh, replicate_state,
                                        shard_batch)
    mesh = data_parallel_mesh(opt.get("num_gpu"), arrays0, logger.info)
    if mesh is not None:
        state = replicate_state(mesh, state)

    step_gd = trainer.make_train_step(update_g=True)
    step_d = trainer.make_train_step(update_g=False)

    ot = opt["train"]
    print_every = ot.get("checkpoint_print") or 200
    save_every = ot.get("checkpoint_save") or 5000
    test_every = ot.get("checkpoint_test") or 5000
    max_iter = args.max_steps or ot.get("max_iter") or 10 ** 8
    border = opt.get("scale") or 1
    best_psnr = -1.0

    def evaluate():
        from kair_tpu.models.registry import define_g
        eval_params = state.ema_params if state.ema_params is not None \
            else state.params_g
        fwd = jax.jit(lambda a: trainer.model_g.apply({"params": eval_params}, a))
        psnrs, ssims = [], []
        for batch in test_loader.epoch(0):
            e = np.asarray(fwd(batch["L"]))
            for i in range(e.shape[0]):
                psnrs.append(im.calculate_psnr(im.nhwc_to_uint(e[i:i + 1]),
                                               im.nhwc_to_uint(batch["H"][i:i + 1]),
                                               border=border))
                ssims.append(im.calculate_ssim(im.nhwc_to_uint(e[i:i + 1]),
                                               im.nhwc_to_uint(batch["H"][i:i + 1]),
                                               border=border))
        return float(np.mean(psnrs)), float(np.mean(ssims))

    t0 = time.time()
    for epoch in range(10 ** 9):
        for batch in train_loader.epoch(epoch + seed):
            if current_step >= max_iter:
                ck.save_tagged(opt["path"]["models"], current_step, "GAN", state)
                logger.info("reached max_iter")
                return state
            current_step += 1
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            if mesh is not None:
                arrays = shard_batch(mesh, arrays)
            fn = step_gd if trainer.should_update_g(current_step) else step_d
            state, m = fn(state, arrays)

            if current_step % print_every == 0:
                msg = ", ".join(f"{k}:{float(v):.3e}" for k, v in m.items())
                logger.info(f"<iter:{current_step:8,d}> {msg} "
                            f"it/s:{current_step / (time.time() - t0):.2f}")
            if current_step % save_every == 0:
                ck.save_tagged(opt["path"]["models"], current_step, "GAN", state)
            if current_step % test_every == 0 and test_loader is not None:
                psnr, ssim = evaluate()
                logger.info(f"<iter:{current_step:8,d}> PSNR {psnr:.2f} dB "
                            f"SSIM {ssim:.4f}")
                mlog.log(current_step,
                         {"psnr": psnr, "ssim": ssim,
                          **{k: float(v) for k, v in m.items()}})
                mlog.plot_correlations()
                if psnr > best_psnr:
                    best_psnr = psnr
                    ck.save_best(opt["path"]["models"], "psnr", "GAN", state)
                    logger.info(f"new best PSNR {psnr:.2f} — saved bestmodel")


if __name__ == "__main__":
    main()
