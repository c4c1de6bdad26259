"""Training entry point — the counterpart of the reference's
``main_train_psnr.py`` (:32-246) driven by the same JSON option files.

    python -m kair_tpu.cli.train --opt options/train_dncnn.json

Differences (TPU-native):
* no torchrun/NCCL — multi-device data parallelism is a jax Mesh with the
  batch sharded over the 'data' axis (see kair_tpu.parallel); single-host
  multi-chip needs no launcher at all.
* one pytree checkpoint per tag instead of per-component torch files.
* bf16 compute by default on TPU (--dtype bf16|f32).
"""

from __future__ import annotations

import argparse
import logging
import math
import os
import random
import sys
import time
from typing import Optional

import numpy as np

from kair_tpu import config as opt_util
from kair_tpu.ckpt import checkpoint as ck
from kair_tpu.data.base import Loader
from kair_tpu.data.datasets import define_dataset, make_train_loader
from kair_tpu.train.trainer import PlainTrainer, TrainState
from kair_tpu.utils import image as im
from kair_tpu.utils.logger import setup_logger

FEED_KEYS = {
    # reference select_model.py:9-33: plain feeds L; plain2 feeds (L, C);
    # plain4 feeds (L, k, sf, sigma)
    "plain": (),
    "plain2": ("C",),
    "plain4": ("k", "sf", "sigma"),
}


def build_trainer(opt, dtype=None) -> PlainTrainer:
    model_kind = opt.get("model") or "plain"
    extra = FEED_KEYS.get(model_kind, ())
    return PlainTrainer(opt, extra_keys=extra, dtype=dtype)


def evaluate(trainer: PlainTrainer, state: TrainState, test_loader: Loader,
             border: int = 0, use_ema: bool = False, logger=None):
    """PSNR/SSIM eval loop (reference main_train_psnr.py:208-246)."""
    eval_step = trainer.make_eval_step(use_ema=use_ema)
    psnrs, ssims = [], []
    for batch in test_loader.epoch(0):
        e = np.asarray(eval_step(state, {k: v for k, v in batch.items()
                                         if isinstance(v, np.ndarray)}))
        for i in range(e.shape[0]):
            img_e = im.nhwc_to_uint(e[i:i + 1])
            img_h = im.nhwc_to_uint(batch["H"][i:i + 1])
            psnrs.append(im.calculate_psnr(img_e, img_h, border=border))
            ssims.append(im.calculate_ssim(img_e, img_h, border=border))
            if logger:
                name = os.path.basename(batch.get("H_path", ["?"])[i])
                logger.info(f"{name:>20s} | {psnrs[-1]:<4.2f}dB")
    return float(np.mean(psnrs)), float(np.mean(ssims))


def evaluate_video(trainer: PlainTrainer, state: TrainState,
                   test_loader: Loader, opt: dict, logger,
                   use_ema: bool = True):
    """Per-folder tiled video eval during training (reference
    main_train_vrt.py:205-246 + model_vrt._test_video :114-156): temporal
    clips of val.num_frame_testing frames, spatial patches of
    val.size_patch_testing, PSNR/SSIM averaged per clip folder."""
    import jax
    from kair_tpu.eval.video_test import test_video
    from kair_tpu.utils import image as im

    val = opt.get("val") or {}
    ws = tuple((opt.get("netG") or {}).get("window_size") or (6, 8, 8))
    sf = opt.get("scale") or 1
    params = state.ema_params if (use_ema and state.ema_params is not None) \
        else state.params
    fwd = jax.jit(lambda a: trainer.model.apply({"params": params}, a))

    psnrs, ssims = [], []
    for batch in test_loader.epoch(0):
        out = test_video(
            fwd, batch["L"], sf=sf, window_size=ws,
            num_frame_testing=val.get("num_frame_testing") or 0,
            num_frame_overlapping=val.get("num_frame_overlapping") or 2,
            size_patch_testing=val.get("size_patch_testing") or 0,
            patch_overlap=val.get("overlap_size") or 20)
        folder = batch.get("folder", ["?"])[0]
        per = []
        for i in range(out.shape[1]):
            e = im.nhwc_to_uint(out[:, i])
            gt = (np.clip(batch["H"][0, i], 0, 1) * 255.0).round().astype(
                np.uint8)
            per.append(im.calculate_psnr(e, gt, border=0))
        psnr = float(np.mean(per))
        ssim = float(np.mean([
            im.calculate_ssim(im.nhwc_to_uint(out[:, i]),
                              (np.clip(batch["H"][0, i], 0, 1) * 255.0
                               ).round().astype(np.uint8), border=0)
            for i in range(out.shape[1])]))
        psnrs.append(psnr)
        ssims.append(ssim)
        logger.info(f"  {folder:20s} PSNR: {psnr:.2f} dB; SSIM: {ssim:.4f}")
    return float(np.mean(psnrs)), float(np.mean(ssims))


def main(json_path: Optional[str] = None, argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", type=str, default=json_path, required=json_path is None)
    parser.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"])
    parser.add_argument("--max_steps", type=int, default=None,
                        help="override: stop after N optimizer steps")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    opt = opt_util.parse(args.opt, is_train=True)
    for d in ("models", "images", "options", "log"):
        os.makedirs(opt["path"].get(d) or opt["path"]["task"], exist_ok=True)
    opt_util.save(opt)

    logger = setup_logger("train", os.path.join(opt["path"]["log"], "train.log"))
    logger.info(opt_util.dict2str(opt))

    seed = opt["train"].get("manual_seed")
    if seed is None:
        seed = random.randint(1, 10000)
    logger.info(f"Random seed: {seed}")
    np.random.seed(seed)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    trainer = build_trainer(opt, dtype=dtype)

    # datasets
    train_loader = test_loader = None
    test_is_video = False
    for phase, ds_opt in opt["datasets"].items():
        if phase == "train":
            # native C++ batcher when opted in (decode/crop/augment/degrade
            # off the GIL — keeps a single-core host from starving the chip)
            train_loader = make_train_loader(
                ds_opt, ds_opt.get("dataloader_batch_size") or 16,
                seed=seed, info=logger.info)
        elif phase == "test":
            ds = define_dataset(ds_opt)
            test_loader = Loader(ds, 1, shuffle=False, drop_last=False)
            test_is_video = "video" in (ds_opt.get("dataset_type")
                                        or "").lower()

    assert train_loader is not None, "no train dataset in options"

    # init + auto-resume (reference main_train_psnr.py:63-69)
    first = next(iter(train_loader.epoch(0)))
    batch0 = {k: v for k, v in first.items() if isinstance(v, np.ndarray)}
    state = trainer.init_state(jax.random.PRNGKey(seed), batch0)
    init_iter, init_path = opt_util.find_last_checkpoint(
        opt["path"]["models"], "S", pretrained_path=opt["path"].get("pretrained_netG"))
    if init_path and os.path.exists(init_path):
        logger.info(f"resume from {init_path} @ iter {init_iter}")
        state = ck.load_pytree(init_path, target=state)
    current_step = int(init_iter)

    # data parallelism: gpu_ids with >1 entry becomes a ('data',) mesh —
    # params replicated, batch sharded, gradient psum inserted by XLA
    # (equivalence proven bitwise in tests/test_parallel.py:19)
    from kair_tpu.parallel.mesh import (data_parallel_mesh, replicate_state,
                                        shard_batch)
    mesh = data_parallel_mesh(opt.get("num_gpu"), batch0, logger.info)
    if mesh is not None:
        state = replicate_state(mesh, state)

    train_step = trainer.make_train_step()

    ot = opt["train"]
    checkpoint_print = ot.get("checkpoint_print") or 200
    checkpoint_save = ot.get("checkpoint_save") or 5000
    checkpoint_test = ot.get("checkpoint_test") or 5000
    max_iter = args.max_steps or ot.get("max_iter") or 10 ** 8
    border = opt.get("scale") or 1

    t0 = time.time()
    for epoch in range(10 ** 9):
        for batch in train_loader.epoch(epoch + seed):
            if current_step >= max_iter:
                logger.info("reached max_iter, stopping")
                ck.save_tagged(opt["path"]["models"], current_step, "S", state)
                return state
            current_step += 1
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            if mesh is not None:
                arrays = shard_batch(mesh, arrays)
            state, metrics = train_step(state, arrays)
            state = trainer.apply_regularizers(state, current_step)

            if current_step % checkpoint_print == 0:
                loss = float(metrics["G_loss"])
                lr = trainer.current_lr(current_step)
                ips = (current_step - init_iter) / max(time.time() - t0, 1e-9)
                logger.info(f"<epoch:{epoch:3d}, iter:{current_step:8,d}, "
                            f"lr:{lr:.3e}> G_loss: {loss:.3e} it/s: {ips:.2f}")
            if current_step % checkpoint_save == 0:
                logger.info("Saving the model.")
                ck.save_tagged(opt["path"]["models"], current_step, "S", state)
                if ot.get("keep_only_latest"):
                    ck.prune_old(opt["path"]["models"], "S", current_step)
            if current_step % checkpoint_test == 0 and test_loader is not None:
                if test_is_video:
                    psnr, ssim = evaluate_video(trainer, state, test_loader,
                                                opt, logger)
                else:
                    psnr, ssim = evaluate(trainer, state, test_loader,
                                          border=border)
                logger.info(f"<epoch:{epoch:3d}, iter:{current_step:8,d}, "
                            f"Average PSNR : {psnr:<.2f}dB, SSIM : {ssim:<.4f}")


if __name__ == "__main__":
    main()
