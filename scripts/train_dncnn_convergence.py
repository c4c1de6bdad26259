"""Train DnCNN-S σ=25 from scratch and compare against the released
``dncnn_25.pth`` on held-out images — the reference's de-facto acceptance
test is "train it and reproduce the number" (main_train_psnr.py:165-246,
SURVEY §4.1). The canonical Set12/BSD68 sets are not downloadable here, so
the yardstick is the released checkpoint itself: both models denoise the
same held-out σ=25 images (seeded like main_test_dncnn.py:151) and the gap
in average PSNR is the reported convergence evidence.

    python scripts/prep_convergence_data.py --out runs/convergence
    python scripts/train_dncnn_convergence.py [--steps 50000] [--cpu]

Writes runs/convergence/report.json and prints the PARITY.md table rows.
"""

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


OPT = {
    "task": "dncnn25_convergence",
    "model": "plain",
    "gpu_ids": [0],
    "scale": 1,
    "n_channels": 1,
    "path": {"root": "runs/convergence", "pretrained_netG": None},
    "datasets": {
        "train": {
            "name": "train_dataset", "dataset_type": "dncnn",
            "dataroot_H": "runs/convergence/trainH", "dataroot_L": None,
            "H_size": 40, "sigma": 25, "sigma_test": 25,
            "dataloader_shuffle": True, "dataloader_num_workers": 8,
            "dataloader_batch_size": 128,
            # C++ loader: decode-once RAM cache — the python path re-decodes
            # ~batch images per step, which on a 1-core host steals real
            # time from the XLA step
            "use_native_loader": True,
        },
        "test": {
            "name": "test_dataset", "dataset_type": "dncnn",
            "dataroot_H": "runs/convergence/testH", "dataroot_L": None,
            "sigma": 25, "sigma_test": 25,
        },
    },
    "netG": {"net_type": "dncnn", "in_nc": 1, "out_nc": 1, "nc": 64,
             "nb": 17, "act_mode": "BR", "init_type": "orthogonal",
             "init_gain": 0.2},
    "train": {
        "G_lossfn_type": "l1", "G_lossfn_weight": 1.0, "E_decay": 0,
        "manual_seed": 0,
        "G_optimizer_type": "adam", "G_optimizer_lr": 2e-4,
        # compressed schedule (the released model trained ~400k steps on
        # 400 BSD images; small-corpus + bigger batch converges earlier);
        # milestones are scaled to --steps in main()
        "G_scheduler_type": "MultiStepLR",
        "G_scheduler_milestones": [20000, 32000, 40000, 46000],
        "G_scheduler_gamma": 0.5,
        "checkpoint_test": 5000, "checkpoint_save": 10000,
        "checkpoint_print": 500,
    },
}


def eval_params(model, params, files, sigma=25.0):
    """Reference eval protocol (main_test_dncnn.py:151-199): seeded noise,
    uint8 rounding, border 0."""
    import jax
    import numpy as np
    import imageio.v2 as iio
    from kair_tpu.utils import image as im

    fwd = jax.jit(lambda a: model.apply({"params": params}, a))
    psnrs, noisy_psnrs = [], []
    for i, f in enumerate(sorted(files)):
        h = np.asarray(iio.imread(f), np.float32) / 255.0
        np.random.seed(seed=0)                      # main_test_dncnn.py:151
        l = h + np.random.normal(0, sigma / 255.0, h.shape)
        e = np.asarray(fwd(l[None, :, :, None].astype(np.float32)))[0, :, :, 0]
        img_e = np.clip(e * 255.0, 0, 255).round().astype(np.uint8)
        img_h = np.clip(h * 255.0, 0, 255).round().astype(np.uint8)
        img_l = np.clip(l * 255.0, 0, 255).round().astype(np.uint8)
        psnrs.append(im.calculate_psnr(img_e, img_h, border=0))
        noisy_psnrs.append(im.calculate_psnr(img_l, img_h, border=0))
    return float(np.mean(psnrs)), float(np.mean(noisy_psnrs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50000)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fallback when the TPU "
                         "tunnel is down; ~50x slower)")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--act_mode", default="BR", choices=["R", "BR"],
                    help="'BR' trains with BatchNorm like the reference "
                         "recipe (options/train_dncnn.json:53 act_mode "
                         "'BR') and folds the BN into the convs before "
                         "eval (utils/bnorm.py, the released-checkpoint "
                         "form); 'R' reproduces the round-5 v1 run")
    ap.add_argument("--schedule_steps", type=int, default=None,
                    help="pin the LR schedule to this total length (for "
                         "staged/resumed runs); defaults to --steps")
    ap.add_argument("--root", default="runs/convergence",
                    help="run root (task dir, opt snapshot, report.json); "
                         "the prepared train/test data stays under "
                         "runs/convergence regardless")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training: load the newest saved checkpoint, "
                         "run the released-weights comparison, write the "
                         "report (use when a staged run is cut short)")
    args = ap.parse_args()

    # scale the LR decay points to the (intended total) run length
    total = args.schedule_steps or args.steps
    OPT["train"]["G_scheduler_milestones"] = [
        int(total * f) for f in (0.4, 0.64, 0.8, 0.92)]
    OPT["datasets"]["train"]["dataloader_batch_size"] = args.batch
    OPT["netG"]["act_mode"] = args.act_mode
    OPT["train"]["checkpoint_save"] = 1000      # staged runs resume cheaply
    OPT["train"]["checkpoint_print"] = 100

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if not os.path.isdir("runs/convergence/trainH"):
        raise SystemExit("run scripts/prep_convergence_data.py first")

    OPT["path"]["root"] = args.root
    os.makedirs(args.root, exist_ok=True)
    opt_path = os.path.join(args.root, "opt_dncnn25.json")
    with open(opt_path, "w") as f:
        json.dump(OPT, f, indent=2)

    from kair_tpu.cli import train as cli_train

    t0 = time.time()
    if args.eval_only:
        # reconstruct the TrainState skeleton, then load the newest save
        import jax as _jax
        import jax.numpy as _jnp
        from kair_tpu import config as opt_util
        from kair_tpu.ckpt import checkpoint as ck

        opt = opt_util.parse(opt_path, is_train=True)
        trainer = cli_train.build_trainer(opt)
        zeros = _jnp.zeros((1, 40, 40, 1), _jnp.float32)
        skel = trainer.init_state(_jax.random.PRNGKey(0),
                                  {"L": zeros, "H": zeros})
        it, path = opt_util.find_last_checkpoint(opt["path"]["models"], "S")
        if not (path and os.path.exists(path)):
            raise SystemExit("no saved checkpoint to evaluate")
        print(f"eval_only: {path} @ iter {it}")
        state = ck.load_pytree(path, target=skel)
        args.steps = it
    else:
        state = cli_train.main(argv=["--opt", opt_path, "--dtype", args.dtype,
                                     "--max_steps", str(args.steps)])
    wall_s = time.time() - t0

    # ---- compare against the released checkpoint ------------------------
    from kair_tpu.ckpt.torch_convert import (convert_dncnn,
                                             load_torch_state_dict)
    from kair_tpu.models.dncnn import DnCNN

    model = DnCNN(1, 1, 64, 17, "R")
    ref_sd = load_torch_state_dict("/root/reference/model_zoo/dncnn_25.pth")
    ref_params = convert_dncnn(ref_sd, nb=17)["params"]

    # BN-trained runs are evaluated in the released-checkpoint form: fold
    # the BN into the convs (reference utils_bnorm.py merge, the step that
    # turns a 'BR' training checkpoint into the shipped 'R' model)
    trained_params = state.params
    if getattr(state, "batch_stats", None) is not None:
        from kair_tpu.utils.bnorm import merge_bn_convblocks
        import jax as _jax
        import numpy as np
        trained_params = merge_bn_convblocks(
            _jax.tree_util.tree_map(lambda a: np.asarray(a), state.params),
            _jax.tree_util.tree_map(lambda a: np.asarray(a),
                                    state.batch_stats))

    files = glob.glob("runs/convergence/testH/*.png")
    ours, noisy = eval_params(model, trained_params, files)
    released, _ = eval_params(model, ref_params, files)

    report = {
        "steps": args.steps,
        "wall_s": None if args.eval_only else round(wall_s, 1),
        "device": str(jax.devices()[0]),
        "heldout_images": len(files),
        "noisy_psnr": round(noisy, 2),
        "trained_psnr": round(ours, 2),
        "released_dncnn25_psnr": round(released, 2),
        "gap_db": round(released - ours, 2),
    }
    with open(os.path.join(args.root, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    print(f"\n| from-scratch ({args.steps} steps, {wall_s/60:.0f} min) | "
          f"{ours:.2f} dB | released dncnn_25: {released:.2f} dB | "
          f"noisy input: {noisy:.2f} dB |")


if __name__ == "__main__":
    main()
