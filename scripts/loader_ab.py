"""Native C++ loader end-to-end A/B (VERDICT r4 #7): the loader is
correctness-tested (tests/test_native_loader.py); its reason to exist is
host-side throughput on a 1-core host feeding a TPU. Measure it where it
matters: marginal it/s of a real cli.train run, native vs python loader,
same recipe (the dncnn σ=25 protocol over runs/convergence/trainH).

Method: for each loader, run max_steps=N_WARM and max_steps=N_FULL into
FRESH run roots and report (N_FULL - N_WARM) / Δwall — compile time and
init cancel in the subtraction (the persistent compile cache makes the
second run's compile ~free anyway).

    python scripts/loader_ab.py [--batch 128] [--sets dncnn ffdnet]
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_WARM, N_FULL = 100, 400


def build_opt(root, native, batch, kind):
    opt = {
        "task": f"loader_ab_{kind}_{'native' if native else 'python'}",
        "model": "plain", "gpu_ids": [0], "scale": 1, "n_channels": 1,
        "path": {"root": root, "pretrained_netG": None},
        "datasets": {
            "train": {
                "name": "train_dataset", "dataset_type": kind,
                "dataroot_H": "runs/convergence/trainH", "dataroot_L": None,
                "H_size": 40,
                "sigma": 25 if kind == "dncnn" else [0, 75],
                "sigma_test": 25,
                "dataloader_shuffle": True, "dataloader_num_workers": 8,
                "dataloader_batch_size": batch,
                "use_native_loader": native,
            },
        },
        "netG": {"net_type": "dncnn",
                 "in_nc": 2 if kind == "fdncnn" else 1,
                 "out_nc": 1, "nc": 64, "nb": 17, "act_mode": "R",
                 "init_type": "orthogonal", "init_gain": 0.2},
        "train": {"G_lossfn_type": "l1", "G_lossfn_weight": 1.0,
                  "E_decay": 0, "manual_seed": 0,
                  "G_optimizer_type": "adam", "G_optimizer_lr": 1e-4,
                  "G_scheduler_type": "MultiStepLR",
                  "G_scheduler_milestones": [10 ** 8],
                  "G_scheduler_gamma": 0.5,
                  "checkpoint_test": 10 ** 8, "checkpoint_save": 10 ** 8,
                  "checkpoint_print": 100},
    }
    return opt


def timed_run(native, steps, batch, kind):
    from kair_tpu.cli import train as cli_train

    root = f"runs/loader_ab/{kind}_{'nat' if native else 'py'}_{steps}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    opt_path = os.path.join(root, "opt.json")
    with open(opt_path, "w") as f:
        json.dump(build_opt(root, native, batch, kind), f)
    t0 = time.time()
    cli_train.main(argv=["--opt", opt_path, "--max_steps", str(steps)])
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--sets", nargs="+", default=["dncnn", "fdncnn"],
                    help="dncnn = fixed-sigma protocol; fdncnn = the "
                         "sigma-range + level-map protocol (the ffdnet "
                         "analog that still fits the plain trainer)")
    args = ap.parse_args()

    if not os.path.isdir("runs/convergence/trainH"):
        raise SystemExit("run scripts/prep_convergence_data.py first")

    report = {}
    for kind in args.sets:
        row = {}
        # prime the in-process jit cache once per protocol: the first
        # timed leg otherwise pays the compile while the later ones reuse
        # it in-process, making the (full - warm) marginal negative
        # (observed in runs/tpu_r5/loader_ab.log: warm 659s > full 38s)
        timed_run(True, 1, args.batch, kind)
        for native in (True, False):
            t_warm = timed_run(native, N_WARM, args.batch, kind)
            t_full = timed_run(native, N_FULL, args.batch, kind)
            ips = (N_FULL - N_WARM) / max(t_full - t_warm, 1e-3)
            row["native" if native else "python"] = round(ips, 2)
            print(f"{kind} {'native' if native else 'python'}: "
                  f"{ips:.2f} it/s (warm {t_warm:.1f}s, full {t_full:.1f}s)",
                  flush=True)
        row["speedup"] = round(row["native"] / row["python"], 2)
        report[kind] = row
    os.makedirs("runs/loader_ab", exist_ok=True)
    with open("runs/loader_ab/report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
