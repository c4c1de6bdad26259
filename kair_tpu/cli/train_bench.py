"""Training-step throughput benchmark (patches/sec, steps/sec) on the
current device — the training-side counterpart of cli/challenge.

    python -m kair_tpu.cli.train_bench --net dncnn --batch 64 --patch 64
    python -m kair_tpu.cli.train_bench --net swinir --batch 8 --patch 64
"""

from __future__ import annotations

import argparse
import json
import time


def _timed(fn, state, k):
    t0 = time.perf_counter()
    float(fn(state, k))
    return time.perf_counter() - t0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", type=str, default="dncnn")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--patch", type=int, default=64)
    parser.add_argument("--in_nc", type=int, default=1)
    parser.add_argument("--nc", type=int, default=64)
    parser.add_argument("--nb", type=int, default=17)
    parser.add_argument("--scale", type=int, default=1)
    parser.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"])
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--fuse", action="store_true",
                        help="swinir: fused Pallas block (fwd + bwd kernels)")
    parser.add_argument("--deform", choices=["gather", "mxu", "fused"],
                        default="gather",
                        help="vrt: deformable sampling path (MXU 2-hot-"
                             "matmul kernel, fwd + scatter-free bwd); "
                             "'fused' only affects rvrt-style GDA")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize attention blocks in the backward "
                             "pass (vrt/swinir); trades recompute FLOPs for "
                             "HBM — required for the released 8-clip VRT "
                             "batch on a single 16G chip")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of one timed "
                             "chain into DIR and print a per-op summary")
    args = parser.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the full VRT training step takes ~30 min to
    # compile on the tunnelled TPU; never pay it twice (video_bench does the
    # same)
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from kair_tpu.train.trainer import PlainTrainer

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    netg = {"net_type": args.net, "in_nc": args.in_nc, "out_nc": args.in_nc,
            "nc": args.nc, "nb": args.nb, "scale": args.scale,
            "upscale": args.scale}
    if args.net == "swinir":
        netg.update({"embed_dim": 180, "depths": [6] * 6, "num_heads": [6] * 6,
                     "window_size": 8, "mlp_ratio": 2.0,
                     "fuse_block": bool(args.fuse),
                     "use_checkpoint": bool(args.remat),
                     "upsampler": "pixelshuffle" if args.scale > 1 else ""})
    rng = np.random.RandomState(0)
    if args.net == "vrt":
        # released 001 REDS recipe shape: 6-frame clips, 64px LR crops, x4
        # (options/vrt/001_train_vrt_videosr_bi_reds_6frames.json; the
        # reference's primary VRT workload is 8-GPU TRAINING — VERDICT r2
        # #3 wants a measured training ms/step)
        from kair_tpu.train.video import VideoTrainer

        args.scale = 4
        frames = 6
        netg = {"net_type": "vrt", "upscale": 4, "in_chans": 3,
                "out_chans": 3, "window_size": [6, 8, 8], "pa_frames": 2,
                "deformable_groups": 12, "fuse_block": bool(args.fuse),
                "use_checkpoint_attn": bool(args.remat),
                "deform_impl": args.deform}
        opt = {"netG": netg,
               "train": {"G_lossfn_type": "charbonnier",
                         "G_optimizer_lr": 4e-4,
                         "G_scheduler_milestones": [10 ** 9],
                         "E_decay": 0, "fix_iter": 20000,
                         "fix_keys": ["spynet", "deform"],
                         "fix_lr_mul": 0.125}}
        trainer = VideoTrainer(opt, dtype=dtype)
        batch = {
            "L": rng.rand(args.batch, frames, args.patch, args.patch,
                          3).astype(np.float32),
            "H": rng.rand(args.batch, frames, args.patch * 4,
                          args.patch * 4, 3).astype(np.float32)}
    else:
        opt = {"netG": netg,
               "train": {"G_lossfn_type": "l1", "G_optimizer_lr": 2e-4,
                         "G_scheduler_milestones": [10 ** 9],
                         "E_decay": 0.999}}
        trainer = PlainTrainer(opt, dtype=dtype)
        batch = {
            "L": rng.rand(args.batch, args.patch, args.patch,
                          args.in_nc).astype(np.float32),
            "H": rng.rand(args.batch, args.patch * args.scale,
                          args.patch * args.scale, args.in_nc).astype(np.float32)}
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.make_train_step(donate=False)

    l_dev = jnp.asarray(batch["L"])
    h_dev = jnp.asarray(batch["H"])

    # chained timing: thread the state through K steps inside one jit so the
    # device must execute them all (see kair_tpu/utils/timing.py rationale)
    def chain(state, k):
        def body(_, s):
            s2, _m = step(s, {"L": l_dev, "H": h_dev})
            return s2
        s = jax.lax.fori_loop(0, k, body, state)
        return jnp.sum(jax.tree_util.tree_leaves(s.params)[0])

    fn = jax.jit(chain, static_argnums=(1,))
    # compile BOTH chain lengths before timing (a fresh k is a fresh program)
    float(fn(state, 1))
    float(fn(state, args.steps))
    t1 = min(_timed(fn, state, 1) for _ in range(2))
    tk = min(_timed(fn, state, args.steps) for _ in range(2))
    per_step = max((tk - t1) / (args.steps - 1), 1e-9)

    if args.profile:
        import sys
        from kair_tpu.utils.profiling import trace, print_trace_summary
        with trace(args.profile):
            float(fn(state, args.steps))
        print_trace_summary(args.profile,
                            printer=lambda *a: print(*a, file=sys.stderr))

    report = {
        "net": args.net,
        "batch": args.batch, "patch": args.patch, "dtype": args.dtype,
        "step_ms": round(per_step * 1e3, 3),
        "steps_per_s": round(1.0 / per_step, 2),
        "patches_per_s": round(args.batch / per_step, 1),
        "megapixels_per_s": round(args.batch * args.patch ** 2 / per_step / 1e6, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
