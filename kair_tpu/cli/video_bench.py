"""VRT video-restoration throughput benchmark (single chip).

    python -m kair_tpu.cli.video_bench --frames 6 --size 64 [--fuse]

Measures LR frame-megapixels/sec at the released VRT 001 REDS 6-frame
config (main_test_vrt.py:162-169) with the bench.py chained-fori timing
methodology (the tunnelled runtime acks block_until_ready early — only a
host transfer truly synchronizes, so K iterations are chained through a
data dependency and the K=1 baseline is subtracted).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", choices=["vrt", "rvrt"], default="vrt")
    parser.add_argument("--frames", type=int, default=6)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--fuse", action="store_true",
                        help="fused Pallas attention blocks: (2,8,8) "
                             "mutual+GEGLU TMSA groups (vrt) / self-only "
                             "STL blocks in every RSTB (rvrt)")
    parser.add_argument("--deform", choices=["gather", "mxu", "fused"],
                        default="gather",
                        help="deformable sampling path (rvrt GDA / vrt "
                             "DCN): XLA patch gathers, the Pallas "
                             "2-hot-matmul kernel (ops/pallas/bilin_mm.py), "
                             "or the fully fused kernels (sample+attend "
                             "GDA, ops/pallas/gda_block.py; sample+"
                             "modulate+conv DCN, ops/pallas/dcn_block.py)")
    parser.add_argument("--compare", action="store_true",
                        help="bench BOTH deform paths interleaved in one "
                             "process (cross-process numbers are not "
                             "decision-grade on the tunnelled runtime)")
    parser.add_argument("--k", type=int, default=4)
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of one timed "
                             "chain into DIR and print a per-op summary")
    args = parser.parse_args(argv)
    args.k = max(2, args.k)        # per_iter divides by k-1

    import numpy as np
    import jax
    import jax.numpy as jnp

    import os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    def build(deform):
        if args.net == "rvrt":
            from kair_tpu.models.rvrt import RVRT

            # released 001 REDS 30-frame cfg
            return RVRT(dtype=jnp.bfloat16, fuse_block=args.fuse,
                        deform_impl=deform)
        from kair_tpu.models.vrt import VRT

        return VRT(deformable_groups=12, dtype=jnp.bfloat16,
                   fuse_block=args.fuse, deform_impl=deform)

    x = jnp.asarray(np.random.RandomState(0).rand(
        args.batch, args.frames, args.size, args.size, 3), jnp.float32)

    # both nets support all three paths now: rvrt GDA via gda_block,
    # vrt DCN via dcn_block
    deforms = ["gather", "mxu", "fused"] if args.compare else [args.deform]
    fns, variables = {}, None
    for deform in deforms:
        model = build(deform)
        if variables is None:
            variables = jax.eval_shape(
                lambda m=model: m.init(jax.random.PRNGKey(0), x))
            variables = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), variables)

        def chain(v, a, k, m=model):
            def body(_, acc):
                y = m.apply(v, acc)
                return y[:, :, ::4, ::4, :]
            return jnp.sum(jax.lax.fori_loop(0, k, body, a)
                           .astype(jnp.float32))

        fn = jax.jit(chain, static_argnums=(2,))
        float(fn(variables, x, 1))
        float(fn(variables, x, args.k))
        fns[deform] = fn

    diffs = {d: [] for d in fns}
    for _ in range(3):
        for d, fn in fns.items():           # interleaved: same-process A/B
            t0 = time.perf_counter(); float(fn(variables, x, args.k))
            tk = time.perf_counter() - t0
            t0 = time.perf_counter(); float(fn(variables, x, 1))
            t1 = time.perf_counter() - t0
            diffs[d].append(tk - t1)
    if args.profile:
        import sys
        from kair_tpu.utils.profiling import trace, print_trace_summary
        with trace(args.profile):
            for fn in fns.values():
                float(fn(variables, x, args.k))
        print_trace_summary(args.profile,
                            printer=lambda *a: print(*a, file=sys.stderr))

    mp = args.batch * args.frames * args.size * args.size / 1e6

    # FLOPs of ONE forward from XLA's own cost model (utils/summary.py) so
    # the video numbers carry MFU next to ms/clip (VERDICT r3 "no MFU at
    # all" for VRT/RVRT). Uses the single-apply graph, not the k-chain.
    flops = None
    try:
        from kair_tpu.utils.summary import cost_analysis
        model1 = build(deforms[0])
        ca = cost_analysis(lambda v, a: model1.apply(v, a), variables, x)
        flops = float(ca.get("flops") or 0) or None
    except Exception:
        pass
    from kair_tpu.utils.summary import peak_for_device_kind
    peak = peak_for_device_kind(jax.devices()[0].device_kind)

    for d, ts in diffs.items():
        per_iter = max(min(ts) / (args.k - 1), 1e-9)
        tflops = (flops / per_iter / 1e12) if flops else None
        mfu = (tflops / peak) if (tflops and peak) else None
        print(json.dumps({
            "metric": f"{args.net.upper()} x4 video SR throughput "
                      f"({args.frames}x{args.size}px, bf16"
                      f"{', fused TMSA' if args.fuse else ''}"
                      f"{', deform=' + d if d != 'gather' else ''})",
            "value": round(mp / per_iter, 4),
            "unit": "MP/s/chip",
            "vs_baseline": None,
            "ms_per_clip": round(per_iter * 1e3, 2),
            "tflops": round(tflops, 2) if tflops else None,
            "mfu": round(mfu, 4) if mfu else None,
        }))


if __name__ == "__main__":
    main()
