"""Model benchmark report — counterpart of the reference's
``main_challenge_sr.py`` (:99-171): average per-image runtime, FLOPs,
#params, #activations, peak memory.

    python -m kair_tpu.cli.challenge --net msrresnet0 --scale 4 \
        --input 256 256 --batch 1 --dtype bf16
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", type=str, default="msrresnet0")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--in_nc", type=int, default=3)
    parser.add_argument("--nc", type=int, default=64)
    parser.add_argument("--nb", type=int, default=16)
    parser.add_argument("--input", type=int, nargs=2, default=[256, 256])
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"])
    parser.add_argument("--iters", type=int, default=8)
    args = parser.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from kair_tpu.models.registry import define_g
    from kair_tpu.utils.summary import activation_count, cost_analysis, count_params
    from kair_tpu.utils.timing import per_iter_seconds

    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    opt = {"netG": {"net_type": args.net, "in_nc": args.in_nc,
                    "out_nc": args.in_nc, "nc": args.nc, "nb": args.nb,
                    "scale": args.scale, "upscale": args.scale}}
    model = define_g(opt, dtype=dtype)

    h, w = args.input
    x = jnp.asarray(np.random.RandomState(0).rand(args.batch, h, w, args.in_nc),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    fwd = lambda v, a: model.apply(v, a)

    ca = cost_analysis(lambda a: fwd(variables, a), x)
    n_params = count_params(variables.get("params", variables))
    n_act = activation_count(lambda a: fwd(variables, a), x)

    sf = args.scale

    def step(a):
        y = fwd(variables, a)
        return y[:, ::sf, ::sf, :] if sf > 1 else y

    t = per_iter_seconds(step, x, k_long=args.iters)
    mp_s = args.batch * h * w / t / 1e6

    report = {
        "net": args.net,
        "input": [args.batch, h, w, args.in_nc],
        "params": n_params,
        "flops_G": round(float(ca.get("flops", float("nan"))) / 1e9, 3),
        "activations_M": round(n_act / 1e6, 3),
        "bytes_accessed_MB": round(float(ca.get("bytes accessed", float("nan"))) / 1e6, 1),
        "runtime_ms": round(t * 1e3, 3),
        "throughput_MP_per_s": round(mp_s, 3),
        "device": str(jax.devices()[0]),
        "dtype": args.dtype,
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
