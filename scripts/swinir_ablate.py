"""SwinIR headline-bench cost attribution by ablation (fallback for when
the jax.profiler trace through the axon tunnel lacks device events).

Times three model variants interleaved in ONE process (round-2 lesson:
cross-process comparisons are noise) with bench.py's chained-fori_loop
methodology, at the exact headline shape (batch 16, 128px, SwinIR-M x4):

  full   — the headline config (fused strip kernel, pixelshuffle head)
  nohead — same body, upsampler='' (residual conv_last at LR size);
           full - nohead ≈ upsampler head cost (conv_before_upsample +
           2 pixelshuffle convs + conv_last at HR)
  nobody — depths=(), upsampler='pixelshuffle' (conv_first + conv_after
           _body + head, no transformer blocks); full - nobody ≈ body
           (36 STLs + 6 RSTB convs)

Prints one JSON line per variant plus a derived-split line.
"""

import json
import sys
import time

import numpy as np


def timed_chain(apply_fn, variables, x, k, sf):
    import jax
    import jax.numpy as jnp

    def chain(v, a):
        def body(_, acc):
            y = apply_fn(v, acc)
            return y[:, ::sf, ::sf, :] if sf > 1 else y
        out = jax.lax.fori_loop(0, k, body, a)
        return jnp.sum(out)

    fn = jax.jit(chain)
    float(fn(variables, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(variables, x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import os
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from kair_tpu.models.swinir import SwinIR

    lr, batch = 128, 16
    x = jnp.asarray(np.random.RandomState(0).rand(batch, lr, lr, 3),
                    jnp.float32)
    k_long, k_short = 8, 1

    variants = {
        "full": (dict(upscale=4, upsampler="pixelshuffle", depths=(6,) * 6,
                      num_heads=(6,) * 6), 4),
        "nohead": (dict(upscale=1, upsampler="", depths=(6,) * 6,
                        num_heads=(6,) * 6), 1),
        "nobody": (dict(upscale=4, upsampler="pixelshuffle", depths=(),
                        num_heads=()), 4),
    }
    ms = {}
    for name, (kw, sf) in variants.items():
        model = SwinIR(in_chans=3, embed_dim=180, window_size=8,
                       mlp_ratio=2.0, dtype=jnp.bfloat16, fuse_block=True,
                       **kw)
        variables = model.init(jax.random.PRNGKey(0), x)
        apply_fn = lambda v, a: model.apply(v, a)
        diffs = []
        for _ in range(3):
            tl = timed_chain(apply_fn, variables, x, k_long, sf)
            ts = timed_chain(apply_fn, variables, x, k_short, sf)
            diffs.append(tl - ts)
        per = max(min(diffs) / (k_long - k_short), 1e-9)
        ms[name] = per * 1e3
        print(json.dumps({"variant": name, "ms_per_iter": round(per * 1e3, 3)}))
        sys.stdout.flush()

    body = ms["full"] - ms["nobody"]
    head = ms["full"] - ms["nohead"]
    rest = ms["full"] - body - head
    print(json.dumps({
        "split_ms": {"body_blocks": round(body, 2),
                     "upsample_head": round(head, 2),
                     "first/last_convs+overhead": round(rest, 2),
                     "full": round(ms["full"], 2)}}))


if __name__ == "__main__":
    main()
