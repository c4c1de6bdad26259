"""Compile-probe the deformable-sampling Pallas kernels on the real TPU.

Small shapes, forward + (bilin) backward — catches Mosaic lowering bugs
(e.g. the r4 i1-relayout failure) in ~a minute instead of inside a 20-min
full-model compile.

    python scripts/probe_mosaic.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp


def main():
    # the gather-path oracles end in XLA matmuls which default to one-pass
    # bf16 on the MXU — force f32 so the oracle itself isn't the error
    # (the Pallas kernels set precision explicitly, bilin_mm.mxu_precision)
    jax.config.update("jax_default_matmul_precision", "highest")
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    ok = True

    # --- bilin_mm fwd + bwd ------------------------------------------
    from kair_tpu.ops.pallas.bilin_mm import bilinear_sample_mm, _sample_ref
    g, h, w, cs, r = 2, 16, 16, 48, 300
    feat = jnp.asarray(rng.standard_normal((g, h, w, cs)), jnp.float32)
    fy = jnp.asarray(rng.uniform(-2, h + 1, (g, r)) + 0.017, jnp.float32)
    fx = jnp.asarray(rng.uniform(-2, w + 1, (g, r)) + 0.013, jnp.float32)
    try:
        got = np.asarray(jax.jit(
            lambda f, y, x: bilinear_sample_mm(f, y, x, 128, False))(
                feat, fy, fx))
        want = np.asarray(_sample_ref(feat, fy, fx))
        err = np.abs(got - want).max()
        print(f"bilin fwd: ok, max|err| vs gather ref = {err:.2e}")
        assert err < 1e-4
    except Exception as e:
        ok = False
        print("bilin fwd FAILED:", str(e)[:500])
    try:
        ct = jnp.asarray(rng.standard_normal((g, r, cs)), jnp.float32)
        gk = jax.jit(jax.grad(
            lambda f, y, x: jnp.sum(bilinear_sample_mm(f, y, x, 128, False)
                                    * ct), argnums=(0, 1, 2)))(feat, fy, fx)
        gr = jax.grad(lambda f, y, x: jnp.sum(_sample_ref(f, y, x) * ct),
                      argnums=(0, 1, 2))(feat, fy, fx)
        errs = [float(jnp.abs(a - b).max()) for a, b in zip(gk, gr)]
        print(f"bilin bwd: ok, max|err| = {max(errs):.2e}")
        assert max(errs) < 1e-3
    except Exception as e:
        ok = False
        print("bilin bwd FAILED:", str(e)[:500])

    # --- fused GDA ----------------------------------------------------
    try:
        from kair_tpu.ops.deform_attn import deform_attention
        b, clip, c = 1, 2, 24
        heads = dg = 4
        q = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        kf = jnp.asarray(rng.standard_normal((b, clip, h, w, c)), jnp.float32)
        vf = jnp.asarray(rng.standard_normal((b, clip, h, w, c)), jnp.float32)
        off = jnp.asarray(rng.uniform(-6, 6, (b, clip, h, w, dg * 18)),
                          jnp.float32)
        want = np.asarray(deform_attention(q, kf, vf, off, (3, 3), heads, dg))
        got = np.asarray(jax.jit(
            lambda *a: deform_attention(*a, (3, 3), heads, dg,
                                        impl="fused"))(q, kf, vf, off))
        err = np.abs(got - want).max()
        print(f"gda fused fwd: ok, max|err| vs gather = {err:.2e}")
        assert err < 1e-3
    except Exception as e:
        ok = False
        print("gda fused FAILED:", str(e)[:500])

    # --- fused DCN ----------------------------------------------------
    try:
        from kair_tpu.ops.warp import modulated_deform_conv
        n, cin, cout, dg2 = 1, 8, 10, 2
        K = 9
        x = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.float32)
        off2 = jnp.asarray(rng.uniform(-4, 4, (n, h, w, dg2 * 2 * K)),
                           jnp.float32)
        m2 = jax.nn.sigmoid(jnp.asarray(
            rng.standard_normal((n, h, w, dg2 * K)), jnp.float32))
        wt = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1,
                         jnp.float32)
        bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        want = np.asarray(modulated_deform_conv(x, off2, m2, wt, bias,
                                                deformable_groups=dg2))
        got = np.asarray(jax.jit(
            lambda *a: modulated_deform_conv(*a, deformable_groups=dg2,
                                             impl="fused"))(
                x, off2, m2, wt, bias))
        err = np.abs(got - want).max()
        print(f"dcn fused fwd: ok, max|err| vs gather = {err:.2e}")
        assert err < 1e-3
    except Exception as e:
        ok = False
        print("dcn fused FAILED:", str(e)[:500])

    print("PROBE", "OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
