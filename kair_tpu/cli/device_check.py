"""Environment smoke test — counterpart of the reference's testcuda.py
(:1-37): enumerate devices, round-trip a tensor, run a tiny jitted matmul,
and report the mesh the framework would build.

    python -m kair_tpu.cli.device_check
"""

from __future__ import annotations


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    print(f"jax {jax.__version__}")
    devices = jax.devices()
    print(f"devices ({len(devices)}):")
    for d in devices:
        print(f"  [{d.id}] {d.device_kind} platform={d.platform}")

    # tensor round trip (testcuda.py's .to(device)/.cpu() check)
    x = np.random.RandomState(0).rand(128, 128).astype(np.float32)
    dx = jax.device_put(x, devices[0])
    back = np.asarray(dx)
    assert np.array_equal(back, x), "device round-trip corrupted data"
    print("tensor round-trip: OK")

    y = jax.jit(lambda a: (a @ a.T).sum())(dx)
    print(f"jitted matmul on {devices[0].platform}: {float(y):.3f}")

    from kair_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    print("OK")


if __name__ == "__main__":
    main()
