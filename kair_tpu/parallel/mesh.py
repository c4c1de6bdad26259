"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL distributed layer (utils/utils_dist.py:13-200).

Design: ONE global `Mesh` with axes
  'data'  — batch (data parallel; grad averaging is an XLA psum inside the
            jitted train step, replacing DDP backward hooks)
  'tile'  — spatial tile axis for sharded halo-tiled inference
            (kair_tpu.parallel.tiled) — the axis the reference scales by
            host-side overlap-tiling loops (model_vrt.py:114-223)

No rank/world bookkeeping, no collective wrappers: jax.distributed handles
multihost bootstrap; shardings are data placement annotations and XLA
inserts the collectives (psum/all_gather) over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, tile: int = 1, model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model', 'tile') mesh over the available devices.
    'model' is the tensor-parallel axis (kair_tpu.parallel.tp); axes of
    size 1 cost nothing."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (tile * model)
    assert data * tile * model == n, \
        f"mesh {data}x{model}x{tile} != {n} devices"
    arr = np.asarray(devices).reshape(data, model, tile)
    return Mesh(arr, ("data", "model", "tile"))


def make_grid_mesh(tileh: int, tilew: int, devices=None) -> Mesh:
    """2-D spatial tile-grid mesh for kair_tpu.parallel.tiled.
    make_grid_sharded_fn: axes ('tileh', 'tilew')."""
    devices = list(devices if devices is not None else jax.devices())
    assert tileh * tilew == len(devices), \
        f"grid {tileh}x{tilew} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(tileh, tilew)
    return Mesh(arr, ("tileh", "tilew"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over 'data' (per-device batch = global/num_devices,
    the reference's per-rank split, main_train_psnr.py:126-130)."""
    return NamedSharding(mesh, P(("data", "tile")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place numpy batch arrays with batch-dim sharding, rest replicated."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def replicate_state(mesh: Mesh, state):
    """Replicate a TrainState pytree across the mesh (params live replicated
    for data-parallel; tensor-parallel shardings would annotate here)."""
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def data_parallel_mesh(n_requested: int, batch0: dict, log=None):
    """Mesh for the train CLIs: gpu_ids with >1 entry becomes a ('data',)
    mesh when enough devices exist and the batch divides them; returns None
    (single-device) otherwise, loudly. (Replaces the reference's
    torchrun+DDP entry, main_train_psnr.py:36-60.)"""
    say = log or (lambda *_: None)
    n_dev = min(int(n_requested or 1), len(jax.devices()))
    if n_dev <= 1:
        return None
    bs0 = next((v.shape[0] for v in batch0.values()
                if hasattr(v, "ndim") and v.ndim >= 1), None)
    if not bs0 or bs0 % n_dev:
        say(f"batch {bs0} not divisible by {n_dev} devices; "
            "staying single-device")
        return None
    mesh = make_mesh(data=n_dev, devices=jax.devices()[:n_dev])
    say(f"data-parallel over {n_dev} devices ({bs0 // n_dev}/device)")
    return mesh
