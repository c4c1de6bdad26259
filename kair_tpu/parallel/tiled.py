"""Mesh-sharded tiled inference (shard_map).

The reference scales image extent by HOST-side overlap-tile loops with
device round-trips per tile (model_vrt.py:158-223 `.cpu()` accumulation,
main_test_swinir.py:256-284). Here the tile grid IS a mesh axis: each
device computes one row-band of the output in a single XLA program — no
host round-trips (SURVEY.md §5.7 TPU plan).

Two strategies:

* `make_sharded_tiled_fn` — overlap-band: input replicated, each device
  slices its band + `halo` overlap (clamped at the true image boundary,
  exactly like the reference's quadrant split whose tiles always include
  the real border, utils_model.py:127-151), runs the net, and keeps its
  own region. Exact when halo ≥ the receptive-field influence radius.
* `halo_exchange_rows` — ppermute halo exchange between disjoint bands,
  for activation-sharded pipelines where the input is already distributed
  (interior seams exact; true-boundary rows see replicate-padding, which
  differs from conv zero-padding — use the overlap-band strategy when
  bit-parity at borders matters).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange_rows(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """(N,Hs,W,C) → (N,Hs+2*halo,W,C): receive bottom rows of the previous
    shard and top rows of the next (edge shards replicate their border)."""
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    down = [(i, i + 1) for i in range(n_dev - 1)]
    up = [(i + 1, i) for i in range(n_dev - 1)]
    from_prev = jax.lax.ppermute(x[:, -halo:, :, :], axis_name, down)
    from_next = jax.lax.ppermute(x[:, :halo, :, :], axis_name, up)
    top_edge = jnp.repeat(x[:, :1, :, :], halo, axis=1)
    bot_edge = jnp.repeat(x[:, -1:, :, :], halo, axis=1)
    top = jnp.where(idx == 0, top_edge, from_prev)
    bot = jnp.where(idx == n_dev - 1, bot_edge, from_next)
    return jnp.concatenate([top, x, bot], axis=1)


def make_sharded_tiled_fn(fn: Callable, mesh: Mesh, halo: int, sf: int = 1,
                          axis: str = "tile") -> Callable:
    """Exact overlap-band tiled forward over the `axis` mesh dimension.

    fn: NHWC→NHWC forward (H_out = H_in * sf). Input H must be divisible by
    the axis size. Returns jitted (N,H,W,C) → (N,H*sf,W,C_out).
    """
    n_tiles = mesh.shape[axis]

    def band_fn(x):
        # x arrives replicated: (N, H, W, C)
        n, h, w, c = x.shape
        hs = h // n_tiles
        band_h = min(hs + 2 * halo, h)   # single-tile/short inputs: whole H
        i = jax.lax.axis_index(axis)
        start = jnp.clip(i * hs - halo, 0, h - band_h)
        band = jax.lax.dynamic_slice_in_dim(x, start, band_h, axis=1)
        y = fn(band)                                   # (N, band_h*sf, W*sf?, C')
        local_off = (i * hs - start) * sf
        return jax.lax.dynamic_slice_in_dim(y, local_off, hs * sf, axis=1)

    sharded = shard_map(band_fn, mesh=mesh,
                        in_specs=(P(),),
                        out_specs=P(None, axis, None, None),
                        check_rep=False)
    return jax.jit(sharded)
