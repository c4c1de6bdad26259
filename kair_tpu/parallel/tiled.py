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

from typing import Callable, Tuple

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


def _extend_dim(x: jnp.ndarray, ext: int, axis_name: str, dim: int):
    """Append `ext` rows (along `dim`) from both mesh neighbours. Edge
    shards receive zeros (ppermute semantics) — callers skip them via the
    clamped-window slice."""
    n_dev = jax.lax.axis_size(axis_name)
    if n_dev == 1:
        pad = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, ext, axis=dim))
        return jnp.concatenate([pad, x, pad], axis=dim)
    down = [(i, i + 1) for i in range(n_dev - 1)]
    up = [(i + 1, i) for i in range(n_dev - 1)]
    size = x.shape[dim]
    from_prev = jax.lax.ppermute(
        jax.lax.slice_in_dim(x, size - ext, size, axis=dim), axis_name, down)
    from_next = jax.lax.ppermute(
        jax.lax.slice_in_dim(x, 0, ext, axis=dim), axis_name, up)
    return jnp.concatenate([from_prev, x, from_next], axis=dim)


def _grid_tile_body(x, fn, th, tw, halo, sf, axes, hdim):
    """Shared per-device body of the 2-D grid-sharded forwards: halo
    exchange along both tile axes, clamped-window slice, run `fn`, keep own
    output region. `hdim` is the H axis index (1 for NHWC images, 2 for
    (B,D,H,W,C) clips); leading dims pass through untouched."""
    hs, ws = x.shape[hdim], x.shape[hdim + 1]
    h_total, w_total = hs * th, ws * tw
    assert 2 * halo <= hs and 2 * halo <= ws, \
        "2*halo must fit one neighbour tile (single-hop exchange)"
    # gather 2*halo from each side: rows first, then cols on the
    # row-extended slab (propagates corner data)
    ext = _extend_dim(x, 2 * halo, axes[0], hdim)
    ext = _extend_dim(ext, 2 * halo, axes[1], hdim + 1)

    ih = jax.lax.axis_index(axes[0])
    iw = jax.lax.axis_index(axes[1])
    band_h = min(hs + 2 * halo, h_total)
    band_w = min(ws + 2 * halo, w_total)
    # global clamped window start; ext slab starts at (i*hs - 2*halo)
    start_h = jnp.clip(ih * hs - halo, 0, h_total - band_h)
    start_w = jnp.clip(iw * ws - halo, 0, w_total - band_w)
    starts = [0] * x.ndim
    sizes = list(ext.shape)
    starts[hdim] = start_h - (ih * hs - 2 * halo)
    starts[hdim + 1] = start_w - (iw * ws - 2 * halo)
    sizes[hdim], sizes[hdim + 1] = band_h, band_w
    window = jax.lax.dynamic_slice(ext, starts, sizes)

    y = fn(window)
    ostarts = [0] * y.ndim
    osizes = list(y.shape)
    ostarts[hdim] = (ih * hs - start_h) * sf
    ostarts[hdim + 1] = (iw * ws - start_w) * sf
    osizes[hdim], osizes[hdim + 1] = hs * sf, ws * sf
    return jax.lax.dynamic_slice(y, ostarts, osizes)


def make_grid_sharded_fn(fn: Callable, mesh: Mesh, halo: int, sf: int = 1,
                         axes: Tuple[str, str] = ("tileh", "tilew")) -> Callable:
    """EXACT 2-D tile-grid sharded forward with a NON-replicated input.

    The input arrives sharded P(None, axes[0], axes[1], None) — each device
    holds only its (H/th, W/tw) tile, so device memory scales down with the
    grid (the reference's actual reason for tiling, model_vrt.py:158-223).
    Each device ppermute-gathers 2*halo rows/cols from its neighbours, then
    runs `fn` on a CLAMPED (tile + 2*halo)² window that always lies fully
    inside the image (the band trick of make_sharded_tiled_fn, itself the
    reference's quadrant-split rule that tiles include the true border,
    utils_model.py:127-151), and keeps its own region of the output.

    Exactness: the clamped window means true image borders are processed
    with the net's OWN padding (zero-pad convs bit-match the monolithic
    run); interior seams are exact when halo ≥ the receptive-field
    influence radius. For window attention keep tile size and halo
    multiples of the window size so the partition stays aligned.

    Requires 2*halo ≤ min(tile_h, tile_w) (single-hop exchange).
    Returns a jitted (N,H,W,C) → (N,H*sf,W*sf,C') callable; pass inputs
    already placed with grid_sharding(mesh, axes) (or let jit shard them).
    """
    th, tw = mesh.shape[axes[0]], mesh.shape[axes[1]]

    def tile_fn(x):
        # x: this device's tile (N, hs, ws, C)
        return _grid_tile_body(x, fn, th, tw, halo, sf, axes, hdim=1)

    spec = P(None, axes[0], axes[1], None)
    sharded = shard_map(tile_fn, mesh=mesh, in_specs=(spec,),
                        out_specs=spec, check_rep=False)
    return jax.jit(sharded)


def grid_sharding(mesh: Mesh, axes: Tuple[str, str] = ("tileh", "tilew")):
    """NamedSharding for (N,H,W,C) inputs of make_grid_sharded_fn."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P(None, axes[0], axes[1], None))


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


def make_grid_sharded_video_fn(fn: Callable, mesh: Mesh, halo: int,
                               sf: int = 1,
                               axes: Tuple[str, str] = ("tileh", "tilew")
                               ) -> Callable:
    """2-D tile-grid sharded VIDEO forward with a NON-replicated input —
    make_grid_sharded_fn lifted to (B, D, H, W, C) clips (the reference's
    host patch loop, model_vrt.py:158-223, whose per-patch `.cpu()` copies
    this replaces; SURVEY.md §5.7).

    Each device holds its (H/th, W/tw) spatial tile of every frame,
    ppermute-gathers 2*halo rows/cols, runs the FULL video net on its
    clamped (tile+2*halo)² window, and keeps its own region. Identical
    patch geometry to `eval.video_test.clamped_window_starts` — the
    host-loop equivalence is asserted in tests/test_parallel.py.

    Caveat (same as the reference's spatial tiling): nets that compute
    optical flow internally (VRT/RVRT SpyNet) see per-window flows, so
    tile size trades throughput against flow quality exactly as
    `size_patch_testing` does in the reference."""
    th, tw = mesh.shape[axes[0]], mesh.shape[axes[1]]

    def tile_fn(x):
        # x: this device's tile (B, D, hs, ws, C)
        return _grid_tile_body(x, fn, th, tw, halo, sf, axes, hdim=2)

    spec = P(None, None, axes[0], axes[1], None)
    sharded = shard_map(tile_fn, mesh=mesh, in_specs=(spec,),
                        out_specs=spec, check_rep=False)
    return jax.jit(sharded)


def video_grid_sharding(mesh: Mesh,
                        axes: Tuple[str, str] = ("tileh", "tilew")):
    """NamedSharding for (B,D,H,W,C) inputs of make_grid_sharded_video_fn."""
    from jax.sharding import NamedSharding

    return NamedSharding(mesh, P(None, None, axes[0], axes[1], None))
