"""Tile binning: duplicate Gaussians per overlapped tile and depth-sort.

The CUDA rasterizer family allocates a dynamic duplication buffer and radix
sorts (tile | depth) keys. XLA needs static shapes, so we re-design:

  1. Each visible Gaussian covers a tile rectangle (same getRect rule as the
     CUDA preprocess). Per-Gaussian duplicate counts -> exclusive cumsum
     gives each Gaussian a contiguous run of entry slots in a fixed-size
     entry buffer of capacity ``max_entries`` (a static budget; overflow is
     counted and the tail dropped).
  2. Entry ownership is recovered with a scatter + cummax trick instead of a
     host-side loop: O(D) vector work, no data-dependent shapes.
  3. One lexicographic ``jax.lax.sort`` over (tile_id, depth) replaces the
     radix sort; per-tile ranges come from two searchsorted calls.

The output is a flat, depth-sorted, *contiguous-per-tile* entry list — the
same data layout the CUDA kernel consumes (point_list), which is exactly
what the Pallas blend kernel wants: per-tile work is a dynamic slice of a
contiguous buffer, ideal for sequential DMA.

Interface parity anchor: /root/reference/gaussian_renderer/__init__.py:44-113
(the rasterizer contract) — binning is internal to the CUDA extension there.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians

TILE = 16  # pixels per tile side (matches the CUDA BLOCK_X/BLOCK_Y choice)


def num_tiles(height: int, width: int, tile: int = TILE):
    ty = -(-height // tile)
    tx = -(-width // tile)
    return ty, tx


class BinnedGaussians(NamedTuple):
    """Depth-sorted per-entry data, contiguous per tile. All [D, ...]."""
    gauss_idx: jnp.ndarray    # [D] int32 source Gaussian per entry
    entry_valid: jnp.ndarray  # [D] bool
    tile_start: jnp.ndarray   # [T] int32 first entry of each tile
    tile_count: jnp.ndarray   # [T] int32 entries in each tile
    total_entries: jnp.ndarray  # [] int32 (pre-clamp; > D means overflow)


def bin_gaussians(proj: ProjectedGaussians, height: int, width: int,
                  max_entries: int, tile: int = TILE) -> BinnedGaussians:
    tiles_y, tiles_x = num_tiles(height, width, tile)
    n_tiles = tiles_y * tiles_x
    n = proj.means2d.shape[0]
    d = max_entries

    x = proj.means2d[:, 0]
    y = proj.means2d[:, 1]
    r = proj.radius.astype(x.dtype)

    # getRect: tile rectangle covered by the splat's bounding square.
    rect_min_x = jnp.clip(((x - r) / tile).astype(jnp.int32), 0, tiles_x)
    rect_min_y = jnp.clip(((y - r) / tile).astype(jnp.int32), 0, tiles_y)
    rect_max_x = jnp.clip(((x + r + tile - 1) / tile).astype(jnp.int32), 0, tiles_x)
    rect_max_y = jnp.clip(((y + r + tile - 1) / tile).astype(jnp.int32), 0, tiles_y)
    span_x = jnp.maximum(rect_max_x - rect_min_x, 0)
    span_y = jnp.maximum(rect_max_y - rect_min_y, 0)
    counts = jnp.where(proj.valid & (proj.radius > 0), span_x * span_y, 0)

    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # Recover per-entry Gaussian ownership: scatter (gauss_idx + 1) at each
    # run start, then cummax fills the run. Runs are disjoint and offsets of
    # nonzero-count Gaussians are strictly increasing, so max == last writer.
    starts = jnp.where((counts > 0) & (offsets < d), offsets, d)  # d = dropped
    marker = jnp.zeros((d + 1,), jnp.int32).at[starts].max(
        jnp.arange(n, dtype=jnp.int32) + 1)
    owner = jax.lax.cummax(marker[:d])  # [D] 1-based; 0 => empty slot
    entry_valid = (owner > 0) & (jnp.arange(d) < jnp.minimum(total, d))
    gauss = jnp.maximum(owner - 1, 0)

    # Tile of each duplicate: row-major within the Gaussian's rectangle.
    j = jnp.arange(d, dtype=jnp.int32) - offsets[gauss]
    g_span_x = jnp.maximum(span_x[gauss], 1)
    tx = rect_min_x[gauss] + j % g_span_x
    ty = rect_min_y[gauss] + j // g_span_x
    tile_id = jnp.where(entry_valid, ty * tiles_x + tx, n_tiles)  # sentinel

    depth = jnp.where(entry_valid, proj.depth[gauss], jnp.inf)
    sorted_tile, _, sorted_gauss, sorted_valid = jax.lax.sort(
        (tile_id, depth, gauss, entry_valid.astype(jnp.int32)), num_keys=2)

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_range, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_range, side="right").astype(jnp.int32)

    return BinnedGaussians(
        gauss_idx=sorted_gauss.astype(jnp.int32),
        entry_valid=sorted_valid.astype(bool),
        tile_start=tile_start,
        tile_count=(tile_end - tile_start).astype(jnp.int32),
        total_entries=total.astype(jnp.int32),
    )
