"""Cumulative-prefix timing of bin_gaussians_aligned internals on TPU.

NOTE: the staged body below is a hand-inlined SNAPSHOT of the production
binning as of the session it was written (it predates the tight tile
culling) — treat deltas as indicative, and re-sync the copy before
trusting absolute numbers.

Run: /opt/venv/bin/python scripts/profile_bin_stages.py
"""
from __future__ import annotations

import time

import numpy as np


def bench_fn(fn, args, iters=15):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda salt, *a: fn(*((a[0] + salt,) + a[1:])))
    outs = jfn(jnp.float32(0.0), *args)
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in jax.tree.leaves(outs)))
    t0 = time.perf_counter()
    acc = []
    for i in range(iters):
        outs = jfn(jnp.float32((i + 1) * 1e-6), *args)
        acc.append(jax.tree.leaves(outs)[0])
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in acc))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.ops import binning
    from h3dgs_tpu.ops.projection import project_gaussians
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.utils.sh import rgb_to_sh

    rng = np.random.default_rng(0)
    n = 200_000
    w, h = 1920, 1080
    means = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.03), (n, 3))).astype(
        np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    cam = look_at_camera(eye=(0.0, -1.0, -6.0), target=(0, 0, 0), fovx=1.2,
                         width=w, height=h)
    proj = jax.jit(lambda m, s, q, o, sh: project_gaussians(
        m, s, q, o, sh, cam, 3))(*(jnp.asarray(a) for a in
                                   (means, scales, quats, opac, shs)))
    float(jnp.sum(proj.means2d))

    d = 1 << 21
    max_per_tile = 4096
    chunk_e = 256
    tile = binning.TILE
    tiles_y, tiles_x = binning.num_tiles(h, w, tile)
    n_tiles = tiles_y * tiles_x

    def stage(upto):
        def f(m2d):
            p = proj._replace(means2d=m2d)
            x = p.means2d[:, 0]
            y = p.means2d[:, 1]
            r = p.radius.astype(x.dtype)
            rect_min_x = jnp.clip(((x - r) / tile).astype(jnp.int32), 0, tiles_x)
            rect_min_y = jnp.clip(((y - r) / tile).astype(jnp.int32), 0, tiles_y)
            rect_max_x = jnp.clip(((x + r + tile - 1) / tile).astype(jnp.int32), 0, tiles_x)
            rect_max_y = jnp.clip(((y + r + tile - 1) / tile).astype(jnp.int32), 0, tiles_y)
            span_x = jnp.maximum(rect_max_x - rect_min_x, 0)
            span_y = jnp.maximum(rect_max_y - rect_min_y, 0)
            counts = jnp.where(p.valid & (p.radius > 0), span_x * span_y, 0)
            offsets = jnp.cumsum(counts) - counts
            total = offsets[-1] + counts[-1]
            if upto == "counts":
                return offsets, total
            starts = jnp.where((counts > 0) & (offsets < d), offsets, d)
            marker = jnp.zeros((d + 1,), jnp.int32).at[starts].max(
                jnp.arange(n, dtype=jnp.int32) + 1)
            owner_g = jax.lax.cummax(marker[:d])
            entry_valid = (owner_g > 0) & (jnp.arange(d) < jnp.minimum(total, d))
            gauss = jnp.maximum(owner_g - 1, 0)
            if upto == "owner":
                return gauss, entry_valid
            depth_bits = jax.lax.bitcast_convert_type(
                jnp.maximum(p.depth, 0.0).astype(jnp.float32), jnp.int32)
            gtab = jnp.stack([rect_min_x, rect_min_y,
                              jnp.maximum(span_x, 1), offsets.astype(jnp.int32),
                              depth_bits, jnp.zeros_like(rect_min_x),
                              jnp.zeros_like(rect_min_x),
                              jnp.zeros_like(rect_min_x)], axis=1)
            grows = gtab[gauss]
            j = jnp.arange(d, dtype=jnp.int32) - grows[:, 3]
            tx = grows[:, 0] + j % grows[:, 2]
            ty = grows[:, 1] + j // grows[:, 2]
            tile_id = jnp.where(entry_valid, ty * tiles_x + tx, n_tiles)
            if upto == "tileid":
                return tile_id, grows[:, 4]
            sorted_tile, _, sorted_gauss = jax.lax.sort(
                (tile_id, grows[:, 4], gauss), num_keys=2)
            if upto == "sort":
                return sorted_tile, sorted_gauss
            tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
            tile_start = jnp.searchsorted(sorted_tile, tile_range,
                                          side="left").astype(jnp.int32)
            tile_end = jnp.searchsorted(sorted_tile, tile_range,
                                        side="right").astype(jnp.int32)
            if upto == "searchsorted":
                return tile_start, tile_end, sorted_gauss
            return binning._aligned_from_sorted(
                sorted_gauss.astype(jnp.int32), tile_start,
                (tile_end - tile_start).astype(jnp.int32),
                jnp.asarray(total, jnp.int32), n_tiles, max_per_tile,
                chunk_e)
        return f

    prev = 0.0
    for name in ["counts", "owner", "tileid", "sort", "searchsorted", "full"]:
        t = bench_fn(stage(name), (proj.means2d,)) * 1e3
        print(f"{name:14s} cum {t:7.2f} ms   delta {t - prev:7.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
