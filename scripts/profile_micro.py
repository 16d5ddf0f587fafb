"""Micro-profile binning internals and blend-backward pieces on TPU.

SUPERSEDED by scripts/profile_binning.py, which covers the same probes
with per-item crash isolation (VERDICT r2 weak-8) plus the round-3 glue
candidates. Kept for the historical r2 ledger numbers.

Run: /opt/venv/bin/python scripts/profile_micro.py
"""
from __future__ import annotations

import time

import numpy as np


def bench_fn(fn, args, iters=20):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda salt, *a: fn(*((a[0] + salt,) + a[1:])))
    outs = jfn(jnp.zeros((), args[0].dtype), *args)
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in jax.tree.leaves(outs)))
    t0 = time.perf_counter()
    acc = []
    for i in range(iters):
        outs = jfn(jnp.asarray((i + 1) % 3, args[0].dtype), *args)
        acc.append(jax.tree.leaves(outs)[0])
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in acc))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.ops import binning
    from h3dgs_tpu.ops.pallas_blend import (PallasBlendConfig,
                                            pallas_blend_bwd,
                                            pallas_blend_fwd, pack_entries,
                                            scatter_entry_grads)
    from h3dgs_tpu.ops.projection import project_gaussians
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
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
    cfg = RasterizeConfig(max_entries=1 << 21, max_per_tile=4096,
                          chunk_e=256, quantum=128)
    d = cfg.max_entries
    params = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, shs))
    proj = jax.jit(lambda m, s, q, o, sh: project_gaussians(
        m, s, q, o, sh, cam, 3))(*params)
    float(jnp.sum(proj.means2d))

    bins = jax.jit(lambda p: binning.bin_gaussians_aligned(
        p, h, w, cfg.max_entries, cfg.max_per_tile, cfg.quantum))(proj)
    print("total entries:", int(bins.total_entries),
          " capacity:", d)

    # --- sort cost alone (2-key int32 vs 1-key int64 vs 1-key int32) ---
    tile_id = np.asarray(
        rng.integers(0, 8100, d, endpoint=True), np.int32)  # incl sentinel
    depth_bits = np.asarray(rng.integers(0, 1 << 30, d), np.int32)
    gauss = np.asarray(rng.integers(0, n, d), np.int32)
    tile_id_j = jnp.asarray(tile_id)
    depth_j = jnp.asarray(depth_bits)
    gauss_j = jnp.asarray(gauss)

    t = bench_fn(lambda t_, d_, g_: jax.lax.sort((t_, d_, g_), num_keys=2),
                 (tile_id_j, depth_j, gauss_j))
    print(f"sort 2-key i32 (D=2M) : {t * 1e3:8.2f} ms")

    key64 = (tile_id_j.astype(jnp.int64) << 32) | depth_j.astype(jnp.int64)
    t = bench_fn(lambda k, g_: jax.lax.sort((k, g_), num_keys=1),
                 (key64, gauss_j))
    print(f"sort 1-key i64        : {t * 1e3:8.2f} ms")

    key32 = (tile_id_j << 18) | (depth_j >> 12)
    t = bench_fn(lambda k, g_: jax.lax.sort((k, g_), num_keys=1),
                 (key32, gauss_j))
    print(f"sort 1-key i32        : {t * 1e3:8.2f} ms")

    t = bench_fn(lambda k: jax.lax.sort((k,), num_keys=1)[0], (key32,))
    print(f"sort 1-key i32 nopay  : {t * 1e3:8.2f} ms")

    # --- full binning minus sort: replace sort with identity ---
    def bin_no_sort(m2d):
        p = proj._replace(means2d=m2d)
        x, y = p.means2d[:, 0], p.means2d[:, 1]
        r = p.radius.astype(x.dtype)
        tiles_y, tiles_x = binning.num_tiles(h, w)
        rect_min_x = jnp.clip(((x - r) / 16).astype(jnp.int32), 0, tiles_x)
        rect_min_y = jnp.clip(((y - r) / 16).astype(jnp.int32), 0, tiles_y)
        rect_max_x = jnp.clip(((x + r + 15) / 16).astype(jnp.int32), 0, tiles_x)
        rect_max_y = jnp.clip(((y + r + 15) / 16).astype(jnp.int32), 0, tiles_y)
        span_x = jnp.maximum(rect_max_x - rect_min_x, 0)
        span_y = jnp.maximum(rect_max_y - rect_min_y, 0)
        counts = jnp.where(p.valid & (p.radius > 0), span_x * span_y, 0)
        offsets = jnp.cumsum(counts) - counts
        starts = jnp.where((counts > 0) & (offsets < d), offsets, d)
        marker = jnp.zeros((d + 1,), jnp.int32).at[starts].max(
            jnp.arange(n, dtype=jnp.int32) + 1)
        owner_g = jax.lax.cummax(marker[:d])
        return owner_g

    t = bench_fn(bin_no_sort, (proj.means2d,))
    print(f"binning pre-sort part : {t * 1e3:8.2f} ms")

    # --- backward pieces ---
    packed = jax.jit(pack_entries)(proj.means2d, proj.conic, proj.rgb,
                                   proj.opacity,
                                   1.0 / jnp.maximum(proj.depth, 1e-6),
                                   bins.gauss_idx)
    float(jnp.sum(packed))
    tiles_y, tiles_x = binning.num_tiles(h, w)
    pcfg = PallasBlendConfig(chunk_e=cfg.chunk_e, quantum=cfg.quantum)
    n_chunks = d // cfg.quantum

    t = bench_fn(lambda pk: pallas_blend_fwd(pk, bins.owner,
                                             tiles_x=tiles_x, tile=16,
                                             cfg=pcfg), (packed,))
    print(f"fwd kernel alone      : {t * 1e3:8.2f} ms")

    grads_chunks = jnp.ones((n_chunks, 8, 256), jnp.float32)
    t = bench_fn(lambda pk: pallas_blend_bwd(pk, bins.owner, grads_chunks,
                                             tiles_x=tiles_x, tile=16,
                                             cfg=pcfg), (packed,))
    print(f"bwd kernel alone      : {t * 1e3:8.2f} ms")

    g_tiles = jnp.ones((8100, 8, 256), jnp.float32)
    safe_owner = jnp.maximum(bins.owner, 0)
    t = bench_fn(lambda g: g[safe_owner], (g_tiles,))
    print(f"bwd grads gather      : {t * 1e3:8.2f} ms")

    dentries = jnp.ones((16, d), jnp.float32)
    t = bench_fn(lambda de: scatter_entry_grads(de, bins.gauss_idx, n),
                 (dentries,))
    print(f"bwd entry scatter-add : {t * 1e3:8.2f} ms")

    # --- scatter-strategy A/B (round-3 candidate) ---
    # Hypothesis: XLA scatter-ADD pays an RMW/serialization cost beyond
    # the plain-scatter issue rate (observed 16 ns/row vs the ~3.6 ns/row
    # gather floor). If spreading each Gaussian's updates over K slots
    # (dst = gauss*K + stream_pos%K, conflicts only when positions
    # collide mod K) recovers most of the gap, the real scatter can
    # become K-slot scatter + a dense [N,K,16] reduction (~0.25 ms HBM).
    safe = jnp.where(bins.gauss_idx >= 0, bins.gauss_idx, n)
    pos = jnp.arange(d, dtype=jnp.int32)
    for k in (4, 8, 16):
        # The REAL implementation the scatter_k flag executes — probing a
        # hand-rolled copy would silently diverge from the promoted op.
        t = bench_fn(lambda de, k=k: scatter_entry_grads(
            de, bins.gauss_idx, n, k_slots=k), (dentries,))
        print(f"K-slot scatter (K={k:2d}) : {t * 1e3:8.2f} ms")

    # Plain-scatter floor: strictly unique destinations, no accumulation
    # semantics needed (mode=drop overwrite).
    uniq = pos % ((n + 1) * 16)

    def plain(de):
        return jnp.zeros(((n + 1) * 16, 16), jnp.float32).at[uniq].set(
            de.T, mode="drop")

    t = bench_fn(lambda de: plain(de), (dentries,))
    print(f"unique plain scatter  : {t * 1e3:8.2f} ms")

    # --- design probes for round-3 binning candidates ---
    # (a) 1-key vs 2-key D-sort: gates the gaussian depth-presort idea
    #     (presort N by depth, then a stable tile-only sort preserves
    #     depth order per tile; see SOL.md ledger).
    keys32 = jnp.asarray(rng.integers(0, 8160, size=d).astype(np.int32))
    depth32 = jnp.asarray(rng.integers(0, 1 << 30, size=d).astype(np.int32))
    payload = jnp.asarray(rng.integers(0, n, size=d).astype(np.int32))
    t = bench_fn(lambda k: jax.lax.sort((k, depth32, payload), num_keys=2),
                 (keys32,))
    print(f"2-key D-sort          : {t * 1e3:8.2f} ms")
    t = bench_fn(lambda k: jax.lax.sort((k, payload), num_keys=1),
                 (keys32,))
    print(f"1-key D-sort          : {t * 1e3:8.2f} ms")
    t = bench_fn(lambda x: jax.lax.sort((x, payload), num_keys=1),
                 (jnp.asarray(rng.normal(size=n).astype(np.float32)),))
    print(f"1-key N-sort          : {t * 1e3:8.2f} ms")

    # (b) i32 vs i64 cummax over D: gates replacing the [D,8] row gather
    #     with run-start scatters + monotone (gauss<<32 | bits) fills.
    t = bench_fn(lambda x: jax.lax.cummax(x), (keys32,))
    print(f"i32 cummax over D     : {t * 1e3:8.2f} ms")
    with jax.enable_x64(True):  # i64 is emulated on TPU
        k64 = (keys32.astype(jnp.int64) << 32) | depth32.astype(jnp.int64)
        t = bench_fn(lambda x: jax.lax.cummax(x), (k64,))
    print(f"i64 cummax over D     : {t * 1e3:8.2f} ms")

    # (b2) i32 cumsum over [D,8] along axis 0: the fill step of the
    #      delta-cumsum gather replacement (SOL.md round-3 ledger) —
    #      run-start deltas telescope exactly in mod-2^32 arithmetic, so
    #      one cumsum reproduces ANY per-run-constant bit pattern.
    d8 = jnp.asarray(rng.integers(-(1 << 30), 1 << 30,
                                  size=(d, 8)).astype(np.int32))
    t = bench_fn(lambda x: jnp.cumsum(x, axis=0), (d8,))
    print(f"i32 cumsum [D,8] ax0  : {t * 1e3:8.2f} ms")

    # (c) N-row scatter of [N,8] rows into a [D,8] buffer (the run-start
    #     seeding step of the gather-free variant).
    starts = jnp.asarray(
        np.sort(rng.choice(d, size=n, replace=False)).astype(np.int32))
    rows8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    t = bench_fn(
        lambda r: jnp.zeros((d, 8), jnp.float32).at[starts].set(r),
        (rows8,))
    print(f"N-row scatter to [D,8]: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
