"""Micro-profile every sub-op of the binning/pack glue on the chip.

Decomposes bin_gaussians_aligned + pack_entries at the bench point
(1080p / 200k Gaussians / trainer budget) into individually-timed
sub-ops, plus design probes for the round-3 glue candidates:
  - keyless 1-key sort (tile<<RB | depth-rank packed in one i32)
  - stable 1-key sort (alternative to the rank-key encoding)
  - plain unique-dst scatter vs scatter-add vs sorted-dst scatter-add
  - [D,16] -> [16,D] transpose alone (the pack's layout change)
Every item runs in its own try/except so one tunnel 500 never kills the
rest of the agenda (VERDICT r2 weak-8). Run:
  /opt/venv/bin/python scripts/profile_binning.py
"""
from __future__ import annotations

import time
import traceback

import numpy as np


def bench_fn(fn, args, iters=20):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

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


def item(name, fn, args, iters=20):
    """Per-item isolation: one tunnel crash must not kill the agenda."""
    try:
        t = bench_fn(fn, args, iters)
        print(f"{name:34s}: {t * 1e3:8.2f} ms", flush=True)
        return t
    except Exception as ex:
        print(f"{name:34s}: FAILED {type(ex).__name__}: {str(ex)[:90]}",
              flush=True)
        traceback.print_exc()
        return None


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
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.03),
                                (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    cam = look_at_camera(eye=(0.0, -1.0, -6.0), target=(0, 0, 0), fovx=1.2,
                         width=w, height=h)
    d = 1 << 21
    q = 256
    tiles_y, tiles_x = binning.num_tiles(h, w)
    n_tiles = tiles_y * tiles_x

    params = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, shs))
    proj = jax.jit(lambda m, s, qq, o, sh: project_gaussians(
        m, s, qq, o, sh, cam, 3))(*params)
    float(jnp.sum(proj.means2d))

    bins = jax.jit(lambda p: binning.bin_gaussians_aligned(
        p, h, w, d, 4096, q))(proj)
    print(f"total entries: {int(bins.total_entries)}  "
          f"aligned: {int(bins.aligned_entries)}  capacity: {d}  Q: {q}",
          flush=True)

    # ---------------- current pipeline, whole and in stages ----------------
    item("bin_aligned Q=256 gather",
         lambda m2d: binning.bin_gaussians_aligned(
             proj._replace(means2d=m2d), h, w, d, 4096, q, fill="gather"),
         (proj.means2d,))
    item("bin_aligned Q=256 cumsum",
         lambda m2d: binning.bin_gaussians_aligned(
             proj._replace(means2d=m2d), h, w, d, 4096, q, fill="cumsum"),
         (proj.means2d,))

    def upto_rects(m2d):
        p = proj._replace(means2d=m2d)
        return binning._tight_rects(p, tiles_y, tiles_x, 16)

    item("  rects+counts (N)", upto_rects, (proj.means2d,))

    rect_min_x, rect_min_y, span_x, span_y, counts = jax.jit(upto_rects)(
        proj.means2d)
    counts_f = counts

    def gen_owner(cnt_in):
        cnt = cnt_in
        offsets = jnp.cumsum(cnt) - cnt
        starts = jnp.where((cnt > 0) & (offsets < d), offsets, d)
        marker = jnp.zeros((d + 1,), jnp.int32).at[starts].max(
            jnp.arange(n, dtype=jnp.int32) + 1)
        owner_g = jax.lax.cummax(marker[:d])
        return owner_g

    item("  cumsum+marker+cummax (D)", gen_owner, (counts_f,))
    owner_g = jax.jit(gen_owner)(counts_f)
    gauss = jnp.maximum(owner_g - 1, 0)

    gtab = jnp.stack([rect_min_x, rect_min_y, jnp.maximum(span_x, 1),
                      (jnp.cumsum(counts) - counts).astype(jnp.int32),
                      jnp.arange(n, dtype=jnp.int32),
                      rect_min_x, rect_min_y, span_x], axis=1)
    item("  [D,8] row gather", lambda g8: g8[gauss], (gtab,))

    offsets = jnp.cumsum(counts) - counts
    starts = jnp.where((counts > 0) & (offsets < d), offsets, d)
    item("  delta-cumsum fill [D,8]",
         lambda g8: binning._delta_cumsum_rows(g8, counts, starts, d),
         (gtab,))

    grows = jax.jit(lambda g8: g8[gauss])(gtab)

    def index_math(g8):
        j = jnp.arange(d, dtype=jnp.int32) - g8[:, 3]
        tx = g8[:, 0] + j % g8[:, 2]
        ty = g8[:, 1] + j // g8[:, 2]
        return jnp.where(owner_g > 0, ty * tiles_x + tx, n_tiles)

    item("  entry tile-id math (D)", index_math, (grows,))
    tile_id = jax.jit(index_math)(grows)
    depth_bits = jnp.asarray(
        rng.integers(0, 1 << 30, size=d).astype(np.int32))

    # ---------------- sorts ----------------
    item("  sort 2-key (tile,depth)+pay",
         lambda t_: jax.lax.sort((t_, depth_bits, gauss), num_keys=2),
         (tile_id,))
    item("  sort 1-key i32 + payload",
         lambda t_: jax.lax.sort((t_, gauss), num_keys=1), (tile_id,))
    # Rank-key: (tile << 18) | depth-rank --- ONE keyless array.
    rank = jnp.asarray(rng.permutation(n).astype(np.int32))
    key = (tile_id << 18) | rank[gauss]
    item("  sort 1-key keyless (rank-key)",
         lambda k_: jax.lax.sort((k_,), num_keys=1)[0], (key,))
    item("  sort 1-key STABLE + payload",
         lambda t_: jax.lax.sort((t_, gauss), num_keys=1, is_stable=True),
         (tile_id,))
    item("  presort N by depth (f32 key)",
         lambda dd: jax.lax.sort(
             (dd, jnp.arange(n, dtype=jnp.int32)), num_keys=1),
         (proj.depth,))

    skey = jax.jit(lambda k_: jax.lax.sort((k_,), num_keys=1)[0])(key)
    item("  searchsorted tile starts",
         lambda sk: (jnp.searchsorted(
             sk, jnp.arange(n_tiles, dtype=jnp.int32) << 18, side="left"),
             jnp.searchsorted(
             sk, (jnp.arange(n_tiles, dtype=jnp.int32) + 1) << 18,
             side="left")),
         (skey,))

    # ---------------- relayout ----------------
    sorted_gauss = jnp.asarray(rng.integers(0, n, size=d).astype(np.int32))
    tile_start = jnp.sort(jnp.asarray(
        rng.integers(0, d, size=n_tiles).astype(np.int32)))
    tile_count = jnp.asarray(
        rng.integers(0, 300, size=n_tiles).astype(np.int32))
    item("  aligned relayout (slices)",
         lambda sg: binning._aligned_from_sorted(
             sg, tile_start, tile_count, jnp.int32(d), n_tiles, 4096, q),
         (sorted_gauss,))
    item("  aligned relayout Q=128",
         lambda sg: binning._aligned_from_sorted(
             sg, tile_start, tile_count, jnp.int32(d), n_tiles, 4096, 128),
         (sorted_gauss,))

    # ---------------- pack sub-ops ----------------
    from h3dgs_tpu.ops.pallas_blend import pack_entries, pack_rows

    inv_depth = 1.0 / jnp.maximum(proj.depth, 1e-6)
    item("pack_entries (full, [16,D])",
         lambda m2d: pack_entries(m2d, proj.conic, proj.rgb, proj.opacity,
                                  inv_depth, bins.gauss_idx),
         (proj.means2d,))
    item("  pack_rows (no transpose)",
         lambda m2d: pack_rows(m2d, proj.conic, proj.rgb, proj.opacity,
                               inv_depth, bins.gauss_idx),
         (proj.means2d,))

    def attr_table(m2d):
        from h3dgs_tpu.ops.pallas_blend import (N_ROWS, R_CA, R_CC, R_ID,
                                                R_MX, R_MY, R_OP, R_R, R_B)
        attr = jnp.zeros((n, N_ROWS), jnp.float32)
        attr = attr.at[:, R_MX].set(m2d[:, 0])
        attr = attr.at[:, R_MY].set(m2d[:, 1])
        attr = attr.at[:, R_CA:R_CC + 1].set(proj.conic)
        attr = attr.at[:, R_R:R_B + 1].set(proj.rgb)
        attr = attr.at[:, R_OP].set(proj.opacity)
        attr = attr.at[:, R_ID].set(inv_depth)
        return attr

    item("  attr table build (N)", attr_table, (proj.means2d,))
    attr = jax.jit(attr_table)(proj.means2d)
    gi_al = jnp.maximum(bins.gauss_idx, 0)
    item("  [D,16] row gather alone", lambda a: a[gi_al], (attr,))
    rows = jax.jit(lambda a: a[gi_al])(attr)
    item("  [D,16] -> [16,D] transpose", lambda r: r.T + 0.0, (rows,))
    item("  [N,16] row permute", lambda a: a[rank], (attr,))

    # ---------------- gradient scatter strategies ----------------
    dentries = jnp.ones((16, d), jnp.float32)
    drows = jnp.ones((d, 16), jnp.float32)
    gidx_rand = jnp.asarray(rng.integers(0, n, size=d).astype(np.int32))
    gidx_sorted = jnp.sort(gidx_rand)
    item("scatter-add [D,16] random dst",
         lambda r: jnp.zeros((n + 1, 16), jnp.float32).at[gidx_rand].add(
             r, mode="drop"),
         (drows,))
    item("scatter-add [D,16] SORTED dst",
         lambda r: jnp.zeros((n + 1, 16), jnp.float32).at[gidx_sorted].add(
             r, mode="drop"),
         (drows,))
    uniq = jnp.asarray(rng.permutation(d).astype(np.int32))
    item("plain scatter [D,16] unique dst",
         lambda r: jnp.zeros((d, 16), jnp.float32).at[uniq].set(
             r, mode="drop"),
         (drows,))
    uniq_sorted = jnp.arange(d, dtype=jnp.int32)  # identity = best case
    item("plain scatter [D,16] iota dst",
         lambda r: jnp.zeros((d, 16), jnp.float32).at[uniq_sorted].set(
             r, mode="drop"),
         (drows,))
    # Segment-sum via f32 cumsum difference (precision-risky; timing only)
    item("f32 cumsum [D,16] ax0",
         lambda r: jnp.cumsum(r, axis=0), (drows,))


if __name__ == "__main__":
    main()
