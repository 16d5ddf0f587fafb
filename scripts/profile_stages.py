"""Stage-level timing of the bench step on the current backend.

Times (with the axon-safe perturb+single-sync pattern) each stage of the
1080p fwd+bwd rasterization step separately:
  project | bin | pack+pallas_fwd | full fwd | full fwd+bwd
so perf work targets the real bottleneck. Not a test; run manually:
  /opt/venv/bin/python scripts/profile_stages.py
"""
from __future__ import annotations

import time

import numpy as np


def bench_fn(fn, args, iters=20, perturb_idx=0):
    """Axon-safe timing: perturb one input each iter, sync once at end.

    Warmup syncs through float() — block_until_ready is a no-op on axon and
    leftover warmup work would bleed into the measurement.
    """
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    jfn = jax.jit(lambda salt, *a: fn(*((a[0] + salt,) + a[1:])))
    outs = jfn(jnp.float32(0.0), *args)
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in jax.tree.leaves(outs)))
    t0 = time.perf_counter()
    acc = []
    for i in range(iters):
        outs = jfn(jnp.float32((i + 1) * 1e-7), *args)
        acc.append(jax.tree.leaves(outs)[0])
    # One sync that depends on every iteration's output.
    float(sum(jnp.sum(a) if a.dtype != bool else jnp.sum(a.astype(np.int32))
              for a in acc))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.ops import binning
    from h3dgs_tpu.ops.pallas_blend import (PallasBlendConfig, blend_entries,
                                            pack_entries)
    from h3dgs_tpu.ops.projection import project_gaussians
    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.utils.losses import photometric_loss
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
    shs[:, 1:] = rng.normal(0, 0.05, (n, 15, 3))
    cam = look_at_camera(eye=(0.0, -1.0, -6.0), target=(0, 0, 0), fovx=1.2,
                         width=w, height=h)
    # The r3 A/B winner flags (2026-08-19): E=512 Q=128 cumsum rank bwd=0.
    cfg = RasterizeConfig(max_entries=1 << 21, max_per_tile=4096,
                          chunk_e=512, quantum=128, bwd_entries=0)
    bg = jnp.zeros(3, jnp.float32)
    params = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, shs))
    target = jnp.zeros((3, h, w), jnp.float32) + 0.3

    proj = jax.jit(lambda m, s, q, o, sh: project_gaussians(
        m, s, q, o, sh, cam, 3))(*params)
    float(jnp.sum(proj.means2d))  # true sync (block_until_ready is a no-op)

    t = bench_fn(lambda m, s, q, o, sh: project_gaussians(
        m, s, q, o, sh, cam, 3), params)
    print(f"project fwd           : {t * 1e3:8.2f} ms")

    t = bench_fn(lambda m2d, *rest: binning.bin_gaussians_aligned(
        proj._replace(means2d=m2d), h, w, cfg.max_entries, cfg.max_per_tile,
        cfg.quantum), (proj.means2d,))
    print(f"bin_aligned           : {t * 1e3:8.2f} ms")

    bins = jax.jit(lambda p: binning.bin_gaussians_aligned(
        p, h, w, cfg.max_entries, cfg.max_per_tile, cfg.quantum))(proj)
    float(jnp.sum(bins.gauss_idx))  # true sync
    tiles_y, tiles_x = binning.num_tiles(h, w)
    n_tiles = tiles_y * tiles_x
    pcfg = PallasBlendConfig(chunk_e=cfg.chunk_e, quantum=cfg.quantum)
    inv_depth = 1.0 / jnp.maximum(proj.depth, 1e-6)
    n_q_per_tile = -(-bins.tile_count // cfg.quantum)
    last_chunk = jnp.where(bins.tile_count > 0,
                           bins.tile_start // cfg.quantum
                           + n_q_per_tile - 1, -1).astype(jnp.int32)

    t = bench_fn(lambda m2d: pack_entries(
        m2d, proj.conic, proj.rgb, proj.opacity, inv_depth, bins.gauss_idx,
        bins.perm),
        (proj.means2d,))
    print(f"pack_entries          : {t * 1e3:8.2f} ms")

    t = bench_fn(lambda m2d: blend_entries(
        m2d, proj.conic, proj.rgb, proj.opacity, inv_depth, bins.owner,
        bins.gauss_idx, last_chunk, bins.perm, bins.rank, None,
        n_tiles, tiles_x, binning.TILE, pcfg),
        (proj.means2d,))
    print(f"blend fwd (pallas)    : {t * 1e3:8.2f} ms")

    def blend_loss(m2d):
        out, _ = blend_entries(m2d, proj.conic, proj.rgb, proj.opacity,
                               inv_depth, bins.owner, bins.gauss_idx,
                               last_chunk, bins.perm, bins.rank, None,
                               n_tiles, tiles_x, binning.TILE, pcfg)
        return jnp.sum(out[:, 0:3, :] ** 2)

    t = bench_fn(lambda m2d: jax.grad(blend_loss)(m2d), (proj.means2d,))
    print(f"blend fwd+bwd (pallas): {t * 1e3:8.2f} ms")

    t = bench_fn(lambda m, s, q, o, sh: rasterize(
        m, s, q, o, sh, cam, 3, bg, config=cfg)["render"], params)
    print(f"full fwd              : {t * 1e3:8.2f} ms")

    def loss_fn(*p):
        out = rasterize(*p, cam, 3, bg, config=cfg)
        return photometric_loss(out["render"], target)

    t = bench_fn(lambda *p: jax.grad(loss_fn, argnums=tuple(range(5)))(*p),
                 params)
    print(f"full fwd+bwd          : {t * 1e3:8.2f} ms "
          f"({w * h / 1e6 / t:.2f} Mpix/s)")

    t = bench_fn(lambda *p: photometric_loss(p[0], target),
                 (jnp.zeros((3, h, w), jnp.float32),))
    print(f"photometric loss fwd  : {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
