"""Isolate binning cost across (quantum, fill, sort_mode) on the chip.

Per-item crash isolation; bench-point scene. Run:
  PYTHONPATH=. /opt/venv/bin/python scripts/profile_bin_ab.py
"""
from __future__ import annotations

from profile_binning import item  # per-item isolation helper

import numpy as np


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
    params = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, shs))
    proj = jax.jit(lambda m, s, qq, o, sh: project_gaussians(
        m, s, qq, o, sh, cam, 3))(*params)
    float(jnp.sum(proj.means2d))

    for q in (128, 256):
        for fill in ("gather", "cumsum"):
            for sm in ("rank", "2key"):
                item(f"bin Q={q} {fill} {sm}",
                     lambda m2d, q=q, fill=fill, sm=sm:
                     binning.bin_gaussians_aligned(
                         proj._replace(means2d=m2d), h, w, d, 4096, q,
                         fill=fill, sort_mode=sm),
                     (proj.means2d,))
    # Split gen budget at the bench point's raw need bucket.
    for gen in (0, 1572864):
        item(f"bin Q=128 cumsum rank gen={gen}",
             lambda m2d, gen=gen: binning.bin_gaussians_aligned(
                 proj._replace(means2d=m2d), h, w, d, 4096, 128,
                 fill="cumsum", sort_mode="rank", gen_entries=gen),
             (proj.means2d,))

    # Sub-op: the flat-gather relayout alone at both quanta.
    sorted_gauss = jnp.asarray(rng.integers(0, n, size=d).astype(np.int32))
    tile_start = jnp.sort(jnp.asarray(
        rng.integers(0, d, size=8160).astype(np.int32)))
    tile_count = jnp.asarray(
        rng.integers(0, 300, size=8160).astype(np.int32))
    for q in (128, 256):
        item(f"relayout flat-gather Q={q}",
             lambda sg, q=q: binning._aligned_from_sorted(
                 sg, tile_start, tile_count, jnp.int32(d), 8160, 4096, q),
             (sorted_gauss,))


if __name__ == "__main__":
    main()
