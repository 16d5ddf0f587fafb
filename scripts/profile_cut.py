"""Profile hierarchy-cut rendering stages: select vs interpolate vs splat.

Run: /opt/venv/bin/python scripts/profile_cut.py
"""
from __future__ import annotations

import time

import numpy as np


def bench(label, fn, args, iters=12):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)
    outs = jfn(*args)
    float(sum(jnp.sum(a.astype(jnp.float32))
              for a in jax.tree.leaves(outs)))
    t0 = time.perf_counter()
    acc = []
    for i in range(iters):
        outs = jfn(args[0] + np.float32(i * 1e-6), *args[1:])
        acc.append(jax.tree.leaves(outs)[0])
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:28s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.hierarchy import cut as cut_lib
    from h3dgs_tpu.hierarchy.tree import build_hierarchy
    from h3dgs_tpu.model.state import from_arrays
    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.utils.sh import rgb_to_sh

    rng = np.random.default_rng(0)
    n = 200_000
    xyz = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    alpha = rng.uniform(0.3, 0.95, n).astype(np.float32)
    scaling = rng.uniform(np.log(0.01), np.log(0.04), (n, 3)).astype(
        np.float32)
    rotation = rng.normal(size=(n, 4)).astype(np.float32)
    rotation /= np.linalg.norm(rotation, axis=1, keepdims=True)
    h = build_hierarchy(xyz, shs, alpha, scaling, rotation)

    state = from_arrays(
        xyz=h.xyz, features_dc=h.shs[:, :1], features_rest=h.shs[:, 1:],
        opacity=h.alpha[:, None], scaling=h.scaling, rotation=h.rotation,
        capacity=h.n_nodes, max_sh_degree=3, n_skybox=0, skybox_last=True)
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    params = state.trainable_dict()

    w, hh = 1920, 1080
    cfg = RasterizeConfig(max_entries=5 << 19, max_per_tile=4096)
    max_cut = min(1 << 18, h.n_nodes)
    cam = look_at_camera(eye=(0, -1.0, -6.0), target=(0, 0, 0), fovx=1.2,
                         width=w, height=hh)
    limit = jnp.float32(
        cut_lib.pixel_limit(3.0, float(cam.tanfovx), w))
    bg = jnp.zeros(3, jnp.float32)

    bench("expand_to_size (select)",
          lambda lim: cut_lib.expand_to_size(nodes, boxes, lim,
                                             cam.cam_center, max_cut),
          (limit,))

    cut = jax.jit(lambda lim: cut_lib.expand_to_size(
        nodes, boxes, lim, cam.cam_center, max_cut))(limit)
    jax.block_until_ready(cut.indices)

    bench("interpolate_cut",
          lambda lim: cut_lib.interpolate_cut(
              params, cut._replace(weights=cut.weights + lim * 0)),
          (limit,))

    xyzs, scales, quats, opac, shs_i = jax.jit(
        lambda: cut_lib.interpolate_cut(params, cut))()
    jax.block_until_ready(xyzs)

    bench("rasterize (splat only)",
          lambda x: rasterize(x, scales, quats, opac, shs_i, cam, 3, bg,
                              config=cfg)["render"],
          (xyzs,))


if __name__ == "__main__":
    main()
