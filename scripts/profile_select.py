"""Break down the viewer's fresh-frame cost: cut_mask / expand_to_size /
interpolate_cut / select / splat / full fused frame, each timed honestly
(salted input, scalar-fetch sync) on the demo hierarchy at 1080p.

Steers VERDICT r3 item 7 (full-frame <= 70 ms): the r3 gap (97 ms full
vs 50.5 cached) is ON-DEVICE select+interp cost — render_cut is already
a single fused dispatch.

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/profile_select.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main(iters=12):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from h3dgs_tpu.hierarchy import cut as cut_lib
    from h3dgs_tpu.model.init import state_from_hierarchy
    from h3dgs_tpu.hierarchy import tree as tree_lib
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.train.loop import entry_budget_for_scene
    from h3dgs_tpu.train.post_step import (render_cut,
                                           select_cut_gaussians,
                                           splat_cut_gaussians)

    print("backend:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    n = 210_000
    means = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.01), np.log(0.05),
                                (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.4, 0.95, n).astype(np.float32)
    shs = rng.normal(0, 0.2, (n, 16, 3)).astype(np.float32)
    h = tree_lib.build_hierarchy(means, shs, opac, np.log(scales), quats)
    state, _ = state_from_hierarchy(h)
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    w, hh = 1920, 1080
    cam = look_at_camera(eye=(0, -1.0, -7.5), target=(0, 0, 0), fovx=1.2,
                         width=w, height=hh)
    max_cut = min(1 << int(np.ceil(np.log2(h.n_leaves * 1.25))),
                  h.n_nodes)
    limit = jnp.float32(cut_lib.pixel_limit(3.0, float(cam.tanfovx), w))
    bg = jnp.zeros(3, jnp.float32)
    params = state.trainable_dict()

    flat0 = jax.jit(lambda lim: select_cut_gaussians(
        state, nodes, boxes, cam.cam_center, lim, max_cut))(limit)[:5]
    budget = entry_budget_for_scene(*flat0, cam, 3)
    cfg = RasterizeConfig(max_entries=budget, max_per_tile=4096,
                          bwd_entries=0)
    print(f"nodes={h.n_nodes} max_cut={max_cut} budget={budget}",
          flush=True)

    def timed(label, fn):
        jf = jax.jit(fn)
        float(jnp.sum(jf(limit)))      # warm + reliable sync
        t0 = time.perf_counter()
        outs = [jf(limit * (1.0 + 1e-6 * (i + 1))) for i in range(iters)]
        float(sum(jnp.sum(o) for o in outs))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {label:28s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    timed("cut_mask", lambda lim: cut_lib.cut_mask(
        nodes, boxes, lim, cam.cam_center)[2])
    timed("cut_counts ladder(16)", lambda lim: cut_lib.cut_counts(
        nodes, boxes, cam.cam_center,
        lim * (1.5 ** jnp.arange(16, dtype=jnp.float32))))
    timed("expand_to_size", lambda lim: cut_lib.expand_to_size(
        nodes, boxes, lim, cam.cam_center, max_cut).weights)
    timed("expand+interpolate", lambda lim: cut_lib.interpolate_cut(
        params, cut_lib.expand_to_size(nodes, boxes, lim,
                                       cam.cam_center, max_cut))[0])
    timed("select (full)", lambda lim: select_cut_gaussians(
        state, nodes, boxes, cam.cam_center, lim, max_cut)[0])
    timed("splat only", lambda lim: splat_cut_gaussians(
        *flat0, cam, 3, bg, cfg)["render"] * (lim * 0 + 1))
    timed("FULL frame (render_cut)", lambda lim: render_cut(
        state, nodes, boxes, cam, lim, 3, bg, cfg, max_cut)["render"])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
