"""Hierarchy-cut render FPS at 1080p on the current backend.

The BASELINE.md "hierarchy-cut rendering at interactive rates" metric:
builds a synthetic hierarchy over N leaves, then times
cut-select -> interpolate -> splat for a moving camera at several taus.
Axon-safe timing (camera perturbed per frame, one sync at the end).

Run: /opt/venv/bin/python scripts/bench_render.py
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from h3dgs_tpu.hierarchy import cut as cut_lib
    from h3dgs_tpu.hierarchy.tree import build_hierarchy
    from h3dgs_tpu.model.state import from_arrays
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.train.post_step import render_cut
    from h3dgs_tpu.utils.sh import rgb_to_sh

    rng = np.random.default_rng(0)
    n = 200_000
    # Points on a dense wavy surface (like reconstructed geometry): leaf
    # spacing ~0.013 world units, so interior nodes merge neighboring
    # splats and tau actually moves the cut up the tree — the LOD regime
    # the hierarchy exists for. Uniform-volume points would give parents
    # that double in size immediately (no usable LOD).
    uv = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    zs = (0.4 * np.sin(uv[:, 0] * 2.1) * np.cos(uv[:, 1] * 1.7)
          + 0.02 * rng.normal(size=n)).astype(np.float32)
    xyz = np.stack([uv[:, 0], zs, uv[:, 1]], axis=1)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    alpha = rng.uniform(0.3, 0.95, n).astype(np.float32)
    scaling = rng.uniform(np.log(0.004), np.log(0.009), (n, 3)).astype(
        np.float32)
    rotation = rng.normal(size=(n, 4)).astype(np.float32)
    rotation /= np.linalg.norm(rotation, axis=1, keepdims=True)

    t0 = time.perf_counter()
    h = build_hierarchy(xyz, shs, alpha, scaling, rotation)
    print(f"hierarchy build ({n} leaves -> {h.n_nodes} nodes): "
          f"{time.perf_counter() - t0:.1f} s")

    state = from_arrays(
        xyz=h.xyz, features_dc=h.shs[:, :1], features_rest=h.shs[:, 1:],
        opacity=h.alpha[:, None], scaling=h.scaling, rotation=h.rotation,
        capacity=h.n_nodes, max_sh_degree=3, n_skybox=0, skybox_last=True)
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)

    from h3dgs_tpu.train.post_step import (select_cut_gaussians,
                                           splat_cut_gaussians)

    w, hh = 1920, 1080
    max_cut = 1 << int(np.ceil(np.log2(h.n_leaves * 1.25)))
    max_cut = min(max_cut, h.n_nodes)
    bg = jnp.zeros(3, jnp.float32)

    cams = [look_at_camera(eye=(6 * np.sin(a), -1.0, -6 * np.cos(a)),
                           target=(0, 0, 0), fovx=1.2, width=w, height=hh)
            for a in np.linspace(0, 2 * np.pi, 16, endpoint=False)]
    cam_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

    # Honest budget: probe the worst cut (tau=0) on a few orbit views and
    # take the trainer-style bucket — the r2 bench hardcoded 5<<19, which
    # taxed every D-proportional op ~25% beyond the real need.
    from h3dgs_tpu.hierarchy.cut import pixel_limit as _pl
    from h3dgs_tpu.train.loop import entry_budget_for_scene

    lim0 = jnp.float32(_pl(0.0, float(cams[0].tanfovx), w))
    budget = 0
    sel_jit = jax.jit(lambda c: select_cut_gaussians(
        state, nodes, boxes, c.cam_center, lim0, max_cut))
    for ci in (0, 5, 11):
        print(f"budget probe cam {ci}...", flush=True)
        flat = sel_jit(cams[ci])[:5]
        budget = max(budget, entry_budget_for_scene(
            flat[0], flat[1], flat[2], flat[3], flat[4], cams[ci], 3))
    print(f"render budget {budget}", flush=True)
    # bwd_entries=0: forward-only blend (no backward bookkeeping rows).
    cfg = RasterizeConfig(max_entries=budget, max_per_tile=4096,
                          bwd_entries=0)

    @jax.jit
    def frame(cam_leaves, i, limit):
        cam = jax.tree.map(lambda x: x[i], cam_leaves)
        out = render_cut(state, nodes, boxes, cam, limit, 3, bg, cfg,
                         max_cut=max_cut)
        return out["render"], out["cut"].count

    # Viewer-service fast path: the interp table is cached across frames
    # (params static between training updates; hierarchy/cut.interp_table).
    from h3dgs_tpu.hierarchy.cut import interp_table
    table = jax.jit(interp_table)(state.trainable_dict())

    @jax.jit
    def frame_tab(cam_leaves, i, limit, tab):
        cam = jax.tree.map(lambda x: x[i], cam_leaves)
        flat = select_cut_gaussians(state, nodes, boxes, cam.cam_center,
                                    limit, max_cut, table=tab)
        out = splat_cut_gaussians(*flat[:5], cam, 3, bg, cfg)
        return out["render"], flat[5].count

    @jax.jit
    def select(cam_leaves, i, limit):
        cam = jax.tree.map(lambda x: x[i], cam_leaves)
        xyz, sc, qu, op, sh_, cut = select_cut_gaussians(
            state, nodes, boxes, cam.cam_center, limit, max_cut)
        return (xyz, sc, qu, op, sh_), cut.count

    @jax.jit
    def splat(cam_leaves, i, flat):
        cam = jax.tree.map(lambda x: x[i], cam_leaves)
        out = splat_cut_gaussians(*flat, cam, 3, bg, cfg)
        return out["render"]

    for tau in (0.0, 3.0, 6.0, 15.0):
        limit = cut_lib.pixel_limit(tau, float(cams[0].tanfovx), w)
        img, count = frame(cam_stack, 0, jnp.float32(limit))
        float(jnp.sum(img))
        t0 = time.perf_counter()
        acc = []
        iters = 16
        for i in range(iters):
            img, count = frame(cam_stack, i % 16, jnp.float32(limit))
            acc.append(img)
        float(sum(jnp.sum(a) for a in acc))
        dt = (time.perf_counter() - t0) / iters

        # Fresh-cut frame with the viewer's cached interp table.
        img, _ = frame_tab(cam_stack, 0, jnp.float32(limit), table)
        float(jnp.sum(img))
        t0 = time.perf_counter()
        acc = []
        for i in range(iters):
            img, _ = frame_tab(cam_stack, i % 16, jnp.float32(limit),
                               table)
            acc.append(img)
        float(sum(jnp.sum(a) for a in acc))
        dt_t = (time.perf_counter() - t0) / iters

        # Cached-cut path (viewer/service cut reuse): splat only.
        flat, count_s = select(cam_stack, 0, jnp.float32(limit))
        float(jnp.sum(flat[0]))
        img = splat(cam_stack, 0, flat)
        float(jnp.sum(img))
        t0 = time.perf_counter()
        acc = []
        for i in range(iters):
            acc.append(splat(cam_stack, i % 16, flat))
        float(sum(jnp.sum(a) for a in acc))
        dt_s = (time.perf_counter() - t0) / iters
        # Banded latency model (VERDICT item 5): pixel-band sharding
        # splits the splat across devices (parallel/band_render.py is
        # bit-exact vs single-device under test); each band bins/blends
        # its own pixel rows, so per-device splat time ~ t_splat *
        # (band's share of entries ~ 1/n + per-band fixed overheads
        # ~15%). The cut is selected once and replicated (cached-cut
        # regime). Real 8-chip numbers need hardware this environment
        # does not have; this line records the model next to the
        # measured single-chip components it is built from.
        for n_bands in (8,):
            t_model = dt_s * (1.0 / n_bands + 0.15)
            print(f"tau={tau:5.1f}: modeled {n_bands}-band cached-cut "
                  f"{t_model * 1e3:7.2f} ms ({1.0 / t_model:5.2f} fps)"
                  f" [model, not a measurement]")
        print(f"tau={tau:5.1f}: cut={int(count):7d}  "
              f"full {dt * 1e3:7.2f} ms ({1.0 / dt:5.2f} fps)  "
              f"full+cached-table {dt_t * 1e3:7.2f} ms "
              f"({1.0 / dt_t:5.2f} fps)  "
              f"cached-cut {dt_s * 1e3:7.2f} ms ({1.0 / dt_s:5.2f} fps) "
              f"at 1080p")


if __name__ == "__main__":
    main()
