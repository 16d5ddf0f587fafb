"""End-to-end demo: synthetic scene -> train -> hierarchy -> post-opt ->
merge -> tau-sweep eval + orbit renders, with visible artifacts.

Writes docs/demo/: ground truth vs tau-sweep renders (PNG), an orbit
strip from the interactive renderer, and metrics.json (per-tau
PSNR/SSIM). The same flow as the reference's README walkthrough
(/root/reference/README.md:92-220), shrunk to a synthetic scene that
runs in minutes on CPU and on the TPU alike.

Run: /opt/venv/bin/python scripts/make_demo.py [out_dir]
Env: DEMO_PLATFORM=cpu to force CPU (the axon plugin otherwise dials
the TPU tunnel, which hangs when it is down).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main(out_dir: str = ""):
    import jax
    if os.environ.get("DEMO_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["DEMO_PLATFORM"])

    from synthetic_scene import (make_gaussian_scene, ring_cameras,
                                 write_colmap_scene)

    from h3dgs_tpu.cli.hierarchy_creator import create_hierarchy
    from h3dgs_tpu.cli.render_hierarchy import render_set
    from h3dgs_tpu.config import (FullConfig, ModelConfig,
                                  OptimizationConfig, RuntimeConfig)
    from h3dgs_tpu.io.meta import write_vec
    from h3dgs_tpu.scene.scene import Scene
    from h3dgs_tpu.train.loop import train_flat, train_post

    out_dir = out_dir or os.path.join(REPO, "docs", "demo")
    os.makedirs(out_dir, exist_ok=True)
    work = tempfile.mkdtemp(prefix="h3dgs_demo_")
    runtime = RuntimeConfig(max_entries=1 << 16, max_per_tile=512,
                            blend_chunk=16, capacity_factor=4.0)

    print("[1/6] synthetic COLMAP scene", flush=True)
    scene_arrays = make_gaussian_scene(n=220, seed=3, spread=1.2)
    cams = ring_cameras(n_cams=12, dist=4.0, width=192, height=144)
    write_colmap_scene(work, *scene_arrays, cams, test_every=6)

    print("[2/6] flat training", flush=True)
    model_dir = os.path.join(work, "out")
    cfg = FullConfig(
        model=ModelConfig(source_path=work, model_path=model_dir,
                          resolution=1),
        opt=OptimizationConfig(
            iterations=400, densify_from_iter=100,
            densification_interval=150, opacity_reset_interval=100000,
            densify_until_iter=300, position_lr_max_steps=400),
        runtime=runtime)
    scene = Scene(cfg.model, cfg.runtime)
    losses = []
    train_flat(cfg, scene, coarse=False,
               progress_cb=lambda it, log: losses.append(log.ema_photo))
    print(f"    final EMA photometric loss: {losses[-1]:.4f}", flush=True)

    print("[3/6] hierarchy creation", flush=True)
    chunk_dir = os.path.join(work, "chunk")
    os.makedirs(chunk_dir, exist_ok=True)
    write_vec(os.path.join(chunk_dir, "center.txt"), [0, 0, 0])
    write_vec(os.path.join(chunk_dir, "extent.txt"), [100, 100, 100])
    pc = os.path.join(model_dir, "point_cloud/iteration_400",
                      "point_cloud.ply")
    hier_path = create_hierarchy(pc, chunk_dir, model_dir)

    print("[4/6] post-optimization", flush=True)
    cfg_post = FullConfig(
        model=ModelConfig(source_path=work, model_path=model_dir,
                          hierarchy=hier_path, resolution=1),
        opt=OptimizationConfig(iterations=120, position_lr_max_steps=120),
        runtime=runtime)
    scene_post = Scene(cfg_post.model, cfg_post.runtime,
                       create_from_hier=True)
    train_post(cfg_post, scene_post)
    opt_path = hier_path + "_opt"

    print("[5/6] tau-sweep eval renders", flush=True)
    cfg_eval = FullConfig(
        model=ModelConfig(source_path=work, model_path=model_dir,
                          hierarchy=opt_path, resolution=1, eval=True),
        runtime=runtime)
    scene_eval = Scene(cfg_eval.model, cfg_eval.runtime,
                       create_from_hier=True)
    taus = [0.0, 3.0, 6.0, 15.0]
    renders_dir = os.path.join(work, "renders")
    results = render_set(scene_eval, cfg_eval, taus, renders_dir,
                         save_images=True)   # dict keyed by tau
    metrics = {f"tau_{t:g}": {"psnr": results[t]["psnr"],
                              "ssim": results[t]["ssim"]}
               for t in taus}
    metrics["train_final_ema_photo"] = float(losses[-1])
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print("    " + json.dumps(metrics), flush=True)

    # Copy one test view: GT + each tau render.
    src_imgs = sorted(os.listdir(os.path.join(work, "images")))
    for t in taus:
        tdir = os.path.join(renders_dir, f"tau_{t}")
        if os.path.isdir(tdir):
            first = sorted(os.listdir(tdir))[0]
            shutil.copyfile(os.path.join(tdir, first),
                            os.path.join(out_dir, f"render_tau{t:g}.png"))
    gt_name = src_imgs[0]
    shutil.copyfile(os.path.join(work, "images", gt_name),
                    os.path.join(out_dir, "ground_truth.png"))

    print("[6/6] interactive-renderer orbit", flush=True)
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.viewer.service import HierarchyRenderer, orbit
    r = HierarchyRenderer(opt_path, budget=1 << 18, sh_degree=3,
                          raster_cfg=RasterizeConfig(
                              max_entries=1 << 16, max_per_tile=512,
                              bwd_entries=0))
    orbit(r, os.path.join(out_dir, "orbit"), n_frames=4, radius=4.0,
          height=-0.8, tau=3.0, width=192, height_px=144)
    print(f"demo artifacts in {out_dir}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "")
