"""Extended LOD curve on the TRAINED merged city hierarchy: higher and
more distant aerial cameras + taus up to 60, against freshly rendered GT
(make_city is deterministic, seed 0). Demonstrates the >=5x granularity-
bounded compression regime without retraining (validate_city's test
split only reached 36 m of altitude).

Writes docs/city/lod_curve_extended.json + an extended strip.

Run (after validate_city left /tmp/h3dgs_city):
  PYTHONPATH=/root/.axon_site:.:scripts:tests python scripts/eval_lod_extra.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.environ.get("CITY_WORK", "/tmp/h3dgs_city")
W, H = (int(v) for v in os.environ.get("CITY_WH", "968x544").split("x"))
TAUS = (0.0, 3.0, 6.0, 15.0, 18.0, 21.0, 24.0, 40.0, 60.0)


def main():
    # Round-4 postmortem: two runs died silently right after the "merged:"
    # print (3-line logs, no traceback). Instrument hard: faulthandler for
    # native crashes, a watchdog dump, and per-stage progress prints so a
    # kill is at least attributable to a stage.
    import faulthandler
    import signal
    faulthandler.enable(all_threads=True)
    if hasattr(faulthandler, "register") and hasattr(signal, "SIGUSR1"):
        faulthandler.register(signal.SIGUSR1, all_threads=True)

    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp
    from PIL import Image

    import validate_city as vc

    from h3dgs_tpu.hierarchy.cut import pixel_limit
    from h3dgs_tpu.hierarchy.io import read_hier
    from h3dgs_tpu.model.init import state_from_hierarchy
    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.train.loop import entry_budget_for_scene
    from h3dgs_tpu.train.post_step import render_cut
    from h3dgs_tpu.utils.losses import psnr

    print("backend:", jax.devices()[0].device_kind, flush=True)
    merged = os.path.join(WORK, "output/merged.hier")
    h = read_hier(merged)
    state, _ = state_from_hierarchy(h)
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    max_cut = min(1 << int(np.ceil(np.log2(max(h.n_leaves, 2) * 1.25))),
                  h.n_nodes)
    print(f"merged: {h.n_nodes} nodes, {h.n_leaves} leaves", flush=True)

    # GT splats (deterministic) for reference renders at the new views.
    rng = np.random.default_rng(0)
    means, scales, quats, opac, shs, _ = vc.make_city(rng)
    gt_args = tuple(jnp.asarray(a)
                    for a in (means, scales, quats, opac, shs))
    bg = jnp.zeros(3, jnp.float32)

    # High/distant aerial views: heights 40-150 (the coarsening regime
    # the reference's tau sweep exists for).
    cams = []
    for i, hgt in enumerate((40.0, 60.0, 90.0, 150.0)):
        cams.append(look_at_camera(
            eye=(2.0 * np.sin(i), -hgt, 3.0 * np.cos(i)),
            target=(0.0, -1.0, 0.0), fovx=1.2, width=W, height=H))

    budgets = []
    for i, c in enumerate(cams):
        b = entry_budget_for_scene(*gt_args, c, 0)
        print(f"budget cam{i}: {b}", flush=True)
        budgets.append(b)
    gt_budget = max(budgets)
    print(f"gt_budget={gt_budget}", flush=True)
    gt_cfg = RasterizeConfig(max_entries=gt_budget, max_per_tile=4096,
                             bwd_entries=0)

    @jax.jit
    def render_gt(cam):
        return jnp.clip(rasterize(*gt_args, cam, 0, bg,
                                  config=gt_cfg)["render"], 0, 1)

    gts = []
    for i, c in enumerate(cams):
        t0 = time.time()
        gts.append(np.asarray(render_gt(c)))
        print(f"gt cam{i} rendered in {time.time() - t0:.1f}s", flush=True)

    r_cfg = RasterizeConfig(max_entries=gt_budget, max_per_tile=4096,
                            bwd_entries=0)

    @jax.jit
    def run(cam, limit):
        out = render_cut(state, nodes, boxes, cam, limit, 3, bg, r_cfg,
                         max_cut)
        return jnp.clip(out["render"], 0, 1), out["cut"].count

    curve = []
    tau0 = {}
    strip = []
    for tau in TAUS:
        cuts, p_gt, p_t0 = [], [], []
        for ci, cam in enumerate(cams):
            limit = pixel_limit(tau, float(cam.tanfovx), W)
            t0 = time.time()
            img, cut_n = run(cam, jnp.asarray(limit, jnp.float32))
            jax.block_until_ready(img)
            print(f"  tau={tau} cam{ci}: {time.time() - t0:.1f}s",
                  flush=True)
            img = np.asarray(img)
            cuts.append(int(cut_n))
            p_gt.append(float(psnr(jnp.asarray(img),
                                   jnp.asarray(gts[ci]))))
            if tau == 0.0:
                tau0[ci] = img
            else:
                p_t0.append(float(psnr(jnp.asarray(img),
                                       jnp.asarray(tau0[ci]))))
            if ci == 1 and tau in (0.0, 15.0, 40.0, 60.0):
                strip.append(img)
        row = {"tau": tau, "cut_mean": float(np.mean(cuts)),
               "cut_min": int(np.min(cuts)), "cut_max": int(np.max(cuts)),
               "cuts": cuts,
               "psnr_vs_gt": float(np.mean(p_gt)),
               "psnr_vs_tau0": (float(np.mean(p_t0)) if p_t0 else None)}
        if curve:
            row["compression_vs_tau0"] = round(
                curve[0]["cut_mean"] / max(row["cut_mean"], 1.0), 2)
        curve.append(row)
        print(f"tau={tau}: cuts={cuts} psnr_gt={row['psnr_vs_gt']:.2f} "
              f"psnr_tau0={row['psnr_vs_tau0']} "
              f"x{row.get('compression_vs_tau0')}", flush=True)

    out_doc = os.path.join(REPO, "docs", "city")
    os.makedirs(out_doc, exist_ok=True)
    result = {"n_nodes": int(h.n_nodes), "n_leaves": int(h.n_leaves),
              "cameras": "aerial 40/60/90/150 m", "wh": [W, H],
              "iters_per_phase": int(os.environ.get("CITY_ITERS", 3000)),
              "taus": list(TAUS), "curve": curve}
    with open(os.path.join(out_doc, "lod_curve_extended.json"), "w") as f:
        json.dump(result, f, indent=2)
    if strip:
        strip_img = (np.concatenate(strip, axis=2).transpose(1, 2, 0)
                     * 255).astype(np.uint8)
        Image.fromarray(strip_img).save(
            os.path.join(out_doc, "lod_strip_extended_tau_0_15_40_60.png"))
    print(f"-> {out_doc}/lod_curve_extended.json", flush=True)


if __name__ == "__main__":
    main()
