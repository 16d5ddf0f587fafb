"""Street-level tau sweep at HALF resolution (round-5, VERDICT r4 item 6).

The granularity limit is resolution-dependent —
threshold = 2*(tau+0.5)*tanfovx / (0.5*W)
(/root/reference/render_hierarchy.py:55-56) — so the same tau coarsens
twice as aggressively at half the width. On the synthetic city the
street cameras' median content distance (a ~6-unit-wide canyon) sits
below where tau in {3,6} bites at 968 px; at 484 px the default sweep
trades cut size for quality exactly like the reference's scenes. This
writes the committed half-res sweep into docs/city/metrics.json
(key "tau_metrics_halfres") next to the full-res one.

Run (after validate_city): PYTHONPATH=/root/.axon_site:.:scripts:tests \
  python scripts/eval_tau_halfres.py
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.environ.get("CITY_WORK", "/tmp/h3dgs_city")
W, H = (int(v) for v in os.environ.get("CITY_WH_HALF", "484x272").split("x"))
TAUS = (0.0, 3.0, 6.0, 15.0)


def main():
    import faulthandler
    faulthandler.enable(all_threads=True)
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    import validate_city as vc

    from h3dgs_tpu.hierarchy.cut import pixel_limit
    from h3dgs_tpu.hierarchy.io import read_hier
    from h3dgs_tpu.model.init import state_from_hierarchy
    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.train.loop import entry_budget_for_scene
    from h3dgs_tpu.train.post_step import render_cut
    from h3dgs_tpu.utils.losses import psnr, ssim

    print("backend:", jax.devices()[0].device_kind, flush=True)
    h = read_hier(os.path.join(WORK, "output/merged.hier"))
    state, _ = state_from_hierarchy(h)
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    max_cut = min(1 << int(np.ceil(np.log2(max(h.n_leaves, 2) * 1.25))),
                  h.n_nodes)
    print(f"merged: {h.n_nodes} nodes", flush=True)

    # Half-res GT renders at the street TEST views (same generator/seed
    # as validate_city; held-out every-10th street camera).
    rng = np.random.default_rng(0)
    means, scales, quats, opac, shs, _ = vc.make_city(rng)
    gt_args = tuple(jnp.asarray(a)
                    for a in (means, scales, quats, opac, shs))
    bg = jnp.zeros(3, jnp.float32)
    # Re-derive the street cameras at half resolution: street_cameras()
    # reads the module W/H globals, so patch them (same eyes/targets).
    vc.W, vc.H = W, H
    cams_all, _ = vc.street_cameras()
    test_idx = [i for i in range(0, vc.N_CAMS, 10)]
    cams = [cams_all[i] for i in test_idx]
    gt_budget = max(entry_budget_for_scene(*gt_args, c, 0) for c in cams)
    gt_cfg = RasterizeConfig(max_entries=gt_budget, max_per_tile=4096,
                             bwd_entries=0)

    @jax.jit
    def render_gt(cam):
        return jnp.clip(rasterize(*gt_args, cam, 0, bg,
                                  config=gt_cfg)["render"], 0, 1)

    gts = [np.asarray(render_gt(c)) for c in cams]
    print(f"{len(cams)} half-res street test views rendered", flush=True)

    r_cfg = RasterizeConfig(max_entries=gt_budget, max_per_tile=4096,
                            bwd_entries=0)

    @jax.jit
    def run(cam, limit):
        out = render_cut(state, nodes, boxes, cam, limit, 3, bg, r_cfg,
                         max_cut)
        return jnp.clip(out["render"], 0, 1), out["cut"].count

    sweep = {}
    for tau in TAUS:
        cuts, ps, ss = [], [], []
        for ci, cam in enumerate(cams):
            limit = pixel_limit(tau, float(cam.tanfovx), W)
            img, cut_n = run(cam, jnp.asarray(limit, jnp.float32))
            cuts.append(int(cut_n))
            ps.append(float(psnr(img, jnp.asarray(gts[ci]))))
            ss.append(float(ssim(img, jnp.asarray(gts[ci]))))
        sweep[str(tau)] = {
            "psnr": float(np.mean(ps)), "ssim": float(np.mean(ss)),
            "n_views": len(cams), "cut_mean": float(np.mean(cuts)),
            "cut_min": int(np.min(cuts)), "cut_max": int(np.max(cuts))}
        print(f"tau={tau}: cut_mean={np.mean(cuts):.0f} "
              f"psnr={np.mean(ps):.2f} ssim={np.mean(ss):.3f}",
              flush=True)

    mpath = os.path.join(REPO, "docs", "city", "metrics.json")
    m = json.load(open(mpath))
    m["tau_metrics_halfres"] = {"wh": [W, H], "sweep": sweep}
    with open(mpath, "w") as f:
        json.dump(m, f, indent=2)
    print(f"-> {mpath} (tau_metrics_halfres)", flush=True)


if __name__ == "__main__":
    main()
