"""Realistic-scale on-chip training validation (VERDICT r1 item 4).

Everything in round 1 was validated at toy scale (<=256 splats on-chip).
This script runs the real regime on the TPU: a ~150k-Gaussian synthetic
surface rendered at 512x910, training initialized from a noisy 100k
subsample with capacity for millions, densification growth, the adaptive
entry-budget ladder, and >=5k iterations. Records it/s, loss, PSNR,
capacity/budget growth to VALIDATION_SCALE.json.

GT images stay device-resident (the ~28 MB/s tunnel would otherwise
dominate; the host->device loader path is validated separately by the
suite). Run: /opt/venv/bin/python scripts/validate_tpu_scale.py [iters]
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(iters: int = 5000):
    import os

    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    if os.environ.get("VAL_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["VAL_PLATFORM"])
    import jax.numpy as jnp

    from h3dgs_tpu.config import OptimizationConfig
    from h3dgs_tpu.model import state as S
    from h3dgs_tpu.ops import adam as A
    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.train.loop import _entry_bucket
    from h3dgs_tpu.train.step import ViewBatch, densify_step, make_train_step
    from h3dgs_tpu.utils.losses import psnr
    from h3dgs_tpu.utils.sh import rgb_to_sh

    dev = jax.devices()[0]
    print("backend:", dev.device_kind, flush=True)

    # --- GT scene: wavy surface, ~150k leaves (bench_render's regime) ---
    rng = np.random.default_rng(0)
    # Smoke-size overrides (VAL_*) let a CPU run shake out script bugs
    # before spending chip time; defaults are the real validation regime.
    n_gt = int(os.environ.get("VAL_N_GT", 150_000))
    uv = rng.uniform(-3, 3, (n_gt, 2)).astype(np.float32)
    zs = (0.4 * np.sin(uv[:, 0] * 2.1) * np.cos(uv[:, 1] * 1.7)
          + 0.02 * rng.normal(size=n_gt)).astype(np.float32)
    xyz = np.stack([uv[:, 0], zs, uv[:, 1]], axis=1)
    rgbs = (0.5 + 0.4 * np.stack([np.sin(uv[:, 0]), np.cos(uv[:, 1]),
                                  np.sin(uv.sum(1))], 1)).astype(np.float32)
    gt_sh = rgb_to_sh(np.clip(rgbs, 0.05, 0.95))[:, None, :]
    gt_opac = rng.uniform(0.5, 0.95, n_gt).astype(np.float32)
    gt_scale = np.exp(rng.uniform(np.log(0.02), np.log(0.045),
                                  (n_gt, 3))).astype(np.float32)
    gt_quat = rng.normal(size=(n_gt, 4)).astype(np.float32)
    gt_quat /= np.linalg.norm(gt_quat, axis=1, keepdims=True)

    w = int(os.environ.get("VAL_WIDTH", 910))
    h = int(os.environ.get("VAL_HEIGHT", 512))
    n_views, n_test = int(os.environ.get("VAL_VIEWS", 36)), 4
    cams = [look_at_camera(eye=(5.5 * np.sin(a), -2.0, -5.5 * np.cos(a)),
                           target=(0, 0, 0), fovx=1.2, width=w, height=h)
            for a in np.linspace(0, 2 * np.pi, n_views, endpoint=False)]
    bg = jnp.zeros(3, jnp.float32)
    gt_budget = min(1 << 21, max(1 << 13, n_gt * 16))
    gt_cfg = RasterizeConfig(max_entries=gt_budget, max_per_tile=4096)

    print("rendering GT views...", flush=True)
    t0 = time.time()
    # One jitted render reused across the orbit (Camera is a pytree with
    # static width/height, so a single compile serves every view) — the
    # eager per-view dispatch this replaces took 370 s over the tunnel
    # (VERDICT r2 weak-7).
    gt_args = (jnp.asarray(xyz), jnp.asarray(gt_scale),
               jnp.asarray(gt_quat), jnp.asarray(gt_opac),
               jnp.asarray(gt_sh))

    @jax.jit
    def render_gt(cam):
        img = rasterize(*gt_args, cam, 0, bg, config=gt_cfg)["render"]
        return jnp.clip(img, 0.0, 1.0)

    targets = [render_gt(cam) for cam in cams]
    jax.block_until_ready(targets[-1])
    print(f"GT render: {time.time() - t0:.1f}s", flush=True)

    # --- init: noisy 100k subsample, SfM-like ---
    n_init = min(int(os.environ.get("VAL_N_INIT", 100_000)), n_gt)
    sel = rng.choice(n_gt, n_init, replace=False)
    means0 = xyz[sel] + rng.normal(0, 0.02, (len(sel), 3)).astype(np.float32)
    n0 = len(sel)
    capacity = int(os.environ.get("VAL_CAPACITY", 1 << 20))
    st = S.from_arrays(
        xyz=means0,
        features_dc=rgb_to_sh(np.full((n0, 1, 3), 0.5, np.float32)),
        features_rest=np.zeros((n0, 15, 3), np.float32),
        opacity=np.full((n0, 1), 0.0, np.float32),      # sigmoid -> 0.5
        scaling=np.full((n0, 3), np.log(0.03), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n0, 1)),
        capacity=capacity, max_sh_degree=0)
    print(f"init: {n0} points, capacity {capacity}", flush=True)

    opt_cfg = OptimizationConfig(
        iterations=iters, position_lr_max_steps=iters,
        densify_from_iter=int(os.environ.get("VAL_DENSIFY_FROM", 500)),
        densify_until_iter=int(iters * 0.8),
        densification_interval=int(os.environ.get("VAL_DENSIFY_INT", 100)),
        opacity_reset_interval=10**9,
        densify_grad_threshold=2e-4)

    entry_cap = gt_budget
    r_cfg = RasterizeConfig(max_entries=max(gt_budget // 2, 1 << 13),
                            max_per_tile=4096,
                            chunk_e=512, quantum=128)

    def build(rc):
        return make_train_step(opt_cfg, rc, use_depth_loss=False,
                               use_exposure=False, skybox_locked=False,
                               skip_shrink=True)

    step = build(r_cfg)
    opt = A.init(st.trainable_dict())
    exposure = jnp.tile(jnp.eye(3, 4)[None], (n_views, 1, 1))
    exp_opt = A.init({"exposure": exposure})
    extent = jnp.asarray(6.0)
    spatial = jnp.asarray(6.0)
    key = jax.random.PRNGKey(0)

    def batch_for(i):
        vi = int(order[i % len(order)])
        return ViewBatch(camera=cams[vi], gt_image=targets[vi],
                         alpha_mask=jnp.ones((1, h, w)),
                         invdepth=jnp.zeros((1, h, w)),
                         depth_mask=jnp.zeros((1, h, w)),
                         depth_reliable=jnp.asarray(False),
                         image_idx=jnp.asarray(vi, jnp.int32))

    def eval_psnr(st):
        vals = []
        for vi in range(n_views - n_test, n_views):
            img = rasterize(st.xyz, st.get_scaling(), st.get_rotation(),
                            st.get_opacity()[:, 0], st.get_features(0),
                            cams[vi], 0, bg, config=r_cfg)["render"]
            vals.append(float(psnr(jnp.clip(img, 0, 1), targets[vi])))
        return float(np.mean(vals))

    order = np.arange(n_views - n_test)   # train views only
    rng.shuffle(order)
    log = {"iters": [], "loss": [], "it_s": [], "alive": [], "n_dup": [],
           "budget": [], "psnr": [], "capacity": []}
    psnr0 = eval_psnr(st)
    print(f"initial PSNR {psnr0:.2f} dB", flush=True)

    ndup_max = jnp.int32(0)
    losses = []
    t_win = time.time()
    for it in range(1, iters + 1):
        out = step(st, opt, exposure, exp_opt, batch_for(it),
                   jnp.asarray(float(it)), bg, spatial, extent, 0)
        st, opt = out.state, out.opt
        exposure, exp_opt = out.exposure, out.exposure_opt
        losses.append(out.photo_loss)
        ndup_max = jnp.maximum(ndup_max, out.n_duplicates)

        if (it > opt_cfg.densify_from_iter
                and it < opt_cfg.densify_until_iter
                and it % opt_cfg.densification_interval == 0):
            key, k = jax.random.split(key)
            st, opt, dstats = densify_step(
                st, opt, k, opt_cfg.densify_grad_threshold, 0.005,
                extent, opt_cfg.percent_dense)

        log_int = min(100, max(iters // 4, 1))
        if it % log_int == 0 or it == iters:
            loss = float(losses[-1])
            n_dup = int(ndup_max)
            ndup_max = jnp.int32(0)
            alive = int(st.n_alive)
            dt = time.time() - t_win
            it_s = log_int / dt if it % log_int == 0 else 0.0
            t_win = time.time()
            assert np.isfinite(loss), f"non-finite loss at {it}"
            log["iters"].append(it)
            log["loss"].append(loss)
            log["it_s"].append(round(it_s, 2))
            log["alive"].append(alive)
            log["n_dup"].append(n_dup)
            log["budget"].append(r_cfg.max_entries)
            log["capacity"].append(st.capacity)
            pe = ""
            if it % max(min(1000, iters), 1) == 0 or it == iters:
                p = eval_psnr(st)
                log["psnr"].append({"iter": it, "psnr": round(p, 2)})
                pe = f" PSNR {p:.2f}"
            print(f"[{it}/{iters}] loss={loss:.4f} alive={alive} "
                  f"dup={n_dup} budget={r_cfg.max_entries} "
                  f"it/s={it_s:.2f}{pe}", flush=True)
            want = _entry_bucket(n_dup, 1 << 18, entry_cap)
            if want > r_cfg.max_entries:
                r_cfg = r_cfg._replace(max_entries=want)
                step = build(r_cfg)
                print(f"  entry budget -> {want}", flush=True)

    # Environment-independent step-time A/B (VERDICT r3 weak-8): the
    # loop's it/s is per-dispatch-latency-bound on the tunnel and varies
    # by session; this times the SAME jitted step at the final shapes,
    # dispatched back-to-back with ONE scalar sync — comparable
    # round-over-round.
    n_ab = 10
    probe = step(st, opt, exposure, exp_opt, batch_for(0),
                 jnp.asarray(float(iters + 1)), bg, spatial, extent, 0)
    float(probe.photo_loss)
    st_t, opt_t = probe.state, probe.opt
    exp_t, eo_t = probe.exposure, probe.exposure_opt
    t0 = time.time()
    for i in range(n_ab):
        out = step(st_t, opt_t, exp_t, eo_t, batch_for(i),
                   jnp.asarray(float(iters + 2 + i)), bg, spatial,
                   extent, 0)
        st_t, opt_t = out.state, out.opt
        exp_t, eo_t = out.exposure, out.exposure_opt
    float(out.photo_loss)
    step_ms = (time.time() - t0) / n_ab * 1e3
    print(f"A/B step time at final shapes: {step_ms:.2f} ms", flush=True)

    final_psnr = log["psnr"][-1]["psnr"]
    result = {
        "ab_step_ms": round(step_ms, 2),
        "device": str(dev.device_kind),
        "resolution": [h, w],
        "n_init": n0, "capacity": capacity,
        "iterations": iters,
        "initial_psnr": round(psnr0, 2),
        "final_psnr": final_psnr,
        "final_alive": log["alive"][-1],
        "peak_budget": max(log["budget"]),
        "median_it_s": float(np.median([x for x in log["it_s"] if x > 0])),
        "log": log,
    }
    out_path = os.environ.get("VAL_OUT",
                              "/root/repo/VALIDATION_SCALE.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "log"}))
    # The +3 dB bar is calibrated for the real >=1000-iter run; short
    # smoke runs (VAL_* overrides) only check the mechanics + direction.
    want = 3.0 if iters >= 1000 else 0.0
    assert final_psnr > psnr0 + want, "training did not improve PSNR"
    print(f"OK -> {out_path}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
