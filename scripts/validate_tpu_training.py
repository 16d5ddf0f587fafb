"""On-hardware training validation: the synthetic end-to-end fit on TPU.

The CPU test suite runs the same fit in interpret mode; this script runs
it against the compiled Pallas path on the real chip — the configuration
where bf16-matmul and kernel-lowering bugs have historically hidden
(training silently stalling while parity tests pass).

Run: /opt/venv/bin/python scripts/validate_tpu_training.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo/tests")
    from test_train_synthetic import _cameras, _gt_scene

    from h3dgs_tpu.config import OptimizationConfig
    from h3dgs_tpu.model import state as S
    from h3dgs_tpu.ops import adam as A
    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.train import step as step_lib
    from h3dgs_tpu.utils.losses import psnr
    from h3dgs_tpu.utils.sh import rgb_to_sh

    print("backend:", jax.devices()[0].device_kind, flush=True)
    raster = RasterizeConfig(max_entries=1 << 15, max_per_tile=256)

    gt = _gt_scene()
    cams = _cameras(width=128, height=128)
    bg = jnp.zeros(3, jnp.float32)
    targets = [rasterize(*gt, cam, 0, bg, config=raster)["render"]
               for cam in cams]

    rng = np.random.default_rng(0)
    means0 = gt[0] + rng.normal(0, 0.05, gt[0].shape).astype(np.float32)
    n = means0.shape[0]
    st = S.from_arrays(
        xyz=means0,
        features_dc=rgb_to_sh(np.full((n, 1, 3), 0.5, np.float32)),
        features_rest=np.zeros((n, 15, 3), np.float32),
        opacity=np.full((n, 1), 0.0, np.float32),
        scaling=np.full((n, 3), np.log(0.15), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=256, max_sh_degree=0)

    iters = 600
    opt_cfg = OptimizationConfig(
        iterations=iters, position_lr_init=0.002, position_lr_final=0.0002,
        position_lr_max_steps=iters, densify_grad_threshold=1e9)
    train_step = step_lib.make_train_step(
        opt_cfg, raster, use_depth_loss=False, use_exposure=True,
        skybox_locked=False, skip_shrink=True)

    opt = A.init(st.trainable_dict())
    exposure = jnp.tile(jnp.eye(3, 4)[None], (len(cams), 1, 1))
    exp_opt = A.init({"exposure": exposure})
    h, w = cams[0].height, cams[0].width
    ones = jnp.ones((1, h, w), jnp.float32)
    zeros = jnp.zeros((1, h, w), jnp.float32)

    def batch_for(i):
        return step_lib.ViewBatch(
            camera=cams[i], gt_image=targets[i], alpha_mask=ones,
            invdepth=zeros, depth_mask=zeros,
            depth_reliable=jnp.asarray(False),
            image_idx=jnp.asarray(i, jnp.int32))

    def eval_psnr(st):
        vals = []
        for i, cam in enumerate(cams):
            out = rasterize(st.xyz, st.get_scaling(), st.get_rotation(),
                            st.get_opacity()[:, 0], st.get_features(0),
                            cam, 0, bg, config=raster)
            vals.append(float(psnr(out["render"], targets[i])))
        return float(np.mean(vals))

    psnr0 = eval_psnr(st)
    print(f"initial PSNR: {psnr0:.2f} dB", flush=True)
    t0 = time.perf_counter()
    for it in range(1, iters + 1):
        out = train_step(st, opt, exposure, exp_opt,
                         batch_for(it % len(cams)),
                         jnp.asarray(it, jnp.float32), bg,
                         jnp.asarray(1.0), jnp.asarray(4.0), 0)
        st, opt, exposure, exp_opt = (out.state, out.opt, out.exposure,
                                      out.exposure_opt)
        if it in (1, iters // 4, iters // 2, iters):
            print(f"[{it}] photo={float(out.photo_loss):.5f} "
                  f"psnr={eval_psnr(st):.2f} dB "
                  f"({(time.perf_counter() - t0):.0f}s)", flush=True)
    psnr1 = eval_psnr(st)
    ok = psnr1 > psnr0 + 6.0 and psnr1 > 24.0
    print(f"TPU training validation: {psnr0:.2f} -> {psnr1:.2f} dB "
          f"({'OK' if ok else 'FAILED'})")

    # --- densification on-chip: clone/split/prune + opacity reset keep
    # the compiled loop healthy (atomic-split + dead-row-cull paths) ---
    from h3dgs_tpu.train.step import densify_step, reset_opacity_step

    opt_cfg2 = OptimizationConfig(
        iterations=200, densify_grad_threshold=1e-7)
    step2 = step_lib.make_train_step(
        opt_cfg2, raster, use_depth_loss=False, use_exposure=False,
        skybox_locked=False, skip_shrink=True)
    rng2 = np.random.default_rng(1)
    n0 = 24
    idx = rng2.choice(gt[0].shape[0], n0, replace=False)
    st2 = S.from_arrays(
        xyz=gt[0][idx] + rng2.normal(0, 0.08, (n0, 3)).astype(np.float32),
        features_dc=rgb_to_sh(np.full((n0, 1, 3), 0.5, np.float32)),
        features_rest=np.zeros((n0, 15, 3), np.float32),
        opacity=np.full((n0, 1), 0.5, np.float32),
        scaling=np.full((n0, 3), np.log(0.18), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n0, 1)),
        capacity=128, max_sh_degree=0)
    opt2 = A.init(st2.trainable_dict())
    exp2 = jnp.tile(jnp.eye(3, 4)[None], (len(cams), 1, 1))
    eopt2 = A.init({"exposure": exp2})
    key = jax.random.PRNGKey(7)
    n_start = int(st2.n_alive)
    for it in range(1, 201):
        out2 = step2(st2, opt2, exp2, eopt2, batch_for(it % len(cams)),
                     jnp.asarray(it, jnp.float32), bg,
                     jnp.asarray(1.0), jnp.asarray(4.0), 0)
        st2, opt2 = out2.state, out2.opt
        exp2, eopt2 = out2.exposure, out2.exposure_opt
        if it % 60 == 0:
            key, k = jax.random.split(key)
            st2, opt2, stats = densify_step(st2, opt2, k, 1e-7, 0.005,
                                            jnp.asarray(4.0), 0.01)
        if it == 120:
            st2, opt2 = reset_opacity_step(st2, opt2)
    n_end = int(st2.n_alive)
    dens_ok = n_end > n_start and np.isfinite(float(out2.photo_loss))
    print(f"TPU densify validation: alive {n_start} -> {n_end}, "
          f"loss={float(out2.photo_loss):.5f} "
          f"({'OK' if dens_ok else 'FAILED'})")
    return 0 if (ok and dens_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
