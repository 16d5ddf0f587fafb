"""End-to-end slice: fit a synthetic scene with the full training step.

CPU-runnable miniature of the reference's per-chunk training
(BASELINE.json config 1): render target views from a ground-truth Gaussian
scene, initialize a model from a noisy point cloud, run the jitted train
step (sparse Adam, exposure, shrink) plus densify/reset on their intervals,
and require a large PSNR improvement.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.config import OptimizationConfig
from h3dgs_tpu.model import state as S
from h3dgs_tpu.ops import adam as A
from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
from h3dgs_tpu.scene.camera import look_at_camera
from h3dgs_tpu.train import step as step_lib
from h3dgs_tpu.utils.losses import psnr
from h3dgs_tpu.utils.sh import rgb_to_sh

RASTER = RasterizeConfig(max_entries=1 << 15, max_per_tile=256, chunk=16)


def _gt_scene(n=48, seed=3):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.08), np.log(0.25),
                                (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.6, 0.95, (n,)).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    shs = np.zeros((n, 1, 3), np.float32)
    shs[:, 0] = rgb_to_sh(colors)
    return means, scales, quats, opac, shs


def _cameras(n_views=6, width=64, height=64):
    cams = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = (3.5 * np.sin(ang), -0.5, -3.5 * np.cos(ang))
        cams.append(look_at_camera(eye=eye, target=(0, 0, 0), fovx=1.1,
                                   width=width, height=height))
    return cams


@pytest.mark.slow
def test_training_improves_psnr():
    gt = _gt_scene()
    cams = _cameras()
    bg = jnp.zeros(3, jnp.float32)

    targets = [rasterize(*gt, cam, 0, bg, config=RASTER)["render"]
               for cam in cams]

    # Init: ground-truth positions jittered, grey, small, transparent-ish.
    rng = np.random.default_rng(0)
    means0 = gt[0] + rng.normal(0, 0.05, gt[0].shape).astype(np.float32)
    n = means0.shape[0]
    st = S.from_arrays(
        xyz=means0,
        features_dc=rgb_to_sh(np.full((n, 1, 3), 0.5, np.float32)),
        features_rest=np.zeros((n, 15, 3), np.float32),
        opacity=np.full((n, 1), 0.0, np.float32),  # sigmoid -> 0.5
        scaling=np.full((n, 3), np.log(0.15), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=256, max_sh_degree=0)

    opt_cfg = OptimizationConfig(
        iterations=400, position_lr_init=0.002, position_lr_final=0.0002,
        position_lr_max_steps=400, densify_grad_threshold=1e9)
    train_step = step_lib.make_train_step(
        opt_cfg, RASTER, use_depth_loss=False, use_exposure=True,
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
                            cam, 0, bg, config=RASTER)
            vals.append(float(psnr(out["render"], targets[i])))
        return float(np.mean(vals))

    psnr0 = eval_psnr(st)
    photo = None
    for it in range(1, opt_cfg.iterations + 1):
        out = train_step(st, opt, exposure, exp_opt, batch_for(it % len(cams)),
                         jnp.asarray(it, jnp.float32), bg,
                         jnp.asarray(1.0), jnp.asarray(4.0), 0)
        st, opt, exposure, exp_opt = (out.state, out.opt, out.exposure,
                                      out.exposure_opt)
        photo = float(out.photo_loss)

    psnr1 = eval_psnr(st)
    assert np.isfinite(photo)
    assert psnr1 > psnr0 + 6.0, f"PSNR {psnr0:.2f} -> {psnr1:.2f}"
    assert psnr1 > 24.0, f"final PSNR {psnr1:.2f}"


@pytest.mark.slow
def test_training_with_densification_runs():
    """Densify/prune + opacity reset integrate with the training loop."""
    gt = _gt_scene(n=24, seed=9)
    cams = _cameras(n_views=4, width=48, height=48)
    bg = jnp.zeros(3, jnp.float32)
    targets = [rasterize(*gt, cam, 0, bg, config=RASTER)["render"]
               for cam in cams]

    rng = np.random.default_rng(1)
    n0 = 12
    idx = rng.choice(24, n0, replace=False)
    st = S.from_arrays(
        xyz=gt[0][idx] + rng.normal(0, 0.1, (n0, 3)).astype(np.float32),
        features_dc=rgb_to_sh(np.full((n0, 1, 3), 0.5, np.float32)),
        features_rest=np.zeros((n0, 15, 3), np.float32),
        opacity=np.full((n0, 1), 0.5, np.float32),
        scaling=np.full((n0, 3), np.log(0.2), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n0, 1)),
        capacity=128, max_sh_degree=0)

    opt_cfg = OptimizationConfig(
        iterations=150, position_lr_init=0.002, position_lr_final=0.0002,
        position_lr_max_steps=150, densification_interval=30,
        densify_from_iter=20, densify_until_iter=140,
        densify_grad_threshold=0.0005, opacity_reset_interval=60)
    train_step = step_lib.make_train_step(
        opt_cfg, RASTER, use_depth_loss=False, use_exposure=False,
        skybox_locked=False, skip_shrink=True)

    opt = A.init(st.trainable_dict())
    exposure = jnp.tile(jnp.eye(3, 4)[None], (len(cams), 1, 1))
    exp_opt = A.init({"exposure": exposure})
    h, w = cams[0].height, cams[0].width
    ones = jnp.ones((1, h, w), jnp.float32)
    zeros = jnp.zeros((1, h, w), jnp.float32)

    key = jax.random.key(0)
    n_densify_events = 0
    for it in range(1, opt_cfg.iterations + 1):
        i = it % len(cams)
        batch = step_lib.ViewBatch(
            camera=cams[i], gt_image=targets[i], alpha_mask=ones,
            invdepth=zeros, depth_mask=zeros,
            depth_reliable=jnp.asarray(False),
            image_idx=jnp.asarray(i, jnp.int32))
        out = train_step(st, opt, exposure, exp_opt, batch,
                         jnp.asarray(it, jnp.float32), bg,
                         jnp.asarray(1.0), jnp.asarray(4.0), 0)
        st, opt, exposure, exp_opt = (out.state, out.opt, out.exposure,
                                      out.exposure_opt)
        if (opt_cfg.densify_from_iter < it < opt_cfg.densify_until_iter
                and it % opt_cfg.densification_interval == 0):
            key, sub = jax.random.split(key)
            st, opt, counts = step_lib.densify_step(
                st, opt, sub, opt_cfg.densify_grad_threshold, 0.005,
                jnp.asarray(4.0), opt_cfg.percent_dense)
            n_densify_events += 1
        if it % opt_cfg.opacity_reset_interval == 0:
            st, opt = step_lib.reset_opacity_step(st, opt)

    assert n_densify_events >= 3
    assert np.isfinite(float(out.photo_loss))
    assert int(st.n_alive) > 0
    assert bool(jnp.all(jnp.isfinite(st.xyz)))
