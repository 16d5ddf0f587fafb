"""Multi-view convergence guard on a surface scene.

Regression test for the class of bug that silently stalls training while
every kernel-level parity test passes (e.g., reduced-precision SSIM
convolutions produced garbage gradients on dark images on TPU — fixed by
pinning conv precision in utils/losses._blur). Trains a textured wavy
plane from SfM-style init with the full photometric loss and requires a
large held-out PSNR gain."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from h3dgs_tpu.config import OptimizationConfig
from h3dgs_tpu.model.init import init_from_pcd
from h3dgs_tpu.ops import adam as A
from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
from h3dgs_tpu.scene.camera import look_at_camera
from h3dgs_tpu.train.step import ViewBatch, make_train_step
from h3dgs_tpu.utils.losses import psnr, ssim

CFG = RasterizeConfig(max_entries=1 << 16, max_per_tile=1024, chunk=16)


def _surface_scene(g=40):
    xs, ys = np.meshgrid(np.linspace(-4, 4, g), np.linspace(-4, 4, g))
    zs = 0.4 * np.sin(xs * 1.5) * np.cos(ys * 1.2)
    means = np.stack([xs, zs, ys], -1).reshape(-1, 3).astype(np.float32)
    n = means.shape[0]
    spacing = 8.0 / g
    scales = np.tile(np.asarray([spacing, spacing * 0.3, spacing],
                                np.float32) * 1.2, (n, 1))
    quats = np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1))
    opac = np.full(n, 0.95, np.float32)
    tex = (np.sin(xs * 3) * np.sin(ys * 3) > 0).astype(np.float32).reshape(-1)
    rgb = np.stack([0.2 + 0.6 * tex, 0.3 + 0.4 * (xs.reshape(-1) + 4) / 8,
                    0.6 - 0.4 * tex], -1).astype(np.float32)
    from h3dgs_tpu.utils.sh import rgb_to_sh
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rgb)
    return means, scales, quats, opac, shs, rgb


def test_ssim_gradient_finite_difference_dark_images():
    """SSIM grads must be exact even on dark/low-variance images (where
    reduced-precision conv noise destroys the variance terms)."""
    rng = np.random.default_rng(0)
    H, W = 96, 128
    gt = np.zeros((3, H, W), np.float32)
    y, x = np.ogrid[:H, :W]
    for _ in range(12):
        cy, cx = rng.integers(20, H - 20), rng.integers(20, W - 20)
        gt += rng.random(3)[:, None, None] * np.exp(
            -(((y - cy) / 6.0) ** 2 + ((x - cx) / 6.0) ** 2))[None]
    gt = jnp.asarray(np.clip(gt, 0, 1))
    pred = gt * 0.05  # the dark-render regime that broke
    d = jnp.asarray(rng.normal(size=gt.shape).astype(np.float32))
    f = jax.jit(lambda p: ssim(p, gt))
    g = jax.jit(jax.grad(lambda p: ssim(p, gt)))(pred)
    eps = 1e-3
    fd = (float(f(pred + eps * d)) - float(f(pred - eps * d))) / (2 * eps)
    an = float(jnp.sum(g * d))
    np.testing.assert_allclose(an, fd, rtol=0.05)
    assert float(jnp.linalg.norm(g)) < 10.0  # the bug gave norms ~1e2-1e4


@pytest.mark.slow
def test_multiview_training_converges():
    means, scales, quats, opac, shs, rgb = _surface_scene()
    n = means.shape[0]
    W, H = 160, 120
    cams = [look_at_camera(
        eye=(3.5 * np.sin(2 * np.pi * i / 9), -5.0,
             -3.5 * np.cos(2 * np.pi * i / 9)),
        target=(np.sin(4 * np.pi * i / 9), 0.0, np.cos(4 * np.pi * i / 9)),
        fovx=1.1, width=W, height=H) for i in range(9)]
    test_cam, train_cams = cams[-1], cams[:-1]
    bg = jnp.zeros(3, jnp.float32)
    gts = [rasterize(means, scales, quats, opac, shs, c, 0, bg,
                     config=CFG)["render"] for c in cams]

    state = init_from_pcd(means, rgb, capacity=n, capacity_factor=1.0)
    opt_cfg = OptimizationConfig(iterations=2000,
                                 position_lr_max_steps=2000)
    step = make_train_step(opt_cfg, CFG, use_depth_loss=False,
                           use_exposure=False, skybox_locked=False)
    opt = A.init(state.trainable_dict())
    exposure = jnp.tile(jnp.eye(3, 4)[None], (8, 1, 1))
    exp_opt = A.init({"exposure": exposure})

    def test_psnr(st):
        out = rasterize(st.xyz, st.get_scaling(), st.get_rotation(),
                        st.get_opacity()[:, 0], st.get_features(0),
                        test_cam, 0, bg, config=CFG)
        return float(psnr(jnp.clip(out["render"], 0, 1), gts[-1]))

    before = test_psnr(state)
    for it in range(1, 301):
        b = ViewBatch(camera=train_cams[it % 8], gt_image=gts[it % 8],
                      alpha_mask=jnp.ones((1, H, W)),
                      invdepth=jnp.zeros((1, H, W)),
                      depth_mask=jnp.zeros((1, H, W)),
                      depth_reliable=jnp.asarray(False),
                      image_idx=jnp.asarray(it % 8, jnp.int32))
        out = step(state, opt, exposure, exp_opt, b,
                   jnp.asarray(float(it)), bg, jnp.asarray(8.0),
                   jnp.asarray(8.0), 0)
        state, opt = out.state, out.opt
        exposure, exp_opt = out.exposure, out.exposure_opt
    after = test_psnr(state)
    assert after > before + 8.0, \
        f"multi-view training stalled: {before:.2f} -> {after:.2f} dB"
