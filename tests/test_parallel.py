"""Multi-chip tests on an emulated 8-device CPU mesh (SURVEY.md §4, level 4).

Asserts the sharded training step (data x tile mesh) produces the same
parameters as the same step on a 1x1 mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.config import OptimizationConfig
from h3dgs_tpu.model import state as S
from h3dgs_tpu.ops import adam as A
from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
from h3dgs_tpu.parallel import sharding as shard_lib
from h3dgs_tpu.parallel.step import make_parallel_train_step
from h3dgs_tpu.scene.camera import look_at_camera
from h3dgs_tpu.train.step import ViewBatch
from h3dgs_tpu.utils.sh import rgb_to_sh

RASTER = RasterizeConfig(max_entries=1 << 14, max_per_tile=128, chunk=16)


def _setup(width=48, height=32, n=24, n_views=2):
    rng = np.random.default_rng(0)
    st = S.from_arrays(
        xyz=rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        features_dc=rgb_to_sh(rng.uniform(0.2, 0.8, (n, 1, 3))).astype(np.float32),
        features_rest=np.zeros((n, 15, 3), np.float32),
        opacity=np.full((n, 1), 0.5, np.float32),
        scaling=np.full((n, 3), np.log(0.15), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=64, max_sh_degree=0)
    cams = [look_at_camera(eye=(3.0 * np.sin(a), -0.4, -3.0 * np.cos(a)),
                           target=(0, 0, 0), fovx=1.1, width=width,
                           height=height)
            for a in np.linspace(0, np.pi / 2, n_views)]
    bg = jnp.zeros(3, jnp.float32)
    targets = [rasterize(st.xyz, st.get_scaling(), st.get_rotation(),
                         jnp.full((64,), 0.8), st.get_features(0), c, 0, bg,
                         config=RASTER)["render"] for c in cams]
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    ones = jnp.ones((n_views, 1, height, width))
    zeros = jnp.zeros((n_views, 1, height, width))
    batch = ViewBatch(
        camera=cam_batch, gt_image=jnp.stack(targets), alpha_mask=ones,
        invdepth=zeros, depth_mask=zeros,
        depth_reliable=jnp.zeros(n_views, bool),
        image_idx=jnp.arange(n_views, dtype=jnp.int32))
    return st, batch, bg


def _run(mesh, shard_tiles, n_steps=3):
    st, batch, bg = _setup()
    opt_cfg = OptimizationConfig(iterations=10, position_lr_init=0.001,
                                 position_lr_final=0.001)
    step = make_parallel_train_step(
        opt_cfg, RASTER, use_depth_loss=False, use_exposure=True,
        skybox_locked=False, skip_shrink=True, shard_tiles=shard_tiles)
    opt = A.init(st.trainable_dict())
    exposure = jnp.tile(jnp.eye(3, 4)[None], (2, 1, 1))
    exp_opt = A.init({"exposure": exposure})
    with jax.set_mesh(mesh):
        if shard_tiles:
            batch = jax.device_put(
                batch, shard_lib.data_sharded(mesh))
        for it in range(1, n_steps + 1):
            out = step(st, opt, exposure, exp_opt, batch,
                       jnp.asarray(it, jnp.float32), bg, jnp.asarray(1.0),
                       jnp.asarray(3.0), 0)
            st, opt, exposure, exp_opt = (out.state, out.opt, out.exposure,
                                          out.exposure_opt)
    return st, exposure, float(out.photo_loss)


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh_1 = shard_lib.make_mesh(n_data=1, n_tile=1,
                                 devices=jax.devices()[:1])
    mesh_8 = shard_lib.make_mesh(n_data=2, n_tile=4)

    st_ref, exp_ref, loss_ref = _run(mesh_1, shard_tiles=False)
    st_shd, exp_shd, loss_shd = _run(mesh_8, shard_tiles=True)

    np.testing.assert_allclose(loss_shd, loss_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_shd.xyz),
                               np.asarray(st_ref.xyz), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_shd.opacity),
                               np.asarray(st_ref.opacity), atol=1e-5)
    np.testing.assert_allclose(np.asarray(exp_shd), np.asarray(exp_ref),
                               atol=1e-6)


def test_data_sharded_batch_is_distributed():
    mesh = shard_lib.make_mesh(n_data=2, n_tile=4)
    x = jnp.ones((2, 3, 32, 48))
    xs = jax.device_put(x, shard_lib.data_sharded(mesh, x.ndim))
    assert len(xs.sharding.device_set) == 8


@pytest.mark.slow
def test_banded_render_matches_single_device():
    """Pixel-band sharded rendering == full-frame render (tile-aligned
    bands reproduce the exact per-tile entry lists)."""
    from h3dgs_tpu.parallel.band_render import render_banded
    from .utils import make_test_camera, random_scene

    means, scales, quats, opac, shs = random_scene(120, seed=7, sh_degree=1)
    cam = make_test_camera(width=64, height=64)
    bg = jnp.asarray([0.2, 0.1, 0.3], jnp.float32)
    cfg = RasterizeConfig(max_entries=1 << 12, max_per_tile=256)

    ref = rasterize(means, scales, quats, opac, shs, cam, 1, bg, config=cfg)

    mesh = shard_lib.make_mesh(n_data=1, n_tile=4)
    out = render_banded(means, scales, quats, opac, shs, cam, 1, bg,
                        mesh, shard_lib.TILE_AXIS, config=cfg)
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(ref["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["invdepth"]),
                               np.asarray(ref["invdepth"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["final_transmittance"]),
                               np.asarray(ref["final_transmittance"]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["visibility_filter"]),
                                  np.asarray(ref["visibility_filter"]))
