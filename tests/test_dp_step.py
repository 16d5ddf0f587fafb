"""shard_map data-parallel step (Pallas-compatible multi-chip path) vs the
vmapped SPMD step: identical updates on an 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.config import OptimizationConfig
from h3dgs_tpu.model import state as S
from h3dgs_tpu.ops import adam as A
from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
from h3dgs_tpu.parallel import sharding as shard_lib
from h3dgs_tpu.parallel.step import make_dp_train_step, make_parallel_train_step
from h3dgs_tpu.scene.camera import look_at_camera
from h3dgs_tpu.train.step import ViewBatch
from h3dgs_tpu.utils.sh import rgb_to_sh

RASTER = RasterizeConfig(max_entries=1 << 13, max_per_tile=128, chunk=16,
                         backend="xla")


def _setup(b=8, n=32, h=32, w=32):
    rng = np.random.default_rng(0)
    st = S.from_arrays(
        xyz=rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        features_dc=rgb_to_sh(rng.uniform(0.2, 0.8,
                                          (n, 1, 3))).astype(np.float32),
        features_rest=np.zeros((n, 15, 3), np.float32),
        opacity=np.full((n, 1), 0.5, np.float32),
        scaling=np.full((n, 3), np.log(0.15), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=64, max_sh_degree=0)
    cams = [look_at_camera(eye=(3 * np.sin(a), -0.4, -3 * np.cos(a)),
                           target=(0, 0, 0), fovx=1.1, width=w, height=h)
            for a in np.linspace(0, np.pi, b, endpoint=False)]
    bg = jnp.zeros(3, jnp.float32)
    targets = jnp.stack([
        rasterize(st.xyz, st.get_scaling(), st.get_rotation(),
                  jnp.full((st.capacity,), 0.9), st.get_features(0), c, 0,
                  bg, config=RASTER)["render"] for c in cams])
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    batch = ViewBatch(
        camera=cam_batch, gt_image=targets,
        alpha_mask=jnp.ones((b, 1, h, w)),
        invdepth=jnp.zeros((b, 1, h, w)) + 0.3,
        depth_mask=jnp.ones((b, 1, h, w)),
        depth_reliable=jnp.ones(b, bool),
        image_idx=jnp.arange(b, dtype=jnp.int32))
    return st, batch, bg


@pytest.mark.slow
def test_dp_step_matches_vmapped():
    mesh = shard_lib.make_mesh(n_data=8, n_tile=1)
    st, batch, bg = _setup()
    opt_cfg = OptimizationConfig(iterations=10)
    kw = dict(use_depth_loss=True, use_exposure=True, skybox_locked=False,
              skip_shrink=False)
    step_vm = make_parallel_train_step(opt_cfg, RASTER, shard_tiles=False,
                                       **kw)
    step_dp = make_dp_train_step(opt_cfg, RASTER, mesh, **kw)

    exposure = jnp.tile(jnp.eye(3, 4)[None], (8, 1, 1))
    args = (jnp.asarray(1.0), bg, jnp.asarray(1.0), jnp.asarray(3.0), 0)

    def fresh():
        # Steps donate their inputs; each needs its own buffers.
        return (jax.tree.map(jnp.copy, st),
                A.init(st.trainable_dict()), jnp.copy(exposure),
                A.init({"exposure": exposure}))

    with jax.set_mesh(mesh):
        b_sh = jax.device_put(batch, shard_lib.data_sharded(mesh))
        out_vm = step_vm(*fresh(), b_sh, *args)
        out_dp = step_dp(*fresh(), b_sh, *args)

    np.testing.assert_allclose(float(out_dp.photo_loss),
                               float(out_vm.photo_loss), rtol=1e-5)
    for k in ("xyz", "scaling", "opacity"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_dp.state, k)),
            np.asarray(getattr(out_vm.state, k)), atol=1e-5,
            err_msg=f"state.{k} mismatch")
    np.testing.assert_allclose(np.asarray(out_dp.exposure),
                               np.asarray(out_vm.exposure), atol=1e-6)
    assert int(out_dp.n_visible) == int(out_vm.n_visible)
    # ADVICE r3: n_bwd_quanta must be plumbed through the DP step so the
    # adaptive bwd budget (-2) can engage under data parallelism. The
    # XLA blend path reports -1 (not tracked) — the field must exist and
    # agree, not silently default.
    assert out_dp.n_bwd_quanta is not None
    assert int(out_dp.n_bwd_quanta) == int(out_vm.n_bwd_quanta)
