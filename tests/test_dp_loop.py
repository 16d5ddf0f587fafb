"""CLI-reachable multi-chip training (VERDICT r1 item 2): train_flat's
data-parallel path (runtime.data_devices / views_per_step) on an emulated
CPU mesh. The view stream is seeded+FIFO, so two runs consume identical
view sequences; the same total batch psum'd over different device counts
must produce the same parameters (up to f32 reduction order)."""
import dataclasses

import numpy as np
import pytest

from h3dgs_tpu.config import (FullConfig, ModelConfig, OptimizationConfig,
                              RuntimeConfig)
from h3dgs_tpu.scene.scene import Scene
from h3dgs_tpu.train.loop import train_flat

from .synthetic_scene import make_gaussian_scene, ring_cameras, write_colmap_scene

RUNTIME = RuntimeConfig(max_entries=1 << 14, max_per_tile=256,
                        blend_chunk=16, capacity_factor=2.0)


@pytest.fixture(scope="module")
def toy_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dp_toy"))
    scene_arrays = make_gaussian_scene(n=80, seed=3)
    cams = ring_cameras(n_cams=8)
    write_colmap_scene(path, *scene_arrays, cams, test_every=0)
    return path


def _train(path, tmp, tag, data_devices, views_per_step, iters=6):
    cfg = FullConfig(
        model=ModelConfig(source_path=path,
                          model_path=str(tmp / f"out_{tag}"),
                          resolution=1),
        opt=OptimizationConfig(iterations=iters, densify_from_iter=10**9,
                               densify_until_iter=0,
                               opacity_reset_interval=10**9,
                               position_lr_max_steps=iters),
        runtime=dataclasses.replace(RUNTIME, data_devices=data_devices,
                                    views_per_step=views_per_step))
    scene = Scene(cfg.model, cfg.runtime)
    losses = []
    state, _exp = train_flat(
        cfg, scene, coarse=False,
        progress_cb=lambda it, log: losses.append(log.ema_photo))
    return state, losses


@pytest.mark.slow
def test_train_flat_dp_device_count_invariant(toy_path, tmp_path):
    st2, loss2 = _train(toy_path, tmp_path, "d2", 2, 4)
    st4, loss4 = _train(toy_path, tmp_path, "d4", 4, 4)
    assert np.isfinite(loss2[-1]) and loss2[-1] < 0.5
    np.testing.assert_allclose(np.asarray(st2.xyz), np.asarray(st4.xyz),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st2.opacity),
                               np.asarray(st4.opacity),
                               rtol=2e-4, atol=2e-5)


def test_views_per_step_divisibility(toy_path, tmp_path):
    with pytest.raises(ValueError, match="multiple of data_devices"):
        _train(toy_path, tmp_path, "bad", 4, 6, iters=1)


@pytest.mark.slow
def test_dp_post_step_matches_single():
    """make_dp_post_step with one view on a 1-device mesh must reproduce
    make_post_train_step exactly (same grads, same dense Adam); on a
    2-device mesh with the batch split it must match the 1-device result
    up to psum reduction order."""
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.config import OptimizationConfig
    from h3dgs_tpu.ops import adam as adam_lib
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.parallel import sharding as shard_lib
    from h3dgs_tpu.parallel.step import make_dp_post_step
    from h3dgs_tpu.train.post_step import make_post_train_step

    from .test_post_training import _batch, _setup

    h, state, amask, cams, gts, bg = _setup()
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    amask = jnp.asarray(amask)
    r_cfg = RasterizeConfig(max_entries=1 << 14, max_per_tile=256,
                            chunk=16)
    opt_cfg = OptimizationConfig(iterations=10)
    max_cut = h.n_nodes
    kw = dict(skybox_locked=False, use_exposure=True)
    exp_row = jnp.eye(3, 4)
    limit = jnp.asarray(0.01)

    def run_single(view):
        st = jax.tree.map(jnp.copy, state)
        step = make_post_train_step(opt_cfg, r_cfg, max_cut, **kw)
        out = step(st, adam_lib.init(st.trainable_dict()), view, nodes,
                   boxes, amask, exp_row, limit, jnp.asarray(1.0), bg,
                   jnp.asarray(1.0), 1)
        return out

    def run_dp(views, n_dev):
        st = jax.tree.map(jnp.copy, state)
        mesh = shard_lib.make_mesh(n_data=n_dev, n_tile=1)
        step = make_dp_post_step(opt_cfg, r_cfg, max_cut, mesh, **kw)
        b = len(views)
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *views)
        exp_rows = jnp.tile(exp_row[None], (b, 1, 1))
        limits = jnp.full((b,), 0.01)
        out = step(st, adam_lib.init(st.trainable_dict()), batch, nodes,
                   boxes, amask, exp_rows, limits, jnp.asarray(1.0), bg,
                   jnp.asarray(1.0), 1)
        return out

    views = [_batch(cams[i], gts[i]) for i in range(2)]
    out_s = run_single(views[0])
    out_1 = run_dp(views[:1], 1)
    np.testing.assert_allclose(np.asarray(out_1.state.xyz),
                               np.asarray(out_s.state.xyz),
                               rtol=1e-6, atol=1e-7)
    assert int(out_1.cut_size) == int(out_s.cut_size)

    out_d1 = run_dp(views, 1)
    out_d2 = run_dp(views, 2)
    np.testing.assert_allclose(np.asarray(out_d2.state.xyz),
                               np.asarray(out_d1.state.xyz),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out_d2.photo_loss),
                               float(out_d1.photo_loss), rtol=1e-5)


@pytest.mark.slow
def test_train_post_dp_loop(toy_path, tmp_path):
    """CLI-level dp post-training: train_post with data_devices=2 runs the
    shard_map step through the real loop (batched prefetch, per-view
    exposure rows + limit samples) and converges finitely."""
    import os

    from h3dgs_tpu.cli.hierarchy_creator import create_hierarchy
    from h3dgs_tpu.io.meta import write_vec
    from h3dgs_tpu.train.loop import train_post

    model_dir = str(tmp_path / "out_post_dp")
    st, _ = _train(toy_path, tmp_path, "flat_for_post", 1, 1, iters=40)
    # _train saved point_cloud at iteration_40 under out_flat_for_post.
    pc = str(tmp_path / "out_flat_for_post" /
             "point_cloud/iteration_40/point_cloud.ply")
    assert os.path.exists(pc)
    chunk_dir = str(tmp_path / "chunk")
    os.makedirs(chunk_dir, exist_ok=True)
    write_vec(os.path.join(chunk_dir, "center.txt"), [0, 0, 0])
    write_vec(os.path.join(chunk_dir, "extent.txt"), [100, 100, 100])
    os.makedirs(model_dir, exist_ok=True)
    hier = create_hierarchy(pc, chunk_dir, model_dir)

    cfg = FullConfig(
        model=ModelConfig(source_path=toy_path, model_path=model_dir,
                          hierarchy=hier, resolution=1),
        opt=OptimizationConfig(iterations=6, position_lr_max_steps=6),
        runtime=dataclasses.replace(RUNTIME, data_devices=2,
                                    views_per_step=2))
    scene = Scene(cfg.model, cfg.runtime, create_from_hier=True)
    losses = []
    train_post(cfg, scene,
               progress_cb=lambda it, log: losses.append(log.ema_photo))
    assert losses and np.isfinite(losses[-1])
    assert os.path.exists(hier + "_opt")


@pytest.mark.slow
def test_dp_step_pallas_backend():
    """The Pallas blend (custom VJP + backward-truncation lax.cond) must
    compose with the dp step's shard_map + lax.scan — the exact program a
    TPU slice runs (CPU auto-backend falls back to XLA, so this forces
    the pallas path in interpret mode)."""
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.config import OptimizationConfig
    from h3dgs_tpu.ops import adam as adam_lib
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.parallel import sharding as shard_lib
    from h3dgs_tpu.parallel.step import make_dp_train_step
    from h3dgs_tpu.train.step import ViewBatch

    from .test_dp_step import _setup

    st, batch, bg = _setup(b=2, n=24, h=32, w=32)
    mesh = shard_lib.make_mesh(n_data=2, n_tile=1)
    cfg = RasterizeConfig(max_entries=1 << 11, max_per_tile=128,
                          backend="pallas", chunk_e=256, quantum=128,
                          bwd_entries=512)
    step = make_dp_train_step(OptimizationConfig(iterations=4), cfg, mesh,
                              use_depth_loss=True, use_exposure=True,
                              skybox_locked=False, skip_shrink=False)
    opt = adam_lib.init(st.trainable_dict())
    exposure = jnp.tile(jnp.eye(3, 4)[None], (2, 1, 1))
    with jax.set_mesh(mesh):
        batch_sh = jax.device_put(batch, shard_lib.data_sharded(mesh))
        out = step(st, opt, exposure,
                   adam_lib.init({"exposure": exposure}), batch_sh,
                   jnp.asarray(1.0), bg, jnp.asarray(1.0),
                   jnp.asarray(3.0), 0)
        jax.block_until_ready(out.state.xyz)
    assert np.isfinite(float(out.photo_loss))
    assert int(out.n_visible) > 0
