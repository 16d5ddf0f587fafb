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
