"""End-to-end pipeline over a synthetic COLMAP scene: data layer, training
loop drivers, hierarchy creator, post-opt, merger, eval — the integration
level of the test pyramid (SURVEY.md §4)."""
import os

import numpy as np
import pytest

from h3dgs_tpu.config import FullConfig, ModelConfig, OptimizationConfig, RuntimeConfig
from h3dgs_tpu.io import colmap as colmap_io
from h3dgs_tpu.scene.dataset import read_colmap_scene
from h3dgs_tpu.scene.loader import load_view
from h3dgs_tpu.scene.scene import Scene

from .synthetic_scene import (make_gaussian_scene, ring_cameras,
                              write_colmap_scene)

RUNTIME = RuntimeConfig(max_entries=1 << 15, max_per_tile=256,
                        blend_chunk=16, capacity_factor=4.0)


@pytest.fixture(scope="module")
def toy_scene(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("toy"))
    scene_arrays = make_gaussian_scene(n=100, seed=0)
    cams = ring_cameras(n_cams=10)
    test_names = write_colmap_scene(path, *scene_arrays, cams,
                                    test_every=5)
    return path, scene_arrays, test_names


def test_colmap_roundtrip(tmp_path):
    cams = {1: colmap_io.ColmapCamera(
        1, "PINHOLE", 640, 480, np.asarray([500.0, 501.0, 320.0, 240.5]))}
    imgs = {3: colmap_io.ColmapImage(
        3, np.asarray([0.9, 0.1, 0.2, 0.3]), np.asarray([1.0, -2.0, 3.0]),
        1, "a b.png", np.asarray([[1.5, 2.5], [3.5, 4.5]]),
        np.asarray([7, -1], np.int64))}
    pts = colmap_io.ColmapPoints3D(
        ids=np.asarray([7], np.int64), xyz=np.asarray([[0.1, 0.2, 0.3]]),
        rgb=np.asarray([[255, 0, 10]], np.uint8), error=np.asarray([0.5]),
        track_offsets=np.asarray([0, 2], np.int64),
        track_image_ids=np.asarray([3, 3], np.int32),
        track_point2d_idxs=np.asarray([0, 1], np.int32))
    d = str(tmp_path / "sparse")
    colmap_io.write_model_binary(d, cams, imgs, pts)
    c2, i2, p2 = colmap_io.read_model(d)
    assert c2[1].model == "PINHOLE"
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    assert i2[3].name == "a b.png"
    np.testing.assert_allclose(i2[3].qvec, imgs[3].qvec)
    np.testing.assert_allclose(i2[3].xys, imgs[3].xys)
    np.testing.assert_array_equal(i2[3].point3d_ids, imgs[3].point3d_ids)
    np.testing.assert_allclose(p2.xyz, pts.xyz)
    np.testing.assert_array_equal(p2.track_image_ids, pts.track_image_ids)
    # text path too
    colmap_io.write_model_text(d, cams, imgs, pts)
    os.remove(os.path.join(d, "cameras.bin"))
    os.remove(os.path.join(d, "images.bin"))
    os.remove(os.path.join(d, "points3D.bin"))
    c3, i3, p3 = colmap_io.read_model(d)
    np.testing.assert_allclose(c3[1].params, cams[1].params)
    np.testing.assert_allclose(i3[3].tvec, imgs[3].tvec)
    np.testing.assert_allclose(p3.xyz, pts.xyz)


def test_dataset_reader_and_loader(toy_scene):
    path, (means, scales, quats, opac, shs, rgb), test_names = toy_scene
    info = read_colmap_scene(path, eval_split=True)
    assert len(info.test_cameras) == len(test_names)
    assert len(info.train_cameras) == 10 - len(test_names)
    assert info.point_cloud_xyz.shape == means.shape
    assert info.radius > 0

    view = load_view(info.train_cameras[0], resolution=1)
    assert view.gt_image.shape == (3, 48, 64)
    assert view.alpha_mask.min() == 1.0  # no masks in this scene
    assert not bool(view.depth_reliable)
    # The GT image decodes back to what the rasterizer produced.
    assert 0.0 <= view.gt_image.min() and view.gt_image.max() <= 1.0
    assert view.gt_image.mean() > 0.01


@pytest.mark.slow
def test_end_to_end_single_hier_post_merge(toy_scene, tmp_path):
    import jax.numpy as jnp

    from h3dgs_tpu.cli.hierarchy_creator import create_hierarchy
    from h3dgs_tpu.cli.hierarchy_merger import merge_chunks
    from h3dgs_tpu.cli.render_hierarchy import render_set
    from h3dgs_tpu.io.meta import write_vec
    from h3dgs_tpu.train.loop import train_flat, train_post

    path, (means, scales, quats, opac, shs, rgb), _ = toy_scene
    model_dir = str(tmp_path / "out")

    # --- flat training (short) ---
    cfg = FullConfig(
        model=ModelConfig(source_path=path, model_path=model_dir,
                          resolution=1),
        opt=OptimizationConfig(
            iterations=250, densify_from_iter=50,
            densification_interval=100, opacity_reset_interval=100000,
            densify_until_iter=200, position_lr_max_steps=250),
        runtime=RUNTIME)
    scene = Scene(cfg.model, cfg.runtime)
    losses = []
    train_flat(cfg, scene, coarse=False,
               progress_cb=lambda it, log: losses.append(log.ema_photo))
    assert losses[-1] < 0.25, f"flat training did not converge: {losses}"
    pc_dir = os.path.join(model_dir, "point_cloud/iteration_250")
    assert os.path.exists(os.path.join(pc_dir, "point_cloud.ply"))
    assert os.path.exists(os.path.join(model_dir, "exposure.json"))

    # --- hierarchy creation (chunk bounds cover everything) ---
    chunk_dir = str(tmp_path / "chunk")
    os.makedirs(chunk_dir, exist_ok=True)
    write_vec(os.path.join(chunk_dir, "center.txt"), [0, 0, 0])
    write_vec(os.path.join(chunk_dir, "extent.txt"), [100, 100, 100])
    hier_path = create_hierarchy(
        os.path.join(pc_dir, "point_cloud.ply"), chunk_dir, model_dir)
    assert os.path.exists(hier_path)
    assert os.path.exists(os.path.join(model_dir, "anchors.bin"))

    # --- post-optimization (short) ---
    cfg_post = FullConfig(
        model=ModelConfig(source_path=path, model_path=model_dir,
                          hierarchy=hier_path, resolution=1),
        opt=OptimizationConfig(iterations=40, position_lr_max_steps=40),
        runtime=RUNTIME)
    scene_post = Scene(cfg_post.model, cfg_post.runtime,
                       create_from_hier=True)
    post_losses = []
    train_post(cfg_post, scene_post,
               progress_cb=lambda it, log: post_losses.append(
                   log.ema_photo))
    opt_path = hier_path + "_opt"
    assert os.path.exists(opt_path)

    # --- merge (two copies of the same chunk, disjoint halves) ---
    trained = str(tmp_path / "trained_chunks")
    chunks = str(tmp_path / "chunks")
    for name, lo, hi in (("c0", -100.0, 0.0), ("c1", 0.0, 100.0)):
        os.makedirs(os.path.join(trained, name), exist_ok=True)
        os.makedirs(os.path.join(chunks, name), exist_ok=True)
        import shutil
        shutil.copyfile(opt_path, os.path.join(trained, name,
                                               "hierarchy.hier_opt"))
        write_vec(os.path.join(chunks, name, "center.txt"),
                  [(lo + hi) / 2, 0, 0])
        write_vec(os.path.join(chunks, name, "extent.txt"),
                  [hi - lo, 200, 200])
    merged_path = str(tmp_path / "merged.hier")
    merge_chunks(trained, chunks, merged_path, ["c0", "c1"])
    from h3dgs_tpu.hierarchy.io import read_hier
    merged = read_hier(merged_path)
    merged.validate()

    # --- tau-sweep eval on the merged hierarchy ---
    cfg_eval = FullConfig(
        model=ModelConfig(source_path=path, model_path=model_dir,
                          hierarchy=merged_path, resolution=1,
                          eval=True),
        runtime=RUNTIME)
    scene_eval = Scene(cfg_eval.model, cfg_eval.runtime,
                       create_from_hier=True)
    # Three-metric eval: with (random, shape-compatible) LPIPS weights
    # supplied, the reference's full PSNR/SSIM/LPIPS protocol runs
    # (/root/reference/render_hierarchy.py:108-120).
    import os as _os

    from h3dgs_tpu.eval.metrics import LPIPS_WEIGHTS_ENV

    from .utils import write_random_lpips_weights
    _os.environ[LPIPS_WEIGHTS_ENV] = write_random_lpips_weights(
        str(tmp_path / "rand_lpips.npz"))
    try:
        results = render_set(scene_eval, cfg_eval, [0.0, 15.0],
                             str(tmp_path / "renders"), save_images=False)
    finally:
        del _os.environ[LPIPS_WEIGHTS_ENV]
    assert results[0.0]["psnr"] > 18.0, results
    assert results[0.0]["psnr"] >= results[15.0]["psnr"] - 0.5
    assert results[0.0]["lpips"] is not None
    assert np.isfinite(results[0.0]["lpips"])
