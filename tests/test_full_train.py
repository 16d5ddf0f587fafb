"""The full_train orchestrator end-to-end (reference scripts/full_train.py
front door): coarse scaffold -> chunk (train_single -> hierarchy ->
train_post) -> merge, in local sequential mode over real subprocesses on
a toy project layout. Also covers --skip_if_exists resume."""
import os
import shutil

import pytest

from .synthetic_scene import make_gaussian_scene, ring_cameras, write_colmap_scene

EXTRA = ("--iterations 25 --skybox_num 0 --max_entries 16384 "
         "--max_per_tile 256 --capacity_factor 2.0 --densify_until_iter 0 "
         "--opacity_reset_interval 100000 --position_lr_max_steps 25")


@pytest.mark.slow
def test_full_train_sequential(tmp_path, monkeypatch):
    # Child processes must not dial the TPU plugin from inside the test
    # environment: H3DGS_PLATFORM pins them to CPU at package import.
    monkeypatch.setenv("H3DGS_PLATFORM", "cpu")
    proj = str(tmp_path / "proj")
    aligned = os.path.join(proj, "camera_calibration/aligned")
    chunks = os.path.join(proj, "camera_calibration/chunks")
    os.makedirs(aligned)
    os.makedirs(chunks)

    arrays = make_gaussian_scene(n=60, seed=8)
    write_colmap_scene(aligned, *arrays, ring_cameras(n_cams=6),
                       test_every=0)
    # One chunk covering the whole scene: same COLMAP model + bounds.
    chunk = os.path.join(chunks, "0_0")
    shutil.copytree(os.path.join(aligned, "sparse"),
                    os.path.join(chunk, "sparse"))
    with open(os.path.join(chunk, "center.txt"), "w") as f:
        f.write("0 0 0\n")
    with open(os.path.join(chunk, "extent.txt"), "w") as f:
        f.write("100 100 100\n")

    from h3dgs_tpu.cli import full_train

    images = os.path.join(aligned, "images")
    argv = ["--project_dir", proj, "--images_dir", images,
            "--iterations", "25", "--extra_training_args", EXTRA]
    full_train.main(argv)

    out = os.path.join(proj, "output")
    scaffold_ply = os.path.join(
        out, "scaffold/point_cloud/iteration_25/point_cloud.ply")
    assert os.path.exists(scaffold_ply), "coarse scaffold missing"
    trained = os.path.join(out, "trained_chunks/0_0")
    assert os.path.exists(os.path.join(
        trained, "point_cloud/iteration_25/point_cloud.ply"))
    assert os.path.exists(os.path.join(trained, "hierarchy.hier"))
    assert os.path.exists(os.path.join(trained, "hierarchy.hier_opt"))
    assert os.path.exists(os.path.join(out, "merged.hier"))

    # Resume: everything exists, so --skip_if_exists must be a fast no-op
    # that still re-merges.
    before = os.path.getmtime(os.path.join(trained, "hierarchy.hier_opt"))
    full_train.main(argv + ["--skip_if_exists"])
    after = os.path.getmtime(os.path.join(trained, "hierarchy.hier_opt"))
    assert before == after, "skip_if_exists re-ran a finished chunk"
    assert os.path.exists(os.path.join(out, "merged.hier"))
