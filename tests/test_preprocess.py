"""Preprocessing components over synthetic data (COLMAP binary not needed:
these test the pure-python parts of the pipeline)."""
import os

import numpy as np
import pytest

from h3dgs_tpu.io import colmap as C
from h3dgs_tpu.preprocess import chunk as chunk_lib
from h3dgs_tpu.preprocess import depth_scale as ds_lib
from h3dgs_tpu.preprocess import matchers, simplify
from h3dgs_tpu.preprocess import reorient as reorient_lib
from h3dgs_tpu.preprocess import transform as transform_lib
from h3dgs_tpu.preprocess.colmap_db import ColmapDatabase, fill_database


def _camera(cid=1, w=64, h=48, f=50.0):
    return C.ColmapCamera(cid, "PINHOLE", w, h,
                          np.asarray([f, f, w / 2, h / 2]))


def _image(iid, center, rng, name=None, look_dir=None, n_pts=0,
           pids=None):
    """World-to-cam image at a given camera center."""
    # Random-ish but valid rotation.
    if look_dir is None:
        look_dir = np.asarray([0.0, 0.0, 1.0])
    z = look_dir / np.linalg.norm(look_dir)
    x = np.cross(np.asarray([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)
    t = -R @ np.asarray(center, float)
    xys = rng.uniform(0, 40, (n_pts, 2))
    return C.ColmapImage(iid, C.rotmat2qvec(R), t, 1,
                         name or f"im_{iid:03d}.png", xys,
                         pids if pids is not None
                         else np.zeros(n_pts, np.int64))


def _model_on_plane(n=40, seed=0, tilt=None):
    """Cameras on a tilted plane + points below them."""
    rng = np.random.default_rng(seed)
    g = int(np.ceil(np.sqrt(n)))
    centers = []
    for i in range(n):
        x, y = (i % g) * 2.0, (i // g) * 2.0
        z = 0.1 * x + 0.05 * y if tilt is None else tilt(x, y)
        centers.append([x, z, y])  # plane in XZ... keep simple: [x, z, y]
    centers = np.asarray(centers, float)
    pts_xyz = centers + rng.normal(0, 0.3, centers.shape) \
        + np.asarray([0, -5.0, 0])
    n_pts = len(pts_xyz)
    pts = C.ColmapPoints3D(
        ids=np.arange(1, n_pts + 1), xyz=pts_xyz,
        rgb=np.full((n_pts, 3), 128, np.uint8), error=np.zeros(n_pts),
        track_offsets=np.zeros(n_pts + 1, np.int64),
        track_image_ids=np.zeros(0, np.int32),
        track_point2d_idxs=np.zeros(0, np.int32))
    images = {}
    for i, c in enumerate(centers):
        pids = np.arange(1, n_pts + 1)
        images[i + 1] = _image(i + 1, c, rng, n_pts=n_pts, pids=pids)
    return {1: _camera()}, images, pts


def test_reorient_aligns_and_scales():
    cams, images, pts = _model_on_plane()
    rot, scale = reorient_lib.compute_rotation_scale(cams, images, pts)
    cams2, images2, pts2 = reorient_lib.apply_rotation_scale(
        cams, images, pts, rot, scale)
    centers = reorient_lib.camera_centers(images2)
    # Camera plane now has (almost) constant z: up is the z axis.
    spread = centers.std(axis=0)
    assert spread[2] < 0.1 * max(spread[0], spread[1])
    # Median camera->point distance is the target metric unit.
    dists = []
    for im in images2.values():
        c = -C.qvec2rotmat(im.qvec).T @ im.tvec
        dists.extend(np.linalg.norm(pts2.xyz - c, axis=1))
    assert abs(np.median(dists) - 20.0) < 1.0
    # Rigid+scale: pairwise point distances scale uniformly.
    d_before = np.linalg.norm(pts.xyz[0] - pts.xyz[5])
    d_after = np.linalg.norm(pts2.xyz[0] - pts2.xyz[5])
    np.testing.assert_allclose(d_after / d_before, scale, rtol=1e-5)


def test_procrustes_recovers_sim3():
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(50, 3))
    ang = 0.7
    R = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    x1 = (x0 @ R.T) * 2.5 + np.asarray([1.0, -2.0, 3.0])
    sim3 = transform_lib.procrustes_analysis(x0, x1)
    np.testing.assert_allclose(sim3.apply(x1), x0, atol=1e-6)


def _model_3d(n=30, seed=3):
    """Non-degenerate camera cloud (Procrustes on centers needs 3D
    spread; planar layouts leave a rotation ambiguity)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, 10, (n, 3))
    pts_xyz = rng.uniform(-5, 15, (n * 3, 3))
    n_pts = len(pts_xyz)
    pts = C.ColmapPoints3D(
        ids=np.arange(1, n_pts + 1), xyz=pts_xyz,
        rgb=np.full((n_pts, 3), 128, np.uint8), error=np.zeros(n_pts),
        track_offsets=np.zeros(n_pts + 1, np.int64),
        track_image_ids=np.zeros(0, np.int32),
        track_point2d_idxs=np.zeros(0, np.int32))
    images = {}
    for i, c in enumerate(centers):
        images[i + 1] = _image(i + 1, c, rng,
                               look_dir=rng.normal(size=3) + 0.1,
                               n_pts=n_pts,
                               pids=np.arange(1, n_pts + 1))
    return {1: _camera()}, images, pts


def test_transform_colmap_reanchors(tmp_path):
    cams, images, pts = _model_3d(n=30)
    in_dir = str(tmp_path / "orig")
    C.write_model_binary(os.path.join(in_dir, "sparse/0"), cams, images,
                         pts)
    from h3dgs_tpu.io.meta import write_vec
    write_vec(os.path.join(in_dir, "center.txt"), [0, 0, 0])
    write_vec(os.path.join(in_dir, "extent.txt"), [100, 100, 100])

    # Fabricate a "refined" model in a rotated/scaled frame.
    ang = 0.3
    R = np.asarray([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)]])
    s = 1.7
    import dataclasses
    images_new = {}
    for k, im in images.items():
        c = -C.qvec2rotmat(im.qvec).T @ im.tvec
        c_new = s * (R @ c) + np.asarray([5.0, 0, 0])
        R_new = C.qvec2rotmat(im.qvec) @ R.T
        images_new[k] = dataclasses.replace(
            im, qvec=C.rotmat2qvec(R_new), tvec=-R_new @ c_new)
    pts_new = dataclasses.replace(
        pts, xyz=s * (pts.xyz @ R.T) + np.asarray([5.0, 0, 0]),
        track_offsets=pts.track_offsets)
    new_dir = str(tmp_path / "refined")
    C.write_model_binary(os.path.join(new_dir, "sparse/0"), cams,
                         images_new, pts_new)

    out_dir = str(tmp_path / "out")
    transform_lib.transform_colmap(in_dir, new_dir, out_dir,
                                   max_err=10.0, min_views=-1)
    _, images_out, pts_out = C.read_model(os.path.join(out_dir, "sparse/0"))
    for k, im in images_out.items():
        c_out = -C.qvec2rotmat(im.qvec).T @ im.tvec
        c_orig = -C.qvec2rotmat(images[k].qvec).T @ images[k].tvec
        np.testing.assert_allclose(c_out, c_orig, atol=1e-4)
    np.testing.assert_allclose(pts_out.xyz, pts.xyz, atol=1e-4)
    assert os.path.exists(os.path.join(out_dir, "center.txt"))


def test_simplify_images_drops_isolated(tmp_path):
    rng = np.random.default_rng(0)
    images = {}
    for i in range(10):
        pids = np.asarray([1, -1, 2], np.int64)
        images[i + 1] = _image(i + 1, [i * 1.0, 0, 0], rng, n_pts=3,
                               pids=pids)
    # one far-away outlier and one with no points
    images[11] = _image(11, [500.0, 0, 0], rng, n_pts=3,
                        pids=np.asarray([1, 2, 3], np.int64))
    images[12] = _image(12, [5.0, 0, 0], rng, n_pts=0)
    d = str(tmp_path)
    C.write_images_binary(os.path.join(d, "images.bin"), images)
    n = simplify.simplify_images(d)
    assert n == 10
    kept = C.read_images_binary(os.path.join(d, "images.bin"))
    assert 11 not in kept and 12 not in kept
    # invalid point refs stripped
    assert all((im.point3d_ids >= 0).all() for im in kept.values())
    assert os.path.exists(os.path.join(d, "images_heavy.bin"))


def test_matcher_file_quadratic(tmp_path):
    from PIL import Image as PILImage
    img_dir = tmp_path / "cam0"
    img_dir.mkdir()
    for i in range(12):
        PILImage.new("RGB", (4, 4)).save(img_dir / f"f{i:03d}.png")
    out = str(tmp_path / "matches.txt")
    n = matchers.make_matcher_file(str(tmp_path), out,
                                   n_quad_matches_per_view=3,
                                   n_gps_neighbours=0)
    lines = open(out).read().strip().splitlines()
    assert n == len(lines)
    # frame 0 matches offsets 2^k - 1 = 0(self-excluded?),1,3
    firsts = [ln for ln in lines if ln.startswith("cam0/f000.png")]
    assert "cam0/f000.png cam0/f001.png" in lines
    assert "cam0/f000.png cam0/f003.png" in lines
    # no reciprocal duplicates
    pairs = {tuple(ln.split()) for ln in lines}
    assert all((b, a) not in pairs or a == b for a, b in pairs)


def test_distance_matcher(tmp_path):
    rng = np.random.default_rng(0)
    images = {i + 1: _image(i + 1, [i * 1.0, 0, 0], rng) for i in range(8)}
    d = str(tmp_path / "sparse")
    C.write_model_binary(d, {1: _camera()}, images, None)
    out = str(tmp_path / "m.txt")
    n = matchers.make_distance_matcher_file(d, out, n_neighbours=3)
    lines = open(out).read().strip().splitlines()
    assert n == len(lines) and n > 0
    assert "im_001.png im_002.png" in lines


def test_colmap_db(tmp_path):
    import sqlite3
    cams, images, pts = _model_on_plane(n=5)
    sparse = str(tmp_path / "sparse")
    C.write_model_binary(sparse, cams, images, pts)
    db_path = str(tmp_path / "database.db")
    fill_database(db_path, sparse)
    conn = sqlite3.connect(db_path)
    assert conn.execute("SELECT COUNT(*) FROM cameras").fetchone()[0] == 1
    assert conn.execute("SELECT COUNT(*) FROM images").fetchone()[0] == 5
    name = conn.execute(
        "SELECT name FROM images WHERE image_id=1").fetchone()[0]
    assert name == images[1].name
    conn.close()


def test_make_chunks_splits_scene(tmp_path):
    # Cameras spread over a 2x1 grid of 10-unit chunks with plenty of
    # points visible everywhere.
    rng = np.random.default_rng(0)
    n_cam = 60
    centers = np.c_[rng.uniform(0, 20, n_cam), rng.uniform(0, 1, n_cam),
                    rng.uniform(0, 8, n_cam)]
    n_pts = 500
    pts_xyz = np.c_[rng.uniform(0, 20, n_pts), rng.uniform(-3, 0, n_pts),
                    rng.uniform(0, 8, n_pts)]
    pts = C.ColmapPoints3D(
        ids=np.arange(1, n_pts + 1), xyz=pts_xyz,
        rgb=np.full((n_pts, 3), 100, np.uint8), error=np.zeros(n_pts),
        track_offsets=np.zeros(n_pts + 1, np.int64),
        track_image_ids=np.zeros(0, np.int32),
        track_point2d_idxs=np.zeros(0, np.int32))
    images = {}
    for i, c in enumerate(centers):
        # every camera sees the points near it (within 6 units)
        near = np.nonzero(np.linalg.norm(pts_xyz - c, axis=1) < 8)[0]
        images[i + 1] = _image(i + 1, c, rng, n_pts=len(near),
                               pids=near + 1)
    base = str(tmp_path / "scene")
    C.write_model_binary(os.path.join(base, "sparse/0"),
                         {1: _camera()}, images, pts)
    out = str(tmp_path / "chunks")
    written = chunk_lib.make_chunks(
        base, images_dir="/nonexistent", output_path=out, chunk_size=10,
        lapla_thresh=0,  # no images on disk
        min_n_cams=5, max_n_cams=50)
    assert len(written) >= 2
    for c in written:
        cdir = os.path.join(out, c["name"])
        assert os.path.exists(os.path.join(cdir, "center.txt"))
        _, imgs_c, pts_c = C.read_model(os.path.join(cdir, "sparse/0"))
        assert 5 < len(imgs_c) <= 50
        # SfM points stripped from image records (for re-triangulation)
        assert all(im.point3d_ids.size == 0 for im in imgs_c.values())
        assert pts_c.ids.size > 0


def test_depth_scale_recovers_known_transform(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    w, h, f = 64, 48, 50.0
    cam = _camera(1, w, h, f)
    # Keypoints first; inverse depth a linear function of pixel coords so
    # the dense mono map reconstructs exactly under bilinear sampling.
    n_pts = 200
    xys = np.c_[rng.uniform(1, w - 2, n_pts), rng.uniform(1, h - 2, n_pts)]
    inv_depth = 0.1 + 0.002 * xys[:, 0] + 0.001 * xys[:, 1]
    z = 1.0 / inv_depth
    pts_cam = np.c_[(xys[:, 0] - w / 2) * z / f,
                    (xys[:, 1] - h / 2) * z / f, z]
    image = C.ColmapImage(
        1, np.asarray([1.0, 0, 0, 0]), np.zeros(3), 1, "v.png", xys,
        np.arange(1, n_pts + 1))
    pts = C.ColmapPoints3D(
        ids=np.arange(1, n_pts + 1), xyz=pts_cam,
        rgb=np.zeros((n_pts, 3), np.uint8), error=np.zeros(n_pts),
        track_offsets=np.zeros(n_pts + 1, np.int64),
        track_image_ids=np.zeros(0, np.int32),
        track_point2d_idxs=np.zeros(0, np.int32))
    base = str(tmp_path / "scene")
    C.write_model_binary(os.path.join(base, "sparse/0"), {1: cam},
                         {1: image}, pts)
    # Mono inverse depth = true inverse depth * a + b (dense analytic map).
    a_true, b_true = 0.4, 0.05
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    inv_z = 0.1 + 0.002 * gx + 0.001 * gy
    mono = (inv_z * a_true + b_true).astype(np.float32)
    depths = tmp_path / "depths"
    depths.mkdir()
    cv2.imwrite(str(depths / "v.png"),
                (mono * 2 ** 16).astype(np.uint16))
    params = ds_lib.make_depth_scale(base, str(depths))
    assert "v" in params
    s, o = params["v"]["scale"], params["v"]["offset"]
    # inv_colmap = scale * inv_mono + offset => scale ~ 1/a
    np.testing.assert_allclose(s, 1.0 / a_true, rtol=0.1)
    np.testing.assert_allclose(o, -b_true / a_true, atol=0.1)


def test_images_text_with_zero_keypoint_image(tmp_path):
    """An image with an EMPTY POINTS2D line (zero keypoints) must not
    shift the meta/points pairing of later images (review finding)."""
    from h3dgs_tpu.io import colmap as C

    txt = tmp_path / "images.txt"
    txt.write_text(
        "# images\n"
        "1 0.9 0.1 0.0 0.0 1.0 2.0 3.0 1 a.jpg\n"
        "\n"
        "2 0.8 0.2 0.0 0.0 4.0 5.0 6.0 1 b.jpg\n"
        "1.5 2.5 7 3.5 4.5 9\n")
    imgs = C.read_images_text(str(txt))
    assert set(imgs) == {1, 2}
    assert imgs[1].name == "a.jpg"
    assert imgs[1].xys.shape == (0, 2)
    assert imgs[2].name == "b.jpg"
    assert imgs[2].xys.shape == (2, 2)
    np.testing.assert_array_equal(imgs[2].point3d_ids, [7, 9])
