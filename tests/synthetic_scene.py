"""Synthetic COLMAP scene fixture: a known Gaussian scene rendered to GT
images + a COLMAP sparse model on disk. Plays the role of the reference's
toy dataset (SURVEY.md §4: the de-facto integration test)."""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from h3dgs_tpu.io import colmap as colmap_io
from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
from h3dgs_tpu.scene.camera import look_at_camera
from h3dgs_tpu.utils.sh import rgb_to_sh

CFG = RasterizeConfig(max_entries=1 << 15, max_per_tile=256, chunk=16)


def make_gaussian_scene(n=120, seed=0, center=(0.0, 0.0, 0.0),
                        spread=1.0):
    rng = np.random.default_rng(seed)
    means = (rng.uniform(-spread, spread, (n, 3))
             + np.asarray(center)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.06), np.log(0.18),
                                (n, 3))).astype(np.float32)
    quats = np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1))
    opac = rng.uniform(0.5, 0.95, (n,)).astype(np.float32)
    rgb = rng.uniform(0.1, 0.95, (n, 3)).astype(np.float32)
    shs = np.zeros((n, 1, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rgb)
    return means, scales, quats, opac, shs, rgb


def ring_cameras(n_cams=8, center=(0.0, 0.0, 0.0), dist=4.0,
                 width=64, height=48, fovx=1.1):
    cams = []
    for a in np.linspace(0, 2 * np.pi, n_cams, endpoint=False):
        eye = (center[0] + dist * np.sin(a), center[1] - 0.8,
               center[2] - dist * np.cos(a))
        cams.append(look_at_camera(eye=eye, target=center, fovx=fovx,
                                   width=width, height=height))
    return cams


def write_colmap_scene(path: str, means, scales, quats, opac, shs, rgb,
                       cams, image_prefix="img", test_every=0):
    """Render GT images with the rasterizer and write a COLMAP model."""
    from PIL import Image

    os.makedirs(os.path.join(path, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(path, "images"), exist_ok=True)

    bg = jnp.zeros(3, jnp.float32)
    colmap_cams, colmap_imgs = {}, {}
    test_names = []
    for i, cam in enumerate(cams):
        out = rasterize(means, scales, quats, opac, shs, cam, 0, bg,
                        config=CFG)
        img = np.clip(np.asarray(out["render"]), 0, 1)
        name = f"{image_prefix}_{i:03d}.png"
        Image.fromarray((img.transpose(1, 2, 0) * 255).astype(
            np.uint8)).save(os.path.join(path, "images", name))

        w, h = cam.width, cam.height
        fx = w / (2.0 * float(cam.tanfovx))
        fy = h / (2.0 * float(cam.tanfovy))
        colmap_cams[i + 1] = colmap_io.ColmapCamera(
            i + 1, "PINHOLE", w, h,
            np.asarray([fx, fy, w / 2.0, h / 2.0]))
        view = np.asarray(cam.view)
        R_w2c = view[:3, :3]
        qvec = colmap_io.rotmat2qvec(R_w2c)
        colmap_imgs[i + 1] = colmap_io.ColmapImage(
            i + 1, qvec, view[:3, 3].astype(np.float64), i + 1, name,
            np.zeros((0, 2)), np.zeros(0, np.int64))
        if test_every and i % test_every == 0:
            test_names.append(name)

    n = means.shape[0]
    pts = colmap_io.ColmapPoints3D(
        ids=np.arange(1, n + 1, dtype=np.int64),
        xyz=means.astype(np.float64),
        rgb=(rgb * 255).astype(np.uint8),
        error=np.zeros(n),
        track_offsets=np.zeros(n + 1, np.int64),
        track_image_ids=np.zeros(0, np.int32),
        track_point2d_idxs=np.zeros(0, np.int32))
    colmap_io.write_model_binary(os.path.join(path, "sparse/0"),
                                 colmap_cams, colmap_imgs, pts)
    if test_names:
        with open(os.path.join(path, "sparse/0/test.txt"), "w") as f:
            f.write("\n".join(test_names) + "\n")
    return test_names
