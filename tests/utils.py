"""Shared test helpers: synthetic random Gaussian scenes."""
from __future__ import annotations

import numpy as np

from h3dgs_tpu.scene.camera import Camera, look_at_camera


def random_scene(n: int, seed: int = 0, sh_degree: int = 1,
                 spread: float = 1.0, opacity_lo: float = 0.2,
                 opacity_hi: float = 0.95, scale_lo: float = 0.02,
                 scale_hi: float = 0.15):
    """Random Gaussians in a [-spread, spread]^3 box around the origin."""
    rng = np.random.default_rng(seed)
    k = (sh_degree + 1) ** 2
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(scale_lo), np.log(scale_hi),
                                (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(opacity_lo, opacity_hi, (n,)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, :k, :] = rng.normal(0.0, 0.3, (n, k, 3))
    shs[:, 0, :] = rng.uniform(-1.0, 1.5, (n, 3))
    return means, scales, quats, opac, shs[:, :k, :]


def make_test_camera(width=64, height=48, dist=4.0, fovx=1.0, **kw) -> Camera:
    return look_at_camera(eye=(0.3, -0.2, -dist), target=(0.0, 0.0, 0.0),
                          fovx=fovx, width=width, height=height, **kw)


def write_random_lpips_weights(path):
    """Shape-compatible random VGG-lin weights (see eval/metrics._VGG_CFG):
    exercises the full LPIPS compute path without pretrained tensors."""
    import numpy as np

    from h3dgs_tpu.eval.metrics import _VGG_CFG

    rng = np.random.default_rng(0)
    arrays = {}
    cin = 3
    li = 0
    for block in _VGG_CFG:
        for cout in block:
            arrays[f"conv{li}.weight"] = rng.normal(
                0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
            arrays[f"conv{li}.bias"] = np.zeros(cout, np.float32)
            cin = cout
            li += 1
    for i, block in enumerate(_VGG_CFG):
        arrays[f"lin{i}.weight"] = np.abs(rng.normal(
            0, 0.1, (1, block[-1], 1, 1))).astype(np.float32)
    np.savez(path, **arrays)
    return str(path)
