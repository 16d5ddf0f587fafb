"""Evaluation metrics: PSNR / SSIM / LPIPS.

PSNR and SSIM are jitted JAX (utils/losses). LPIPS reproduces the
reference's lpipsPyTorch usage (/root/reference/render_hierarchy.py:25,113)
as a VGG16-features + linear-head distance in JAX; pretrained weights must
be provided as an .npz (this environment has no network access and no
torchvision weights cache), otherwise ``lpips`` reports None and the eval
prints PSNR/SSIM only. Convert weights offline with
``python -m h3dgs_tpu.eval.convert_lpips`` on a machine that has them.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.losses import psnr, ssim  # noqa: F401  (re-exported)

LPIPS_WEIGHTS_ENV = "H3DGS_LPIPS_WEIGHTS"

# VGG16 conv layout per block (out-channels), relu indices used by LPIPS.
_VGG_CFG = ((64, 64), (128, 128), (256, 256, 256),
            (512, 512, 512), (512, 512, 512))
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


_WARNED = [False]


def _default_weight_paths():
    """No-setup locations: repo-local weights/ and the user cache."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    yield os.path.join(here, "weights", "lpips_vgg.npz")
    yield os.path.expanduser("~/.cache/h3dgs/lpips_vgg.npz")


def _find_weights(path: Optional[str]) -> Optional[str]:
    cand = path or os.environ.get(LPIPS_WEIGHTS_ENV, "")
    if cand and os.path.exists(cand):
        return cand
    for p in _default_weight_paths():
        if os.path.exists(p):
            return p
    if not _WARNED[0]:  # loud, once — never silently degrade the eval
        _WARNED[0] = True
        import sys
        print("[eval] LPIPS unavailable: no weights at "
              f"$({LPIPS_WEIGHTS_ENV}), weights/lpips_vgg.npz or "
              "~/.cache/h3dgs/lpips_vgg.npz — reporting PSNR/SSIM only. "
              "Convert once with python -m h3dgs_tpu.eval.convert_lpips "
              "on a machine with torchvision weights.", file=sys.stderr,
              flush=True)
    return None


@functools.lru_cache(maxsize=1)
def _load_weights(path: str):
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def _vgg_features(x, w):
    """x: [N,3,H,W] in [-1,1] (LPIPS scaling applied). Returns 5 relus."""
    x = (x - jnp.asarray(_SHIFT)[:, None, None]) \
        / jnp.asarray(_SCALE)[:, None, None]
    feats = []
    li = 0
    for b, block in enumerate(_VGG_CFG):
        for _ in block:
            k = w[f"conv{li}.weight"]  # [out,in,3,3]
            bias = w[f"conv{li}.bias"]
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=jax.lax.Precision.HIGHEST)
            x = jax.nn.relu(x + bias[None, :, None, None])
            li += 1
        feats.append(x)
        if b < 4:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
    return feats


def lpips(img1, img2, weights_path: Optional[str] = None):
    """LPIPS(vgg) distance for [3,H,W] images in [0,1]; None if no weights."""
    path = _find_weights(weights_path)
    if path is None:
        return None
    w = _load_weights(path)

    @jax.jit
    def run(a, b):
        a = a[None] * 2.0 - 1.0
        b = b[None] * 2.0 - 1.0
        fa = _vgg_features(a, w)
        fb = _vgg_features(b, w)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            xn = x / jnp.sqrt(jnp.sum(x ** 2, 1, keepdims=True) + 1e-10)
            yn = y / jnp.sqrt(jnp.sum(y ** 2, 1, keepdims=True) + 1e-10)
            d = (xn - yn) ** 2
            lin = w[f"lin{i}.weight"]  # [1, C, 1, 1]
            total = total + jnp.mean(jnp.sum(d * lin[0, :, 0, 0]
                                             [None, :, None, None], axis=1))
        return total

    return float(run(jnp.asarray(img1), jnp.asarray(img2)))
