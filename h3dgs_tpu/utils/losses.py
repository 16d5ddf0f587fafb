"""Photometric losses: L1 and windowed SSIM (jit-friendly).

SSIM uses the standard 11x11 Gaussian window with sigma=1.5, C1=0.01^2,
C2=0.03^2 and SAME padding, matching the semantics of the reference
implementation (/root/reference/utils/loss_utils.py:23-63). Implemented as
two separable depthwise convolutions so XLA can map them onto the TPU
convolution units instead of a dense 2D conv per channel.

Images are ``[3, H, W]`` float (the training-loop layout) or ``[..., 3, H, W]``.
"""
from __future__ import annotations

import functools
import math
import os

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float):
    xs = [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma ** 2))
          for x in range(window_size)]
    total = sum(xs)
    return tuple(x / total for x in xs)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur with SAME (zero) padding. img: [C, H, W].

    Implemented as shifted adds on the VPU rather than depthwise
    convolutions: TPU convs default to bf16 inputs, and the SSIM variance
    terms (blur(x^2) - mu^2) cancel catastrophically on dark/low-variance
    images — bf16 noise there produced garbage gradients thousands of
    times too large, silently stalling training. Shifted adds are exact
    f32 AND much faster than (f32-pinned) depthwise convs on TPU.
    """
    k = window.shape[0]
    r = k // 2
    c, h, w = img.shape

    def along(x, axis, size):
        pad = [(0, 0)] * 3
        pad[axis] = (r, r)
        xp = jnp.pad(x, pad)
        out = jnp.zeros_like(x)
        for i in range(k):
            sl = [slice(None)] * 3
            sl[axis] = slice(i, i + size)
            out = out + window[i] * xp[tuple(sl)]
        return out

    return along(along(img, 1, h), 2, w)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over a [3, H, W] image pair."""
    window = jnp.asarray(_gaussian_window(window_size, sigma), dtype=img1.dtype)
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2

    # NOTE: a stacked [5C,H,W] single-blur formulation was measured SLOWER
    # on chip (6.3 vs 4.5 ms at 1080p, 2026-08-19): the concatenate
    # materializes a 124 MB stack that the five separate fused blur chains
    # never build. Keep the blurs separate.
    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu1_mu2

    ssim_map = (((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return jnp.mean(ssim_map)


def _on_tpu() -> bool:
    try:
        import jax
        d = jax.devices()[0]
        return (d.platform == "tpu"
                or "tpu" in getattr(d, "device_kind", "").lower())
    except Exception:
        return False


# On-chip A/B gate for the fused SSIM kernel (advisor r4 asked for
# hardware evidence before default-on): chip_logs/ab_ssim_20260820T103553Z
# .log — loss dl <= 6e-8, grad cosine 1.0 (max|diff| ~1e-12), fwd+bwd
# 5.02 vs 7.54 ms at 1080p (1.5x; in-step 93.2 -> 91.4 ms) and correct
# at 544x968. Non-differentiated calls route to the XLA forward (faster
# there — same log); the kernel serves the grad path only.
# HOWEVER the full promotion gate also requires a clean TRAINING
# validation with the fused path, and that FAILED: the round-5 city
# run's chunk train_single went loss=nan at iter ~2050 with the kernel
# default-on (chip_logs/validate_city_r5_20260820T131338Z.log) while the
# identically-structured round-4 run (XLA loss) never nan'd. Standalone
# correctness + in-training divergence smells like an executable-
# specific fusion issue on this backend (the class the blend kernel's
# optimization_barrier works around). Default OFF until root-caused;
# the kernel stays available via fused=True.
_FUSED_SSIM_VERIFIED = False


def fused_ssim_supported(pred: jnp.ndarray) -> bool:
    """Shape/dtype/backend gate for the fused Pallas SSIM kernel."""
    return (pred.ndim == 3 and pred.shape[0] == 3
            and pred.shape[1] >= 11 and pred.shape[2] >= 11
            and pred.dtype == jnp.float32 and _on_tpu())


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     lambda_dssim: float = 0.2,
                     fused: bool = None) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM), the reference's photo loss (train_single.py:106-108).

    ``fused``: use the single-pass Pallas fwd+bwd kernel
    (ops/pallas_ssim). None = auto — currently resolves to the XLA path
    everywhere: the kernel passed its standalone on-chip A/B
    (scripts/ab_ssim.py -> chip_logs/ab_ssim_20260820T103553Z.log,
    1.5x fwd+bwd at 1080p, grads ~1e-12) but deterministically diverges
    in chunk training (loss=nan at iter 2050; repro_ssim_nan.py,
    chip_logs/repro_ssim_on_*/repro_ssim_off_*), so the
    _FUSED_SSIM_VERIFIED gate above holds it out of the defaults.
    CAVEAT when opting in (fused=True / H3DGS_FUSED_SSIM=1): the fused
    path differentiates
    w.r.t. ``pred`` only (the target rides stop_gradient), while the XLA
    path differentiates both arguments; auto-enabling is therefore only
    sound for constant-target photometric training, which is every
    in-repo caller. Distillation-style uses (target = rendered teacher)
    must pass ``fused=False`` explicitly."""
    if fused is None:
        env = os.environ.get("H3DGS_FUSED_SSIM")  # debug/repro override
        want = (env == "1") if env is not None else _FUSED_SSIM_VERIFIED
        fused = want and fused_ssim_supported(pred)
    if fused:
        from ..ops.pallas_ssim import fused_photometric_loss
        return fused_photometric_loss(pred, target, lambda_dssim)
    return ((1.0 - lambda_dssim) * l1_loss(pred, target)
            + lambda_dssim * (1.0 - ssim(pred, target)))
