"""Slow-but-obviously-correct reference renderer (the kernel-test oracle).

Renders every Gaussian against every pixel with exact front-to-back alpha
blending semantics: Gaussians sorted by camera-space depth, per-pixel
``alpha = min(0.99, o * exp(-0.5 d^T conic d))``, contributions skipped when
``exp`` power > 0 or alpha < 1/255, and the blend terminated for the rest of
the list once transmittance would drop below 1e-4 — the same rules as the
CUDA tile rasterizer the reference wraps (interface pinned at
/root/reference/gaussian_renderer/__init__.py:105-135).

O(N * H * W); use only for tiny scenes in tests. Differentiable end-to-end
via plain autodiff (the depth sort is treated as a constant permutation, as
in the CUDA implementation).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..scene.camera import Camera
from .projection import ProjectedGaussians, project_gaussians

ALPHA_EPS = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
ALPHA_MAX = 0.99


def blend_reference(proj: ProjectedGaussians, camera: Camera,
                    bg_color: jnp.ndarray):
    """Exact alpha-blend of projected Gaussians over the full image.

    Returns (rgb [3,H,W], invdepth [1,H,W], final_T [H,W]).
    """
    h, w = camera.height, camera.width
    order = jnp.argsort(proj.depth)
    means2d = proj.means2d[order]
    conic = proj.conic[order]
    rgb = proj.rgb[order]
    opacity = proj.opacity[order]
    depth = proj.depth[order]
    valid = proj.valid[order]

    ys = jnp.arange(h, dtype=means2d.dtype)
    xs = jnp.arange(w, dtype=means2d.dtype)
    px, py = jnp.meshgrid(xs, ys)  # [H, W]

    dx = px[None] - means2d[:, 0, None, None]   # [N, H, W]
    dy = py[None] - means2d[:, 1, None, None]
    power = (-0.5 * (conic[:, 0, None, None] * dx * dx
                     + conic[:, 2, None, None] * dy * dy)
             - conic[:, 1, None, None] * dx * dy)
    alpha = jnp.minimum(ALPHA_MAX, opacity[:, None, None] * jnp.exp(power))
    skip = (power > 0.0) | (alpha < ALPHA_EPS) | ~valid[:, None, None]
    alpha = jnp.where(skip, 0.0, alpha)

    # Exclusive cumulative transmittance T_k = prod_{j<k} (1 - alpha_j).
    one_minus = 1.0 - alpha
    log_t_inclusive = jnp.cumsum(jnp.log(jnp.maximum(one_minus, 1e-12)), axis=0)
    t_inclusive = jnp.exp(log_t_inclusive)          # T after blending k
    t_exclusive = t_inclusive / jnp.maximum(one_minus, 1e-12)  # T before k

    # CUDA terminates the pixel when T would drop below 1e-4 *before*
    # blending that Gaussian; everything at and after the first such
    # Gaussian contributes nothing.
    terminated = jnp.cumsum((t_inclusive < TRANSMITTANCE_EPS).astype(jnp.int32),
                            axis=0) > 0
    contrib = jnp.where(terminated, 0.0, alpha * t_exclusive)  # [N, H, W]

    image = jnp.einsum("nhw,nc->chw", contrib, rgb,
                       precision=jax.lax.Precision.HIGHEST)
    # Residual transmittance: for terminated pixels it is T at the first
    # skipped Gaussian (CUDA `continue`s without updating T), otherwise the
    # T left after blending the full list.
    any_term = jnp.any(terminated, axis=0)
    final_t = jnp.where(any_term,
                        _transmittance_at_termination(t_exclusive, terminated),
                        t_inclusive[-1])
    image = image + final_t[None] * bg_color[:, None, None]

    invdepth = jnp.einsum("nhw,n->hw", contrib,
                          1.0 / jnp.maximum(depth, 1e-6),
                          precision=jax.lax.Precision.HIGHEST)
    return image, invdepth[None], final_t


def _transmittance_at_termination(t_exclusive, terminated):
    """T at the first terminated Gaussian (the pixel's residual T)."""
    first = jnp.argmax(terminated, axis=0)  # index of first True
    n = t_exclusive.shape[0]
    onehot = (jnp.arange(n)[:, None, None] == first[None]).astype(t_exclusive.dtype)
    return jnp.sum(t_exclusive * onehot, axis=0)


def render_reference(means3d, scales, quats, opacities, shs, camera: Camera,
                     sh_degree: int, bg_color,
                     scale_modifier: float = 1.0,
                     colors_precomp: Optional[jnp.ndarray] = None):
    """Full reference render. Returns dict mirroring the reference API."""
    proj = project_gaussians(means3d, scales, quats, opacities, shs, camera,
                             sh_degree, scale_modifier,
                             colors_precomp=colors_precomp)
    image, invdepth, final_t = blend_reference(proj, camera,
                                               jnp.asarray(bg_color))
    return {
        "render": image,
        "invdepth": invdepth,
        "final_transmittance": final_t,
        "radii": proj.radius,
        "visibility_filter": proj.radius > 0,
    }
