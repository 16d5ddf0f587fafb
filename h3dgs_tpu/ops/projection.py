"""Gaussian projection: 3D -> screen-space splats (vectorized, jit-friendly).

This is the per-Gaussian stage of the rasterizer: view/projection transform,
EWA covariance projection with low-pass dilation, conic + radius computation,
and SH -> RGB evaluation. It reproduces the numerical conventions of the
3DGS-family CUDA preprocess the reference builds on (tan-clamped Jacobian,
+0.3 pixel dilation, radius = ceil(3 sqrt(lambda_max)), z < 0.2 near cull,
ndc2pix = ((ndc+1)*size-1)/2) so that images/gradients can be compared
against the reference hierarchy-rasterizer; cf. the call-site contract at
/root/reference/gaussian_renderer/__init__.py:44-135.

Everything is a dense [N, ...] -> [N, ...] map with a validity mask instead
of CUDA's thread-level early exits: XLA fuses it into a handful of VPU loops.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..scene.camera import Camera
from ..utils import sh as sh_utils
from ..utils import transforms

# Matches the CUDA rasterizer family: splats closer than this are culled.
NEAR_CULL_Z = 0.2
# Low-pass dilation added to the projected 2D covariance diagonal (pixels^2).
COV2D_DILATION = 0.3


def _mm(a, b):
    # TPU MXU defaults to bf16 inputs; geometry must stay f32.
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


class ProjectedGaussians(NamedTuple):
    """Per-Gaussian screen-space quantities. All [N, ...]."""
    means2d: jnp.ndarray    # [N, 2] pixel coordinates
    conic: jnp.ndarray      # [N, 3] inverse 2D covariance (a, b, c) packed
    rgb: jnp.ndarray        # [N, 3] view-dependent color (>= 0)
    opacity: jnp.ndarray    # [N] activated opacity
    depth: jnp.ndarray      # [N] camera-space z
    radius: jnp.ndarray     # [N] int32 pixel radius (0 => culled)
    valid: jnp.ndarray      # [N] bool visibility mask


def project_gaussians(
    means3d: jnp.ndarray,          # [N, 3]
    scales: jnp.ndarray,           # [N, 3] activated (post-exp)
    quats: jnp.ndarray,            # [N, 4] unnormalized (w, x, y, z)
    opacities: jnp.ndarray,        # [N] activated
    shs: jnp.ndarray,              # [N, K, 3]
    camera: Camera,
    sh_degree: int,
    scale_modifier: float = 1.0,
    colors_precomp: Optional[jnp.ndarray] = None,  # [N, 3] overrides SH
    cov3d_precomp: Optional[jnp.ndarray] = None,   # [N, 6] packed, overrides
) -> ProjectedGaussians:
    means3d = jnp.asarray(means3d)
    scales = jnp.asarray(scales)
    quats = jnp.asarray(quats)
    opacities = jnp.asarray(opacities)
    shs = jnp.asarray(shs)
    view = jnp.asarray(camera.view)
    w_rot = view[:3, :3]

    # --- view/clip transforms ---
    p_view = _mm(means3d, w_rot.T) + view[:3, 3]
    depth = p_view[:, 2]

    hom = _mm(means3d, camera.full_proj[:, :3].T) + camera.full_proj[:, 3][None, :]
    inv_w = 1.0 / (hom[:, 3] + 1e-7)
    ndc = hom[:, :2] * inv_w[:, None]
    size = jnp.asarray([camera.width, camera.height], dtype=means3d.dtype)
    means2d = ((ndc + 1.0) * size - 1.0) * 0.5

    # --- EWA covariance projection ---
    if cov3d_precomp is not None:
        cov3d = transforms.unstrip_symmetric(cov3d_precomp)
    else:
        cov3d = transforms.covariance_from_scaling_rotation(
            scales, quats, scale_modifier)

    fx = camera.focal_x
    fy = camera.focal_y
    limx = 1.3 * camera.tanfovx
    limy = 1.3 * camera.tanfovy
    z = depth
    tx = jnp.clip(p_view[:, 0] / z, -limx, limx) * z
    ty = jnp.clip(p_view[:, 1] / z, -limy, limy) * z

    # J is the 2x3 Jacobian of the perspective projection at (tx, ty, z).
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # M = J @ W_rot : [N, 2, 3]
    m0 = j00[:, None] * w_rot[0][None, :] + j02[:, None] * w_rot[2][None, :]
    m1 = j11[:, None] * w_rot[1][None, :] + j12[:, None] * w_rot[2][None, :]
    # cov2d = M @ cov3d @ M^T
    c_m0 = jnp.einsum("nij,nj->ni", cov3d, m0,
                      precision=jax.lax.Precision.HIGHEST)
    c_m1 = jnp.einsum("nij,nj->ni", cov3d, m1,
                      precision=jax.lax.Precision.HIGHEST)
    cov_a = jnp.sum(m0 * c_m0, axis=1) + COV2D_DILATION
    cov_b = jnp.sum(m0 * c_m1, axis=1)
    cov_c = jnp.sum(m1 * c_m1, axis=1) + COV2D_DILATION

    det = cov_a * cov_c - cov_b * cov_b
    det_ok = det > 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conic = jnp.stack([cov_c * inv_det, -cov_b * inv_det, cov_a * inv_det],
                      axis=-1)

    mid = 0.5 * (cov_a + cov_c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # --- color ---
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        dirs = means3d - camera.cam_center
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
        rgb = jnp.maximum(sh_utils.eval_sh(sh_degree, shs, dirs) + 0.5, 0.0)

    # Opacity cull is lossless: alpha = opac*exp(power) <= opac, and the
    # blend skips alpha < 1/255, so rows below that bound contribute
    # exactly zero. Crucially this stops DEAD capacity-padding rows (which
    # the trainer masks via opacity 0 but whose stale geometry still
    # projects) from consuming entry budget and reading as "visible".
    valid = ((depth > NEAR_CULL_Z) & det_ok & (radius_f > 0.0)
             & (opacities >= 1.0 / 255.0))
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return ProjectedGaussians(
        means2d=means2d,
        conic=conic,
        rgb=rgb,
        opacity=opacities,
        depth=depth,
        radius=radius,
        valid=valid,
    )
