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

import jax.numpy as jnp

from ..scene.camera import Camera
from ..utils import sh as sh_utils
from ..utils import transforms

# Matches the CUDA rasterizer family: splats closer than this are culled.
NEAR_CULL_Z = 0.2
# Low-pass dilation added to the projected 2D covariance diagonal (pixels^2).
COV2D_DILATION = 0.3


def _eval_sh_components(degree: int, sh: jnp.ndarray, x, y, z):
    """eval_sh on decomposed [N] direction components.

    Same basis table/order as utils.sh.eval_sh (reference
    utils/sh_utils.py:57-112), but coefficients are read from a [3K, N]
    transpose so every multiply-add runs on full-lane [N] vectors instead
    of [N, 3] stripes. Returns [N, 3]."""
    if not (0 <= degree <= 4):
        raise ValueError(f"unsupported SH degree {degree}")
    n, k, _ = sh.shape
    sht = sh.reshape(n, k * 3).T                       # [3K, N] one relayout

    C0, C1 = sh_utils.SH_C0, sh_utils.SH_C1
    C2, C3, C4 = sh_utils.SH_C2, sh_utils.SH_C3, sh_utils.SH_C4
    basis = [C0]
    if degree >= 1:
        basis += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                  C2[3] * xz, C2[4] * (xx - yy)]
    if degree >= 3:
        basis += [C3[0] * y * (3.0 * xx - yy), C3[1] * xy * z,
                  C3[2] * y * (4.0 * zz - xx - yy),
                  C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                  C3[4] * x * (4.0 * zz - xx - yy),
                  C3[5] * z * (xx - yy), C3[6] * x * (xx - 3.0 * yy)]
    if degree >= 4:
        basis += [C4[0] * xy * (xx - yy), C4[1] * yz * (3.0 * xx - yy),
                  C4[2] * xy * (7.0 * zz - 1.0),
                  C4[3] * yz * (7.0 * zz - 3.0),
                  C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
                  C4[5] * xz * (7.0 * zz - 3.0),
                  C4[6] * (xx - yy) * (7.0 * zz - 1.0),
                  C4[7] * xz * (xx - 3.0 * yy),
                  C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy))]
    chans = []
    for c in range(3):
        acc = basis[0] * sht[c]
        for i in range(1, len(basis)):
            acc = acc + basis[i] * sht[3 * i + c]
        chans.append(acc)
    return jnp.stack(chans, axis=-1)


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
    # TPU layout note: everything below is written as per-COMPONENT [N]
    # vector math (x, y, z as separate arrays) instead of [N,3]/[N,3,3]
    # matmuls/einsums. A [N,3] elementwise op uses 3 of 128 VPU lanes and
    # a [N,3]x[3,3] contraction 3 of 128 MXU columns; decomposed [N]
    # arrays tile the full 8x128 vregs and XLA fuses the whole stage into
    # a handful of dense VPU loops (measured ~4x on v5e at N=200k).
    means3d = jnp.asarray(means3d)
    scales = jnp.asarray(scales)
    quats = jnp.asarray(quats)
    opacities = jnp.asarray(opacities)
    shs = jnp.asarray(shs)
    view = jnp.asarray(camera.view)
    w_rot = view[:3, :3]

    x3 = means3d[:, 0]
    y3 = means3d[:, 1]
    z3 = means3d[:, 2]

    def affine3(row):
        return row[0] * x3 + row[1] * y3 + row[2] * z3 + row[3]

    # --- view/clip transforms ---
    pvx = affine3(view[0])
    pvy = affine3(view[1])
    depth = affine3(view[2])

    fp = camera.full_proj
    hx = affine3(fp[0])
    hy = affine3(fp[1])
    hw = affine3(fp[3])
    inv_w = 1.0 / (hw + 1e-7)
    size = jnp.asarray([camera.width, camera.height], dtype=means3d.dtype)
    m2x = ((hx * inv_w + 1.0) * size[0] - 1.0) * 0.5
    m2y = ((hy * inv_w + 1.0) * size[1] - 1.0) * 0.5
    means2d = jnp.stack([m2x, m2y], axis=-1)

    # --- EWA covariance projection ---
    # 6 packed cov3d components (xx, xy, xz, yy, yz, zz) as [N] arrays.
    if cov3d_precomp is not None:
        cov6 = tuple(cov3d_precomp[:, i] for i in range(6))
    else:
        q = transforms.normalize_quat(quats)
        qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        r00 = 1 - 2 * (qy * qy + qz * qz)
        r01 = 2 * (qx * qy - qw * qz)
        r02 = 2 * (qx * qz + qw * qy)
        r10 = 2 * (qx * qy + qw * qz)
        r11 = 1 - 2 * (qx * qx + qz * qz)
        r12 = 2 * (qy * qz - qw * qx)
        r20 = 2 * (qx * qz - qw * qy)
        r21 = 2 * (qy * qz + qw * qx)
        r22 = 1 - 2 * (qx * qx + qy * qy)
        s0 = scale_modifier * scales[:, 0]
        s1 = scale_modifier * scales[:, 1]
        s2 = scale_modifier * scales[:, 2]
        # Sigma = (R S)(R S)^T with S = diag(s): L[i][k] = R[i][k] s_k.
        l00, l01, l02 = r00 * s0, r01 * s1, r02 * s2
        l10, l11, l12 = r10 * s0, r11 * s1, r12 * s2
        l20, l21, l22 = r20 * s0, r21 * s1, r22 * s2
        cov6 = (l00 * l00 + l01 * l01 + l02 * l02,
                l00 * l10 + l01 * l11 + l02 * l12,
                l00 * l20 + l01 * l21 + l02 * l22,
                l10 * l10 + l11 * l11 + l12 * l12,
                l10 * l20 + l11 * l21 + l12 * l22,
                l20 * l20 + l21 * l21 + l22 * l22)
    cxx, cxy, cxz, cyy, cyz, czz = cov6

    fx = camera.focal_x
    fy = camera.focal_y
    limx = 1.3 * camera.tanfovx
    limy = 1.3 * camera.tanfovy
    z = depth
    tx = jnp.clip(pvx / z, -limx, limx) * z
    ty = jnp.clip(pvy / z, -limy, limy) * z

    # J is the 2x3 Jacobian of the perspective projection at (tx, ty, z).
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # M = J @ W_rot : two [N]-component row vectors.
    m0x = j00 * w_rot[0, 0] + j02 * w_rot[2, 0]
    m0y = j00 * w_rot[0, 1] + j02 * w_rot[2, 1]
    m0z = j00 * w_rot[0, 2] + j02 * w_rot[2, 2]
    m1x = j11 * w_rot[1, 0] + j12 * w_rot[2, 0]
    m1y = j11 * w_rot[1, 1] + j12 * w_rot[2, 1]
    m1z = j11 * w_rot[1, 2] + j12 * w_rot[2, 2]
    # cov2d = M @ cov3d @ M^T (symmetric 2x2).
    cm0x = cxx * m0x + cxy * m0y + cxz * m0z
    cm0y = cxy * m0x + cyy * m0y + cyz * m0z
    cm0z = cxz * m0x + cyz * m0y + czz * m0z
    cm1x = cxx * m1x + cxy * m1y + cxz * m1z
    cm1y = cxy * m1x + cyy * m1y + cyz * m1z
    cm1z = cxz * m1x + cyz * m1y + czz * m1z
    cov_a = m0x * cm0x + m0y * cm0y + m0z * cm0z + COV2D_DILATION
    cov_b = m0x * cm1x + m0y * cm1y + m0z * cm1z
    cov_c = m1x * cm1x + m1y * cm1y + m1z * cm1z + COV2D_DILATION

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
        dx = x3 - camera.cam_center[0]
        dy = y3 - camera.cam_center[1]
        dz = z3 - camera.cam_center[2]
        inv_n = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz).clip(1e-12)
        rgb = jnp.maximum(
            _eval_sh_components(sh_degree, shs,
                                dx * inv_n, dy * inv_n, dz * inv_n) + 0.5,
            0.0)

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
