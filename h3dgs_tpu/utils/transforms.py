"""Quaternion / covariance helpers (jit-friendly, vectorized).

Semantics match the reference's parameterization (cf. /root/reference/utils/
general_utils.py:82-114 and scene/gaussian_model.py:29-44): a Gaussian's 3D
covariance is ``Sigma = R S S^T R^T`` where ``S = diag(scales)`` and ``R`` is
the rotation of a (w, x, y, z) quaternion normalized at use time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize [..., 4] (w, x, y, z) quaternions."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / norm


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) quaternion -> [..., 3, 3] rotation.

    Quaternions are normalized internally (general_utils.py:82-103).
    """
    q = normalize_quat(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance_from_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray,
                                     scale_modifier: float = 1.0) -> jnp.ndarray:
    """[..., 3] activated scales + [..., 4] quats -> [..., 3, 3] covariance."""
    R = quat_to_rotmat(quats)
    L = R * (scale_modifier * scales)[..., None, :]  # R @ diag(s)
    # Pin f32: the TPU MXU would otherwise round to bf16 and distort
    # the projected footprint.
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] upper-triangular packing.

    Order (xx, xy, xz, yy, yz, zz) matches the reference's packed covariance
    (general_utils.py:68-77).
    """
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
                      cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


def unstrip_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] packed -> [..., 3, 3] symmetric covariance."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))
