"""3-nearest-neighbor mean squared distance for scale initialization.

Replaces simple_knn's ``distCUDA2`` (/root/reference/scene/gaussian_model.py
:21,190-194): for every point, the mean squared distance to its 3 nearest
neighbors. Used once at model init, so a host-side KD-tree is the pragmatic
default; a chunked brute-force JAX version is provided for on-device use
(O(N^2) flops, fine on TPU up to a few hundred K points).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mean_knn_dist2_host(xyz: np.ndarray, k: int = 3) -> np.ndarray:
    """[N,3] -> [N] mean squared distance to k nearest neighbors (scipy)."""
    from scipy.spatial import cKDTree

    xyz = np.asarray(xyz, np.float32)
    tree = cKDTree(xyz)
    # k+1 because the query point itself is its own 0-distance neighbor.
    dist, _ = tree.query(xyz, k=k + 1, workers=-1)
    return np.mean(dist[:, 1:] ** 2, axis=1).astype(np.float32)


def mean_knn_dist2_jax(xyz: jax.Array, k: int = 3,
                       chunk: int = 1024) -> jax.Array:
    """On-device chunked brute-force k-NN mean squared distance."""
    xyz = jnp.asarray(xyz, jnp.float32)
    n = xyz.shape[0]
    pad = (-n) % chunk
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)), constant_values=jnp.inf)

    def body(block):
        # [B, N] squared distances; self-distance removed by taking k+1.
        d2 = jnp.sum((block[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        return jnp.mean(-neg_top[:, 1:], axis=1)

    blocks = xyz_p.reshape(-1, chunk, 3)
    out = jax.lax.map(body, blocks).reshape(-1)
    return out[:n]
