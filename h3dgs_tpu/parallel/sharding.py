"""Device mesh construction and sharding helpers.

The TPU replacement for the reference's parallelism inventory (SURVEY.md
§2.3): within one training/render step, pixels/tiles shard over the mesh's
"tile" axis and a batch of views shards over "data"; Gaussians are
replicated per chunk and parameter gradients are psum'd over ICI by XLA's
SPMD partitioner. Across chunks the design stays embarrassingly parallel at
the process level (scripts/full_train.py equivalent), like the reference's
SLURM+filesystem pattern — DCN carries only control-plane traffic.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

DATA_AXIS = "data"
TILE_AXIS = "tile"


def make_mesh(n_data: int = 1, n_tile: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """A (data, tile) mesh. n_tile defaults to all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_tile is None:
        if len(devices) % n_data:
            raise ValueError(f"{len(devices)} devices not divisible by "
                             f"data={n_data}")
        n_tile = len(devices) // n_data
    if n_data * n_tile > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_tile} tile) needs "
            f"{n_data * n_tile} devices but only {len(devices)} are "
            f"available (CPU emulation: set XLA_FLAGS="
            f"--xla_force_host_platform_device_count=N)")
    use = np.array(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(use, (DATA_AXIS, TILE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
