"""Multi-host runtime: jax.distributed bootstrap + host-role helpers.

SURVEY.md §5 "Distributed communication backend": a multi-host TPU slice
runs one copy of this program per host. ``initialize()`` wires the
coordination service (auto-detecting SLURM/GKE via jax's cluster
detection, or explicit coordinator/process args / env vars), after which
``jax.devices()`` is the *global* device set, meshes built from it span
hosts, and the SPMD partitioner routes collectives over ICI (DCN only at
the mesh's outermost axis). This replaces the reference's
one-chunk-per-GPU SLURM mapping (/root/reference/scripts/full_train.py:8-26)
with true in-step multi-host data parallelism; chunk-level parallelism
remains process-level on top (cli/full_train.py).

Artifact IO (checkpoints, point clouds, cfg_args) must happen on exactly
one host: guard with ``is_primary()`` / ``primary_only``.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax

# Env-var bootstrap (used when not under SLURM/GKE auto-detection):
ENV_COORD = "H3DGS_COORDINATOR"      # e.g. "10.0.0.1:8476"
ENV_NPROC = "H3DGS_NUM_PROCESSES"
ENV_PID = "H3DGS_PROCESS_ID"

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed bootstrap.

    Resolution order: explicit args > H3DGS_* env vars > jax cluster
    auto-detection (SLURM, GKE/TPU pod metadata). A plain single-process
    run (no args, no env, no cluster) is a no-op, so CLIs can call this
    unconditionally.
    """
    global _initialized
    if _initialized:
        return
    coordinator = coordinator or os.environ.get(ENV_COORD)
    if num_processes is None and os.environ.get(ENV_NPROC):
        num_processes = int(os.environ[ENV_NPROC])
    if process_id is None and os.environ.get(ENV_PID):
        process_id = int(os.environ[ENV_PID])
    # Auto-detect only when there is evidence of MORE THAN ONE worker:
    # single-host TPU containers routinely export
    # TPU_WORKER_HOSTNAMES=localhost, and a 1-task SLURM job needs no
    # coordination service.
    multi_slurm = (os.environ.get("SLURM_JOB_ID")
                   and int(os.environ.get("SLURM_NTASKS", "1")) > 1)
    multi_tpu = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if coordinator is None and not (multi_slurm or multi_tpu):
        return  # single-process
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the host that owns artifact writes (process 0)."""
    return jax.process_index() == 0


def primary_only(fn):
    """Run fn on process 0 only; other hosts get None."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_primary():
            return fn(*args, **kwargs)
        return None
    return wrapper


def barrier(name: str = "h3dgs") -> None:
    """Block until every process reaches this point (no-op single-host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def global_batch(local_batch, sharding):
    """Assemble a globally-sharded array tree from per-process local data.

    Each process supplies its local shard (leading axis = its slice of the
    global batch); the result is one jax.Array tree sharded by
    ``sharding`` whose addressable shards are exactly the local data —
    no cross-host transfer happens here.
    """
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
