"""h3dgs_tpu — a TPU-native framework for hierarchical 3D Gaussian splatting.

A from-scratch JAX/Pallas re-design of the capabilities of
graphdeco-inria/hierarchical-3d-gaussians (see /root/reference): large-scene
reconstruction via chunked 3D Gaussian splatting with a coarse scaffold,
per-chunk training, a level-of-detail Gaussian hierarchy with differentiable
cuts, and granularity-adaptive rendering.

Design stance (TPU-first, not a port):
  * The differentiable rasterizer is a jitted JAX function built from static
    shapes: sort-based tile binning + cumulative-transmittance alpha blending
    (log-space cumsum turns the sequential front-to-back blend into
    VPU/MXU-friendly parallel work), with Pallas kernels for the hot blend.
  * Gaussians live in a fixed-capacity pytree with a validity mask;
    densify/clone/split/prune write into free slots instead of resizing.
  * Multi-chip: pixels/tiles shard over a jax.sharding.Mesh via shard_map,
    Gaussians replicated per chunk, gradients psum'd over ICI.
  * Cross-chunk parallelism stays embarrassingly parallel (process-level),
    like the reference's SLURM+filesystem design.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("H3DGS_PLATFORM"):
    # Force the JAX platform before any computation. A plain JAX_PLATFORMS
    # env var is not enough on hosts whose site hooks register a TPU
    # plugin eagerly (it still dials the accelerator); the config update
    # wins as long as it happens before the first trace. Used by tests
    # and CI to pin subprocess stages (full_train's train/merge children)
    # to CPU.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["H3DGS_PLATFORM"])
