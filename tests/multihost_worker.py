"""Subprocess worker for test_multihost: one emulated host of a
multi-process CPU run. Spawned with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=<d> in the environment
(set before interpreter start — this container's sitecustomize imports
jax eagerly)."""
import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--data_devices", type=int, required=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from h3dgs_tpu.parallel import multihost
    multihost.initialize(coordinator=f"localhost:{args.port}",
                         num_processes=args.nproc, process_id=args.pid)
    assert jax.process_count() == args.nproc

    import numpy as np

    from h3dgs_tpu.config import (FullConfig, ModelConfig,
                                  OptimizationConfig, RuntimeConfig)
    from h3dgs_tpu.scene.scene import Scene
    from h3dgs_tpu.train.loop import train_flat

    cfg = FullConfig(
        model=ModelConfig(source_path=args.scene,
                          model_path=args.out + f".model{args.pid}",
                          resolution=1),
        opt=OptimizationConfig(iterations=args.iters,
                               densify_from_iter=10**9,
                               densify_until_iter=0,
                               opacity_reset_interval=10**9,
                               position_lr_max_steps=args.iters),
        runtime=RuntimeConfig(max_entries=1 << 14, max_per_tile=256,
                              blend_chunk=16, capacity_factor=2.0,
                              data_devices=args.data_devices,
                              views_per_step=args.data_devices))
    scene = Scene(cfg.model, cfg.runtime)
    state, _exp = train_flat(cfg, scene, coarse=False)
    if multihost.is_primary():
        np.savez(args.out, xyz=np.asarray(state.xyz),
                 opacity=np.asarray(state.opacity))
    multihost.barrier("done")
    print(f"worker {args.pid} done", flush=True)


if __name__ == "__main__":
    main()
