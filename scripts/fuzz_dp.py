"""Randomized equality fuzz: shard_map data-parallel step vs the vmapped
SPMD step on an 8-virtual-device CPU mesh.

Shapes are fixed (both steps compile once); every trial randomizes the
VALUES — Gaussian parameters, cameras' targets, exposure, GT images —
so hundreds of trials cost one compile. Catches sharding/collective
edge cases the fixed-seed test (tests/test_dp_step.py) cannot walk:
e.g. views where a shard sees zero visible Gaussians.

Run: /opt/venv/bin/python scripts/fuzz_dp.py [minutes]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")


def main(minutes: float = 20.0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from h3dgs_tpu.config import OptimizationConfig
    from h3dgs_tpu.model import state as S
    from h3dgs_tpu.ops import adam as A
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.parallel import sharding as shard_lib
    from h3dgs_tpu.parallel.step import (make_dp_train_step,
                                         make_parallel_train_step)
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.train.step import ViewBatch
    from h3dgs_tpu.utils.sh import rgb_to_sh

    raster = RasterizeConfig(max_entries=1 << 13, max_per_tile=128,
                             chunk=16, backend="xla")
    b, n, h, w, cap = 8, 48, 32, 32, 64
    mesh = shard_lib.make_mesh(n_data=8, n_tile=1)
    opt_cfg = OptimizationConfig(iterations=10)
    kw = dict(use_depth_loss=True, use_exposure=True, skybox_locked=False,
              skip_shrink=False)
    step_vm = make_parallel_train_step(opt_cfg, raster, shard_tiles=False,
                                       **kw)
    step_dp = make_dp_train_step(opt_cfg, raster, mesh, **kw)

    cams = [look_at_camera(eye=(3 * np.sin(a), -0.4, -3 * np.cos(a)),
                           target=(0, 0, 0), fovx=1.1, width=w, height=h)
            for a in np.linspace(0, 2 * np.pi, b, endpoint=False)]
    cam_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    bg = jnp.zeros(3, jnp.float32)

    def scene(seed):
        rng = np.random.default_rng(seed)
        # "spread" occasionally pushes most Gaussians out of some views —
        # the zero-visible-shard regime.
        spread = rng.choice([0.5, 1.0, 3.0])
        st = S.from_arrays(
            xyz=rng.uniform(-spread, spread, (n, 3)).astype(np.float32),
            features_dc=rgb_to_sh(rng.uniform(0.1, 0.9,
                                              (n, 1, 3))).astype(np.float32),
            features_rest=np.zeros((n, 15, 3), np.float32),
            opacity=rng.uniform(0.1, 0.9, (n, 1)).astype(np.float32),
            scaling=np.log(rng.uniform(0.05, 0.3,
                                       (n, 3))).astype(np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
            capacity=cap, max_sh_degree=0)
        batch = ViewBatch(
            camera=cam_batch,
            gt_image=jnp.asarray(rng.uniform(0, 1, (b, 3, h, w)),
                                 jnp.float32),
            alpha_mask=jnp.ones((b, 1, h, w)),
            invdepth=jnp.asarray(rng.uniform(0, 1, (b, 1, h, w)),
                                 jnp.float32),
            depth_mask=jnp.ones((b, 1, h, w)),
            depth_reliable=jnp.asarray(rng.integers(0, 2, b), bool),
            image_idx=jnp.arange(b, dtype=jnp.int32))
        exposure = jnp.asarray(
            np.tile(np.eye(3, 4, dtype=np.float32)[None], (b, 1, 1))
            + rng.normal(0, 0.01, (b, 3, 4)).astype(np.float32))
        return st, batch, exposure

    args = (jnp.asarray(1.0), bg, jnp.asarray(1.0), jnp.asarray(3.0), 0)
    deadline = time.time() + minutes * 60
    seed = int(time.time()) % 100000 + 900000
    trials = failures = 0
    with jax.set_mesh(mesh):
        while time.time() < deadline:
            st, batch, exposure = scene(seed)
            b_sh = jax.device_put(batch, shard_lib.data_sharded(mesh))

            def fresh():
                return (jax.tree.map(jnp.copy, st),
                        A.init(st.trainable_dict()), jnp.copy(exposure),
                        A.init({"exposure": exposure}))

            out_vm = step_vm(*fresh(), b_sh, *args)
            out_dp = step_dp(*fresh(), b_sh, *args)
            bad = []
            if not np.allclose(float(out_dp.photo_loss),
                               float(out_vm.photo_loss), rtol=1e-5):
                bad.append("photo_loss")
            for k in ("xyz", "scaling", "opacity", "rotation"):
                a_ = np.asarray(getattr(out_dp.state, k))
                b_ = np.asarray(getattr(out_vm.state, k))
                if not np.allclose(a_, b_, rtol=1e-5, atol=1e-7):
                    bad.append(k)
            trials += 1
            if bad:
                failures += 1
                print(f"DP MISMATCH {bad} seed={seed}", flush=True)
            if trials % 25 == 0:
                print(f"[{trials} trials, {failures} failures]",
                      flush=True)
            seed += 1
    print(f"DONE: {trials} trials, {failures} failures", flush=True)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(float(sys.argv[1]) if len(sys.argv) > 1 else 20)
             else 0)
