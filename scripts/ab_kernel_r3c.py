"""Focused A/B: did the 2026-08-19 kernel-pass reductions regress the bwd?

Times grad-of-blend at the 1080p/200k bench point (same construction as
ab_r03b's "defaults (E512 cols)" row, measured 111.79 ms pre-change) and
the fwd alone, under the current code. Compare against the pre-change
numbers in chip_logs/ab_r03b_20260819T103728Z.log.

Run: PYTHONPATH=.:scripts /opt/venv/bin/python scripts/ab_kernel_r3c.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main(iters=8):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.utils.losses import photometric_loss
    from h3dgs_tpu.utils.sh import rgb_to_sh

    print("backend:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    n = 200_000
    means = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.03),
                                (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    shs[:, 1:] = rng.normal(0, 0.05, (n, 15, 3))
    cam = look_at_camera(eye=(0.0, -1.0, -6.0), target=(0, 0, 0), fovx=1.2,
                         width=1920, height=1080)
    params = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, shs))
    bg = jnp.zeros(3, jnp.float32)
    tgt = jnp.full((3, 1080, 1920), 0.4, jnp.float32)
    base = RasterizeConfig(max_entries=1 << 21, max_per_tile=4096,
                           chunk_e=512, quantum=128)

    def timeit(fn, label, salt0):
        j = jax.jit(fn)
        float(j(jnp.float32(0.0)))
        t0 = time.perf_counter()
        outs = [j(jnp.float32(salt0 + (i + 1) * 1e-7)) for i in range(iters)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:32s} {dt * 1e3:8.2f} ms", flush=True)

    def fwd(salt):
        out = rasterize(params[0] + salt, *params[1:], cam, 3, bg,
                        config=base)
        return jnp.sum(out["render"])

    def fwdbwd(salt):
        def loss(m):
            out = rasterize(m, *params[1:], cam, 3, bg, config=base)
            return photometric_loss(out["render"], tgt)
        return jnp.sum(jnp.abs(jax.grad(loss)(params[0] + salt)))

    timeit(fwd, "full fwd (E512)", 0.01)
    timeit(fwdbwd, "full fwd+bwd (E512)", 0.02)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
