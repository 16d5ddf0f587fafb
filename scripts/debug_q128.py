"""Bisect the Q=128 exact-budget anomaly (ab_r04/ab_r04b: 1313-1366 ms
for the full step at max_entries=1531904 while Q=64 at 1329152 runs
105 ms and round-3 ran Q=128 at 2097152 in ~116 ms).

Times the full step and isolated stages at several budgets.
Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/debug_q128.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

from ab_r03 import scene, time_cfg


def main(iters=6):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from h3dgs_tpu.ops.binning import bin_gaussians_aligned
    from h3dgs_tpu.ops.projection import project_gaussians
    from h3dgs_tpu.ops.rasterize import RasterizeConfig

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()

    # Full-step timings across budgets x quantum.
    for q, budget in ((128, 2097152), (128, 1531904), (128, 1536000),
                      (128, 1572864), (64, 1531904), (128, 1540096)):
        if budget % 512:
            continue
        cfg = RasterizeConfig(max_entries=budget, max_per_tile=4096,
                              chunk_e=512, quantum=q)
        try:
            time_cfg(params, cam, cfg, iters, f"step Q={q} D={budget}",
                     salt0=1e-4 * budget % 1e-2)
        except Exception as ex:
            print(f"Q={q} D={budget}: {type(ex).__name__}: "
                  f"{str(ex)[:120]}", flush=True)

    # Stage isolation at the anomalous point.
    proj = jax.jit(lambda p: project_gaussians(*p, cam, 3))(params)
    for q, budget in ((128, 1531904), (128, 2097152), (64, 1329152)):
        def binf(ms, salt):
            pr = proj._replace(means2d=proj.means2d + salt)
            b = bin_gaussians_aligned(pr, 1080, 1920, budget, 4096, q)
            return b.gauss_idx.sum() + b.owner.sum()

        jf = jax.jit(binf)
        out = jf(params[0], jnp.float32(0.0))
        out.block_until_ready()
        t0 = time.perf_counter()
        outs = [jf(params[0], jnp.float32(1e-6 * (i + 1)))
                for i in range(iters)]
        float(outs[-1])
        print(f"bin_aligned Q={q} D={budget}: "
              f"{(time.perf_counter() - t0) / iters * 1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
