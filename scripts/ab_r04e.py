"""Round-4e: in-context race of the transposed delta-cumsum binning fill
(binning_fill="cumsum_t": the [D,8] per-entry table pads its minor dim
to a 128-lane tile on TPU — 15/16 of the cumsum's and every column
read's vector work wasted; [8,D] rows are natural full-lane vectors).

Also isolates the binning stage alone for both fills.

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/ab_r04e.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

from ab_r03 import scene, time_cfg


def main(iters=10):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from h3dgs_tpu.ops.binning import bin_gaussians_aligned
    from h3dgs_tpu.ops.projection import project_gaussians
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.train.loop import entry_budgets_for_scene

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()
    gen_b, max_b = entry_budgets_for_scene(*params, cam, 3, quantum=128)
    print(f"budgets: gen={gen_b} aligned={max_b}", flush=True)

    def cfg_for(fill):
        return RasterizeConfig(
            max_entries=max_b, max_per_tile=4096, chunk_e=512,
            quantum=128, gen_entries=gen_b if gen_b != max_b else 0,
            binning_fill=fill)

    # Binning stage alone.
    proj = jax.jit(lambda p: project_gaussians(*p, cam, 3))(params)
    for fill in ("cumsum", "cumsum_t", "gather"):
        def binf(m2d, salt):
            pr = proj._replace(means2d=m2d + salt)
            b = bin_gaussians_aligned(pr, 1080, 1920, max_b, 4096, 128,
                                      fill=fill, gen_entries=gen_b)
            return b.gauss_idx.sum() + b.owner.sum()

        jf = jax.jit(binf)
        ref = float(jf(proj.means2d, jnp.float32(0.0)))
        t0 = time.perf_counter()
        outs = [jf(proj.means2d, jnp.float32(1e-6 * (i + 1)))
                for i in range(iters)]
        float(outs[-1])
        print(f"bin_aligned fill={fill}: "
              f"{(time.perf_counter() - t0) / iters * 1e3:.2f} ms "
              f"(probe {ref:.0f})", flush=True)

    time_cfg(params, cam, cfg_for("cumsum"), 2, "(warmup, ignore)",
             salt0=0.009)
    results = {}
    for i, fill in enumerate(("cumsum", "cumsum_t")):
        dt = time_cfg(params, cam, cfg_for(fill), iters,
                      f"full step fill={fill}", salt0=1e-4 * (i + 1))
        results[fill] = dt
    best = min(results, key=results.get)
    print(f"\nwinner: {best} ({results[best] * 1e3:.2f} ms, "
          f"{1920 * 1080 / results[best] / 1e6:.2f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
