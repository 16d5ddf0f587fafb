"""Round-4 final promotion race: Q=128 exact budgets, split vs unsplit,
width/layout variants — all lossless, clean scalar-fetch warm syncs.

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/ab_r04c.py
"""
from __future__ import annotations

import sys

import numpy as np

from ab_r03 import scene, time_cfg


def main(iters=10):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.train.loop import entry_budgets_for_scene
    from h3dgs_tpu.utils.losses import photometric_loss

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()
    gen_b, max_b = entry_budgets_for_scene(*params, cam, 3, quantum=128)
    print(f"budgets: gen={gen_b} aligned={max_b}", flush=True)

    base = RasterizeConfig(max_entries=max_b, max_per_tile=4096,
                           chunk_e=512, quantum=128)
    split = base._replace(gen_entries=gen_b)

    # Throwaway timing first: absorbs any backend init/compile tail so
    # the first real row is clean.
    time_cfg(params, cam, base, 2, "(warmup, ignore)", salt0=0.009)

    results = {}

    def row(label, cfg):
        try:
            dt = time_cfg(params, cam, cfg, iters, label,
                          salt0=1e-4 * (len(results) + 1))
            results[label] = (dt, cfg)
        except Exception as ex:
            print(f"{label}: {type(ex).__name__}: {str(ex)[:120]}",
                  flush=True)

    row("Q128 exact unsplit", base)
    row("Q128 exact split", split)
    row("split E1024/bwd512", split._replace(chunk_e=1024,
                                             bwd_chunk_e=512))
    row("split rows_layout", split._replace(rows_layout=True))
    row("split bwd=auto", split._replace(bwd_entries=None))
    best_label = min(results, key=lambda k: results[k][0])
    dt, best = results[best_label]
    print(f"\nwinner: {best_label} ({dt * 1e3:.2f} ms, "
          f"{1920 * 1080 / dt / 1e6:.2f} Mpix/s)", flush=True)
    print(f"config: {best}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
