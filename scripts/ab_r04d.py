"""Round-4d: re-race sub-128 quanta after the tafter/emit_dead
vectorization (masked [P,128] block reduces replace the 2-passes-per-
quantum loop that cost Q=64 ~+20 ms at S=8 — SOL.md round-4 fact 9).

Each quantum races at ITS OWN exact split budgets (the aligned stream
shrinks with Q: measured 1 531 904 / 1 329 152 / 1 222 656 at
Q=128/64/32). The kernel math is bit-exact across quanta/tafter modes,
so probe values must agree exactly — a mismatch flags a miscompile.

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/ab_r04d.py
"""
from __future__ import annotations

import sys

import numpy as np

from ab_r03 import scene, time_cfg


def main(iters=10):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.train.loop import entry_budgets_for_scene

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()

    budgets = {}
    for q in (128, 64, 32):
        gen_b, max_b = entry_budgets_for_scene(*params, cam, 3, quantum=q)
        budgets[q] = (gen_b, max_b)
        print(f"Q={q}: gen={gen_b} aligned={max_b}", flush=True)

    def cfg_for(q, tafter):
        gen_b, max_b = budgets[q]
        return RasterizeConfig(
            max_entries=max_b, max_per_tile=4096, chunk_e=512, quantum=q,
            gen_entries=gen_b if gen_b != max_b else 0,
            tafter_mode=tafter)

    # Warmup row absorbs backend init/compile tail.
    time_cfg(params, cam, cfg_for(128, "batched"), 2, "(warmup, ignore)",
             salt0=0.009)

    rows = [
        ("Q128 batched (default)", cfg_for(128, "batched")),
        ("Q64 batched", cfg_for(64, "batched")),
        ("Q64 loop", cfg_for(64, "loop")),
        ("Q32 batched", cfg_for(32, "batched")),
    ]
    results = {}
    for i, (label, cfg) in enumerate(rows):
        try:
            dt = time_cfg(params, cam, cfg, iters, label,
                          salt0=1e-4 * (i + 1))
            results[label] = dt
        except Exception as ex:
            print(f"{label}: {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)
    if results:
        best = min(results, key=results.get)
        dt = results[best]
        print(f"\nwinner: {best} ({dt * 1e3:.2f} ms, "
              f"{1920 * 1080 / dt / 1e6:.2f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
