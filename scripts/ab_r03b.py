"""Second round-3 A/B: rows_layout at the promoted defaults.

Grad-gated as ab_r03. Run: PYTHONPATH=. /opt/venv/bin/python scripts/ab_r03b.py
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
    gen_b, budget = entry_budgets_for_scene(*params, cam, 3)
    print(f"budget {budget} gen {gen_b}", flush=True)
    base = RasterizeConfig(max_entries=budget, max_per_tile=4096)
    print(f"base: {base}", flush=True)

    def grads_for(cfg):
        bg = jnp.zeros(3, jnp.float32)
        tgt = jnp.full((3, 1080, 1920), 0.4, jnp.float32)

        @jax.jit
        def g(p):
            def loss(m):
                out = rasterize(m, p[1], p[2], p[3], p[4], cam, 3, bg,
                                config=cfg)
                return photometric_loss(out["render"], tgt)
            return jax.grad(loss)(p[0])
        return np.asarray(g(params))

    g_ref = grads_for(base)
    salt = [0]

    def row(label, cfg):
        try:
            if cfg != base:
                gv = grads_for(cfg)
                ok = np.allclose(gv, g_ref, atol=3e-5, rtol=5e-3)
                print(f"correctness {label}: {'OK' if ok else 'MISMATCH'} "
                      f"maxdiff={np.abs(gv - g_ref).max():.2e}", flush=True)
                if not ok:
                    return
            salt[0] += 1
            time_cfg(params, cam, cfg, iters, label, salt0=1e-4 * salt[0])
        except Exception as ex:
            print(f"{label}: {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)

    row("defaults (E512 cols)", base)
    row("rows_layout", base._replace(rows_layout=True))
    row("E1024/bwd512 cols", base._replace(chunk_e=1024))
    row("E1024/bwd512 rows",
        base._replace(chunk_e=1024, rows_layout=True))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
