"""On-chip A/B: segsum gradient reduction vs scatter-add (round-5).

The gradient scatter is the #1 single op of the 1080p training step
(20.1 ms of 106 in the round-4 ledger, chip_logs/profile_stages2_*).
scatter_mode="segsum" (ops/pallas_blend.segsum_entry_grads) replaces the
RMW scatter-add with a plain scatter to unique generation-stream slots +
one [D_gen,16] cumsum + per-Gaussian boundary diffs.

Gates (same discipline as every numeric rewrite):
  - forward image identical (segsum changes only the backward),
  - full parameter gradient: cosine >= 0.99999 and
    max|diff| <= 1e-4 * max|g| per tensor (f32 summation-order noise --
    the cumsum telescopes a global prefix),
  - step time must WIN.

Also isolates the two reductions standalone on the real bwd stream.

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/ab_segsum.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

from ab_r03 import scene

ITERS = 15


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.train.loop import entry_budgets_for_scene
    from h3dgs_tpu.utils.losses import photometric_loss

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((3, 1080, 1920), 0.4, jnp.float32)
    gen_b, max_b = entry_budgets_for_scene(*params, cam, 3)
    print(f"budgets: gen={gen_b} max={max_b}", flush=True)

    def cfg_at(mode):
        return RasterizeConfig(
            max_entries=max_b, max_per_tile=4096,
            gen_entries=gen_b if gen_b != max_b else 0,
            scatter_mode=mode)

    def make_step(cfg):
        @jax.jit
        def step(p, tgt, salt):
            p = (p[0] + salt,) + p[1:]

            def loss(q):
                out = rasterize(*q, cam, 3, bg, config=cfg)
                return photometric_loss(out["render"], tgt)

            g = jax.grad(loss)(p)
            return sum(jnp.sum(jnp.abs(x)) for x in g)
        return step

    def grads_and_img(cfg):
        @jax.jit
        def f(p):
            def loss(q):
                out = rasterize(*q, cam, 3, bg, config=cfg)
                return (photometric_loss(out["render"], target),
                        out["render"])
            (_, img), g = jax.value_and_grad(loss, has_aux=True)(p)
            return img, g
        img, g = f(params)
        return np.asarray(img), [np.asarray(x) for x in jax.tree.leaves(g)]

    img_a, g_a = grads_and_img(cfg_at("add"))
    img_s, g_s = grads_and_img(cfg_at("segsum"))
    dimg = float(np.abs(img_s - img_a).max())
    ok = dimg == 0.0
    print(f"forward image max|diff| = {dimg:.2e} "
          f"({'OK' if ok else 'FAIL — fwd must be untouched'})",
          flush=True)
    names = ["means", "scales", "quats", "opac", "shs"]
    for nm, a, b in zip(names, g_s, g_a):
        gmax = float(np.abs(b).max()) + 1e-30
        diff = float(np.abs(a - b).max())
        cos = float((a * b).sum()
                    / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30))
        good = cos >= 0.99999 and diff <= 1e-4 * gmax
        ok &= good
        print(f"  grad {nm}: cos={cos:.7f} max|diff|={diff:.3e} "
              f"(max|g|={gmax:.3e}) {'OK' if good else 'FAIL'}",
              flush=True)

    # timing
    for mode in ("add", "segsum", "add"):     # a-b-a to expose drift
        step = make_step(cfg_at(mode))
        float(step(params, target, jnp.float32(0.0)))
        t0 = time.perf_counter()
        outs = [step(params, target, jnp.float32(0.5 + (i + 1) * 1e-7))
                for i in range(ITERS)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"step scatter_mode={mode}: {dt * 1e3:.2f} ms = "
              f"{1920 * 1080 / dt / 1e6:.2f} Mpix/s", flush=True)

    print("RESULT:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
