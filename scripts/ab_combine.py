"""On-chip A/B: in-kernel tile accumulation (fwd_accumulate) vs the
segment-sum combine (round-5). The combine marginal is ~4.4 ms of the
1080p step ledger; accumulation removes its [n_quanta,8,P] scatter-add
and replaces it with one [T]-row gather.

Gates: forward image allclose (f32 summation order), transmittance
bit-equal, full-grad cosine, step time must win. a-b-a timing.

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/ab_combine.py
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

    def cfg_at(acc):
        return RasterizeConfig(
            max_entries=max_b, max_per_tile=4096,
            gen_entries=gen_b if gen_b != max_b else 0,
            fwd_accumulate=acc)

    def grads_and_img(cfg):
        @jax.jit
        def f(p):
            def loss(q):
                out = rasterize(*q, cam, 3, bg, config=cfg)
                return (photometric_loss(out["render"], target),
                        out)
            (_, out), g = jax.value_and_grad(loss, has_aux=True)(p)
            return out["render"], out["final_transmittance"], g
        img, tr, g = f(params)
        return (np.asarray(img), np.asarray(tr),
                [np.asarray(x) for x in jax.tree.leaves(g)])

    img_a, tr_a, g_a = grads_and_img(cfg_at(False))
    img_b, tr_b, g_b = grads_and_img(cfg_at(True))
    dimg = float(np.abs(img_b - img_a).max())
    dtr = float(np.abs(tr_b - tr_a).max())
    ok = dimg <= 2e-5 and dtr == 0.0
    print(f"image max|diff|={dimg:.2e} trans max|diff|={dtr:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    names = ["means", "scales", "quats", "opac", "shs"]
    for nm, a, b in zip(names, g_b, g_a):
        gmax = float(np.abs(b).max()) + 1e-30
        diff = float(np.abs(a - b).max())
        cos = float((a * b).sum()
                    / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30))
        good = cos >= 0.999999 and diff <= 1e-4 * gmax
        ok &= good
        print(f"  grad {nm}: cos={cos:.8f} max|diff|={diff:.2e} "
              f"{'OK' if good else 'FAIL'}", flush=True)

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

    for acc in (False, True, False):
        step = make_step(cfg_at(acc))
        float(step(params, target, jnp.float32(0.0)))
        t0 = time.perf_counter()
        outs = [step(params, target, jnp.float32(0.5 + (i + 1) * 1e-7))
                for i in range(ITERS)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"step fwd_accumulate={acc}: {dt * 1e3:.2f} ms = "
              f"{1920 * 1080 / dt / 1e6:.2f} Mpix/s", flush=True)

    print("RESULT:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
