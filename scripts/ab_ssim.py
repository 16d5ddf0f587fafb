"""On-chip A/B gate for the fused Pallas SSIM kernel (ops/pallas_ssim)
vs the XLA blur-chain formulation (utils/losses.photometric_loss).

Promotion discipline (README: nothing gets promoted to the defaults on
speed alone): the kernel was committed in round 4 with interpret-mode
CPU tests only; this script is the missing hardware evidence (advisor
r4 medium finding). Per resolution it checks, in ONE process on the
real chip:

  1. loss value  |fused - xla| <= 5e-6
  2. full gradient w.r.t. pred: cosine >= 1 - 1e-9 and
     max|diff| <= 1e-5 * max|g_xla|
  3. timing: fused fwd+bwd vs XLA fwd+bwd, and the loss-only variant
     (with_grad=False kernel) vs XLA forward.
  4. an end-to-end 1080p rasterize train step (the bench workload)
     timed with fused=False/True.

Exit code 1 if any correctness gate fails.

Run: PYTHONPATH=.:scripts python scripts/ab_ssim.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

RES = [(544, 968), (1080, 1920)]   # small first: fast signal if it wedges
ITERS = 30


def timeit(fn, *args, iters=ITERS):
    # Warm with real value round-trips (axon: block_until_ready can
    # return while the compile is still in flight; see ab_r03.time_cfg).
    for _ in range(3):
        r = fn(*args)
        leaf = r[0] if isinstance(r, tuple) else r
        float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax_block(r)
    return (time.perf_counter() - t0) / iters * 1e3


def jax_block(x):
    import jax
    return jax.block_until_ready(x)


def main():
    import faulthandler
    import signal
    faulthandler.enable(all_threads=True)
    if hasattr(signal, "SIGUSR1"):
        faulthandler.register(signal.SIGUSR1, all_threads=True)
    # Watchdog: dump all stacks if a single stage wedges (the axon remote
    # compile has been observed to hang without error).
    faulthandler.dump_traceback_later(600, repeat=True)

    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from h3dgs_tpu.ops.pallas_ssim import fused_photometric_loss
    from h3dgs_tpu.utils.losses import photometric_loss

    print("backend:", jax.devices()[0].device_kind, flush=True)
    ok = True
    for h, w in RES:
        rng = np.random.default_rng(h)
        x = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))

        @jax.jit
        def f_xla(a, b):
            return jax.value_and_grad(
                lambda p: photometric_loss(p, b, fused=False))(a)

        @jax.jit
        def f_fused(a, b):
            return jax.value_and_grad(
                lambda p: fused_photometric_loss(p, b))(a)

        @jax.jit
        def v_xla(a, b):
            return photometric_loss(a, b, fused=False)

        @jax.jit
        def v_fused(a, b):
            return fused_photometric_loss(a, b)

        print(f"[{h}x{w}] compiling xla...", flush=True)
        l_ref, g_ref = f_xla(x, y)
        float(l_ref)
        print(f"[{h}x{w}] compiling fused...", flush=True)
        l_f, g_f = f_fused(x, y)
        float(l_f)
        l_ref, l_f = float(l_ref), float(l_f)
        g_ref = np.asarray(g_ref)
        g_f = np.asarray(g_f)
        dl = abs(l_f - l_ref)
        cos = float((g_ref * g_f).sum()
                    / max(np.linalg.norm(g_ref) * np.linalg.norm(g_f),
                          1e-30))
        gmax = float(np.abs(g_ref).max())
        gdiff = float(np.abs(g_f - g_ref).max())
        lv_x = float(v_xla(x, y))
        lv_f = float(v_fused(x, y))
        good = (dl <= 5e-6 and cos >= 1 - 1e-9 and gdiff <= 1e-5 * gmax
                and abs(lv_f - lv_x) <= 5e-6)
        ok &= good
        print(f"[{h}x{w}] loss xla={l_ref:.7f} fused={l_f:.7f} "
              f"dl={dl:.2e} grad_cos={cos:.9f} "
              f"gdiff={gdiff:.2e} (max|g|={gmax:.2e}) "
              f"{'OK' if good else 'FAIL'}", flush=True)

        t_xla = timeit(f_xla, x, y)
        t_fused = timeit(f_fused, x, y)
        tv_xla = timeit(v_xla, x, y)
        tv_fused = timeit(v_fused, x, y)
        print(f"[{h}x{w}] fwd+bwd: xla={t_xla:.2f} ms "
              f"fused={t_fused:.2f} ms ({t_xla / t_fused:.2f}x)  "
              f"loss-only: xla={tv_xla:.2f} ms fused={tv_fused:.2f} ms "
              f"({tv_xla / tv_fused:.2f}x)", flush=True)

    # End-to-end bench-workload step (1080p rasterize + loss), both paths.
    from ab_r03 import scene
    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.train.loop import entry_budgets_for_scene

    params, cam = scene()
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((3, 1080, 1920), 0.4, jnp.float32)
    gen_b, max_b = entry_budgets_for_scene(*params, cam, 3)
    cfg = RasterizeConfig(max_entries=max_b, max_per_tile=4096,
                          gen_entries=gen_b if gen_b != max_b else 0)
    print(f"step budgets: gen={gen_b} max={max_b}", flush=True)

    def make_step(fused):
        @jax.jit
        def step(p, tgt, eps):
            means, scales, quats, opac, shs = p
            means = means + eps

            def loss(m):
                out = rasterize(m, scales, quats, opac, shs, cam, 3, bg,
                                config=cfg)
                if fused:
                    return fused_photometric_loss(out["render"], tgt)
                return photometric_loss(out["render"], tgt, fused=False)

            l, g = jax.value_and_grad(loss)(means)
            return l + jnp.sum(g * 1e-12)
        return step

    z = jnp.float32(0.0)
    for fused in (False, True):
        step = make_step(fused)
        float(step(params, target, z))
        t0 = time.perf_counter()
        for _ in range(20):
            r = step(params, target, z)
        jax_block(r)
        dt = (time.perf_counter() - t0) / 20 * 1e3
        mpix = 1080 * 1920 / (dt * 1e-3) / 1e6
        print(f"step fused={fused}: {dt:.2f} ms = {mpix:.2f} Mpix/s",
              flush=True)

    print("RESULT:", "PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
