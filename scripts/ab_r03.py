"""Round-3 on-chip A/B: glue levers at HONEST per-config budgets.

Races the bench.py workload (1080p fwd+bwd, 200k Gaussians, bench scene)
across the round-3 glue levers:
  - sort_mode: rank (keyless i32 (tile<<RB|depth-rank) sort) vs 2key
  - binning_fill: gather vs cumsum
  - quantum 128 vs 256 — each at the budget the trainer would actually
    give it (entry_budget_for_scene probes at the config's quantum; the
    r2 A/B raced Q=256 at a Q=128-sized budget, which silently dropped
    tiles on scenes where the padded need overflows)
  - bwd_entries 0/auto x prefix mxu/roll re-check on top of the new glue
  - tafter batched

Grad-gate as in ab_r02: every config's gradients must match the
reference on the REAL compiled path before its timing can win (rank vs
2key may differ only at exact f32 depth ties — measure-zero here).
Run: PYTHONPATH=. /opt/venv/bin/python scripts/ab_r03.py [iters]
"""
from __future__ import annotations

import sys
import time
import traceback

import numpy as np

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 200_000


def scene():
    import jax.numpy as jnp

    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.utils.sh import rgb_to_sh

    rng = np.random.default_rng(0)
    means = rng.uniform(-2, 2, (N_GAUSS, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.03),
                                (N_GAUSS, 3))).astype(np.float32)
    quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, N_GAUSS).astype(np.float32)
    shs = np.zeros((N_GAUSS, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (N_GAUSS, 3)))
    shs[:, 1:] = rng.normal(0, 0.05, (N_GAUSS, 15, 3))
    cam = look_at_camera(eye=(0.0, -1.0, -6.0), target=(0, 0, 0),
                         fovx=1.2, width=WIDTH, height=HEIGHT)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs)), cam


def time_cfg(params, cam, cfg, iters, label, salt0=0.0):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import rasterize
    from h3dgs_tpu.utils.losses import photometric_loss

    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((3, HEIGHT, WIDTH), 0.4, jnp.float32)

    @jax.jit
    def step(p, eps):
        means, scales, quats, opac, shs = p
        means = means + eps

        def loss(m):
            out = rasterize(m, scales, quats, opac, shs, cam, 3, bg,
                            config=cfg)
            return photometric_loss(out["render"], target)

        l, g = jax.value_and_grad(loss)(means)
        return l + jnp.sum(g * 1e-12)

    # Scalar fetch, NOT block_until_ready: on the axon backend the latter
    # can return while the compile is still in flight, so the first timed
    # config of a run measured compile tail (ab_r04: 1366 ms for a 97 ms
    # step). float() of the probe is a real value round-trip.
    float(step(params, jnp.float32(0.0)))
    t0 = time.perf_counter()
    accs = []
    for i in range(iters):
        accs.append(step(params, jnp.float32(salt0 + 1e-7 * (i + 1))))
    float(sum(a for a in accs))
    dt = (time.perf_counter() - t0) / iters
    mpix = WIDTH * HEIGHT / dt / 1e6
    print(f"{label:48s} {dt * 1e3:8.2f} ms  {mpix:7.2f} Mpix/s",
          flush=True)
    return dt


def main(iters=8):
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.train.loop import entry_budget_for_scene
    from h3dgs_tpu.utils.losses import photometric_loss

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()

    budgets = {}
    for q in (128, 256):
        budgets[q] = entry_budget_for_scene(*params, cam, 3, quantum=q)
        print(f"budget Q={q}: {budgets[q]}", flush=True)

    def base_at(q):
        return RasterizeConfig(max_entries=budgets[q], max_per_tile=4096,
                               chunk_e=512, quantum=q,
                               bwd_entries=None, prefix_mode="mxu",
                               binning_fill="cumsum", sort_mode="2key")

    def grads_for(cfg):
        bg = jnp.zeros(3, jnp.float32)
        tgt = jnp.full((3, HEIGHT, WIDTH), 0.4, jnp.float32)

        @jax.jit
        def g(p):
            def loss(m):
                out = rasterize(m, p[1], p[2], p[3], p[4], cam, 3, bg,
                                config=cfg)
                return photometric_loss(out["render"], tgt)
            return jax.grad(loss)(p[0])
        return np.asarray(g(params))

    ref_cfg = base_at(128)
    g_ref = grads_for(ref_cfg)
    salt_seq = [0]
    results = {}

    def check_and_time(label, cfg, iters):
        try:
            if cfg != ref_cfg:
                gv = grads_for(cfg)
                ok = np.allclose(gv, g_ref, atol=3e-5, rtol=5e-3)
                print(f"correctness {label}: {'OK' if ok else 'MISMATCH'} "
                      f"maxdiff={np.abs(gv - g_ref).max():.2e}", flush=True)
                if not ok:
                    print(f"!! {label} grads diverge on-chip — EXCLUDED",
                          flush=True)
                    return float("inf")
            salt_seq[0] += 1
            dt = time_cfg(params, cam, cfg, iters, label,
                          salt0=1e-4 * salt_seq[0])
            results[label] = (dt, cfg)
            return dt
        except Exception as ex:
            print(f"{label}: {type(ex).__name__}: {str(ex)[:140]}",
                  flush=True)
            traceback.print_exc()
            return float("inf")

    # Stage A: glue levers at Q=128.
    check_and_time("r2-promoted (2key cumsum)", ref_cfg, iters)
    check_and_time("sort=rank cumsum", ref_cfg._replace(sort_mode="rank"),
                   iters)
    check_and_time("sort=rank gather",
                   ref_cfg._replace(sort_mode="rank",
                                    binning_fill="gather"), iters)
    check_and_time("sort=2key gather",
                   ref_cfg._replace(binning_fill="gather"), iters)

    best_label = min(results, key=lambda k: results[k][0])
    best = results[best_label][1]
    print(f"\nstage-A winner: {best_label}", flush=True)

    # Stage B: quantum at honest budgets (same glue flags as the winner).
    check_and_time("Q=256 honest budget",
                   base_at(256)._replace(sort_mode=best.sort_mode,
                                         binning_fill=best.binning_fill),
                   iters)
    best_label = min(results, key=lambda k: results[k][0])
    best = results[best_label][1]
    print(f"stage-B winner: {best_label}", flush=True)

    # Stage C: kernel flags re-check on top of the new glue.
    check_and_time("bwd=0", best._replace(bwd_entries=0), iters)
    check_and_time("prefix=roll", best._replace(prefix_mode="roll"), iters)
    check_and_time("bwd=0 roll",
                   best._replace(bwd_entries=0, prefix_mode="roll"), iters)
    if best.quantum >= 128:
        check_and_time("tafter=batched",
                       best._replace(tafter_mode="batched"), iters)

    best_label = min(results, key=lambda k: results[k][0])
    best = results[best_label][1]
    print(f"\nfinal winner: {best_label}  "
          f"({results[best_label][0] * 1e3:.2f} ms)", flush=True)
    print(f"config: {best}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
