"""Same-run A/B of the round-2 kernel levers on the real chip.

HISTORICAL (round-2 ledger): superseded by ab_r03.py / ab_r03b.py.

Times the bench.py workload (1080p fwd+bwd, 200k Gaussians) across:
  - bwd_entries: 0 (off) vs auto (D/2) — backward termination truncation
  - prefix_mode: mxu vs roll — transmittance recurrence factorization
  - chunk_e/quantum re-sweep at the winning combo

Axon-safe timing (perturb an input per iteration, one sync at the end).
Only same-run comparisons are trustworthy (tunnel varies ±10% between
sessions). Run: /opt/venv/bin/python scripts/ab_r02.py [iters]
"""
from __future__ import annotations

import sys
import time

import numpy as np

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 200_000


def scene():
    import jax.numpy as jnp

    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.utils.sh import rgb_to_sh

    rng = np.random.default_rng(0)
    uv = rng.uniform(-3, 3, (N_GAUSS, 2)).astype(np.float32)
    zs = (0.4 * np.sin(uv[:, 0] * 2.1) * np.cos(uv[:, 1] * 1.7)
          + 0.02 * rng.normal(size=N_GAUSS)).astype(np.float32)
    means = np.stack([uv[:, 0], zs, uv[:, 1]], axis=1)
    scales = np.exp(rng.uniform(np.log(0.008), np.log(0.02),
                                (N_GAUSS, 3))).astype(np.float32)
    quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, N_GAUSS).astype(np.float32)
    shs = np.zeros((N_GAUSS, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (N_GAUSS, 3)))
    cam = look_at_camera(eye=(0.0, -1.5, -5.5), target=(0, 0, 0),
                         fovx=1.2, width=WIDTH, height=HEIGHT)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs)), cam


def time_cfg(params, cam, cfg, iters, label, salt0=0.0):
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import rasterize
    from h3dgs_tpu.utils.losses import photometric_loss

    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((3, HEIGHT, WIDTH), 0.4, jnp.float32)

    @jax.jit
    def step(p, eps):
        means, scales, quats, opac, shs = p
        means = means + eps  # perturb so the tunnel cannot content-cache

        def loss(m):
            out = rasterize(m, scales, quats, opac, shs, cam, 3, bg,
                            config=cfg)
            return photometric_loss(out["render"], target)

        l, g = jax.value_and_grad(loss)(means)
        return l + jnp.sum(g * 1e-12)

    acc = step(params, jnp.float32(0.0))
    acc.block_until_ready()
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

    from h3dgs_tpu.ops.rasterize import RasterizeConfig

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()

    # Same trainer-style budget sizing as bench.py: the D-proportional ops
    # scale with the budget, so the A/B must run at the bucket the adaptive
    # trainer would converge to for this scene.
    import jax.numpy as jnp

    from h3dgs_tpu.train.loop import entry_budget_for_scene

    budget = entry_budget_for_scene(*params, cam, 3)
    print(f"budget {budget}", flush=True)
    base = RasterizeConfig(max_entries=budget, max_per_tile=4096,
                           chunk_e=512, quantum=128)

    # On-chip correctness gate before timing: this backend has a history
    # of executable-specific miscompiles around pallas outputs, and the
    # interpret-mode tests cannot catch those. Gradients must agree
    # between every lever combo on the real compiled path.
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import rasterize
    from h3dgs_tpu.utils.losses import photometric_loss

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

    ref_cfg = base._replace(bwd_entries=0, prefix_mode="mxu")
    g_ref = grads_for(ref_cfg)
    salt_seq = [0]

    def check_and_time(label, cfg, iters):
        """Gradient-gate a config on the REAL compiled path, then time it.

        Mismatching configs are excluded (returned as inf, never a
        winner), not just warned about — a fast-but-miscompiled
        executable at the end of a long log must not get promoted to the
        defaults. Every timing gets a distinct salt offset so no two
        configs (or re-times of the same config) replay an identical
        dispatch the tunnel could content-cache."""
        if cfg != ref_cfg:
            gv = grads_for(cfg)
            ok = np.allclose(gv, g_ref, atol=3e-5, rtol=5e-3)
            print(f"correctness {label}: {'OK' if ok else 'MISMATCH'} "
                  f"maxdiff={np.abs(gv - g_ref).max():.2e}", flush=True)
            if not ok:
                print(f"!! {label} grads diverge on-chip — EXCLUDED "
                      f"(axon miscompile pattern?)", flush=True)
                return float("inf")
        salt_seq[0] += 1
        return time_cfg(params, cam, cfg, iters, label,
                        salt0=1e-4 * salt_seq[0])

    results = {}
    variants = [
        ("bwd=0 mxu (r1 baseline)", ref_cfg),
        ("bwd=auto mxu",
         base._replace(bwd_entries=None, prefix_mode="mxu")),
        ("bwd=0 roll",
         base._replace(bwd_entries=0, prefix_mode="roll")),
        ("bwd=auto roll",
         base._replace(bwd_entries=None, prefix_mode="roll")),
    ]
    for label, cfg in variants:
        results[label] = check_and_time(label, cfg, iters)

    best_label = min(results, key=results.get)
    print(f"\nwinner: {best_label}", flush=True)
    best = dict(variants)[best_label]

    # E/Q re-sweep at the winning flags. be = backward grid-step width
    # (0 = symmetric); the wide-forward rows pair with a narrower
    # backward because the bwd kernel's VMEM scope is ~2x the forward's.
    # Q=64 rows: finer quanta cut the aligned stream's padding (~8% at
    # the bench point); with roll-mode prefixes the historical Q-width
    # MXU-utilization penalty does not apply.
    for e, q, be in ((256, 128, 0), (512, 128, 0), (512, 256, 0),
                     (1024, 128, 0), (1024, 128, 512), (1024, 128, 256),
                     (2048, 128, 512), (512, 64, 0), (256, 64, 0)):
        try:
            cfg = best._replace(chunk_e=e, quantum=q, bwd_chunk_e=be)
            check_and_time(f"winner E={e} Q={q} bwdE={be or e}", cfg,
                           iters)
        except Exception as ex:  # e.g. VMEM overflow at E=1024 bwd
            print(f"E={e} Q={q} bwdE={be or e}: "
                  f"{type(ex).__name__}: {str(ex)[:120]}", flush=True)

    # Glue-op alternatives at the winning flags (SOL round-3 B and C;
    # both bit-exact vs their defaults, so this is purely a timing race).
    for label, cfg in (
            ("winner + cumsum fill", best._replace(binning_fill="cumsum")),
            ("winner + scatter_k=8", best._replace(scatter_k=8)),
            ("winner + scatter_k=16", best._replace(scatter_k=16)),
            ("winner + cumsum + k8", best._replace(binning_fill="cumsum",
                                                   scatter_k=8)),
            ("winner + tafter=batched",
             best._replace(tafter_mode="batched"))):
        try:
            check_and_time(label, cfg, iters)
        except Exception as ex:
            print(f"{label}: {type(ex).__name__}: {str(ex)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
