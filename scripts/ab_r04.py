"""Round-4 on-chip A/B: D-shrink levers (VERDICT r3 item 1).

Races the bench workload (1080p fwd+bwd, 200k Gaussians) across:
  A. EXACT budgets (entry_budgets_for_scene exact mode — no ladder
     headroom) x alignment quantum {128, 64, 32} x grid-step width —
     all lossless, grad-gated against the round-3 defaults.
  B. Quality-gated per-tile depth truncation (trunc_theta/trunc_c) at
     budgets probed per setting: each candidate reports render PSNR vs
     the exact image, gradient rel-L2/cosine, and the cut ratio; only
     candidates above the PSNR gate may win.
  C. Backward pairings on the winner.

Run: PYTHONPATH=. /opt/venv/bin/python scripts/ab_r04.py [iters]
"""
from __future__ import annotations

import sys
import traceback

import numpy as np

from ab_r03 import scene, time_cfg

PSNR_GATE_DB = 55.0


def main(iters=8):
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
    tgt = jnp.full((3, 1080, 1920), 0.4, jnp.float32)

    budget_cache = {}

    def budgets_at(q, theta=0.0, c=1.0):
        key = (q, theta, c)
        if key not in budget_cache:
            budget_cache[key] = entry_budgets_for_scene(
                *params, cam, 3, quantum=q, trunc_theta=theta, trunc_c=c)
            print(f"budgets Q={q} theta={theta} c={c}: "
                  f"gen={budget_cache[key][0]} max={budget_cache[key][1]}",
                  flush=True)
        return budget_cache[key]

    def cfg_at(q, theta=0.0, c=1.0, **kw):
        gen_b, max_b = budgets_at(q, theta, c)
        split = gen_b != max_b or theta > 0
        return RasterizeConfig(
            max_entries=max_b, max_per_tile=4096, chunk_e=512, quantum=q,
            gen_entries=gen_b if split else 0,
            trunc_theta=theta, trunc_c=c, **kw)

    def render_and_grads(cfg):
        @jax.jit
        def f(p):
            def loss(m):
                out = rasterize(m, p[1], p[2], p[3], p[4], cam, 3, bg,
                                config=cfg)
                return photometric_loss(out["render"], tgt), out["render"]
            (l, img), g = jax.value_and_grad(loss, has_aux=True)(p[0])
            return img, g
        img, g = f(params)
        return np.asarray(jnp.clip(img, 0, 1)), np.asarray(g)

    ref_cfg = cfg_at(128)
    img_ref, g_ref = render_and_grads(ref_cfg)
    g_ref_n = float(np.linalg.norm(g_ref))
    salt_seq = [0]
    results = {}

    def quality(label, cfg):
        """(psnr_db, grad_rel, grad_cos) vs the exact reference render."""
        img, g = render_and_grads(cfg)
        mse = float(np.mean((img - img_ref) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        rel = float(np.linalg.norm(g - g_ref)) / (g_ref_n + 1e-12)
        cos = float((g * g_ref).sum()) / (
            (np.linalg.norm(g) + 1e-12) * (g_ref_n + 1e-12))
        print(f"quality {label}: psnr={psnr:.1f}dB grad_rel={rel:.4f} "
              f"cos={cos:.6f}", flush=True)
        return psnr, rel, cos

    def check_and_time(label, cfg, lossy=False):
        try:
            if lossy:
                psnr, rel, cos = quality(label, cfg)
                if psnr < PSNR_GATE_DB:
                    print(f"!! {label}: below {PSNR_GATE_DB} dB gate — "
                          "EXCLUDED from winners", flush=True)
                    gate_ok = False
                else:
                    gate_ok = True
            elif cfg != ref_cfg:
                _, gv = render_and_grads(cfg)
                ok = np.allclose(gv, g_ref, atol=3e-5, rtol=5e-3)
                print(f"correctness {label}: "
                      f"{'OK' if ok else 'MISMATCH'} "
                      f"maxdiff={np.abs(gv - g_ref).max():.2e}", flush=True)
                if not ok:
                    print(f"!! {label} EXCLUDED", flush=True)
                    return
                gate_ok = True
            else:
                gate_ok = True
            salt_seq[0] += 1
            dt = time_cfg(params, cam, cfg, iters, label,
                          salt0=1e-4 * salt_seq[0])
            if gate_ok:
                results[label] = (dt, cfg)
        except Exception as ex:
            print(f"{label}: {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)
            traceback.print_exc()

    # --- stage A: exact budgets x quantum x width (lossless) ---
    check_and_time("exact Q=128 E=512", ref_cfg)
    check_and_time("exact Q=64 E=512", cfg_at(64))
    check_and_time("exact Q=64 E=256", cfg_at(64)._replace(chunk_e=256))
    check_and_time("exact Q=32 E=256", cfg_at(32)._replace(chunk_e=256))
    check_and_time("exact Q=32 E=512", cfg_at(32))

    best_label = min(results, key=lambda k: results[k][0])
    best = results[best_label][1]
    print(f"\nstage-A winner: {best_label}\n", flush=True)

    # --- stage B: quality-gated truncation at the winner's quantum ---
    bq, be = best.quantum, best.chunk_e
    for theta, c in ((0.003, 1.0), (0.01, 1.0), (0.01, 0.5), (0.03, 1.0)):
        check_and_time(f"trunc t={theta} c={c} Q={bq}",
                       cfg_at(bq, theta, c)._replace(chunk_e=be),
                       lossy=True)

    best_label = min(results, key=lambda k: results[k][0])
    best = results[best_label][1]
    print(f"\nstage-B winner: {best_label}\n", flush=True)

    # --- stage C: backward pairings on the winner ---
    if best.max_entries % 1024 == 0:
        check_and_time("winner E1024/bwd512",
                       best._replace(chunk_e=1024, bwd_chunk_e=512),
                       lossy=best.trunc_theta > 0)
    check_and_time("winner prefix=roll",
                   best._replace(prefix_mode="roll"),
                   lossy=best.trunc_theta > 0)

    best_label = min(results, key=lambda k: results[k][0])
    dt, best = results[best_label]
    print(f"\nfinal winner: {best_label}  ({dt * 1e3:.2f} ms, "
          f"{1920 * 1080 / dt / 1e6:.2f} Mpix/s)", flush=True)
    print(f"config: {best}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
