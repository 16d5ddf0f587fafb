"""Benchmark: rasterizer fwd+bwd throughput at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mpix/s of full forward+backward (render + photometric-loss grad
w.r.t. all Gaussian parameters) at 1920x1080 on a synthetic scene of
N_GAUSS Gaussians — the BASELINE.json north-star number. Uses the Pallas
blend kernel on TPU (ops/pallas_blend.py).

Cold-reproducibility (VERDICT r3 item 4): the PROMOTED defaults are
measured FIRST and reported as the metric — `python bench.py` cold gives
the number of record. The promoted profile is deterministic: exact
entry budgets probed for this scene (the sizing policy the trainer's
probes use), RasterizeConfig defaults for every kernel/glue knob, plus
the round-4 quality-gated depth truncation whose PSNR/grad gate runs
in-bench and falls back to the exact configuration if it fails on this
scene. Exploratory self-tuning only runs with BENCH_TUNE=1 and never
changes the reported metric.

Timing notes for the axon (tunneled TPU) backend: block_until_ready is
unreliable and repeated identical calls can be cached, so each iteration
perturbs an input and the loop syncs once at the end through a scalar
that depends on every gradient.

vs_baseline normalizes against a nominal CUDA-reference-class throughput:
the reference's single-GPU hierarchy rasterizer trains ~30k iters in
~35 min on an A6000 at ~1-2 MP (README.md:220 gives 171 min for
coarse+2 chunks+post), i.e. roughly ~15-30 it/s -> ~30-60 Mpix/s fwd+bwd.
We use 45 Mpix/s as the comparison point until a measured CUDA number is
available.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MPIX_S = 45.0
# Env overrides let CI/smoke runs shrink the workload (same code path).
N_GAUSS = int(os.environ.get("BENCH_N_GAUSS", 200_000))
WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))
ITERS = int(os.environ.get("BENCH_ITERS", 20))

# --- promoted round-4 profile (set from scripts/ab_r04.py results) ---
# Quality-gated per-tile depth truncation: verified in-bench each run
# (PSNR vs the exact render must clear the gate, else the exact config
# is measured instead and the fallback is printed).
TRUNC_THETA = float(os.environ.get("BENCH_TRUNC_THETA", "0"))
TRUNC_C = float(os.environ.get("BENCH_TRUNC_C", "1.0"))
QUANTUM = int(os.environ.get("BENCH_QUANTUM", "128"))
CHUNK_E = int(os.environ.get("BENCH_CHUNK_E", "512"))
PSNR_GATE_DB = float(os.environ.get("BENCH_PSNR_GATE", "55"))
GRAD_COS_GATE = float(os.environ.get("BENCH_GRAD_COS_GATE", "0.999"))


def main():
    # When the TPU tunnel is down, jax.devices() hangs FOREVER (the axon
    # plugin dials and never times out) — probe in a subprocess first so
    # the bench fails fast with a clear message instead of hanging the
    # driver. Skipped when another platform is forced.
    if not os.environ.get("BENCH_PLATFORM"):
        import subprocess
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, check=True, capture_output=True)
        except Exception as ex:
            print(f"bench: TPU backend unreachable ({type(ex).__name__}) — "
                  "tunnel down? No measurement taken.", file=sys.stderr)
            raise SystemExit(3)

    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    # This container's sitecustomize registers the axon TPU plugin; a
    # plain JAX_PLATFORMS env var does not stop it from dialing the
    # tunnel. For CPU smoke runs set BENCH_PLATFORM=cpu (config update
    # must happen before the first computation).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.train.loop import entry_budgets_for_scene
    from h3dgs_tpu.utils.losses import photometric_loss
    from h3dgs_tpu.utils.sh import rgb_to_sh

    rng = np.random.default_rng(0)
    n = N_GAUSS
    means = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.03),
                                (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    shs[:, 1:] = rng.normal(0, 0.05, (n, 15, 3))

    cam = look_at_camera(eye=(0.0, -1.0, -6.0), target=(0, 0, 0), fovx=1.2,
                         width=WIDTH, height=HEIGHT)
    params = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
              jnp.asarray(opac), jnp.asarray(shs))
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32) + 0.3

    def cfg_for(quantum, chunk_e, theta, c):
        """Exact budgets probed at the setting (the trainer's own sizing
        policy for static scenes); gen/aligned split whenever they
        differ (under truncation the aligned stream is SMALLER)."""
        gen_b, max_b = entry_budgets_for_scene(
            *params, cam, 3, quantum=quantum, trunc_theta=theta,
            trunc_c=c)
        print(f"  budgets Q={quantum} theta={theta}: gen={gen_b} "
              f"max={max_b}", file=sys.stderr, flush=True)
        return RasterizeConfig(
            max_entries=max_b, max_per_tile=4096, chunk_e=chunk_e,
            quantum=quantum, gen_entries=gen_b if gen_b != max_b else 0,
            trunc_theta=theta, trunc_c=c)

    def make_step(cfg):
        @jax.jit
        def step(params, target, salt):
            params = (params[0] + salt,) + params[1:]

            def loss_fn(p):
                out = rasterize(*p, cam, 3, bg, config=cfg)
                return photometric_loss(out["render"], target)

            grads = jax.grad(loss_fn)(params)
            # Probe scalar: sum of |g| — positive terms, so legitimate
            # accumulation-order noise between kernel configs stays a
            # ~1e-6 relative perturbation instead of being amplified by
            # cancellation in a signed sum.
            return sum(jnp.sum(jnp.abs(g)) for g in grads)
        return step

    def timed(step, iters, salt0):
        # Warm/compile at salt 0.0 for EVERY candidate: the returned probe
        # value must come from identical inputs to be comparable. The
        # timed iterations use a per-candidate salt0 offset so no two
        # timings ever replay an identical dispatch (the tunnel content-
        # caches repeats, which would gift re-timed configs a fake win).
        ref = float(step(params, target, jnp.float32(0.0)))
        t0 = time.perf_counter()
        outs = [step(params, target,
                     jnp.float32(salt0 + (i + 1) * 1e-7))
                for i in range(iters)]
        float(outs[-1])   # one device stream: last done => all done
        return (time.perf_counter() - t0) / iters, ref

    def render_and_grads(cfg):
        @jax.jit
        def f(p):
            def loss(m):
                out = rasterize(m, p[1], p[2], p[3], p[4], cam, 3, bg,
                                config=cfg)
                return photometric_loss(out["render"], target), \
                    out["render"]
            (l, img), g = jax.value_and_grad(loss, has_aux=True)(p[0])
            return jnp.clip(img, 0, 1), g
        img, g = f(params)
        return np.asarray(img), np.asarray(g)

    # --- promoted defaults, quality-gated when truncation is on ---
    cfg = cfg_for(QUANTUM, CHUNK_E, TRUNC_THETA, TRUNC_C)
    if TRUNC_THETA > 0:
        exact_cfg = cfg_for(QUANTUM, CHUNK_E, 0.0, 1.0)
        img_e, g_e = render_and_grads(exact_cfg)
        img_t, g_t = render_and_grads(cfg)
        mse = float(np.mean((img_t - img_e) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        cos = float((g_t * g_e).sum()) / (
            (np.linalg.norm(g_t) + 1e-12)
            * (np.linalg.norm(g_e) + 1e-12))
        print(f"  trunc gate: psnr={psnr:.1f} dB grad_cos={cos:.6f}",
              file=sys.stderr, flush=True)
        if psnr < PSNR_GATE_DB or cos < GRAD_COS_GATE:
            print(f"  trunc gate FAILED on this scene (need "
                  f">={PSNR_GATE_DB} dB, cos>={GRAD_COS_GATE}) — "
                  "measuring the exact configuration instead",
                  file=sys.stderr, flush=True)
            cfg = exact_cfg

    dt, _ = timed(make_step(cfg), ITERS, salt0=0.5)
    mpix_s = (WIDTH * HEIGHT / 1e6) / dt
    print(f"  defaults: {dt * 1e3:.2f} ms = {mpix_s:.2f} Mpix/s "
          f"(cfg: Q={cfg.quantum} E={cfg.chunk_e} "
          f"trunc={cfg.trunc_theta})", file=sys.stderr, flush=True)

    # --- second scene: SURFACE regime (opaque street canyon) ----------
    # The cloud above is a termination-proof worst case (per-pixel
    # transmittance rarely dies; CUDA's early-out would idle there too).
    # Real captures are surfaces: transmittance dies after the front
    # shell, which is where the CUDA baseline's per-pixel termination
    # earns most of its 45 Mpix/s. This scene tracks that regime at
    # 1080p: ground + two opaque facade walls viewed down the street —
    # deep overdraw, early termination. Same N, same defaults, plus the
    # backward termination truncation sized from the survivor probe (the
    # trainer's own adaptive policy).
    surf_mpix_s = None
    try:
        # Surface-ALIGNED near-opaque disks (trained captures are dense
        # aligned surfels, not random needles): thin along each
        # surface's normal. scripts/tune_surface.py sweep (2026-08-20):
        # aligned 20.4 Mpix/s vs random-quat 13.4 at the same geometry;
        # fronto-parallel deep-overdraw variants push survivors to 0.25
        # but their 2-4M-entry streams sink throughput — the canyon is
        # the representative middle.
        n_g, n_w = 70_000, 65_000
        sm = np.concatenate([
            np.stack([rng.uniform(-12, 12, n_g),
                      0.02 * rng.normal(size=n_g),
                      rng.uniform(-3, 3, n_g)], 1),         # ground
            np.stack([rng.uniform(-12, 12, n_w),
                      -rng.uniform(0, 3, n_w),
                      3.0 + 0.02 * rng.normal(size=n_w)], 1),
            np.stack([rng.uniform(-12, 12, n_w),
                      -rng.uniform(0, 3, n_w),
                      -3.0 + 0.02 * rng.normal(size=n_w)], 1),
        ]).astype(np.float32)
        ns = sm.shape[0]
        s_scales = np.exp(rng.uniform(np.log(0.035), np.log(0.07),
                                      (ns, 3))).astype(np.float32)
        s_scales[:n_g, 1] *= 0.1          # ground: thin in y
        s_scales[n_g:, 2] *= 0.1          # walls: thin in z
        s_quats = np.tile(np.array([1, 0, 0, 0], np.float32), (ns, 1))
        s_opac = rng.uniform(0.85, 0.98, (ns,)).astype(np.float32)
        s_shs = np.zeros((ns, 16, 3), np.float32)
        s_shs[:, 0] = rgb_to_sh(rng.uniform(0.2, 0.8, (ns, 3)))
        s_shs[:, 1:] = rng.normal(0, 0.05, (ns, 15, 3))
        s_params = tuple(jnp.asarray(a) for a in
                         (sm, s_scales, s_quats, s_opac, s_shs))
        s_cam = look_at_camera(eye=(-11.0, -1.5, 0.0),
                               target=(12.0, -1.3, 0.3), fovx=1.2,
                               width=WIDTH, height=HEIGHT)
        s_gen, s_max = entry_budgets_for_scene(*s_params, s_cam, 3)
        s_cfg = RasterizeConfig(
            max_entries=s_max, max_per_tile=4096, chunk_e=CHUNK_E,
            quantum=QUANTUM,
            gen_entries=s_gen if s_gen != s_max else 0)
        # Survivor probe -> exact bwd truncation budget (lossless: the
        # kernel falls back in-jit to the full stream on overflow).
        probe = jax.jit(lambda p: rasterize(
            *p, s_cam, 3, bg,
            config=s_cfg._replace(bwd_entries=s_max))["n_bwd_quanta"])
        n_q = int(probe(s_params))
        if n_q < 0:     # XLA fallback path: no survivor telemetry
            bwd_e = 0
        else:
            bwd_e = min(-(-n_q * QUANTUM * 11 // 10
                          // s_cfg.chunk_e) * s_cfg.chunk_e, s_max)
        s_cfg = s_cfg._replace(bwd_entries=bwd_e)
        print(f"  surface budgets: gen={s_gen} max={s_max} "
              f"bwd_quanta={n_q} -> bwd_entries={bwd_e} "
              f"({bwd_e / s_max:.2f}x of stream)",
              file=sys.stderr, flush=True)

        @jax.jit
        def s_step(p, tgt, salt):
            p = (p[0] + salt,) + p[1:]

            def loss_fn(q):
                out = rasterize(*q, s_cam, 3, bg, config=s_cfg)
                return photometric_loss(out["render"], tgt)

            grads = jax.grad(loss_fn)(p)
            return sum(jnp.sum(jnp.abs(g)) for g in grads)

        float(s_step(s_params, target, jnp.float32(0.0)))
        t0 = time.perf_counter()
        outs = [s_step(s_params, target, jnp.float32(0.5 + (i + 1) * 1e-7))
                for i in range(ITERS)]
        float(outs[-1])
        s_dt = (time.perf_counter() - t0) / ITERS
        surf_mpix_s = (WIDTH * HEIGHT / 1e6) / s_dt
        print(f"  surface: {s_dt * 1e3:.2f} ms = {surf_mpix_s:.2f} "
              "Mpix/s", file=sys.stderr, flush=True)
    except Exception as ex:      # surface scene must never kill the bench
        print(f"  surface scene failed: {type(ex).__name__}: {ex}",
              file=sys.stderr, flush=True)

    result = {
        "metric": "rasterizer_fwd_bwd_1080p",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
    }
    if surf_mpix_s is not None:
        result["surface_value"] = round(surf_mpix_s, 3)
        result["surface_vs_baseline"] = round(
            surf_mpix_s / BASELINE_MPIX_S, 4)
    print(json.dumps(result))

    # --- optional exploratory tuning: stderr only, never the metric ---
    if os.environ.get("BENCH_TUNE"):
        salt = [1.0]

        def race(label, c):
            try:
                salt[0] += 1e-2
                d, probe = timed(make_step(c), 3, salt0=salt[0])
                print(f"  tune {label}: {d * 1e3:.2f} ms "
                      f"probe={probe:.6f}", file=sys.stderr, flush=True)
            except Exception as ex:
                print(f"  tune {label}: failed ({type(ex).__name__})",
                      file=sys.stderr, flush=True)

        race("bwd=auto", cfg._replace(bwd_entries=None))
        race("prefix=roll", cfg._replace(prefix_mode="roll"))
        race("fill=gather", cfg._replace(binning_fill="gather"))
        race("fill=cumsum_t", cfg._replace(binning_fill="cumsum_t"))
        if cfg.max_entries % 1024 == 0:
            race("E1024/bwd512", cfg._replace(chunk_e=1024,
                                              bwd_chunk_e=512))
        for q in (128, 64, 32):
            if q != cfg.quantum:
                race(f"Q={q}", cfg_for(q, min(CHUNK_E, 512),
                                       cfg.trunc_theta, cfg.trunc_c))


if __name__ == "__main__":
    main()
