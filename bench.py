"""Benchmark: rasterizer fwd+bwd throughput at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mpix/s of full forward+backward (render + photometric-loss grad
w.r.t. all Gaussian parameters) at 1920x1080 on a synthetic scene of
N_GAUSS Gaussians — the BASELINE.json north-star number. Uses the Pallas
blend kernel on TPU (ops/pallas_blend.py).

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
import time

import numpy as np

import os

BASELINE_MPIX_S = 45.0
# Env overrides let CI/smoke runs shrink the workload (same code path).
N_GAUSS = int(os.environ.get("BENCH_N_GAUSS", 200_000))
WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
# Wall budget for the self-tuning stages: compiles are 20-300 s each on
# a cold cache and the driver may kill a silent bench — skip remaining
# tuning stages once exceeded so the final measurement ALWAYS lands.
TUNE_BUDGET_S = float(os.environ.get("BENCH_TUNE_BUDGET_S", 1200))


def main():
    # When the TPU tunnel is down, jax.devices() hangs FOREVER (the axon
    # plugin dials and never times out) — probe in a subprocess first so
    # the bench fails fast with a clear message instead of hanging the
    # driver. Skipped when another platform is forced.
    if not os.environ.get("BENCH_PLATFORM"):
        import subprocess
        import sys
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
    # Budgets sized exactly as the adaptive trainer would (see
    # entry_budgets_for_scene: exact two-probe need measurement + the
    # trainer's quarter-ladder buckets, split gen/aligned).
    from h3dgs_tpu.train.loop import entry_budgets_for_scene

    gen_budget, budget = entry_budgets_for_scene(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(shs), cam, 3)
    import sys
    print(f"  budget {budget} (gen {gen_budget})", file=sys.stderr,
          flush=True)
    base = RasterizeConfig(max_entries=budget, max_per_tile=4096,
                           chunk_e=512, quantum=128)
    bg = jnp.zeros(3, jnp.float32)
    params = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
              jnp.asarray(opac), jnp.asarray(shs))
    target = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32) + 0.3

    def make_step(cfg):
        @jax.jit
        def step(params, target, salt):
            params = (params[0] + salt,) + params[1:]

            def loss_fn(p):
                out = rasterize(*p, cam, 3, bg, config=cfg)
                return photometric_loss(out["render"], target)

            grads = jax.grad(loss_fn)(params)
            # Probe scalar: sum of |g| — positive terms, so legitimate
            # accumulation-order noise between kernel configs (e.g. the
            # asymmetric-width backward regroups its matmuls) stays a
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

    # Self-tuning: the kernel levers are scene-dependent; pick the
    # fastest combo in-run (same honest timing, compile cached), then
    # measure the full ITERS with the winner. Every stage applies the
    # same correctness gate: identical inputs (warm salt 0.0) must give
    # the same gradient-magnitude probe on every candidate — a fast-but-
    # miscompiled executable (this backend has produced
    # executable-specific miscompiles before) must never win on speed.
    import sys

    salt_base = [0.0]
    tune_start = time.perf_counter()

    def run_stage(title, configs, ref_name, fallback_cfg):
        """Time candidates, exclude grad-probe mismatches vs ref_name,
        return the fastest survivor (fallback_cfg if everything fails OR
        the reference itself failed — without a reference probe nothing
        is verified, so nothing may be promoted)."""
        if time.perf_counter() - tune_start > TUNE_BUDGET_S:
            print(f"  {title}: tuning budget exhausted — skipped",
                  file=sys.stderr, flush=True)
            return fallback_cfg
        salt_base[0] += 1e-2
        times, probes = {}, {}
        for k, (name, cfg) in enumerate(configs.items()):
            try:
                times[name], probes[name] = timed(
                    make_step(cfg), 3, salt0=salt_base[0] + 1e-4 * (k + 1))
                print(f"  {name}: {times[name] * 1e3:.2f} ms "
                      f"probe={probes[name]:.6f}", file=sys.stderr,
                      flush=True)
            except Exception as ex:
                print(f"  {name}: failed ({type(ex).__name__})",
                      file=sys.stderr, flush=True)
        ref_probe = probes.get(ref_name)
        if ref_probe is None:
            print(f"  {title}: reference '{ref_name}' failed — stage "
                  "skipped (no unverified promotion)", file=sys.stderr,
                  flush=True)
            return fallback_cfg
        for name in list(times):
            if abs(probes[name] - ref_probe) > 1e-4 * max(abs(ref_probe),
                                                          1e-3):
                print(f"  {name}: GRAD-PROBE MISMATCH vs {ref_name} "
                      f"({probes[name]} != {ref_probe}) — excluded",
                      file=sys.stderr, flush=True)
                del times[name]
        best = min(times, key=times.get)
        print(f"  {title} winner: {best}", file=sys.stderr, flush=True)
        return configs[best]

    # Stage 1: backward truncation x prefix mode. The truncation budget is
    # sized from a measured survivor-quanta probe: the blind auto budget
    # (max_entries // 2) can sit just UNDER the survivor count, making
    # every step pay the compaction and then fall back to the full
    # stream — the 2026-08-19 A/B loss of bwd=auto was exactly that.
    stage1 = {
        "bwd=0,mxu": base._replace(bwd_entries=0, prefix_mode="mxu"),
        "bwd=auto,mxu": base._replace(bwd_entries=None, prefix_mode="mxu"),
        "bwd=0,roll": base._replace(bwd_entries=0, prefix_mode="roll"),
    }
    try:
        from h3dgs_tpu.train.loop import bwd_entries_for_scene
        bwd_probe = bwd_entries_for_scene(*params, cam, 3, config=base)
        print(f"  bwd survivor probe -> bwd_entries={bwd_probe}",
              file=sys.stderr, flush=True)
        if bwd_probe:
            stage1["bwd=probe,mxu"] = base._replace(
                bwd_entries=bwd_probe, prefix_mode="mxu")
    except Exception as ex:
        print(f"  bwd survivor probe failed ({type(ex).__name__})",
              file=sys.stderr, flush=True)
    best_cfg = run_stage("stage-1", stage1, ref_name="bwd=0,mxu",
                         fallback_cfg=base._replace(bwd_entries=0,
                                                    prefix_mode="mxu"))

    # Stage 2: grid-step width at the winning flags. A wide forward pairs
    # with a narrower backward (bwd_chunk_e): the backward kernel's VMEM
    # scope is ~2x the forward's.
    if best_cfg.max_entries % 1024 == 0:
        best_cfg = run_stage("stage-2", {
            "E=asis": best_cfg,
            "E1024/bwd512": best_cfg._replace(chunk_e=1024,
                                              bwd_chunk_e=512),
            "E1024/bwd256": best_cfg._replace(chunk_e=1024,
                                              bwd_chunk_e=256),
            # Full-width backward: OOM'd Mosaic's 16M scoped VMEM by 1.57M
            # before the 2026-08-19 kernel pass-reductions freed several
            # [P,E] temporaries — raced again now; run_stage tolerates a
            # compile failure.
            "E1024/bwd1024": best_cfg._replace(chunk_e=1024,
                                               bwd_chunk_e=1024),
        }, ref_name="E=asis", fallback_cfg=best_cfg)

    # Stage 2q: alignment quantum 256 at ITS OWN honestly-probed budget
    # (coarser alignment pads the stream more, so racing it at the Q=128
    # budget would either overflow or flatter it). Q=256 won the
    # 2026-08-18 fixed-budget A/B by ~3 ms (ab_r02: 127.1 vs 130.6).
    try:
        gen256, budget256 = entry_budgets_for_scene(
            *params, cam, 3, quantum=256)
        print(f"  Q=256 budget {budget256} (gen {gen256})", file=sys.stderr,
              flush=True)
        if budget256 % best_cfg.chunk_e == 0:
            best_cfg = run_stage("stage-2q", {
                "Q=asis": best_cfg,
                "Q=256": best_cfg._replace(quantum=256,
                                           max_entries=budget256),
            }, ref_name="Q=asis", fallback_cfg=best_cfg)
    except Exception as ex:
        print(f"  stage-2q probe failed ({type(ex).__name__})",
              file=sys.stderr, flush=True)

    # Stage 3: glue-op alternatives (bit-exact vs the defaults — see
    # tests — so this is purely a timing race): binning fill, sort mode,
    # batched post-quantum transmittance, unsplit gen budget.
    stage3 = {
        "glue=default": best_cfg,
        "fill=gather": best_cfg._replace(binning_fill="gather"),
        "sort=2key": best_cfg._replace(sort_mode="2key"),
        "gen=split": best_cfg._replace(gen_entries=gen_budget),
    }
    if best_cfg.quantum >= 128:
        stage3["tafter=batched"] = best_cfg._replace(tafter_mode="batched")
    best_cfg = run_stage("stage-3", stage3, ref_name="glue=default",
                         fallback_cfg=best_cfg)

    dt, _ = timed(make_step(best_cfg), ITERS, salt0=0.5)

    mpix_s = (WIDTH * HEIGHT / 1e6) / dt
    print(json.dumps({
        "metric": "rasterizer_fwd_bwd_1080p",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
    }))


if __name__ == "__main__":
    main()
