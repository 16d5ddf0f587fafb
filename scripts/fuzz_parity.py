"""Randomized parity fuzz: Pallas blend vs the XLA scan path.

Random scenes (including degenerate regimes: huge splats covering the
frame, subpixel splats, near-zero opacity, piled-up depth ties) x random
kernel configurations (grid widths, quanta, truncation, prefix mode,
glue-op alternatives). For each trial: forward images must match within
tolerance, gradients must be finite, and the flag-gated glue paths must
reproduce the default bit-for-bit (fill) / near-exactly (scatter).

Failures print a self-contained repro line. Run until a deadline:
  /opt/venv/bin/python scripts/fuzz_parity.py [minutes]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def trial(seed: int) -> str:
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.ops import rasterize as R
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.utils.losses import photometric_loss
    from h3dgs_tpu.utils.sh import rgb_to_sh

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    regime = rng.choice(["normal", "huge", "tiny", "faint", "ties"])
    spread = {"normal": 1.0, "huge": 0.3, "tiny": 1.5,
              "faint": 1.0, "ties": 0.5}[regime]
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    if regime == "ties":
        means[:, 2] = np.round(means[:, 2] * 4) / 4  # exact depth ties
    scale_rng = {"normal": (0.02, 0.2), "huge": (0.5, 3.0),
                 "tiny": (0.0005, 0.004), "faint": (0.05, 0.3),
                 "ties": (0.05, 0.3)}[regime]
    scales = np.exp(rng.uniform(np.log(scale_rng[0]), np.log(scale_rng[1]),
                                (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = (rng.uniform(0.001, 0.02, n) if regime == "faint"
            else rng.uniform(0.05, 0.99, n)).astype(np.float32)
    shs = np.zeros((n, 4, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0, 1, (n, 3)))
    shs[:, 1:] = rng.normal(0, 0.2, (n, 3, 3))
    w, h = int(rng.choice([48, 64, 80])), int(rng.choice([32, 48]))
    cam = look_at_camera(
        eye=tuple(rng.uniform(-1, 1, 2)) + (-float(rng.uniform(2, 8)),),
        target=(0, 0, 0), fovx=float(rng.uniform(0.6, 1.5)),
        width=w, height=h)
    params = tuple(map(jnp.asarray, (means, scales, quats, opac, shs)))
    bg = jnp.asarray(rng.uniform(0, 1, 3).astype(np.float32))

    chunk_e = int(rng.choice([128, 256, 512]))
    quantum = int(rng.choice([q for q in (64, 128, 256) if q <= chunk_e]))
    budget = int(rng.choice([1 << 11, 1 << 12, 1 << 13]))
    budget = -(-budget // chunk_e) * chunk_e
    bwd_entries = int(rng.choice([0, budget // 2, chunk_e]))
    bwd_entries -= bwd_entries % chunk_e
    cfg = R.RasterizeConfig(
        max_entries=budget, max_per_tile=int(rng.choice([64, 256])),
        chunk=16, backend="pallas", chunk_e=chunk_e, quantum=quantum,
        bwd_entries=bwd_entries,
        # quantum < 128 requires 128-multiple grid widths (the kernels
        # iterate whole 128-lane blocks; guard in blend_from_bins).
        bwd_chunk_e=int(rng.choice([0, max(quantum, 128)])),
        prefix_mode=str(rng.choice(["mxu", "roll"])),
        scatter_k=int(rng.choice([0, 8])),
        binning_fill=str(rng.choice(["gather", "cumsum", "cumsum_t"])),
        tafter_mode=str(rng.choice(["loop", "batched"])),
        scatter_mode=str(rng.choice(["add", "segsum"])),
        fwd_accumulate=bool(rng.choice([False, True])))
    xla = R.RasterizeConfig(max_entries=budget,
                            max_per_tile=cfg.max_per_tile, chunk=16,
                            backend="xla")

    # Glue-path invariants hold in EVERY regime (including overflow and
    # truncation, where their drop logic actually runs): the cumsum fill
    # must reproduce the gather-built AlignedBins bit-for-bit, and the
    # K-slot scatter must match plain scatter-add.
    from h3dgs_tpu.ops.binning import (bin_gaussians, bin_gaussians_aligned)
    from h3dgs_tpu.ops.pallas_blend import scatter_entry_grads
    from h3dgs_tpu.ops.projection import project_gaussians
    proj = project_gaussians(*params, cam, 1)
    ag = bin_gaussians_aligned(proj, cam.height, cam.width, budget,
                               cfg.max_per_tile, quantum, fill="gather")
    ac = bin_gaussians_aligned(proj, cam.height, cam.width, budget,
                               cfg.max_per_tile, quantum, fill="cumsum")
    for fname in ag._fields:
        if not np.array_equal(np.asarray(getattr(ag, fname)),
                              np.asarray(getattr(ac, fname))):
            return f"CUMSUM-FILL MISMATCH field={fname} seed={seed} cfg={cfg}"
    de = jnp.asarray(rng.normal(size=(16, budget)).astype(np.float32))
    s_ref = scatter_entry_grads(de, ag.gauss_idx, n)
    s_k = scatter_entry_grads(de, ag.gauss_idx, n, k_slots=8)
    for a, b in zip(jax.tree.leaves(s_k), jax.tree.leaves(s_ref)):
        if not np.allclose(np.asarray(a), np.asarray(b),
                           rtol=1e-3, atol=1e-5):
            return f"K-SLOT SCATTER MISMATCH seed={seed} cfg={cfg}"

    op = R.rasterize(*params, cam, 1, bg, config=cfg)
    ox = R.rasterize(*params, cam, 1, bg, config=xla)
    # Image parity holds only when neither budget binds: on overflow the
    # paths drop different tails, and when max_per_tile binds the Pallas
    # path's lossless cull keeps MORE real contributors than the XLA
    # path's raw-count cap (see binning._tight_rects note), so the kept
    # sets legitimately differ.
    raw = bin_gaussians(proj, cam.height, cam.width, budget)
    caps_ok = (int(jnp.max(raw.tile_count)) <= cfg.max_per_tile
               and int(op["n_duplicates"]) <= budget)
    if caps_ok:
        a = np.asarray(op["render"])
        b = np.asarray(ox["render"])
        if not np.allclose(a, b, atol=3e-5, rtol=1e-3):
            return (f"FWD MISMATCH maxdiff={np.abs(a - b).max():.2e} "
                    f"seed={seed} regime={regime} cfg={cfg}")
    target = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))

    def loss(p):
        out = R.rasterize(*p, cam, 1, bg, config=cfg)
        return (photometric_loss(out["render"], target)
                + 0.1 * jnp.mean(out["final_transmittance"]))

    g = jax.grad(loss)(params)
    for name, arr in zip(("means", "scales", "quats", "opac", "shs"), g):
        if not bool(jnp.isfinite(arr).all()):
            return f"NON-FINITE grad {name} seed={seed} cfg={cfg}"
    return ""


def main(minutes: float = 30.0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    deadline = time.time() + minutes * 60
    seed = int(time.time()) % 100000
    trials = failures = 0
    while time.time() < deadline:
        msg = trial(seed)
        trials += 1
        if msg:
            failures += 1
            print(msg, flush=True)
        if trials % 10 == 0:
            print(f"[{trials} trials, {failures} failures]", flush=True)
        seed += 1
    print(f"DONE: {trials} trials, {failures} failures", flush=True)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(float(sys.argv[1]) if len(sys.argv) > 1 else 30)
             else 0)
