"""Iterate on the bench's SURFACE scene (round-5): find a city-like
street scene at 1080p where per-tile termination genuinely bites (the
regime the 45 Mpix/s CUDA baseline lives in), then port the winner into
bench.py.

Variants: surface-aligned opaque disks (trained-capture-like coverage)
vs the first random-quat attempt; each reports budgets, surviving
backward quanta, and the timed step.

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/tune_surface.py
"""
from __future__ import annotations

import time

import numpy as np

ITERS = 10
W, H = 1920, 1080


def canyon(rng, aligned: bool, opac_lo: float, opac_hi: float,
           size: float, n: int = 200_000):
    """Street canyon: ground + two facade walls, camera looking down."""
    n_g = n * 35 // 100
    n_w = (n - n_g) // 2
    gx = rng.uniform(-12, 12, n_g)
    gz = rng.uniform(-3, 3, n_g)
    ground = np.stack([gx, 0.02 * rng.normal(size=n_g), gz], 1)
    wx1 = rng.uniform(-12, 12, n_w)
    wy1 = -rng.uniform(0, 3, n_w)
    wall1 = np.stack([wx1, wy1, 3.0 + 0.02 * rng.normal(size=n_w)], 1)
    wx2 = rng.uniform(-12, 12, n_w)
    wy2 = -rng.uniform(0, 3, n_w)
    wall2 = np.stack([wx2, wy2, -3.0 + 0.02 * rng.normal(size=n_w)], 1)
    means = np.concatenate([ground, wall1, wall2]).astype(np.float32)
    m = means.shape[0]
    s = np.exp(rng.uniform(np.log(size * 0.7), np.log(size * 1.4),
                           (m, 3))).astype(np.float32)
    if aligned:
        # Disks aligned to their surface: thin along the normal
        # (y for ground, z for walls), identity rotation.
        thin = np.full((m,), 0.1, np.float32)
        s[:n_g, 1] *= thin[:n_g]
        s[n_g:, 2] *= thin[n_g:]
        quats = np.tile(np.array([1, 0, 0, 0], np.float32), (m, 1))
    else:
        quats = rng.normal(size=(m, 4)).astype(np.float32)
    opac = rng.uniform(opac_lo, opac_hi, (m,)).astype(np.float32)
    return means, s, quats, opac


def blocks(rng, n_layers: int, n_per: int, size: float,
           opac_lo: float = 0.85, opac_hi: float = 0.98):
    """Fronto-parallel depth complexity: building facades stacked in
    depth (camera at x=0 looking +x; layer k at x = 5 + 3k fills the
    widening frustum). The regime CUDA's per-pixel termination earns its
    throughput in: the first facade occludes everything behind."""
    ms, ss = [], []
    for k in range(n_layers):
        x = 5.0 + 3.0 * k
        half_h = 0.75 * x          # fovy/2 ~ 0.65 rad -> tan ~ 0.75
        half_w = 1.25 * x
        my = rng.uniform(-half_h, half_h, n_per)
        mz = rng.uniform(-half_w, half_w, n_per)
        mx = x + 0.05 * rng.normal(size=n_per)
        ms.append(np.stack([mx, my, mz], 1))
        # splat size scales with depth so every layer lands at ~4-6 px.
        s = np.empty((n_per, 3), np.float32)
        s[:, 1] = s[:, 2] = size * x * rng.uniform(0.8, 1.3, n_per)
        s[:, 0] = 0.1 * s[:, 1]
        ss.append(s)
    means = np.concatenate(ms).astype(np.float32)
    s = np.concatenate(ss).astype(np.float32)
    m = means.shape[0]
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (m, 1))
    opac = rng.uniform(opac_lo, opac_hi, (m,)).astype(np.float32)
    return means, s, quats, opac


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.train.loop import entry_budgets_for_scene
    from h3dgs_tpu.utils.losses import photometric_loss
    from h3dgs_tpu.utils.sh import rgb_to_sh

    print("backend:", jax.devices()[0].device_kind, flush=True)
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((3, H, W), 0.4, jnp.float32)
    canyon_cam = look_at_camera(eye=(-11.0, -1.5, 0.0),
                                target=(12.0, -1.3, 0.3),
                                fovx=1.2, width=W, height=H)
    blocks_cam = look_at_camera(eye=(0.0, 0.0, 0.0), target=(10.0, 0.0, 0.2),
                                fovx=1.2, width=W, height=H)

    def build(label, gen, cam, **kw):
        rng = np.random.default_rng(1)
        means, s, quats, opac = gen(rng, **kw)
        m = means.shape[0]
        shs = np.zeros((m, 16, 3), np.float32)
        shs[:, 0] = rgb_to_sh(rng.uniform(0.2, 0.8, (m, 3)))
        shs[:, 1:] = rng.normal(0, 0.05, (m, 15, 3)).astype(np.float32)
        params = tuple(jnp.asarray(a)
                       for a in (means, s, quats, opac, shs))
        gen_b, max_b = entry_budgets_for_scene(*params, cam, 3)
        cfg = RasterizeConfig(max_entries=max_b, max_per_tile=4096,
                              gen_entries=gen_b if gen_b != max_b else 0)
        n_q = int(jax.jit(lambda p: rasterize(
            *p, cam, 3, bg,
            config=cfg._replace(bwd_entries=max_b))["n_bwd_quanta"])(
                params))
        total_q = max_b // 128
        bwd_e = min(-(-max(n_q, 1) * 128 * 11 // 10 // cfg.chunk_e)
                    * cfg.chunk_e, max_b)
        cfg = cfg._replace(bwd_entries=bwd_e)
        print(f"[{label}] gen={gen_b} max={max_b} surv={n_q}/{total_q} "
              f"({n_q / total_q:.2f}) bwd_e={bwd_e}", flush=True)

        @jax.jit
        def step(p, tgt, salt):
            p = (p[0] + salt,) + p[1:]

            def loss(q):
                out = rasterize(*q, cam, 3, bg, config=cfg)
                return photometric_loss(out["render"], tgt)

            g = jax.grad(loss)(p)
            return sum(jnp.sum(jnp.abs(x)) for x in g)

        float(step(params, target, jnp.float32(0.0)))
        t0 = time.perf_counter()
        outs = [step(params, target, jnp.float32(0.5 + (i + 1) * 1e-7))
                for i in range(ITERS)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / ITERS
        print(f"[{label}] {dt * 1e3:.2f} ms = {W * H / dt / 1e6:.2f} "
              "Mpix/s", flush=True)

    import os
    which = os.environ.get("SURF_WHICH", "blocks")
    if which == "canyon":
        build("aligned s=0.05 op.9", canyon, canyon_cam, aligned=True,
              opac_lo=0.85, opac_hi=0.98, size=0.05)
        build("aligned s=0.08 op.9", canyon, canyon_cam, aligned=True,
              opac_lo=0.85, opac_hi=0.98, size=0.08)
        build("aligned s=0.05 op.7", canyon, canyon_cam, aligned=True,
              opac_lo=0.6, opac_hi=0.9, size=0.05)
        build("random  s=0.04 op.8", canyon, canyon_cam, aligned=False,
              opac_lo=0.7, opac_hi=0.97, size=0.04)
    else:
        build("blocks 8x40k s=.006", blocks, blocks_cam, n_layers=8,
              n_per=40_000, size=0.006)
        build("blocks 6x50k s=.008", blocks, blocks_cam, n_layers=6,
              n_per=50_000, size=0.008)
        build("blocks 10x30k s=.01", blocks, blocks_cam, n_layers=10,
              n_per=30_000, size=0.01)


if __name__ == "__main__":
    main()
