"""Quality-gated depth truncation on a SURFACE scene (the city GT).

The bench scene (volumetric random cloud) defeats tile-level truncation
(SOL.md round-4 facts); real captures are surfaces — walls/ground where
splats cover whole tiles and the proxy transmittance is near-exact. This
measures the speed/quality tradeoff where it is actually meant to run:
street + aerial views of the 220k-splat synthetic city, exact vs
trunc_theta, reporting PSNR / grad cosine / aligned-D / step time.

Run: PYTHONPATH=/root/.axon_site:.:scripts:tests python scripts/ab_trunc_city.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

W, H = 968, 544


def main(iters=8):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    import validate_city as vc

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.train.loop import entry_budgets_for_scene
    from h3dgs_tpu.utils.losses import photometric_loss

    print("backend:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    means, scales, quats, opac, shs, _ = vc.make_city(rng)
    params = tuple(jnp.asarray(a)
                   for a in (means, scales, quats, opac, shs))
    cams = {
        "street": look_at_camera(eye=(0.0, -1.5, 0.0),
                                 target=(4.0, -1.0, 0.5), fovx=1.2,
                                 width=W, height=H),
        "aerial25": look_at_camera(eye=(1.0, -25.0, 2.0),
                                   target=(0.0, -1.0, 0.0), fovx=1.2,
                                   width=W, height=H),
    }
    bg = jnp.zeros(3, jnp.float32)

    for cam_name, cam in cams.items():
        tgt = jnp.full((3, H, W), 0.35, jnp.float32)

        def cfgs_for(theta, c=1.0):
            gen_b, max_b = entry_budgets_for_scene(
                *params, cam, 0, quantum=128, trunc_theta=theta,
                trunc_c=c)
            return RasterizeConfig(
                max_entries=max_b, max_per_tile=4096, chunk_e=512,
                quantum=128,
                gen_entries=gen_b if gen_b != max_b else 0,
                trunc_theta=theta, trunc_c=c), gen_b, max_b

        def render_and_grads(cfg):
            @jax.jit
            def f(p):
                def loss(m):
                    out = rasterize(m, p[1], p[2], p[3], p[4], cam, 0,
                                    bg, config=cfg)
                    return (photometric_loss(out["render"], tgt),
                            out["render"])
                (l, img), g = jax.value_and_grad(loss, has_aux=True)(p[0])
                return jnp.clip(img, 0, 1), g
            img, g = f(params)
            return np.asarray(img), np.asarray(g)

        def time_step(cfg, salt0):
            @jax.jit
            def step(p, eps):
                def loss(m):
                    out = rasterize(m + eps, p[1], p[2], p[3], p[4],
                                    cam, 0, bg, config=cfg)
                    return photometric_loss(out["render"], tgt)
                l, g = jax.value_and_grad(loss)(p[0])
                return l + jnp.sum(g) * 1e-12
            float(step(params, jnp.float32(0.0)))
            t0 = time.perf_counter()
            outs = [step(params, jnp.float32(salt0 + 1e-7 * (i + 1)))
                    for i in range(iters)]
            float(outs[-1])
            return (time.perf_counter() - t0) / iters

        cfg0, gen0, max0 = cfgs_for(0.0)
        img0, g0 = render_and_grads(cfg0)
        dt0 = time_step(cfg0, 0.01)
        print(f"[{cam_name}] exact: gen={gen0} aligned={max0} "
              f"{dt0 * 1e3:.2f} ms", flush=True)
        for theta, c in ((0.003, 1.0), (0.01, 1.0), (0.03, 1.0)):
            cfg, gen_b, max_b = cfgs_for(theta, c)
            img, g = render_and_grads(cfg)
            mse = float(np.mean((img - img0) ** 2))
            psnr = -10 * np.log10(max(mse, 1e-12))
            cos = float((g * g0).sum()) / (
                (np.linalg.norm(g) + 1e-12)
                * (np.linalg.norm(g0) + 1e-12))
            dt = time_step(cfg, 0.02 + theta)
            print(f"[{cam_name}] theta={theta} c={c}: aligned={max_b} "
                  f"({max0 / max_b:.2f}x smaller) {dt * 1e3:.2f} ms "
                  f"({dt0 / dt:.2f}x faster) psnr={psnr:.1f}dB "
                  f"grad_cos={cos:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
