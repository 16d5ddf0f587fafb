"""Benchmark: rasterizer fwd+bwd throughput at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mpix/s of full forward+backward (render + photometric-loss grad
w.r.t. all Gaussian parameters) at 1920x1080 on a synthetic scene of
N_GAUSS Gaussians — the BASELINE.json north-star number.

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

BASELINE_MPIX_S = 45.0
N_GAUSS = 200_000
WIDTH, HEIGHT = 1920, 1080
WARMUP = 2
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from h3dgs_tpu.scene.camera import look_at_camera
    from h3dgs_tpu.utils.losses import photometric_loss
    from h3dgs_tpu.utils.sh import rgb_to_sh

    rng = np.random.default_rng(0)
    n = N_GAUSS
    means = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.005), np.log(0.03), (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rgb_to_sh(rng.uniform(0.1, 0.9, (n, 3)))
    shs[:, 1:] = rng.normal(0, 0.05, (n, 15, 3))

    cam = look_at_camera(eye=(0.0, -1.0, -6.0), target=(0, 0, 0), fovx=1.2,
                         width=WIDTH, height=HEIGHT)
    cfg = RasterizeConfig(max_entries=1 << 21, max_per_tile=1024, chunk=32)
    bg = jnp.zeros(3, jnp.float32)
    params = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
              jnp.asarray(opac), jnp.asarray(shs))
    target = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32) + 0.3

    def loss_fn(params, target):
        out = rasterize(*params, cam, 3, bg, config=cfg)
        return photometric_loss(out["render"], target)

    step = jax.jit(jax.value_and_grad(loss_fn))

    for _ in range(WARMUP):
        l, g = step(params, target)
        jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        l, g = step(params, target)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / ITERS

    mpix_s = (WIDTH * HEIGHT / 1e6) / dt
    print(json.dumps({
        "metric": "rasterizer_fwd_bwd_1080p",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 4),
    }))


if __name__ == "__main__":
    main()
