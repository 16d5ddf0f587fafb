"""Isolate Pallas blend per-grid-step overhead: same entry stream, three
chunk sizes. Run: /opt/venv/bin/python scripts/profile_kernel_steps.py
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from h3dgs_tpu.ops.pallas_blend import (PallasBlendConfig,
                                            pallas_blend_fwd)

    d = 5 << 19  # 2.62M slots
    tiles_x, tile = 120, 16
    n_tiles = 120 * 68
    rng = np.random.default_rng(0)

    packed = np.zeros((16, d), np.float32)
    packed[0] = rng.uniform(0, 1920, d)   # mx
    packed[1] = rng.uniform(0, 1080, d)   # my
    packed[2] = 0.05                      # conic a
    packed[3] = 0.0
    packed[4] = 0.05
    packed[5:8] = 0.5                     # rgb
    packed[8] = 0.5                       # opacity
    packed[9] = 0.3                       # invdepth
    packed = jnp.asarray(packed)

    for ce in (128, 256, 512):
        # owner is per QUANTUM; quantum=ce keeps one owner per grid step
        # (pure step-width comparison, no segmentation).
        n_chunks = d // ce
        owner = jnp.asarray(
            (np.arange(n_chunks) * n_tiles // n_chunks).astype(np.int32))
        cfg = PallasBlendConfig(chunk_e=ce, quantum=ce)
        fn = jax.jit(lambda p, o, _cfg=cfg: pallas_blend_fwd(
            p, o, tiles_x=tiles_x, tile=tile, cfg=_cfg))
        out = fn(packed, owner)
        float(jnp.sum(out))
        iters = 10
        t0 = time.perf_counter()
        acc = []
        for i in range(iters):
            acc.append(fn(packed + np.float32(i) * 1e-6, owner))
        float(sum(jnp.sum(a) for a in acc))
        dt = (time.perf_counter() - t0) / iters
        print(f"chunk_e={ce:4d}: {n_chunks:6d} steps  {dt * 1e3:7.2f} ms "
              f"({dt / n_chunks * 1e6:5.2f} us/step)")


if __name__ == "__main__":
    main()
