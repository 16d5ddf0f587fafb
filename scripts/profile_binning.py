"""Micro-profile binning internals on TPU: sort vs glue breakdown.

Run: /opt/venv/bin/python scripts/profile_binning.py
"""
from __future__ import annotations

import time

import numpy as np


def bench(label, fn, args, iters=20):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(lambda salt, *a: fn(*((a[0] + salt,) + a[1:])))
    outs = jfn(jnp.zeros((), args[0].dtype), *args)
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in jax.tree.leaves(outs)))
    t0 = time.perf_counter()
    acc = []
    for i in range(iters):
        outs = jfn(jnp.asarray((i + 1) % 3, args[0].dtype), *args)
        acc.append(jax.tree.leaves(outs)[0])
    float(sum(jnp.sum(a.astype(jnp.float32)) for a in acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:42s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    d = 1 << 21
    n = 200_000
    n_tiles = 8160  # 1080p at 16px tiles

    rng = np.random.default_rng(0)
    tile_id = jnp.asarray(
        np.sort(rng.integers(0, n_tiles, d)).astype(np.int32))
    depth_bits = jnp.asarray(
        rng.integers(0, 1 << 30, d).astype(np.int32))
    gauss = jnp.asarray(rng.integers(0, n, d).astype(np.int32))
    fdepth = jnp.asarray(rng.uniform(0.1, 100.0, d).astype(np.float32))

    # Current scheme: 2 int32 keys + 1 payload.
    bench("sort 2key(int32,int32)+1payload",
          lambda t, db, g: jax.lax.sort((t, db, g), num_keys=2),
          (tile_id, depth_bits, gauss))

    # Single fused int32 key (tile 13 bits << 18 | depth >> 12) + payload.
    def fused32(t, db, g):
        key = (t << 18) | (db >> 12)
        return jax.lax.sort((key, g), num_keys=1)
    bench("sort fused int32 key + 1 payload", fused32,
          (tile_id, depth_bits, gauss))

    # Single key, no payload (lower bound for the permute cost).
    bench("sort fused int32 key only",
          lambda t, db: jax.lax.sort(((t << 18) | (db >> 12),), num_keys=1),
          (tile_id, depth_bits))

    # int64 fused key + payload.
    def fused64(t, db, g):
        key = (t.astype(jnp.int64) << 32) | db.astype(jnp.int64)
        return jax.lax.sort((key, g), num_keys=1)
    bench("sort fused int64 key + 1 payload", fused64,
          (tile_id, depth_bits, gauss))

    # f32 depth comparator (what a naive port would do).
    bench("sort 2key(int32,f32)+1payload",
          lambda t, fd, g: jax.lax.sort((t, fd, g), num_keys=2),
          (tile_id, fdepth, gauss))

    # Gaussian-level depth sort (n elements, multiple payloads).
    gd = jnp.asarray(rng.uniform(0.1, 100.0, n).astype(np.float32))
    pay = [jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
           for _ in range(2)]
    bench("sort n=200k f32 key + 2 payloads",
          lambda fd, a, b: jax.lax.sort((fd, a, b), num_keys=1),
          (gd, *pay))

    # Scatter [D,16] row add (backward's scatter_entry_grads shape).
    rows = jnp.asarray(rng.normal(size=(d, 16)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, d).astype(np.int32))
    bench("scatter-add [D,16] rows -> [N,16]",
          lambda r, i: jnp.zeros((n + 1, 16), jnp.float32)
          .at[i].add(r, mode="drop"),
          (rows, idx))

    sidx = jnp.asarray(np.sort(rng.integers(0, n, d)).astype(np.int32))
    bench("segment-sum [D,16] sorted ids -> [N,16]",
          lambda r, i: jax.ops.segment_sum(r, i, num_segments=n + 1,
                                           indices_are_sorted=True),
          (rows, sidx))

    # Gather [C, 8, 256] (backward cotangent gather shape).
    c = d // 256
    g8 = jnp.asarray(rng.normal(size=(n_tiles + 1, 8, 256)).astype(np.float32))
    own = jnp.asarray(rng.integers(0, n_tiles, c).astype(np.int32))
    bench("gather tiles[owner] -> [C,8,256]",
          lambda g_, o: g_[o], (g8, own))


if __name__ == "__main__":
    main()
