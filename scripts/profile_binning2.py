"""Stage-level binning profile + relayout candidates on TPU.

Run: /opt/venv/bin/python scripts/profile_binning2.py
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
    print(f"{label:46s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    d = 1 << 21
    n = 200_000
    n_tiles = 8160
    chunk_e = 256
    c = d // chunk_e

    rng = np.random.default_rng(0)
    gauss = jnp.asarray(rng.integers(0, n, d).astype(np.int32))
    dest = jnp.asarray(np.sort(rng.choice(d, d // 2, replace=False))
                       .astype(np.int32))
    gidx_half = gauss[: d // 2]

    # Current relayout: [D/2] scalar scatter-set into [D].
    bench("scatter-set [D/2] int32 -> [D]",
          lambda g, dst: jnp.full((d,), -1, jnp.int32)
          .at[dst].set(g, mode="drop"),
          (gidx_half, dest))

    # Candidate: per-chunk dynamic-slice gather (256 consecutive int32 each
    # at an arbitrary base) via lax.gather.
    bases = jnp.asarray(
        np.minimum(np.sort(rng.integers(0, d, c)), d - chunk_e)
        .astype(np.int32))

    def slice_gather(g, b):
        out = jax.vmap(
            lambda bb: jax.lax.dynamic_slice(g, (bb,), (chunk_e,)))(b)
        return out.reshape(-1)
    bench("slice-gather [C]x256 int32", slice_gather, (gauss, bases))

    # Candidate: same but for 16-f32 rows ([D,16] stream relayout).
    rows = jnp.asarray(rng.normal(size=(d, 16)).astype(np.float32))

    def slice_gather_rows(r, b):
        out = jax.vmap(lambda bb: jax.lax.dynamic_slice(
            r, (bb, 0), (chunk_e, 16)))(b)
        return out.reshape(-1, 16)
    bench("slice-gather [C]x(256,16) f32 rows", slice_gather_rows,
          (rows, bases))

    # Row gathers at the two widths used by binning.
    tab8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    bench("row gather [D] -> [D,8]", lambda t, g: t[g], (tab8, gauss))
    tab16 = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    bench("row gather [D] -> [D,16]", lambda t, g: t[g], (tab16, gauss))
    tab4 = jnp.asarray(rng.normal(size=(n_tiles, 4)).astype(np.float32))
    tile_of = jnp.asarray(rng.integers(0, n_tiles, d).astype(np.int32))
    bench("row gather [D] -> [D,4] (small table)",
          lambda t, g: t[g], (tab4, tile_of))

    # Transpose [D,16] -> [16,D] (pack_entries tail).
    bench("transpose [D,16] -> [16,D]",
          lambda r: r.T.copy(), (rows,))

    # cummax over [D] int32 (owner recovery).
    marker = jnp.asarray(rng.integers(0, n, d).astype(np.int32))
    bench("cummax [D] int32", lambda m: jax.lax.cummax(m), (marker,))

    # cumsum [D,16] f32 (backward cumsum-trick candidate).
    bench("cumsum [D,16] f32 axis0",
          lambda r: jnp.cumsum(r, axis=0), (rows,))

    # searchsorted small-table over [D] queries.
    starts_t = jnp.asarray(np.sort(rng.integers(0, d, n_tiles))
                           .astype(np.int32))
    pos = jnp.arange(d, dtype=jnp.int32)
    bench("searchsorted [T=8160] x [D] queries",
          lambda s: jnp.searchsorted(s, pos, side="right"), (starts_t,))

    # scatter at[starts].max over [N] into [D+1] (marker build).
    starts_n = jnp.asarray(rng.integers(0, d, n).astype(np.int32))
    iota_n = jnp.arange(n, dtype=jnp.int32) + 1
    bench("scatter-max [N] int32 -> [D+1]",
          lambda s: jnp.zeros((d + 1,), jnp.int32).at[s].max(iota_n),
          (starts_n,))


if __name__ == "__main__":
    main()
