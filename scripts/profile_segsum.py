"""Micro-profile of the segsum gradient-reduction pieces on the real
bench stream (round-5): find where the naive formulation lost 100 ms
(ab_segsum_20260820T104741Z: 191 vs 88 ms step).

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/profile_segsum.py
"""
from __future__ import annotations

import time

import numpy as np

from ab_r03 import scene

ITERS = 10


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from h3dgs_tpu.ops import binning
    from h3dgs_tpu.ops import pallas_blend as PB
    from h3dgs_tpu.ops.projection import project_gaussians
    from h3dgs_tpu.train.loop import entry_budgets_for_scene

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()
    n = params[0].shape[0]
    gen_b, max_b = entry_budgets_for_scene(*params, cam, 3)
    print(f"budgets: gen={gen_b} max={max_b}", flush=True)

    proj = jax.jit(lambda p: project_gaussians(*p, cam, 3))(params)
    bins = jax.jit(lambda m: binning.bin_gaussians_aligned(
        proj._replace(means2d=m), 1080, 1920, max_b, 4096, 128,
        gen_entries=gen_b, want_gen_tab=True))(proj.means2d)
    d = max_b
    rng = np.random.default_rng(0)
    dent_rows = jnp.asarray(rng.normal(size=(d, 16)).astype(np.float32))
    dent_cols = dent_rows.T
    owner = bins.owner
    gi = bins.gauss_idx
    gtab = bins.gen_tab
    stream = jax.jit(lambda m: PB.pack_rows(
        m, proj.conic, proj.rgb, proj.opacity,
        1.0 / jnp.maximum(proj.depth, 1e-6), gi, bins.perm,
        gtab))(proj.means2d).T     # [16, D] kernel layout

    def t(label, fn, *args):
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(*args))
        r = jfn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = jfn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:42s}: {dt * 1e3:8.2f} ms", flush=True)
        return r

    # Reference: the add-mode reduction.
    t("scatter_entry_grads (add)", lambda de: PB.scatter_entry_grads(
        de, gi, n, rank=bins.rank), dent_cols)

    # Whole segsum.
    t("segsum_entry_grads", lambda de: PB.segsum_entry_grads(
        de, stream, owner, gi, n, gtab[:, 0], gtab[:, 4], gen_b, 128,
        1920 // 16), dent_cols)

    # Pieces.
    t("dentries.T", lambda de: de.T + 1.0, dent_cols)
    t("repeat owner (jnp.repeat)", lambda o: jnp.repeat(
        o, 128, total_repeat_length=d), owner)
    t("repeat owner (broadcast)", lambda o: jnp.broadcast_to(
        o[:, None], (o.shape[0], 128)).reshape(-1), owner)

    srows = stream.T

    def genpos(st):
        def ib(c):
            return jax.lax.bitcast_convert_type(st[c], jnp.int32)
        off, rmx, rmy, spx = ib(11), ib(12), ib(13), ib(14)
        te = jnp.broadcast_to(owner[:, None],
                              (owner.shape[0], 128)).reshape(-1)
        tx = jnp.where(te >= 0, te % 120, 0)
        ty = jnp.where(te >= 0, te // 120, 0)
        gp = off + (ty - rmy) * jnp.maximum(spx, 1) + (tx - rmx)
        ok = (gi >= 0) & (te >= 0) & (gp >= 0) & (gp < gen_b)
        return jnp.where(ok, gp, gen_b)

    dst = t("gen_pos from [16,D] rows", genpos, stream)

    def scat(de, dst):
        rows = de.T
        return jnp.zeros((gen_b + 1, 16), jnp.float32).at[dst].set(
            rows, mode="drop", unique_indices=True)[:gen_b]

    acc = t("plain row scatter set (unique)", scat, dent_cols, dst)

    def scat_nu(de, dst):
        rows = de.T
        return jnp.zeros((gen_b + 1, 16), jnp.float32).at[dst].set(
            rows, mode="drop")[:gen_b]

    t("plain row scatter set (no unique)", scat_nu, dent_cols, dst)

    def scat_add(de, dst):
        rows = de.T
        return jnp.zeros((gen_b + 1, 16), jnp.float32).at[dst].add(
            rows, mode="drop")[:gen_b]

    t("row scatter ADD to gen slots", scat_add, dent_cols, dst)

    t("cumsum [gen,16] ax0", lambda a: jnp.cumsum(a, axis=0), acc)
    t("cumsum [16,gen] ax1 (pre-T)", lambda a: jnp.cumsum(a.T, axis=1),
      acc)

    c = jnp.cumsum(acc, axis=0)
    t("boundary gathers+diff", lambda cc: jnp.where(
        (gtab[:, 4] > 0)[:, None],
        cc[jnp.clip(gtab[:, 0] + gtab[:, 4] - 1, 0, gen_b - 1)]
        - jnp.where((gtab[:, 0] > 0)[:, None],
                    cc[jnp.maximum(gtab[:, 0] - 1, 0)], 0.0), 0.0), c)


if __name__ == "__main__":
    main()
