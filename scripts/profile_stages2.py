"""In-context stage profile: marginal costs that SUM to the step.

VERDICT r3 weak-3: standalone stage timings (own dispatch, no fusion
context) stopped adding up — 67 ms of "stages" inside a 47.6 ms forward.
This profiler measures *tail* times instead: T(k) = time of the full
fwd+bwd pipeline starting from stage k's precomputed outputs (device
arrays, salted per iteration). The marginal cost of stage k is
T(k-1) - T(k); marginals telescope to the measured full step by
construction, fusion across the remaining boundaries stays intact, and
each number answers "what would the step save if this stage were free".

Stages: projection | binning | pack+blend-kernels+scatter | combine+loss.
The third marginal is additionally subdivided by standalone timings of
pack_rows / blend fwd kernel / blend bwd kernel / scatter, NORMALIZED to
the in-context marginal (the raw standalone numbers are also printed).

Run: PYTHONPATH=. /opt/venv/bin/python scripts/profile_stages2.py [iters]
"""
from __future__ import annotations

import sys
import time

import numpy as np

from ab_r03 import scene

WIDTH, HEIGHT = 1920, 1080


def main(iters=10):
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    from h3dgs_tpu.ops import pallas_blend as PB
    from h3dgs_tpu.ops import rasterize as R
    from h3dgs_tpu.ops.binning import bin_gaussians_aligned, num_tiles
    from h3dgs_tpu.ops.projection import project_gaussians
    from h3dgs_tpu.train.loop import entry_budgets_for_scene
    from h3dgs_tpu.utils.losses import photometric_loss

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((3, HEIGHT, WIDTH), 0.4, jnp.float32)

    import os
    theta = float(os.environ.get("PROF_TRUNC_THETA", "0"))
    c = float(os.environ.get("PROF_TRUNC_C", "1"))
    quantum = int(os.environ.get("PROF_QUANTUM", "128"))
    chunk_e = int(os.environ.get("PROF_CHUNK_E", "512"))
    gen_b, budget = entry_budgets_for_scene(*params, cam, 3,
                                            quantum=quantum,
                                            trunc_theta=theta, trunc_c=c)
    split = theta > 0 or gen_b != budget
    cfg = R.RasterizeConfig(max_entries=budget, max_per_tile=4096,
                            chunk_e=chunk_e, quantum=quantum,
                            gen_entries=gen_b if split else 0,
                            trunc_theta=theta, trunc_c=c)
    print(f"cfg: Q={quantum} E={chunk_e} budget={budget} gen={gen_b} "
          f"theta={theta} c={c}", flush=True)

    salt_seq = [0]

    def timed(label, fn, *args):
        """Honest axon timing: salt arg 0 per iteration, sync via a
        scalar probe of the whole output (see SOL.md / memory notes)."""
        salt_seq[0] += 1
        base = 1e-3 * salt_seq[0]
        jfn = jax.jit(fn)
        probe = jfn(*args, jnp.float32(0.0))
        probe.block_until_ready()
        t0 = time.perf_counter()
        outs = [jfn(*args, jnp.float32(base + 1e-7 * (i + 1)))
                for i in range(iters)]
        float(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        print(f"  {label:44s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    # --- precomputed stage outputs (device arrays) ---
    proj = jax.jit(lambda p: project_gaussians(*p, cam, 3))(params)
    bins = jax.jit(lambda pr: bin_gaussians_aligned(
        pr, HEIGHT, WIDTH, cfg.max_entries, cfg.max_per_tile,
        cfg.quantum, fill=cfg.binning_fill, sort_mode=cfg.sort_mode,
        gen_entries=cfg.gen_entries, trunc_theta=cfg.trunc_theta,
        trunc_c=cfg.trunc_c))(proj)
    tiles_y, tiles_x = num_tiles(HEIGHT, WIDTH)
    n_tiles = tiles_y * tiles_x

    pcfg = PB.PallasBlendConfig(chunk_e=cfg.chunk_e, quantum=cfg.quantum,
                                bwd_entries=0)
    inv_depth = 1.0 / jnp.maximum(proj.depth, 1e-6)
    rows = jax.jit(lambda: PB.pack_rows(
        proj.means2d, proj.conic, proj.rgb, proj.opacity, inv_depth,
        bins.gauss_idx, bins.perm))()
    chunk_out = jax.jit(lambda r: PB.pallas_blend_fwd(
        r.T, bins.owner, tiles_x=tiles_x, tile=16, cfg=pcfg))(rows)
    n_q_per_tile = -(-bins.tile_count // cfg.quantum)
    fits = bins.tile_start + n_q_per_tile * cfg.quantum <= cfg.max_entries
    last_chunk = jnp.where((bins.tile_count > 0) & fits,
                           bins.tile_start // cfg.quantum
                           + n_q_per_tile - 1, -1).astype(jnp.int32)

    # --- tails (full fwd+bwd from each boundary) ---
    def t_full(p, salt):
        def loss(m):
            out = R.rasterize(m, p[1], p[2], p[3], p[4], cam, 3, bg,
                              config=cfg)
            return photometric_loss(out["render"], target)
        l, g = jax.value_and_grad(loss)(p[0] + salt)
        return l + jnp.sum(g) * 1e-12

    def t_proj(pr, salt):
        floats = (pr.means2d + salt, pr.conic, pr.rgb, pr.opacity,
                  pr.depth)

        def loss(fl):
            pr2 = pr._replace(means2d=fl[0], conic=fl[1], rgb=fl[2],
                              opacity=fl[3], depth=fl[4])
            img, *_ = R.blend_tiles_pallas(pr2, HEIGHT, WIDTH, bg, cfg)
            return photometric_loss(img, target)
        l, g = jax.value_and_grad(loss)(floats)
        return l + sum(jnp.sum(x) for x in g) * 1e-12

    def t_bins(pr, bn, salt):
        floats = (pr.means2d + salt, pr.conic, pr.rgb, pr.opacity,
                  pr.depth)

        def loss(fl):
            pr2 = pr._replace(means2d=fl[0], conic=fl[1], rgb=fl[2],
                              opacity=fl[3], depth=fl[4])
            img, *_ = R.blend_from_bins(pr2, bn, HEIGHT, WIDTH, bg, cfg)
            return photometric_loss(img, target)
        l, g = jax.value_and_grad(loss)(floats)
        return l + sum(jnp.sum(x) for x in g) * 1e-12

    def t_comb(co, salt):
        def loss(co2):
            out = PB._combine_chunks(co2, bins.owner, last_chunk, n_tiles)
            color = out[:, 0:3, :] + out[:, 4, :][:, None, :] \
                * bg[None, :, None]
            img = color.reshape(tiles_y, tiles_x, 3, 16, 16).transpose(
                2, 0, 3, 1, 4).reshape(3, tiles_y * 16, tiles_x * 16)
            return photometric_loss(img[:, :HEIGHT, :WIDTH], target)
        l, g = jax.value_and_grad(loss)(co + salt)
        return l + jnp.sum(g) * 1e-12

    img0 = jax.jit(lambda: PB._combine_chunks(
        chunk_out, bins.owner, last_chunk, n_tiles)[:, 0:3, :].reshape(
        tiles_y, tiles_x, 3, 16, 16).transpose(2, 0, 3, 1, 4).reshape(
        3, tiles_y * 16, tiles_x * 16)[:, :HEIGHT, :WIDTH])()

    def t_loss(img, salt):
        l, g = jax.value_and_grad(
            lambda im: photometric_loss(im, target))(img + salt)
        return l + jnp.sum(g) * 1e-12

    print("tails (fwd+bwd from stage boundary):", flush=True)
    dt_full = timed("FULL step (from params)", t_full, params)
    dt_proj = timed("from projection", t_proj, proj)
    dt_bins = timed("from binning", t_bins, proj, bins)
    dt_comb = timed("from kernel output (combine+loss)", t_comb, chunk_out)
    dt_loss = timed("from image (loss only)", t_loss, img0)

    # --- standalone sub-pieces of the pack+kernel+scatter marginal ---
    print("standalone sub-pieces (own dispatch):", flush=True)

    def s_pack(salt):
        r = PB.pack_rows(proj.means2d + salt, proj.conic, proj.rgb,
                         proj.opacity, inv_depth, bins.gauss_idx,
                         bins.perm)
        return jnp.sum(r[:, 0])

    def s_fwd(r, salt):
        co = PB.pallas_blend_fwd((r + salt).T, bins.owner,
                                 tiles_x=tiles_x, tile=16, cfg=pcfg)
        return jnp.sum(co[:, 0, 0])

    g_q = jnp.ones_like(chunk_out)

    def s_bwd(r, salt):
        de = PB.pallas_blend_bwd((r + salt).T, bins.owner,
                                 g_q, tiles_x=tiles_x, tile=16, cfg=pcfg)
        return jnp.sum(de[0])

    dentries = jax.jit(lambda r: PB.pallas_blend_bwd(
        r.T, bins.owner, g_q, tiles_x=tiles_x, tile=16, cfg=pcfg))(rows)

    def s_scat(de, salt):
        outs = PB.scatter_entry_grads(de + salt, bins.gauss_idx,
                                      proj.means2d.shape[0],
                                      rank=bins.rank)
        return sum(jnp.sum(o) for o in outs)

    dt_pack = timed("pack_rows", s_pack)
    dt_kf = timed("blend fwd kernel", s_fwd, rows)
    dt_kb = timed("blend bwd kernel", s_bwd, rows)
    dt_sc = timed("gradient scatter", s_scat, dentries)

    # --- ledger ---
    m_proj = dt_full - dt_proj
    m_bin = dt_proj - dt_bins
    m_blend = dt_bins - dt_comb
    sub = max(dt_pack + dt_kf + dt_kb + dt_sc, 1e-9)
    print("\nledger (marginals; sum == FULL by construction):", flush=True)
    print(f"  projection fwd+bwd      {m_proj * 1e3:8.2f} ms", flush=True)
    print(f"  binning                 {m_bin * 1e3:8.2f} ms", flush=True)
    print(f"  pack+kernels+scatter    {m_blend * 1e3:8.2f} ms", flush=True)
    for nm, v in (("pack", dt_pack), ("fwd kernel", dt_kf),
                  ("bwd kernel", dt_kb), ("scatter", dt_sc)):
        print(f"    ~ {nm:20s} {m_blend * v / sub * 1e3:8.2f} ms "
              f"(standalone {v * 1e3:.2f})", flush=True)
    print(f"  combine+loss fwd+bwd    {dt_comb * 1e3:8.2f} ms "
          f"(loss-only tail {dt_loss * 1e3:.2f})", flush=True)
    print(f"  TOTAL                   {dt_full * 1e3:8.2f} ms "
          f"({WIDTH * HEIGHT / dt_full / 1e6:.2f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
