"""On-chip A/B: fused single-table cut interpolation vs the round-4
per-attribute gather formulation (VERDICT r4 item 5 — the last XLA-glue
reference capability folded into the device pipeline's gather path).

Checks BIT equality of all five interpolated outputs (the fused path
runs the identical lerp arithmetic on identically gathered f32 values)
and times: (a) interpolation alone, (b) the post-training step's
select+interp+splat forward, (c) interpolation with the viewer's cached
table. Uses the trained city hierarchy when /tmp/h3dgs_city exists,
else a synthetic tree.

Run: PYTHONPATH=/root/.axon_site:.:scripts:tests python scripts/ab_interp.py
"""
from __future__ import annotations

import os
import time

import numpy as np

WORK = os.environ.get("CITY_WORK", "/tmp/h3dgs_city")
ITERS = 30


def legacy_interpolate_cut(params, cut):
    """The pre-round-5 formulation: one narrow gather per attribute
    (kept verbatim for the A/B; hierarchy/cut.py git history)."""
    import jax.numpy as jnp
    k = cut.indices.shape[0]
    ci = jnp.where(cut.valid, cut.indices, 0)
    pi = cut.parents
    w = cut.weights[:, None]

    def lerp(arr, extra_dims=0):
        wl = w.reshape((k, 1) + (1,) * extra_dims) if extra_dims else w
        return wl * arr[ci] + (1.0 - wl) * arr[pi]

    xyz = lerp(params["xyz"])
    scales = lerp(jnp.exp(params["scaling"]))
    feats = jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1)
    shs = lerp(feats, extra_dims=1)
    opac = lerp(jnp.abs(params["opacity"]))[:, 0]
    opac = jnp.where(cut.valid, opac, 0.0)
    qc = params["rotation"][ci]
    qp = params["rotation"][pi]
    dots = jnp.sum(qc * qp, axis=-1, keepdims=True)
    qp = jnp.where(dots < 0, -qp, qp)
    quats = w * qc + (1.0 - w) * qp
    return xyz, scales, quats, opac, shs


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from h3dgs_tpu.hierarchy import cut as cut_lib
    from h3dgs_tpu.hierarchy.io import read_hier
    from h3dgs_tpu.model.init import state_from_hierarchy

    print("backend:", jax.devices()[0].device_kind, flush=True)
    merged = os.path.join(WORK, "output/merged.hier")
    h = read_hier(merged)
    state, _ = state_from_hierarchy(h)
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    params = state.trainable_dict()
    max_cut = 1 << 16
    print(f"hierarchy: {h.n_nodes} nodes, max_cut={max_cut}", flush=True)

    cam_center = jnp.asarray([0.0, -20.0, 0.0], jnp.float32)
    limit = jnp.asarray(0.01, jnp.float32)
    cut = jax.jit(lambda: cut_lib.expand_to_size(
        nodes, boxes, limit, cam_center, max_cut))()
    print(f"cut count: {int(cut.count)}", flush=True)

    f_old = jax.jit(lambda p, c: legacy_interpolate_cut(p, c))
    f_new = jax.jit(lambda p, c: cut_lib.interpolate_cut(p, c))
    table = jax.jit(cut_lib.interp_table)(params)
    f_tab = jax.jit(lambda t, c: cut_lib.interpolate_cut(params, c, t))

    a = f_old(params, cut)
    b = f_new(params, cut)
    c = f_tab(table, cut)
    names = ["xyz", "scales", "quats", "opac", "shs"]
    ok = True
    for nm, x, y, z in zip(names, a, b, c):
        x, y, z = (np.asarray(v) for v in (x, y, z))
        bit_new = np.array_equal(x, y)
        bit_tab = np.array_equal(x, z)
        ok &= bit_new and bit_tab
        d = float(np.abs(x - y).max())
        print(f"  {nm}: fused bit-equal={bit_new} cached-table "
              f"bit-equal={bit_tab} max|d|={d:.1e}", flush=True)

    def timeit(f, *args):
        r = f(*args)
        jax.block_until_ready(r)
        leaf = jax.tree.leaves(r)[0]
        float(np.asarray(leaf).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = f(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / ITERS * 1e3

    t_old = timeit(f_old, params, cut)
    t_new = timeit(f_new, params, cut)
    t_tab = timeit(f_tab, table, cut)
    print(f"interp alone: legacy={t_old:.2f} ms fused={t_new:.2f} ms "
          f"cached-table={t_tab:.2f} ms", flush=True)

    # Post-training-style fwd+bwd through the interpolation (grads reach
    # both child and parent rows — the differentiable-LOD path).
    def loss_with(interp, p):
        xyz, scales, quats, opac, shs = interp(p, cut)
        return (jnp.sum(xyz * xyz) + jnp.sum(scales) + jnp.sum(quats)
                + jnp.sum(opac) + jnp.sum(shs * shs))

    g_old = jax.jit(lambda p: jax.grad(
        lambda q: loss_with(legacy_interpolate_cut, q))(p))
    g_new = jax.jit(lambda p: jax.grad(
        lambda q: loss_with(cut_lib.interpolate_cut, q))(p))
    ga = g_old(params)
    gb = g_new(params)
    for k in sorted(ga):
        x, y = np.asarray(ga[k]), np.asarray(gb[k])
        # Padding rows of the capacity-padded state can hold -inf
        # scaling (log 0) whose grad chains are non-finite in BOTH
        # formulations identically; compare where either side is finite
        # and separately require the non-finite masks to MATCH.
        fx, fy = np.isfinite(x), np.isfinite(y)
        if not np.array_equal(fx, fy):
            print(f"  grad[{k}]: non-finite masks differ FAIL",
                  flush=True)
            ok = False
            continue
        m = fx
        d = float(np.abs(x[m] - y[m]).max()) if m.any() else 0.0
        rel = d / (float(np.abs(x[m]).max()) + 1e-30 if m.any() else 1.0)
        g_ok = rel <= 1e-6
        ok &= g_ok
        print(f"  grad[{k}]: max|d|={d:.2e} rel={rel:.2e} "
              f"{'OK' if g_ok else 'FAIL'}", flush=True)
    tg_old = timeit(g_old, params)
    tg_new = timeit(g_new, params)
    print(f"interp fwd+bwd: legacy={tg_old:.2f} ms fused={tg_new:.2f} ms",
          flush=True)
    print("RESULT:", "PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
