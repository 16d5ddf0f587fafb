"""Standalone projection-stage profile (round-5): the ledger charges
13.7 ms fwd+bwd to projection at N=200k — ~10x over its bandwidth bound.
Isolate fwd, fwd+bwd, and the SH/cov sub-chains to find the loss.

Run: PYTHONPATH=/root/.axon_site:.:scripts python scripts/profile_proj.py
"""
from __future__ import annotations

import time

import numpy as np

from ab_r03 import scene

ITERS = 20


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from h3dgs_tpu.ops.projection import (_eval_sh_components,
                                          project_gaussians)

    print("backend:", jax.devices()[0].device_kind, flush=True)
    params, cam = scene()
    means, scales, quats, opac, shs = params

    def t(label, fn, *args):
        jfn = jax.jit(fn)
        r = jfn(*args)
        jax.block_until_ready(r)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = jfn(*args)
        jax.block_until_ready(r)
        print(f"{label:34s}: {(time.perf_counter() - t0) / ITERS * 1e3:7.2f}"
              " ms", flush=True)

    def proj_scalar(p):
        pr = project_gaussians(*p, cam, 3)
        return (jnp.sum(pr.means2d) + jnp.sum(pr.conic) + jnp.sum(pr.rgb)
                + jnp.sum(pr.depth) + jnp.sum(pr.opacity))

    t("projection fwd", lambda p: proj_scalar(p), params)
    t("projection fwd+bwd", lambda p: jax.grad(proj_scalar)(p), params)

    def sh_scalar(s, m):
        d = m - jnp.asarray(cam.cam_center)[None, :]
        n = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        return jnp.sum(_eval_sh_components(3, s, n[:, 0], n[:, 1],
                                           n[:, 2]))

    t("SH deg3 fwd", lambda s, m: sh_scalar(s, m), shs, means)
    t("SH deg3 fwd+bwd",
      lambda s, m: jax.grad(sh_scalar, argnums=(0, 1))(s, m), shs, means)

    def cov_scalar(p):
        pr = project_gaussians(p[0], p[1], p[2], p[3],
                               jnp.zeros((p[0].shape[0], 16, 3)), cam, 3,
                               colors_precomp=jnp.zeros(
                                   (p[0].shape[0], 3)))
        return jnp.sum(pr.means2d) + jnp.sum(pr.conic) + jnp.sum(pr.depth)

    t("geom-only fwd", lambda p: cov_scalar(p), params)
    t("geom-only fwd+bwd", lambda p: jax.grad(cov_scalar)(p), params)


if __name__ == "__main__":
    main()
