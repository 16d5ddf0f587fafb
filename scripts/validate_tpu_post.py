"""On-hardware validation of hierarchy post-optimization (differentiable
LOD): the synthetic fine-tune on the real TPU through the compiled Pallas
path — gradients through cut interpolation to children AND parents, with
anchor/skybox locking.

Run: /opt/venv/bin/python scripts/validate_tpu_post.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    from h3dgs_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()

    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from tests.test_post_training import _batch, _setup

    from h3dgs_tpu.config import OptimizationConfig
    from h3dgs_tpu.ops import adam as adam_lib
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.train.post_step import make_post_train_step, sample_limit

    print("backend:", jax.devices()[0].device_kind, flush=True)
    h, state, anchor_mask, cams, gts, bg = _setup(n=200, seed=0,
                                                  n_locked=12)
    cfg = RasterizeConfig(max_entries=1 << 14, max_per_tile=256)
    iters = 200
    opt_cfg = OptimizationConfig(iterations=iters)
    step = make_post_train_step(opt_cfg, cfg, h.n_nodes,
                                skybox_locked=True, use_exposure=False)
    opt = adam_lib.init(state.trainable_dict())
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    amask = jnp.asarray(anchor_mask)
    exp_row = jnp.eye(3, 4)
    anchored0 = np.asarray(state.xyz)[anchor_mask]

    key = jax.random.PRNGKey(0)
    losses = []
    t0 = time.perf_counter()
    for it in range(iters):
        key, k1 = jax.random.split(key)
        limit = sample_limit(k1)
        b = _batch(cams[it % 2], gts[it % 2])
        out = step(state, opt, b, nodes, boxes, amask, exp_row, limit,
                   jnp.asarray(float(it + 1)), bg, jnp.asarray(1.0), 1)
        state, opt = out.state, out.opt
        losses.append(float(out.photo_loss))
        if it in (0, iters // 2, iters - 1):
            print(f"[{it}] loss={losses[-1]:.5f} cut={int(out.cut_size)} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    early, late = np.mean(losses[:20]), np.mean(losses[-20:])
    frozen = np.array_equal(np.asarray(state.xyz)[anchor_mask], anchored0)
    ok = late < 0.75 * early and frozen
    print(f"TPU post-opt validation: loss {early:.5f} -> {late:.5f}, "
          f"anchors frozen={frozen} ({'OK' if ok else 'FAILED'})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
