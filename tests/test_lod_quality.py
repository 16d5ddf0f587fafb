"""The headline differentiable-LOD property: post-optimization improves
COARSE-cut rendering quality (interior nodes learn to better summarize
their subtrees under the actual rendering loss), which is the entire point
of the reference's train_post stage."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.config import OptimizationConfig
from h3dgs_tpu.hierarchy import tree as tree_lib
from h3dgs_tpu.model.init import state_from_hierarchy
from h3dgs_tpu.ops import adam as adam_lib
from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
from h3dgs_tpu.train.post_step import make_post_train_step, render_cut
from h3dgs_tpu.train.step import ViewBatch
from h3dgs_tpu.utils.losses import psnr

from .utils import make_test_camera, random_scene

CFG = RasterizeConfig(max_entries=1 << 14, max_per_tile=256, chunk=16)

COARSE_LIMIT = 0.35   # granularity at which the cut is ~10x smaller


@pytest.mark.slow
def test_post_opt_improves_coarse_cuts():
    n = 120
    means, scales, quats, opac, shs = random_scene(n, 11, sh_degree=1)
    h = tree_lib.build_hierarchy(means, shs, opac, np.log(scales), quats)
    state, anchor_mask = state_from_hierarchy(h)
    cams = [make_test_camera(width=48, height=32, dist=d)
            for d in (14.0, 16.0, 18.0)]
    bg = jnp.zeros(3, jnp.float32)
    # GT = the flat (leaf-level) renders.
    gts = [rasterize(means, scales, quats, opac, shs, c, 1, bg,
                     config=CFG)["render"] for c in cams]
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)

    def coarse_psnr(st):
        vals = []
        for c, gt in zip(cams, gts):
            out = render_cut(st, nodes, boxes, c,
                             jnp.asarray(COARSE_LIMIT, jnp.float32), 1, bg,
                             CFG, max_cut=h.n_nodes)
            assert int(out["cut"].count) < n  # actually coarse
            vals.append(float(psnr(out["render"], gt)))
        return float(np.mean(vals))

    before = coarse_psnr(state)

    # Post-opt with the coarse limit (deterministic variant of the random
    # log-uniform tau sampling: trains exactly the cut we evaluate).
    opt_cfg = OptimizationConfig(iterations=80, position_lr_max_steps=80)
    step = make_post_train_step(opt_cfg, CFG, h.n_nodes,
                                skybox_locked=True, use_exposure=False)
    opt = adam_lib.init(state.trainable_dict())
    amask = jnp.asarray(anchor_mask)
    exp_row = jnp.eye(3, 4)
    for it in range(1, 81):
        c = cams[it % 3]
        b = ViewBatch(camera=c, gt_image=gts[it % 3],
                      alpha_mask=jnp.ones((1, 32, 48)),
                      invdepth=jnp.zeros((1, 32, 48)),
                      depth_mask=jnp.zeros((1, 32, 48)),
                      depth_reliable=jnp.asarray(False),
                      image_idx=jnp.asarray(0, jnp.int32))
        out = step(state, opt, b, nodes, boxes, amask, exp_row,
                   jnp.asarray(COARSE_LIMIT, jnp.float32),
                   jnp.asarray(float(it)), bg, jnp.asarray(1.0), 1)
        state, opt = out.state, out.opt

    after = coarse_psnr(state)
    assert after > before + 1.0, \
        f"post-opt did not improve coarse cuts: {before:.2f} -> {after:.2f}"
