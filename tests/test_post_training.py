"""Hierarchy fine-tuning (train_post equivalent): end-to-end on synthetic.

Checks the differentiable-LOD training loop: loss decreases, gradients
reach both children and parents, anchors + skybox rows stay frozen
(/root/reference/train_post.py:66-198).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.config import OptimizationConfig
from h3dgs_tpu.hierarchy import tree as tree_lib
from h3dgs_tpu.model.init import state_from_hierarchy
from h3dgs_tpu.ops import adam as adam_lib
from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
from h3dgs_tpu.train.post_step import (make_post_train_step, render_cut,
                                       sample_limit)
from h3dgs_tpu.train.step import ViewBatch

from .utils import make_test_camera, random_scene

CFG = RasterizeConfig(max_entries=1 << 14, max_per_tile=256, chunk=16)


def _setup(n=60, seed=0, n_locked=5):
    means, scales, quats, opac, shs = random_scene(n, seed, sh_degree=1)
    locked = np.arange(n) < n_locked
    h = tree_lib.build_hierarchy(means, shs, opac, np.log(scales), quats,
                                 locked_leaf_mask=locked)
    state, anchor_mask = state_from_hierarchy(h)
    cams = [make_test_camera(width=48, height=32, dist=d) for d in (3.5, 4.5)]
    bg = jnp.zeros(3, jnp.float32)
    # GT: the leaf-level render of a *perturbed* target scene so there is
    # something to learn.
    rng = np.random.default_rng(1)
    tgt_shs = shs + rng.normal(0, 0.2, shs.shape).astype(np.float32)
    gts = [rasterize(means, scales, quats, opac, tgt_shs, c, 1, bg,
                     config=CFG)["render"] for c in cams]
    return h, state, anchor_mask, cams, gts, bg


def _batch(cam, gt):
    h, w = gt.shape[1], gt.shape[2]
    return ViewBatch(camera=cam, gt_image=gt,
                     alpha_mask=jnp.ones((1, h, w)),
                     invdepth=jnp.zeros((1, h, w)),
                     depth_mask=jnp.zeros((1, h, w)),
                     depth_reliable=jnp.asarray(False),
                     image_idx=jnp.asarray(0, jnp.int32))


def test_sample_limit_in_range():
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    lims = np.asarray([sample_limit(k) for k in keys])
    assert np.all((lims >= 0.005 - 1e-9) & (lims <= 0.1 + 1e-9))
    assert lims.std() > 0


@pytest.mark.slow
def test_post_training_improves_and_locks():
    h, state, anchor_mask, cams, gts, bg = _setup()
    opt_cfg = OptimizationConfig(iterations=60)
    max_cut = h.n_nodes
    step = make_post_train_step(opt_cfg, CFG, max_cut, skybox_locked=True,
                                use_exposure=False)
    opt = adam_lib.init(state.trainable_dict())
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    amask = jnp.asarray(anchor_mask)
    exp_row = jnp.eye(3, 4)

    anchored_xyz0 = np.asarray(state.xyz)[anchor_mask]

    key = jax.random.PRNGKey(0)
    losses = []
    for it in range(60):
        key, k1 = jax.random.split(key)
        limit = sample_limit(k1)
        b = _batch(cams[it % 2], gts[it % 2])
        out = step(state, opt, b, nodes, boxes, amask, exp_row, limit,
                   jnp.asarray(float(it + 1)), bg, jnp.asarray(1.0), 1)
        state, opt = out.state, out.opt
        losses.append(float(out.photo_loss))
        assert int(out.cut_size) <= max_cut

    assert np.mean(losses[-10:]) < 0.75 * np.mean(losses[:10]), \
        f"post-opt did not learn: {np.mean(losses[:10])} -> " \
        f"{np.mean(losses[-10:])}"
    # Anchored rows are frozen.
    np.testing.assert_array_equal(np.asarray(state.xyz)[anchor_mask],
                                  anchored_xyz0)
    # Non-anchored rows moved.
    assert np.abs(np.asarray(state.features_dc)[~anchor_mask]).sum() > 0


def test_render_cut_with_skybox_rows():
    """Skybox rows (appended last) render with weight 1 after the cut."""
    n = 40
    means, scales, quats, opac, shs = random_scene(n, 3, sh_degree=1)
    h = tree_lib.build_hierarchy(means, shs, opac, np.log(scales), quats)
    state, _ = state_from_hierarchy(h)
    # Manually append two far-away "skybox" rows.
    m = h.n_nodes
    st2 = dataclasses.replace(
        state,
        xyz=jnp.concatenate([state.xyz, jnp.asarray([[0, 0, 40.0],
                                                     [1, 0, 40.0]])]),
        features_dc=jnp.concatenate([state.features_dc,
                                     jnp.full((2, 1, 3), 2.0)]),
        features_rest=jnp.concatenate([state.features_rest,
                                       jnp.zeros((2, 15, 3))]),
        opacity=jnp.concatenate([state.opacity, jnp.full((2, 1), 0.9)]),
        scaling=jnp.concatenate([state.scaling,
                                 jnp.full((2, 3), np.log(5.0))]),
        rotation=jnp.concatenate([state.rotation,
                                  jnp.tile(jnp.asarray([1.0, 0, 0, 0]),
                                           (2, 1))]),
        alive=jnp.concatenate([state.alive, jnp.ones(2, bool)]),
        max_radii2d=jnp.zeros(m + 2), xyz_gradient_accum=jnp.zeros(m + 2),
        denom=jnp.zeros(m + 2), n_skybox=2, skybox_last=True)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3, jnp.float32)
    out_sky = render_cut(st2, jnp.asarray(h.nodes), jnp.asarray(h.boxes),
                         cam, jnp.asarray(0.05), 1, bg, CFG, max_cut=m)
    out_nosky = render_cut(state, jnp.asarray(h.nodes),
                           jnp.asarray(h.boxes), cam, jnp.asarray(0.05), 1,
                           bg, CFG, max_cut=m)
    # The giant bright skybox Gaussians must change the image.
    assert float(jnp.abs(out_sky["render"] - out_nosky["render"]).mean()) \
        > 1e-3
