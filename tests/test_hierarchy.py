"""Hierarchy subsystem: build invariants, cut selection, LOD interpolation.

Mirrors the reference's native gaussian_hierarchy ops
(/root/reference/train_post.py:91-113) at the property level: cuts
partition the leaves, granularities are monotone, tau -> 0 recovers the
flat leaf render.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.hierarchy import cut as cut_lib
from h3dgs_tpu.hierarchy import io as hio
from h3dgs_tpu.hierarchy import tree as tree_lib
from h3dgs_tpu.hierarchy.tree import FIRST_CHILD, N_CHILDREN, PARENT
from h3dgs_tpu.ops import rasterize as R

from .utils import make_test_camera, random_scene

CFG = R.RasterizeConfig(max_entries=1 << 16, max_per_tile=512, chunk=16)


def build_random_hierarchy(n=50, seed=0, locked=None):
    means, scales, quats, opac, shs = random_scene(n, seed, sh_degree=1)
    return tree_lib.build_hierarchy(
        means, shs, opac, np.log(scales), quats,
        locked_leaf_mask=locked), (means, scales, quats, opac, shs)


def subtree_leaves(h, node):
    """Host-side reference walk (tests only)."""
    out = []
    stack = [int(node)]
    while stack:
        i = stack.pop()
        nc = h.nodes[i, N_CHILDREN]
        if nc == 0:
            out.append(i)
        else:
            fc = h.nodes[i, FIRST_CHILD]
            stack.extend(range(fc, fc + nc))
    return out


def test_build_structure():
    for n in (1, 2, 7, 50):
        h, _ = build_random_hierarchy(n)
        h.validate()
        assert h.n_nodes == 2 * n - 1
        assert h.n_leaves == n


def test_merge_moment_matching():
    h, (means, scales, quats, opac, _) = build_random_hierarchy(16, seed=3)
    # Total opacity mass (alpha * sqrt(det Sigma) ~ alpha * prod s) of the
    # root equals the sum over leaves, up to the alpha <= 1 clamp.
    leaf_mass = np.sum(opac * np.prod(scales, axis=1))
    r = h.root
    root_mass = h.alpha[r] * np.exp(np.sum(h.scaling[r]))
    assert root_mass <= leaf_mass + 1e-5
    if h.alpha[r] < 1.0 - 1e-6:  # unclamped -> exact conservation
        np.testing.assert_allclose(root_mass, leaf_mass, rtol=1e-4)
    # Root mean is the weighted mean of all leaves.
    w = opac * np.prod(scales, axis=1)
    mu = (w[:, None] * means).sum(0) / w.sum()
    np.testing.assert_allclose(h.xyz[r], mu, atol=1e-4)


def test_size_monotone_and_cut_partitions():
    h, _ = build_random_hierarchy(50, seed=1)
    for cam_pos in ([0, 0, -4], [0.1, 0.2, 0.0], [5, 5, 5]):
        size = np.asarray(cut_lib.node_sizes(
            jnp.asarray(h.boxes), jnp.asarray(cam_pos, jnp.float32)))
        p = h.nodes[:, PARENT]
        has_p = p >= 0
        assert np.all(size[p[has_p]] >= size[has_p] - 1e-6), \
            "granularity must be monotone along root->leaf paths"
        for limit in (1e-6, 0.05, 0.5, 1e12):
            c = cut_lib.expand_to_size(
                jnp.asarray(h.nodes), jnp.asarray(h.boxes),
                jnp.asarray(limit, jnp.float32),
                jnp.asarray(cam_pos, jnp.float32), max_cut=h.n_nodes)
            idx = np.asarray(c.indices)[np.asarray(c.valid)]
            assert len(idx) == int(c.count)
            covered = sorted(sum((subtree_leaves(h, i) for i in idx), []))
            expected = sorted(np.nonzero(h.nodes[:, N_CHILDREN] == 0)[0])
            assert covered == list(expected), \
                f"cut at limit={limit} must partition the leaves"
        # Degenerate limits select the extremes.
        c_leaf = cut_lib.expand_to_size(
            jnp.asarray(h.nodes), jnp.asarray(h.boxes),
            jnp.asarray(1e-8, jnp.float32),
            jnp.asarray(cam_pos, jnp.float32), max_cut=h.n_nodes)
        assert int(c_leaf.count) == h.n_leaves
        c_root = cut_lib.expand_to_size(
            jnp.asarray(h.nodes), jnp.asarray(h.boxes),
            jnp.asarray(1e12, jnp.float32),  # > diag/DIST_EPS even with the
            # camera inside a box (boxes containing the camera always recurse)
            jnp.asarray(cam_pos, jnp.float32), max_cut=h.n_nodes)
        assert int(c_root.count) == 1


def test_weights_range_and_leaf_limit():
    h, _ = build_random_hierarchy(40, seed=2)
    cam = jnp.asarray([0.0, 0.0, -4.0])
    c = cut_lib.expand_to_size(jnp.asarray(h.nodes), jnp.asarray(h.boxes),
                               jnp.asarray(0.03, jnp.float32), cam,
                               max_cut=h.n_nodes)
    w = np.asarray(c.weights)[np.asarray(c.valid)]
    assert np.all((w >= 0) & (w <= 1))
    # Tiny limit: every leaf fully itself (w == 1).
    c0 = cut_lib.expand_to_size(jnp.asarray(h.nodes), jnp.asarray(h.boxes),
                                jnp.asarray(1e-8, jnp.float32), cam,
                                max_cut=h.n_nodes)
    w0 = np.asarray(c0.weights)[np.asarray(c0.valid)]
    np.testing.assert_allclose(w0, 1.0, atol=1e-5)


def test_cut_overflow_reports_true_count():
    h, _ = build_random_hierarchy(30)
    cam = jnp.asarray([0.0, 0.0, -4.0])
    c = cut_lib.expand_to_size(jnp.asarray(h.nodes), jnp.asarray(h.boxes),
                               jnp.asarray(1e-8, jnp.float32), cam, max_cut=7)
    assert int(c.count) == 30          # true size
    assert int(np.asarray(c.valid).sum()) == 7  # clamped emission


def test_hier_roundtrip(tmp_path):
    h, _ = build_random_hierarchy(20, seed=5,
                                  locked=np.arange(20) < 4)
    p = os.path.join(tmp_path, "hierarchy.hier")
    hio.write_hier(p, h)
    h2 = hio.read_hier(p)
    for f in ("xyz", "shs", "alpha", "scaling", "rotation", "nodes",
              "boxes", "anchors"):
        np.testing.assert_array_equal(getattr(h, f), getattr(h2, f))
    ap = os.path.join(tmp_path, "anchors.bin")
    hio.write_anchors(ap, h.anchors)
    np.testing.assert_array_equal(hio.read_anchors(ap), h.anchors)
    assert h.anchors.size > 0  # locked leaves produced anchors


def test_leaf_cut_render_matches_flat():
    """tau -> 0 cut rendering == rendering the original flat Gaussians."""
    n = 40
    h, (means, scales, quats, opac, shs) = build_random_hierarchy(n, seed=7)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3, jnp.float32)

    flat = R.rasterize(means, scales, quats / np.linalg.norm(
        quats, axis=1, keepdims=True), opac, shs, cam, 1, bg, config=CFG)

    c = cut_lib.expand_to_size(jnp.asarray(h.nodes), jnp.asarray(h.boxes),
                               jnp.asarray(1e-8, jnp.float32),
                               cam.cam_center, max_cut=n)
    params = {
        "xyz": jnp.asarray(h.xyz), "f_dc": jnp.asarray(h.shs[:, :1]),
        "f_rest": jnp.asarray(h.shs[:, 1:]),
        "opacity": jnp.asarray(h.alpha[:, None]),
        "scaling": jnp.asarray(h.scaling),
        "rotation": jnp.asarray(h.rotation),
    }
    xyz, sc, qu, op, sh = cut_lib.interpolate_cut(params, c)
    out = R.rasterize(xyz, sc, qu, op, sh[:, :4], cam, 1, bg, config=CFG)
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(flat["render"]), atol=1e-3)


def test_coarse_cut_render_is_reasonable():
    """A coarse cut must still produce an image correlated with the fine
    render (merged Gaussians approximate their subtree)."""
    n = 200
    h, (means, scales, quats, opac, shs) = build_random_hierarchy(n, seed=9)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3, jnp.float32)
    params = {
        "xyz": jnp.asarray(h.xyz), "f_dc": jnp.asarray(h.shs[:, :1]),
        "f_rest": jnp.asarray(h.shs[:, 1:]),
        "opacity": jnp.asarray(h.alpha[:, None]),
        "scaling": jnp.asarray(h.scaling),
        "rotation": jnp.asarray(h.rotation),
    }

    def render_at(limit):
        c = cut_lib.expand_to_size(
            jnp.asarray(h.nodes), jnp.asarray(h.boxes),
            jnp.asarray(limit, jnp.float32), cam.cam_center, max_cut=2 * n)
        xyz, sc, qu, op, sh = cut_lib.interpolate_cut(params, c)
        out = R.rasterize(xyz, sc, qu, op, sh[:, :4], cam, 1, bg, config=CFG)
        return np.asarray(out["render"]), int(c.count)

    fine, n_fine = render_at(1e-8)
    coarse, n_coarse = render_at(0.2)
    assert n_coarse < n_fine
    err = np.abs(fine - coarse).mean()
    assert err < 0.15, f"coarse cut diverged from fine render: {err}"
