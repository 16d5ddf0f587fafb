"""Cross-chunk hierarchy merging (GaussianHierarchyMerger equivalent)."""
import jax.numpy as jnp
import numpy as np

from h3dgs_tpu.hierarchy import cut as cut_lib
from h3dgs_tpu.hierarchy import merge as merge_lib
from h3dgs_tpu.hierarchy import tree as tree_lib
from h3dgs_tpu.hierarchy.tree import N_CHILDREN

from .utils import random_scene


def _chunk_hierarchy(center_x, n=60, seed=0):
    """A chunk scene centered at (center_x, 0): its own points plus a ring
    of out-of-chunk duplicates (the scaffold-overlap pattern)."""
    means, scales, quats, opac, shs = random_scene(n, seed, sh_degree=1)
    means = means + np.asarray([center_x, 0.0, 0.0], np.float32)
    # Out-of-chunk duplicates 3 units to the side.
    dup = means[: n // 4] + np.asarray([3.0, 0.0, 0.0], np.float32)
    means = np.concatenate([means, dup])
    rep = lambda a: np.concatenate([a, a[: n // 4]])
    h = tree_lib.build_hierarchy(means, rep(shs), rep(opac),
                                 np.log(rep(scales)), rep(quats))
    return h, means


def test_prune_to_box_keeps_owned_partition():
    h, means = _chunk_hierarchy(0.0)
    box_min = np.asarray([-2.0, -2.0, -2.0])
    box_max = np.asarray([2.0, 2.0, 2.0])
    p = merge_lib.prune_to_box(h, box_min, box_max)
    p.validate()
    owned = (means[:, 0] >= -2) & (means[:, 0] <= 2)
    assert p.n_leaves == owned.sum()
    leaf = p.nodes[:, N_CHILDREN] == 0
    assert np.all(p.xyz[leaf, 0] >= -2) and np.all(p.xyz[leaf, 0] <= 2)
    # Cuts over the pruned tree still partition its leaves.
    c = cut_lib.expand_to_size(jnp.asarray(p.nodes), jnp.asarray(p.boxes),
                               jnp.asarray(1e-8, jnp.float32),
                               jnp.asarray([0.0, 0.0, -5.0]),
                               max_cut=p.n_nodes)
    assert int(c.count) == p.n_leaves


def test_merge_two_chunks():
    h0, m0 = _chunk_hierarchy(-2.0, seed=1)
    h1, m1 = _chunk_hierarchy(2.0, seed=2)
    centers = [np.asarray([-2.0, 0, 0]), np.asarray([2.0, 0, 0])]
    extents = [np.asarray([4.0, 8.0, 8.0])] * 2
    merged = merge_lib.merge_hierarchies([h0, h1], centers, extents)
    merged.validate()

    own0 = np.abs(m0[:, 0] - (-2.0)) <= 2.0
    own1 = np.abs(m1[:, 0] - 2.0) <= 2.0
    assert merged.n_leaves == own0.sum() + own1.sum()
    assert merged.nodes[0, N_CHILDREN] == 2  # global root over 2 chunk roots

    # Any cut over the merged tree partitions all owned leaves.
    for limit in (1e-8, 0.1, 1e12):
        c = cut_lib.expand_to_size(
            jnp.asarray(merged.nodes), jnp.asarray(merged.boxes),
            jnp.asarray(limit, jnp.float32),
            jnp.asarray([0.0, 0.0, -30.0]), max_cut=merged.n_nodes)
        idx = np.asarray(c.indices)[np.asarray(c.valid)]
        # Count leaves under each cut node on the host.
        n_leaves = 0
        for i in idx:
            stack = [int(i)]
            while stack:
                j = stack.pop()
                nc = merged.nodes[j, N_CHILDREN]
                if nc == 0:
                    n_leaves += 1
                else:
                    fc = merged.nodes[j, 1]
                    stack.extend(range(fc, fc + nc))
        assert n_leaves == merged.n_leaves, f"limit={limit}"

    # Merged root granularity behaves: a huge limit selects root only.
    c1 = cut_lib.expand_to_size(
        jnp.asarray(merged.nodes), jnp.asarray(merged.boxes),
        jnp.asarray(1e12, jnp.float32), jnp.asarray([0.0, 0.0, -30.0]),
        max_cut=4)
    assert int(c1.count) == 1


def test_prune_merged_tree_with_wide_root():
    """prune_to_box on an already-merged tree (root with K>2 children)
    must consider every child (review finding)."""
    hs, centers, extents = [], [], []
    for i, cx in enumerate((-2.0, 2.0, 6.0)):
        means, scales, quats, opac, shs = random_scene(40, seed=i,
                                                       sh_degree=1)
        means = means + np.array([cx, 0.0, 0.0], np.float32)
        hs.append(tree_lib.build_hierarchy(
            means, shs, opac, np.log(scales), quats, backend="numpy"))
        centers.append(np.array([cx, 0.0, 0.0], np.float32))
        extents.append(np.array([4.0, 100.0, 100.0], np.float32))
    merged = merge_lib.merge_hierarchies(hs, centers, extents)
    assert merged.nodes[merged.root][tree_lib.N_CHILDREN] == 3

    # A box covering everything: nothing should be pruned.
    pruned = merge_lib.prune_to_box(
        merged, np.array([-100.0, -100.0, -100.0], np.float32),
        np.array([100.0, 100.0, 100.0], np.float32))
    assert pruned.n_nodes == merged.n_nodes
    pruned.validate()

    # A box covering only the third chunk: its subtree must survive.
    pruned = merge_lib.prune_to_box(
        merged, np.array([4.5, -100.0, -100.0], np.float32),
        np.array([100.0, 100.0, 100.0], np.float32))
    pruned.validate()
    assert pruned.n_leaves > 0
    assert np.all(pruned.xyz[pruned.nodes[:, tree_lib.N_CHILDREN] == 0, 0]
                  > 4.0)
