"""Native (C++) hierarchy builder parity vs the numpy builder."""
import numpy as np
import pytest

from h3dgs_tpu.hierarchy import tree as tree_lib
from h3dgs_tpu.native import native_available

from .utils import random_scene

pytestmark = pytest.mark.skipif(
    not native_available(),
    reason="native library not built (make -C native)")


def _build_both(n=200, seed=0, locked=None):
    means, scales, quats, opac, shs = random_scene(n, seed, sh_degree=1)
    args = (means, shs, opac, np.log(scales), quats)
    h_np = tree_lib.build_hierarchy(*args, locked_leaf_mask=locked,
                                    backend="numpy")
    h_cc = tree_lib.build_hierarchy(*args, locked_leaf_mask=locked,
                                    backend="native")
    return h_np, h_cc


def test_native_matches_numpy():
    locked = np.arange(200) % 7 == 0
    h_np, h_cc = _build_both(locked=locked)
    h_cc.validate()
    np.testing.assert_array_equal(h_cc.nodes, h_np.nodes)
    np.testing.assert_array_equal(h_cc.anchors, h_np.anchors)
    np.testing.assert_allclose(h_cc.xyz, h_np.xyz, atol=1e-4)
    np.testing.assert_allclose(h_cc.alpha, h_np.alpha, atol=1e-4)
    np.testing.assert_allclose(h_cc.scaling, h_np.scaling, atol=1e-3)
    np.testing.assert_allclose(h_cc.boxes, h_np.boxes, atol=1e-3)
    np.testing.assert_allclose(h_cc.shs, h_np.shs, atol=1e-4)
    # Quaternions match up to sign and axis ordering of equal eigenvalues;
    # compare the covariances they produce instead.
    cov_np = tree_lib.covariance_np(h_np.scaling, h_np.rotation)
    cov_cc = tree_lib.covariance_np(h_cc.scaling, h_cc.rotation)
    np.testing.assert_allclose(cov_cc, cov_np, atol=1e-3)


def test_native_various_sizes():
    for n in (1, 2, 3, 17, 64):
        h_np, h_cc = _build_both(n=n, seed=n)
        h_cc.validate()
        np.testing.assert_array_equal(h_cc.nodes, h_np.nodes)
        np.testing.assert_allclose(h_cc.xyz, h_np.xyz, atol=1e-4)


def test_native_merger_matches_numpy():
    from h3dgs_tpu.hierarchy.merge import merge_hierarchies
    from h3dgs_tpu.native import merge_hierarchies_native

    hs, centers, extents = [], [], []
    for i, cx in enumerate((-2.0, 2.0, 6.0)):
        means, scales, quats, opac, shs = random_scene(60, seed=i,
                                                       sh_degree=1)
        means = means + np.array([cx, 0.0, 0.0], np.float32)
        # overlap: shift a third of the points into the neighbor chunk
        means[::3, 0] += 2.0
        locked = np.arange(60) % 5 == 0
        hs.append(tree_lib.build_hierarchy(
            means, shs, opac, np.log(scales), quats,
            locked_leaf_mask=locked, backend="numpy"))
        centers.append(np.array([cx, 0.0, 0.0], np.float32))
        extents.append(np.array([4.0, 100.0, 100.0], np.float32))

    m_np = merge_hierarchies(hs, centers, extents)
    m_cc = merge_hierarchies_native(hs, centers, extents)
    m_cc.validate()
    np.testing.assert_array_equal(m_cc.nodes, m_np.nodes)
    np.testing.assert_array_equal(m_cc.anchors, m_np.anchors)
    np.testing.assert_allclose(m_cc.xyz, m_np.xyz, atol=1e-4)
    np.testing.assert_allclose(m_cc.alpha, m_np.alpha, atol=1e-4)
    np.testing.assert_allclose(m_cc.shs, m_np.shs, atol=1e-4)
    np.testing.assert_allclose(m_cc.boxes, m_np.boxes, atol=1e-3)
    cov_np = tree_lib.covariance_np(m_np.scaling, m_np.rotation)
    cov_cc = tree_lib.covariance_np(m_cc.scaling, m_cc.rotation)
    np.testing.assert_allclose(cov_cc, cov_np, atol=1e-3)
