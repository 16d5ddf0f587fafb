"""ctypes bindings for the native (C++) components.

The hierarchy builder and cross-chunk merger each have two interchangeable
implementations: vectorized numpy (hierarchy/tree.py, hierarchy/merge.py —
portable) and native C++ (native/hierarchy_native.cpp, for
multi-million-Gaussian chunks). ``build_hierarchy(backend="auto")`` and the
merger CLI pick native when the shared library is present; build it with
``make -C native``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_SEARCHED = False


def _lib_paths():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    yield os.path.join(here, "native", "libh3dgs_native.so")
    env = os.environ.get("H3DGS_NATIVE_LIB", "")
    if env:
        yield env


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    for p in _lib_paths():
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
            except OSError:
                continue
            fp = ctypes.POINTER(ctypes.c_float)
            ip = ctypes.POINTER(ctypes.c_int32)
            up = ctypes.POINTER(ctypes.c_uint8)
            lp = ctypes.POINTER(ctypes.c_int64)
            f = lib.h3dgs_build_hierarchy
            f.restype = ctypes.c_int64
            f.argtypes = [ctypes.c_int64, fp, fp, fp, fp, fp, up,
                          fp, fp, fp, fp, fp, ip, fp, up]
            try:
                g = lib.h3dgs_merge_hierarchies
                g.restype = ctypes.c_int64
                g.argtypes = [ctypes.c_int64, lp, fp, fp, fp, fp, fp, ip,
                              fp, up, fp, fp,
                              fp, fp, fp, fp, fp, ip, fp, up]
            except AttributeError:
                pass  # older library: builder only
            _LIB = lib
            break
    return _LIB


def native_available() -> bool:
    return load_native() is not None


def build_hierarchy_native(xyz, shs, alpha, scaling, rotation,
                           locked_leaf_mask=None):
    """Run the C++ builder; returns a hierarchy.tree.Hierarchy."""
    from ..hierarchy.tree import Hierarchy

    lib = load_native()
    if lib is None:
        raise RuntimeError(
            "native library not built (make -C native); use the numpy "
            "builder instead")

    def as32(a, shape):
        a = np.ascontiguousarray(a, np.float32).reshape(shape)
        return a

    n = int(np.asarray(xyz).shape[0])
    m = 2 * n - 1
    xyz = as32(xyz, (n, 3))
    shs_in = np.asarray(shs, np.float32).reshape(n, -1, 3)
    if shs_in.shape[1] < 16:
        shs_in = np.concatenate(
            [shs_in, np.zeros((n, 16 - shs_in.shape[1], 3), np.float32)],
            axis=1)
    shs_in = np.ascontiguousarray(shs_in)
    alpha = as32(alpha, (n,))
    scaling = as32(scaling, (n, 3))
    rotation = as32(rotation, (n, 4))
    locked = None
    if locked_leaf_mask is not None:
        locked = np.ascontiguousarray(locked_leaf_mask,
                                      np.uint8).reshape(n)

    o_xyz = np.empty((m, 3), np.float32)
    o_shs = np.empty((m, 16, 3), np.float32)
    o_alpha = np.empty((m,), np.float32)
    o_scaling = np.empty((m, 3), np.float32)
    o_rotation = np.empty((m, 4), np.float32)
    o_nodes = np.empty((m, 4), np.int32)
    o_boxes = np.empty((m, 2, 3), np.float32)
    o_anchor = np.empty((m,), np.uint8)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    up = ctypes.POINTER(ctypes.c_uint8)

    def F(a):
        return a.ctypes.data_as(fp)

    ret = lib.h3dgs_build_hierarchy(
        n, F(xyz), F(shs_in), F(alpha), F(scaling), F(rotation),
        locked.ctypes.data_as(up) if locked is not None else None,
        F(o_xyz), F(o_shs), F(o_alpha), F(o_scaling), F(o_rotation),
        o_nodes.ctypes.data_as(ip), F(o_boxes),
        o_anchor.ctypes.data_as(up))
    if ret != m:
        raise RuntimeError(f"native hierarchy build failed (ret={ret})")
    return Hierarchy(
        xyz=o_xyz, shs=o_shs, alpha=o_alpha, scaling=o_scaling,
        rotation=o_rotation, nodes=o_nodes, boxes=o_boxes,
        anchors=np.nonzero(o_anchor)[0].astype(np.int32))


def merge_hierarchies_native(hierarchies, centers, extents):
    """Run the C++ merger; mirrors hierarchy.merge.merge_hierarchies."""
    from ..hierarchy.tree import Hierarchy

    lib = load_native()
    if lib is None or not hasattr(lib, "h3dgs_merge_hierarchies"):
        raise RuntimeError("native library without merger; rebuild with "
                           "make -C native")
    k = len(hierarchies)
    sizes = np.asarray([h.n_nodes for h in hierarchies], np.int64)
    total_in = int(sizes.sum())

    def cat(field, shape):
        return np.ascontiguousarray(
            np.concatenate([np.asarray(getattr(h, field), np.float32)
                            .reshape((h.n_nodes,) + shape)
                            for h in hierarchies]))

    xyz = cat("xyz", (3,))
    shs = cat("shs", (16, 3))
    alpha = cat("alpha", ())
    scaling = cat("scaling", (3,))
    rotation = cat("rotation", (4,))
    boxes = cat("boxes", (2, 3))
    nodes = np.ascontiguousarray(
        np.concatenate([np.asarray(h.nodes, np.int32) for h in hierarchies]))
    anchor = np.zeros(total_in, np.uint8)
    off = 0
    for h in hierarchies:
        if h.anchors.size:
            anchor[off + np.asarray(h.anchors)] = 1
        off += h.n_nodes
    box_min = np.ascontiguousarray(
        np.stack([np.asarray(c, np.float32) - np.asarray(e, np.float32) / 2
                  for c, e in zip(centers, extents)]))
    box_max = np.ascontiguousarray(
        np.stack([np.asarray(c, np.float32) + np.asarray(e, np.float32) / 2
                  for c, e in zip(centers, extents)]))

    cap = total_in + 1
    o_xyz = np.empty((cap, 3), np.float32)
    o_shs = np.empty((cap, 16, 3), np.float32)
    o_alpha = np.empty((cap,), np.float32)
    o_scaling = np.empty((cap, 3), np.float32)
    o_rotation = np.empty((cap, 4), np.float32)
    o_nodes = np.empty((cap, 4), np.int32)
    o_boxes = np.empty((cap, 2, 3), np.float32)
    o_anchor = np.empty((cap,), np.uint8)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    up = ctypes.POINTER(ctypes.c_uint8)
    lp = ctypes.POINTER(ctypes.c_int64)

    def F(a):
        return a.ctypes.data_as(fp)

    ret = lib.h3dgs_merge_hierarchies(
        k, sizes.ctypes.data_as(lp), F(xyz), F(shs), F(alpha), F(scaling),
        F(rotation), nodes.ctypes.data_as(ip), F(boxes),
        anchor.ctypes.data_as(up), F(box_min), F(box_max),
        F(o_xyz), F(o_shs), F(o_alpha), F(o_scaling), F(o_rotation),
        o_nodes.ctypes.data_as(ip), F(o_boxes), o_anchor.ctypes.data_as(up))
    if ret < 0:
        raise RuntimeError(f"native merge failed (ret={ret})")
    m = int(ret)
    return Hierarchy(
        xyz=o_xyz[:m], shs=o_shs[:m], alpha=o_alpha[:m],
        scaling=o_scaling[:m], rotation=o_rotation[:m], nodes=o_nodes[:m],
        boxes=o_boxes[:m],
        anchors=np.nonzero(o_anchor[:m])[0].astype(np.int32))
