"""Renderer facade with the reference's API surface and output keys.

Drop-in counterparts of ``gaussian_renderer.{render, render_post,
render_coarse}`` (/root/reference/gaussian_renderer/__init__.py:20,138,296)
over the TPU pipeline. The library-internal entry points remain
``ops.rasterize.rasterize`` / ``train.post_step.render_cut`` — this module
exists so reference users find the familiar call shapes:

  render(camera, state, bg)            -> {"render", "depth",
                                           "viewspace_points",
                                           "visibility_filter", "radii"}
  render_post(camera, state, nodes, boxes, limit, ...)  (hierarchy cut)
  render_coarse(camera, state, bg)     (no depth output read)

Differences kept deliberately: "viewspace_points" is the zeros [N,2]
means2d offset whose gradient is the densification signal (the
reference's screenspace_points trick, :28-33) — pass it yourself if you
differentiate; "depth" is inverse depth, as in the reference
(train_single.py:98,111-117).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .model.state import GaussianState
from .ops.rasterize import RasterizeConfig, rasterize
from .scene.camera import Camera
from .train.post_step import render_cut
from .train.step import apply_exposure


def _as_reference_dict(out, means2d_offset):
    return {
        "render": out["render"],
        "depth": out["invdepth"],
        "viewspace_points": means2d_offset,
        "visibility_filter": out["visibility_filter"],
        "radii": out["radii"],
        "final_transmittance": out["final_transmittance"],
        "n_duplicates": out["n_duplicates"],
    }


def render(viewpoint_camera: Camera, state: GaussianState, bg_color,
           scaling_modifier: float = 1.0, sh_degree: Optional[int] = None,
           use_trained_exp: bool = False,
           exposure: Optional[jnp.ndarray] = None,
           means2d_offset: Optional[jnp.ndarray] = None,
           indices: Optional[jnp.ndarray] = None,
           config: RasterizeConfig = RasterizeConfig()):
    """Single-chunk training render (gaussian_renderer/__init__.py:20-135).

    ``indices``: optional int32 [M] subset of rows to splat (the
    reference's index-subset path, gaussian_renderer/__init__.py:97-103).
    TPU idiom: M is a static bucket — pad with -1; padded rows get
    opacity 0 and are culled losslessly. ``visibility_filter`` is
    scattered back to full [N] (reference :120-127); gradients (incl.
    the ``means2d_offset`` densification signal) flow to the selected
    rows through the gather.
    """
    deg = state.max_sh_degree if sh_degree is None else sh_degree
    if means2d_offset is None:
        means2d_offset = jnp.zeros((state.capacity, 2), jnp.float32)
    xyz = state.xyz
    scaling = state.get_scaling()
    rotation = state.get_rotation()
    opacity = state.get_opacity()[:, 0]
    features = state.get_features(deg)
    m2d = means2d_offset
    if indices is not None:
        indices = jnp.asarray(indices, jnp.int32)
        safe = jnp.maximum(indices, 0)
        sel = indices >= 0
        xyz = xyz[safe]
        scaling = scaling[safe]
        rotation = rotation[safe]
        opacity = jnp.where(sel, opacity[safe], 0.0)
        features = features[safe]
        m2d = m2d[safe]
    out = rasterize(
        xyz, scaling, rotation, opacity, features,
        viewpoint_camera, deg, jnp.asarray(bg_color),
        scale_modifier=scaling_modifier, means2d_offset=m2d,
        config=config)
    if use_trained_exp and exposure is not None:
        out["render"] = jnp.clip(
            apply_exposure(out["render"], exposure), 0.0, 1.0)
    if indices is not None:
        n = state.capacity
        vis = jnp.zeros((n,), bool).at[jnp.where(indices >= 0, indices, n)
                                       ].set(out["visibility_filter"],
                                             mode="drop")
        radii = jnp.zeros((n,), out["radii"].dtype).at[
            jnp.where(indices >= 0, indices, n)].set(out["radii"],
                                                     mode="drop")
        out = dict(out, visibility_filter=vis, radii=radii)
    return _as_reference_dict(out, means2d_offset)


def render_coarse(viewpoint_camera: Camera, state: GaussianState, bg_color,
                  scaling_modifier: float = 1.0,
                  sh_degree: Optional[int] = None,
                  means2d_offset: Optional[jnp.ndarray] = None,
                  config: RasterizeConfig = RasterizeConfig()):
    """Coarse-scaffold render (gaussian_renderer/__init__.py:296-407):
    same splat, depth output simply unused by the coarse loss."""
    return render(viewpoint_camera, state, bg_color,
                  scaling_modifier=scaling_modifier, sh_degree=sh_degree,
                  means2d_offset=means2d_offset, config=config)


def render_post(viewpoint_camera: Camera, state: GaussianState,
                nodes, boxes, limit, bg_color, max_cut: int,
                sh_degree: Optional[int] = None,
                exposure: Optional[jnp.ndarray] = None,
                config: RasterizeConfig = RasterizeConfig()):
    """Hierarchy-cut render with parent<->child interpolation
    (gaussian_renderer/__init__.py:138-294). ``limit`` is the granularity
    threshold (pre-divided by focal terms, hierarchy.cut.pixel_limit)."""
    deg = state.max_sh_degree if sh_degree is None else sh_degree
    out = render_cut(state, nodes, boxes, viewpoint_camera,
                     jnp.asarray(limit, jnp.float32), deg,
                     jnp.asarray(bg_color), config, max_cut=max_cut,
                     exposure=exposure)
    res = _as_reference_dict(out, None)
    res["cut"] = out["cut"]
    return res
