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
           config: RasterizeConfig = RasterizeConfig()):
    """Single-chunk training render (gaussian_renderer/__init__.py:20-135)."""
    deg = state.max_sh_degree if sh_degree is None else sh_degree
    if means2d_offset is None:
        means2d_offset = jnp.zeros((state.capacity, 2), jnp.float32)
    out = rasterize(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity()[:, 0], state.get_features(deg),
        viewpoint_camera, deg, jnp.asarray(bg_color),
        scale_modifier=scaling_modifier, means2d_offset=means2d_offset,
        config=config)
    if use_trained_exp and exposure is not None:
        out["render"] = jnp.clip(
            apply_exposure(out["render"], exposure), 0.0, 1.0)
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
