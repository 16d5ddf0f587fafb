"""Jitted hierarchy fine-tuning step (train_post equivalent).

One compiled function covers the reference's post-optimization loop
(/root/reference/train_post.py:69-198): sample a granularity limit, select
the view-adaptive cut, lerp child/parent attributes (differentiable LOD),
render, photometric loss, zero skybox+anchor gradients, dense Adam.

TPU re-design: cut selection happens *inside* the jit (hierarchy/cut.py's
parallel predicate) and the cut is padded to a static capacity, so the
whole iteration is one device program — the reference round-trips through
a native CPU/CUDA op per iteration.

Row layout (create_from_hier parity, scene/gaussian_model.py:326-399):
hierarchy nodes occupy rows [0, M); skybox rows come LAST; opacity
activation is |x|.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import OptimizationConfig
from ..hierarchy import cut as cut_lib
from ..model.state import GaussianState
from ..ops import adam as adam_lib
from ..ops.rasterize import RasterizeConfig, rasterize
from ..scene.camera import Camera
from ..utils import losses as loss_lib
from ..utils import schedules
from .step import ViewBatch, apply_exposure

LIMIT_MIN = 0.005   # train_post.py:66-67
LIMIT_MAX = 0.1


def sample_limit(rng: jax.Array) -> jax.Array:
    """Log-uniform granularity target (train_post.py:72-74)."""
    u = jax.random.uniform(rng)
    log2 = jnp.log2(jnp.asarray([LIMIT_MIN, LIMIT_MAX]))
    return 2.0 ** (u * (log2[1] - log2[0]) + log2[0])


class PostStepOutput(NamedTuple):
    state: GaussianState
    opt: adam_lib.AdamState
    photo_loss: jax.Array
    cut_size: jax.Array     # true cut size (overflow diagnosable: > max_cut)
    n_visible: jax.Array


def render_cut(state: GaussianState, nodes: jax.Array, boxes: jax.Array,
               camera: Camera, limit: jax.Array, sh_degree: int,
               bg: jax.Array, raster_cfg: RasterizeConfig, max_cut: int,
               exposure: Optional[jax.Array] = None,
               params: Optional[dict] = None,
               mesh=None, band_axis: Optional[str] = None):
    """Select cut -> interpolate -> splat (render_post equivalent).

    ``params`` overrides the trainable dict (used by the training step so
    gradients flow); rows [0, M) are hierarchy nodes, trailing
    ``state.n_skybox`` rows are appended verbatim with weight 1
    (gaussian_renderer/__init__.py:220-234).

    ``mesh``/``band_axis``: shard the splat into pixel bands across the
    mesh axis (parallel.band_render) — the multi-chip interactive path.
    """
    if params is None:
        params = state.trainable_dict()
    xyz, scales, quats, opac, shs, cut = select_cut_gaussians(
        state, nodes, boxes, camera.cam_center, limit, max_cut,
        params=params)
    out = splat_cut_gaussians(xyz, scales, quats, opac, shs, camera,
                              sh_degree, bg, raster_cfg,
                              exposure=exposure, mesh=mesh,
                              band_axis=band_axis)
    out["cut"] = cut
    return out


def select_cut_gaussians(state: GaussianState, nodes, boxes, cam_center,
                         limit, max_cut: int, params=None, table=None):
    """Cut selection + LOD interpolation + skybox append -> flat splats.

    Split out of render_cut so interactive rendering can cache the
    selected flat Gaussians across frames (cut selection depends only on
    the camera POSITION, so rotations reuse it exactly and small
    translations within a hysteresis margin reuse it approximately —
    viewer/service.HierarchyRenderer). ``table``: optional cached
    interp_table(params) — the viewer's params are static between
    training updates, so interpolation becomes gather-only.
    """
    if params is None:
        params = state.trainable_dict()
    c = state.capacity
    n_sky = state.n_skybox
    cut = cut_lib.expand_to_size(nodes, boxes, limit, cam_center, max_cut)
    xyz, scales, quats, opac, shs = cut_lib.interpolate_cut(params, cut,
                                                            table)
    if n_sky:
        sky = slice(c - n_sky, c)
        xyz = jnp.concatenate([xyz, params["xyz"][sky]])
        scales = jnp.concatenate([scales, jnp.exp(params["scaling"][sky])])
        quats = jnp.concatenate([quats, params["rotation"][sky]])
        opac = jnp.concatenate([opac, jnp.abs(params["opacity"][sky, 0])])
        feats = jnp.concatenate([params["f_dc"][sky],
                                 params["f_rest"][sky]], axis=1)
        shs = jnp.concatenate([shs, feats])
    return xyz, scales, quats, opac, shs, cut


def splat_cut_gaussians(xyz, scales, quats, opac, shs, camera: Camera,
                        sh_degree: int, bg, raster_cfg: RasterizeConfig,
                        exposure=None, mesh=None,
                        band_axis: Optional[str] = None):
    """Rasterize pre-selected flat Gaussians (render_cut's second half)."""
    k = (sh_degree + 1) ** 2
    if mesh is not None:
        from ..parallel.band_render import render_banded
        out = render_banded(xyz, scales, quats, opac, shs[:, :k], camera,
                            sh_degree, bg, mesh, band_axis,
                            config=raster_cfg)
    else:
        out = rasterize(xyz, scales, quats, opac, shs[:, :k], camera,
                        sh_degree, bg, config=raster_cfg)
    if exposure is not None:
        out["render"] = apply_exposure(out["render"], exposure)
    out["render"] = jnp.clip(out["render"], 0.0, 1.0)
    return out


def make_post_train_step(opt_cfg: OptimizationConfig,
                         raster_cfg: RasterizeConfig, max_cut: int,
                         skybox_locked: bool = True,
                         use_exposure: bool = True):
    """Build the jitted post-optimization step.

    The exposure row is the *pretrained* per-image transform (loaded from
    exposure.json) — applied, never optimized (train_post uses
    use_trained_exp; no exposure optimizer, train_post.py:119-129).
    """

    def lr_dict(iteration):
        return schedules.gaussian_lr_dict(opt_cfg, iteration)

    @functools.partial(jax.jit, static_argnames=("sh_degree",),
                       donate_argnames=("state", "opt"))
    def step(state: GaussianState, opt: adam_lib.AdamState,
             batch: ViewBatch, nodes: jax.Array, boxes: jax.Array,
             anchor_mask: jax.Array, exposure_row: jax.Array,
             limit: jax.Array, iteration: jax.Array, bg: jax.Array,
             spatial_lr_scale: jax.Array, sh_degree: int) -> PostStepOutput:

        from .step import decode_view
        batch = decode_view(batch)
        exp_row = exposure_row if use_exposure else None

        def loss_fn(params):
            out = render_cut(state, nodes, boxes, batch.camera, limit,
                             sh_degree, bg, raster_cfg, max_cut,
                             exposure=exp_row, params=params)
            image = out["render"] * batch.alpha_mask
            photo = loss_lib.photometric_loss(image, batch.gt_image,
                                              opt_cfg.lambda_dssim)
            return photo, (out["cut"].count, out["visibility_filter"])

        (photo, (cut_size, visible)), g_params = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable_dict())

        # --- anchor + skybox gradient locking (train_post.py:167-181) ---
        locked = anchor_mask
        if skybox_locked and state.n_skybox:
            locked = locked | state.locked_rows_mask()
        for k in g_params:
            m = locked.reshape((-1,) + (1,) * (g_params[k].ndim - 1))
            g_params[k] = jnp.where(m, 0.0, g_params[k])

        # --- dense Adam (our_adam=False path, eps 1e-15) ---
        lrs = lr_dict(iteration)
        lrs = dict(lrs, xyz=lrs["xyz"] * spatial_lr_scale)
        all_rows = jnp.ones(state.capacity, bool)
        new_params, new_opt = adam_lib.sparse_adam_update(
            state.trainable_dict(), g_params, opt, lrs, all_rows)
        new_state = state.replace_trainable(new_params)

        return PostStepOutput(
            state=new_state, opt=new_opt, photo_loss=photo,
            cut_size=cut_size,
            n_visible=jnp.sum(visible.astype(jnp.int32)))

    return step
