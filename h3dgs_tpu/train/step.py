"""The jitted per-view training step (flat-model training).

One compiled function covers the hot loop of both train_single and
train_coarse (/root/reference/train_single.py:57-192,
train_coarse.py:57-150): render -> photometric (+ optional inverse-depth)
loss -> backward -> skybox grad locking -> masked sparse Adam -> exposure
Adam -> big-Gaussian shrink -> densification stats. Densify/prune and
opacity reset run as separate jitted calls on their own intervals.

Everything is functional: (state, opt, exposure, batch) -> (state', opt',
exposure', metrics). Static shape inputs; the camera's height/width are
static fields so one compilation serves all views at a resolution.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import OptimizationConfig
from ..model import densify as densify_lib
from ..model.state import GaussianState
from ..ops import adam as adam_lib
from ..ops.rasterize import RasterizeConfig, rasterize
from ..scene.camera import Camera
from ..utils import losses as loss_lib
from ..utils import schedules


class ViewBatch(NamedTuple):
    """One training view's data (all device arrays)."""
    camera: Camera
    gt_image: jax.Array        # [3, H, W], already alpha-masked
    alpha_mask: jax.Array      # [1, H, W]
    invdepth: jax.Array        # [1, H, W] scaled mono inverse depth (or 0s)
    depth_mask: jax.Array      # [1, H, W]
    depth_reliable: jax.Array  # [] bool
    image_idx: jax.Array       # [] int32 (exposure row)


def encode_view(batch: ViewBatch) -> ViewBatch:
    """Compact dtypes for host->device transfer: images/masks as uint8
    (the PNG sources are 8-bit), inverse depth as f16. Quarters the upload
    bytes — significant on PCIe, decisive on tunneled TPU backends."""
    import numpy as np

    def q8(x):
        return np.clip(np.asarray(x) * 255.0 + 0.5, 0, 255).astype(np.uint8)

    return batch._replace(
        gt_image=q8(batch.gt_image),
        alpha_mask=q8(batch.alpha_mask),
        depth_mask=q8(batch.depth_mask),
        invdepth=np.asarray(batch.invdepth, np.float16))


def decode_view(batch: ViewBatch) -> ViewBatch:
    """On-device inverse of encode_view; passes f32 batches through."""
    def dec(x):
        return (x.astype(jnp.float32) / 255.0
                if x.dtype == jnp.uint8 else x)

    return batch._replace(
        gt_image=dec(batch.gt_image),
        alpha_mask=dec(batch.alpha_mask),
        depth_mask=dec(batch.depth_mask),
        invdepth=batch.invdepth.astype(jnp.float32))


class StepOutput(NamedTuple):
    state: GaussianState
    opt: adam_lib.AdamState
    exposure: jax.Array
    exposure_opt: adam_lib.AdamState
    photo_loss: jax.Array
    depth_loss: jax.Array
    n_visible: jax.Array
    n_duplicates: jax.Array
    # Entries cut by the Pallas path's max_per_tile clamp (0 = lossless).
    n_truncated: jax.Array
    # Raw duplicate count (pre-padding) — governs the gen_entries budget.
    n_raw: jax.Array
    # Backward-surviving quantum count (-1 = not tracked); sizes the
    # adaptive bwd_entries truncation budget (see train/loop.py).
    n_bwd_quanta: Optional[jax.Array] = None


def apply_exposure(image: jax.Array, exposure: jax.Array) -> jax.Array:
    """3x4 affine color transform (gaussian_renderer/__init__.py:115-117)."""
    return (jnp.einsum("chw,ck->khw", image, exposure[:3, :3],
                       precision=jax.lax.Precision.HIGHEST)
            + exposure[:3, 3][:, None, None])


def render_for_training(state: GaussianState, camera: Camera,
                        sh_degree: int, bg: jax.Array,
                        raster_cfg: RasterizeConfig,
                        means2d_offset: Optional[jax.Array] = None,
                        exposure: Optional[jax.Array] = None):
    out = rasterize(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity()[:, 0], state.get_features(sh_degree),
        camera, sh_degree, bg,
        means2d_offset=means2d_offset, config=raster_cfg)
    image = out["render"]
    if exposure is not None:
        image = apply_exposure(image, exposure)
    out["render"] = jnp.clip(image, 0.0, 1.0)
    return out


def make_train_step(opt_cfg: OptimizationConfig, raster_cfg: RasterizeConfig,
                    use_depth_loss: bool = True, use_exposure: bool = True,
                    skybox_locked: bool = True, freeze_xyz: bool = False,
                    shrink_threshold: float = 0.02,
                    shrink_protect_scaffold: bool = True,
                    skip_shrink: bool = False):
    """Build the jitted train step for a given config.

    freeze_xyz / shrink_threshold=0.1 / use_depth_loss=False /
    use_exposure=False reproduce the coarse trainer's variant
    (train_coarse.py:55-57,97-105,141-145).
    """

    def lr_dict(iteration):
        return schedules.gaussian_lr_dict(opt_cfg, iteration, freeze_xyz=freeze_xyz)

    @functools.partial(jax.jit, static_argnames=("sh_degree",),
                       donate_argnames=("state", "opt", "exposure",
                                        "exposure_opt"))
    def step(state: GaussianState, opt: adam_lib.AdamState,
             exposure: jax.Array, exposure_opt: adam_lib.AdamState,
             batch: ViewBatch, iteration: jax.Array, bg: jax.Array,
             spatial_lr_scale: jax.Array, cameras_extent: jax.Array,
             sh_degree: int) -> StepOutput:

        batch = decode_view(batch)
        params = state.trainable_dict()
        exp_row = exposure[batch.image_idx] if use_exposure else None
        offset = jnp.zeros((state.capacity, 2), jnp.float32)

        depth_w = schedules.expon_lr(
            iteration, opt_cfg.depth_l1_weight_init,
            opt_cfg.depth_l1_weight_final, max_steps=opt_cfg.iterations)

        def loss_fn(params, exp_row, offset):
            st = state.replace_trainable(params)
            out = render_for_training(st, batch.camera, sh_degree, bg,
                                      raster_cfg, means2d_offset=offset,
                                      exposure=exp_row)
            image = out["render"] * batch.alpha_mask
            photo = loss_lib.photometric_loss(image, batch.gt_image,
                                              opt_cfg.lambda_dssim)
            if use_depth_loss:
                d_l1 = jnp.mean(jnp.abs(out["invdepth"] - batch.invdepth)
                                * batch.depth_mask)
                depth = jnp.where(batch.depth_reliable & (depth_w > 0),
                                  depth_w * d_l1, 0.0)
            else:
                depth = jnp.zeros(())
            aux = (out["radii"], out["visibility_filter"],
                   out["n_duplicates"], out["n_truncated"], out["n_raw"],
                   out["n_bwd_quanta"], photo, depth)
            return photo + depth, aux

        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        (g_params, g_exp, g_offset), aux = grad_fn(params, exp_row, offset)
        radii, visible, n_dup, n_trunc, n_raw, n_bwd, photo, depth = aux

        # --- skybox/scaffold gradient locking (train_single.py:162-168) ---
        if skybox_locked:
            locked = state.locked_rows_mask()
            for k in g_params:
                m = locked.reshape((-1,) + (1,) * (g_params[k].ndim - 1))
                g_params[k] = jnp.where(m, 0.0, g_params[k])

        # --- densification stats (uses screen-space positional grads) ---
        new_state_stats = densify_lib.add_densification_stats(
            state, g_offset, radii, visible)

        # --- sparse Adam on rows with nonzero opacity grad ---
        relevant = (g_params["opacity"][:, 0] != 0.0) & state.alive
        lrs = lr_dict(iteration)
        lrs = dict(lrs, xyz=lrs["xyz"] * spatial_lr_scale)
        new_params, new_opt = adam_lib.sparse_adam_update(
            params, g_params, opt, lrs, relevant)

        new_state = new_state_stats.replace_trainable(new_params)

        # --- exposure Adam (dense, torch defaults: eps 1e-8) ---
        if use_exposure:
            exp_lr = schedules.expon_lr(
                iteration, opt_cfg.exposure_lr_init, opt_cfg.exposure_lr_final,
                lr_delay_steps=opt_cfg.exposure_lr_delay_steps,
                lr_delay_mult=opt_cfg.exposure_lr_delay_mult,
                max_steps=opt_cfg.iterations)
            g_exp_full = jnp.zeros_like(exposure).at[batch.image_idx].set(g_exp)
            all_rows = jnp.ones(exposure.shape[0], bool)
            new_exp, new_exp_opt = adam_lib.sparse_adam_update(
                {"exposure": exposure}, {"exposure": g_exp_full},
                exposure_opt, {"exposure": exp_lr}, all_rows, eps=1e-8)
            exposure = new_exp["exposure"]
            exposure_opt = new_exp_opt

        # --- every-iteration big-Gaussian shrink ---
        if not skip_shrink:
            new_state = densify_lib.shrink_big_gaussians(
                new_state, cameras_extent, shrink_threshold,
                protect_scaffold=shrink_protect_scaffold)

        return StepOutput(
            state=new_state, opt=new_opt, exposure=exposure,
            exposure_opt=exposure_opt, photo_loss=photo, depth_loss=depth,
            n_visible=jnp.sum(visible.astype(jnp.int32)),
            n_duplicates=n_dup, n_truncated=n_trunc, n_raw=n_raw,
            n_bwd_quanta=n_bwd)

    return step


@functools.partial(jax.jit, donate_argnames=("state", "opt"),
                   static_argnames=("max_grad", "min_opacity",
                                    "percent_dense"))
def densify_step(state: GaussianState, opt: adam_lib.AdamState,
                 rng: jax.Array, max_grad: float, min_opacity: float,
                 extent: jax.Array, percent_dense: float):
    """Jitted densify+prune with optimizer-state reset for recycled slots."""
    res = densify_lib.densify_and_prune(
        state, rng, max_grad, min_opacity, extent, percent_dense)
    new_opt = adam_lib.reset_rows(opt, res.touched_rows)
    return res.state, new_opt, (res.n_cloned, res.n_split, res.n_pruned,
                                res.n_dropped)


@functools.partial(jax.jit, donate_argnames=("state", "opt"))
def reset_opacity_step(state: GaussianState, opt: adam_lib.AdamState):
    """Opacity reset + zeroed opacity moments (gaussian_model.py:510-514)."""
    new_state = densify_lib.reset_opacity(state)
    new_opt = adam_lib.reset_rows(opt, jnp.ones(state.capacity, bool),
                                  keys=["opacity"])
    return new_state, new_opt
