"""Multi-chip training step: view-batch data parallelism x tile sharding.

One jitted SPMD program: a batch of views is sharded over the mesh's "data"
axis, each view's tile blend is sharded over the "tile" axis (constraint
inside ops/rasterize.blend_tiles), Gaussian parameters are replicated, and
XLA inserts the gradient all-reduce over ICI. This is the in-step
parallelism the reference lacks entirely (its unit of parallelism is a
whole chunk per GPU; SURVEY.md §2.3) — it is what lets one chunk train
across a v5e slice.

The update rule matches train/step.py (masked sparse Adam on rows visible
in ANY view of the batch, exposure Adam, stats, shrink); with batch size 1
on a 1x1 mesh it degenerates to the single-chip step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import OptimizationConfig
from ..model import densify as densify_lib
from ..model.state import GaussianState
from ..ops import adam as adam_lib
from ..ops.rasterize import RasterizeConfig
from ..train.step import (StepOutput, ViewBatch, decode_view,
                          render_for_training)
from ..utils import losses as loss_lib
from ..utils import schedules
from .sharding import TILE_AXIS


def make_parallel_train_step(opt_cfg: OptimizationConfig,
                             raster_cfg: RasterizeConfig,
                             use_depth_loss: bool = True,
                             use_exposure: bool = True,
                             skybox_locked: bool = True,
                             freeze_xyz: bool = False,
                             shrink_threshold: float = 0.02,
                             shrink_protect_scaffold: bool = True,
                             skip_shrink: bool = False,
                             shard_tiles: bool = True):
    """Build a jitted step over a *batched* ViewBatch (leading dim B).

    Call under `jax.set_mesh(mesh)`; batch arrays should be data-sharded,
    parameters replicated.
    """
    if shard_tiles:
        raster_cfg = raster_cfg._replace(shard_axis=TILE_AXIS)

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
        offset = jnp.zeros((state.capacity, 2), jnp.float32)
        depth_w = schedules.expon_lr(
            iteration, opt_cfg.depth_l1_weight_init,
            opt_cfg.depth_l1_weight_final, max_steps=opt_cfg.iterations)

        def view_loss(params, exposure, offset, view: ViewBatch):
            st = state.replace_trainable(params)
            exp_row = exposure[view.image_idx] if use_exposure else None
            out = render_for_training(st, view.camera, sh_degree, bg,
                                      raster_cfg, means2d_offset=offset,
                                      exposure=exp_row)
            image = out["render"] * view.alpha_mask
            photo = loss_lib.photometric_loss(image, view.gt_image,
                                              opt_cfg.lambda_dssim)
            if use_depth_loss:
                d_l1 = jnp.mean(jnp.abs(out["invdepth"] - view.invdepth)
                                * view.depth_mask)
                depth = jnp.where(view.depth_reliable & (depth_w > 0),
                                  depth_w * d_l1, 0.0)
            else:
                depth = jnp.zeros(())
            aux = (out["radii"], out["visibility_filter"], photo, depth,
                   out["n_duplicates"], out["n_truncated"], out["n_raw"],
                   out["n_bwd_quanta"])
            return photo + depth, aux

        def batch_loss(params, exposure, offset):
            losses, aux = jax.vmap(
                view_loss, in_axes=(None, None, None, 0))(
                    params, exposure, offset, batch)
            return jnp.mean(losses), aux

        grad_fn = jax.grad(batch_loss, argnums=(0, 1, 2), has_aux=True)
        (g_params, g_exp, g_offset), aux = grad_fn(params, exposure, offset)
        (radii_b, visible_b, photo_b, depth_b, dup_b, trunc_b, raw_b,
         bwd_b) = aux
        radii = jnp.max(radii_b, axis=0)
        visible = jnp.any(visible_b, axis=0)
        n_dup = jnp.max(dup_b)
        n_trunc = jnp.max(trunc_b)
        n_raw = jnp.max(raw_b)
        n_bwd = jnp.max(bwd_b)

        if skybox_locked:
            locked = state.locked_rows_mask()
            for k in g_params:
                m = locked.reshape((-1,) + (1,) * (g_params[k].ndim - 1))
                g_params[k] = jnp.where(m, 0.0, g_params[k])

        new_state_stats = densify_lib.add_densification_stats(
            state, g_offset, radii, visible)

        relevant = (g_params["opacity"][:, 0] != 0.0) & state.alive
        lrs = lr_dict(iteration)
        lrs = dict(lrs, xyz=lrs["xyz"] * spatial_lr_scale)
        new_params, new_opt = adam_lib.sparse_adam_update(
            params, g_params, opt, lrs, relevant)
        new_state = new_state_stats.replace_trainable(new_params)

        if use_exposure:
            exp_lr = schedules.expon_lr(
                iteration, opt_cfg.exposure_lr_init, opt_cfg.exposure_lr_final,
                lr_delay_steps=opt_cfg.exposure_lr_delay_steps,
                lr_delay_mult=opt_cfg.exposure_lr_delay_mult,
                max_steps=opt_cfg.iterations)
            all_rows = jnp.ones(exposure.shape[0], bool)
            new_exp, exposure_opt = adam_lib.sparse_adam_update(
                {"exposure": exposure}, {"exposure": g_exp},
                exposure_opt, {"exposure": exp_lr}, all_rows, eps=1e-8)
            exposure = new_exp["exposure"]

        if not skip_shrink:
            new_state = densify_lib.shrink_big_gaussians(
                new_state, cameras_extent, shrink_threshold,
                protect_scaffold=shrink_protect_scaffold)

        return StepOutput(
            state=new_state, opt=new_opt, exposure=exposure,
            exposure_opt=exposure_opt, photo_loss=jnp.mean(photo_b),
            depth_loss=jnp.mean(depth_b),
            n_visible=jnp.sum(visible.astype(jnp.int32)),
            n_duplicates=n_dup, n_truncated=n_trunc, n_raw=n_raw,
            n_bwd_quanta=n_bwd)

    return step


def make_dp_train_step(opt_cfg: OptimizationConfig,
                       raster_cfg: RasterizeConfig,
                       mesh, use_depth_loss: bool = True,
                       use_exposure: bool = True,
                       skybox_locked: bool = True,
                       freeze_xyz: bool = False,
                       shrink_threshold: float = 0.02,
                       shrink_protect_scaffold: bool = True,
                       skip_shrink: bool = False):
    """View data parallelism via shard_map — the Pallas-kernel-compatible
    multi-chip step.

    The vmapped step above batches the renderer, which the Pallas custom
    VJP cannot be vmapped through; here each device runs the plain
    single-view renderer sequentially over its local views (a lax.scan
    accumulating gradients), and gradients are psum'd over the "data"
    axis. Parameters replicated; works with either blend backend.
    """
    from jax.sharding import PartitionSpec as P

    from .sharding import DATA_AXIS

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
        depth_w = schedules.expon_lr(
            iteration, opt_cfg.depth_l1_weight_init,
            opt_cfg.depth_l1_weight_final, max_steps=opt_cfg.iterations)

        def view_loss(params, exposure, offset, view: ViewBatch):
            st = state.replace_trainable(params)
            exp_row = exposure[view.image_idx] if use_exposure else None
            out = render_for_training(st, view.camera, sh_degree, bg,
                                      raster_cfg, means2d_offset=offset,
                                      exposure=exp_row)
            image = out["render"] * view.alpha_mask
            photo = loss_lib.photometric_loss(image, view.gt_image,
                                              opt_cfg.lambda_dssim)
            if use_depth_loss:
                d_l1 = jnp.mean(jnp.abs(out["invdepth"] - view.invdepth)
                                * view.depth_mask)
                depth = jnp.where(view.depth_reliable & (depth_w > 0),
                                  depth_w * d_l1, 0.0)
            else:
                depth = jnp.zeros(())
            aux = (out["radii"], out["visibility_filter"], photo, depth,
                   out["n_duplicates"], out["n_truncated"], out["n_raw"],
                   out["n_bwd_quanta"])
            return photo + depth, aux

        n_total = batch.gt_image.shape[0]

        def local_grads(params, exposure, batch):
            """Per-device: scan local views, accumulate grads; psum."""
            offset = jnp.zeros((state.capacity, 2), jnp.float32)

            def body(carry, view):
                g_acc, stats = carry
                (g_p, g_e, g_o), aux = jax.grad(
                    view_loss, argnums=(0, 1, 2), has_aux=True)(
                        params, exposure, offset, view)
                (radii, visible, photo, depth, n_dup, n_trunc, n_raw,
                 n_bwd) = aux
                g_acc = jax.tree.map(jnp.add, g_acc, (g_p, g_e, g_o))
                stats = (jnp.maximum(stats[0], radii),
                         stats[1] | visible,
                         stats[2] + photo, stats[3] + depth,
                         jnp.maximum(stats[4], n_dup),
                         jnp.maximum(stats[5], n_trunc),
                         jnp.maximum(stats[6], n_raw),
                         # -1 init survives max: stays -1 iff untracked.
                         jnp.maximum(stats[7], n_bwd))
                return (g_acc, stats), None

            zero_g = (jax.tree.map(jnp.zeros_like, params),
                      jnp.zeros_like(exposure),
                      jnp.zeros((state.capacity, 2), jnp.float32))
            zero_s = (jnp.zeros(state.capacity, jnp.int32),
                      jnp.zeros(state.capacity, bool),
                      jnp.zeros(()), jnp.zeros(()),
                      jnp.zeros((), jnp.int32),
                      jnp.zeros((), jnp.int32),
                      jnp.zeros((), jnp.int32),
                      jnp.full((), -1, jnp.int32))
            (g, stats), _ = jax.lax.scan(body, (zero_g, zero_s), batch)
            g = jax.lax.psum(jax.tree.map(lambda x: x / n_total, g),
                             DATA_AXIS)
            radii = jax.lax.pmax(stats[0], DATA_AXIS)
            visible = jax.lax.pmax(stats[1].astype(jnp.int32),
                                   DATA_AXIS) > 0
            photo = jax.lax.psum(stats[2], DATA_AXIS) / n_total
            depth = jax.lax.psum(stats[3], DATA_AXIS) / n_total
            n_dup = jax.lax.pmax(stats[4], DATA_AXIS)
            n_trunc = jax.lax.pmax(stats[5], DATA_AXIS)
            n_raw = jax.lax.pmax(stats[6], DATA_AXIS)
            n_bwd = jax.lax.pmax(stats[7], DATA_AXIS)
            return g, (radii, visible, photo, depth, n_dup, n_trunc,
                       n_raw, n_bwd)

        batch_spec = jax.tree.map(lambda _: P(DATA_AXIS), batch)
        (g_params, g_exp, g_offset), aux = jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(P(), P(), batch_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, exposure, batch)
        radii, visible, photo, depth, n_dup, n_trunc, n_raw, n_bwd = aux

        if skybox_locked:
            locked = state.locked_rows_mask()
            for k in g_params:
                m = locked.reshape((-1,) + (1,) * (g_params[k].ndim - 1))
                g_params[k] = jnp.where(m, 0.0, g_params[k])

        new_state_stats = densify_lib.add_densification_stats(
            state, g_offset, radii, visible)
        relevant = (g_params["opacity"][:, 0] != 0.0) & state.alive
        lrs = lr_dict(iteration)
        lrs = dict(lrs, xyz=lrs["xyz"] * spatial_lr_scale)
        new_params, new_opt = adam_lib.sparse_adam_update(
            params, g_params, opt, lrs, relevant)
        new_state = new_state_stats.replace_trainable(new_params)

        if use_exposure:
            exp_lr = schedules.expon_lr(
                iteration, opt_cfg.exposure_lr_init,
                opt_cfg.exposure_lr_final,
                lr_delay_steps=opt_cfg.exposure_lr_delay_steps,
                lr_delay_mult=opt_cfg.exposure_lr_delay_mult,
                max_steps=opt_cfg.iterations)
            all_rows = jnp.ones(exposure.shape[0], bool)
            new_exp, exposure_opt = adam_lib.sparse_adam_update(
                {"exposure": exposure}, {"exposure": g_exp},
                exposure_opt, {"exposure": exp_lr}, all_rows, eps=1e-8)
            exposure = new_exp["exposure"]

        if not skip_shrink:
            new_state = densify_lib.shrink_big_gaussians(
                new_state, cameras_extent, shrink_threshold,
                protect_scaffold=shrink_protect_scaffold)

        return StepOutput(
            state=new_state, opt=new_opt, exposure=exposure,
            exposure_opt=exposure_opt, photo_loss=photo,
            depth_loss=depth,
            n_visible=jnp.sum(visible.astype(jnp.int32)),
            n_duplicates=n_dup, n_truncated=n_trunc, n_raw=n_raw,
            n_bwd_quanta=n_bwd)

    return step


def make_dp_post_step(opt_cfg: OptimizationConfig,
                      raster_cfg: RasterizeConfig, max_cut: int, mesh,
                      skybox_locked: bool = True,
                      use_exposure: bool = True):
    """Data-parallel hierarchy post-optimization step (shard_map).

    The dp counterpart of train/post_step.make_post_train_step: each
    device scans its shard of the view batch through the differentiable
    cut render (each view carries its own sampled granularity limit and
    pretrained exposure row), gradients are psum'd over the data axis,
    then anchor/skybox locking and the dense Adam update run replicated —
    the same update rule as the single-device step on the averaged batch
    gradient.
    """
    from jax.sharding import PartitionSpec as P

    from ..train.post_step import PostStepOutput, render_cut
    from .sharding import DATA_AXIS

    def lr_dict(iteration):
        return schedules.gaussian_lr_dict(opt_cfg, iteration)

    @functools.partial(jax.jit, static_argnames=("sh_degree",),
                       donate_argnames=("state", "opt"))
    def step(state: GaussianState, opt: adam_lib.AdamState,
             batch, nodes: jax.Array, boxes: jax.Array,
             anchor_mask: jax.Array, exposure_rows: jax.Array,
             limits: jax.Array, iteration: jax.Array, bg: jax.Array,
             spatial_lr_scale: jax.Array, sh_degree: int):
        from ..train.step import decode_view
        batch = decode_view(batch)
        n_total = batch.gt_image.shape[0]

        def view_loss(params, view, exp_row, limit):
            out = render_cut(state, nodes, boxes, view.camera, limit,
                             sh_degree, bg, raster_cfg, max_cut,
                             exposure=exp_row if use_exposure else None,
                             params=params)
            image = out["render"] * view.alpha_mask
            photo = loss_lib.photometric_loss(image, view.gt_image,
                                              opt_cfg.lambda_dssim)
            return photo, (out["cut"].count, out["visibility_filter"])

        def local_grads(params, batch, exp_rows, lims):
            def body(carry, xs):
                g_acc, photo_acc, cut_max = carry
                view, exp_row, limit = xs
                (photo, (cut_size, _vis)), g_p = jax.value_and_grad(
                    view_loss, has_aux=True)(params, view, exp_row, limit)
                g_acc = jax.tree.map(jnp.add, g_acc, g_p)
                return (g_acc, photo_acc + photo,
                        jnp.maximum(cut_max, cut_size)), None

            zero = (jax.tree.map(jnp.zeros_like, params), jnp.zeros(()),
                    jnp.zeros((), jnp.int32))
            (g, photo, cut_max), _ = jax.lax.scan(
                body, zero, (batch, exp_rows, lims))
            g = jax.lax.psum(jax.tree.map(lambda x: x / n_total, g),
                             DATA_AXIS)
            photo = jax.lax.psum(photo, DATA_AXIS) / n_total
            cut_max = jax.lax.pmax(cut_max, DATA_AXIS)
            return g, photo, cut_max

        params = state.trainable_dict()
        batch_spec = jax.tree.map(lambda _: P(DATA_AXIS), batch)
        g_params, photo, cut_size = jax.shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), batch_spec, P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(params, batch, exposure_rows, limits)

        locked = anchor_mask
        if skybox_locked and state.n_skybox:
            locked = locked | state.locked_rows_mask()
        for k in g_params:
            m = locked.reshape((-1,) + (1,) * (g_params[k].ndim - 1))
            g_params[k] = jnp.where(m, 0.0, g_params[k])

        lrs = lr_dict(iteration)
        lrs = dict(lrs, xyz=lrs["xyz"] * spatial_lr_scale)
        all_rows = jnp.ones(state.capacity, bool)
        new_params, new_opt = adam_lib.sparse_adam_update(
            params, g_params, opt, lrs, all_rows)
        new_state = state.replace_trainable(new_params)

        return PostStepOutput(
            state=new_state, opt=new_opt, photo_loss=photo,
            cut_size=cut_size,
            n_visible=jnp.zeros((), jnp.int32))

    return step
