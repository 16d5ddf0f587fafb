"""Densification (clone/split/prune) under fixed capacity, fully jittable.

Reference behavior (/root/reference/scene/gaussian_model.py:620-689):
  * stats: per-Gaussian running max of screen-space positional gradient
    norm, times max 2D radius, times opacity^(1/5), thresholded; opacity
    must exceed 0.15; scaffold rows never densify.
  * clone if max scale <= percent_dense * extent (copy in place);
  * split if larger: N=2 children sampled from the Gaussian, scales
    divided by 0.8*N, original removed;
  * prune Gaussians with opacity < min_opacity (scaffold exempt);
  * all densification stats and max radii reset afterwards.

TPU re-design: torch grows/shrinks tensors and rebuilds optimizer state
(gaussian_model.py:528-617). Here rows live in fixed-capacity arrays with an
``alive`` mask; new Gaussians are scattered into free slots located with an
argsort/prefix-sum, overflow is counted and dropped, and the caller zeroes
Adam moments for recycled slots (ops/adam.reset_rows). Static shapes
throughout — the whole operation jits and can run on-device every
densification interval without host round-trips.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.transforms import inverse_sigmoid, quat_to_rotmat
from .state import GaussianState


class DensifyResult(NamedTuple):
    state: GaussianState
    touched_rows: jax.Array   # [C] bool: rows whose optimizer state must reset
    n_cloned: jax.Array
    n_split: jax.Array
    n_pruned: jax.Array
    n_dropped: jax.Array      # items that did not fit in capacity


def add_densification_stats(state: GaussianState, screen_grad: jax.Array,
                            radii: jax.Array, visible: jax.Array) -> GaussianState:
    """Accumulate per-view stats (gaussian_model.py:687-689 + train loop).

    screen_grad: [C, 2] gradient of the loss w.r.t. screen-space means.
    radii: [C] int32 projected radii. visible: [C] bool.
    """
    norm = jnp.linalg.norm(screen_grad[:, :2], axis=-1)
    return dataclasses.replace(
        state,
        xyz_gradient_accum=jnp.where(
            visible, jnp.maximum(state.xyz_gradient_accum, norm),
            state.xyz_gradient_accum),
        denom=state.denom + visible.astype(state.denom.dtype),
        max_radii2d=jnp.where(
            visible, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d),
    )


def _protected_rows(state: GaussianState) -> jax.Array:
    """Rows exempt from densify/prune: scaffold prefix (includes skybox)."""
    idx = jnp.arange(state.capacity)
    n_prot = max(state.n_scaffold, state.n_skybox)
    return idx < n_prot


def densify_and_prune(state: GaussianState, rng: jax.Array, max_grad: float,
                      min_opacity: float, extent: float,
                      percent_dense: float, n_split: int = 2) -> DensifyResult:
    c = state.capacity
    opac = state.get_opacity()[:, 0]
    max_scale = jnp.max(state.get_scaling(), axis=1)
    protected = _protected_rows(state)

    score = state.xyz_gradient_accum * state.max_radii2d * opac ** 0.2
    base = (score >= max_grad) & (opac > 0.15) & state.alive & ~protected
    clone_sel = base & (max_scale <= percent_dense * extent)
    split_sel = base & (max_scale > percent_dense * extent)

    # --- allocate destination slots from the free list ---
    free_list = jnp.argsort(state.alive)          # dead slots first, stable
    n_free = c - jnp.sum(state.alive.astype(jnp.int32))

    n_clones = jnp.sum(clone_sel.astype(jnp.int32))
    clone_rank = jnp.cumsum(clone_sel.astype(jnp.int32)) - 1   # [C]
    split_rank = jnp.cumsum(split_sel.astype(jnp.int32)) - 1   # [C]

    def dest_of(rank, sel):
        ok = sel & (rank < n_free)
        slot = free_list[jnp.clip(rank, 0, c - 1)]
        return jnp.where(ok, slot, c), ok  # c == out-of-range -> dropped

    clone_dest, clone_ok = dest_of(clone_rank, clone_sel)
    split_dest = []
    split_ok = []
    for j in range(n_split):
        d, ok = dest_of(n_clones + n_split * split_rank + j, split_sel)
        split_dest.append(d)
        split_ok.append(ok)
    # A split is all-or-nothing: only rows whose EVERY child got a slot
    # are split (ranks are monotone in j, so ok[-1] implies the rest).
    # Partially-placed splits would erode the original's mass.
    split_all = split_ok[-1] if split_ok else clone_sel & False
    split_dest = [jnp.where(split_all, d, c) for d in split_dest]

    # --- build new rows ---
    # Clones are verbatim copies. Split children perturb position by a
    # sample from the Gaussian and shrink scales by 0.8*N.
    rot = quat_to_rotmat(state.rotation)                       # [C, 3, 3]
    scales = state.get_scaling()
    eps = jax.random.normal(rng, (n_split, c, 3), scales.dtype)
    child_scaling = state.scaling - jnp.log(0.8 * n_split)

    def scatter_rows(arr, dest, src_vals):
        return arr.at[dest].set(src_vals, mode="drop")

    src = state.trainable_dict()  # pre-densification values (scatter source)
    new = dict(src)
    alive = state.alive
    # clones
    for k in new:
        new[k] = scatter_rows(new[k], clone_dest, src[k])
    alive = alive.at[clone_dest].set(True, mode="drop")
    # split children
    for j in range(n_split):
        offs = jnp.einsum("cij,cj->ci", rot, eps[j] * scales,
                          precision=jax.lax.Precision.HIGHEST)
        vals = dict(src)
        vals["xyz"] = state.xyz + offs
        vals["scaling"] = child_scaling
        for k in new:
            new[k] = scatter_rows(new[k], split_dest[j], vals[k])
        alive = alive.at[split_dest[j]].set(True, mode="drop")

    # --- kill split originals and low-opacity rows ---
    split_done = split_all
    prune_sel = (opac < min_opacity) & state.alive & ~protected
    alive = alive & ~split_done & ~prune_sel

    touched = jnp.zeros(c, bool)
    touched = touched.at[clone_dest].set(True, mode="drop")
    for j in range(n_split):
        touched = touched.at[split_dest[j]].set(True, mode="drop")
    touched = touched | split_done | prune_sel

    state = state.replace_trainable(new)
    state = dataclasses.replace(
        state,
        alive=alive,
        xyz_gradient_accum=jnp.zeros(c),
        denom=jnp.zeros(c),
        max_radii2d=jnp.zeros(c),
    )
    n_cloned = jnp.sum(clone_ok.astype(jnp.int32))
    n_split_done = jnp.sum(split_done.astype(jnp.int32))
    n_dropped = (jnp.sum(clone_sel.astype(jnp.int32)) - n_cloned
                 + n_split * jnp.sum((split_sel & ~split_all)
                                     .astype(jnp.int32)))
    return DensifyResult(
        state=state,
        touched_rows=touched,
        n_cloned=n_cloned,
        n_split=n_split_done,
        n_pruned=jnp.sum(prune_sel.astype(jnp.int32)),
        n_dropped=n_dropped,
    )


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacity to <= 0.01, preserving skybox rows
    (gaussian_model.py:510-514). Caller must zero Adam moments for
    'opacity' (reference replace_tensor_to_optimizer zeroes them all).
    """
    new_op = inverse_sigmoid(jnp.minimum(state.get_opacity(), 0.01).clip(1e-7))
    idx = jnp.arange(state.capacity)[:, None]
    keep_old = (idx < state.n_skybox) if not state.skybox_last else (
        idx >= state.capacity - state.n_skybox)
    return dataclasses.replace(
        state, opacity=jnp.where(keep_old | ~state.alive[:, None],
                                 state.opacity, new_op))


def shrink_big_gaussians(state: GaussianState, extent: float,
                         threshold_frac: float, factor: float = 0.8,
                         protect_scaffold: bool = True) -> GaussianState:
    """Every-iteration clamp of oversized Gaussians.

    train_single.py:180-186 (0.02 x extent, scaffold exempt) and
    train_coarse.py:141-145 (0.1 x extent, skybox exempt).
    """
    max_scale = jnp.max(state.get_scaling(), axis=1)
    violators = (max_scale > threshold_frac * extent) & state.alive
    if protect_scaffold:
        violators = violators & ~_protected_rows(state)
    new_scaling = state.scaling + jnp.log(factor)
    return dataclasses.replace(
        state, scaling=jnp.where(violators[:, None], new_scaling,
                                 state.scaling))
