"""Masked sparse Adam: per-row updates only for Gaussians touched this step.

The reference's OurAdam (/root/reference/scene/OurAdam.py:255-340) gathers
the rows whose opacity gradient is nonzero, updates their moments/params,
and scatters back; the global step counter increments every call. That
gather/scatter becomes a plain `where` on TPU — it fuses into one VPU pass
over the parameter arrays, and rows not visible in the current view keep
their moments un-decayed (the property that makes million-Gaussian training
cheap).

Each parameter group has its own learning rate, updated per step by the
caller (xyz uses the expon schedule; see utils/schedules.py).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: Dict[str, jax.Array]
    nu: Dict[str, jax.Array]
    step: jax.Array  # scalar int32, shared across groups (OurAdam semantics)


def init(params: Dict[str, jax.Array]) -> AdamState:
    z = {k: jnp.zeros_like(v) for k, v in params.items()}
    return AdamState(mu=z, nu={k: jnp.zeros_like(v) for k, v in params.items()},
                     step=jnp.zeros((), jnp.int32))


def sparse_adam_update(
    params: Dict[str, jax.Array],
    grads: Dict[str, jax.Array],
    state: AdamState,
    lrs: Dict[str, jax.Array],
    row_mask: jax.Array,           # [C] bool: rows to update this step
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-15,            # reference uses eps=1e-15 (gaussian_model.py:278)
):
    """One masked Adam step. Returns (new_params, new_state)."""
    step = state.step + 1
    bc1 = 1.0 - beta1 ** step.astype(jnp.float32)
    bc2 = 1.0 - beta2 ** step.astype(jnp.float32)
    sqrt_bc2 = jnp.sqrt(bc2)

    new_params, new_mu, new_nu = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        m = row_mask.reshape((-1,) + (1,) * (p.ndim - 1))
        mu = jnp.where(m, beta1 * state.mu[k] + (1.0 - beta1) * g, state.mu[k])
        nu = jnp.where(m, beta2 * state.nu[k] + (1.0 - beta2) * g * g,
                       state.nu[k])
        denom = jnp.sqrt(nu) / sqrt_bc2 + eps
        upd = (lrs[k] / bc1) * mu / denom
        new_params[k] = jnp.where(m, p - upd, p)
        new_mu[k] = mu
        new_nu[k] = nu
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)


def reset_rows(state: AdamState, row_mask: jax.Array,
               keys=None) -> AdamState:
    """Zero optimizer moments for masked rows (slot reuse / opacity reset).

    Mirrors the reference's optimizer-state surgery on prune/cat/replace
    (gaussian_model.py:528-597) under fixed capacity.
    """
    keys = set(state.mu.keys() if keys is None else keys)
    mu = dict(state.mu)
    nu = dict(state.nu)
    for k in keys:
        m = row_mask.reshape((-1,) + (1,) * (state.mu[k].ndim - 1))
        mu[k] = jnp.where(m, 0.0, state.mu[k])
        nu[k] = jnp.where(m, 0.0, state.nu[k])
    return dataclasses.replace(state, mu=mu, nu=nu)


def grow_rows(state: AdamState, new_capacity: int,
              tail_rows: int = 0) -> AdamState:
    """Grow per-row moments to a larger capacity (zeros for new rows).

    Companion to model.state.grow_capacity: ``tail_rows`` > 0 keeps that
    many trailing rows (skybox_last layout) at the END of the new arrays,
    inserting the zero padding before them; moments stay row-aligned with
    the grown parameter arrays. The shared step counter is untouched
    (OurAdam semantics: one counter for the whole group).
    """
    def grow(a):
        c = a.shape[0]
        if new_capacity <= c:
            raise ValueError(f"new capacity {new_capacity} <= current {c}")
        z = jnp.zeros((new_capacity,) + a.shape[1:], a.dtype)
        body = c - tail_rows
        z = z.at[:body].set(a[:body])
        if tail_rows:
            z = z.at[new_capacity - tail_rows:].set(a[body:])
        return z

    return AdamState(mu={k: grow(v) for k, v in state.mu.items()},
                     nu={k: grow(v) for k, v in state.nu.items()},
                     step=state.step)
