"""In-job checkpointing: full optimizer state snapshots.

Equivalent of the reference's capture()/restore() torch checkpoints
(/root/reference/train_single.py:188-190, scene/gaussian_model.py:74-106):
all six parameter tensors + densification stats + Adam moments + exposure
state + iteration, in one .npz (portable, no pickling).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..model.state import GaussianState
from ..ops import adam as adam_lib

_STATE_FIELDS = ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity", "alive", "max_radii2d",
                 "xyz_gradient_accum", "denom")


def save_flat(path: str, state: GaussianState, opt: adam_lib.AdamState,
              exposure, exp_opt: adam_lib.AdamState, iteration: int) -> None:
    arrs = {f"state.{k}": np.asarray(getattr(state, k))
            for k in _STATE_FIELDS}
    for k, v in opt.mu.items():
        arrs[f"opt.mu.{k}"] = np.asarray(v)
    for k, v in opt.nu.items():
        arrs[f"opt.nu.{k}"] = np.asarray(v)
    arrs["opt.step"] = np.asarray(opt.step)
    arrs["exposure"] = np.asarray(exposure)
    arrs["exp_opt.mu"] = np.asarray(exp_opt.mu["exposure"])
    arrs["exp_opt.nu"] = np.asarray(exp_opt.nu["exposure"])
    arrs["exp_opt.step"] = np.asarray(exp_opt.step)
    arrs["iteration"] = np.asarray(iteration)
    np.savez(path, **arrs)


def load_flat(path: str, template: GaussianState):
    """Returns (state, opt, exposure, exp_opt, iteration). ``template``
    supplies the static metadata (skybox counts etc.)."""
    z = np.load(path)
    state = dataclasses.replace(
        template, **{k: jnp.asarray(z[f"state.{k}"]) for k in _STATE_FIELDS})
    keys = [k.split(".", 2)[2] for k in z.files if k.startswith("opt.mu.")]
    opt = adam_lib.AdamState(
        mu={k: jnp.asarray(z[f"opt.mu.{k}"]) for k in keys},
        nu={k: jnp.asarray(z[f"opt.nu.{k}"]) for k in keys},
        step=jnp.asarray(z["opt.step"]))
    exp_opt = adam_lib.AdamState(
        mu={"exposure": jnp.asarray(z["exp_opt.mu"])},
        nu={"exposure": jnp.asarray(z["exp_opt.nu"])},
        step=jnp.asarray(z["exp_opt.step"]))
    return (state, opt, jnp.asarray(z["exposure"]), exp_opt,
            int(z["iteration"]))
