"""Learning-rate schedules.

``expon_lr`` reproduces the JaxNeRF/Plenoxels log-linear decay with optional
sinusoidal delay used by the reference for xyz and exposure learning rates
(/root/reference/utils/general_utils.py:31-66). It is pure and jit-friendly:
``step`` may be a traced scalar.
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    if lr_init == 0.0:
        return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)


def make_expon_lr_fn(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                     max_steps=1_000_000):
    def fn(step):
        return expon_lr(step, lr_init, lr_final, lr_delay_steps,
                        lr_delay_mult, max_steps)
    return fn


def gaussian_lr_dict(opt_cfg, iteration, freeze_xyz: bool = False):
    """Per-parameter-group learning rates for Gaussian optimization.

    The single source of the reference's LR table (train_single.py /
    train_post.py setup; OptimizationParams defaults): exponential xyz
    schedule (zeroed when the coarse trainer freezes positions), constant
    rates for features (f_rest at feature_lr/20), opacity, scaling,
    rotation. Used by the flat, data-parallel, and post-optimization
    steps alike.
    """
    xyz_lr = expon_lr(
        iteration, opt_cfg.position_lr_init, opt_cfg.position_lr_final,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps)
    if freeze_xyz:
        xyz_lr = 0.0
    return {
        "xyz": xyz_lr,
        "f_dc": opt_cfg.feature_lr,
        "f_rest": opt_cfg.feature_lr / 20.0,
        "opacity": opt_cfg.opacity_lr,
        "scaling": opt_cfg.scaling_lr,
        "rotation": opt_cfg.rotation_lr,
    }
