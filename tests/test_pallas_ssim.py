"""Fused Pallas photometric loss (L1 + SSIM fwd + analytic gradient)
must agree with the XLA reference formulation (utils/losses) to f32
rounding — same window, zero-pad semantics, and loss composition.

Reference semantics anchor: /root/reference/utils/loss_utils.py:23-63
(SSIM) and train_single.py:106-108 (loss composition).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.ops.pallas_ssim import BH, fused_photometric_loss
from h3dgs_tpu.utils.losses import photometric_loss


@pytest.mark.parametrize("hw", [(48, 64),          # W < one lane tile pad
                                (100, 130),        # ragged both axes
                                (BH, 128),         # single band
                                (3 * BH + 7, 257)])  # ragged multi-band
def test_fused_matches_xla(hw):
    h, w = hw
    rng = np.random.default_rng(h * 1000 + w)
    x = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    l_ref, g_ref = jax.value_and_grad(
        lambda a: photometric_loss(a, y))(x)
    l_f, g_f = jax.value_and_grad(
        lambda a: fused_photometric_loss(a, y))(x)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=0,
                               atol=5e-7)
    scale = float(np.abs(np.asarray(g_ref)).max())
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref),
                               rtol=0, atol=5e-6 * scale)


def test_fused_lambda_and_identical_images():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1, (3, 40, 96)).astype(np.float32))
    # Identical images: L1 = 0, SSIM = 1 -> loss 0, zero gradient.
    l, g = jax.value_and_grad(
        lambda a: fused_photometric_loss(a, x))(x)
    assert abs(float(l)) < 1e-6
    assert float(jnp.max(jnp.abs(g))) < 1e-7
    # Custom lambda must match the reference composition.
    y = jnp.asarray(rng.uniform(0, 1, (3, 40, 96)).astype(np.float32))
    for lam in (0.0, 0.5, 1.0):
        a = float(fused_photometric_loss(x, y, lambda_dssim=lam))
        b = float(photometric_loss(x, y, lambda_dssim=lam))
        np.testing.assert_allclose(a, b, atol=5e-7)


def test_fused_target_not_differentiated():
    """The target rides through stop_gradient: grad w.r.t. it is zero
    (training semantics — nothing optimizes the ground truth)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (3, 32, 64)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (3, 32, 64)).astype(np.float32))
    g = jax.grad(lambda t: fused_photometric_loss(x, t))(y)
    assert float(jnp.max(jnp.abs(g))) == 0.0
