"""Fused Pallas TPU kernel for the photometric loss (L1 + SSIM) and its
gradient w.r.t. the prediction.

The XLA formulation (utils/losses.photometric_loss under jax.grad) runs
~8 separate 11-tap separable blur chains (5 forward fields + 3 transpose
blurs in the backward) plus ~20 elementwise passes over the [3,H,W]
image — each a round trip through HBM. Measured 8.4 ms fwd+bwd at 1080p
on v5e (chip_logs/profile_stages2_*), ~8x over the bandwidth bound. This
kernel computes the loss AND its analytic gradient in ONE pass over the
image: all blurs, the SSIM map, and the gradient assembly stay in VMEM
per row band.

Math (c1 = 0.01^2, c2 = 0.03^2, window G = 11-tap sigma-1.5 Gaussian,
zero SAME padding — the reference semantics,
/root/reference/utils/loss_utils.py:23-63):

  u = G*x, v = G*y, P = G*x^2, Q = G*y^2, R = G*xy
  A1 = 2uv + c1     A2 = 2(R - uv) + c2
  B1 = u^2+v^2+c1   B2 = (P-u^2) + (Q-v^2) + c2
  map = A1*A2 / (B1*B2)

  d map/d u = 2v(A2 - A1)/(B1 B2) - 2u*map*(1/B1 - 1/B2)
  d map/d P = -map / B2
  d map/d R = 2 A1 / (B1 B2)
  d mean(map)/d x = [G*(c_u) + 2x*(G*c_P) + y*(G*c_R)] / (3HW)
  (G symmetric => G^T = G; the three coefficient fields are blurred once
  more, which is the whole backward.)

  loss = (1-l)*mean|x-y| + l*(1 - mean(map))
  d loss/d x = (1-l)*sign(x-y)/(3HW) - l * d mean(map)/d x

Layout: the [3,H,W] pair is lane-padded (image at lane offset LPAD,
width rounded to a 128 multiple — the zero pad IS the blur's zero-pad
semantics, so W-axis shifts need no masks) and row-padded to a band
multiple. The grid walks row bands; each step sees prev/cur/next bands
(same array passed three times with clamped index maps) so the 10-row
blur halo (two 5-tap stages) comes from neighbor blocks. In-kernel the
[3, 3*BH, WP] slab folds channels onto sublanes ([3*3*BH, WP]): blurs
never mix channels because the rows that row-shifts contaminate across
channel boundaries are halo rows outside every consumed range.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C1 = 0.01 ** 2
C2 = 0.03 ** 2
WIN = 11
RAD = WIN // 2
import os as _os

BH = int(_os.environ.get("H3DGS_SSIM_BH", 24))
                 # band height (grid step rows); halo 2*RAD <= BH,
                 # second-minor block dim must divide by 8 (Mosaic).
                 # Env knob: divergence bisection (repro_ssim_nan) — a
                 # different BH is a wholly different executable, so
                 # "nan persists at the same iteration" discriminates
                 # numerical-edge from miscompile.
LPAD = 8         # image lane offset (>= RAD zeros on the left)


@functools.lru_cache(maxsize=2)
def _window(sigma: float = 1.5):
    xs = [math.exp(-((i - RAD) ** 2) / (2.0 * sigma ** 2))
          for i in range(WIN)]
    t = sum(xs)
    return tuple(x / t for x in xs)


def _blur_w(x, w):
    """11-tap blur along lanes. Zero-pad semantics ride on the lane
    padding: rolls wrap pad zeros in, never image data (LPAD >= RAD on
    the left, >= RAD zeros on the right by construction)."""
    acc = w[RAD] * x
    for j in range(WIN):
        if j != RAD:
            acc = acc + w[j] * jnp.roll(x, RAD - j, axis=1)
    return acc


def _blur_h(x, w):
    """11-tap blur along sublanes (folded channel-major rows). Row rolls
    wrap across channel blocks / slab edges only into rows outside every
    consumed range (see module docstring)."""
    acc = w[RAD] * x
    for j in range(WIN):
        if j != RAD:
            acc = acc + w[j] * jnp.roll(x, RAD - j, axis=0)
    return acc


def _ssim_kernel(xp_ref, xc_ref, xn_ref, yp_ref, yc_ref, yn_ref,
                 *out_refs, h: int, w: int, lam: float,
                 n_bands: int, with_grad: bool):
    grad_ref = out_refs[0] if with_grad else None
    part_ref = out_refs[-1]
    c = pl.program_id(0)
    wvals = _window()
    r = 3 * BH                      # folded per-channel slab rows
    wp = xc_ref.shape[2]

    def fold(p, cu, n):
        return jnp.concatenate(
            [jnp.concatenate([p[ch], cu[ch], n[ch]], axis=0)
             for ch in range(3)], axis=0)                  # [3*3BH, WP]

    xs = fold(xp_ref[:], xc_ref[:], xn_ref[:])
    ys = fold(yp_ref[:], yc_ref[:], yn_ref[:])

    # Global-row validity: folded row i is channel-relative row i % r of
    # the slab starting at global row (c-1)*BH. Invalid rows (above row 0
    # / below row h-1, incl. the H padding) are zeroed — that IS the
    # blur's zero padding along H.
    rel = jax.lax.broadcasted_iota(jnp.int32, (3 * r, 1), 0) % r
    grow = (c - 1) * BH + rel
    vrow = (grow >= 0) & (grow < h)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    vlane = (lane >= LPAD) & (lane < LPAD + w)
    xs = jnp.where(vrow, xs, 0.0)
    ys = jnp.where(vrow, ys, 0.0)

    # Forward: the five blurred fields.
    def blur2(f):
        return _blur_h(_blur_w(f, wvals), wvals)

    u = blur2(xs)
    v = blur2(ys)
    p2 = blur2(xs * xs)
    q2 = blur2(ys * ys)
    r2 = blur2(xs * ys)

    a1 = 2.0 * u * v + C1
    a2 = 2.0 * (r2 - u * v) + C2
    b1 = u * u + v * v + C1
    # True variances are >= 0, so the exact b2 is >= C2; the computed
    # blur(x^2) - u^2 forms can cancel to ~0 (or below) once pixel
    # magnitudes reach ~sqrt(C2/eps) ~ 10 — transient splat blow-ups
    # mid-training get there, and 1/b2 then produces inf/nan gradients.
    # Deterministic divergence at iter 2050 of the city chunk training,
    # reproduced across two kernel tilings (BH 24/16:
    # chip_logs/repro_ssim_on_*.log) — numerical, not a miscompile.
    # Clamping at C2/2 only ever engages in that cancellation regime, so
    # parity with the XLA formulation on sane inputs is untouched.
    b2 = jnp.maximum((p2 - u * u) + (q2 - v * v) + C2, 0.5 * C2)
    inv_b1 = 1.0 / b1
    inv_b2 = 1.0 / b2
    inv_d = inv_b1 * inv_b2
    smap = a1 * a2 * inv_d

    # Partial sums over THIS band's own rows (each image row counted by
    # exactly one grid step) and image lanes.
    cur = (rel >= BH) & (rel < 2 * BH)
    msum = cur & vrow & vlane
    diff = xs - ys
    l1 = jnp.sum(jnp.where(msum, jnp.abs(diff), 0.0))
    ss = jnp.sum(jnp.where(msum, smap, 0.0))
    part_ref[0, :] = jnp.full((wp,), l1, jnp.float32)
    part_ref[1, :] = jnp.full((wp,), ss, jnp.float32)
    part_ref[2:, :] = jnp.zeros((6, wp), jnp.float32)

    if not with_grad:
        # Loss-only variant (forward-only eval): skip the ~3 extra blur
        # chains of the gradient assembly entirely — XLA cannot DCE them
        # out of a fused pallas_call (advisor r4).
        return

    # Backward: coefficient fields, zeroed outside the map's domain
    # (invalid rows / pad lanes hold blur spill that must not feed the
    # transpose blur), scaled by -lam/(3HW).
    scale = -lam / (3.0 * h * w)
    dom = vrow & vlane
    c_u = jnp.where(dom, scale * (2.0 * v * (a2 - a1) * inv_d
                                  - 2.0 * u * smap * (inv_b1 - inv_b2)),
                    0.0)
    c_p = jnp.where(dom, scale * (-smap * inv_b2), 0.0)
    c_r = jnp.where(dom, scale * (2.0 * a1 * inv_d), 0.0)

    g = (blur2(c_u) + 2.0 * xs * blur2(c_p) + ys * blur2(c_r)
         + ((1.0 - lam) / (3.0 * h * w)) * jnp.sign(diff))

    # Unfold the cur band back to [3, BH, WP].
    grad_ref[:] = jnp.stack(
        [g[ch * r + BH:ch * r + 2 * BH, :] for ch in range(3)], axis=0)


def _pad_hw(img, hp, wp):
    c, h, w = img.shape
    return jnp.pad(img, ((0, 0), (0, hp - h), (LPAD, wp - w - LPAD)))


def _run(pred, target, lam: float, with_grad: bool = True):
    c, h, w = pred.shape
    hp = -(-h // BH) * BH
    wp = -(-(w + 2 * LPAD) // 128) * 128
    x = _pad_hw(pred.astype(jnp.float32), hp, wp)
    y = _pad_hw(target.astype(jnp.float32), hp, wp)
    n_bands = hp // BH
    kernel = functools.partial(_ssim_kernel, h=h, w=w, lam=lam,
                               n_bands=n_bands, with_grad=with_grad)

    def band(off):
        return pl.BlockSpec(
            (3, BH, wp),
            lambda c, _o=off: (0, jnp.clip(c + _o, 0, n_bands - 1), 0),
            memory_space=pltpu.VMEM)

    on_tpu = False
    try:
        d = jax.devices()[0]
        on_tpu = (d.platform == "tpu"
                  or "tpu" in getattr(d, "device_kind", "").lower())
    except Exception:
        pass
    grad_spec = pl.BlockSpec((3, BH, wp), lambda c: (0, c, 0),
                             memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((8, wp), lambda c: (c, 0),
                             memory_space=pltpu.VMEM)
    grad_shape = jax.ShapeDtypeStruct((3, hp, wp), jnp.float32)
    part_shape = jax.ShapeDtypeStruct((8 * n_bands, wp), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[band(-1), band(0), band(+1),
                  band(-1), band(0), band(+1)],
        out_specs=([grad_spec, part_spec] if with_grad else [part_spec]),
        out_shape=([grad_shape, part_shape] if with_grad
                   else [part_shape]),
        # The working set (2 input slabs + 5 blurred fields + 3
        # coefficient fields at [9*BH, WP]) legitimately exceeds the
        # 16 MiB default scoped-VMEM budget; v5e has 128 MiB physical.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=not on_tpu,
    )(x, x, x, y, y, y)
    parts = outs[-1]
    sums = jnp.sum(parts[:, 0].reshape(n_bands, 8), axis=0)
    denom = 3.0 * h * w
    loss = ((1.0 - lam) * sums[0] / denom
            + lam * (1.0 - sums[1] / denom))
    if not with_grad:
        return loss, None
    grad = outs[0][:, :h, LPAD:LPAD + w]
    return loss, grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_loss(pred, target, lam: float):
    # Primal (non-differentiated callers, e.g. forward-only eval): the
    # XLA blur-chain forward is FASTER than even the loss-only kernel
    # variant (chip_logs/ab_ssim_20260820T103553Z.log: 3.16 vs 4.04 ms at
    # 1080p, 1.20 vs 1.46 at 544p — XLA fuses the forward-only graph
    # well; the kernel's win is the fused backward). Values agree to f32
    # rounding (dl <= 6e-8 in the same log).
    from ..utils.losses import l1_loss, ssim
    return ((1.0 - lam) * l1_loss(pred, target)
            + lam * (1.0 - ssim(pred, target)))


def _fused_fwd(pred, target, lam: float):
    loss, grad = _run(pred, target, lam)
    return loss, grad


def _fused_bwd(lam, grad, g):
    # Target rides through stop_gradient in the public wrapper; its
    # cotangent is discarded there, so zeros are safe (and the only
    # option — the kernel does not form the target-side gradient).
    return g * grad, jnp.zeros_like(grad)


_fused_loss.defvjp(_fused_fwd, _fused_bwd)


def fused_photometric_loss(pred: jnp.ndarray, target: jnp.ndarray,
                           lambda_dssim: float = 0.2) -> jnp.ndarray:
    """Drop-in photometric_loss with a fused Pallas fwd+bwd.

    Differentiable w.r.t. ``pred`` only (``target`` is stop_gradient'ed —
    the training semantics; utils/losses.photometric_loss is the
    reference formulation it must agree with to f32 rounding)."""
    return _fused_loss(pred, jax.lax.stop_gradient(target),
                       float(lambda_dssim))
