"""Kernel parity: tiled XLA rasterizer vs. brute-force oracle.

The oracle (ops/reference.py) implements exact per-pixel front-to-back
blending with CUDA-rasterizer semantics; the production tiled path must
match it in both outputs and gradients (SURVEY.md §4 test pyramid, level 2).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.ops import rasterize as R
from h3dgs_tpu.ops import reference as ref
from h3dgs_tpu.ops.binning import bin_gaussians
from h3dgs_tpu.ops.projection import project_gaussians

from .utils import random_scene, make_test_camera

CFG = R.RasterizeConfig(max_entries=1 << 16, max_per_tile=512, chunk=16)


def _render_both(n=60, seed=0, sh_degree=1, bg=(0.0, 0.0, 0.0), **scene_kw):
    means, scales, quats, opac, shs = random_scene(n, seed, sh_degree,
                                                   **scene_kw)
    cam = make_test_camera()
    bg = jnp.asarray(bg, jnp.float32)
    out_ref = ref.render_reference(means, scales, quats, opac, shs, cam,
                                   sh_degree, bg)
    out_fast = R.rasterize(means, scales, quats, opac, shs, cam, sh_degree,
                           bg, config=CFG)
    return out_ref, out_fast


def _assert_images_match(img_fast, img_ref, atol=3e-5, flip_budget=0.005,
                         flip_atol=0.05):
    """Allclose except for rare termination-threshold flips.

    Pixels whose transmittance lands within f32 noise of the 1e-4
    termination epsilon can legitimately terminate one Gaussian earlier or
    later depending on summation order (the CUDA kernel differs from both
    JAX paths the same way); allow a small budget of such pixels.
    """
    img_fast = np.asarray(img_fast)
    img_ref = np.asarray(img_ref)
    diff = np.abs(img_fast - img_ref).max(axis=0)
    assert diff.max() <= flip_atol, f"max pixel diff {diff.max()}"
    frac = (diff > atol).mean()
    assert frac <= flip_budget, f"{frac:.2%} pixels differ by more than {atol}"


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("bg", [(0.0, 0.0, 0.0), (1.0, 1.0, 1.0)])
def test_forward_matches_oracle(seed, bg):
    out_ref, out_fast = _render_both(seed=seed, bg=bg)
    _assert_images_match(out_fast["render"], out_ref["render"])
    _assert_images_match(out_fast["invdepth"], out_ref["invdepth"])
    np.testing.assert_array_equal(out_fast["radii"], out_ref["radii"])


def test_forward_dense_overdraw():
    """Many overlapping opaque splats exercise the termination path."""
    out_ref, out_fast = _render_both(n=200, seed=3, spread=0.3,
                                     opacity_hi=0.999, scale_hi=0.4)
    _assert_images_match(out_fast["render"], out_ref["render"],
                         flip_budget=0.01)


def _grads_both(params, cam, bg, target):
    def loss_ref(p):
        out = ref.render_reference(*p, cam, 1, bg)
        return jnp.mean((out["render"] - target) ** 2)

    def loss_fast(p):
        out = R.rasterize(*p, cam, 1, bg, config=CFG)
        return jnp.mean((out["render"] - target) ** 2)

    return jax.grad(loss_fast)(params), jax.grad(loss_ref)(params)


def test_gradients_match_oracle():
    """With NO pixel near the 1e-4 termination epsilon, every
    implementation must make identical termination decisions, so the
    gradients must agree to f32 noise — 100% of elements, no flip budget
    (VERDICT r1 weak-8: tolerance justified by construction). The min-T
    assertion proves the construction holds."""
    means, scales, quats, opac, shs = random_scene(40, 7, 1)
    cam = make_test_camera(width=32, height=32)
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.ones((3, cam.height, cam.width), jnp.float32) * 0.5
    params = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
              jnp.asarray(opac), jnp.asarray(shs))
    ft = np.asarray(ref.render_reference(*params, cam, 1, bg)
                    ["final_transmittance"])
    assert ft.min() > 1e-2, "scene unexpectedly near termination"
    g_fast, g_ref = _grads_both(params, cam, bg, target)
    for a, b, name in zip(g_fast, g_ref,
                          ["means", "scales", "quats", "opac", "shs"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-5,
                                   err_msg=f"grad mismatch: {name}")


def test_gradients_flip_aware_dense():
    """Termination-heavy scene: gradients of Gaussians that touch NO
    near-termination pixel must still agree strictly; Gaussians whose
    footprint hits a pixel where T crosses ~1e-4 may flip a termination
    decision (summation-order dependent in every implementation, CUDA
    included) and are only bounded in damage."""
    means, scales, quats, opac, shs = random_scene(
        120, 3, 1, spread=0.3, opacity_hi=0.999, scale_hi=0.4)
    cam = make_test_camera(width=32, height=32)
    bg = jnp.zeros(3, jnp.float32)
    target = jnp.full((3, cam.height, cam.width), 0.5, jnp.float32)
    params = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
              jnp.asarray(opac), jnp.asarray(shs))
    out_r = ref.render_reference(*params, cam, 1, bg)
    ft = np.asarray(out_r["final_transmittance"])
    # Flip-prone pixels: terminated or within a generous factor of the
    # epsilon (the running T passed arbitrarily close to it there).
    flip_px = ft < 1e-3
    assert flip_px.any(), "dense scene produced no near-termination pixels"
    from h3dgs_tpu.ops.projection import project_gaussians
    proj = project_gaussians(*params, cam, 1, 1.0)
    centers = np.asarray(proj.means2d)
    radii = np.asarray(proj.radius).astype(np.float64)
    ys, xs = np.nonzero(flip_px)
    if len(xs):
        d2 = ((centers[:, 0:1] - xs[None, :]) ** 2
              + (centers[:, 1:2] - ys[None, :]) ** 2)
        touches = (d2 <= (radii[:, None] + 1.0) ** 2).any(axis=1)
    else:
        touches = np.zeros(len(radii), bool)
    touches |= radii == 0  # culled rows carry no signal either way
    g_fast, g_ref = _grads_both(params, cam, bg, target)
    for a, b, name in zip(g_fast, g_ref,
                          ["means", "scales", "quats", "opac", "shs"]):
        a, b = np.asarray(a), np.asarray(b)
        clean = ~touches
        np.testing.assert_allclose(
            a[clean], b[clean], atol=3e-6, rtol=1e-4,
            err_msg=f"flip-free grad mismatch: {name}")
        assert np.abs(a - b).max() < 5e-4, f"grad blowup: {name}"


def test_screenspace_gradient_channel():
    """means2d_offset carries the densification gradient signal."""
    means, scales, quats, opac, shs = random_scene(30, 11, 1)
    cam = make_test_camera(width=32, height=32)
    bg = jnp.zeros(3, jnp.float32)
    offset = jnp.zeros((30, 2), jnp.float32)

    def loss(off):
        out = R.rasterize(means, scales, quats, opac, shs, cam, 1, bg,
                          means2d_offset=off, config=CFG)
        return jnp.mean(out["render"] ** 2)

    g = jax.grad(loss)(offset)
    assert g.shape == (30, 2)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0.0


def test_binning_counts_are_exact():
    """Every (gaussian, covered tile) pair appears exactly once."""
    means, scales, quats, opac, shs = random_scene(50, 5, 0)
    cam = make_test_camera(width=64, height=48)
    proj = project_gaussians(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), jnp.asarray(opac),
                             jnp.asarray(shs), cam, 0)
    binned = bin_gaussians(proj, cam.height, cam.width, max_entries=1 << 16)
    proj_np = jax.tree.map(np.asarray, proj)

    # Brute-force expected pairs (tight per-axis alpha-bbox rect, f32
    # arithmetic matching binning._tight_rects).
    tiles_x = -(-cam.width // 16)
    tiles_y = -(-cam.height // 16)
    conic = proj_np.conic.astype(np.float32)
    det_c = np.maximum(conic[:, 0] * conic[:, 2] - conic[:, 1] ** 2,
                       np.float32(1e-24))
    big_l = np.log(np.maximum(np.float32(255.0)
                              * proj_np.opacity.astype(np.float32),
                              np.float32(1.0 + 1e-6)))
    r32 = proj_np.radius.astype(np.float32)
    ext_x = np.minimum(
        np.sqrt(2.0 * big_l * conic[:, 2] / det_c).astype(np.float32)
        + np.float32(1e-3), r32)
    ext_y = np.minimum(
        np.sqrt(2.0 * big_l * conic[:, 0] / det_c).astype(np.float32)
        + np.float32(1e-3), r32)
    expected = set()
    for i in range(50):
        if not proj_np.valid[i] or proj_np.radius[i] <= 0:
            continue
        x, y = proj_np.means2d[i][0], proj_np.means2d[i][1]
        x0 = min(max(int(np.floor(np.float32(x - ext_x[i]) / 16)), 0), tiles_x)
        y0 = min(max(int(np.floor(np.float32(y - ext_y[i]) / 16)), 0), tiles_y)
        x1 = min(max(int(np.floor(np.float32(x + ext_x[i]) / 16)) + 1, 0),
                 tiles_x)
        y1 = min(max(int(np.floor(np.float32(y + ext_y[i]) / 16)) + 1, 0),
                 tiles_y)
        for tyy in range(y0, y1):
            for txx in range(x0, x1):
                expected.add((i, tyy * tiles_x + txx))

    got = set()
    gauss = np.asarray(binned.gauss_idx)
    start = np.asarray(binned.tile_start)
    count = np.asarray(binned.tile_count)
    for t in range(tiles_y * tiles_x):
        for e in range(start[t], start[t] + count[t]):
            got.add((int(gauss[e]), t))
    assert got == expected
    assert int(binned.total_entries) == len(expected)

    # Depth-sorted within each tile.
    depth = proj_np.depth
    for t in range(tiles_y * tiles_x):
        ds = [depth[gauss[e]] for e in range(start[t], start[t] + count[t])]
        assert all(ds[i] <= ds[i + 1] for i in range(len(ds) - 1))


def test_render_facade_matches_reference_shape():
    """h3dgs_tpu.render exposes the reference's call shape and keys."""
    import jax.numpy as jnp

    from h3dgs_tpu import render as facade
    from h3dgs_tpu.model import state as S

    means, scales, quats, opac, shs = random_scene(30, seed=2, sh_degree=1)
    st = S.from_arrays(
        xyz=means, features_dc=shs[:, :1], features_rest=shs[:, 1:],
        opacity=np.full((30, 1), 1.0, np.float32),
        scaling=np.log(scales), rotation=quats,
        capacity=30, max_sh_degree=1)
    cam = make_test_camera(width=48, height=32)
    cfg = R.RasterizeConfig(max_entries=1 << 12, max_per_tile=128)
    out = facade.render(cam, st, jnp.zeros(3), config=cfg)
    assert set(out) >= {"render", "depth", "viewspace_points",
                        "visibility_filter", "radii"}
    assert out["render"].shape == (3, 32, 48)
    assert out["depth"].shape == (1, 32, 48)
    assert np.asarray(out["visibility_filter"]).any()

    coarse = facade.render_coarse(cam, st, jnp.zeros(3), config=cfg)
    np.testing.assert_allclose(np.asarray(coarse["render"]),
                               np.asarray(out["render"]), atol=1e-6)


def test_render_facade_index_subset():
    """indices= renders only the selected rows and scatters visibility
    back to full size (reference gaussian_renderer/__init__.py:97-127)."""
    import jax.numpy as jnp

    from h3dgs_tpu import render as facade
    from h3dgs_tpu.model import state as S

    n = 30
    means, scales, quats, opac, shs = random_scene(n, seed=3, sh_degree=1)
    st = S.from_arrays(
        xyz=means, features_dc=shs[:, :1], features_rest=shs[:, 1:],
        opacity=np.full((n, 1), 1.0, np.float32),
        scaling=np.log(scales), rotation=quats,
        capacity=n, max_sh_degree=1)
    cam = make_test_camera(width=48, height=32)
    cfg = R.RasterizeConfig(max_entries=1 << 12, max_per_tile=128)

    keep = np.arange(0, n, 2, dtype=np.int32)
    # Padded bucket (TPU static shapes): -1 rows must be inert.
    idx = np.concatenate([keep, np.full(5, -1, np.int32)])
    out_sub = facade.render(cam, st, jnp.zeros(3), config=cfg, indices=idx)

    # Oracle: zero the opacity of non-selected rows and render full.
    opac_mask = np.zeros((n, 1), np.float32)
    opac_mask[keep] = 1.0
    st_masked = dataclasses.replace(st, opacity=st.opacity + np.where(
        opac_mask > 0, 0.0, -1e9).astype(np.float32))
    out_masked = facade.render(cam, st_masked, jnp.zeros(3), config=cfg)
    np.testing.assert_allclose(np.asarray(out_sub["render"]),
                               np.asarray(out_masked["render"]), atol=1e-5)

    vis = np.asarray(out_sub["visibility_filter"])
    assert vis.shape == (n,)
    assert not vis[1::2].any()          # non-selected rows never visible
    assert vis[keep].any()
    radii = np.asarray(out_sub["radii"])
    assert radii.shape == (n,)
    assert (radii[1::2] == 0).all()


@pytest.mark.parametrize("degree", [0, 1, 2, 3, 4])
def test_sh_components_match_eval_sh(degree):
    """projection._eval_sh_components duplicates the SH basis table of
    utils.sh.eval_sh for full-lane [N] math — pin the two tables to each
    other at every degree (ADVICE r3: degrees 2-4 were only covered by
    on-chip end-to-end PSNR)."""
    from h3dgs_tpu.ops.projection import _eval_sh_components
    from h3dgs_tpu.utils.sh import eval_sh

    rng = np.random.default_rng(degree)
    n = 257
    k = (degree + 1) ** 2
    sh = jnp.asarray(rng.normal(size=(n, k, 3)).astype(np.float32))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs)

    got = _eval_sh_components(degree, sh, dirs[:, 0], dirs[:, 1],
                              dirs[:, 2])
    want = eval_sh(degree, sh, dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
