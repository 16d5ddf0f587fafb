"""Unit tests: GaussianState, masked Adam, fixed-capacity densification."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from h3dgs_tpu.model import densify as D
from h3dgs_tpu.model import state as S
from h3dgs_tpu.ops import adam as A


def _toy_state(n=8, capacity=16, **kw):
    rng = np.random.default_rng(0)
    return S.from_arrays(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        features_rest=np.zeros((n, 15, 3), np.float32),
        opacity=np.full((n, 1), 2.0, np.float32),  # sigmoid ~ 0.88
        scaling=np.full((n, 3), -3.0, np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=capacity, **kw)


def test_state_masks_dead_rows():
    st = _toy_state()
    assert int(st.n_alive) == 8
    op = np.asarray(st.get_opacity())
    assert (op[8:] == 0).all()
    assert (op[:8] > 0.8).all()


def test_sparse_adam_only_touches_masked_rows():
    st = _toy_state()
    params = st.trainable_dict()
    opt = A.init(params)
    grads = {k: jnp.ones_like(v) for k, v in params.items()}
    mask = jnp.arange(16) < 4
    new_params, new_opt = A.sparse_adam_update(
        params, grads, opt, {k: 0.1 for k in params}, mask)
    for k in params:
        changed = np.any(np.asarray(new_params[k]) != np.asarray(params[k]),
                         axis=tuple(range(1, params[k].ndim)))
        assert changed[:4].all(), k
        assert not changed[4:].any(), k
    # moments updated only for masked rows
    assert np.all(np.asarray(new_opt.mu["xyz"][4:]) == 0)
    assert np.all(np.asarray(new_opt.mu["xyz"][:4]) != 0)
    assert int(new_opt.step) == 1


def test_densify_clone_and_split():
    st = _toy_state(n=8, capacity=32)
    # Give rows 0-1 high stats -> candidates. Row 0 small (clone);
    # row 1 big (split).
    st = dataclasses.replace(
        st,
        xyz_gradient_accum=st.xyz_gradient_accum.at[:2].set(10.0),
        max_radii2d=st.max_radii2d.at[:2].set(50.0),
        # row 0: max scale e^-6 ~ 0.0025 < 0.01 -> clone;
        # row 1: 0.5 > 0.01 -> split.
        scaling=st.scaling.at[0].set(-6.0).at[1].set(
            jnp.log(jnp.asarray([0.5, 0.5, 0.5]))),
    )
    extent = 1.0
    res = D.densify_and_prune(st, jax.random.key(0), max_grad=0.015,
                              min_opacity=0.005, extent=extent,
                              percent_dense=0.01)
    assert int(res.n_cloned) == 1
    assert int(res.n_split) == 1
    assert int(res.n_pruned) == 0
    assert int(res.n_dropped) == 0
    # 8 initial + 1 clone + 2 children - 1 split original = 10
    assert int(res.state.n_alive) == 10
    # stats reset
    assert np.all(np.asarray(res.state.xyz_gradient_accum) == 0)


def test_densify_respects_capacity():
    st = _toy_state(n=8, capacity=9)  # room for only one new row
    st = dataclasses.replace(
        st,
        xyz_gradient_accum=st.xyz_gradient_accum.at[:8].set(10.0),
        max_radii2d=st.max_radii2d.at[:8].set(50.0))
    res = D.densify_and_prune(st, jax.random.key(1), max_grad=0.015,
                              min_opacity=0.005, extent=1.0,
                              percent_dense=0.01)
    assert int(res.state.n_alive) <= 9
    assert int(res.n_dropped) > 0


def test_densify_protects_scaffold():
    st = _toy_state(n=8, capacity=32, n_scaffold=4, n_skybox=2)
    st = dataclasses.replace(
        st,
        xyz_gradient_accum=st.xyz_gradient_accum.at[:8].set(10.0),
        max_radii2d=st.max_radii2d.at[:8].set(50.0),
        opacity=st.opacity.at[:8].set(-10.0))  # all prune candidates
    res = D.densify_and_prune(st, jax.random.key(2), max_grad=0.015,
                              min_opacity=0.005, extent=1.0,
                              percent_dense=0.01)
    alive = np.asarray(res.state.alive)
    assert alive[:4].all()       # scaffold prefix survives
    assert not alive[4:8].any()  # the rest pruned (opacity ~ 0)


def test_reset_opacity_preserves_skybox():
    st = _toy_state(n=8, capacity=16, n_skybox=3)
    new = D.reset_opacity(st)
    op_new = np.asarray(new.get_opacity())
    assert np.allclose(op_new[3:8], 0.01, atol=1e-5)
    assert np.allclose(op_new[:3], np.asarray(st.get_opacity())[:3])


def test_shrink_big_gaussians():
    st = _toy_state(n=8, capacity=16)
    st = dataclasses.replace(st, scaling=st.scaling.at[0].set(jnp.log(5.0)))
    new = D.shrink_big_gaussians(st, extent=1.0, threshold_frac=1.0)
    s_new = np.asarray(new.get_scaling())
    assert np.allclose(s_new[0], 5.0 * 0.8, rtol=1e-5)
    assert np.allclose(s_new[1], np.exp(-3.0), rtol=1e-5)


def test_pt_format_roundtrip(tmp_path):
    """done_*.pt + point_cloud.bin (the reference's >8M-point format)."""
    import struct

    from h3dgs_tpu.io import pt as pt_io

    rng = np.random.default_rng(0)
    n = 37
    arrs = dict(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        features_rest=rng.normal(size=(n, 15, 3)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        scaling=rng.normal(size=(n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32))
    pt_io.save_pt(str(tmp_path), **arrs)
    back = pt_io.load_pt(str(tmp_path))
    for k, v in arrs.items():
        np.testing.assert_array_equal(back[k], v)

    with open(tmp_path / "point_cloud.bin", "rb") as f:
        cnt = struct.unpack("i", f.read(4))[0]
        assert cnt == n
        xyz = np.frombuffer(f.read(n * 12), np.float32).reshape(n, 3)
        np.testing.assert_array_equal(xyz, arrs["xyz"])
        feats = np.frombuffer(f.read(n * 16 * 3 * 4),
                              np.float32).reshape(n, 16, 3)
        np.testing.assert_array_equal(feats[:, :1], arrs["features_dc"])
        np.testing.assert_array_equal(feats[:, 1:], arrs["features_rest"])


def test_dead_rows_consume_no_entry_budget():
    """Capacity padding rows (opacity 0) must not project, bin, or read
    as visible — with capacity_factor=8 most rows are dead and used to
    eat the duplication budget (review finding)."""
    import jax.numpy as jnp

    from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from tests.utils import make_test_camera, random_scene

    means, scales, quats, opac, shs = random_scene(50, seed=0, sh_degree=1)
    st = S.from_arrays(
        xyz=means, features_dc=shs[:, :1], features_rest=shs[:, 1:],
        opacity=np.full((50, 1), 2.0, np.float32),
        scaling=np.log(scales), rotation=quats,
        capacity=400, max_sh_degree=1)
    cam = make_test_camera(width=48, height=32)
    cfg = RasterizeConfig(max_entries=1 << 12, max_per_tile=256)
    out = rasterize(st.xyz, st.get_scaling(), st.get_rotation(),
                    st.get_opacity()[:, 0], st.get_features(1), cam, 1,
                    jnp.zeros(3), config=cfg)
    vis = np.asarray(out["visibility_filter"])
    assert not vis[50:].any(), "dead padding rows reported visible"

    ref = rasterize(jnp.asarray(means), jnp.asarray(scales),
                    jnp.asarray(quats), jnp.asarray(opac) * 0 + 0.88,
                    jnp.asarray(shs), cam, 1, jnp.zeros(3), config=cfg)
    st_dup = int(out["n_duplicates"])
    # padded state's duplicate count must match a dense 50-row render's
    # scale (not 8x it); allow slack for opacity-dependent culling.
    assert st_dup <= int(ref["n_duplicates"]) * 2


def test_skybox_last_rows_relocated_with_padding():
    """skybox_last + capacity padding: the skybox must sit in the last
    capacity rows (what locked_rows_mask/reset_opacity/render_cut
    address), not buried mid-array (review finding)."""
    n, n_sky, cap = 8, 3, 12
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    st = S.from_arrays(
        xyz=xyz,
        features_dc=np.zeros((n, 1, 3), np.float32),
        features_rest=np.zeros((n, 0, 3), np.float32),
        opacity=np.ones((n, 1), np.float32),
        scaling=np.zeros((n, 3), np.float32),
        rotation=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
        capacity=cap, max_sh_degree=0, n_skybox=n_sky, skybox_last=True)
    locked = np.asarray(st.locked_rows_mask())
    alive = np.asarray(st.alive)
    # The 3 locked rows are alive and hold the last 3 input rows.
    assert locked.sum() == n_sky
    assert alive[locked].all()
    np.testing.assert_array_equal(np.asarray(st.xyz)[cap - n_sky:],
                                  xyz[n - n_sky:])
    # Body rows intact; padding rows dead.
    np.testing.assert_array_equal(np.asarray(st.xyz)[:n - n_sky],
                                  xyz[:n - n_sky])
    assert not alive[n - n_sky:cap - n_sky].any()


def test_adam_reset_rows_empty_keys_is_noop():
    import jax.numpy as jnp

    from h3dgs_tpu.ops import adam as A

    params = {"a": jnp.ones((4, 2)), "b": jnp.ones((4,))}
    st = A.init(params)
    st = dataclasses.replace(
        st, mu={k: v + 1 for k, v in st.mu.items()})
    mask = jnp.asarray([True, False, True, False])
    out = A.reset_rows(st, mask, keys=[])
    for k in st.mu:
        np.testing.assert_array_equal(np.asarray(out.mu[k]),
                                      np.asarray(st.mu[k]))
