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
