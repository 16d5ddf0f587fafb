"""Silent-quality-cliff guards (VERDICT r1 item 6): capacity growth on
densify overflow, max_per_tile truncation telemetry, and cut-bucket
growth signals. The CUDA reference never drops work (dynamic allocation
everywhere); the static-shape TPU equivalents must either grow or warn."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.model import state as state_lib
from h3dgs_tpu.ops import adam as adam_lib
from h3dgs_tpu.ops.rasterize import RasterizeConfig, rasterize
from h3dgs_tpu.train.loop import _capacity_bucket
from h3dgs_tpu.train.step import densify_step

from .utils import make_test_camera, random_scene


def _full_state(n=24, capacity=32, **kw):
    means, scales, quats, opac, shs = random_scene(n, seed=0, sh_degree=0)
    return state_lib.from_arrays(
        xyz=means, features_dc=shs[:, :1], features_rest=np.zeros(
            (n, 15, 3), np.float32),
        opacity=np.asarray(opac).reshape(n, 1),
        scaling=np.log(scales), rotation=quats,
        capacity=capacity, max_sh_degree=0, **kw)


@pytest.mark.parametrize("skybox_last", [False, True])
def test_grow_capacity_preserves_rows(skybox_last):
    st = _full_state(n=24, capacity=32, n_skybox=4,
                     skybox_last=skybox_last)
    grown = state_lib.grow_capacity(st, 64)
    assert grown.capacity == 64
    assert int(grown.n_alive) == int(st.n_alive)
    if skybox_last:
        # Body rows in place; skybox block moved to the new tail.
        np.testing.assert_array_equal(np.asarray(grown.xyz[:20]),
                                      np.asarray(st.xyz[:20]))
        np.testing.assert_array_equal(np.asarray(grown.xyz[60:]),
                                      np.asarray(st.xyz[28:32]))
        assert bool(grown.locked_rows_mask()[63])
        assert not bool(grown.locked_rows_mask()[40])
    else:
        np.testing.assert_array_equal(np.asarray(grown.xyz[:32]),
                                      np.asarray(st.xyz))
        assert bool(grown.locked_rows_mask()[0])
    with pytest.raises(ValueError, match="<= current"):
        state_lib.grow_capacity(st, 32)


def test_grow_rows_aligns_with_state():
    st = _full_state(n=24, capacity=32, n_skybox=4, skybox_last=True)
    opt = adam_lib.init(st.trainable_dict())
    opt = dataclasses.replace(
        opt, mu={k: v + 1.0 for k, v in opt.mu.items()},
        step=jnp.asarray(7, jnp.int32))
    grown = adam_lib.grow_rows(opt, 64, tail_rows=4)
    for k, v in grown.mu.items():
        assert v.shape[0] == 64
        np.testing.assert_array_equal(np.asarray(v[:28]),
                                      np.asarray(opt.mu[k][:28]))
        np.testing.assert_array_equal(np.asarray(v[60:]),
                                      np.asarray(opt.mu[k][28:]))
        assert float(jnp.abs(v[28:60]).sum()) == 0.0
    assert int(grown.step) == 7


def test_capacity_bucket():
    assert _capacity_bucket(10_000, 50, 0) >= 15_000
    assert _capacity_bucket(10_000, 50, 0) % 1024 == 0
    assert _capacity_bucket(10_000, 50, 12_000) == 12_000
    assert _capacity_bucket(10_000, 10_000, 0) >= 50_000


def test_densify_drop_then_grow_recovers():
    """A saturated state drops split/clone output; growing capacity and
    re-running densify fits the same pressure."""
    st = _full_state(n=30, capacity=32)
    # Fake pressure: every row over the grad threshold with small scale
    # (clone path) so densify wants ~30 new rows into 2 free slots.
    st = dataclasses.replace(
        st, xyz_gradient_accum=jnp.full((32,), 1.0),
        denom=jnp.ones((32,)), max_radii2d=jnp.full((32,), 10.0))
    rng = jax.random.PRNGKey(0)
    opt = adam_lib.init(st.trainable_dict())
    st2, opt2, stats = densify_step(st, opt, rng, 1e-4, 0.005,
                                    jnp.asarray(10.0), 0.01)
    n_drop = int(stats[3])
    assert n_drop > 0, "test setup produced no drops"
    grown = state_lib.grow_capacity(st2, 128)
    opt_g = adam_lib.grow_rows(opt2, 128)
    # Pressure stats were consumed by the first pass; re-fake them.
    grown = dataclasses.replace(
        grown, xyz_gradient_accum=jnp.where(grown.alive, 1.0, 0.0),
        denom=grown.alive.astype(jnp.float32),
        max_radii2d=jnp.where(grown.alive, 10.0, 0.0))
    st3, _opt3, stats3 = densify_step(grown, opt_g, rng, 1e-4, 0.005,
                                      jnp.asarray(10.0), 0.01)
    assert int(stats3[3]) == 0, "grown capacity still drops"
    assert int(st3.n_alive) > int(st2.n_alive)


def test_max_per_tile_truncation_reported():
    means, scales, quats, opac, shs = random_scene(200, seed=3,
                                                   sh_degree=0)
    means = np.asarray(means) * np.array([0.2, 0.2, 1.0])  # pile up
    cam = make_test_camera(width=48, height=32)
    bg = jnp.zeros(3, jnp.float32)
    base = dict(max_entries=1 << 13, chunk_e=256, quantum=128)
    out_t = rasterize(jnp.asarray(means), scales, quats, opac, shs, cam,
                      0, bg, config=RasterizeConfig(
                          backend="pallas", max_per_tile=16, **base))
    assert int(out_t["n_truncated"]) > 0
    out_ok = rasterize(jnp.asarray(means), scales, quats, opac, shs, cam,
                       0, bg, config=RasterizeConfig(
                           backend="pallas", max_per_tile=4096, **base))
    assert int(out_ok["n_truncated"]) == 0
    out_xla = rasterize(jnp.asarray(means), scales, quats, opac, shs, cam,
                        0, bg, config=RasterizeConfig(
                            backend="xla", max_per_tile=16,
                            max_entries=1 << 13))
    assert int(out_xla["n_truncated"]) == 0


def test_post_cut_overflow_signal_and_growth():
    """cut_size reports the TRUE cut size even when it exceeds max_cut
    (the loop's growth trigger), and the grown bucket renders the full
    cut."""
    from h3dgs_tpu.hierarchy import tree as tree_lib
    from h3dgs_tpu.hierarchy.cut import expand_to_size

    means, scales, quats, opac, shs = random_scene(60, seed=1, sh_degree=0)
    h = tree_lib.build_hierarchy(means, shs, opac, np.log(scales), quats)
    nodes = jnp.asarray(h.nodes)
    boxes = jnp.asarray(h.boxes)
    cam = make_test_camera(width=48, height=32)
    center = jnp.asarray(cam.cam_center)
    cut_small = expand_to_size(nodes, boxes, jnp.asarray(0.001), center, 8)
    true_size = int(cut_small.count)
    assert true_size > 8, "scene too small to overflow the bucket"
    bucket = 8
    while bucket < true_size:
        bucket *= 2
    cut_big = expand_to_size(nodes, boxes, jnp.asarray(0.001), center,
                             bucket)
    assert int(cut_big.count) == true_size
    assert int(jnp.sum(cut_big.valid.astype(jnp.int32))) == true_size


def test_checkpoint_roundtrip_after_growth(tmp_path):
    """A checkpoint written after capacity growth restores at the GROWN
    capacity even when the resume template has the original (smaller)
    one — load_flat adopts the checkpoint's arrays wholesale."""
    from h3dgs_tpu.train import checkpoint as ckpt_lib

    st = _full_state(n=24, capacity=32)
    opt = adam_lib.init(st.trainable_dict())
    grown = state_lib.grow_capacity(st, 64)
    opt_g = adam_lib.grow_rows(opt, 64)
    exposure = jnp.tile(jnp.eye(3, 4)[None], (3, 1, 1))
    exp_opt = adam_lib.init({"exposure": exposure})
    path = str(tmp_path / "chk.npz")
    ckpt_lib.save_flat(path, grown, opt_g, exposure, exp_opt, 123)
    st2, opt2, exp2, _eo, it = ckpt_lib.load_flat(path, st)
    assert st2.capacity == 64
    assert opt2.mu["xyz"].shape[0] == 64
    assert it == 123
    np.testing.assert_array_equal(np.asarray(st2.xyz),
                                  np.asarray(grown.xyz))
