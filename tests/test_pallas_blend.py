"""Pallas blend kernel parity vs the XLA scan path (and thus the oracle).

Runs the kernel in interpreter mode on CPU (tests), and compiled on real
TPU when available. Checks forward images, invdepth, transmittance, and
gradients w.r.t. every Gaussian attribute including screen-space means
(the densification signal)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.ops import rasterize as R
from h3dgs_tpu.utils.losses import photometric_loss

from .utils import make_test_camera, random_scene

XLA_CFG = R.RasterizeConfig(max_entries=1 << 12, max_per_tile=256,
                            chunk=16, backend="xla")
PL_CFG = XLA_CFG._replace(backend="pallas", chunk_e=128, quantum=128)
# Segmented grid steps: two 128-entry quanta (possibly different tiles)
# per 256-wide step — the production configuration.
PL_CFG_SEG = XLA_CFG._replace(backend="pallas", chunk_e=256, quantum=128)
# Wide grid step: four quanta per 512-wide step (blockwise prefix).
PL_CFG_SEG4 = XLA_CFG._replace(backend="pallas", chunk_e=512, quantum=128)
# Sub-128 quanta: block-diagonal MXU prefixes + masked lane chaining
# (halve/quarter the per-tile alignment padding — VERDICT r4 D-shrink).
PL_CFG_Q64 = XLA_CFG._replace(backend="pallas", chunk_e=256, quantum=64)
PL_CFG_Q32 = XLA_CFG._replace(backend="pallas", chunk_e=256, quantum=32)
# Segsum gradient reduction (plain scatter to unique gen-stream slots +
# cumsum + boundary diffs) instead of scatter-add.
PL_CFG_SEGSUM = PL_CFG_SEG._replace(scatter_mode="segsum")
# ... combined with backward termination truncation (compacted stream)
# and with the 2-key sort fallback (gauss_idx in original space).
PL_CFG_SEGSUM_TR = PL_CFG_SEG._replace(scatter_mode="segsum",
                                       bwd_entries=None)
PL_CFG_SEGSUM_2K = PL_CFG_SEG._replace(scatter_mode="segsum",
                                       sort_mode="2key")


def _scene(n=80, seed=0):
    means, scales, quats, opac, shs = random_scene(n, seed, sh_degree=1)
    cam = make_test_camera(width=48, height=32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs)), cam, bg


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("pl_cfg", [PL_CFG, PL_CFG_SEG, PL_CFG_SEG4,
                                    PL_CFG_Q64, PL_CFG_Q32])
def test_pallas_forward_matches_xla(seed, pl_cfg):
    params, cam, bg = _scene(seed=seed)
    out_x = R.rasterize(*params, cam, 1, bg, config=XLA_CFG)
    out_p = R.rasterize(*params, cam, 1, bg, config=pl_cfg)
    np.testing.assert_allclose(np.asarray(out_p["render"]),
                               np.asarray(out_x["render"]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p["invdepth"]),
                               np.asarray(out_x["invdepth"]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p["final_transmittance"]),
                               np.asarray(out_x["final_transmittance"]),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("pl_cfg", [
    pytest.param(PL_CFG, marks=pytest.mark.slow),
    PL_CFG_SEG,
    pytest.param(PL_CFG_SEG4, marks=pytest.mark.slow),
    PL_CFG_Q64,
    pytest.param(PL_CFG_Q32, marks=pytest.mark.slow),
    PL_CFG_SEGSUM,
    pytest.param(PL_CFG_SEGSUM_TR, marks=pytest.mark.slow),
    pytest.param(PL_CFG_SEGSUM_2K, marks=pytest.mark.slow)])
def test_pallas_gradients_match_xla(pl_cfg):
    params, cam, bg = _scene(seed=1)
    target = jnp.full((3, 32, 48), 0.4)
    tgt_d = jnp.full((1, 32, 48), 0.5)

    def loss(params, cfg):
        out = R.rasterize(*params, cam, 1, bg,
                          means2d_offset=jnp.zeros(
                              (params[0].shape[0], 2)), config=cfg)
        return (photometric_loss(out["render"], target)
                + 0.3 * jnp.mean(jnp.abs(out["invdepth"] - tgt_d))
                + 0.1 * jnp.mean(out["final_transmittance"]))

    g_x = jax.grad(lambda p: loss(p, XLA_CFG))(params)
    g_p = jax.grad(lambda p: loss(p, pl_cfg))(params)
    names = ["means", "scales", "quats", "opac", "shs"]
    for nm, a, b in zip(names, g_p, g_x):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-4,
                                   err_msg=f"grad mismatch: {nm}")


def test_pallas_screenspace_grads():
    """The densification signal: gradient w.r.t. the means2d offset."""
    params, cam, bg = _scene(seed=2)
    n = params[0].shape[0]
    target = jnp.full((3, 32, 48), 0.4)

    def loss(offset, cfg):
        out = R.rasterize(*params, cam, 1, bg, means2d_offset=offset,
                          config=cfg)
        return photometric_loss(out["render"], target)

    z = jnp.zeros((n, 2))
    g_x = np.asarray(jax.grad(lambda o: loss(o, XLA_CFG))(z))
    g_p = np.asarray(jax.grad(lambda o: loss(o, PL_CFG))(z))
    scale = np.abs(g_x).max() + 1e-8
    np.testing.assert_allclose(g_p / scale, g_x / scale, atol=5e-4)
    assert np.abs(g_x).max() > 0


# Budgets above the raw duplicate count (393) but below the aligned
# need (768): pure aligned-stream overflow, including straddles.
@pytest.mark.parametrize("budget", [
    pytest.param(512, marks=pytest.mark.slow), 640])
def test_aligned_overflow_accounting(budget):
    """When the chunk-padded aligned stream exceeds max_entries, the need
    is reported via n_duplicates and overflowed tiles degrade to clean
    background instead of gathering another tile's transmittance. The
    budget sweep makes some tile's aligned run STRADDLE the buffer end —
    its resident prefix must not leak partial color over the background
    (all-or-nothing per tile)."""
    params, cam, bg = _scene(n=200, seed=4)
    big = R.rasterize(*params, cam, 1, bg, config=PL_CFG)
    need = int(big["n_duplicates"])
    assert need > budget

    tiny = PL_CFG._replace(max_entries=budget, chunk_e=128)
    out = R.rasterize(*params, cam, 1, bg, config=tiny)
    assert int(out["n_duplicates"]) >= need
    img = np.asarray(out["render"])
    full = np.asarray(big["render"])
    bgc = np.asarray(bg)[:, None, None]
    # Every pixel is either (nearly) the full render (tile fit) or the
    # pure background (tile dropped) — never garbage.
    is_bg = np.all(np.abs(img - bgc) < 1e-5, axis=0)
    is_full = np.all(np.abs(img - full) < 1e-4, axis=0)
    assert np.all(is_bg | is_full)
    assert is_bg.any()


def _saturated_scene(n=300, seed=7):
    """Heavily overlapping near-opaque TILE-COVERING splats. A quantum is
    droppable only when EVERY pixel of its tile has terminated, so the
    splats must span whole tiles (the dense-real-scene regime the
    truncation targets); small splats leave corner pixels live forever."""
    means, scales, quats, opac, shs = random_scene(n, seed, sh_degree=1)
    means = np.asarray(means) * np.array([0.3, 0.3, 1.0])  # pile up
    scales = np.asarray(scales) * 8.0                      # radius >> tile
    opac = np.full_like(np.asarray(opac), 6.0)             # sigmoid -> ~1
    cam = make_test_camera(width=48, height=32)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    return (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs)), cam, bg


@pytest.mark.parametrize("bwd_entries", [
    pytest.param(None, marks=pytest.mark.slow), 1 << 11, 512])
def test_bwd_truncation_matches_full(bwd_entries):
    """Termination-truncated backward == full backward, bit-for-bit.

    Dropped quanta have live=False on every lane (zero dentries, no carry
    influence), so compaction must not change any gradient. The 512-slot
    case is far below the survivor count and must fall back in-jit to the
    full stream (lax.cond) — also exactly equal."""
    params, cam, bg = _saturated_scene()
    target = jnp.full((3, 32, 48), 0.4)

    def grads(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return (photometric_loss(out["render"], target)
                    + 0.1 * jnp.mean(out["final_transmittance"]))
        return jax.grad(loss)(params)

    base = PL_CFG_SEG4._replace(max_entries=1 << 12)
    g_full = grads(base._replace(bwd_entries=0))
    g_trunc = grads(base._replace(bwd_entries=bwd_entries))
    for a, b in zip(jax.tree.leaves(g_trunc), jax.tree.leaves(g_full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bwd_truncation_drops_quanta():
    """The saturated scene must actually produce droppable quanta (guards
    the test above against vacuous truncation)."""
    from h3dgs_tpu.ops.binning import bin_gaussians_aligned
    from h3dgs_tpu.ops.pallas_blend import (O_DEAD, PallasBlendConfig,
                                            pack_entries, pallas_blend_fwd)
    from h3dgs_tpu.ops.projection import project_gaussians

    params, cam, bg = _saturated_scene()
    proj = project_gaussians(*params, cam, 1, 1.0)
    bins = bin_gaussians_aligned(proj, cam.height, cam.width, 1 << 12,
                                 256, 128)
    packed = pack_entries(proj.means2d, proj.conic, proj.rgb, proj.opacity,
                          1.0 / jnp.maximum(proj.depth, 1e-6),
                          bins.gauss_idx, bins.perm)
    tiles_x = -(-cam.width // 16)
    chunk_out = pallas_blend_fwd(
        packed, bins.owner, tiles_x=tiles_x, tile=16,
        cfg=PallasBlendConfig(chunk_e=512, quantum=128, interpret=True,
                              bwd_entries=512))
    q_dead = np.asarray(jnp.min(chunk_out[:, O_DEAD, :], axis=1))
    owner = np.asarray(bins.owner)
    same_prev = np.concatenate([[False], owner[1:] == owner[:-1]])
    dead_prev = np.concatenate([[0.0], q_dead[:-1]]) > 0.5
    keep = (owner >= 0) & ~(same_prev & dead_prev)
    n_valid = int((owner >= 0).sum())
    assert int(keep.sum()) < n_valid, (
        f"no terminated quanta dropped ({keep.sum()} of {n_valid})")


def test_bwd_survivor_probe():
    """n_bwd_quanta reports the backward-truncation survivor count: it
    matches the manual keep computation, is -1 when tracking is off, and
    a probe-sized bwd_entries keeps gradients bit-equal to the full
    backward (the sizing contract bench.py relies on)."""
    params, cam, bg = _saturated_scene()
    base = PL_CFG_SEG4._replace(max_entries=1 << 12)

    out_off = R.rasterize(*params, cam, 1, bg,
                          config=base._replace(bwd_entries=0))
    assert int(out_off["n_bwd_quanta"]) == -1

    out = R.rasterize(*params, cam, 1, bg,
                      config=base._replace(bwd_entries=1 << 12))
    n_bwd = int(out["n_bwd_quanta"])
    n_quanta = base.max_entries // base.quantum
    assert 0 < n_bwd < n_quanta

    # Manual recomputation via the forward's deadness outputs.
    from h3dgs_tpu.ops.binning import bin_gaussians_aligned
    from h3dgs_tpu.ops.pallas_blend import (O_DEAD, PallasBlendConfig,
                                            bwd_keep_mask, pack_entries,
                                            pallas_blend_fwd)
    from h3dgs_tpu.ops.projection import project_gaussians
    proj = project_gaussians(*params, cam, 1, 1.0)
    bins = bin_gaussians_aligned(proj, cam.height, cam.width,
                                 base.max_entries, base.max_per_tile, 128)
    packed = pack_entries(proj.means2d, proj.conic, proj.rgb, proj.opacity,
                          1.0 / jnp.maximum(proj.depth, 1e-6),
                          bins.gauss_idx, bins.perm)
    tiles_x = -(-cam.width // 16)
    chunk_out = pallas_blend_fwd(
        packed, bins.owner, tiles_x=tiles_x, tile=16,
        cfg=PallasBlendConfig(chunk_e=512, quantum=128, interpret=True,
                              bwd_entries=512))
    q_dead = jnp.min(chunk_out[:, O_DEAD, :], axis=1)
    _, n_manual = bwd_keep_mask(bins.owner, q_dead)
    assert n_bwd == int(n_manual)

    # Probe-sized truncation budget: engaged AND lossless.
    sized = -(-(n_bwd * 128) // base.chunk_e) * base.chunk_e
    target = jnp.full((3, 32, 48), 0.4)

    def grads(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return photometric_loss(out["render"], target)
        return jax.grad(loss)(params)

    g_full = grads(base._replace(bwd_entries=0))
    g_sized = grads(base._replace(bwd_entries=sized))
    for a, b in zip(jax.tree.leaves(g_sized), jax.tree.leaves(g_full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_invalid_shape_configs_rejected():
    params, cam, bg = _scene(n=20, seed=5)
    with pytest.raises(ValueError, match="multiple of"):
        R.rasterize(*params, cam, 1, bg, config=PL_CFG._replace(
            max_entries=(1 << 10) + 128, chunk_e=256, quantum=128))
    with pytest.raises(ValueError, match="multiple of"):
        R.rasterize(*params, cam, 1, bg, config=PL_CFG._replace(
            max_entries=1 << 10, chunk_e=256, quantum=96))


@pytest.mark.parametrize("scene_fn", [
    "normal", pytest.param("saturated", marks=pytest.mark.slow)])
def test_roll_prefix_matches_mxu(scene_fn):
    """prefix_mode='roll' (segmented Hillis-Steele cumprod) must agree
    with the MXU log-prefix path on values AND gradients — same math,
    different factorization (roll avoids the log/exp round trip, so only
    f32 noise differs)."""
    if scene_fn == "normal":
        params, cam, bg = _scene(n=80, seed=9)
        base = PL_CFG_SEG._replace(max_entries=1 << 12)
    else:
        params, cam, bg = _saturated_scene(n=150, seed=11)
        base = PL_CFG_SEG4._replace(max_entries=1 << 12)
    target = jnp.full((3, cam.height, cam.width), 0.4)

    def run(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return (photometric_loss(out["render"], target)
                    + 0.1 * jnp.mean(out["final_transmittance"]))
        out = R.rasterize(*params, cam, 1, bg, config=cfg)
        return out["render"], jax.grad(loss)(params)

    img_m, g_m = run(base._replace(prefix_mode="mxu"))
    img_r, g_r = run(base._replace(prefix_mode="roll"))
    np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_m),
                               atol=2e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


def test_seg_cumprod_and_shift_against_numpy():
    """Unit-level check of the roll-mode segmented scan helpers on random
    segment layouts (the end-to-end tests only see layouts binning
    produces)."""
    from h3dgs_tpu.ops.pallas_blend import (_seg_cumprod, _seg_shift_fill1,
                                            _segments)

    rng = np.random.default_rng(0)
    q, s = 8, 4
    e_width = q * s
    for trial in range(6):
        # Random owner runs incl. repeats and -1 padding at the tail.
        owners = []
        cur = int(rng.integers(0, 3))
        for i in range(s):
            if rng.random() < 0.5 and owners:
                owners.append(owners[-1])
            else:
                cur += int(rng.integers(1, 3))
                owners.append(cur)
        owners = [jnp.int32(o) for o in owners]
        seg = _segments(owners, e_width, q, jnp.float32)
        x = jnp.asarray(rng.uniform(0.2, 1.0, (3, e_width)), jnp.float32)

        incl = np.asarray(_seg_cumprod(x, seg))
        excl = np.asarray(_seg_shift_fill1(jnp.asarray(incl), seg))

        bids = np.asarray([int(b) for b in seg.bids])
        ref_incl = np.empty((3, e_width), np.float32)
        ref_excl = np.empty((3, e_width), np.float32)
        xn = np.asarray(x)
        for lane in range(e_width):
            b = bids[lane // q]
            start = min(i * q for i in range(s) if bids[i] == b)
            ref_excl[:, lane] = np.prod(xn[:, start:lane], axis=1)
            ref_incl[:, lane] = ref_excl[:, lane] * xn[:, lane]
        np.testing.assert_allclose(incl, ref_incl, rtol=2e-6,
                                   err_msg=f"trial {trial} incl")
        np.testing.assert_allclose(excl, ref_excl, rtol=2e-6,
                                   err_msg=f"trial {trial} excl")


@pytest.mark.parametrize("bwd_e,bwd_entries", [
    (128, 1 << 11),   # truncation path
    (256, 1 << 11),
    (128, 0),         # plain full-stream backward
])
def test_asymmetric_bwd_chunk_matches(bwd_e, bwd_entries):
    """A narrower backward grid step re-chunks the same quantum-aligned
    stream: per-quantum prefixes and carry order are unchanged, but the
    per-chunk batched matmuls regroup their f32 accumulation, so gradients
    match to accumulation-order noise (~1e-9 abs observed), not bitwise."""
    params, cam, bg = _saturated_scene(n=200, seed=13)
    target = jnp.full((3, 32, 48), 0.4)

    def grads(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return (photometric_loss(out["render"], target)
                    + 0.1 * jnp.mean(out["final_transmittance"]))
        return jax.grad(loss)(params)

    base = PL_CFG_SEG4._replace(max_entries=1 << 12, bwd_entries=bwd_entries)
    g_sym = grads(base)
    g_asym = grads(base._replace(bwd_chunk_e=bwd_e))
    for a, b in zip(jax.tree.leaves(g_asym), jax.tree.leaves(g_sym)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=1e-8)


def test_kslot_scatter_matches_plain():
    """K-slot gradient scatter (SOL round-3 candidate B) must equal the
    plain scatter-add up to f32 accumulation-order noise (per-slot
    partial sums reduce in a different order)."""
    params, cam, bg = _saturated_scene(n=200, seed=21)
    target = jnp.full((3, 32, 48), 0.4)

    def grads(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return photometric_loss(out["render"], target)
        return jax.grad(loss)(params)

    base = PL_CFG_SEG4._replace(max_entries=1 << 12)
    g_ref = grads(base)
    g_k = grads(base._replace(scatter_k=8))
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=1e-7)


@pytest.mark.parametrize("scene_fn,seed", [("_scene", 4),
                                           ("_saturated_scene", 23)])
def test_fwd_accumulate_matches_segment_sum(scene_fn, seed):
    """In-kernel tile accumulation (combine = one [T]-row gather) must
    match the segment-sum combine up to f32 summation order, forward AND
    gradients. The saturated scene exercises the skip path writing the
    carried accumulator (a saturated tile's final quantum can live in a
    skipped chunk)."""
    maker = globals()[scene_fn]
    params, cam, bg = (maker(n=200, seed=seed) if "sat" in scene_fn
                       else maker(seed=seed))
    target = jnp.full((3, 32, 48), 0.4)
    base = PL_CFG_SEG4._replace(max_entries=1 << 12,
                                bwd_entries=1 << 11)

    def run(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return photometric_loss(out["render"], target), out
        (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        return out, g

    out_a, g_a = run(base)
    out_b, g_b = run(base._replace(fwd_accumulate=True))
    np.testing.assert_allclose(np.asarray(out_b["render"]),
                               np.asarray(out_a["render"]),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b["final_transmittance"]),
                               np.asarray(out_a["final_transmittance"]),
                               atol=0, rtol=0)
    assert int(out_b["n_bwd_quanta"]) == int(out_a["n_bwd_quanta"])
    for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_a)):
        b = np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale, b / scale,
                                   atol=2e-5)


def test_segsum_scatter_matches_add():
    """Segsum gradient reduction (plain scatter to unique gen-stream
    slots + cumsum + per-Gaussian boundary diffs) must equal the
    scatter-add path up to f32 summation-order noise. Saturated scene:
    exercises per-tile caps / dropped entries, whose gen slots must stay
    exactly zero."""
    params, cam, bg = _saturated_scene(n=200, seed=22)
    target = jnp.full((3, 32, 48), 0.4)

    def grads(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return photometric_loss(out["render"], target)
        return jax.grad(loss)(params)

    base = PL_CFG_SEG4._replace(max_entries=1 << 12)
    g_ref = grads(base)
    g_s = grads(base._replace(scatter_mode="segsum"))
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_ref)):
        b = np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale, b / scale,
                                   atol=2e-5)


def test_segsum_split_budget_matches_add():
    """Segsum with a split generation budget (gen_entries < max_entries):
    gen positions index the GENERATION stream, whose size is the gen
    budget, not the aligned one."""
    params, cam, bg = _scene(seed=5)
    target = jnp.full((3, 32, 48), 0.4)

    def grads(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return photometric_loss(out["render"], target)
        return jax.grad(loss)(params)

    base = PL_CFG_SEG._replace(max_entries=1 << 12, gen_entries=1 << 11)
    g_ref = grads(base)
    g_s = grads(base._replace(scatter_mode="segsum"))
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_ref)):
        b = np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale, b / scale,
                                   atol=2e-5)


@pytest.mark.parametrize("quantum", [128, 64, 32])
def test_batched_tafter_bit_exact(quantum):
    """The batched post-quantum transmittance must be BIT-identical to
    the per-quantum loop (min is exact, +inf is its identity, and the
    selected lane sets decompose into whole quanta). Sub-128 quanta
    exercise the masked [P,128]-block reduce formulation."""
    params, cam, bg = _saturated_scene(n=250, seed=31)
    target = jnp.full((3, 32, 48), 0.4)
    base = PL_CFG_SEG4._replace(max_entries=1 << 12, bwd_entries=1 << 11,
                                quantum=quantum)

    def run(cfg):
        out = R.rasterize(*params, cam, 1, bg, config=cfg)
        def loss(p):
            o = R.rasterize(*p, cam, 1, bg, config=cfg)
            return (photometric_loss(o["render"], target)
                    + 0.1 * jnp.mean(o["final_transmittance"]))
        return out, jax.grad(loss)(params)

    out_l, g_l = run(base)
    out_b, g_b = run(base._replace(tafter_mode="batched"))
    for k in ("render", "invdepth", "final_transmittance"):
        np.testing.assert_array_equal(np.asarray(out_b[k]),
                                      np.asarray(out_l[k]), err_msg=k)
    for a, b in zip(jax.tree.leaves(g_b), jax.tree.leaves(g_l)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("bwd_entries", [0, 512])
def test_rows_layout_matches_cols(bwd_entries):
    """rows_layout=True ([D,16] streams + in-kernel transposes) must be
    BIT-identical to the [16,D] layout on values and gradients — it is a
    pure data-layout change."""
    params, cam, bg = _scene(n=80, seed=21)
    target = jnp.full((3, cam.height, cam.width), 0.4)
    base = PL_CFG_SEG._replace(max_entries=1 << 12,
                               bwd_entries=bwd_entries)

    def run(cfg):
        def loss(p):
            out = R.rasterize(*p, cam, 1, bg, config=cfg)
            return (photometric_loss(out["render"], target)
                    + 0.1 * jnp.mean(out["final_transmittance"]))
        out = R.rasterize(*params, cam, 1, bg, config=cfg)
        return out["render"], jax.grad(loss)(params)

    img_c, g_c = run(base)
    img_r, g_r = run(base._replace(rows_layout=True))
    np.testing.assert_array_equal(np.asarray(img_c), np.asarray(img_r))
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
