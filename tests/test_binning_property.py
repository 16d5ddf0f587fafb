"""Property test: the aligned entry stream == a brute-force numpy binning.

Replicates the binning rules (getRect bounding square, lossless tile-max
alpha cull, depth-bits ordering, per-tile cap, quantum alignment) in
plain numpy and requires the production stream to match exactly for
random scenes. Guards the sort/relayout/cull pipeline against
refactoring drift.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from h3dgs_tpu.ops import binning
from h3dgs_tpu.ops.projection import project_gaussians

from .utils import make_test_camera, random_scene


def _brute_force(proj, height, width, max_per_tile, quantum, tile):
    tiles_y, tiles_x = binning.num_tiles(height, width, tile)
    x = np.asarray(proj.means2d[:, 0], np.float64)
    y = np.asarray(proj.means2d[:, 1], np.float64)
    r = np.asarray(proj.radius, np.float64)
    depth = np.asarray(proj.depth, np.float32)
    valid = np.asarray(proj.valid)
    conic = np.asarray(proj.conic, np.float64)
    opac = np.asarray(proj.opacity, np.float64)

    lam_min = np.maximum(
        0.5 * (conic[:, 0] + conic[:, 2])
        - np.sqrt(0.25 * (conic[:, 0] - conic[:, 2]) ** 2
                  + conic[:, 1] ** 2), 1e-12)
    t_cmp = 2.0 * np.log(np.maximum(255.0 * opac, 1e-12)) / lam_min

    # Tight per-axis rect, replicated in f32 to match production exactly.
    ca = np.asarray(proj.conic[:, 0], np.float32)
    cb = np.asarray(proj.conic[:, 1], np.float32)
    cc = np.asarray(proj.conic[:, 2], np.float32)
    det_c = np.maximum(ca * cc - cb * cb, np.float32(1e-24))
    big_l = np.log(np.maximum(np.float32(255.0)
                              * np.asarray(proj.opacity, np.float32),
                              np.float32(1.0 + 1e-6)))
    ext_x = np.minimum(np.sqrt(2.0 * big_l * cc / det_c).astype(np.float32)
                       + np.float32(1e-3), r.astype(np.float32))
    ext_y = np.minimum(np.sqrt(2.0 * big_l * ca / det_c).astype(np.float32)
                       + np.float32(1e-3), r.astype(np.float32))
    xf = np.asarray(proj.means2d[:, 0], np.float32)
    yf = np.asarray(proj.means2d[:, 1], np.float32)

    per_tile = {t: [] for t in range(tiles_y * tiles_x)}
    order = np.argsort(
        np.maximum(depth, 0.0).view(np.int32), kind="stable")
    for g in order:
        if not (valid[g] and r[g] > 0):
            continue
        x0t = int(np.clip(np.floor(np.float32(xf[g] - ext_x[g]) / tile),
                          0, tiles_x))
        y0t = int(np.clip(np.floor(np.float32(yf[g] - ext_y[g]) / tile),
                          0, tiles_y))
        x1t = int(np.clip(np.floor(np.float32(xf[g] + ext_x[g]) / tile) + 1,
                          0, tiles_x))
        y1t = int(np.clip(np.floor(np.float32(yf[g] + ext_y[g]) / tile) + 1,
                          0, tiles_y))
        for ty in range(y0t, y1t):
            for tx in range(x0t, x1t):
                bx0, by0 = tx * tile, ty * tile
                dxe = max(bx0 - x[g], x[g] - (bx0 + tile - 1), 0.0)
                dye = max(by0 - y[g], y[g] - (by0 + tile - 1), 0.0)
                if np.float32(dxe * dxe + dye * dye) > np.float32(t_cmp[g]):
                    continue
                per_tile[ty * tiles_x + tx].append(g)
    for t in per_tile:
        per_tile[t] = per_tile[t][:max_per_tile]
    return per_tile


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_aligned_stream_matches_bruteforce(seed):
    means, scales, quats, opac, shs = random_scene(80, seed, sh_degree=1)
    cam = make_test_camera(width=64, height=48)
    proj = project_gaussians(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), jnp.asarray(opac),
                             jnp.asarray(shs), cam, 1, 1.0)
    quantum, max_per_tile, d = 128, 64, 1 << 12
    bins = binning.bin_gaussians_aligned(proj, cam.height, cam.width, d,
                                         max_per_tile, quantum)
    expect = _brute_force(proj, cam.height, cam.width, max_per_tile,
                          quantum, binning.TILE)

    gauss = np.asarray(bins.gauss_idx)
    if bins.perm is not None:
        # Rank-key mode: entries carry depth ranks; map back to ids
        # (padding -1 stays -1).
        perm = np.asarray(bins.perm)
        gauss = np.where(gauss >= 0, perm[np.maximum(gauss, 0)], -1)
    start = np.asarray(bins.tile_start)
    count = np.asarray(bins.tile_count)
    assert int(np.asarray(bins.aligned_entries)) <= d, "scene too big"
    for t, exp in expect.items():
        got = gauss[start[t]:start[t] + count[t]].tolist()
        # Per-tile SETS must match; order must agree wherever depths are
        # distinct (ties may legally reorder between sort implementations).
        assert sorted(got) == sorted(exp), f"tile {t} membership"
        dep = np.asarray(proj.depth)
        if len(set(np.float32(dep[exp]).tolist())) == len(exp):
            assert got == exp, f"tile {t} depth order"
        # padding after the run is -1 up to the quantum boundary
        pad_end = start[t] + -(-count[t] // quantum) * quantum
        assert np.all(gauss[start[t] + count[t]:pad_end] == -1)


def test_entry_budget_probe_is_exact():
    """entry_budget_for_scene's two-probe aligned-need measurement must
    equal the need reported by a binning run whose buffer is plainly
    large enough, and the returned bucket must cover it with the
    trainer's headroom (an undersized budget silently drops tiles)."""
    from h3dgs_tpu.train.loop import _entry_bucket, entry_budget_for_scene

    means, scales, quats, opac, shs = random_scene(300, seed=11,
                                                   sh_degree=1)
    cam = make_test_camera(width=96, height=64)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))

    budget = entry_budget_for_scene(*args, cam, 1, floor=2048)
    bucket = entry_budget_for_scene(*args, cam, 1, floor=2048,
                                    exact=False)

    proj = project_gaussians(*args, cam, 1)
    big = binning.bin_gaussians_aligned(proj, 64, 96,
                                        max_entries=1 << 16,
                                        max_per_tile=4096, chunk_e=128)
    need = max(int(big.total_entries), int(big.aligned_entries))
    assert need < (1 << 16), "test scene must fit the oracle buffer"
    # exact mode: the measured need rounded up to a 2048 multiple — no
    # ladder headroom (static scenes allocate exactly, like the CUDA
    # reference).
    assert budget == max(-(-need // 2048) * 2048, 2048)
    # ladder mode: the trainer's bucket, always covering the need.
    want = -(-_entry_bucket(need, 2048, 1 << 23) // 1024) * 1024
    assert bucket == want
    assert bucket >= need or bucket == 1 << 23


@pytest.mark.parametrize("seed,d", [(0, 1 << 12), (3, 1 << 12),
                                    (5, 1 << 9)])  # 1<<9 forces overflow
def test_cumsum_fill_matches_gather(seed, d):
    """The delta-cumsum per-entry table (SOL round-3 candidate C) must be
    BIT-identical to the [D,8] gather in every AlignedBins field — the
    telescoping fill is exact in mod-2^32 arithmetic, including bitcast
    f32 columns, run drops at the budget edge, and tail padding."""
    means, scales, quats, opac, shs = random_scene(120, seed, sh_degree=1)
    cam = make_test_camera(width=64, height=48)
    proj = project_gaussians(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), jnp.asarray(opac),
                             jnp.asarray(shs), cam, 1, 1.0)
    a = binning.bin_gaussians_aligned(proj, cam.height, cam.width, d,
                                      64, 128, fill="gather")
    for fill in ("cumsum", "cumsum_t"):
        b = binning.bin_gaussians_aligned(proj, cam.height, cam.width, d,
                                          64, 128, fill=fill)
        for name in a._fields:
            np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                          np.asarray(getattr(b, name)),
                                          err_msg=f"{fill}/{name}")


@pytest.mark.parametrize("seed", [0, 5])
def test_split_gen_budget_matches_unsplit(seed):
    """gen_entries (split generation budget) must be invisible when it
    holds all raw duplicates: every AlignedBins field identical to the
    single-buffer run, for both fill modes."""
    means, scales, quats, opac, shs = random_scene(120, seed, sh_degree=1)
    cam = make_test_camera(width=64, height=48)
    proj = project_gaussians(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), jnp.asarray(opac),
                             jnp.asarray(shs), cam, 1, 1.0)
    d = 1 << 12
    for fill in ("gather", "cumsum", "cumsum_t"):
        a = binning.bin_gaussians_aligned(proj, cam.height, cam.width, d,
                                          64, 128, fill=fill)
        total = int(a.total_entries)
        assert total < d, "scene must fit"
        # Tight gen buffer (>= total, < d) and an undersized one.
        b = binning.bin_gaussians_aligned(proj, cam.height, cam.width, d,
                                          64, 128, fill=fill,
                                          gen_entries=total + 7)
        for name in a._fields:
            va, vb = getattr(a, name), getattr(b, name)
            if va is None:
                assert vb is None
            else:
                np.testing.assert_array_equal(np.asarray(va),
                                              np.asarray(vb),
                                              err_msg=f"{fill}/{name}")
        # Undersized gen drops trailing entries but must stay in-bounds
        # and keep quantum alignment of what survives.
        c = binning.bin_gaussians_aligned(proj, cam.height, cam.width, d,
                                          64, 128, fill=fill,
                                          gen_entries=max(total // 2, 128))
        g = np.asarray(c.gauss_idx)
        assert g.shape[0] == d
        assert int(c.total_entries) == total  # raw count still exact


def test_cumsum_fill_degenerate_cases():
    """Unit edges of the delta fill: no active runs (all-zero output —
    the sentinel garbage row must never leak), a single active run at
    position 0, and runs dropped at the budget edge."""
    rng = np.random.default_rng(4)
    gtab = jnp.asarray(rng.integers(-(1 << 30), 1 << 30,
                                    size=(6, 8)).astype(np.int32))
    d = 64

    # No active runs.
    counts = jnp.zeros(6, jnp.int32)
    starts = jnp.full(6, d, jnp.int32)
    out = binning._delta_cumsum_rows(gtab, counts, starts, d)
    np.testing.assert_array_equal(np.asarray(out), 0)

    # One active run covering the head; one dropped at the budget edge.
    counts = jnp.asarray([0, 3, 0, 0, 2, 0], jnp.int32)
    starts = jnp.asarray([d, 0, d, d, d, d], jnp.int32)  # run 4 dropped
    out = np.asarray(binning._delta_cumsum_rows(gtab, counts, starts, d))
    np.testing.assert_array_equal(out, np.broadcast_to(
        np.asarray(gtab)[1], (d, 8)))


@pytest.mark.parametrize("seed", [0, 3])
def test_rank_sort_matches_2key(seed):
    """The rank-key keyless sort must produce the same per-tile streams
    as the (tile, depth-bits) 2-key sort — identical membership AND
    order (ranks are unique, and random f32 depths have no exact ties
    here), with gauss_idx mapped back through perm."""
    means, scales, quats, opac, shs = random_scene(150, seed, sh_degree=1)
    cam = make_test_camera(width=64, height=48)
    proj = project_gaussians(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), jnp.asarray(opac),
                             jnp.asarray(shs), cam, 1, 1.0)
    d = 1 << 12
    a = binning.bin_gaussians_aligned(proj, cam.height, cam.width, d,
                                      64, 128, sort_mode="rank")
    b = binning.bin_gaussians_aligned(proj, cam.height, cam.width, d,
                                      64, 128, sort_mode="2key")
    assert a.perm is not None and b.perm is None
    ga = np.asarray(a.gauss_idx)
    ga = np.where(ga >= 0, np.asarray(a.perm)[np.maximum(ga, 0)], -1)
    np.testing.assert_array_equal(ga, np.asarray(b.gauss_idx))
    for name in ("owner", "tile_start", "tile_count", "total_entries",
                 "aligned_entries", "n_truncated"):
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)),
                                      err_msg=name)


def test_bwd_budget_decision_state_machine():
    """Adaptive bwd window decisions: engage/disengage hysteresis,
    immediate grow on fallback pressure, 6-window shrink."""
    from h3dgs_tpu.ops.rasterize import RasterizeConfig
    from h3dgs_tpu.train.loop import _bwd_budget_decision

    cfg = RasterizeConfig(max_entries=1 << 21, chunk_e=512, quantum=128,
                          bwd_entries=1 << 21)  # tracking-only
    # Few survivors -> engage with headroom, multiple of chunk_e.
    want, votes = _bwd_budget_decision(4000, cfg, 0)
    assert want is not None and want < cfg.max_entries
    assert want % 512 == 0 and want >= int(4000 * 128 * 1.2)
    engaged = cfg._replace(bwd_entries=want)

    # Survivors near the full budget -> disengage back to tracking-only.
    w2, _ = _bwd_budget_decision((1 << 21) // 128 - 100, engaged, 0)
    assert w2 == cfg.max_entries

    # Survivors above the engaged budget -> grow immediately.
    w3, _ = _bwd_budget_decision(want // 128 + 512, engaged, 0)
    assert w3 is not None and w3 > engaged.bwd_entries

    # Smaller survivors: shrink only after 6 consecutive votes.
    votes = 0
    for i in range(5):
        w4, votes = _bwd_budget_decision(1000, engaged, votes)
        assert w4 is None
    w4, votes = _bwd_budget_decision(1000, engaged, votes)
    assert w4 is not None and w4 < engaged.bwd_entries and votes == 0

    # Tracking-only with survivors in the dead band: no action.
    mid = int(0.75 * (1 << 21)) // 128
    w5, _ = _bwd_budget_decision(mid, cfg, 3)
    assert w5 is None


def _trunc_scene(n=400, seed=3, w=128, h=96):
    means, scales, quats, opac, shs = random_scene(n, seed=seed,
                                                   sh_degree=1)
    cam = make_test_camera(width=w, height=h)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs))
    return args, cam


@pytest.mark.parametrize("sort_mode", ["rank", "2key"])
def test_flimit_counts_match_oracle(sort_mode):
    """Quality-gated per-tile depth truncation (trunc_theta): the cut
    depth must equal a sequential numpy walk of the same proxy rule on
    every tile, in both sort modes."""
    theta, c = 0.01, 1.0
    args, cam = _trunc_scene()
    proj = project_gaussians(*args, cam, 1)
    b0 = binning.bin_gaussians_aligned(proj, 96, 128, 1 << 14, 1024, 128,
                                       sort_mode=sort_mode)
    bt = binning.bin_gaussians_aligned(proj, 96, 128, 1 << 14, 1024, 128,
                                       sort_mode=sort_mode,
                                       trunc_theta=theta, trunc_c=c)
    p = np.asarray(proj.means2d)
    con = np.asarray(proj.conic)
    op = np.asarray(proj.opacity)
    lam = np.maximum(0.5 * (con[:, 0] + con[:, 2])
                     - np.sqrt(0.25 * (con[:, 0] - con[:, 2]) ** 2
                               + con[:, 1] ** 2), 1e-12)
    det = np.maximum(con[:, 0] * con[:, 2] - con[:, 1] ** 2, 1e-24)
    a_mass = 2.0 * np.pi * op / (np.sqrt(det) * 256.0)
    perm = (np.asarray(bt.perm) if bt.perm is not None
            else np.arange(p.shape[0]))
    start0 = np.asarray(b0.tile_start)
    cnt0 = np.asarray(b0.tile_count)
    got = np.asarray(bt.tile_count)
    gidx0 = np.asarray(b0.gauss_idx)
    tiles_x = 128 // 16
    checked = 0
    for t in range(cnt0.shape[0]):
        if cnt0[t] == 0:
            assert got[t] == 0
            continue
        orig = perm[gidx0[start0[t]:start0[t] + cnt0[t]]]
        x0, y0 = (t % tiles_x) * 16, (t // tiles_x) * 16
        big_t, k = 1.0, 0
        for gi in orig:
            dxe = max(x0 - p[gi, 0], p[gi, 0] - (x0 + 15), 0.0)
            dye = max(y0 - p[gi, 1], p[gi, 1] - (y0 + 15), 0.0)
            aub = min(op[gi], 0.99) * np.exp(
                -0.5 * lam[gi] * (dxe * dxe + dye * dye))
            big_t *= 1.0 - min(c * min(aub, a_mass[gi]), 0.999)
            k += 1
            if big_t < theta:
                break
        # f32 cumsum rounding can move the global threshold crossing by
        # O(1) entries (documented in _flimit_counts).
        assert abs(int(got[t]) - k) <= 1, f"tile {t}: {got[t]} vs {k}"
        checked += 1
    assert checked > 20
    assert int(bt.n_flimit) == int(np.sum(cnt0) - np.sum(got))


def test_flimit_monotone_and_prefix():
    """Smaller theta (or smaller c) keeps more entries; the kept set per
    tile is exactly the depth-order PREFIX of the untruncated run (the
    aligned layout must not re-order or skip)."""
    args, cam = _trunc_scene()
    proj = project_gaussians(*args, cam, 1)
    b0 = binning.bin_gaussians_aligned(proj, 96, 128, 1 << 14, 1024, 128)
    prev = None
    for theta in (0.03, 0.01, 0.001):
        bt = binning.bin_gaussians_aligned(
            proj, 96, 128, 1 << 14, 1024, 128, trunc_theta=theta)
        cnt = np.asarray(bt.tile_count)
        if prev is not None:
            assert np.all(cnt >= prev), "smaller theta must keep more"
        prev = cnt
        # prefix property in the aligned stream
        s0 = np.asarray(b0.tile_start)
        st = np.asarray(bt.tile_start)
        g0 = np.asarray(b0.gauss_idx)
        gt = np.asarray(bt.gauss_idx)
        c0 = np.asarray(b0.tile_count)
        for t in range(0, cnt.shape[0], 7):
            k = cnt[t]
            assert k <= c0[t]
            np.testing.assert_array_equal(gt[st[t]:st[t] + k],
                                          g0[s0[t]:s0[t] + k])
    # c more conservative keeps more
    b_c = binning.bin_gaussians_aligned(proj, 96, 128, 1 << 14, 1024, 128,
                                        trunc_theta=0.01, trunc_c=0.3)
    b_1 = binning.bin_gaussians_aligned(proj, 96, 128, 1 << 14, 1024, 128,
                                        trunc_theta=0.01, trunc_c=1.0)
    assert np.all(np.asarray(b_c.tile_count)
                  >= np.asarray(b_1.tile_count))


def test_flimit_off_is_exact():
    """trunc_theta=0 must leave the binning bit-identical (same jaxpr
    path; n_flimit stays 0)."""
    args, cam = _trunc_scene(n=200, seed=5)
    proj = project_gaussians(*args, cam, 1)
    a = binning.bin_gaussians_aligned(proj, 96, 128, 1 << 13, 1024, 128)
    b = binning.bin_gaussians_aligned(proj, 96, 128, 1 << 13, 1024, 128,
                                      trunc_theta=0.0)
    np.testing.assert_array_equal(np.asarray(a.gauss_idx),
                                  np.asarray(b.gauss_idx))
    assert int(b.n_flimit) == 0
