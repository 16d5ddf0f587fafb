"""Tile binning: duplicate Gaussians per overlapped tile and depth-sort.

The CUDA rasterizer family allocates a dynamic duplication buffer and radix
sorts (tile | depth) keys. XLA needs static shapes, so we re-design:

  1. Each visible Gaussian covers a tile rectangle (same getRect rule as the
     CUDA preprocess). Per-Gaussian duplicate counts -> exclusive cumsum
     gives each Gaussian a contiguous run of entry slots in a fixed-size
     entry buffer of capacity ``max_entries`` (a static budget; overflow is
     counted and the tail dropped).
  2. Entry ownership is recovered with a scatter + cummax trick instead of a
     host-side loop: O(D) vector work, no data-dependent shapes.
  3. One lexicographic ``jax.lax.sort`` over (tile_id, depth) replaces the
     radix sort; per-tile ranges come from two searchsorted calls.

The output is a flat, depth-sorted, *contiguous-per-tile* entry list — the
same data layout the CUDA kernel consumes (point_list), which is exactly
what the Pallas blend kernel wants: per-tile work is a dynamic slice of a
contiguous buffer, ideal for sequential DMA.

Interface parity anchor: /root/reference/gaussian_renderer/__init__.py:44-113
(the rasterizer contract) — binning is internal to the CUDA extension there.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .projection import ProjectedGaussians

TILE = 16  # pixels per tile side (matches the CUDA BLOCK_X/BLOCK_Y choice)


def num_tiles(height: int, width: int, tile: int = TILE):
    ty = -(-height // tile)
    tx = -(-width // tile)
    return ty, tx


class BinnedGaussians(NamedTuple):
    """Depth-sorted per-entry data, contiguous per tile. All [D, ...]."""
    gauss_idx: jnp.ndarray    # [D] int32 source Gaussian per entry
    entry_valid: jnp.ndarray  # [D] bool
    tile_start: jnp.ndarray   # [T] int32 first entry of each tile
    tile_count: jnp.ndarray   # [T] int32 entries in each tile
    total_entries: jnp.ndarray  # [] int32 (pre-clamp; > D means overflow)


def _tight_rects(proj: ProjectedGaussians, tiles_y: int, tiles_x: int,
                 tile: int):
    """Tile rectangle per splat from the tight per-axis alpha bbox.

    Lossless refinement of the CUDA getRect bounding square: the blend
    skips alpha < 1/255, and {alpha >= 1/255} = {power >= -L} with
    L = ln(255*opac), whose axis-aligned bbox half-extents are
    sqrt(2*L*cov_xx) / sqrt(2*L*cov_yy) (cov2d = conic^-1, dilation
    included). Strictly inside the r = 3*sqrt(lambda_max) square for
    anisotropic or low-opacity splats, so candidate duplicate counts —
    which every budget-proportional XLA op downstream scales with —
    shrink at zero quality cost.

    Returns (rect_min_x, rect_min_y, span_x, span_y, counts).
    """
    x = proj.means2d[:, 0]
    y = proj.means2d[:, 1]
    r = proj.radius.astype(x.dtype)
    ca = proj.conic[:, 0]
    cb = proj.conic[:, 1]
    cc = proj.conic[:, 2]
    det_c = jnp.maximum(ca * cc - cb * cb, 1e-24)
    big_l = jnp.log(jnp.maximum(255.0 * proj.opacity, 1.0 + 1e-6))
    # cov_xx = cc/det_c, cov_yy = ca/det_c; 1e-3 px guards sqrt rounding.
    ext_x = jnp.minimum(jnp.sqrt(2.0 * big_l * cc / det_c) + 1e-3, r)
    ext_y = jnp.minimum(jnp.sqrt(2.0 * big_l * ca / det_c) + 1e-3, r)
    # Covered pixel columns are [x-ext, x+ext]; the max covered column
    # floor(x+ext) sits in tile floor((x+ext)/tile), so the exclusive tile
    # bound is floor(..)+1. (The CUDA "+tile-1" idiom is a ceil only for
    # INTEGER radii; with fractional extents it under-covers the last tile.)
    rect_min_x = jnp.clip(jnp.floor((x - ext_x) / tile).astype(jnp.int32),
                          0, tiles_x)
    rect_min_y = jnp.clip(jnp.floor((y - ext_y) / tile).astype(jnp.int32),
                          0, tiles_y)
    rect_max_x = jnp.clip(jnp.floor((x + ext_x) / tile).astype(jnp.int32) + 1,
                          0, tiles_x)
    rect_max_y = jnp.clip(jnp.floor((y + ext_y) / tile).astype(jnp.int32) + 1,
                          0, tiles_y)
    span_x = jnp.maximum(rect_max_x - rect_min_x, 0)
    span_y = jnp.maximum(rect_max_y - rect_min_y, 0)
    counts = jnp.where(proj.valid & (proj.radius > 0), span_x * span_y, 0)
    return rect_min_x, rect_min_y, span_x, span_y, counts


def bin_gaussians(proj: ProjectedGaussians, height: int, width: int,
                  max_entries: int, tile: int = TILE) -> BinnedGaussians:
    tiles_y, tiles_x = num_tiles(height, width, tile)
    n_tiles = tiles_y * tiles_x
    n = proj.means2d.shape[0]
    d = max_entries

    rect_min_x, rect_min_y, span_x, span_y, counts = _tight_rects(
        proj, tiles_y, tiles_x, tile)

    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # Recover per-entry Gaussian ownership: scatter (gauss_idx + 1) at each
    # run start, then cummax fills the run. Runs are disjoint and offsets of
    # nonzero-count Gaussians are strictly increasing, so max == last writer.
    starts = jnp.where((counts > 0) & (offsets < d), offsets, d)  # d = dropped
    marker = jnp.zeros((d + 1,), jnp.int32).at[starts].max(
        jnp.arange(n, dtype=jnp.int32) + 1)
    owner = jax.lax.cummax(marker[:d])  # [D] 1-based; 0 => empty slot
    entry_valid = (owner > 0) & (jnp.arange(d) < jnp.minimum(total, d))
    gauss = jnp.maximum(owner - 1, 0)

    # Tile of each duplicate: row-major within the Gaussian's rectangle.
    j = jnp.arange(d, dtype=jnp.int32) - offsets[gauss]
    g_span_x = jnp.maximum(span_x[gauss], 1)
    tx = rect_min_x[gauss] + j % g_span_x
    ty = rect_min_y[gauss] + j // g_span_x
    tile_id = jnp.where(entry_valid, ty * tiles_x + tx, n_tiles)  # sentinel

    depth = jnp.where(entry_valid, proj.depth[gauss], jnp.inf)
    sorted_tile, _, sorted_gauss, sorted_valid = jax.lax.sort(
        (tile_id, depth, gauss, entry_valid.astype(jnp.int32)), num_keys=2)

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_range, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_range, side="right").astype(jnp.int32)

    return BinnedGaussians(
        gauss_idx=sorted_gauss.astype(jnp.int32),
        entry_valid=sorted_valid.astype(bool),
        tile_start=tile_start,
        tile_count=(tile_end - tile_start).astype(jnp.int32),
        total_entries=total.astype(jnp.int32),
    )


class AlignedBins(NamedTuple):
    """Chunk-aligned entry layout for the Pallas blend kernel.

    Every tile's entry run starts at a multiple of ``chunk_e`` and is padded
    to one (padding slots hold gauss_idx = -1); ``owner`` maps each chunk of
    ``chunk_e`` entries to its tile (-1 = unused chunk). This is what lets
    the kernel walk one flat entry stream with scalar-prefetched block
    indices — the TPU version of the CUDA per-tile ranges.
    """
    gauss_idx: jnp.ndarray   # [D] int32, -1 = padding slot
    owner: jnp.ndarray       # [D // chunk_e] int32 tile per chunk, -1 unused
    tile_start: jnp.ndarray  # [T] int32 (aligned)
    tile_count: jnp.ndarray  # [T] int32 (true, clamped to max_per_tile)
    total_entries: jnp.ndarray  # [] int32 pre-clamp duplicate count
    # [] int32: chunk-padded slot count the aligned layout *needs*. If this
    # exceeds the buffer, trailing tiles lose their chunks (their entries
    # are dropped) — budget pressure must be judged on
    # max(total_entries, aligned_entries), not total_entries alone.
    aligned_entries: jnp.ndarray
    # [] int32: entries silently cut by the max_per_tile clamp (sum over
    # tiles of count - max_per_tile). The CUDA reference never truncates a
    # tile; any nonzero value here is a quality cliff the training loop
    # must surface (VERDICT r1 weak-4).
    n_truncated: jnp.ndarray
    # [] int32: entries cut by the *intentional* quality-gated per-tile
    # depth truncation (trunc_theta > 0) — telemetry for budget probes
    # and the bench's PSNR gate, NOT an anomaly (unlike n_truncated).
    # (Plain-int default: a jnp scalar here would allocate on the default
    # device at import time, before backend selection.)
    n_flimit: int = 0
    # Rank-key mode (the fast path): ``gauss_idx`` is in DEPTH-RANK space.
    # ``perm`` maps rank -> original Gaussian id, ``rank`` is its inverse
    # (gaussian -> rank). Both None when the 2-key fallback ran and
    # gauss_idx holds original ids. Rationale: packing (tile << RB | rank)
    # into ONE i32 sort key turns the 2-key+payload D-sort (13.2 ms on
    # v5e at D=2M) into a keyless single-array sort (4.8 ms); depth order
    # per tile is preserved because rank IS depth order.
    perm: Optional[jnp.ndarray] = None
    rank: Optional[jnp.ndarray] = None
    # [N, 8] i32 generation-stream geometry (want_gen_tab=True):
    # col 0 = run start (exclusive cumsum of counts), 1/2 = rect_min_x/y,
    # 3 = span_x, 4 = raw duplicate count; cols 5-7 pad. Original
    # Gaussian order. Consumed by the segsum gradient reduction
    # (ops/pallas_blend.segsum_entry_grads): each entry's gen-stream
    # slot is unique, so gradients reduce with a plain scatter + cumsum
    # instead of a scatter-add.
    gen_tab: Optional[jnp.ndarray] = None


def align_segments(binned: BinnedGaussians, n_tiles: int, max_entries: int,
                   max_per_tile: int, chunk_e: int) -> AlignedBins:
    """Re-layout sorted entries into chunk-aligned per-tile segments."""
    return _aligned_from_sorted(
        binned.gauss_idx, binned.tile_start, binned.tile_count,
        binned.total_entries, n_tiles, max_per_tile, chunk_e)


def _aligned_from_sorted(gauss_idx, tile_start, tile_count, total, n_tiles,
                         max_per_tile, chunk_e, d_out: int = 0,
                         n_flimit=None) -> AlignedBins:
    """Aligned relayout as per-chunk contiguous slice gathers.

    The sorted->aligned map is piecewise-contiguous (each tile's run just
    shifts right by its accumulated padding), so every aligned slot's
    source is base[chunk] + offset — W consecutive outputs read W
    consecutive sorted entries. A W=8 shifted-copies table (table[i,j] =
    sorted[i+j], built with static slices) turns the whole relayout into
    ONE [D/8]-row gather of 32-byte rows. TPU gathers/slices are issue-
    rate bound per ROW (~3.6 ns for 32-64 B rows), so widening the row
    is an 8x cut: measured v5e at D=2M — per-chunk dynamic slices
    14.8 ms (Q=128) / 8.3 ms (Q=256), flat 4-byte-row gather 18 ms,
    2M-element scalar scatter ~22 ms, this formulation ~1.5 ms."""
    d_src = gauss_idx.shape[0]
    d = d_out or d_src
    count = jnp.minimum(tile_count, max_per_tile)                 # [T]
    n_trunc = jnp.sum(jnp.maximum(tile_count - max_per_tile, 0))
    aligned = -(-count // chunk_e) * chunk_e                      # [T]
    astart = jnp.cumsum(aligned) - aligned                        # [T]

    n_chunks = d // chunk_e
    chunk_pos = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_e
    owner = jnp.searchsorted(astart, chunk_pos,
                             side="right").astype(jnp.int32) - 1
    owner_c = jnp.clip(owner, 0, n_tiles - 1)

    # One [T,4] row table -> one [C,4] row gather for all per-tile lookups.
    ttab = jnp.stack([tile_start, count, astart,
                      astart + aligned], axis=1)                  # [T, 4]
    trows = ttab[owner_c]                                         # [C, 4]
    # A tile participates only if its WHOLE aligned run fits the buffer:
    # keeping the in-bounds prefix of a straddling tile would feed partial
    # splat color into the blend while the trans gather falls back to 1.0
    # (background), double-exposing those pixels. All-or-nothing keeps
    # overflow = clean background for exactly the tiles that overflowed.
    tile_fits = trows[:, 3] <= d
    used = (chunk_pos < trows[:, 3]) & tile_fits
    owner = jnp.where(used, owner_c, -1)

    chunk_rank = chunk_pos - trows[:, 2]                          # [C]
    base = jnp.clip(trows[:, 0] + chunk_rank, 0, d_src)           # [C]
    w = 8 if chunk_e % 8 == 0 else 1
    # table[i, j] = padded_sorted[i + j]: W static slices of one padded
    # copy — pure relayout-free reads.
    gpad = jnp.concatenate([gauss_idx,
                            jnp.full((w,), -1, gauss_idx.dtype)])
    table = jnp.stack([gpad[j:j + d_src] for j in range(w)], axis=1)
    # Output row r (covering aligned slots r*w .. r*w+w-1) lives in chunk
    # c = r*w // chunk_e and reads sorted entries starting at
    # base[c] + (r*w - c*chunk_e).
    r_idx = jnp.arange(d // w, dtype=jnp.int32)
    c_of_r = r_idx // (chunk_e // w)
    src_row = jnp.clip(base[c_of_r] + r_idx * w - c_of_r * chunk_e,
                       0, d_src - 1)
    rows = table[src_row].reshape(d)                              # [D]
    lane = jnp.arange(chunk_e, dtype=jnp.int32)
    ok = used[:, None] & ((chunk_rank[:, None] + lane[None, :])
                          < trows[:, 1:2])
    gauss = jnp.where(ok.reshape(d), rows, -1)
    return AlignedBins(
        gauss_idx=gauss, owner=owner,
        tile_start=astart.astype(jnp.int32),
        tile_count=count.astype(jnp.int32),
        total_entries=total,
        aligned_entries=(astart[-1] + aligned[-1]).astype(jnp.int32),
        n_truncated=n_trunc.astype(jnp.int32),
        n_flimit=(jnp.int32(0) if n_flimit is None
                  else n_flimit.astype(jnp.int32)))


def _delta_cumsum_rows(gtab, counts, starts, d: int, transposed=False):
    """Per-entry rows gtab[gauss] WITHOUT the [D,8] row gather.

    Entries form per-Gaussian runs, so every column is piecewise-constant
    along the stream: scatter per-column DELTAS (row minus the previous
    active Gaussian's row, N-sized work) at the run starts and cumsum —
    the telescoping sum is exact in mod-2^32 integer arithmetic, so the
    fill reproduces arbitrary i32/bitcast-f32 patterns bit-exactly.
    Replaces a D-row gather (issue-rate bound, ~3.6 ns/row) with one
    N-row scatter + one [D,8] cumsum (SOL.md round-3 candidate C).

    ``transposed``: return [8, D] instead of [D, 8] and run the cumsum
    along lanes of the transposed buffer — a [D, 8] array pads its minor
    dim to a 128-lane tile on TPU (15/16 of every vector op wasted), so
    the axis-0 cumsum and each downstream column read pay 16x traffic;
    [8, D] rows are natural full-lane [D] vectors."""
    n = gtab.shape[0]
    active = counts > 0
    rank = jnp.cumsum(active.astype(jnp.int32)) - 1               # [N]
    compact = jnp.zeros((n + 1, gtab.shape[1]), gtab.dtype).at[
        jnp.where(active, rank, n)].set(gtab, mode="drop")
    has_prev = active & (rank > 0)
    # Sentinel row n collects every inactive row's scatter (undefined
    # which) — never let it feed a real delta.
    prev = jnp.where(has_prev[:, None],
                     compact[jnp.where(has_prev, rank - 1, n)], 0)
    delta = jnp.where(active[:, None], gtab - prev, 0)
    buf = jnp.zeros((d, gtab.shape[1]), gtab.dtype).at[starts].add(
        delta, mode="drop")   # starts are unique among active; >= d drop
    if transposed:
        return jnp.cumsum(buf.T, axis=1)
    return jnp.cumsum(buf, axis=0)


def bin_gaussians_aligned(proj: ProjectedGaussians, height: int, width: int,
                          max_entries: int, max_per_tile: int, chunk_e: int,
                          tile: int = TILE,
                          fill: str = "gather",
                          sort_mode: str = "rank",
                          gen_entries: int = 0,
                          trunc_theta: float = 0.0,
                          trunc_c: float = 1.0,
                          want_gen_tab: bool = False) -> AlignedBins:
    """Fused binning for the Pallas blend: single-key sort + aligned layout.

    Faster than bin_gaussians + align_segments: one i32 sort key (rank-key
    packing, or (tile, depth-bits) 2-key fallback), a single payload, and
    per-tile boundaries straight from searchsorted over the sorted keys.

    ``gen_entries`` splits the budget: the generation-side stream (owner
    fill, per-entry table, sort) only has to hold the RAW duplicate count,
    while ``max_entries`` sizes the quantum-padded aligned output the
    blend kernel consumes — the padding is typically 1.2-1.5x the raw
    count, so a split-sized generation stream cuts every D-proportional
    op before the relayout by the same factor. 0 = use max_entries for
    both (single buffer).

    ``trunc_theta`` > 0 enables *quality-gated per-tile depth truncation*
    (VERDICT r3 item 1b — the TPU answer to CUDA's per-pixel early-out,
    applied at binning): along each tile's depth-sorted entry run, a
    proxy transmittance T_k = prod_{i<=k}(1 - trunc_c * alpha_ub_i)
    accumulates the per-entry tile-level alpha bound
    alpha_ub = opac * exp(-0.5 * lam_min(conic) * d_e^2) (the same bound
    the lossless cull uses, but summed instead of thresholded); the run
    is cut after the entry where T_k first drops below trunc_theta.
    Entries behind an opaque wall of splats contribute ~nothing yet cost
    every downstream D-proportional op (pack gather, blend kernels,
    gradient scatter) — this is where the CUDA kernel's per-pixel
    termination saves most of ITS work
    (/root/reference/gaussian_renderer/__init__.py:105-113 does it inside
    the fused op). Unlike the per-pixel rule this is approximate (the
    bound is a tile-level max, not per-pixel), so it is OFF by default
    and must be promoted only behind a PSNR/grad A/B gate (bench.py).
    ``trunc_c`` in (0, 1] scales the bound: smaller = more conservative.
    Cut depth-order prefixes keep the aligned layout exactly (truncation
    is just a smaller per-tile count)."""
    tiles_y, tiles_x = num_tiles(height, width, tile)
    n_tiles = tiles_y * tiles_x
    n = proj.means2d.shape[0]
    d = gen_entries or max_entries

    rect_min_x, rect_min_y, span_x, span_y, counts = _tight_rects(
        proj, tiles_y, tiles_x, tile)

    offsets = jnp.cumsum(counts) - counts
    total = (offsets[-1] + counts[-1] if n > 0 else jnp.int32(0))

    starts = jnp.where((counts > 0) & (offsets < d), offsets, d)
    # Entry ownership fill (run-start scatter-max + cummax) is only needed
    # when something consumes the per-entry ``gauss`` array: the gather
    # fill indexes the table with it, and the 2-key sort carries it as
    # payload. The production (cumsum, rank) path reads per-entry data
    # from the delta-cumsum table and recovers identity from the sort key
    # itself, so the ~3 ms scatter+cummax is skipped there. The validity
    # test it provided is equivalent to the range test alone: the first
    # active Gaussian always starts at offset 0, so cummax marks every
    # slot < total (and the range test kills slots beyond).
    entry_valid = jnp.arange(d) < jnp.minimum(total, d)
    rank_bits = max(1, (n - 1).bit_length() if n > 1 else 1)
    use_rank = (sort_mode == "rank"
                and (n_tiles + 1) <= (((1 << 31) - 1) >> rank_bits))
    need_owner_fill = fill == "gather" or not use_rank
    if need_owner_fill:
        marker = jnp.zeros((d + 1,), jnp.int32).at[starts].max(
            jnp.arange(n, dtype=jnp.int32) + 1)
        owner_g = jax.lax.cummax(marker[:d])
        gauss = jnp.maximum(owner_g - 1, 0)
    else:
        gauss = None

    # Tight tile culling bound: for conic Q, alpha anywhere in a tile box is
    # <= opac * exp(-0.5 * lam_min(Q) * d_e^2) with d_e the Euclidean
    # clamp distance from the mean to the box. Entries with that bound
    # below 1/255 contribute *exactly zero* in the blend (the kernel skips
    # alpha < 1/255), so dropping them is lossless — it just shrinks
    # per-tile lists, which everything downstream scales with. Condition:
    # d_e^2 > t_cmp = 2*ln(255*opac)/lam_min.
    # Interplay with max_per_tile: when the per-tile cap binds, this path
    # keeps the first K *surviving* entries while the uncull'd XLA path
    # caps raw counts (zero-contribution entries occupy slots) — the
    # culled path then renders with MORE real contributors, i.e. closer
    # to the uncapped image, so images may legitimately differ between
    # backends in the truncation regime.
    ca = proj.conic[:, 0]
    cb = proj.conic[:, 1]
    cc = proj.conic[:, 2]
    lam_min = jnp.maximum(
        0.5 * (ca + cc) - jnp.sqrt(0.25 * (ca - cc) ** 2 + cb * cb), 1e-12)
    t_cmp = 2.0 * jnp.log(jnp.maximum(255.0 * proj.opacity, 1e-12)) / lam_min

    # Batch all per-Gaussian lookups into one [N,8] row gather. Float rows
    # ride as bitcast int32.
    def fbits(v):
        return jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
    depth_bits = fbits(jnp.maximum(proj.depth, 0.0))

    # Rank-key fast path: presort the N Gaussians by depth once (stable:
    # iota is a second key), then the per-entry sort key packs
    # (tile_id << RB) | depth_rank into ONE i32 — a keyless single-array
    # sort, ~2.7x faster than the 2-key+payload sort at D=2M. Depth order
    # per tile is exactly rank order, and rank doubles as the entry's
    # Gaussian identity (in rank space) for everything downstream.
    if use_rank:
        iota_n = jnp.arange(n, dtype=jnp.int32)
        _, perm = jax.lax.sort((depth_bits, iota_n), num_keys=2)
        rank = jnp.zeros((n,), jnp.int32).at[perm].set(iota_n)
        sort_col = rank
    else:
        perm = rank = None
        sort_col = depth_bits
    gtab = jnp.stack([rect_min_x, rect_min_y,
                      jnp.maximum(span_x, 1), offsets.astype(jnp.int32),
                      sort_col,
                      fbits(proj.means2d[:, 0]), fbits(proj.means2d[:, 1]),
                      fbits(t_cmp)], axis=1)                     # [N, 8]
    if fill == "cumsum_t":
        grows_t = _delta_cumsum_rows(gtab, counts, starts, d,
                                     transposed=True)             # [8, D]
        col = lambda k: grows_t[k]                                # noqa: E731
    elif fill == "cumsum":
        grows = _delta_cumsum_rows(gtab, counts, starts, d)       # [D, 8]
        col = lambda k: grows[:, k]                               # noqa: E731
    else:
        grows = gtab[gauss]                                       # [D, 8]
        col = lambda k: grows[:, k]                               # noqa: E731

    def funbits(v):
        return jax.lax.bitcast_convert_type(v, jnp.float32)

    j = jnp.arange(d, dtype=jnp.int32) - col(3)
    tx = col(0) + j % col(2)
    ty = col(1) + j // col(2)
    mx = funbits(col(5))
    my = funbits(col(6))
    x0 = (tx * tile).astype(mx.dtype)
    y0 = (ty * tile).astype(my.dtype)
    dxe = jnp.maximum(jnp.maximum(x0 - mx, mx - (x0 + (tile - 1))), 0.0)
    dye = jnp.maximum(jnp.maximum(y0 - my, my - (y0 + (tile - 1))), 0.0)
    keep = (dxe * dxe + dye * dye) <= funbits(col(7))
    tile_id = jnp.where(entry_valid & keep, ty * tiles_x + tx, n_tiles)

    tile_range = jnp.arange(n_tiles, dtype=jnp.int32)
    if use_rank:
        # Keyless single-array sort of (tile << RB) | rank; per-tile
        # boundaries come from ONE searchsorted over T+1 key-space points
        # (tile t's end == tile t+1's start, so the two side="left"/
        # "right" calls of the fallback path collapse into one).
        key = (tile_id << rank_bits) | col(4)
        sorted_key = jax.lax.sort((key,), num_keys=1)[0]
        sorted_gauss = sorted_key & ((1 << rank_bits) - 1)  # rank space
        bounds = jnp.searchsorted(
            sorted_key, jnp.arange(n_tiles + 1, dtype=jnp.int32) << rank_bits,
            side="left")
        tile_start = bounds[:n_tiles]
        tile_end = bounds[1:]
        tile_of = (sorted_key >> rank_bits).astype(jnp.int32)
    else:
        # Two-key sort: tile id major, positive-f32 depth *bits* minor
        # (order-preserving as int32, avoiding an f32 comparator).
        sorted_tile, _, sorted_gauss = jax.lax.sort(
            (tile_id, col(4), gauss), num_keys=2)
        tile_start = jnp.searchsorted(sorted_tile, tile_range, side="left")
        tile_end = jnp.searchsorted(sorted_tile, tile_range, side="right")
        tile_of = sorted_tile
    counts_t = (tile_end - tile_start).astype(jnp.int32)
    n_flimit = None
    if trunc_theta > 0.0:
        counts_t, n_flimit = _flimit_counts(
            proj, lam_min, sorted_gauss, tile_of, tile_start, counts_t,
            perm, n_tiles, tiles_x, tile, trunc_theta, trunc_c)
    out = _aligned_from_sorted(
        sorted_gauss.astype(jnp.int32), tile_start.astype(jnp.int32),
        counts_t, jnp.asarray(total, jnp.int32), n_tiles, max_per_tile,
        chunk_e, d_out=max_entries, n_flimit=n_flimit)
    gen_tab = None
    if want_gen_tab:
        z = jnp.zeros((n,), jnp.int32)
        gen_tab = jnp.stack(
            [offsets.astype(jnp.int32), rect_min_x, rect_min_y,
             jnp.maximum(span_x, 1), counts.astype(jnp.int32),
             z, z, z], axis=1)                                # [N, 8]
    return out._replace(perm=perm, rank=rank, gen_tab=gen_tab)


def _flimit_counts(proj: ProjectedGaussians, lam_min, sorted_gauss, tile_of,
                   tile_start, counts_t, perm, n_tiles: int, tiles_x: int,
                   tile: int, trunc_theta: float, trunc_c: float):
    """Per-tile truncated counts from the proxy-transmittance rule.

    Works on the depth-sorted stream: one [D,8]-row gather brings each
    entry's (mean, lam_min, opacity) into stream order, a global cumsum of
    log(1 - c * alpha_ub) forms the proxy log-transmittance (globally
    non-increasing since every term is <= 0), and each tile's cut point
    is ONE searchsorted over that monotone array — no per-entry compaction
    pass; the smaller counts flow into the existing aligned relayout.
    The entry that crosses the threshold is kept (the CUDA per-pixel rule
    also includes its crossing entry). f32 cumsum rounding over millions
    of entries can shift a cut point by O(1) entries late in the stream —
    harmless under the quality gate. Returns (counts [T], n_cut [])."""
    d = sorted_gauss.shape[0]
    n = proj.means2d.shape[0]
    # Mass bound: the Gaussian's alpha integrated over the whole plane is
    # 2*pi*opac/sqrt(det conic), so its MEAN alpha over the tile's P
    # pixels is at most that mass / P. The per-entry proxy alpha is
    # min(position bound, mass bound): for wall-sized splats covering the
    # tile the position bound ~ opac governs; for small splats the mass
    # bound ~ coverage-weighted alpha governs (a tile-max alone
    # over-counts small splats ~10x and truncates real content).
    ca, cb, cc = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    det_c = jnp.maximum(ca * cc - cb * cb, 1e-24)
    a_mass = (2.0 * np.pi) * proj.opacity / (
        jnp.sqrt(det_c) * float(tile * tile))
    # [N, 8] row table (32-byte rows gather at the per-row issue-rate
    # floor; narrower rows are NOT cheaper — SOL.md structural fact 4).
    tab = jnp.stack([proj.means2d[:, 0], proj.means2d[:, 1], lam_min,
                     jnp.minimum(proj.opacity, 0.99), a_mass]
                    + [jnp.zeros((n,), jnp.float32)] * 3, axis=1)
    if perm is not None:  # rank mode: sorted_gauss is in depth-rank space
        tab = tab[perm]
    rows = tab[jnp.clip(sorted_gauss, 0, n - 1)]              # [D, 8]
    valid_e = tile_of < n_tiles                               # sorted: pad last
    tx = jnp.where(valid_e, tile_of % tiles_x, 0)
    ty = jnp.where(valid_e, tile_of // tiles_x, 0)
    mx, my = rows[:, 0], rows[:, 1]
    x0 = (tx * tile).astype(mx.dtype)
    y0 = (ty * tile).astype(my.dtype)
    dxe = jnp.maximum(jnp.maximum(x0 - mx, mx - (x0 + (tile - 1))), 0.0)
    dye = jnp.maximum(jnp.maximum(y0 - my, my - (y0 + (tile - 1))), 0.0)
    a_ub = rows[:, 3] * jnp.exp(-0.5 * rows[:, 2]
                                * (dxe * dxe + dye * dye))
    a_eff = jnp.minimum(a_ub, rows[:, 4])
    s = jnp.log1p(-jnp.minimum(trunc_c * a_eff, 0.999))
    cum = jnp.cumsum(jnp.where(valid_e, s, 0.0))              # non-increasing
    base = jnp.where(tile_start > 0,
                     cum[jnp.maximum(tile_start - 1, 0)], 0.0)  # [T]
    lim = base + float(np.log(trunc_theta))
    # First stream index whose inclusive proxy falls below the tile's
    # threshold; monotonicity makes this a global binary search.
    pos = jnp.searchsorted(-cum, -lim, side="right").astype(jnp.int32)
    k_t = jnp.clip(pos - tile_start + 1, 0, counts_t)
    return k_t, jnp.sum(counts_t - k_t)
