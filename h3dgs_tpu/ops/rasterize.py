"""Tiled differentiable rasterization (XLA path).

Per-tile front-to-back alpha blending, re-designed for TPU:

  * The CUDA kernel walks Gaussians sequentially per pixel-thread with an
    early-out. Here each tile consumes its depth-sorted entry list in chunks
    of G Gaussians; within a chunk the sequential transmittance recurrence
    becomes a log-space cumulative sum (alpha <= 0.99 keeps it well
    conditioned), and the color accumulation becomes a [G,P] x [G,3] matmul
    — VPU/MXU work instead of a serial loop.
  * Termination: transmittance is monotone non-increasing, so the CUDA rule
    "skip Gaussian k and stop once T*(1-alpha_k) < 1e-4" is exactly
    "contribute iff T_incl_k >= 1e-4 and not already terminated" — a mask,
    not control flow.
  * The chunk loop is a lax.scan with a rematerialized body, so the backward
    pass re-walks each chunk instead of saving [T,G,P] intermediates — the
    same strategy as the CUDA backward's per-tile re-traversal.

Semantics (alpha clamp 0.99, skip power>0 / alpha<1/255, T epsilon 1e-4,
background composited with residual T) match the reference rasterizer
contract (/root/reference/gaussian_renderer/__init__.py:105-135) and are
verified against ops.reference in tests.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..scene.camera import Camera
from .binning import TILE, BinnedGaussians, bin_gaussians, num_tiles
from .projection import ProjectedGaussians, project_gaussians

ALPHA_EPS = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
ALPHA_MAX = 0.99


class RasterizeConfig(NamedTuple):
    tile: int = TILE
    max_entries: int = 1 << 20      # duplication budget D
    max_per_tile: int = 1024        # per-tile blend depth cap K
    chunk: int = 32                 # Gaussians blended per scan step G
    remat: bool = True
    # Blend backend: "auto" picks the Pallas kernel on TPU and the XLA scan
    # path elsewhere; "pallas" / "xla" force one. The Pallas path ignores
    # ``chunk``/``remat`` and uses chunk_e-entry grid steps.
    backend: str = "auto"
    # Pallas entries per grid step (fwd). 512 is the robust default:
    # 1024 (paired with a 512 backward) won the 2026-08-19 bench
    # self-tune by ~0.5 ms but its backward sits within 2M of Mosaic's
    # 16M scoped-VMEM limit and OOMs under some fusion contexts (seen
    # in the trainer at the same shapes the bench compiled fine) — the
    # bench still races E=1024 and uses it when it compiles.
    chunk_e: int = 512
    quantum: int = 128              # per-tile alignment unit (<= chunk_e)
    # Backward termination-truncation budget (Pallas path): the backward
    # compacts away quanta whose tile fully terminated (provably zero
    # gradient) and runs on a stream of this many slots; overflow falls
    # back in-jit to the full stream, so it is lossless. None = auto
    # (max_entries // 2); 0 = disabled — the default since the round-3
    # on-chip A/B (2026-08-19: 132.3 ms vs 140.4 with auto at the 1080p
    # bench point; the faster glue no longer amortizes the compaction's
    # gather + re-pack overhead).
    bwd_entries: Optional[int] = 0
    # Pallas transmittance recurrence: "mxu" (log -> triangular-matmul
    # prefix -> exp) or "roll" (direct segmented cumprod, Hillis-Steele).
    prefix_mode: str = "mxu"
    # Backward grid-step width: lets a wide forward pair with a narrower
    # backward (the bwd kernel's VMEM scope is ~2x). 0 = auto: 512 when
    # the shapes allow (the 2026-08-19 bench winner at chunk_e=1024),
    # else chunk_e.
    bwd_chunk_e: int = 0
    # K-slot gradient scatter (0 = plain scatter-add): spread each
    # Gaussian's updates over K destinations + dense [N,K,16] reduce
    # (pallas_blend.scatter_entry_grads, SOL.md round-3 candidate B).
    scatter_k: int = 0
    # Gradient reduction entries -> Gaussians (Pallas path): "add" = one
    # [D,16]-row scatter-ADD (XLA RMW floor ~13 ns/row — the #1 single op
    # of the 1080p step at 20 ms); "segsum" = plain scatter to each
    # entry's unique generation-stream slot + [D_gen,16] cumsum +
    # per-Gaussian boundary diffs (pallas_blend.segsum_entry_grads) —
    # same sums up to f32 summation order, gated on chip
    # (scripts/ab_segsum.py) like every numeric rewrite.
    scatter_mode: str = "add"
    # Forward combine (Pallas path): True = the kernel accumulates
    # same-tile running totals in VMEM scratch and the XLA combine is a
    # single [T]-row gather at each tile's final quantum, replacing the
    # [n_quanta,8,P] segment-sum scatter-add
    # (pallas_blend.PallasBlendConfig.fwd_accumulate). Same totals up to
    # f32 summation order; raced in scripts/ab_combine.py.
    fwd_accumulate: bool = False
    # Per-entry table construction in binning: "gather" ([D,8] row
    # gather), "cumsum" (run-start delta scatter + mod-2^32 telescoping
    # cumsum fill — bit-exact, SOL.md round-3 candidate C), or
    # "cumsum_t" (same fill but transposed to [8,D] so the cumsum and
    # every downstream column read run on full-lane [D] vectors instead
    # of a [D,8]-padded-to-[D,128] layout). "cumsum" won the 2026-08-18
    # on-chip A/B (153.7 vs 156.4 ms) and is the default; "cumsum_t"
    # races in ab_r04e.
    binning_fill: str = "cumsum"
    # Entry sort: "rank" packs (tile << RB | depth-rank) into one keyless
    # i32 sort (falls back to "2key" when the bits don't fit);
    # "2key" is the (tile, depth-bits) + payload sort.
    sort_mode: str = "rank"
    # Kernel-boundary entry layout: True = [D,16] rows end-to-end with
    # in-kernel transposes (saves two XLA [D,16]<->[16,D] passes).
    rows_layout: bool = False
    # Generation-side entry budget (0 = max_entries). The pre-relayout
    # stream (owner fill, per-entry table, sort) only has to hold the RAW
    # duplicate count while max_entries holds the quantum-PADDED aligned
    # stream (typically 1.2-1.5x bigger) — splitting shrinks every
    # D-proportional op before the relayout. The trainer sizes both from
    # its separate n_raw / n_duplicates running maxima.
    gen_entries: int = 0
    # Forward-kernel post-quantum transmittance: "loop" or "batched"
    # (one masked pass + per-quantum lane slices; bit-exact — see
    # pallas_blend._seg_trans_after_all; sub-128 quanta use masked
    # [P,128] block reduces). "batched" won the 2026-08-19 bench
    # self-tune at E=1024 (S=8).
    tafter_mode: str = "batched"
    # Quality-gated per-tile depth truncation (binning.bin_gaussians_
    # aligned trunc_theta/trunc_c): cut each tile's depth-sorted entry
    # run once the proxy transmittance prod(1 - trunc_c * alpha_ub)
    # drops below trunc_theta. 0 = off (exact). Lossy — promote only
    # behind a PSNR + gradient A/B gate (bench.py races it; the trainer
    # exposes it as runtime flags).
    trunc_theta: float = 0.0
    trunc_c: float = 1.0
    # Mesh axis name to shard the per-tile blend over (pixels/tiles are the
    # natural SPMD axis of splatting). Requires an ambient mesh
    # (jax.set_mesh); Gaussian/entry arrays stay replicated and XLA inserts
    # the psum for parameter gradients automatically.
    shard_axis: Optional[str] = None


def _tile_pixel_grid(tiles_y, tiles_x, tile, dtype):
    """Pixel coordinates per tile: ([T, P], [T, P]) for P = tile*tile."""
    ty = jnp.arange(tiles_y)
    tx = jnp.arange(tiles_x)
    oy = (ty[:, None] * tile + jnp.zeros((tiles_x,), jnp.int32)[None, :]).reshape(-1)
    ox = (jnp.zeros((tiles_y,), jnp.int32)[:, None] * tile + tx[None, :] * tile).reshape(-1)
    ly = jnp.arange(tile)
    lx = jnp.arange(tile)
    py_local, px_local = jnp.meshgrid(ly, lx, indexing="ij")
    px = (ox[:, None] + px_local.reshape(-1)[None, :]).astype(dtype)
    py = (oy[:, None] + py_local.reshape(-1)[None, :]).astype(dtype)
    return px, py


def blend_tiles(proj: ProjectedGaussians, binned: BinnedGaussians,
                height: int, width: int, bg_color: jnp.ndarray,
                config: RasterizeConfig = RasterizeConfig()):
    """Blend sorted entries into an image.

    Returns (rgb [3,H,W], invdepth [1,H,W], final_T [H,W]).
    """
    tile = config.tile
    tiles_y, tiles_x = num_tiles(height, width, tile)
    n_tiles = tiles_y * tiles_x
    p = tile * tile
    g = config.chunk
    k = config.max_per_tile
    n_chunks = -(-k // g)
    d = binned.gauss_idx.shape[0]

    dtype = proj.means2d.dtype
    px, py = _tile_pixel_grid(tiles_y, tiles_x, tile, dtype)  # [T, P]

    def shard_tiles(x, extra_dims=1):
        if config.shard_axis is None:
            return x
        from jax.sharding import PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            x, P(config.shard_axis, *([None] * extra_dims)))

    px = shard_tiles(px)
    py = shard_tiles(py)
    tile_start = shard_tiles(binned.tile_start, extra_dims=0)
    tile_count = shard_tiles(binned.tile_count, extra_dims=0)
    binned = binned._replace(tile_start=tile_start, tile_count=tile_count)

    inv_depth_g = 1.0 / jnp.maximum(proj.depth, 1e-6)

    def body(carry, chunk_idx):
        color, invd, trans, term = carry
        ks = chunk_idx * g + jnp.arange(g)                    # [G]
        idx = binned.tile_start[:, None] + ks[None, :]        # [T, G]
        in_range = ks[None, :] < jnp.minimum(binned.tile_count, k)[:, None]
        idx = jnp.clip(idx, 0, d - 1)
        gi = binned.gauss_idx[idx]                            # [T, G]

        mean = proj.means2d[gi]                               # [T, G, 2]
        con = proj.conic[gi]                                  # [T, G, 3]
        rgb = proj.rgb[gi]                                    # [T, G, 3]
        opac = proj.opacity[gi]                               # [T, G]
        invdg = inv_depth_g[gi]                               # [T, G]

        dx = px[:, None, :] - mean[..., 0:1]                  # [T, G, P]
        dy = py[:, None, :] - mean[..., 1:2]
        power = (-0.5 * (con[..., 0:1] * dx * dx + con[..., 2:3] * dy * dy)
                 - con[..., 1:2] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, opac[..., None] * jnp.exp(power))
        ok = in_range[..., None] & (power <= 0.0) & (alpha >= ALPHA_EPS)
        alpha = jnp.where(ok, alpha, 0.0)

        one_minus = 1.0 - alpha
        log_om = jnp.log(jnp.maximum(one_minus, 1e-12))
        cum_incl = jnp.cumsum(log_om, axis=1)                 # [T, G, P]
        t_incl = trans[:, None, :] * jnp.exp(cum_incl)
        t_excl = trans[:, None, :] * jnp.exp(cum_incl - log_om)

        # t_incl is monotone non-increasing within the chunk, so "terminated
        # at or before k" == "t_incl_k < eps"; carry `term` across chunks
        # because the frozen T can itself sit above eps.
        live = (~term[:, None, :]) & (t_incl >= TRANSMITTANCE_EPS)
        contrib = jnp.where(live, alpha * t_excl, 0.0)        # [T, G, P]

        # f32 accumulation: the TPU MXU would otherwise round the inputs
        # to bf16, which visibly shifts the blended image.
        color = color + jnp.einsum("tgp,tgc->tpc", contrib, rgb,
                                   precision=jax.lax.Precision.HIGHEST)
        invd = invd + jnp.einsum("tgp,tg->tp", contrib, invdg,
                                 precision=jax.lax.Precision.HIGHEST)
        trans = trans * jnp.exp(jnp.sum(jnp.where(live, log_om, 0.0), axis=1))
        term = term | (t_incl[:, -1, :] < TRANSMITTANCE_EPS)
        return (color, invd, trans, term), None

    if config.remat:
        body = jax.checkpoint(body)

    init = (shard_tiles(jnp.zeros((n_tiles, p, 3), dtype), 2),
            shard_tiles(jnp.zeros((n_tiles, p), dtype)),
            shard_tiles(jnp.ones((n_tiles, p), dtype)),
            shard_tiles(jnp.zeros((n_tiles, p), bool)))
    (color, invd, trans, _term), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks, dtype=jnp.int32))

    color = color + trans[..., None] * bg_color[None, None, :]

    def untile(t_p_c, channels):
        img = t_p_c.reshape(tiles_y, tiles_x, tile, tile, channels)
        img = img.transpose(4, 0, 2, 1, 3).reshape(
            channels, tiles_y * tile, tiles_x * tile)
        return img[:, :height, :width]

    image = untile(color, 3)
    invdepth = untile(invd[..., None], 1)
    final_t = untile(trans[..., None], 1)[0]
    # Defensive: on the axon TPU backend, fusing this tiled-transpose output
    # elementwise with a captured constant miscompiles (observed: image vs
    # constant-target MSE wrong by 0.07 while the returned image is correct).
    # The barrier forces materialization; cost is negligible vs the blend.
    image, invdepth, final_t = jax.lax.optimization_barrier(
        (image, invdepth, final_t))
    return image, invdepth, final_t


def _on_tpu() -> bool:
    """True on real TPU hardware (incl. plugin backends like axon whose
    platform name is not "tpu" but whose devices are TPU chips)."""
    try:
        d = jax.devices()[0]
        return (d.platform == "tpu"
                or "tpu" in getattr(d, "device_kind", "").lower())
    except Exception:
        return False


def _use_pallas(config: RasterizeConfig) -> bool:
    if config.backend == "pallas":
        return True
    if config.backend == "xla":
        return False
    # Pixel-tile sharding (shard_axis) is implemented by the XLA scan path;
    # the Pallas kernel currently computes one device's full view (sharded
    # multi-chip rendering shards views, not tiles, over the kernel).
    if config.shard_axis is not None:
        return False
    return _on_tpu()


def blend_tiles_pallas(proj: ProjectedGaussians, height: int, width: int,
                       bg_color: jnp.ndarray, config: RasterizeConfig):
    """Pallas-kernel blend path; same contract as blend_tiles.

    Bins with chunk-aligned segments, runs the fused fwd/bwd kernel
    (ops/pallas_blend.py), and composes background + untiles in XLA.
    """
    from .binning import bin_gaussians_aligned

    tile = config.tile
    quantum = min(config.quantum, config.chunk_e)
    if config.chunk_e % quantum:
        raise ValueError(
            f"chunk_e ({config.chunk_e}) must be a multiple of quantum "
            f"({quantum})")
    if quantum < 128 and 128 % quantum:
        raise ValueError(
            f"quantum ({quantum}) below a 128-lane tile must divide 128 "
            "— the kernel's sub-quantum machinery (block-diagonal MXU "
            "prefix, masked block reduces) assumes whole sub-quanta per "
            "lane tile")
    if config.max_entries % config.chunk_e:
        raise ValueError(
            f"max_entries ({config.max_entries}) must be a multiple of "
            f"chunk_e ({config.chunk_e}); otherwise the blend grid leaves "
            "trailing quanta unprocessed but still consumed downstream")
    bins = bin_gaussians_aligned(proj, height, width, config.max_entries,
                                 config.max_per_tile, quantum, tile,
                                 fill=config.binning_fill,
                                 sort_mode=config.sort_mode,
                                 gen_entries=config.gen_entries,
                                 trunc_theta=config.trunc_theta,
                                 trunc_c=config.trunc_c,
                                 want_gen_tab=(config.scatter_mode
                                               == "segsum"))
    return blend_from_bins(proj, bins, height, width, bg_color, config)


def blend_from_bins(proj: ProjectedGaussians, bins, height: int, width: int,
                    bg_color: jnp.ndarray, config: RasterizeConfig):
    """Pallas blend from precomputed AlignedBins (the tail of
    blend_tiles_pallas after binning — split out so the in-context stage
    profiler can time the pipeline from any stage boundary)."""
    from .pallas_blend import PallasBlendConfig, blend_entries

    tile = config.tile
    tiles_y, tiles_x = num_tiles(height, width, tile)
    n_tiles = tiles_y * tiles_x
    quantum = min(config.quantum, config.chunk_e)
    if config.chunk_e % quantum:
        raise ValueError(
            f"chunk_e ({config.chunk_e}) must be a multiple of quantum "
            f"({quantum})")
    if quantum < 128:
        # The kernel's sub-quantum machinery (block-diagonal MXU prefix,
        # masked [P,128] block reduces) iterates whole 128-lane tiles, so
        # every segment length it sees must pack 128 lanes exactly.
        if 128 % quantum:
            raise ValueError(
                f"quantum ({quantum}) below a 128-lane tile must divide "
                "128")
        if config.chunk_e % 128 or (config.bwd_chunk_e
                                    and config.bwd_chunk_e % 128):
            raise ValueError(
                f"with quantum={quantum} < 128, chunk_e "
                f"({config.chunk_e}) and bwd_chunk_e "
                f"({config.bwd_chunk_e}) must be multiples of 128 — "
                "_seg_trans_after/_seg_prefix iterate whole 128-lane "
                "blocks")
    bwd_entries = config.bwd_entries
    if bwd_entries is None:
        bwd_entries = max(config.max_entries // 2, config.chunk_e)
        bwd_entries -= bwd_entries % config.chunk_e
    if bwd_entries % config.chunk_e:
        raise ValueError(
            f"bwd_entries ({bwd_entries}) must be a multiple of chunk_e "
            f"({config.chunk_e}); the backward grid would leave trailing "
            "quanta unprocessed")
    bwd_e = config.bwd_chunk_e
    if not bwd_e:
        bwd_e = config.chunk_e
        if (config.chunk_e > 512 and 512 % quantum == 0
                and config.max_entries % 512 == 0
                and (not bwd_entries or bwd_entries % 512 == 0)):
            bwd_e = 512  # auto-pair wide forwards with a 512 backward
    if bwd_e % quantum or config.max_entries % bwd_e or \
            (bwd_entries and bwd_entries % bwd_e):
        raise ValueError(
            f"bwd_chunk_e ({bwd_e}) must be a multiple of quantum "
            f"({quantum}) and divide max_entries ({config.max_entries}) "
            f"and bwd_entries ({bwd_entries})")
    tafter = config.tafter_mode
    pcfg = PallasBlendConfig(
        chunk_e=config.chunk_e, quantum=quantum,
        bwd_chunk_e=config.bwd_chunk_e,
        interpret=not _on_tpu(), bwd_entries=bwd_entries,
        prefix_mode=config.prefix_mode, scatter_k=config.scatter_k,
        tafter_mode=tafter,
        rows_layout=config.rows_layout,
        scatter_mode=config.scatter_mode,
        gen_d=(config.gen_entries or config.max_entries
               if config.scatter_mode == "segsum" else 0),
        fwd_accumulate=config.fwd_accumulate)
    inv_depth = 1.0 / jnp.maximum(proj.depth, 1e-6)
    n_q_per_tile = -(-bins.tile_count // quantum)
    # Tiles whose aligned run overflows the buffer lost their quanta —
    # treat them as empty (background) rather than gathering another
    # tile's transmittance.
    fits = (bins.tile_start + n_q_per_tile * quantum
            <= config.max_entries)
    last_chunk = jnp.where(
        (bins.tile_count > 0) & fits,
        bins.tile_start // quantum + n_q_per_tile - 1, -1)
    out, n_bwd_quanta = blend_entries(
        proj.means2d, proj.conic, proj.rgb, proj.opacity,
        inv_depth, bins.owner, bins.gauss_idx,
        last_chunk.astype(jnp.int32), bins.perm, bins.rank,
        getattr(bins, "gen_tab", None),
        n_tiles, tiles_x, tile, pcfg)                     # [T, 8, P]

    color = out[:, 0:3, :]
    invd = out[:, 3, :]
    trans = out[:, 4, :]
    color = color + trans[:, None, :] * bg_color[None, :, None]

    def untile(t_c_p, channels):
        img = t_c_p.reshape(tiles_y, tiles_x, channels, tile, tile)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            channels, tiles_y * tile, tiles_x * tile)
        return img[:, :height, :width]

    image = untile(color, 3)
    invdepth = untile(invd[:, None, :], 1)
    final_t = untile(trans[:, None, :], 1)[0]
    image, invdepth, final_t = jax.lax.optimization_barrier(
        (image, invdepth, final_t))
    # Budget pressure = worst of raw duplicates and chunk-padded aligned
    # slots: either exceeding its buffer drops tail entries/tiles. n_raw
    # governs gen_entries; the max governs max_entries (when the budgets
    # are unsplit the aligned stream must also hold the raw count). With
    # a split gen budget the aligned buffer only ever holds the relayout
    # output — e.g. under depth truncation it is legitimately SMALLER
    # than the raw count, and reporting the max would make the adaptive
    # trainer grow it for nothing.
    if config.gen_entries:
        n_need = bins.aligned_entries
    else:
        n_need = jnp.maximum(bins.total_entries, bins.aligned_entries)
    return (image, invdepth, final_t, n_need, bins.n_truncated,
            bins.total_entries, n_bwd_quanta)


def blend_auto(proj: ProjectedGaussians, height: int, width: int, bg_color,
               config: RasterizeConfig):
    """Backend-dispatching blend of projected Gaussians into an image.

    Returns (image [3,H,W], invdepth [1,H,W], final_T [H,W], n_need [],
    n_truncated [] — entries cut by max_per_tile; the XLA path never
    truncates per-tile, so it reports 0 — n_raw [], the raw duplicate
    count governing the generation-side budget, and n_bwd_quanta [], the
    backward-surviving quantum count (-1 when not tracked)).
    """
    if _use_pallas(config):
        return blend_tiles_pallas(proj, height, width,
                                  jnp.asarray(bg_color), config)
    binned = bin_gaussians(proj, height, width, config.max_entries,
                           config.tile)
    image, invdepth, final_t = blend_tiles(
        proj, binned, height, width, jnp.asarray(bg_color), config)
    return (image, invdepth, final_t, binned.total_entries,
            jnp.zeros((), jnp.int32), binned.total_entries,
            jnp.full((), -1, jnp.int32))


def rasterize(
    means3d, scales, quats, opacities, shs, camera: Camera, sh_degree: int,
    bg_color, scale_modifier: float = 1.0,
    colors_precomp: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    config: RasterizeConfig = RasterizeConfig(),
):
    """Full differentiable rasterization pass.

    ``means2d_offset`` is a zeros [N, 2] tensor added to the projected
    screen-space means; differentiating w.r.t. it yields the screen-space
    positional gradients that drive densification (the reference's
    ``screenspace_points`` trick, gaussian_renderer/__init__.py:28-33).

    Returns a dict: render [3,H,W], invdepth [1,H,W], final_transmittance
    [H,W], radii [N], visibility_filter [N] bool, n_duplicates [] int.
    """
    proj = project_gaussians(means3d, scales, quats, opacities, shs, camera,
                             sh_degree, scale_modifier,
                             colors_precomp=colors_precomp)
    if means2d_offset is not None:
        proj = proj._replace(means2d=proj.means2d + means2d_offset)
    image, invdepth, final_t, n_dup, n_trunc, n_raw, n_bwd = blend_auto(
        proj, camera.height, camera.width, bg_color, config)
    return {
        "render": image,
        "invdepth": invdepth,
        "final_transmittance": final_t,
        "radii": proj.radius,
        "visibility_filter": proj.radius > 0,
        "n_duplicates": n_dup,
        "n_truncated": n_trunc,
        "n_raw": n_raw,
        "n_bwd_quanta": n_bwd,
    }
