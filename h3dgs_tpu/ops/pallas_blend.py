"""Pallas TPU kernel for tile-sorted alpha blending (forward + backward).

This is the hot op of the whole framework — the equivalent of the CUDA
hierarchy-rasterizer's per-tile blend loops (interface contract at
/root/reference/gaussian_renderer/__init__.py:105-135) — re-designed for
the TPU pipeline model:

  * Entries are pre-gathered into one packed ``[16, D]`` f32 stream,
    segment-aligned per tile (ops/binning.align_segments). The kernel grid
    walks chunks of E entries with *static* block index maps (the key to
    full DMA double-buffering): each grid step reads one entry chunk and
    writes that chunk's **incremental** per-tile contribution to a
    per-chunk output slot; a cheap XLA segment-sum then combines chunks
    into tiles. A scalar-prefetched ``owner`` array drives only in-kernel
    control (accumulator resets), never the DMA schedule.
  * Sequential state (transmittance, termination, gradient prefix) lives
    in VMEM scratch that persists across grid steps (the TPU grid is
    sequential) and resets when the owner changes.
  * Work is laid out ``[P=tile_pixels (sublanes), E (lanes)]``: per-entry
    scalars broadcast along sublanes, per-pixel coordinates along lanes —
    VPU elementwise math, with color accumulation as an MXU ``[4,E]x[E,P]``
    contraction. The transmittance recurrence runs as a log-space prefix
    sum computed on the MXU (one [P,E]x[E,E] triangular matmul,
    _prefix_lanes) — the MXU is near-idle here while the VPU is the
    bottleneck, and Mosaic has no native cumsum/cumprod lowering.
  * The backward kernel re-walks the same stream (no [T,K,P] intermediates
    saved — the CUDA kernel's re-traversal strategy). All color/depth
    channels collapse into ONE gradient prefix channel via
    sum_ch g_ch * S_ch,i = (sum_ch g_ch tot_ch) - prefix_i(w_j * g·a_j),
    so the whole suffix computation is a single prefix sum. One XLA
    scatter-add maps per-entry grads back to Gaussians.

Numerical contract (alpha clamp 0.99, skip power>0 / alpha<1/255,
transmittance epsilon 1e-4, frozen-T termination carry) matches
ops/rasterize.blend_tiles exactly; parity is enforced by tests against the
oracle renderer and the XLA path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_EPS = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4
ALPHA_MAX = 0.99

# Packed entry rows (sublane index in the [16, D] stream). The same row
# indices are reused for the per-entry gradient stream emitted by the
# backward kernel (mean_x/mean_y/conic/rgb/opacity/invdepth grads).
R_MX, R_MY, R_CA, R_CB, R_CC, R_R, R_G, R_B, R_OP, R_ID = range(10)
N_ROWS = 16  # padded to a full sublane tile

# Output rows per chunk/tile: rgb, invdepth, transmittance (pre-background).
# In the backward cotangent stream the spare rows carry fused suffix
# constants: G_TOT = sum_ch g_ch*total_ch, G_TFIN = final transmittance.
O_R, O_G, O_B, O_D, O_T = range(5)
G_TOT, G_TFIN = 5, 6
N_OUT = 8


class PallasBlendConfig(NamedTuple):
    chunk_e: int = 128     # entries per grid step (lane dim)
    interpret: bool = False


def _pixel_coords(owner, tiles_x: int, tile: int, p: int, dtype):
    """Per-pixel coordinates for a tile: ([P,1], [P,1]) pixel-major."""
    ty = (owner // tiles_x).astype(dtype)
    tx = (owner % tiles_x).astype(dtype)
    pid = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    lx = (pid % tile).astype(dtype)
    ly = (pid // tile).astype(dtype)
    return tx * tile + lx, ty * tile + ly


def _alpha_terms(e, px, py):
    """Shared forward math. e: [16,E]; px/py: [P,1]. Results [P,E]."""
    dx = px - e[R_MX:R_MX + 1, :]
    dy = py - e[R_MY:R_MY + 1, :]
    power = (-0.5 * (e[R_CA:R_CA + 1, :] * dx * dx
                     + e[R_CC:R_CC + 1, :] * dy * dy)
             - e[R_CB:R_CB + 1, :] * dx * dy)
    alpha_raw = e[R_OP:R_OP + 1, :] * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    ok = (power <= 0.0) & (alpha >= ALPHA_EPS)
    alpha = jnp.where(ok, alpha, 0.0)
    # alpha <= ALPHA_MAX so om ∈ [0.01, 1]: log(om) needs no clamp and the
    # exp/div round trip below is well conditioned.
    om = 1.0 - alpha
    return alpha, ok, om, dx, dy, alpha_raw


def _prefix_lanes(x):
    """Inclusive prefix sum along lanes as an MXU contraction with a
    triangular ones matrix. The MXU is otherwise idle during the
    recurrence, and one [P,E]x[E,E] HIGHEST-precision matmul replaces
    ~30 masked-roll VPU ops per element (Mosaic has no cumsum lowering;
    Hillis-Steele on the VPU was the kernel's single largest cost)."""
    e = x.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (e, e), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (e, e), 1)
    u = (row <= col).astype(x.dtype)
    return jax.lax.dot_general(x, u, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _recurrence(e, trans, term, px, py):
    """Transmittance recurrence for one chunk; returns blend terms."""
    alpha, ok, om, dx, dy, alpha_raw = _alpha_terms(e, px, py)
    t_carry = trans[:, 0:1]                              # [P,1]
    cum = _prefix_lanes(jnp.log(om))                     # sum_{j<=i} log om_j
    t_incl = t_carry * jnp.exp(cum)
    t_excl = t_incl / om                                 # om >= 0.01
    live = (term[:, 0:1] == 0.0) & (t_incl >= TRANSMITTANCE_EPS)
    contrib = jnp.where(live, alpha * t_excl, 0.0)       # [P,E]
    # live lanes are a prefix (t_incl is non-increasing along lanes), so
    # the post-chunk transmittance is t_incl at the last live lane ==
    # masked min (t_carry when nothing is live).
    new_trans = jnp.min(jnp.where(live, t_incl, t_carry), axis=1,
                        keepdims=True)
    new_term = jnp.maximum(
        term[:, 0:1],
        (t_incl[:, -1:] < TRANSMITTANCE_EPS).astype(jnp.float32))
    return (alpha, ok, dx, dy, alpha_raw, t_excl, live, contrib,
            new_trans, new_term)


def _attr4(e):
    """rgb + invdepth rows: [4, E]."""
    return jnp.concatenate([e[R_R:R_B + 1, :], e[R_ID:R_ID + 1, :]], axis=0)


def _first_of_tile(owner_ref, c):
    owner = owner_ref[c]
    prev = owner_ref[jnp.maximum(c - 1, 0)]
    return owner, jnp.logical_or(c == 0, owner != prev)


def _fwd_kernel(owner_ref, entries_ref, out_ref, trans, term,
                *, tiles_x: int, tile: int, p: int):
    c = pl.program_id(0)
    owner, first = _first_of_tile(owner_ref, c)

    @pl.when(first)
    def _():
        trans[:] = jnp.ones_like(trans)
        term[:] = jnp.zeros_like(term)

    out_ref[0, O_R:O_D + 1, :] = jnp.zeros((4, p), jnp.float32)

    # Skip compute for unused chunks and for tiles whose every pixel
    # already terminated (the CUDA early-out).
    saturated = jnp.logical_and(jnp.logical_not(first),
                                jnp.min(term[:, 0:1]) > 0.0)

    @pl.when(jnp.logical_and(owner >= 0, jnp.logical_not(saturated)))
    def _():
        e = entries_ref[:]                                   # [16,E]
        px, py = _pixel_coords(owner, tiles_x, tile, p, e.dtype)
        (_alpha, _ok, _dx, _dy, _raw, _t_excl, _live, contrib,
         new_trans, new_term) = _recurrence(e, trans, term, px, py)
        out_ref[0, O_R:O_D + 1, :] = jax.lax.dot_general(
            _attr4(e), contrib, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        trans[:, 0:1] = new_trans
        term[:, 0:1] = new_term

    out_ref[0, O_T, :] = trans[:, 0]
    out_ref[0, O_T + 1:, :] = jnp.zeros((N_OUT - O_T - 1, p), jnp.float32)


def _bwd_kernel(owner_ref, entries_ref, grads_ref, dentries_ref,
                trans, term, pre, *, tiles_x: int, tile: int, p: int):
    """Per-entry gradients.

    grads_ref: [1, N_OUT, P] per-chunk gathered cotangents — rows 0-3
    color + invdepth, row O_T transmittance, and the two spare rows carry
    the fused suffix constants (row G_TOT = g·total, row G_TFIN = t_fin)
    so one gather feeds the kernel. pre: [8, P] scratch — row 0 carries
    the fused gradient prefix.
    """
    c = pl.program_id(0)
    owner, first = _first_of_tile(owner_ref, c)

    @pl.when(first)
    def _():
        trans[:] = jnp.ones_like(trans)
        term[:] = jnp.zeros_like(term)
        pre[:] = jnp.zeros_like(pre)

    dentries_ref[:] = jnp.zeros_like(dentries_ref)

    saturated = jnp.logical_and(jnp.logical_not(first),
                                jnp.min(term[:, 0:1]) > 0.0)

    @pl.when(jnp.logical_and(owner >= 0, jnp.logical_not(saturated)))
    def _():
        e = entries_ref[:]
        px, py = _pixel_coords(owner, tiles_x, tile, p, e.dtype)
        (alpha, ok, dx, dy, alpha_raw, t_excl, live, contrib,
         new_trans, new_term) = _recurrence(e, trans, term, px, py)

        g = grads_ref[0]                                     # [N_OUT,P]
        attr = _attr4(e)                                     # [4,E]

        # d rgb / d invd: contraction over pixels on the MXU.
        d_attr = jax.lax.dot_general(
            g[O_R:O_D + 1, :], contrib, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [4,E]
        dentries_ref[R_R:R_B + 1, :] = d_attr[0:3, :]
        dentries_ref[R_ID:R_ID + 1, :] = d_attr[3:4, :]

        # Fused suffix: ga_i = sum_ch g_ch * a_ch,i  ([P,E] via one MXU
        # contraction g[4,P]^T x attr[4,E]).
        ga = jax.lax.dot_general(
            g[O_R:O_D + 1, :], attr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [P,E]
        q = contrib * ga
        prefix = pre[0:1, :].T + _prefix_lanes(q)            # [P,E]
        g_tot = g[G_TOT:G_TOT + 1, :].T                      # [P,1]
        t_fin = g[G_TFIN:G_TFIN + 1, :].T                    # [P,1]
        inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-12)
        g_t = g[O_T:O_T + 1, :].T                            # [P,1]
        d_alpha = (t_excl * ga - (g_tot - prefix) * inv_om
                   + g_t * (-t_fin * inv_om))
        pre[0:1, :] += jnp.sum(q, axis=1)[None, :]

        d_alpha = jnp.where(live & ok, d_alpha, 0.0)
        d_alpha_eff = jnp.where(alpha_raw < ALPHA_MAX, d_alpha, 0.0)

        opac = e[R_OP:R_OP + 1, :]
        exp_power = jnp.where(opac > 0.0,
                              alpha_raw / jnp.maximum(opac, 1e-20), 0.0)
        d_opac = d_alpha_eff * exp_power
        d_power = d_alpha_eff * alpha_raw

        def rowsum(x):                                       # [P,E]->[1,E]
            return jnp.sum(x, axis=0, keepdims=True)

        ca = e[R_CA:R_CA + 1, :]
        cb = e[R_CB:R_CB + 1, :]
        cc = e[R_CC:R_CC + 1, :]
        dentries_ref[R_OP:R_OP + 1, :] = rowsum(d_opac)
        dentries_ref[R_CA:R_CA + 1, :] = rowsum(d_power * (-0.5 * dx * dx))
        dentries_ref[R_CB:R_CB + 1, :] = rowsum(d_power * (-dx * dy))
        dentries_ref[R_CC:R_CC + 1, :] = rowsum(d_power * (-0.5 * dy * dy))
        dentries_ref[R_MX:R_MX + 1, :] = rowsum(d_power * (ca * dx + cb * dy))
        dentries_ref[R_MY:R_MY + 1, :] = rowsum(d_power * (cc * dy + cb * dx))

        trans[:, 0:1] = new_trans
        term[:, 0:1] = new_term


def pallas_blend_fwd(packed, owner, *, tiles_x: int, tile: int,
                     cfg: PallasBlendConfig):
    """Per-chunk incremental contributions: [n_chunks, N_OUT, P]."""
    p = tile * tile
    e = cfg.chunk_e
    n_chunks = packed.shape[1] // e
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x, tile=tile, p=p)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[pl.BlockSpec((N_ROWS, e), lambda c, o: (0, c),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N_OUT, p), lambda c, o: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((p, 8), jnp.float32),     # trans (col 0)
                pltpu.VMEM((p, 8), jnp.float32),     # term (col 0)
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_chunks, N_OUT, p), jnp.float32),
        interpret=cfg.interpret,
    )(owner, packed)


def pallas_blend_bwd(packed, owner, grads_chunks, *,
                     tiles_x: int, tile: int, cfg: PallasBlendConfig):
    """Per-entry gradient stream [16, D] from per-chunk cotangents."""
    p = tile * tile
    e = cfg.chunk_e
    n_chunks = packed.shape[1] // e
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x, tile=tile, p=p)
    chunk_spec = pl.BlockSpec((1, N_OUT, p), lambda c, o: (c, 0, 0),
                              memory_space=pltpu.VMEM)
    entry_spec = pl.BlockSpec((N_ROWS, e), lambda c, o: (0, c),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[entry_spec, chunk_spec],
            out_specs=entry_spec,
            scratch_shapes=[
                pltpu.VMEM((p, 8), jnp.float32),
                pltpu.VMEM((p, 8), jnp.float32),
                pltpu.VMEM((8, p), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        interpret=cfg.interpret,
    )(owner, packed, grads_chunks)


def pack_entries(means2d, conic, rgb, opacity, inv_depth,
                 gauss_idx) -> jax.Array:
    """Gather per-entry attributes into the packed [16, D] stream.

    One [N,16] attribute matrix -> one contiguous row gather -> transpose:
    the gather moves 64-byte rows (fast) instead of 10 scalar gathers.
    """
    n = means2d.shape[0]
    attr = jnp.zeros((n, N_ROWS), jnp.float32)
    attr = attr.at[:, R_MX].set(means2d[:, 0])
    attr = attr.at[:, R_MY].set(means2d[:, 1])
    attr = attr.at[:, R_CA:R_CC + 1].set(conic)
    attr = attr.at[:, R_R:R_B + 1].set(rgb)
    attr = attr.at[:, R_OP].set(opacity)
    attr = attr.at[:, R_ID].set(inv_depth)
    gi = jnp.maximum(gauss_idx, 0)
    rows = attr[gi]                                        # [D, 16]
    rows = jnp.where((gauss_idx >= 0)[:, None], rows, 0.0)
    return rows.T


def scatter_entry_grads(dentries, gauss_idx, n: int):
    """Scatter-add per-entry gradients back to per-Gaussian arrays.

    One [D,16]-row scatter-add (contiguous 64-byte updates) instead of ten
    scalar scatters."""
    safe = jnp.where(gauss_idx >= 0, gauss_idx, n)
    rows = dentries.T                                      # [D, 16]
    acc = jnp.zeros((n + 1, N_ROWS), jnp.float32).at[safe].add(
        rows, mode="drop")[:n]
    d_means2d = acc[:, R_MX:R_MY + 1]
    d_conic = acc[:, R_CA:R_CC + 1]
    d_rgb = acc[:, R_R:R_B + 1]
    d_opac = acc[:, R_OP]
    d_invd = acc[:, R_ID]
    return d_means2d, d_conic, d_rgb, d_opac, d_invd


# --------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def blend_entries(means2d, conic, rgb, opacity, inv_depth, owner, gauss_idx,
                  last_chunk, n_tiles: int, tiles_x: int, tile: int,
                  cfg: PallasBlendConfig):
    """Differentiable tile blend: per-Gaussian screen-space attributes ->
    per-tile [n_tiles, 8, P] (rgb, invdepth, transmittance; pre-background).

    ``last_chunk``: [n_tiles] int32 index of each tile's final chunk
    (-1 = tile has no entries).
    """
    out, _ = _blend_fwd(means2d, conic, rgb, opacity, inv_depth, owner,
                        gauss_idx, last_chunk, n_tiles, tiles_x, tile, cfg)
    return out


def _combine_chunks(chunk_out, owner, last_chunk, n_tiles):
    """Segment-sum chunk contributions into tiles; gather final trans."""
    safe_owner = jnp.where(owner >= 0, owner, n_tiles)
    tiles = jnp.zeros((n_tiles + 1,) + chunk_out.shape[1:],
                      chunk_out.dtype).at[safe_owner].add(chunk_out,
                                                          mode="drop")
    tiles = tiles[:n_tiles]
    has = last_chunk >= 0
    trans = jnp.where(
        has[:, None],
        chunk_out[jnp.maximum(last_chunk, 0), O_T, :], 1.0)
    tiles = tiles.at[:, O_T, :].set(trans)
    return tiles


def _blend_fwd(means2d, conic, rgb, opacity, inv_depth, owner, gauss_idx,
               last_chunk, n_tiles, tiles_x, tile, cfg):
    packed = pack_entries(means2d, conic, rgb, opacity, inv_depth, gauss_idx)
    chunk_out = pallas_blend_fwd(packed, owner, tiles_x=tiles_x, tile=tile,
                                 cfg=cfg)
    # Defensive (axon backend): keep XLA from fusing the segment-sum into
    # the pallas output — one observed miscompile produced black tile runs
    # for a specific fused executable (bit-identical per compile, absent
    # un-jitted and in interpret mode).
    chunk_out = jax.lax.optimization_barrier(chunk_out)
    out = _combine_chunks(chunk_out, owner, last_chunk, n_tiles)
    return out, (packed, owner, gauss_idx, out, means2d.shape[0])


def _blend_bwd(n_tiles, tiles_x, tile, cfg, res, g):
    packed, owner, gauss_idx, out, n = res
    g = jnp.asarray(g, jnp.float32)
    safe_owner = jnp.maximum(owner, 0)
    # Fused suffix constants ride the spare cotangent rows, so the kernel
    # needs a single per-chunk gather.
    g_tot = jnp.sum(g[:, O_R:O_D + 1, :] * out[:, O_R:O_D + 1, :], axis=1)
    g = g.at[:, G_TOT, :].set(g_tot).at[:, G_TFIN, :].set(out[:, O_T, :])
    grads_chunks = g[safe_owner]                             # [C, 8, P]
    dentries = pallas_blend_bwd(packed, owner, grads_chunks,
                                tiles_x=tiles_x, tile=tile, cfg=cfg)
    d_means2d, d_conic, d_rgb, d_opac, d_invd = scatter_entry_grads(
        dentries, gauss_idx, n)
    f0 = np.zeros(owner.shape, jax.dtypes.float0)
    f0_g = np.zeros(gauss_idx.shape, jax.dtypes.float0)
    f0_l = np.zeros((n_tiles,), jax.dtypes.float0)
    return (d_means2d, d_conic, d_rgb, d_opac, d_invd, f0, f0_g, f0_l)


blend_entries.defvjp(_blend_fwd, _blend_bwd)
