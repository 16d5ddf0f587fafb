"""Pallas TPU kernel for tile-sorted alpha blending (forward + backward).

This is the hot op of the whole framework — the equivalent of the CUDA
hierarchy-rasterizer's per-tile blend loops (interface contract at
/root/reference/gaussian_renderer/__init__.py:105-135) — re-designed for
the TPU pipeline model:

  * Entries are pre-gathered into one packed ``[16, D]`` f32 stream,
    aligned per tile to Q-entry *quanta* (ops/binning). The kernel grid
    walks chunks of E = S*Q entries with *static* block index maps (the
    key to full DMA double-buffering): each grid step reads one entry
    chunk and writes **incremental** per-quantum contributions to S
    output slots; a cheap XLA segment-sum then combines quanta into
    tiles. A scalar-prefetched per-quantum ``owner`` array drives only
    in-kernel control, never the DMA schedule.
  * A chunk may span several tiles (its S quanta can have different
    owners). Equal-owner quanta are stream-consecutive, so lanes split
    into owner groups; the prefix matmul's mask (triangular AND
    same-group, _segments) stops transmittance accumulation at group
    boundaries, and the carried VMEM state only feeds group 0. This
    decouples the grid-step width (256 = the v5e sweet spot) from the
    alignment padding quantum (128 halves the aligned stream's padding).
  * Sequential state (transmittance, termination, gradient prefix) lives
    in VMEM scratch that persists across grid steps (the TPU grid is
    sequential) and resets when the owner changes.
  * Work is laid out ``[P=tile_pixels (sublanes), E (lanes)]``: per-entry
    scalars broadcast along sublanes, per-pixel coordinates along lanes —
    VPU elementwise math, with color accumulation as an MXU ``[4,E]x[E,P]``
    contraction. The transmittance recurrence runs as a log-space prefix
    sum computed on the MXU (one [P,E]x[E,E] masked-triangular matmul) —
    the MXU is near-idle here while the VPU is the bottleneck, and Mosaic
    has no native cumsum/cumprod lowering.
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
# R_GI carries the entry's gauss_idx as bitcast int32 so the backward's
# truncated-stream gather moves entries + scatter indices in ONE row
# gather instead of an extra (slow) scalar gather.
R_MX, R_MY, R_CA, R_CB, R_CC, R_R, R_G, R_B, R_OP, R_ID = range(10)
R_GI = 10
# Spare rows 11-14 (segsum gradient reduction): the source Gaussian's
# generation-stream run start (exclusive-cumsum offset), tile-rect
# min x/y, and rect span_x — bitcast i32. They ride the SAME 64-byte
# row gather as the attributes (TPU gathers are issue-rate bound per
# ROW, so 4 more used columns are free), and let the backward compute
# each entry's unique generation-stream position with pure VPU math:
# gen_pos = off + (ty - rect_y) * span_x + (tx - rect_x).
R_GOF, R_GRX, R_GRY, R_GSX = 11, 12, 13, 14
N_ROWS = 16  # padded to a full sublane tile

# Output rows per chunk/tile: rgb, invdepth, transmittance (pre-background).
# Row O_DEAD (forward only): 1.0 where the pixel is terminated at the END
# of the quantum (raw t_incl < eps or already-terminated carry) — the
# signal the backward uses to drop provably-zero-gradient quanta.
# In the backward cotangent stream the spare rows carry fused suffix
# constants: G_TOT = sum_ch g_ch*total_ch, G_TFIN = final transmittance.
O_R, O_G, O_B, O_D, O_T = range(5)
O_DEAD = 5
G_TOT, G_TFIN = 5, 6
N_OUT = 8


class PallasBlendConfig(NamedTuple):
    """Grid-step width vs alignment quantum.

    ``chunk_e`` (E) is the lane width of one grid step — 256 is the v5e
    sweet spot (per-step overhead dominates below, prefix-matmul FLOPs
    above). ``quantum`` (Q <= E, E % Q == 0) is the per-tile alignment
    unit of the entry stream: each grid step covers S = E/Q quanta whose
    tiles may differ, handled by segmented (owner-masked) prefix scans.
    Q < E cuts the aligned stream's padding (mean per-tile counts are a
    few hundred) without giving up the wide grid step.

    ``bwd_entries`` > 0 enables backward-side termination truncation: the
    forward records which quanta end with every pixel of their tile
    terminated, and the backward compacts the surviving quanta (plus the
    stream's owner=-1 padding removed) into a ``bwd_entries``-slot stream
    before running the gradient kernel + scatter. Dead quanta provably
    produce zero gradients and influence nothing downstream (termination
    is monotone per tile, so dropped quanta are always trailing and the
    compacted stream stays quantum-aligned). If survivors overflow
    ``bwd_entries`` the backward falls back to the full stream in-jit
    (lax.cond), so the optimization is lossless."""
    chunk_e: int = 256     # entries per grid step (lane dim)
    quantum: int = 128     # per-tile alignment unit
    # Backward grid-step width (0 = chunk_e). The backward's VMEM scope
    # is ~2x the forward's, so a wide forward (e.g. 1024) can pair with a
    # narrower backward; any multiple of quantum re-chunks the same
    # quantum-aligned stream with identical math.
    bwd_chunk_e: int = 0
    interpret: bool = False
    bwd_entries: int = 0   # 0 = disabled; else multiple of chunk_e
    # Transmittance recurrence implementation:
    #   "mxu"  — log(om) -> segmented triangular-matmul prefix -> exp
    #   "roll" — direct segmented cumprod via lane rolls (Hillis-Steele,
    #            log2(E) VPU steps); kills two transcendental passes and
    #            the t_excl division. Same math, better conditioned
    #            (products of om <= 1 cannot overflow; underflow below
    #            f32 tiny means the pixel terminated anyway).
    prefix_mode: str = "mxu"
    # K-slot gradient scatter (0 = plain scatter-add): see
    # scatter_entry_grads / SOL.md round-3 candidate B.
    scatter_k: int = 0
    # Post-quantum transmittance computation in the forward kernel:
    # "loop" (2 full-width passes per quantum) or "batched" (one masked
    # pass + per-quantum lane slices; bit-equal, see
    # _seg_trans_after_all — sub-128 quanta use masked [P,128] block
    # reduces instead of off-boundary lane slices).
    tafter_mode: str = "loop"
    # Entry-stream layout at the kernel boundary: False = [16, D]
    # (attributes on sublanes; XLA transposes the packed rows), True =
    # [D, 16] rows end-to-end (the pack gather's native output and the
    # gradient scatter's native input) with an in-kernel [E,16] -> [16,E]
    # transpose — trades two 2.3 ms XLA layout passes at D=2M for
    # VMEM-local transposes inside the kernels.
    rows_layout: bool = False
    # Gradient reduction entries -> Gaussians:
    #   "add"    — one [D,16]-row scatter-ADD keyed by gauss_idx. Runs at
    #              XLA scatter-add's ~13 ns/row RMW floor (20 ms at
    #              D=1.5M on v5e — the #1 single op of the training step).
    #   "segsum" — route each entry's gradient row to its UNIQUE
    #              generation-stream position with a plain scatter
    #              (~3.6 ns/row, no RMW), then reduce per-Gaussian runs
    #              (gen order is per-Gaussian contiguous) with one
    #              [D_gen,16] f32 cumsum + two [N,16] boundary gathers.
    #              Same sums up to f32 summation order (the cumsum
    #              telescopes a global prefix, so boundary differences
    #              carry O(|prefix|*eps) rounding — gated on chip like
    #              every numeric rewrite). Needs gen_tab rows in the
    #              stream (pack_rows gen_tab=...) and gen_d set.
    scatter_mode: str = "add"
    gen_d: int = 0         # generation-stream slot count (segsum)
    # Forward combine mode: False = per-quantum INCREMENTAL contributions
    # + an XLA segment-sum over quanta (the round-1..4 scheme). True =
    # the kernel accumulates same-tile prefixes in VMEM scratch and each
    # quantum's output row holds its tile's running total, so the XLA
    # combine collapses to ONE [T]-row gather at each tile's final
    # quantum (the O_T transmittance row already worked this way).
    # Same totals up to f32 summation order (sequential stream order vs
    # scatter-add order).
    fwd_accumulate: bool = False


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


def _attr4(e):
    """rgb + invdepth rows: [4, E]."""
    return jnp.concatenate([e[R_R:R_B + 1, :], e[R_ID:R_ID + 1, :]], axis=0)


class _Segments(NamedTuple):
    """Per-chunk segment geometry (S = E/Q quanta, possibly != tiles)."""
    owners: list          # S scalars: tile of each quantum (-1 unused)
    bids: list            # S scalars: owner-group id (0 = carried group)
    masks: list           # S [1,E] bool lane masks
    bid_lane: jax.Array   # [1,E] i32 group id per lane
    in_carry: jax.Array   # [1,E] bool (group 0 lanes)
    q: int                # quantum width (lanes per segment)
    all_same: jax.Array   # scalar bool: one tile spans the chunk


def _segments(owners, e_width: int, q: int, dtype):
    s = e_width // q
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e_width), 1)
    seg = lane // q
    # Group id: number of owner changes before each segment. Equal owners
    # are stream-consecutive, so equality of group id == equality of owner.
    bids = [jnp.int32(0)]
    for i in range(1, s):
        bids.append(bids[i - 1]
                    + (owners[i] != owners[i - 1]).astype(jnp.int32))
    bid_lane = jnp.zeros((1, e_width), jnp.int32)
    masks = []
    for i in range(s):
        m = seg == i
        masks.append(m)
        bid_lane = jnp.where(m, bids[i], bid_lane)
    all_same = bids[-1] == 0
    return _Segments(owners=owners, bids=bids, masks=masks,
                     bid_lane=bid_lane, in_carry=bid_lane == 0, q=q,
                     all_same=all_same)


def _seg_prefix(x, seg: _Segments):
    """Segmented inclusive prefix sum along lanes.

    Per quantum: one [P,Q]x[Q,Q] triangular MXU matmul; quanta of the
    same owner group chain through a [P,1] carry (reset when the group
    changes). MXU work is O(P*E*Q) — linear in the grid-step width E —
    instead of the O(P*E^2) a single masked [E,E] matmul costs, which is
    what made wide grid steps lose.

    Quanta finer than a 128-lane tile (q < 128) keep 128-wide MXU blocks
    — lane slices off tile boundaries are a Mosaic relayout — with the
    triangular mask intersected block-diagonally per quantum, and the
    in-block quantum chain applied via masked lane selects (2 VPU passes
    per extra sub-quantum)."""
    q = seg.q
    b = max(q, 128)                  # MXU block width (lane-tile aligned)
    spb = b // q                     # sub-quanta per block
    nb = x.shape[1] // b
    row = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    tri = row <= col
    if spb > 1:
        tri = tri & ((row // q) == (col // q))   # block-diagonal per quantum
    u = tri.astype(x.dtype)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    pieces = []
    carry = None
    for i in range(nb):
        cum_i = jax.lax.dot_general(
            x[:, i * b:(i + 1) * b], u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [P,B]
        if i > 0:
            gate = (seg.bids[i * spb]
                    == seg.bids[i * spb - 1]).astype(x.dtype)
            if spb > 1:   # carry feeds sub-quantum 0; the chain propagates
                cum_i = cum_i + jnp.where(lane_b < q, carry * gate, 0.0)
            else:
                cum_i = cum_i + carry * gate
        for j in range(1, spb):
            qi = i * spb + j
            gate = (seg.bids[qi] == seg.bids[qi - 1]).astype(x.dtype)
            last_prev = jnp.sum(
                jnp.where(lane_b == j * q - 1, cum_i, 0.0),
                axis=1, keepdims=True)                       # [P,1]
            in_j = (lane_b >= j * q) & (lane_b < (j + 1) * q)
            cum_i = cum_i + jnp.where(in_j, gate * last_prev, 0.0)
        pieces.append(cum_i)
        carry = cum_i[:, -1:]
    return pieces[0] if nb == 1 else jnp.concatenate(pieces, axis=1)


def _lane_roll(x, k: int):
    """Shift lanes right by k (lane i reads lane i-k; wraparound is
    masked by callers). jnp.roll lowers to the same Mosaic roll op."""
    return jnp.roll(x, k, axis=1)


def _seg_cumprod(om, seg: _Segments):
    """Segmented inclusive cumprod along lanes (Hillis-Steele).

    Group ids are monotone non-decreasing along the stream, so
    bid[i] == bid[i-k] guarantees every lane between belongs to the same
    segment — the standard sufficient merge condition for segmented scans
    over contiguous runs."""
    e_width = om.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e_width), 1)
    x = om
    bid = seg.bid_lane
    k = 1
    while k < e_width:
        valid = (lane >= k) & (bid == _lane_roll(bid, k))
        x = x * jnp.where(valid, _lane_roll(x, k), 1.0)
        k *= 2
    return x


def _seg_shift_fill1(x, seg: _Segments):
    """Shift right one lane within each segment; segment-first lanes
    get 1.0 (exclusive-from-inclusive cumprod)."""
    e_width = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e_width), 1)
    first = (lane == 0) | (seg.bid_lane != _lane_roll(seg.bid_lane, 1))
    return jnp.where(first, 1.0, _lane_roll(x, 1))


def _seg_recurrence(e, seg: _Segments, trans, term, tiles_x: int,
                    tile: int, p: int, prefix_mode: str = "mxu"):
    """Segmented transmittance recurrence for one chunk.

    Groups of equal-owner quanta share one running transmittance; the
    segmented prefix (_seg_prefix) stops log-accumulation at group
    boundaries, and the carried state only feeds group 0."""
    # Pixel coordinates as [1,E] tile origins + [P,1] in-tile offsets:
    # building px/py with S full [P,E] wheres cost 2S VPU passes per
    # chunk; the [1,E] selects are ~free and the broadcast add is exact
    # (tile origins and offsets are small integers in f32), so px/py are
    # bit-identical to the old per-segment construction.
    ew = e.shape[1]
    x0 = jnp.zeros((1, ew), e.dtype)
    y0 = jnp.zeros((1, ew), e.dtype)
    for i, m in enumerate(seg.masks):
        ty = (seg.owners[i] // tiles_x).astype(e.dtype)
        tx = (seg.owners[i] % tiles_x).astype(e.dtype)
        x0 = jnp.where(m, tx * tile, x0)
        y0 = jnp.where(m, ty * tile, y0)
    pid = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    lx = (pid % tile).astype(e.dtype)
    ly = (pid // tile).astype(e.dtype)
    px = x0 + lx                                         # [P,E]
    py = y0 + ly
    alpha, ok, om, dx, dy, alpha_raw = _alpha_terms(e, px, py)
    t_carry = trans[:, 0:1]                              # [P,1]
    term_carry = term[:, 0:1]
    t_base = jnp.where(seg.in_carry, t_carry, 1.0)       # [P,E]
    term_base = jnp.where(seg.in_carry, term_carry, 0.0)
    if prefix_mode == "roll":
        incl = _seg_cumprod(om, seg)
        t_incl = t_base * incl
        t_excl = t_base * _seg_shift_fill1(incl, seg)
    else:
        cum = _seg_prefix(jnp.log(om), seg)
        t_incl = t_base * jnp.exp(cum)
        t_excl = t_incl / om                             # om >= 0.01
    live = (term_base == 0.0) & (t_incl >= TRANSMITTANCE_EPS)
    contrib = jnp.where(live, alpha * t_excl, 0.0)       # [P,E]
    return (alpha, ok, dx, dy, alpha_raw, t_excl, live, contrib,
            t_incl, t_carry, term_carry)


def _seg_trans_after(seg: _Segments, i: int, q: int, live, t_incl,
                     t_carry):
    """Transmittance after quantum i for its tile: masked min of the
    non-increasing t_incl over that group's lanes up to the quantum end."""
    e_width = t_incl.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, e_width), 1)
    sel = live & (lane < (i + 1) * q) & (seg.bid_lane == seg.bids[i])
    default = jnp.where(seg.bids[i] == 0, t_carry,
                        jnp.ones_like(t_carry))
    return jnp.min(jnp.where(sel, t_incl, default), axis=1, keepdims=True)


def _seg_trans_after_all(seg: _Segments, live, t_incl, t_carry):
    """Every quantum's post-quantum transmittance in ONE masked [P,E]
    pass + per-quantum lane slices, instead of 2 full-width passes per
    quantum (_seg_trans_after). Bit-equal by construction: min is exact,
    +inf is its identity, and the loop version's selected lane set
    {live & lane < (i+1)q & same group} decomposes into whole quanta —
    its min equals min(default, running same-group min of per-quantum
    live-mins). The default participates unconditionally in both forms
    (the loop's where() places it on every unselected lane).

    Sub-128 quanta (q < 128): lane slices off tile boundaries are a
    Mosaic relayout, so each 128-lane block is sliced once and its spb
    sub-quantum mins come from masked [P,128] reduces — S passes of
    [P,128] instead of the loop's 2S full-width [P,E] passes (the
    overhead that made Q=64 lose its padding win, SOL.md round-4
    fact 9)."""
    q = seg.q
    s = t_incl.shape[1] // q
    w = jnp.where(live, t_incl, jnp.inf)
    if q >= 128:
        mins = [jnp.min(w[:, i * q:(i + 1) * q], axis=1, keepdims=True)
                for i in range(s)]
    else:
        b = 128
        spb = b // q
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        mins = []
        for blk in range(t_incl.shape[1] // b):
            wb = w[:, blk * b:(blk + 1) * b]
            for j in range(spb):
                in_j = (lane_b >= j * q) & (lane_b < (j + 1) * q)
                mins.append(jnp.min(jnp.where(in_j, wb, jnp.inf),
                                    axis=1, keepdims=True))
    outs = []
    run = mins[0]
    for i in range(s):
        if i > 0:
            same = seg.bids[i] == seg.bids[i - 1]
            run = jnp.minimum(mins[i],
                              jnp.where(same, run, jnp.inf))
        default = jnp.where(seg.bids[i] == 0, t_carry,
                            jnp.ones_like(t_carry))
        outs.append(jnp.minimum(default, run))
    return outs


def _seg_new_term(seg: _Segments, term_carry, t_incl):
    """Termination carry for the final quantum's tile."""
    last_base = jnp.where(seg.bids[-1] == 0, term_carry,
                          jnp.zeros_like(term_carry))
    return jnp.maximum(
        last_base,
        (t_incl[:, -1:] < TRANSMITTANCE_EPS).astype(jnp.float32))


def _chunk_owners(owner_ref, c, s: int):
    owners = [owner_ref[s * c + i] for i in range(s)]
    prev = owner_ref[jnp.maximum(s * c - 1, 0)]
    first = jnp.logical_or(c == 0, owners[0] != prev)
    return owners, first


def _fwd_kernel(owner_ref, entries_ref, out_ref, trans, term, acc,
                *, tiles_x: int, tile: int, p: int, q: int, s: int,
                emit_dead: bool = True, prefix_mode: str = "mxu",
                tafter_mode: str = "loop", rows_layout: bool = False,
                accumulate: bool = False):
    c = pl.program_id(0)
    owners, first = _chunk_owners(owner_ref, c, s)

    @pl.when(first)
    def _():
        trans[:] = jnp.ones_like(trans)
        term[:] = jnp.zeros_like(term)
        if accumulate:
            acc[:] = jnp.zeros_like(acc)

    if not accumulate:
        for i in range(s):
            out_ref[i, O_R:O_D + 1, :] = jnp.zeros((4, p), jnp.float32)
            out_ref[i, O_T + 1:, :] = jnp.zeros((N_OUT - O_T - 1, p),
                                                jnp.float32)
    else:
        for i in range(s):
            out_ref[i, O_T + 1:, :] = jnp.zeros((N_OUT - O_T - 1, p),
                                                jnp.float32)

    e = entries_ref[:].T if rows_layout else entries_ref[:]  # [16,E]
    seg = _segments(owners, e.shape[1], q, e.dtype)

    # Skip compute for unused chunks and for single-tile chunks whose
    # every pixel already terminated (the CUDA early-out). A chunk that
    # starts a new tile mid-stream must still run.
    saturated = (jnp.logical_not(first) & seg.all_same
                 & (jnp.min(term[:, 0:1]) > 0.0))
    compute = jnp.logical_and(owners[0] >= 0, jnp.logical_not(saturated))

    @pl.when(compute)
    def _():
        (_alpha, _ok, _dx, _dy, _raw, _t_excl, live, contrib,
         t_incl, t_carry, term_carry) = _seg_recurrence(
            e, seg, trans, term, tiles_x, tile, p,
            prefix_mode=prefix_mode)
        # One [4S,E] x [E,P] matmul instead of S [4,E] x [E,P]: the MXU's
        # M dimension goes from 4 used rows to 4S (masks are 0/1 on the
        # contraction axis, so slab i equals the per-quantum product
        # exactly). S small => the concatenate is trivial VPU work.
        a4 = _attr4(e)
        a_big = jnp.concatenate(
            [a4 * seg.masks[i].astype(e.dtype) for i in range(s)], axis=0)
        outs = jax.lax.dot_general(
            a_big, contrib, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [4S, P]
        if tafter_mode == "batched":
            t_afters = _seg_trans_after_all(seg, live, t_incl, t_carry)
        else:
            t_afters = [_seg_trans_after(seg, i, q, live, t_incl, t_carry)
                        for i in range(s)]
        if accumulate:
            # Running same-tile totals: quantum i's output row holds its
            # tile's accumulated rgb+invd so far (carry rides the acc
            # scratch across chunks; reset on owner change). The combine
            # then just gathers each tile's final quantum row.
            running = None
        for i in range(s):
            if accumulate:
                contrib_i = outs[4 * i:4 * i + 4]
                if i == 0:
                    base = jnp.where(seg.bids[0] == 0, acc[0:4, :],
                                     jnp.zeros((4, p), jnp.float32))
                else:
                    base = jnp.where(seg.bids[i] == seg.bids[i - 1],
                                     running,
                                     jnp.zeros((4, p), jnp.float32))
                running = base + contrib_i
                out_ref[i, O_R:O_D + 1, :] = running
            else:
                out_ref[i, O_R:O_D + 1, :] = outs[4 * i:4 * i + 4]
            out_ref[i, O_T, :] = t_afters[i][:, 0]
            if emit_dead:
                # Dead-at-quantum-end flag: raw t_incl at the quantum's
                # last lane mirrors _seg_new_term's cross-chunk
                # termination test, so "dead here" == "no live lane of
                # this tile ever again". Skipped for forward-only
                # rendering (cfg.bwd_entries == 0).
                term_base_i = jnp.where(seg.bids[i] == 0, term_carry,
                                        jnp.zeros_like(term_carry))
                if q >= 128:
                    t_end_i = t_incl[:, (i + 1) * q - 1:(i + 1) * q]
                else:
                    # Off-tile-boundary single-lane slices are a Mosaic
                    # relayout; a masked reduce over the lane's 128-lane
                    # BLOCK (a boundary slice) reads the same element at
                    # 1/(E/128) the VPU work of a full-width pass.
                    last = (i + 1) * q - 1
                    blk = last // 128
                    tb = t_incl[:, blk * 128:(blk + 1) * 128]
                    lane_b = jax.lax.broadcasted_iota(
                        jnp.int32, (1, 128), 1)
                    t_end_i = jnp.sum(
                        jnp.where(lane_b == last % 128, tb, 0.0),
                        axis=1, keepdims=True)
                dead_i = jnp.maximum(
                    term_base_i,
                    (t_end_i < TRANSMITTANCE_EPS).astype(jnp.float32))
                out_ref[i, O_DEAD, :] = dead_i[:, 0]
        trans[:, 0:1] = t_afters[s - 1]
        term[:, 0:1] = _seg_new_term(seg, term_carry, t_incl)
        if accumulate:
            acc[0:4, :] = running

    @pl.when(jnp.logical_not(compute))
    def _():
        for i in range(s):
            out_ref[i, O_T, :] = trans[:, 0]
            if accumulate:
                # Saturated/unused chunks contribute nothing, but a
                # saturated tile's FINAL quantum may live here — its row
                # must still hold the tile's accumulated total.
                out_ref[i, O_R:O_D + 1, :] = acc[0:4, :]
            if emit_dead:
                # Skipped chunks (saturated single-tile, or unused):
                # every pixel's termination state is the carried flag.
                out_ref[i, O_DEAD, :] = term[:, 0]


def _bwd_kernel(owner_ref, entries_ref, grads_ref, dentries_ref,
                trans, term, pre, *, tiles_x: int, tile: int, p: int,
                q: int, s: int, prefix_mode: str = "mxu",
                rows_layout: bool = False):
    """Per-entry gradients.

    grads_ref: [S, N_OUT, P] per-quantum gathered cotangents — rows 0-3
    color + invdepth, row O_T transmittance, and the two spare rows carry
    the fused suffix constants (row G_TOT = g·total, row G_TFIN = t_fin)
    so one gather feeds the kernel. pre: [8, P] scratch — row 0 carries
    the fused gradient prefix of the carried tile.
    """
    c = pl.program_id(0)
    owners, first = _chunk_owners(owner_ref, c, s)

    @pl.when(first)
    def _():
        trans[:] = jnp.ones_like(trans)
        term[:] = jnp.zeros_like(term)
        pre[:] = jnp.zeros_like(pre)

    dentries_ref[:] = jnp.zeros_like(dentries_ref)

    e = entries_ref[:].T if rows_layout else entries_ref[:]
    seg = _segments(owners, e.shape[1], q, e.dtype)
    saturated = (jnp.logical_not(first) & seg.all_same
                 & (jnp.min(term[:, 0:1]) > 0.0))
    compute = jnp.logical_and(owners[0] >= 0, jnp.logical_not(saturated))

    @pl.when(compute)
    def _():
        (alpha, ok, dx, dy, alpha_raw, t_excl, live, contrib,
         t_incl, t_carry, term_carry) = _seg_recurrence(
            e, seg, trans, term, tiles_x, tile, p,
            prefix_mode=prefix_mode)

        attr = _attr4(e)                                     # [4,E]
        masks_f = [seg.masks[i].astype(e.dtype) for i in range(s)]

        def lane_blocked(row):
            """[P,E] whose lanes carry quantum i's [P,1] column ``row(i)``
            on quantum i's lane block — one concatenate instead of S
            full-width where passes (bit-identical: pure placement).
            Sub-128 quanta build each 128-lane block with masked selects
            (concats off lane-tile boundaries are a Mosaic relayout)."""
            if s == 1:
                return jnp.broadcast_to(row(0), (p, q))
            b = max(q, 128)
            spb = b // q
            nb = (s * q) // b
            lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
            blocks = []
            for i in range(nb):
                acc = jnp.broadcast_to(row(i * spb), (p, b))
                for j in range(1, spb):
                    acc = jnp.where(lane_b >= j * q,
                                    jnp.broadcast_to(row(i * spb + j),
                                                     (p, b)), acc)
                blocks.append(acc)
            return blocks[0] if nb == 1 else jnp.concatenate(blocks,
                                                             axis=1)

        g_tot = lane_blocked(lambda i: grads_ref[i][G_TOT:G_TOT + 1, :].T)
        t_fin = lane_blocked(lambda i: grads_ref[i][G_TFIN:G_TFIN + 1, :].T)
        g_t = lane_blocked(lambda i: grads_ref[i][O_T:O_T + 1, :].T)
        # Batched MXU work (see the forward): stack the S quanta's
        # cotangent rows into one [4S,P] operand.
        g_big = jnp.concatenate(
            [grads_ref[i][O_R:O_D + 1, :] for i in range(s)], axis=0)
        # d rgb / d invd: one [4S,P] x [P,E] contraction; quantum i's
        # slab is valid only on its own columns (masks disjoint per
        # column), so the masked slab-sum assembles the full [4,E].
        gc = jax.lax.dot_general(
            g_big, contrib, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [4S, E]
        d_attr = sum(gc[4 * i:4 * i + 4] * masks_f[i] for i in range(s))
        # Fused suffix: ga = sum_ch g_ch * a_ch per lane with the lane's
        # own tile's cotangents — one [P,4S] x [4S,E] matmul (the masked
        # attr slabs pick quantum i's cotangents for its columns).
        a_masked = jnp.concatenate(
            [attr * masks_f[i] for i in range(s)], axis=0)   # [4S, E]
        ga = jax.lax.dot_general(
            g_big, a_masked, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [P, E]
        if not rows_layout:
            # Write the attribute-gradient rows immediately (before the
            # prefix machinery) — delaying them extends dx/dy/d_attr live
            # ranges past Mosaic's 16M scoped-VMEM stack at bwd width 512
            # (observed 17.6M on chip).
            dentries_ref[R_R:R_B + 1, :] = d_attr[0:3, :]
            dentries_ref[R_ID:R_ID + 1, :] = d_attr[3:4, :]

        qv = contrib * ga
        pre_base = jnp.where(seg.in_carry, pre[0:1, :].T, 0.0)
        prefix = pre_base + _seg_prefix(qv, seg)             # [P,E]
        inv_om = 1.0 / jnp.maximum(1.0 - alpha, 1e-12)
        d_alpha = (t_excl * ga - (g_tot - prefix) * inv_om
                   + g_t * (-t_fin * inv_om))
        # Carry the gradient prefix of the FINAL quantum's tile.
        last_sel = seg.bid_lane == seg.bids[-1]
        tail = jnp.sum(jnp.where(last_sel, qv, 0.0), axis=1)[None, :]
        keep = jnp.where(seg.bids[-1] == 0, pre[0:1, :],
                         jnp.zeros_like(pre[0:1, :]))
        pre[0:1, :] = keep + tail

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
        if rows_layout:
            # One assembled [16,E] store, transposed to rows. Row order
            # == R_* indices.
            out16 = jnp.concatenate([
                rowsum(d_power * (ca * dx + cb * dy)),        # R_MX
                rowsum(d_power * (cc * dy + cb * dx)),        # R_MY
                rowsum(d_power * (-0.5 * dx * dx)),           # R_CA
                rowsum(d_power * (-dx * dy)),                 # R_CB
                rowsum(d_power * (-0.5 * dy * dy)),           # R_CC
                d_attr[0:3, :],                               # R_R..R_B
                rowsum(d_opac),                               # R_OP
                d_attr[3:4, :],                               # R_ID
                jnp.zeros((N_ROWS - R_ID - 1, e.shape[1]),
                          jnp.float32),
            ], axis=0)
            dentries_ref[:] = out16.T
        else:
            # Incremental row writes keep the Mosaic live set small
            # (d_attr rows were already stored above).
            dentries_ref[R_OP:R_OP + 1, :] = rowsum(d_opac)
            dentries_ref[R_CA:R_CA + 1, :] = rowsum(
                d_power * (-0.5 * dx * dx))
            dentries_ref[R_CB:R_CB + 1, :] = rowsum(d_power * (-dx * dy))
            dentries_ref[R_CC:R_CC + 1, :] = rowsum(
                d_power * (-0.5 * dy * dy))
            dentries_ref[R_MX:R_MX + 1, :] = rowsum(
                d_power * (ca * dx + cb * dy))
            dentries_ref[R_MY:R_MY + 1, :] = rowsum(
                d_power * (cc * dy + cb * dx))

        trans[:, 0:1] = _seg_trans_after(seg, s - 1, q, live, t_incl,
                                         t_carry)
        term[:, 0:1] = _seg_new_term(seg, term_carry, t_incl)


def pallas_blend_fwd(packed, owner, *, tiles_x: int, tile: int,
                     cfg: PallasBlendConfig):
    """Per-quantum incremental contributions: [n_quanta, N_OUT, P].

    ``owner`` is per *quantum* ([D / cfg.quantum]); each grid step covers
    S = chunk_e/quantum quanta.
    """
    p = tile * tile
    e = cfg.chunk_e
    q = cfg.quantum
    s = e // q
    d = packed.shape[0] if cfg.rows_layout else packed.shape[1]
    n_chunks = d // e
    n_quanta = d // q
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x, tile=tile,
                               p=p, q=q, s=s,
                               emit_dead=cfg.bwd_entries > 0,
                               prefix_mode=cfg.prefix_mode,
                               tafter_mode=cfg.tafter_mode,
                               rows_layout=cfg.rows_layout,
                               accumulate=cfg.fwd_accumulate)
    if cfg.rows_layout:
        entry_spec = pl.BlockSpec((e, N_ROWS), lambda c, o: (c, 0),
                                  memory_space=pltpu.VMEM)
    else:
        entry_spec = pl.BlockSpec((N_ROWS, e), lambda c, o: (0, c),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[entry_spec],
            out_specs=pl.BlockSpec((s, N_OUT, p), lambda c, o: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((p, 8), jnp.float32),     # trans (col 0)
                pltpu.VMEM((p, 8), jnp.float32),     # term (col 0)
                pltpu.VMEM((8, p), jnp.float32),     # acc (accumulate)
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_quanta, N_OUT, p), jnp.float32),
        interpret=cfg.interpret,
    )(owner, packed)


def pallas_blend_bwd(packed, owner, grads_quanta, *,
                     tiles_x: int, tile: int, cfg: PallasBlendConfig):
    """Per-entry gradient stream [16, D] from per-quantum cotangents."""
    p = tile * tile
    e = cfg.bwd_chunk_e or cfg.chunk_e
    q = cfg.quantum
    s = e // q
    d = packed.shape[0] if cfg.rows_layout else packed.shape[1]
    n_chunks = d // e
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x, tile=tile,
                               p=p, q=q, s=s,
                               prefix_mode=cfg.prefix_mode,
                               rows_layout=cfg.rows_layout)
    quanta_spec = pl.BlockSpec((s, N_OUT, p), lambda c, o: (c, 0, 0),
                               memory_space=pltpu.VMEM)
    if cfg.rows_layout:
        entry_spec = pl.BlockSpec((e, N_ROWS), lambda c, o: (c, 0),
                                  memory_space=pltpu.VMEM)
    else:
        entry_spec = pl.BlockSpec((N_ROWS, e), lambda c, o: (0, c),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[entry_spec, quanta_spec],
            out_specs=entry_spec,
            scratch_shapes=[
                pltpu.VMEM((p, 8), jnp.float32),
                pltpu.VMEM((p, 8), jnp.float32),
                pltpu.VMEM((8, p), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        interpret=cfg.interpret,
    )(owner, packed, grads_quanta)


def bwd_keep_mask(owner, q_dead):
    """Backward-surviving quanta: (keep [Qn] bool, n_keep [] int32).

    A quantum is droppable iff the previous quantum of the SAME tile ended
    with every pixel terminated (all its lanes then have live=False =>
    zero gradients and no effect on carried state), or it is stream
    padding (owner -1). Termination is monotone per tile, so survivors
    stay consecutive and quantum-aligned."""
    same_prev = jnp.concatenate([jnp.zeros((1,), bool),
                                 owner[1:] == owner[:-1]])
    dead_prev = jnp.concatenate(
        [jnp.zeros((1,), q_dead.dtype), q_dead[:-1]]) > 0.5
    keep = (owner >= 0) & ~(same_prev & dead_prev)
    return keep, jnp.sum(keep.astype(jnp.int32))


def _attr_table(means2d, conic, rgb, opacity, inv_depth,
                gen_tab=None) -> jax.Array:
    """Per-Gaussian [N, 16] attribute matrix (pack_rows' gather source).

    ``gen_tab`` ([N, >=4] i32: gen-stream offset, rect_min_x, rect_min_y,
    span_x — ops/binning) rides bitcast in rows R_GOF..R_GSX for the
    segsum gradient reduction."""
    n = means2d.shape[0]
    attr = jnp.zeros((n, N_ROWS), jnp.float32)
    attr = attr.at[:, R_MX].set(means2d[:, 0])
    attr = attr.at[:, R_MY].set(means2d[:, 1])
    attr = attr.at[:, R_CA:R_CC + 1].set(conic)
    attr = attr.at[:, R_R:R_B + 1].set(rgb)
    attr = attr.at[:, R_OP].set(opacity)
    attr = attr.at[:, R_ID].set(inv_depth)
    if gen_tab is not None:
        attr = attr.at[:, R_GOF:R_GSX + 1].set(
            jax.lax.bitcast_convert_type(
                gen_tab[:, :4].astype(jnp.int32), jnp.float32))
    return attr


def pack_rows(means2d, conic, rgb, opacity, inv_depth, gauss_idx,
              perm=None, gen_tab=None) -> jax.Array:
    """Gather per-entry attributes into packed [D, 16] rows.

    One [N+1,16] attribute matrix -> one contiguous row gather: the gather
    moves 64-byte rows (fast) instead of 10 scalar gathers. Padding slots
    (gauss_idx < 0) read the all-zero sentinel row N, and row R_GI (the
    entry's gauss_idx bitcast to f32) lands via ONE fused column-select
    pass — on v5e the .at[:, col].set / where(valid) formulation cost an
    extra ~11 ms at D=2M (XLA materialized full [D,16] copies).

    ``perm`` (rank-key binning, ops/binning): gauss_idx is in depth-RANK
    space and perm maps rank -> original id; one extra [N,16] row permute
    re-keys the table so the D-gather stays a single hop.
    """
    attr = _attr_table(means2d, conic, rgb, opacity, inv_depth, gen_tab)
    if perm is not None:
        attr = attr[perm]
    n = attr.shape[0]
    attr = jnp.concatenate([attr, jnp.zeros((1, N_ROWS), jnp.float32)])
    safe = jnp.where(gauss_idx >= 0, gauss_idx, n)
    rows = attr[safe]                                      # [D, 16]
    gi_col = (jax.lax.broadcasted_iota(jnp.int32, (1, N_ROWS), 1) == R_GI)
    bits = jax.lax.bitcast_convert_type(
        gauss_idx.astype(jnp.int32), jnp.float32)
    return jnp.where(gi_col, bits[:, None], rows)


def pack_entries(means2d, conic, rgb, opacity, inv_depth,
                 gauss_idx, perm=None, gen_tab=None) -> jax.Array:
    """Packed [16, D] stream (pack_rows transposed; kernel layout)."""
    return pack_rows(means2d, conic, rgb, opacity, inv_depth, gauss_idx,
                     perm, gen_tab).T


def segsum_entry_grads(dentries, stream, owner, gauss_idx, n: int,
                       gen_off, gen_counts, gen_d: int, quantum: int,
                       tiles_x: int, rows_layout: bool = False):
    """Per-Gaussian gradient sums WITHOUT scatter-add RMW.

    Every entry of the sorted/aligned stream originates from a unique slot
    of the *generation* stream (binning enumerates each Gaussian's tile
    rect contiguously: run start ``gen_off[g]``, row-major rect index
    within). The reduction therefore decomposes into
      1. ONE plain [D,16]-row scatter (unique destinations, no RMW) of
         the gradient rows into gen order,
      2. ONE [gen_d,16] f32 cumsum along the stream,
      3. per-Gaussian run sums as boundary differences — two [N,16] row
         gathers.
    Entries the pipeline dropped (lossless tile cull, per-tile caps,
    budget overflow, bwd truncation padding) simply leave their gen slot
    zero — exactly the zero gradient the "add" path gives them.

    The entry's rect coordinates ride the stream's spare rows
    (R_GOF..R_GSX, see pack_rows) so this needs no extra gather; its tile
    comes from repeating the per-quantum ``owner``. Summation order
    differs from scatter-add by f32 rounding only (cumsum boundary
    differences carry O(|global prefix| * eps) noise — the on-chip gate
    in scripts/ab_segsum.py bounds it).
    """
    rows = dentries if rows_layout else dentries.T           # [D, 16]
    srows = stream if rows_layout else stream.T              # [D, 16]
    d = rows.shape[0]

    def ibits(col):
        return jax.lax.bitcast_convert_type(srows[:, col], jnp.int32)

    off = ibits(R_GOF)
    rmx = ibits(R_GRX)
    rmy = ibits(R_GRY)
    spx = ibits(R_GSX)
    tile_e = jnp.repeat(owner, quantum, total_repeat_length=d)
    tx = jnp.where(tile_e >= 0, tile_e % tiles_x, 0)
    ty = jnp.where(tile_e >= 0, tile_e // tiles_x, 0)
    gen_pos = off + (ty - rmy) * jnp.maximum(spx, 1) + (tx - rmx)
    ok = (gauss_idx >= 0) & (tile_e >= 0) & (gen_pos >= 0) & \
        (gen_pos < gen_d)
    dst = jnp.where(ok, gen_pos, gen_d)
    acc = jnp.zeros((gen_d + 1, N_ROWS), jnp.float32).at[dst].set(
        rows, mode="drop", unique_indices=True)[:gen_d]
    c = jnp.cumsum(acc, axis=0)
    ends = jnp.clip(gen_off + gen_counts - 1, 0, gen_d - 1)
    starts = jnp.clip(gen_off, 0, gen_d - 1)
    hi = c[ends]
    lo = jnp.where((gen_off > 0)[:, None], c[jnp.maximum(starts - 1, 0)],
                   0.0)
    acc_n = jnp.where((gen_counts > 0)[:, None], hi - lo, 0.0)   # [N,16]
    d_means2d = acc_n[:, R_MX:R_MY + 1]
    d_conic = acc_n[:, R_CA:R_CC + 1]
    d_rgb = acc_n[:, R_R:R_B + 1]
    d_opac = acc_n[:, R_OP]
    d_invd = acc_n[:, R_ID]
    return d_means2d, d_conic, d_rgb, d_opac, d_invd


def scatter_entry_grads(dentries, gauss_idx, n: int, k_slots: int = 0,
                        rank=None, rows_layout: bool = False):
    """Scatter-add per-entry gradients back to per-Gaussian arrays.

    One [D,16]-row scatter-add (contiguous 64-byte updates) instead of ten
    scalar scatters. ``k_slots`` > 0 spreads each Gaussian's updates over
    K destinations (dst = gauss*K + stream_pos%K) followed by a dense
    [N,K,16] reduction — same result under add semantics, but with ~K-fold
    fewer conflicts per address, probing whether XLA scatter-add's cost
    over the plain-scatter floor is RMW serialization (SOL.md candidate B).

    ``rank`` (rank-key binning): gauss_idx is in depth-rank space; the
    accumulated [N,16] is re-keyed to original order with one row gather
    (orig g lives at rank[g]).
    """
    safe = jnp.where(gauss_idx >= 0, gauss_idx, n)
    rows = dentries if rows_layout else dentries.T         # [D, 16]
    if k_slots:
        k = k_slots
        pos = jnp.arange(rows.shape[0], dtype=jnp.int32)
        dst = safe * k + pos % k
        acc = jnp.zeros(((n + 1) * k, N_ROWS), jnp.float32).at[dst].add(
            rows, mode="drop")
        acc = jnp.sum(acc.reshape(n + 1, k, N_ROWS), axis=1)[:n]
    else:
        acc = jnp.zeros((n + 1, N_ROWS), jnp.float32).at[safe].add(
            rows, mode="drop")[:n]
    if rank is not None:
        acc = acc[rank]
    d_means2d = acc[:, R_MX:R_MY + 1]
    d_conic = acc[:, R_CA:R_CC + 1]
    d_rgb = acc[:, R_R:R_B + 1]
    d_opac = acc[:, R_OP]
    d_invd = acc[:, R_ID]
    return d_means2d, d_conic, d_rgb, d_opac, d_invd


# --------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def blend_entries(means2d, conic, rgb, opacity, inv_depth, owner, gauss_idx,
                  last_chunk, perm, rank, gen_tab, n_tiles: int,
                  tiles_x: int, tile: int, cfg: PallasBlendConfig):
    """Differentiable tile blend: per-Gaussian screen-space attributes ->
    (per-tile [n_tiles, 8, P] (rgb, invdepth, transmittance;
    pre-background), n_bwd_quanta [] int32).

    ``n_bwd_quanta`` is the number of quanta the backward's termination
    truncation must keep (-1 when cfg.bwd_entries == 0 and the forward
    skips the deadness bookkeeping). The trainer/bench size
    ``bwd_entries`` from a probe of this count — a blind budget that
    undershoots it makes the backward fall back to the full stream every
    step while still paying the compaction.

    ``last_chunk``: [n_tiles] int32 index of each tile's final chunk
    (-1 = tile has no entries). ``perm``/``rank``: rank-key binning
    permutations (both None when gauss_idx holds original ids).
    ``gen_tab``: [N, >=5] i32 generation-stream geometry (offset,
    rect_min_x, rect_min_y, span_x, counts; original Gaussian order) —
    required when cfg.scatter_mode == "segsum", None otherwise.
    """
    out, _ = _blend_fwd(means2d, conic, rgb, opacity, inv_depth, owner,
                        gauss_idx, last_chunk, perm, rank, gen_tab,
                        n_tiles, tiles_x, tile, cfg)
    return out


def _combine_chunks(chunk_out, owner, last_chunk, n_tiles,
                    accumulated: bool = False):
    """Chunk/quantum contributions -> per-tile totals + final trans.

    ``accumulated``: the kernel already holds running same-tile totals in
    every quantum row (cfg.fwd_accumulate), so the whole combine is ONE
    [T]-row gather at each tile's final quantum — no scatter-add."""
    has = last_chunk >= 0
    if accumulated:
        rows = chunk_out[jnp.maximum(last_chunk, 0)]        # [T, 8, P]
        tiles = jnp.where(has[:, None, None], rows, 0.0)
        trans = jnp.where(has[:, None], rows[:, O_T, :], 1.0)
        return tiles.at[:, O_T, :].set(trans)
    safe_owner = jnp.where(owner >= 0, owner, n_tiles)
    tiles = jnp.zeros((n_tiles + 1,) + chunk_out.shape[1:],
                      chunk_out.dtype).at[safe_owner].add(chunk_out,
                                                          mode="drop")
    tiles = tiles[:n_tiles]
    trans = jnp.where(
        has[:, None],
        chunk_out[jnp.maximum(last_chunk, 0), O_T, :], 1.0)
    tiles = tiles.at[:, O_T, :].set(trans)
    return tiles


def _blend_fwd(means2d, conic, rgb, opacity, inv_depth, owner, gauss_idx,
               last_chunk, perm, rank, gen_tab, n_tiles, tiles_x, tile,
               cfg):
    segsum = cfg.scatter_mode == "segsum"
    if segsum and (gen_tab is None or not cfg.gen_d):
        raise ValueError(
            "scatter_mode='segsum' needs gen_tab rows and cfg.gen_d "
            "(binning want_gen_tab=True)")
    rows = pack_rows(means2d, conic, rgb, opacity, inv_depth, gauss_idx,
                     perm, gen_tab if segsum else None)
    chunk_out = pallas_blend_fwd(rows if cfg.rows_layout else rows.T,
                                 owner, tiles_x=tiles_x, tile=tile,
                                 cfg=cfg)
    # Defensive (axon backend): keep XLA from fusing the segment-sum into
    # the pallas output — one observed miscompile produced black tile runs
    # for a specific fused executable (bit-identical per compile, absent
    # un-jitted and in interpret mode).
    chunk_out = jax.lax.optimization_barrier(chunk_out)
    out = _combine_chunks(chunk_out, owner, last_chunk, n_tiles,
                          accumulated=cfg.fwd_accumulate)
    if cfg.bwd_entries:
        # All-pixel deadness per quantum; residual keeps the [D,16] rows
        # so the compaction gather moves contiguous 64-byte rows.
        q_dead = jnp.min(chunk_out[:, O_DEAD, :], axis=1)
        stream = rows
        _, n_bwd = bwd_keep_mask(owner, q_dead)
    else:
        q_dead = None
        # Kernel layout, reused directly by the bwd (rows mode: no
        # transpose exists anywhere on the path).
        stream = rows if cfg.rows_layout else rows.T
        n_bwd = jnp.full((), -1, jnp.int32)
    return (out, n_bwd), (stream, owner, gauss_idx, out, q_dead,
                          means2d.shape[0], rank, gen_tab)


def _blend_bwd(n_tiles, tiles_x, tile, cfg, res, g):
    stream, owner, gauss_idx, out, q_dead, n, rank, gen_tab = res
    g = jnp.asarray(g[0], jnp.float32)  # g[1]: int32 count, float0 cotangent
    # Fused suffix constants ride the spare cotangent rows, so the kernel
    # needs a single per-chunk gather.
    g_tot = jnp.sum(g[:, O_R:O_D + 1, :] * out[:, O_R:O_D + 1, :], axis=1)
    g = g.at[:, G_TOT, :].set(g_tot).at[:, G_TFIN, :].set(out[:, O_T, :])

    def run(packed, own, gidx):
        grads_chunks = g[jnp.maximum(own, 0)]                # [C, 8, P]
        dentries = pallas_blend_bwd(packed, own, grads_chunks,
                                    tiles_x=tiles_x, tile=tile, cfg=cfg)
        if cfg.scatter_mode == "segsum":
            return segsum_entry_grads(
                dentries, packed, own, gidx, n, gen_tab[:, 0],
                gen_tab[:, 4], cfg.gen_d, cfg.quantum, tiles_x,
                rows_layout=cfg.rows_layout)
        return scatter_entry_grads(dentries, gidx, n,
                                   k_slots=cfg.scatter_k, rank=rank,
                                   rows_layout=cfg.rows_layout)

    d_stream = stream.shape[0] if cfg.bwd_entries else None
    if not cfg.bwd_entries:
        grads = run(stream, owner, gauss_idx)
    elif cfg.bwd_entries >= d_stream:
        # Tracking-only mode: the forward's deadness bookkeeping (and the
        # n_bwd_quanta report) stays on, but a full-size truncation budget
        # cannot save anything — skip the compaction gather/re-pack and
        # run the full stream directly. This makes survivor tracking free
        # for the adaptive trainer.
        grads = run(stream if cfg.rows_layout else stream.T,
                    owner, gauss_idx)
    else:
        rows = stream                                        # [D, 16]
        qw = cfg.quantum
        qn = owner.shape[0]
        d_t = cfg.bwd_entries
        n_q_t = d_t // qw
        keep, n_keep = bwd_keep_mask(owner, q_dead)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1         # dst quantum

        def trunc_path(operands):
            rows, owner, gauss_idx = operands
            dst = jnp.where(keep & (pos < n_q_t), pos, n_q_t)
            src_q = jnp.zeros((n_q_t + 1,), jnp.int32).at[dst].set(
                jnp.arange(qn, dtype=jnp.int32), mode="drop")[:n_q_t]
            owner_t = jnp.where(jnp.arange(n_q_t) < n_keep,
                                owner[src_q], -1)
            idx_e = (src_q[:, None] * qw
                     + jnp.arange(qw, dtype=jnp.int32)[None, :]).reshape(-1)
            rows_t = rows[idx_e]                             # [d_t, 16]
            # Tail slots (dst >= n_keep) gathered quantum 0's REAL entries
            # (src_q defaults to 0); their kernel output is garbage gated
            # only by owner=-1, so their scatter index must be -1.
            gauss_t = jnp.where(
                jnp.arange(d_t) < n_keep * qw,
                jax.lax.bitcast_convert_type(rows_t[:, R_GI], jnp.int32),
                -1)
            return run(rows_t if cfg.rows_layout else rows_t.T,
                       owner_t, gauss_t)

        def full_path(operands):
            rows, owner, gauss_idx = operands
            return run(rows if cfg.rows_layout else rows.T,
                       owner, gauss_idx)

        grads = jax.lax.cond(n_keep <= n_q_t, trunc_path, full_path,
                             (rows, owner, gauss_idx))

    d_means2d, d_conic, d_rgb, d_opac, d_invd = grads
    f0 = np.zeros(owner.shape, jax.dtypes.float0)
    f0_g = np.zeros(gauss_idx.shape, jax.dtypes.float0)
    f0_l = np.zeros((n_tiles,), jax.dtypes.float0)
    f0_p = None if rank is None else np.zeros((n,), jax.dtypes.float0)
    f0_t = (None if gen_tab is None
            else np.zeros(gen_tab.shape, jax.dtypes.float0))
    return (d_means2d, d_conic, d_rgb, d_opac, d_invd, f0, f0_g, f0_l,
            f0_p, f0_p, f0_t)


blend_entries.defvjp(_blend_fwd, _blend_bwd)
