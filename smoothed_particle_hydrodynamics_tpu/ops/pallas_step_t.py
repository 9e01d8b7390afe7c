"""Transposed-tile Pallas sweeps: candidates on SUBLANES, MXU reductions.

The lane-major kernel (`pallas_step.py`) pays a 128-lane alignment floor per
rod window: per-particle lane work is R x (B + L + 128-align) ~ 9 x 512.
This variant puts CANDIDATES on the sublane axis (8-granular windows) and
PARTICLES on the lane axis, cutting the swept volume ~2.7x at 1M (9 x 192).

Layout: candidate fields are stored as 128-lane-padded ROWS — one [n_pad, 128]
f32 array whose first `naug` lanes hold the (pre-derived) per-candidate
values.  A rod window is then ONE [s_t, 128] HBM->VMEM slab copy with a
dynamic 8-aligned sublane start — legal for Mosaic because the lane dimension
is never sliced.  This trades ~2x DMA bytes (hidden behind compute) for zero
in-kernel transposes; the earlier granule-DMA + MXU-identity-transpose
variant measured 1.3x SLOWER than the lane kernel because the per-rod-chunk
transpose matmuls dominated.

The MXU does the force reductions: the pressure and viscosity sums over
candidates are [4,s_t] x [s_t,128] `dot_general`s (sum_c u_c * W_cs),
replacing 18 full-tile VPU ops with 2 MXU passes.  Their coordinates are
BLOCK-RELATIVE (a per-block reference point rides in via f32 scalar prefetch)
to curb f32 cancellation in xi*sum(center) - sum(xj*center); pair distances
d^2 stay in exact world-coordinate diff form, bit-identical to the XLA
backends (an |xi|^2 - 2 xi.xj MXU expansion was measured at ~4e-4 relative
error in sparse blocks and rejected).

Windows, double-buffered pipelining, rod masking by cell-id delta, and exact
multi-chunk tails follow pallas_step.py.  Multi-chunk tails reuse slot 2 of
the pipeline scratch: a separately-allocated scratch buffer + scalar DMA
semaphore faults Mosaic inside ``fori_loop``.

Enable with ``SphConfig(pallas_layout="sublane")``.

Reference counterpart: the SSE inner loop + density/force loops at
/root/reference/src/sph.cpp:598-683,721-766,778-934 (default-mode physics
only; order-dependent compat quirks live in ``..compat``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SphConfig
from ..state import ParticleState
from . import celllist, physics
from .grid import cell_coords, inverse_order, linear_cell_id, unsort_stacked
from .pallas_step import (_RODS, _check_grid_nondegenerate, _rod_deltas,
                          _round_up)

_f32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST
_MXU_REDUCE = True   # A/B: True = dot_general reduces, False = VPU sublane sums

SUB = 8      # f32 sublane granularity: window starts align to this
BLANE = 128  # default particles per block = one lane width
LANE = 128   # stored row width (Mosaic cannot DMA lane-sliced windows)


def _blane(cfg: SphConfig) -> int:
    """Particles per kernel grid step (output lane width).

    ``cfg.pallas_block_t`` > 128 widens blocks: per-(block, rod) fixed cost
    and DMA descriptor count halve per doubling while the union rod window
    grows only by the extra block extent — the winning trade when the
    sweeps are overhead-bound (docs/PERFORMANCE.md r4 #32).  Vector ops and
    the MXU reductions run at [s_t, b] (b a multiple of the 128-lane tile).
    """
    return getattr(cfg, "pallas_block_t", BLANE) or BLANE


def _rods_t(cfg: SphConfig):
    """The 9 classic (dy, dz) stencil rods, each x-merged to one contiguous
    cid range.  (An r4 experiment merged the three y-rods per dz into one
    [c0-nx-1, c1+nx+1] window — ``pallas_rods=3`` — betting that fewer
    (block, rod) visits beat the extra in-between rows; the r5 hardware A/B
    measured it ~2x SLOWER at BOTH 1M and 125k/chip (docs/ab_rods3_1m.log,
    docs/ab_slab125.log), so the dial was deleted.)"""
    return _RODS


def _nrods(cfg: SphConfig) -> int:
    return len(_rods_t(cfg))


def _rod_pad(cfg: SphConfig) -> int:
    """Window half-extent beyond the block's own cid range, in cells."""
    return 1


def _rod_deltas_t(cfg: SphConfig):
    return [float((dz * cfg.grid_ny + dy) * cfg.grid_nx)
            for dy, dz in _rods_t(cfg)]


def _rod_ok_t(cfg: SphConfig, dc, delta_r: float):
    """Pair gate on the cell-id delta ``dc`` for rod ``delta_r``:
    |dc - delta| <= 1 (the rod's own x-merged row)."""
    return jnp.abs(dc - _f32(delta_r)) <= 1.0


def _block_windows_t(cfg: SphConfig, cid_sorted, nblocks: int,
                     window: int, n: int, n_pad: int, cid_search=None):
    """Per (block, group, rod): tight 8-aligned window start + chunk count.

    A block's 128 lanes are split into ``cfg.pallas_groups`` spatial GROUPS of
    consecutive sorted particles, each with its own (smaller) rod windows —
    the windows shrink by nearly the group factor because the block's own
    sorted extent dominates window length.  Returns [nblocks * G * nrods]
    flattened in (block, group, rod) order.

    ``cid_search`` (default: ``cid_sorted``) is the sorted cid array the
    windows index INTO — the distributed slab engine passes the extended
    [halo | local | halo] cids here, and the capped mode passes the
    subsampled candidate cids.  Search cids may contain out-of-grid
    sentinels: values < 0 clip into cell 0 (inert rows at the array start,
    rejected by the in-kernel cid mask); values >= num_cells land in a
    dedicated histogram bucket that no window bound ever reaches, so
    trailing excluded rows (capped mode's unkept tail) never widen a window.

    Cell offsets come from one bincount + cumsum + a stacked gather of the
    window cells' bounds (measured 18 ms vs 27 ms for a left/right
    searchsorted pair at 1M particles / 2M cells).
    """
    if cid_search is None:
        cid_search = cid_sorted
    g = cfg.pallas_groups
    b = _blane(cfg)
    grows = b // g
    deltas = jnp.asarray([(dz * cfg.grid_ny + dy) * cfg.grid_nx
                          for dy, dz in _rods_t(cfg)], jnp.int32)
    rpad = _rod_pad(cfg)
    pad = nblocks * b - n
    cid_p = jnp.pad(cid_sorted, (0, pad), constant_values=cfg.num_cells - 1)
    groups = cid_p.reshape(nblocks * g, grows)
    lo_cell = jnp.clip(groups[:, 0][:, None] + deltas[None, :] - rpad,
                       0, cfg.num_cells - 1)
    hi_cell = jnp.clip(groups[:, -1][:, None] + deltas[None, :] + rpad,
                       0, cfg.num_cells - 1)
    # bincount + cumsum + one stacked gather: same results as the previous
    # left/right searchsorted pair, measured 18 vs 27 ms at 1M / 2M cells.
    # The extra num_cells bucket absorbs >= num_cells sentinels (capped tail)
    # without inflating the last real cell; lo/hi never index it.
    counts = jnp.bincount(jnp.clip(cid_search, 0, cfg.num_cells),
                          length=cfg.num_cells + 1)
    cum = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                           jnp.cumsum(counts)])
    bounds = cum[jnp.stack([lo_cell, hi_cell + 1], axis=0)]
    w_start = bounds[0].astype(jnp.int32)
    w_end = bounds[1].astype(jnp.int32)
    w_start = jnp.clip(w_start & ~(SUB - 1), 0, max(n_pad - window, 0))
    w_len = jnp.maximum(w_end - w_start, 0)
    w_chunks = jnp.where(w_len > 0, -(-w_len // window), 0)
    return w_start.astype(jnp.int32), w_chunks.astype(jnp.int32)


def _lane_group_masks(cfg: SphConfig):
    """[1, b] bool per group: which lanes belong to group g."""
    g = cfg.pallas_groups
    b = _blane(cfg)
    grows = b // g
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    return [(lane // grows) == k for k in range(g)]


def _merge_cols(tiles, masks, c):
    """Merged candidate column c: group g's [s,1] column in group-g lanes."""
    out = tiles[0][:, c:c + 1]
    for k in range(1, len(tiles)):
        out = jnp.where(masks[k], tiles[k][:, c:c + 1], out)
    return out


def _sweep_body_t(cfg, s_t, block_base,
                  ws_ref, wc_ref, ref_ref,
                  fields_hbm, self_ref,
                  cand, sem,
                  init_carry, pair_compute):
    """Shared sweep machinery: pipelined per-group slab DMA + merged compute.

    ``pair_compute(carry, tiles, rod, jg [s_t,128], own, gate) -> carry``
    consumes the per-group window slabs of one rod; ``tiles[g][:, c]`` holds
    candidate field c of group g's window, ``jg`` the merged global candidate
    row index per lane, ``gate`` an optional [1, BLANE] lane mask to AND into
    the pair mask (used by single-group tail chunks).

    Empty windows are processed unconditionally: a window DMA'd for an empty
    rod range carries rows whose cell ids lie outside the rod's [lo, hi]
    band, so the in-kernel cid mask rejects every lane — removing the
    per-rod conds the previous version paid on every block.
    """
    G = cfg.pallas_groups
    b = _blane(cfg)
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    nranges = _nrods(cfg)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (s_t, 1), 0)
    own = ((block_base + i) * b
           + jax.lax.broadcasted_iota(jnp.int32, (1, b), 1))
    masks = _lane_group_masks(cfg)

    def wsl(block, g, r):
        return ws_ref[(block * G + g) * nranges + r]

    def wcl(block, g, r):
        return wc_ref[(block * G + g) * nranges + r]

    def dma(block, g, r, slot):
        row0 = pl.multiple_of(wsl(block, g, r), SUB)
        return pltpu.make_async_copy(
            fields_hbm.at[pl.ds(row0, s_t), :], cand.at[slot, r, g],
            sem.at[slot, r, g])

    def tail_dma(row_start, g, r):
        # slot 2 of the shared pipeline scratch: a separately-allocated
        # scratch buffer + scalar DMA semaphore faults Mosaic inside fori_loop
        return pltpu.make_async_copy(
            fields_hbm.at[pl.ds(row_start, s_t), :], cand.at[2, r, g],
            sem.at[2, r, g])

    def start_block(block, slot):
        for r in range(nranges):
            for g in range(G):
                dma(block, g, r, slot).start()

    @pl.when(i == 0)
    def _():
        start_block(0, 0)

    @pl.when(i + 1 < nblocks)
    def _():
        start_block(i + 1, (i + 1) % 2)

    # Prefetch THIS block's second chunks so 2-chunk windows (the common
    # overflow case) overlap their DMA with the first-chunk compute instead
    # of stalling on a synchronous copy.
    for r in range(nranges):
        for g in range(G):
            @pl.when(wcl(i, g, r) > 1)
            def _(g=g, r=r):
                tail_dma(wsl(i, g, r) + s_t, g, r).start()

    slot = i % 2
    carry = init_carry
    for r in range(nranges):
        for g in range(G):
            dma(i, g, r, slot).wait()
        tiles = [cand[slot, r, g] for g in range(G)]
        jg = wsl(i, 0, r) + iota_sub
        if G > 1:
            jg = jnp.broadcast_to(jg, (s_t, b))
            for g in range(1, G):
                jg = jnp.where(masks[g], wsl(i, g, r) + iota_sub, jg)
        carry = pair_compute(carry, tiles, r, jg, own, None)

        for g in range(G):
            def process1(c, g=g, r=r):
                # chunk 1 was prefetched at block start; wait and consume.
                # Single-group tails gate the other groups' lanes off.
                tail_dma(wsl(i, g, r) + s_t, g, r).wait()
                jg1 = wsl(i, g, r) + s_t + iota_sub
                gate = masks[g] if G > 1 else None
                return pair_compute(c, [cand[2, r, g]] * G, r, jg1, own, gate)

            carry = jax.lax.cond(wcl(i, g, r) > 1, process1, lambda c: c, carry)

            # Very long windows (3+ chunks, rare): exact synchronous walk.
            def chunk_body(ck, carry2, g=g, r=r):
                row_start = wsl(i, g, r) + ck * s_t
                d = tail_dma(row_start, g, r)
                d.start()
                d.wait()
                jg2 = row_start + iota_sub
                gate = masks[g] if G > 1 else None
                return pair_compute(carry2, [cand[2, r, g]] * G, r, jg2, own, gate)

            carry = jax.lax.fori_loop(2, wcl(i, g, r), chunk_body, carry)
    return carry


# ---------------------------------------------------------------------------
# Density: candidate row lanes 0:x 1:y 2:z 3:cid 4:m 5:src (world
# coordinates; d^2 in exact diff form, bit-identical to the XLA backends).
# ``src`` is the candidate's FULL-frame sorted row: in capped mode the
# candidate array is a subsampled frame whose window row index jg no longer
# equals the particle row, so self-exclusion compares src instead.
# ---------------------------------------------------------------------------

def _density_kernel_t(cfg: SphConfig, s_t: int, block_base: int,
                      ws_ref, wc_ref, ref_ref, fields_hbm, self_ref,
                      rho_ref, ncount_ref, cand, sem, self_src_row=None):
    """``self_src_row``: when the SELF rows are themselves a subsampled
    frame (the fused path's sub-frame density pre-pass), the lane index
    ``own`` is a sub-frame row and cannot match the candidates' full-frame
    ``src`` lane; the caller then appends the self particles' full-frame
    rows as self row ``self_src_row`` and exclusion compares src-vs-src."""
    h2 = _f32(cfg.h2)
    deltas = _rod_deltas_t(cfg)
    xi = self_ref[0:1, :]
    yi = self_ref[1:2, :]
    zi = self_ref[2:3, :]
    cid_i = self_ref[4:5, :]

    masks = _lane_group_masks(cfg)

    def pair_compute(carry, tiles, r, jg, own, gate):
        rho, ncount = carry
        dx = _merge_cols(tiles, masks, 0) - xi             # [s_t, 128]
        dy = _merge_cols(tiles, masks, 1) - yi
        dz = _merge_cols(tiles, masks, 2) - zi
        d2 = dx * dx + dy * dy + dz * dz                   # unscaled
        dc = _merge_cols(tiles, masks, 3) - cid_i
        rod_ok = _rod_ok_t(cfg, dc, deltas[r])
        if self_src_row is not None:
            not_self = (_merge_cols(tiles, masks, 5)
                        != self_ref[self_src_row:self_src_row + 1, :])
        elif cfg.capped_candidates:
            # subsampled candidate frame: window row != particle row, so
            # self-exclusion compares the src lane
            not_self = _merge_cols(tiles, masks, 5) != own.astype(jnp.float32)
        else:
            not_self = jg != own
        mask = rod_ok & not_self & (d2 < h2)
        if gate is not None:
            mask = mask & gate
        t = _f32(cfg.h_scaled2) - d2 * _f32(cfg.sim_scale * cfg.sim_scale)
        w3 = _f32(cfg.poly6_norm) * t * t * t
        m_j = _merge_cols(tiles, masks, 4)
        rho = rho + jnp.sum(jnp.where(mask, m_j * w3, 0.0),
                            axis=0, keepdims=True)
        ncount = ncount + jnp.sum(mask.astype(jnp.int32), axis=0, keepdims=True)
        return rho, ncount

    b = _blane(cfg)
    init = (jnp.zeros((1, b), jnp.float32), jnp.zeros((1, b), jnp.int32))
    rho, ncount = _sweep_body_t(
        cfg, s_t, block_base, ws_ref, wc_ref, ref_ref,
        fields_hbm, self_ref, cand, sem, init, pair_compute)

    if cfg.include_self_density:
        m_i = self_ref[3:4, :]
        h2s = _f32(cfg.h_scaled2)
        rho = rho + m_i * _f32(cfg.poly6_norm) * h2s * h2s * h2s
    rho_ref[0, :] = rho.reshape(b)
    ncount_ref[0, :] = ncount.reshape(b)


# ---------------------------------------------------------------------------
# Force: candidate row lanes
#   0:x 1:y 2:z 3:ones                      -> pressure reduce matrix U
#   4:rimj*vx 5:rimj*vy 6:rimj*vz 7:rimj    -> viscosity reduce matrix V
#   8:cid 9:mj 10:mj*pwj 11:src (full-frame row, for self-exclusion)
# U's coordinates are shifted by the per-block reference point in-kernel.
# ---------------------------------------------------------------------------

def _force_kernel_t(cfg: SphConfig, s_t: int, block_base: int,
                    ws_ref, wc_ref, ref_ref, fields_hbm, self_ref,
                    acc_ref, cand, sem):
    h2 = _f32(cfg.h2)
    h = _f32(cfg.h_scaled)
    scale = _f32(cfg.sim_scale)
    eps = _f32(cfg.pressure_softening)
    k = _f32(cfg.stiffness)
    rho0 = _f32(cfg.rho0)
    deltas = _rod_deltas_t(cfg)

    i = pl.program_id(0)
    rx = ref_ref[i * 3 + 0]
    ry = ref_ref[i * 3 + 1]
    rz = ref_ref[i * 3 + 2]
    # [1, 4] row [rx, ry, rz, 0]: shifts U's coordinate rows, keeps the ones
    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    ref4 = jnp.where(lane4 == 0, rx,
                     jnp.where(lane4 == 1, ry,
                               jnp.where(lane4 == 2, rz, 0.0)))

    xi = self_ref[0:1, :]
    yi = self_ref[1:2, :]
    zi = self_ref[2:3, :]
    cid_i = self_ref[8:9, :]
    rhoi = self_ref[7:8, :]
    rhoi_inv = 1.0 / jnp.where(rhoi > 0.0, rhoi, 1.0)
    pw_i = (rhoi - rho0) * k * rhoi_inv * rhoi_inv

    b = _blane(cfg)
    masks = _lane_group_masks(cfg)
    lane4 = jax.lax.broadcasted_iota(jnp.int32, (4, b), 1)
    masks4 = [(lane4 // (b // cfg.pallas_groups)) == k
              for k in range(cfg.pallas_groups)]

    def pair_compute(carry, tiles, r, jg, own, gate):
        acc_p, acc_v = carry                               # [4,128] each
        dx = _merge_cols(tiles, masks, 0) - xi
        dy = _merge_cols(tiles, masks, 1) - yi
        dz = _merge_cols(tiles, masks, 2) - zi
        d2u = dx * dx + dy * dy + dz * dz                  # unscaled, exact
        dc = _merge_cols(tiles, masks, 8) - cid_i
        rod_ok = _rod_ok_t(cfg, dc, deltas[r])
        if cfg.capped_candidates:
            not_self = _merge_cols(tiles, masks, 11) != own.astype(jnp.float32)
        else:
            not_self = jg != own
        mask = rod_ok & not_self & (d2u < h2)
        if gate is not None:
            mask = mask & gate

        d = jnp.sqrt(d2u) * scale
        hd = jnp.where(mask, h - d, 0.0)
        # center = hd^2 * mj * (pw_i + pw_j) / (d + eps) * scale
        num = (hd * hd) * (_merge_cols(tiles, masks, 9) * pw_i
                           + _merge_cols(tiles, masks, 10))
        den = d + eps
        center = num / den * scale

        # sum_c u_c * W_cs: MXU dot_general or VPU sublane sums.  For G > 1
        # the left matrices differ per lane group: run one full-width dot per
        # group and keep each group's own columns (the MXU is idle next to
        # the VPU-bound mask math, so extra dots are cheaper than selects on
        # every candidate column).
        if _MXU_REDUCE:
            def group_dots(mats, rhs):
                dots = [jax.lax.dot_general(
                    m, rhs, (((0,), (0,)), ((), ())),
                    precision=_HI, preferred_element_type=jnp.float32)
                    for m in mats]
                out = dots[0]
                for k in range(1, len(dots)):
                    out = jnp.where(masks4[k], dots[k], out)
                return out

            acc_p = acc_p + group_dots(
                [t[:, 0:4] - ref4 for t in tiles], center)
            acc_v = acc_v + group_dots([t[:, 4:8] for t in tiles], hd)
        else:
            def red(col, tile):
                return jnp.sum(col * tile, axis=0, keepdims=True)
            rx4 = ref4[0, 0]; ry4 = ref4[0, 1]; rz4 = ref4[0, 2]
            acc_p = acc_p + jnp.concatenate([
                red(_merge_cols(tiles, masks, 0) - rx4, center),
                red(_merge_cols(tiles, masks, 1) - ry4, center),
                red(_merge_cols(tiles, masks, 2) - rz4, center),
                jnp.sum(center, axis=0, keepdims=True)], axis=0)
            acc_v = acc_v + jnp.concatenate([
                red(_merge_cols(tiles, masks, 4), hd),
                red(_merge_cols(tiles, masks, 5), hd),
                red(_merge_cols(tiles, masks, 6), hd),
                red(_merge_cols(tiles, masks, 7), hd)], axis=0)
        return acc_p, acc_v

    zero4 = jnp.zeros((4, b), jnp.float32)
    acc_p, acc_v = _sweep_body_t(
        cfg, s_t, block_base, ws_ref, wc_ref, ref_ref,
        fields_hbm, self_ref, cand, sem, (zero4, zero4), pair_compute)

    # pressure: sum dx*center with dx = xi - xj  ->  xi_rel*S - S_xjrel
    # viscosity: sum (vxj - vxi) * hd * rimj     ->  V_xj - vxi*S_rimj
    s_cen = acc_p[3:4, :]
    ax = (xi - rx) * s_cen - acc_p[0:1, :]
    ay = (yi - ry) * s_cen - acc_p[1:2, :]
    az = (zi - rz) * s_cen - acc_p[2:3, :]
    s_rim = acc_v[3:4, :]
    vx = acc_v[0:1, :] - self_ref[3:4, :] * s_rim
    vy = acc_v[1:2, :] - self_ref[4:5, :] * s_rim
    vz = acc_v[2:3, :] - self_ref[5:6, :] * s_rim

    norm = _f32(cfg.visc_lap_norm)
    mu_rhoi = _f32(cfg.viscosity) * rhoi_inv
    acc_ref[0, :] = (mu_rhoi * vx * norm + ax * norm).reshape(b)
    acc_ref[1, :] = (mu_rhoi * vy * norm + ay * norm).reshape(b)
    acc_ref[2, :] = (mu_rhoi * vz * norm + az * norm).reshape(b)


# ---------------------------------------------------------------------------
# Fused capped sweep: ONE window pass computes density AND force (capped
# mode only).  The force sum splits as center_c = pw_i*c1_c + c2_c with
#   c1_c = hd^2 * mj   / (d+eps) * scale     (pw_i-free)
#   c2_c = hd^2 * mjpwj / (d+eps) * scale
# so the pressure reduction becomes TWO MXU dots (U.c1, U.c2) combined with
# pw_i AFTER the sweep — and pw_i itself comes from the rho accumulated in
# the same pass.  Candidate pwj must be known BEFORE the sweep: the caller
# runs a tiny density pre-pass over the SUB FRAME only (S ~ K_c per cell
# rows, a few % of N), which is what makes fusion capped-only — in exact
# mode the pre-pass would be the full density sweep and nothing is saved.
# Eliminates the full density sweep's (block, rod) visits and window DMA,
# the dominant cost at strong-scaling loads (docs/PERFORMANCE.md #38-39).
#
# Candidate row lanes: identical to the force kernel (0:x 1:y 2:z 3:ones
# 4:rimj*vx 5:rimj*vy 6:rimj*vz 7:rimj 8:cid 9:mj 10:mjpwj 11:src) — mj
# rides at lane 9 for the density part.  Self rows: 0:x 1:y 2:z 3:vx 4:vy
# 5:vz 6:m 7:cid (no rho row — rho is computed in-kernel).
# ---------------------------------------------------------------------------

def _fused_kernel_t(cfg: SphConfig, s_t: int, block_base: int,
                    ws_ref, wc_ref, ref_ref, fields_hbm, self_ref,
                    acc_ref, rho_ref, ncount_ref, cand, sem):
    h2 = _f32(cfg.h2)
    h = _f32(cfg.h_scaled)
    scale = _f32(cfg.sim_scale)
    scale2 = _f32(cfg.sim_scale * cfg.sim_scale)
    eps = _f32(cfg.pressure_softening)
    k = _f32(cfg.stiffness)
    rho0 = _f32(cfg.rho0)
    deltas = _rod_deltas_t(cfg)

    i = pl.program_id(0)
    rx = ref_ref[i * 3 + 0]
    ry = ref_ref[i * 3 + 1]
    rz = ref_ref[i * 3 + 2]
    lane4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    ref4 = jnp.where(lane4 == 0, rx,
                     jnp.where(lane4 == 1, ry,
                               jnp.where(lane4 == 2, rz, 0.0)))

    xi = self_ref[0:1, :]
    yi = self_ref[1:2, :]
    zi = self_ref[2:3, :]
    cid_i = self_ref[7:8, :]

    b = _blane(cfg)
    masks = _lane_group_masks(cfg)

    def pair_compute(carry, tiles, r, jg, own, gate):
        acc_p1, acc_p2, acc_v, rho, ncount = carry
        dx = _merge_cols(tiles, masks, 0) - xi
        dy = _merge_cols(tiles, masks, 1) - yi
        dz = _merge_cols(tiles, masks, 2) - zi
        d2u = dx * dx + dy * dy + dz * dz                  # unscaled, exact
        dc = _merge_cols(tiles, masks, 8) - cid_i
        rod_ok = _rod_ok_t(cfg, dc, deltas[r])
        not_self = _merge_cols(tiles, masks, 11) != own.astype(jnp.float32)
        mask = rod_ok & not_self & (d2u < h2)
        if gate is not None:
            mask = mask & gate

        m_j = _merge_cols(tiles, masks, 9)
        # density part (same ops/order as _density_kernel_t -> same rho bits)
        t = _f32(cfg.h_scaled2) - d2u * scale2
        w3 = _f32(cfg.poly6_norm) * t * t * t
        rho = rho + jnp.sum(jnp.where(mask, m_j * w3, 0.0),
                            axis=0, keepdims=True)
        ncount = ncount + jnp.sum(mask.astype(jnp.int32), axis=0,
                                  keepdims=True)

        d = jnp.sqrt(d2u) * scale
        hd = jnp.where(mask, h - d, 0.0)
        hd2inv = (hd * hd) / (d + eps) * scale
        c1 = hd2inv * m_j
        c2 = hd2inv * _merge_cols(tiles, masks, 10)

        if _MXU_REDUCE:
            def dot4(mat, rhs):
                return jax.lax.dot_general(
                    mat, rhs, (((0,), (0,)), ((), ())),
                    precision=_HI, preferred_element_type=jnp.float32)
            u = tiles[0][:, 0:4] - ref4
            acc_p1 = acc_p1 + dot4(u, c1)
            acc_p2 = acc_p2 + dot4(u, c2)
            acc_v = acc_v + dot4(tiles[0][:, 4:8], hd)
        else:
            def red(col, tile):
                return jnp.sum(col * tile, axis=0, keepdims=True)
            rx4 = ref4[0, 0]; ry4 = ref4[0, 1]; rz4 = ref4[0, 2]
            def stack4(c0, c1_, c2_, c3, tile):
                return jnp.concatenate([red(c0, tile), red(c1_, tile),
                                        red(c2_, tile), red(c3, tile)],
                                       axis=0)
            x_c = _merge_cols(tiles, masks, 0) - rx4
            y_c = _merge_cols(tiles, masks, 1) - ry4
            z_c = _merge_cols(tiles, masks, 2) - rz4
            ones = _merge_cols(tiles, masks, 3)
            acc_p1 = acc_p1 + stack4(x_c, y_c, z_c, ones, c1)
            acc_p2 = acc_p2 + stack4(x_c, y_c, z_c, ones, c2)
            acc_v = acc_v + stack4(_merge_cols(tiles, masks, 4),
                                   _merge_cols(tiles, masks, 5),
                                   _merge_cols(tiles, masks, 6),
                                   _merge_cols(tiles, masks, 7), hd)
        return acc_p1, acc_p2, acc_v, rho, ncount

    zero4 = jnp.zeros((4, b), jnp.float32)
    init = (zero4, zero4, zero4,
            jnp.zeros((1, b), jnp.float32), jnp.zeros((1, b), jnp.int32))
    acc_p1, acc_p2, acc_v, rho, ncount = _sweep_body_t(
        cfg, s_t, block_base, ws_ref, wc_ref, ref_ref,
        fields_hbm, self_ref, cand, sem, init, pair_compute)

    if cfg.include_self_density:
        m_i = self_ref[6:7, :]
        h2s = _f32(cfg.h_scaled2)
        rho = rho + m_i * _f32(cfg.poly6_norm) * h2s * h2s * h2s
    rhoi_inv = 1.0 / jnp.where(rho > 0.0, rho, 1.0)
    pw_i = (rho - rho0) * k * rhoi_inv * rhoi_inv

    # pressure: sum (xi - xj)*center = pw_i*((xi-rx)*S1 - S1_x) + (...S2...)
    s1 = acc_p1[3:4, :]
    s2 = acc_p2[3:4, :]
    ax = pw_i * ((xi - rx) * s1 - acc_p1[0:1, :]) \
        + ((xi - rx) * s2 - acc_p2[0:1, :])
    ay = pw_i * ((yi - ry) * s1 - acc_p1[1:2, :]) \
        + ((yi - ry) * s2 - acc_p2[1:2, :])
    az = pw_i * ((zi - rz) * s1 - acc_p1[2:3, :]) \
        + ((zi - rz) * s2 - acc_p2[2:3, :])
    # viscosity: sum (vxj - vxi) * hd * rimj  ->  V_xj - vxi * S_rimj
    s_rim = acc_v[3:4, :]
    vx = acc_v[0:1, :] - self_ref[3:4, :] * s_rim
    vy = acc_v[1:2, :] - self_ref[4:5, :] * s_rim
    vz = acc_v[2:3, :] - self_ref[5:6, :] * s_rim

    norm = _f32(cfg.visc_lap_norm)
    mu_rhoi = _f32(cfg.viscosity) * rhoi_inv
    acc_ref[0, :] = (mu_rhoi * vx * norm + ax * norm).reshape(b)
    acc_ref[1, :] = (mu_rhoi * vy * norm + ay * norm).reshape(b)
    acc_ref[2, :] = (mu_rhoi * vz * norm + az * norm).reshape(b)
    rho_ref[0, :] = rho.reshape(b)
    ncount_ref[0, :] = ncount.reshape(b)


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

def _grid_spec_t(nblocks: int, nself: int, s_t: int, groups: int, out_specs,
                 b: int, nr: int):
    # b/nr are required (no defaults): a call site that forgot nr under
    # pallas_rods=3 would silently over-allocate 3x the VMEM candidate
    # scratch; thread _nrods(cfg) through explicitly.
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,                             # ws, wc (i32), ref (f32)
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # fields [n_pad, 128]
            pl.BlockSpec((nself, b), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),         # self rows
        ],
        out_specs=out_specs,
        scratch_shapes=[
            # slots 0/1 = block pipeline; slot 2 = multi-chunk tails
            pltpu.VMEM((3, nr, groups, s_t, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3, nr, groups)),
        ],
    )


def _pad_rows(cols: jnp.ndarray, n_pad: int, naug: int) -> jnp.ndarray:
    """[N, R] columns -> [n_pad, 128] with the values in the first R lanes."""
    n, r = cols.shape
    assert r <= naug <= LANE
    return jnp.pad(cols, ((0, n_pad - n), (0, LANE - r)))


class PreparedT(NamedTuple):
    """Sorted fields + window tables shared by both transposed sweeps.

    The three optional fields exist only in capped mode
    (``cfg.capped_candidates > 0`` — the reference's "Subsets" strategy,
    /root/reference/README.md:267-268): the candidate arrays then live in a
    SUBSAMPLED frame (at most K_c hash-selected particles per cell, compacted
    to the front) while self rows stay the full sorted frame.  Windows are
    built over the subsampled cids, so rod window length drops from
    extent*occupancy to extent*K_c.
    """

    order: jnp.ndarray       # [N] sorted-position -> original index
    pos_s: jnp.ndarray       # [N, 3] sorted
    vel_s: jnp.ndarray       # [N, 3] sorted
    mass_s: jnp.ndarray      # [N] sorted
    cid_f: jnp.ndarray       # [N] sorted cell ids as f32
    ws: jnp.ndarray          # [nblocks*9] window starts
    wc: jnp.ndarray          # [nblocks*9] chunk counts
    ref: jnp.ndarray         # [nblocks*3] per-block reference points
    sub_perm: jnp.ndarray | None = None    # [S] i32 sub row -> full row
    cand_cid_f: jnp.ndarray | None = None  # [S] f32 sub cids (-10 tail)
    wm_sub: jnp.ndarray | None = None      # [S] f32 reweighted cand mass
    sub_dropped: jnp.ndarray | None = None  # i32: kept rows beyond S (counted)
    ws_sub: jnp.ndarray | None = None      # fused: sub-block window starts
    wc_sub: jnp.ndarray | None = None      # fused: sub-block chunk counts


def _validate(cfg: SphConfig) -> None:
    if cfg.compat:
        raise ValueError("pallas backend supports default mode only")
    if cfg.num_cells > 1 << 24:
        raise ValueError("cell ids stored in f32 (exact up to 2^24 cells)")
    _check_grid_nondegenerate(cfg)
    if cfg.pallas_window_t <= 0 or cfg.pallas_window_t % SUB:
        raise ValueError(f"pallas_window_t must be a positive multiple of {SUB}"
                         " (0 = auto is resolved by the CLI via derive_window_t)")
    if cfg.pallas_groups not in (1, 2, 4):
        raise ValueError("pallas_groups must be 1, 2, or 4")
    if _blane(cfg) not in (128, 256, 512):
        # 1024 was tried in r5 session 3: Mosaic's remote compile crashed at
        # csf3/csf4 shapes and the one shape that compiled (csf5, 125k/chip)
        # measured SLOWER than b512 (4.09 vs 3.74 ms/step) — the union
        # window growth beats the visit halving past 512 (ab_slab125 logs)
        raise ValueError("pallas_block_t must be 128, 256, or 512 "
                         "(a multiple of the 128-lane tile)")
    if cfg.capped_candidates and cfg.pallas_groups != 1:
        raise ValueError("capped_candidates currently requires pallas_groups=1")
    if cfg.capped_candidates and cfg.num_particles > 1 << 24:
        # the self-exclusion lane compares source ROW ids carried as f32
        # (see the src_f candidate column); beyond 2^24 rows they round and
        # non-self candidates could be silently excluded
        raise ValueError("capped mode stores source row ids in f32 "
                         "(exact up to 2^24 = 16.7M particles)")


def _hash32(idx: jnp.ndarray) -> jnp.ndarray:
    """Deterministic per-particle hash (Knuth multiplicative, 31-bit).

    Position-independent, so ordering cell members by it makes the capped
    mode's kept-first-K_c selection an unbiased within-cell subsample —
    unlike the reference's LCG bucket offsets, which bias toward insertion
    order (/root/reference/src/sph.cpp:590-598)."""
    return (idx * jnp.int32(-1640531527)) & jnp.int32(0x7FFFFFFF)


def _hash_bits(cfg: SphConfig) -> int:
    """Spare low bits of an i32 after the cell id: when >= 8, the capped
    sort packs (cid << hb) | hash_top_hb into ONE key so the rebuild's
    selection sort runs as a 1-key 2-operand ``lax.sort`` (measured 7.1 ms
    vs 10.6 for the 2-key 3-operand form at 1M).  Ties in the packed key
    (same cell, same truncated hash — P ~ occ^2/2^hb per cell) break by the
    sort's stable payload: the slab engine uses the original particle id
    (so adjacent DEVICES always agree about a shared halo cell's kept set),
    and single-chip prepare_t uses its input-frame row — equal to the
    original id at the first build, and an engine-local sampling choice
    after in-frame rebins (benign: the subsample stays deterministic and
    unbiased either way)."""
    return 31 - max((cfg.num_cells - 1).bit_length(), 1)


def _run_rank_occ(cid_sorted: jnp.ndarray):
    """(rank within cid run, run occupancy) per sorted row — O(N) scans,
    no gathers (cummax/cummin over run-boundary flags)."""
    n = cid_sorted.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    flag = jnp.concatenate([jnp.ones((1,), bool),
                            cid_sorted[1:] != cid_sorted[:-1]])
    start = jax.lax.cummax(jnp.where(flag, iota, 0))
    rank = iota - start
    nxt = jnp.concatenate([flag[1:], jnp.ones((1,), bool)])
    run_end = jax.lax.cummin(jnp.where(nxt, iota + 1, n), reverse=True)
    return rank, run_end - start


def _n_pad(cfg: SphConfig, n: int) -> int:
    return _round_up(n + cfg.pallas_window_t, LANE)


def _n_pad_rows(cfg: SphConfig, rows: int) -> int:
    """Padded length of a candidate array of ``rows`` rows."""
    return _round_up(rows + cfg.pallas_window_t, LANE)


def sub_len(cfg: SphConfig, n: int) -> int:
    """Static sub-frame length for capped mode (0 config = full N)."""
    return min(cfg.capped_sub_len or n, n)


def derive_sub_len(cfg: SphConfig, state: ParticleState,
                   margin: float = 1.15) -> int:
    """Host-side: bound the kept-candidate count from the current occupancy
    histogram (sum of min(occ, K_c) per cell), with margin for drift between
    rebins; 128-rounded.  Overflow is counted, never silent."""
    import numpy as np

    from .grid import cell_coords, linear_cell_id

    if not cfg.capped_candidates:
        return 0
    cid = np.asarray(linear_cell_id(cfg, cell_coords(cfg, state.position)))
    occ = np.bincount(cid, minlength=cfg.num_cells)
    kept = np.minimum(occ, cfg.capped_candidates).sum()
    n = state.position.shape[0]
    v = -(-int(kept * margin + 128) // 128) * 128
    return 0 if v >= n else v  # 0 = full N (no benefit from a bound)


def derive_window_t(cfg: SphConfig, state: ParticleState,
                    percentile: float = 90.0) -> int:
    """Pick ``pallas_window_t`` from the state's ACTUAL rod-window lengths.

    Host-side, once per run: bins the current positions, reproduces the
    per-(block, group, rod) window-length computation in numpy, and returns
    the given percentile rounded up to the sublane granule (min 64).  The
    p90 measured best at 1M (docs/PERFORMANCE.md round 2): smaller windows
    push the common case into multi-chunk tails, larger ones are padding.
    """
    import numpy as np

    from .grid import cell_coords, linear_cell_id

    n = state.position.shape[0]
    g = cfg.pallas_groups
    grows = _blane(cfg) // g
    cid = np.sort(np.asarray(linear_cell_id(cfg, cell_coords(cfg, state.position))))
    deltas = np.asarray([(dz * cfg.grid_ny + dy) * cfg.grid_nx
                         for dy, dz in _rods_t(cfg)])
    rpad = _rod_pad(cfg)
    ngroups = -(-n // grows)
    cid_p = np.pad(cid, (0, ngroups * grows - n),
                   constant_values=cfg.num_cells - 1)
    groups = cid_p.reshape(ngroups, grows)
    lo = np.clip(groups[:, 0][:, None] + deltas[None, :] - rpad,
                 0, cfg.num_cells - 1)
    hi = np.clip(groups[:, -1][:, None] + deltas[None, :] + rpad,
                 0, cfg.num_cells - 1)
    if cfg.capped_candidates:
        # windows index the SUBSAMPLED candidate array: replay the per-cell
        # cap on the occupancy histogram (selection is a subset per cell, so
        # only counts matter for window lengths)
        counts = np.bincount(cid, minlength=cfg.num_cells)
        capped = np.minimum(counts, cfg.capped_candidates)
        cum = np.concatenate([[0], np.cumsum(capped)])
        a = cum[lo.ravel()]
        b = cum[np.minimum(hi.ravel() + 1, cfg.num_cells)]
    else:
        a = np.searchsorted(cid, lo.ravel(), side="left")
        b = np.searchsorted(cid, hi.ravel(), side="right")
    lens = np.maximum(b - a, 0)
    lens = lens[lens > 0]
    if lens.size == 0:
        return max(cfg.pallas_window_t, 64) or 64
    w = int(np.percentile(lens, percentile))
    return max(-(-w // SUB) * SUB, 64)


def prepare_t(cfg: SphConfig, state: ParticleState) -> PreparedT:
    """Binning + fused sort + per-block window tables.

    One ``lax.sort`` pair-sort yields sorted ids + permutation together
    (cheaper than argsort + gather); fields ride through one [N, 7] row
    gather; no full per-cell offset tables are built (see _block_windows_t).

    Capped mode (``cfg.capped_candidates = K_c``) additionally selects the
    K_c lowest-hash particles of every cell as the CANDIDATE SOURCE, compacts
    them to the front of a subsampled frame (a second pair sort), and builds
    the windows over the kept cids; the sweep functions then gather candidate
    fields through ``sub_perm`` each step.  ``capped_reweight`` scales kept
    masses by occupancy/kept so density stays unbiased.
    """
    _validate(cfg)
    n = state.position.shape[0]
    nblocks = -(-n // _blane(cfg))
    k_c = cfg.capped_candidates

    cid = linear_cell_id(cfg, cell_coords(cfg, state.position))
    iota = jnp.arange(n, dtype=jnp.int32)
    if k_c:
        # sort by (cell, hash): cell members land in hash order, so
        # "rank < K_c" is a deterministic unbiased within-cell subsample.
        # With spare i32 bits the two keys pack into ONE (see _hash_bits);
        # ties fall back to iota (= original id) via sort stability.
        hb = _hash_bits(cfg)
        if hb >= 8:
            packed = (cid << hb) | (_hash32(iota) >> (31 - hb))
            packed_s, order = jax.lax.sort((packed, iota), num_keys=1)
            cid_sorted = packed_s >> hb
        else:
            cid_sorted, _, order = jax.lax.sort(
                (cid, _hash32(iota), iota), num_keys=2)
    else:
        cid_sorted, order = jax.lax.sort((cid, iota), num_keys=1)
    stacked = jnp.concatenate(
        [state.position, state.velocity, state.mass[:, None]], axis=1)
    stacked_s = stacked[order]
    pos_s = stacked_s[:, 0:3]
    mass_s = stacked_s[:, 6]

    sub_perm = cand_cid_f = wm_sub = sub_dropped = None
    if k_c:
        rank, occ = _run_rank_occ(cid_sorted)
        keep = rank < k_c
        # compact kept rows to the front, preserving cid order (stable sort)
        _, perm_full = jax.lax.sort(
            (jnp.where(keep, 0, 1).astype(jnp.int32), iota), num_keys=1)
        # the sub frame is statically bounded: kept count ~ N*min(1,K_c/occ),
        # so a derived capped_sub_len shrinks the per-step gathers and pad
        # writes; overflow drops the tail cells' candidates and is COUNTED
        s_len = sub_len(cfg, n)
        sub_perm = perm_full[:s_len]
        n_kept = jnp.sum(keep.astype(jnp.int32))
        sub_dropped = jnp.maximum(n_kept - s_len, 0)
        n_kept = jnp.minimum(n_kept, s_len)
        sub_iota = iota[:s_len]
        in_kept = sub_iota < n_kept
        cid_sub = cid_sorted[sub_perm]
        cand_cid_f = jnp.where(in_kept, cid_sub, -10).astype(jnp.float32)
        cid_search = jnp.where(in_kept, cid_sub, cfg.num_cells)
        if cfg.capped_reweight:
            w = occ.astype(jnp.float32) / jnp.minimum(occ, k_c).astype(jnp.float32)
        else:  # reference-faithful truncation: kept masses unscaled
            w = jnp.ones_like(mass_s)
        wm_sub = (mass_s * w)[sub_perm]
        search_pad = _n_pad_rows(cfg, s_len)
    else:
        cid_search = cid_sorted
        search_pad = _n_pad(cfg, n)

    ws, wc = _block_windows_t(cfg, cid_sorted, nblocks,
                              cfg.pallas_window_t, n, search_pad,
                              cid_search=cid_search)
    ws_sub = wc_sub = None
    if k_c and cfg.capped_fused:
        # window tables for the SUB-frame blocks (the fused path's density
        # pre-pass sweeps the sub frame FROM the sub frame): kept rows are
        # cid-ordered and compacted to the front, the >=num_cells sentinel
        # tail lands in the dedicated histogram bucket no window reaches
        s_len = sub_len(cfg, n)
        nblocks_sub = -(-s_len // _blane(cfg))
        ws_sub, wc_sub = _block_windows_t(
            cfg, cid_search, nblocks_sub, cfg.pallas_window_t,
            s_len, search_pad, cid_search=cid_search)
        ws_sub, wc_sub = ws_sub.reshape(-1), wc_sub.reshape(-1)
    first = jnp.minimum(jnp.arange(nblocks, dtype=jnp.int32) * _blane(cfg),
                        n - 1)
    return PreparedT(
        order=order,
        pos_s=pos_s,
        vel_s=stacked_s[:, 3:6],
        mass_s=mass_s,
        cid_f=cid_sorted.astype(jnp.float32),
        ws=ws.reshape(-1), wc=wc.reshape(-1),
        ref=pos_s[first].reshape(-1),
        sub_perm=sub_perm, cand_cid_f=cand_cid_f, wm_sub=wm_sub,
        sub_dropped=sub_dropped, ws_sub=ws_sub, wc_sub=wc_sub,
    )


def _run_chunked(cfg, tables, n, kernel, cand_cols, self_cols,
                 out_specs, make_out_shape, cand_pad_rows=None):
    """cand_cols/self_cols: [N, R] column matrices (padding rows get cid -10
    via the dedicated cid column fill).  ``tables = (ws, wc, ref)`` are the
    window tables the SELF blocks sweep with (the main frame's for the
    standard sweeps, the sub frame's for the fused path's density
    pre-pass); ``n`` is the number of live self rows."""
    ws, wc, ref = tables
    s_t = cfg.pallas_window_t
    G = cfg.pallas_groups
    b = _blane(cfg)
    # callers pre-pad cand_cols to the window-table frame's padded length
    # (_n_pad_rows of the candidate frame), so no further row padding here
    n_pad = cand_cols.shape[0] if cand_pad_rows is None else cand_pad_rows
    nblocks = -(-n // b)
    pad_rows = nblocks * b - n
    nr = _nrods(cfg)
    MAX_BLOCKS = (256 << 10) // (nr * G * 4)
    fields = _pad_rows(cand_cols, n_pad, LANE)             # [n_pad, 128]
    selfrows = jnp.pad(self_cols.T, ((0, 0), (0, pad_rows)))
    parts = []
    for base in range(0, nblocks, MAX_BLOCKS):
        nb_c = min(MAX_BLOCKS, nblocks - base)
        sl = slice(base * G * nr, (base + nb_c) * G * nr)
        out = pl.pallas_call(
            partial(kernel, cfg, s_t, base),
            out_shape=make_out_shape(nb_c * b),
            grid_spec=_grid_spec_t(nb_c, self_cols.shape[1], s_t, G,
                                   out_specs, b=b, nr=nr),
            interpret=cfg.pallas_interpret,
        )(ws[sl], wc[sl],
          jax.lax.dynamic_slice_in_dim(ref, base * 3, nb_c * 3),
          fields,
          jax.lax.dynamic_slice_in_dim(selfrows, base * b,
                                       nb_c * b, axis=1))
        parts.append(out)
    if isinstance(parts[0], (tuple, list)):
        return tuple(jnp.concatenate([pt[k] for pt in parts], axis=1)
                     for k in range(len(parts[0])))
    return jnp.concatenate(parts, axis=1)


def gather_sub_pv(p: PreparedT) -> jnp.ndarray:
    """[S, 6] positions+velocities of the capped sub frame, gathered once per
    step and shared by both sweeps (positions drift between rebins; one w6
    gather beats the former w3 density + w7 force pair)."""
    return jnp.concatenate([p.pos_s, p.vel_s], axis=1)[p.sub_perm]


def density_sweep_t(cfg: SphConfig, p: PreparedT, pv_sub=None
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(rho_s, ncount_s) in sorted order."""
    n = p.pos_s.shape[0]
    b = _blane(cfg)
    n_rows = -(-n // b) * b
    # candidate lanes: x, y, z, cid, m, src; self rows: x, y, z, m, cid.
    # Padding rows beyond N get an impossible cid so window chunks that
    # overrun the array tail always fail the rod mask (and far-away
    # positions as belt-and-braces).
    iota_f = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)
    if cfg.capped_candidates:
        # subsampled candidate frame (statically bounded): positions gathered
        # fresh each call (they drift between rebins), mass pre-reweighted
        if pv_sub is None:
            pv_sub = gather_sub_pv(p)
        cand = _sub_cand_cols(cfg, p, pv_sub)
    else:
        cand = jnp.concatenate(
            [p.pos_s, p.cid_f[:, None], p.mass_s[:, None], iota_f[:, None]],
            axis=1)
        pad = jnp.zeros((_n_pad_rows(cfg, cand.shape[0]) - cand.shape[0],
                         cand.shape[1]), jnp.float32)
        pad = pad.at[:, 0:3].set(1e30).at[:, 3].set(-10.0).at[:, 5].set(-1.0)
        cand = jnp.concatenate([cand, pad], axis=0)
    selfc = jnp.concatenate(
        [p.pos_s, p.mass_s[:, None], p.cid_f[:, None]], axis=1)
    rho_blocks, nc_blocks = _run_chunked(
        cfg, (p.ws, p.wc, p.ref), n, _density_kernel_t, cand, selfc,
        out_specs=(
            pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ),
        make_out_shape=lambda rows: (
            jax.ShapeDtypeStruct((1, rows), jnp.float32),
            jax.ShapeDtypeStruct((1, rows), jnp.int32),
        ),
    )
    return rho_blocks.reshape(n_rows)[:n], nc_blocks.reshape(n_rows)[:n]


def force_sweep_t(cfg: SphConfig, p: PreparedT, rho_s: jnp.ndarray,
                  pv_sub=None) -> jnp.ndarray:
    """acc_s [N,3] in sorted order (hydro only; gravity/CFL added by caller)."""
    n = p.pos_s.shape[0]
    if cfg.capped_candidates:
        # positions/velocities ride the shared per-step w6 gather
        # (``gather_sub_pv``); only the fresh densities need their own w1
        if pv_sub is None:
            pv_sub = gather_sub_pv(p)
        pos_c, vel_c = pv_sub[:, 0:3], pv_sub[:, 3:6]
        rho_c = rho_s[p.sub_perm]
        m_c = p.wm_sub                                      # reweighted
        cid_c = p.cand_cid_f
        src_f = p.sub_perm.astype(jnp.float32)
    else:
        pos_c, vel_c, rho_c, m_c = p.pos_s, p.vel_s, rho_s, p.mass_s
        cid_c = p.cid_f
        src_f = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)
    cand = fused_cand_cols(cfg, pos_c, vel_c, rho_c, m_c, cid_c, src_f)
    selfc = jnp.concatenate(
        [p.pos_s, p.vel_s, p.mass_s[:, None], rho_s[:, None],
         p.cid_f[:, None]], axis=1)
    acc_rows = _run_chunked(
        cfg, (p.ws, p.wc, p.ref), n, _force_kernel_t, cand, selfc,
        out_specs=pl.BlockSpec((3, _blane(cfg)), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        make_out_shape=lambda rows: jax.ShapeDtypeStruct((3, rows), jnp.float32),
    )
    return acc_rows[:, :n].T


def _sub_cand_cols(cfg: SphConfig, p: PreparedT, pv_sub) -> jnp.ndarray:
    """Density-layout candidate columns of the sub frame, padded: x y z cid
    m src (shared by ``density_sweep_t``'s capped branch and the fused
    pre-pass)."""
    cand = jnp.concatenate(
        [pv_sub[:, 0:3], p.cand_cid_f[:, None],
         p.wm_sub[:, None], p.sub_perm.astype(jnp.float32)[:, None]],
        axis=1)
    pad = jnp.zeros((_n_pad_rows(cfg, cand.shape[0]) - cand.shape[0],
                     cand.shape[1]), jnp.float32)
    pad = pad.at[:, 0:3].set(1e30).at[:, 3].set(-10.0).at[:, 5].set(-1.0)
    return jnp.concatenate([cand, pad], axis=0)


def density_sub_t(cfg: SphConfig, p: PreparedT, pv_sub) -> jnp.ndarray:
    """Fused-path pre-pass: capped density of the SUB-frame particles only.

    Same estimator as ``density_sweep_t`` evaluated at S sub rows instead of
    N — the force-side candidate pressures are the only consumer of
    candidate densities, so the fused sweep needs just these.  Self rows
    carry the particles' TRUE mass (reweighting applies to candidate
    masses, not the self term) and their full-frame row for src-vs-src
    self-exclusion (``_density_kernel_t`` docstring).
    """
    s_len = p.sub_perm.shape[0]
    b = _blane(cfg)
    n_rows = -(-s_len // b) * b
    cand = _sub_cand_cols(cfg, p, pv_sub)
    m_sub = p.mass_s[p.sub_perm]
    selfc = jnp.concatenate(
        [pv_sub[:, 0:3], m_sub[:, None], p.cand_cid_f[:, None],
         p.sub_perm.astype(jnp.float32)[:, None]], axis=1)
    nblocks_sub = -(-s_len // b)
    ref0 = jnp.zeros((nblocks_sub * 3,), jnp.float32)   # density: ref unused
    rho_blocks, _ = _run_chunked(
        cfg, (p.ws_sub, p.wc_sub, ref0), s_len,
        partial(_density_kernel_t, self_src_row=5), cand, selfc,
        out_specs=(
            pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ),
        make_out_shape=lambda rows: (
            jax.ShapeDtypeStruct((1, rows), jnp.float32),
            jax.ShapeDtypeStruct((1, rows), jnp.int32),
        ),
    )
    return rho_blocks.reshape(n_rows)[:s_len]


def fused_cand_cols(cfg: SphConfig, pos_c, vel_c, rho_c, m_c, cid_c, src_f
                    ) -> jnp.ndarray:
    """Force-layout candidate columns from explicit per-candidate arrays
    (shared by the single-chip and slab fused paths)."""
    ones = jnp.ones((pos_c.shape[0], 1), jnp.float32)
    rhoj_inv = 1.0 / jnp.where(rho_c > 0.0, rho_c, 1.0)
    p_j = (rho_c - _f32(cfg.rho0)) * _f32(cfg.stiffness)
    rimj = rhoj_inv * m_c
    mjpwj = m_c * (p_j * rhoj_inv * rhoj_inv)
    cand = jnp.concatenate(
        [pos_c, ones, rimj[:, None] * vel_c, rimj[:, None],
         cid_c[:, None], m_c[:, None], mjpwj[:, None], src_f[:, None]],
        axis=1)
    pad = jnp.zeros((_n_pad_rows(cfg, cand.shape[0]) - cand.shape[0],
                     cand.shape[1]), jnp.float32)
    pad = pad.at[:, 0:3].set(1e30).at[:, 8].set(-10.0).at[:, 11].set(-1.0)
    return jnp.concatenate([cand, pad], axis=0)


def fused_sweep_t(cfg: SphConfig, p: PreparedT, rho_sub: jnp.ndarray,
                  pv_sub) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused window pass: (acc_s hydro-only, rho_s, ncount_s) for all N.

    ``rho_sub`` is the pre-pass output (``density_sub_t``); candidate
    pressures derive from it instead of from a separate full density sweep.
    """
    n = p.pos_s.shape[0]
    b = _blane(cfg)
    n_rows = -(-n // b) * b
    cand = fused_cand_cols(cfg, pv_sub[:, 0:3], pv_sub[:, 3:6], rho_sub,
                           p.wm_sub, p.cand_cid_f,
                           p.sub_perm.astype(jnp.float32))
    selfc = jnp.concatenate(
        [p.pos_s, p.vel_s, p.mass_s[:, None], p.cid_f[:, None]], axis=1)
    acc_rows, rho_blocks, nc_blocks = _run_chunked(
        cfg, (p.ws, p.wc, p.ref), n, _fused_kernel_t, cand, selfc,
        out_specs=(
            pl.BlockSpec((3, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ),
        make_out_shape=lambda rows: (
            jax.ShapeDtypeStruct((3, rows), jnp.float32),
            jax.ShapeDtypeStruct((1, rows), jnp.float32),
            jax.ShapeDtypeStruct((1, rows), jnp.int32),
        ),
    )
    return (acc_rows[:, :n].T, rho_blocks.reshape(n_rows)[:n],
            nc_blocks.reshape(n_rows)[:n])


def sweeps_sorted(cfg: SphConfig, p: PreparedT
                  ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Both sweeps + gravity + CFL clamp, all in the SORTED frame.

    The sorted-frame contract lets the lazy driver (``ops.lazy``) keep state
    permanently sorted and skip the inverse permutation entirely.

    Capped mode with ``cfg.capped_fused`` runs the single fused pass fed by
    the sub-frame density pre-pass instead of the two full sweeps.
    """
    if cfg.capped_candidates and cfg.capped_fused:
        pv_sub = gather_sub_pv(p)
        rho_sub = density_sub_t(cfg, p, pv_sub)
        acc_s, rho_s, ncount_s = fused_sweep_t(cfg, p, rho_sub, pv_sub)
    else:
        pv_sub = gather_sub_pv(p) if cfg.capped_candidates else None
        rho_s, ncount_s = density_sweep_t(cfg, p, pv_sub=pv_sub)
        acc_s = force_sweep_t(cfg, p, rho_s, pv_sub=pv_sub)
    acc_s = acc_s + physics.central_gravity(cfg, p.pos_s)
    acc_s = acc_s + jnp.asarray(cfg.gravity, jnp.float32)
    acc_s = physics.cfl_clamp(cfg, acc_s)
    return acc_s, rho_s, ncount_s


def compute_step_quantities(cfg: SphConfig, state: ParticleState
                            ) -> tuple[jnp.ndarray, jnp.ndarray, celllist.CellListAux]:
    """Transposed-layout pallas backend; contract identical to pallas_step."""
    p = prepare_t(cfg, state)
    acc_s, rho_s, ncount_s = sweeps_sorted(cfg, p)

    # one pair-sort + one stacked row gather instead of three scatters
    # (a [1M,3] scatter costs ~45 ms on v5e)
    inv = inverse_order(p.order)
    acc, rho, ncount = unsort_stacked(inv, [acc_s, rho_s, ncount_s])
    aux = celllist.CellListAux(
        neighbor_count=ncount,
        # this backend has no per-cell capacity: binning cannot overflow and
        # long windows are walked exactly by the multi-chunk tail; the only
        # counted loss is a capped sub-frame overflowing capped_sub_len
        overflow_cells=jnp.zeros((), jnp.int32),
        truncated_ranges=(p.sub_dropped if p.sub_dropped is not None
                          else jnp.zeros((), jnp.int32)),
    )
    return acc, rho, aux
