"""Fully distributed SPH step: fixed z-slab ownership, local sort, halo +
migration over ICI — per-device memory is O(N/D + capacities).

This is the weak-scaling replacement for ``sharding.step_sharded_halo``,
whose binning/sort still ran replicated on every device.  Here NOTHING is
global: each device owns the particles inside a fixed band of z cell-planes,
bins and sorts only those, exchanges one cell-plane of halo rows with each
mesh neighbor per step (``lax.ppermute``), and hands off particles that
drift across a slab boundary through fixed-capacity migration buffers.

The reference has no distributed layer at all (SURVEY.md §2 "parallelism
inventory": hand SSE + commented-out OpenMP, /root/reference/src/sph.cpp:27,
651-663,215); this module is the framework's from-scratch design for it.

Static-shape contract (everything jit/SPMD-safe):

* ``fields``: ``[D * p_cap, 8]`` f32 — rows are (pos xyz, vel xyz, mass,
  orig_id); a device's slice is its slab population padded to ``p_cap``.
  Invalid rows carry ``orig_id == -1``, far-away positions and zero mass so
  they fall out of every pair mask and tally.
* halo: each device sends its ``h_cap`` tail/head sorted rows (a superset of
  its edge cell-plane) to each neighbor; senders re-pad rows outside the
  edge plane so receivers see a sorted, maskable segment.
* migration: at rebins, leavers are compacted by a pair sort and routed one
  device per hop toward their destination slab (a uniform while_loop repeats
  hops until every mover lands — multi-slab coasting between rebins is legal
  under the spread trigger); ``m_cap`` rows per direction per hop.  Capacity
  misses are COUNTED (``migration_dropped``), never silent.

Capacity sizing belongs to the caller (``derive_slab_caps``): p_cap from the
max slab population + drift headroom, h_cap from the densest plane pair,
m_cap from the flux through a plane.  Undersizing shows up in diagnostics,
not in wrong physics for the particles that remain.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SphConfig
from ..state import ParticleState, StepDiagnostics
from ..ops import celllist
from ..ops.integrate import kdk_integrate

_f32 = jnp.float32
_BIG = jnp.float32(1e30)
_AXIS = "data"

# fields column layout
_POS = slice(0, 3)
_VEL = slice(3, 6)
_MASS = 6
_OID = 7
_NCOLS = 8


class SlabCarry(NamedTuple):
    """Distributed particle store (leading axis sharded over the mesh)."""

    fields: jnp.ndarray       # [D*p_cap, 8] f32
    count: jnp.ndarray        # [D] i32 valid rows per device


def _nzs(cfg: SphConfig, ndev: int) -> int:
    if cfg.grid_nz % ndev:
        raise ValueError(f"grid_nz={cfg.grid_nz} must divide by {ndev} devices")
    nzs = cfg.grid_nz // ndev
    if nzs < 2:
        raise ValueError("need >= 2 z cell-planes per device")
    return nzs


def _zplane(cfg: SphConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z coordinate -> clamped z cell-plane index."""
    zp = jnp.floor(z * _f32(cfg.inv_cell_size)).astype(jnp.int32)
    return jnp.clip(zp, 0, cfg.grid_nz - 1)


def uniform_zsplit(cfg: SphConfig, ndev: int) -> tuple[int, ...]:
    """Equal-VOLUME partition: ndev equal runs of z cell-planes."""
    nzs = _nzs(cfg, ndev)
    return tuple(range(0, cfg.grid_nz + 1, nzs))


def derive_zsplit(cfg: SphConfig, state: ParticleState,
                  ndev: int) -> tuple[int, ...]:
    """Occupancy-WEIGHTED partition: contiguous plane runs of near-equal
    particle count (each >= 2 planes).  Fixed equal-volume slabs carry a
    ~2.2x load imbalance on mass-concentrated scenes (measured at 1M splash,
    docs/PERFORMANCE.md); balancing by the initial histogram makes p_cap —
    and per-device sweep work — O(N/D) with a small constant.  Drift away
    from the initial distribution shows up as slab-capacity overflow in
    ``migration_dropped`` long before physics goes wrong."""
    import numpy as np

    _nzs(cfg, ndev)
    nz = cfg.grid_nz
    zp = np.asarray(_zplane(cfg, state.position[:, 2]))
    plane = np.bincount(zp, minlength=nz).astype(np.int64)
    cum = np.cumsum(plane)
    total = int(cum[-1])
    splits = [0]
    for k in range(1, ndev):
        z = int(np.searchsorted(cum, total * k / ndev)) + 1
        z = max(splits[-1] + 2, min(z, nz - 2 * (ndev - k)))
        splits.append(z)
    splits.append(nz)
    return tuple(splits)


def derive_slab_caps(cfg: SphConfig, state: ParticleState, ndev: int,
                     headroom: float = 1.5,
                     zsplit: tuple[int, ...] | None = None
                     ) -> tuple[int, int, int]:
    """(p_cap, h_cap, m_cap) from the initial state's plane occupancy."""
    import numpy as np

    _nzs(cfg, ndev)
    if zsplit is None:
        zsplit = uniform_zsplit(cfg, ndev)
    zp = np.asarray(_zplane(cfg, state.position[:, 2]))
    plane = np.bincount(zp, minlength=cfg.grid_nz).astype(np.int64)
    slab = np.asarray([plane[zsplit[d]:zsplit[d + 1]].sum()
                       for d in range(ndev)])
    p_cap = int(max(slab.max(), 1) * headroom) + 64
    h_cap = int(max(plane.max(), 1) * headroom) + 64
    # one full plane of migration capacity per direction per hop: under the
    # spread trigger a coasting cloud can cross whole planes between rebins
    m_cap = max(h_cap, 64)
    # block-width multiples so the pallas sweep variant's lane blocks tile
    # exactly (128 by default; 256/512 under the pallas_block_t dial)
    from ..ops import pallas_step_t as pt

    b = pt._blane(cfg)
    rnd = lambda v: -(-v // b) * b
    return rnd(p_cap), rnd(h_cap), rnd(m_cap)


def distribute(cfg: SphConfig, state: ParticleState, mesh: Mesh,
               p_cap: int, zsplit: tuple[int, ...] | None = None) -> SlabCarry:
    """Partition a host state into the sharded slab store."""
    import numpy as np

    ndev = math.prod(mesh.devices.shape)
    _nzs(cfg, ndev)
    if zsplit is None:
        zsplit = uniform_zsplit(cfg, ndev)
    n = state.position.shape[0]
    zp = np.asarray(_zplane(cfg, state.position[:, 2]))
    dest = np.clip(np.searchsorted(zsplit, zp, side="right") - 1, 0, ndev - 1)

    fields = np.zeros((ndev * p_cap, _NCOLS), np.float32)
    fields[:, 0:3] = _BIG
    fields[:, _OID] = -1.0
    count = np.zeros((ndev,), np.int32)
    pos = np.asarray(state.position)
    vel = np.asarray(state.velocity)
    mass = np.asarray(state.mass)
    for d in range(ndev):
        rows = np.nonzero(dest == d)[0]
        if len(rows) > p_cap:
            raise ValueError(f"slab {d} population {len(rows)} > p_cap {p_cap}")
        base = d * p_cap
        k = len(rows)
        fields[base:base + k, 0:3] = pos[rows]
        fields[base:base + k, 3:6] = vel[rows]
        fields[base:base + k, _MASS] = mass[rows]
        fields[base:base + k, _OID] = rows.astype(np.float32)
        count[d] = k
    sh = NamedSharding(mesh, P(_AXIS))
    return SlabCarry(fields=jax.device_put(jnp.asarray(fields), sh),
                     count=jax.device_put(jnp.asarray(count), sh))


def collect(carry: SlabCarry, n: int) -> ParticleState:
    """Gather the slab store back into a host ParticleState (original order)."""
    import numpy as np

    fields = np.asarray(carry.fields)
    oid = fields[:, _OID].astype(np.int64)
    valid = oid >= 0
    out_pos = np.zeros((n, 3), np.float32)
    out_vel = np.zeros((n, 3), np.float32)
    out_mass = np.zeros((n,), np.float32)
    out_pos[oid[valid]] = fields[valid][:, 0:3]
    out_vel[oid[valid]] = fields[valid][:, 3:6]
    out_mass[oid[valid]] = fields[valid][:, _MASS]
    return ParticleState.from_arrays(out_pos, out_vel, mass=out_mass)


def _sort_local(cfg: SphConfig, fields: jnp.ndarray, slab_hi: jnp.ndarray
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort a device's rows by global linear cell id (invalid rows last).

    Invalid rows get cid = slab_hi - 1 (the slab's LAST own cell): the stable
    sort keeps them after every valid row (valid rows precede them in storage
    by construction), and — unlike a num_cells sentinel — the extended array
    [left halo | local | right halo] stays globally ascending, which
    ``_local_ranges``'s searchsorted requires.  Inert fields (mass 0,
    position 1e30) keep them out of every pair mask.
    """
    valid = fields[:, _OID] >= 0.0
    coords = jnp.floor(fields[:, 0:3] * _f32(cfg.inv_cell_size)).astype(jnp.int32)
    hi = jnp.asarray([cfg.grid_nx - 1, cfg.grid_ny - 1, cfg.grid_nz - 1], jnp.int32)
    coords = jnp.clip(coords, 0, hi)
    cid = (coords[:, 2] * cfg.grid_ny + coords[:, 1]) * cfg.grid_nx + coords[:, 0]
    cid = jnp.where(valid, cid, slab_hi - 1)
    cid_sorted, perm = jax.lax.sort(
        (cid, jnp.arange(fields.shape[0], dtype=jnp.int32)), num_keys=1)
    return fields[perm], cid_sorted


def _edge_window(fields_s, cid_s, cnt, h_cap: int, tail: bool):
    """A device's h_cap sorted rows nearest one slab edge, sent RAW.

    The tail window [cnt - h_cap, cnt) may reach below the edge plane; those
    rows keep their true (lower) cell ids — the receiver's stencil only ever
    queries the adjacent plane's cells, so extra rows are never candidates,
    and true cids preserve the global sortedness ``_local_ranges`` needs.
    (Re-padding them into the plane range instead was measured to pile fake
    rows into the plane's first cell and truncate real candidates.)  Invalid
    rows cannot enter the tail window (they sort after row cnt) and in the
    head window carry cid slab_hi - 1 > every queried cell of the left
    neighbor — also never candidates.
    """
    if tail:
        start = jnp.maximum(cnt - h_cap, 0)
    else:
        start = jnp.zeros((), jnp.int32)
    rows = jax.lax.dynamic_slice_in_dim(fields_s, start, h_cap)
    cids = jax.lax.dynamic_slice_in_dim(cid_s, start, h_cap)
    return rows, cids


def _local_ranges(cfg: SphConfig, cid_ext: jnp.ndarray, cid_rows: jnp.ndarray,
                  row_valid: jnp.ndarray, n_ext: int
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[rows, 9] contiguous candidate ranges into the extended sorted array.

    ``cid_ext`` is the sorted cell id of every extended row (halo|local|halo,
    globally ascending); ranges are found by searchsorted on the 27-stencil
    rod bounds — O(rows * log n_ext), all local.
    """
    nx, ny, nz = cfg.grid_nx, cfg.grid_ny, cfg.grid_nz
    x = cid_rows % nx
    y = (cid_rows // nx) % ny
    z = cid_rows // (nx * ny)
    starts, ends = [], []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            ok = row_valid & (y + dy >= 0) & (y + dy < ny) \
                & (z + dz >= 0) & (z + dz < nz)
            base = cid_rows + (dz * ny + dy) * nx
            lo = base - jnp.where(x > 0, 1, 0)
            hi = base + jnp.where(x < nx - 1, 1, 0)
            s = jnp.searchsorted(cid_ext, lo, side="left").astype(jnp.int32)
            e = jnp.searchsorted(cid_ext, hi + 1, side="left").astype(jnp.int32)
            starts.append(jnp.where(ok, s, 0))
            ends.append(jnp.where(ok, e, 0))
    return jnp.stack(starts, axis=1), jnp.stack(ends, axis=1)


def _perm(ndev: int, shift: int):
    return [(d, (d + shift) % ndev) for d in range(ndev)]


def _pallas_ext_pad(cfg: SphConfig, h_cap: int, p_cap: int) -> int:
    """Static padded length of the extended candidate array."""
    from ..ops import pallas_step_t as pt

    return pt._round_up(p_cap + 2 * h_cap + cfg.pallas_window_t, pt.LANE)


def _pallas_tables(cfg: SphConfig, cid_loc, cid_ext, h_cap: int, p_cap: int,
                   cnt, slab_hi, base=None, loc_cells: int | None = None):
    """Frozen per-(block, group, rod) window tables for the pallas sweeps.

    Built once per rebin (frozen between rebins).  Unlike the single-chip
    helper, this is DEAD-ROW AWARE: the slab store's [cnt, p_cap) tail rows
    carry sort cid slab_hi-1 (a REAL cell — required to keep the extended
    array globally ascending), so a naive histogram makes every window that
    touches the slab's top cell span the whole dead run.  At 1M on one
    device that is ~500k junk rows per window for ~3900 dead blocks — the
    step ran so long the TPU worker watchdog killed it (measured r3).  Here
    the histogram EXCLUDES dead rows and window bounds re-add the dead-run
    offset positionally:

      start(cell c) = cum_nodead[c]      + n_dead * [c >= slab_hi]
      end(cell h+1) = cum_nodead[h + 1]  + n_dead * [h + 1 >= slab_hi + 1]

    (a window ending exactly at the slab's top cell stops at the live rows;
    one reaching the halo starts after the dead run).  Fully-dead blocks get
    zero chunks.  The rare window that genuinely straddles the boundary
    (lo < slab_hi <= hi: the valid->dead transition block) still walks the
    dead run — one block per device, masked junk, bounded cost.

    The histogram is PLANE-LOCAL, not grid-global: a device only ever
    queries cells in [``base`` = slab_lo - nxny, base + ``loc_cells``), so
    the bincount/cumsum run over that static range (own planes + one halo
    plane each side) instead of cfg.num_cells — O(N/D)-sized tables on a
    D-device mesh.  Valid rows BELOW the range (deep tail-window halo rows —
    never candidates) are excluded from the histogram and re-enter the
    bounds as the scalar positional offset ``n_low``; rows above the range
    sort after every local position and land in the sentinel bucket.
    """
    from ..ops import pallas_step_t as pt

    nxny = cfg.grid_nx * cfg.grid_ny
    if base is None:
        base = jnp.int32(-nxny)
    if loc_cells is None:
        loc_cells = (cfg.grid_nz + 2) * nxny
    nblocks = p_cap // pt._blane(cfg)
    window = cfg.pallas_window_t
    n_pad = _pallas_ext_pad(cfg, h_cap, p_cap)
    g = cfg.pallas_groups
    grows = pt._blane(cfg) // g
    deltas = jnp.asarray([(dz * cfg.grid_ny + dy) * cfg.grid_nx
                          for dy, dz in pt._rods_t(cfg)], jnp.int32)
    rpad = pt._rod_pad(cfg)
    groups = cid_loc.reshape(nblocks * g, grows)   # p_cap is 128-aligned
    lo_cell = jnp.clip(groups[:, 0][:, None] + deltas[None, :] - rpad,
                       0, cfg.num_cells - 1)
    hi_cell = jnp.clip(groups[:, -1][:, None] + deltas[None, :] + rpad,
                       0, cfg.num_cells - 1)
    e = cid_ext.shape[0]
    n_dead = (p_cap - cnt).astype(jnp.int32)
    pos = jnp.arange(e, dtype=jnp.int32)
    dead = (pos >= h_cap + cnt) & (pos < h_cap + p_cap)
    # chain-end inert left-halo rows carry cid -1; clipping them into cell 0
    # made every bottom-plane block's -z rods sweep all h_cap inert rows
    # (~14 ms at 1M on device 0 — measured r3).  Exclude them via the
    # sentinel bucket and shift every bound by their count (they sit at the
    # array head, before every real position).
    inert = dead | (cid_ext < 0)
    n_head = jnp.sum((cid_ext[:h_cap] < 0).astype(jnp.int32))
    below = (cid_ext >= 0) & (cid_ext < base) & ~dead
    n_low = jnp.sum(below.astype(jnp.int32))
    out = inert | below | (cid_ext >= base + loc_cells)
    search = jnp.where(out, loc_cells,
                       jnp.clip(cid_ext - base, 0, loc_cells))
    counts = jnp.bincount(search, length=loc_cells + 1)
    cum = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                           jnp.cumsum(counts)]).astype(jnp.int32)
    li = jnp.clip(lo_cell - base, 0, loc_cells - 1)
    hi_i = jnp.clip(hi_cell + 1 - base, 0, loc_cells)
    head = n_head + n_low
    w_start = head + cum[li] + jnp.where(lo_cell >= slab_hi, n_dead, 0)
    w_end = head + cum[hi_i] + jnp.where(hi_cell + 1 >= slab_hi + 1,
                                         n_dead, 0)
    w_start = jnp.clip(w_start & ~(pt.SUB - 1), 0, max(n_pad - window, 0))
    w_len = jnp.maximum(w_end - w_start, 0)
    w_chunks = jnp.where(w_len > 0, -(-w_len // window), 0)
    # fully-dead blocks (first row >= cnt) need no physics at all
    first_row = (jnp.arange(nblocks * g, dtype=jnp.int32) // g) * pt._blane(cfg)
    live_block = (first_row < cnt)[:, None]
    w_start = jnp.where(live_block, w_start, 0)
    w_chunks = jnp.where(live_block, w_chunks, 0)
    return (w_start.astype(jnp.int32).reshape(-1),
            w_chunks.astype(jnp.int32).reshape(-1))


def _sub_pad(cfg: SphConfig, sub_len: int) -> int:
    from ..ops import pallas_step_t as pt

    return pt._round_up(sub_len + cfg.pallas_window_t, pt.LANE)


def _capped_sub_frame(cfg: SphConfig, ext, cid_ext, sub_len: int,
                      slab_lo, slab_hi):
    """Kept-candidate sub frame over the EXTENDED array (capped mode).

    The subsample policy is the single-chip one — K_c lowest ``hash(oid)``
    per cell — and oid is the GLOBAL original particle id, so every device
    (and the halo sender/receiver pair) selects the SAME kept set for any
    cell whose members are fully visible; adjacent-plane halo cells are
    fully shipped whenever h_cap covers the plane (misses are counted in
    halo_dropped).  Inert/dead rows (oid < 0) are never kept, so the capped
    sub frame needs none of the dead-run positional offsets the exact path's
    window tables carry.

    Returns (sub_src [S] ext-row per sub slot, cand_cid_f [S],
    cid_search [S], w_sub [S], sub_dropped scalar).
    """
    from ..ops import pallas_step_t as pt

    e = ext.shape[0]
    oid = ext[:, _OID].astype(jnp.int32)
    nxny = cfg.grid_nx * cfg.grid_ny
    # only cells this device can ever query (own slab +- one halo plane) may
    # contribute candidates; deeper tail-window rows would otherwise bloat
    # the sub frame past its derived bound
    queryable = (cid_ext >= slab_lo - nxny) & (cid_ext < slab_hi + nxny)
    valid = (oid >= 0) & queryable
    pos = jnp.arange(e, dtype=jnp.int32)
    hb = pt._hash_bits(cfg)
    if hb >= 8:
        # packed (cid | hash_top) key, ties broken by oid: the IDENTICAL
        # ranking as the single-chip prepare_t, so both engines keep the
        # same set (see pt._hash_bits); invalid rows get the i32-max
        # sentinel (a num_cells << hb sentinel can overflow the sign bit)
        sent = jnp.int32(0x7FFFFFFF)
        key = jnp.where(
            valid,
            (jnp.clip(cid_ext, 0, cfg.num_cells - 1) << hb)
            | (pt._hash32(oid) >> (31 - hb)), sent)
        key_s, _, pos_s = jax.lax.sort((key, oid, pos), num_keys=2)
        invalid_s = key_s == sent
        key_s = key_s >> hb          # cid runs (sentinels group at the end)
        big = sent >> hb
    else:
        big = jnp.int32(cfg.num_cells)
        key = jnp.where(valid, jnp.clip(cid_ext, 0, cfg.num_cells - 1), big)
        key_s, _, pos_s = jax.lax.sort((key, pt._hash32(oid), pos),
                                       num_keys=2)
        invalid_s = key_s == big
    rank, occ = pt._run_rank_occ(key_s)
    k_c = cfg.capped_candidates
    keep_s = (rank < k_c) & ~invalid_s
    if cfg.capped_reweight:
        w_s = occ.astype(jnp.float32) / jnp.minimum(occ, k_c).astype(jnp.float32)
    else:
        w_s = jnp.ones((e,), jnp.float32)
    _, perm2 = jax.lax.sort(
        (jnp.where(keep_s, 0, 1).astype(jnp.int32), pos), num_keys=1)
    take = perm2[:sub_len]
    sub_src = pos_s[take]
    n_kept_all = jnp.sum(keep_s.astype(jnp.int32))
    sub_dropped = jnp.maximum(n_kept_all - sub_len, 0)
    n_kept = jnp.minimum(n_kept_all, sub_len)
    in_kept = jnp.arange(sub_len, dtype=jnp.int32) < n_kept
    cid_sub = key_s[take]
    cand_cid_f = jnp.where(in_kept, cid_sub, -10).astype(jnp.float32)
    cid_search = jnp.where(in_kept, cid_sub, cfg.num_cells)
    w_sub = jnp.where(in_kept, w_s[take], 0.0)
    return sub_src, cand_cid_f, cid_search, w_sub, sub_dropped


def _pallas_sub_tables(cfg: SphConfig, cid_loc, cid_search, sub_len: int,
                       cnt, base=None, loc_cells: int | None = None):
    """Window tables over the capped sub frame: kept rows only, cid-ordered
    and compacted to the front — plain cum positions, no offsets.

    Plane-local like ``_pallas_tables``: every kept row passed the
    ``queryable`` filter in ``_capped_sub_frame`` (own slab ± one halo
    plane), so the histogram needs only [``base``, base + ``loc_cells``)
    buckets and there is no below-range offset to carry."""
    from ..ops import pallas_step_t as pt

    nxny = cfg.grid_nx * cfg.grid_ny
    if base is None:
        base = jnp.int32(-nxny)
    if loc_cells is None:
        loc_cells = (cfg.grid_nz + 2) * nxny
    p_cap = cid_loc.shape[0]
    nblocks = p_cap // pt._blane(cfg)
    window = cfg.pallas_window_t
    n_pad = _sub_pad(cfg, sub_len)
    g = cfg.pallas_groups
    grows = pt._blane(cfg) // g
    deltas = jnp.asarray([(dz * cfg.grid_ny + dy) * cfg.grid_nx
                          for dy, dz in pt._rods_t(cfg)], jnp.int32)
    rpad = pt._rod_pad(cfg)
    groups = cid_loc.reshape(nblocks * g, grows)
    lo_cell = jnp.clip(groups[:, 0][:, None] + deltas[None, :] - rpad,
                       0, cfg.num_cells - 1)
    hi_cell = jnp.clip(groups[:, -1][:, None] + deltas[None, :] + rpad,
                       0, cfg.num_cells - 1)
    # non-kept rows carry cid_search = num_cells >= base + loc_cells -> the
    # sentinel bucket; kept rows are all queryable, i.e. in-range
    counts = jnp.bincount(jnp.clip(cid_search - base, 0, loc_cells),
                          length=loc_cells + 1)
    cum = jnp.concatenate([jnp.zeros((1,), counts.dtype),
                           jnp.cumsum(counts)]).astype(jnp.int32)
    w_start = cum[jnp.clip(lo_cell - base, 0, loc_cells - 1)]
    w_end = cum[jnp.clip(hi_cell + 1 - base, 0, loc_cells)]
    w_start = jnp.clip(w_start & ~(pt.SUB - 1), 0, max(n_pad - window, 0))
    w_len = jnp.maximum(w_end - w_start, 0)
    w_chunks = jnp.where(w_len > 0, -(-w_len // window), 0)
    first_row = (jnp.arange(nblocks * g, dtype=jnp.int32) // g) * pt._blane(cfg)
    live_block = (first_row < cnt)[:, None]
    w_start = jnp.where(live_block, w_start, 0)
    w_chunks = jnp.where(live_block, w_chunks, 0)
    return (w_start.astype(jnp.int32).reshape(-1),
            w_chunks.astype(jnp.int32).reshape(-1))


def _pallas_density_local(cfg: SphConfig, ext, cid_ext, ws, wc, h_cap: int,
                          p_cap: int):
    """Density over local rows with the production sublane pallas kernel.

    Same kernel as the single-chip path (``ops.pallas_step_t``): the extended
    [halo | local | halo] rows become the candidate field array, windows
    (``ws``/``wc``, frozen per rebin) are per local 128-lane block searching
    the extended cids, and ``own`` indices are offset by the halo so
    self-exclusion works in the extended frame.  Out-of-grid sentinel cids
    only add inert rows at the array ends (clipped in the histogram, rejected
    by the in-kernel cid mask).
    """
    from functools import partial as _partial

    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt

    s_t = cfg.pallas_window_t
    e = ext.shape[0]
    e_pad = _pallas_ext_pad(cfg, h_cap, p_cap)
    nblocks = p_cap // pt._blane(cfg)
    cid_f = cid_ext.astype(jnp.float32)
    # src lane = extended-frame row (the kernels' self-exclusion compares it
    # against `own`, which is offset by the halo here)
    src_f = jnp.arange(e, dtype=jnp.int32).astype(jnp.float32)
    cand = jnp.concatenate(
        [ext[:, 0:3], cid_f[:, None], ext[:, _MASS:_MASS + 1],
         src_f[:, None]], axis=1)
    pad = jnp.zeros((e_pad - e, 6), jnp.float32) \
        .at[:, 0:3].set(_BIG).at[:, 3].set(-10.0).at[:, 5].set(-1.0)
    cand = jnp.concatenate([cand, pad], axis=0)
    fields = pt._pad_rows(cand, e_pad, pt.LANE)
    loc = slice(h_cap, h_cap + p_cap)
    selfrows = jnp.concatenate(
        [ext[loc, 0:3], ext[loc, _MASS:_MASS + 1], cid_f[loc][:, None]],
        axis=1).T
    first = jnp.arange(nblocks, dtype=jnp.int32) * pt._blane(cfg) + h_cap
    ref = ext[first, 0:3].reshape(-1)
    out_specs = (
        pl.BlockSpec((1, pt._blane(cfg)), lambda i, *_: (0, i),
                     memory_space=pt.pltpu.VMEM),
        pl.BlockSpec((1, pt._blane(cfg)), lambda i, *_: (0, i),
                     memory_space=pt.pltpu.VMEM),
    )
    rho, nc = _slab_chunked_call(
        cfg, pt._density_kernel_t, 5, s_t, h_cap, nblocks, ws, wc, ref,
        fields, selfrows, out_specs,
        lambda rows: (jax.ShapeDtypeStruct((1, rows), jnp.float32),
                      jax.ShapeDtypeStruct((1, rows), jnp.int32)))
    return rho.reshape(p_cap), nc.reshape(p_cap)


def _slab_chunked_call(cfg, kernel, nself, s_t, h_cap, nblocks, ws, wc, ref,
                       fields, selfrows, out_specs, make_out_shape):
    """pallas_call over the local blocks in SMEM-budgeted chunks.

    The scalar-prefetch tables (ws/wc/ref) live in SMEM: one call over all
    p_cap/128 blocks at 1M+ rows overflows the budget and faults the TPU
    worker (measured — a single 11.7k-block call crashed the chip; the
    single-chip path has always chunked via _run_chunked's MAX_BLOCKS).
    ``block_base`` keeps `own` = extended-frame row across chunks.
    """
    from functools import partial as _partial

    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt

    G = cfg.pallas_groups
    nr = pt._nrods(cfg)
    MAX_BLOCKS = (256 << 10) // (nr * G * 4)
    parts = []
    for base in range(0, nblocks, MAX_BLOCKS):
        nb_c = min(MAX_BLOCKS, nblocks - base)
        sl = slice(base * G * nr, (base + nb_c) * G * nr)
        out = pl.pallas_call(
            _partial(kernel, cfg, s_t, h_cap // pt._blane(cfg) + base),
            out_shape=make_out_shape(nb_c * pt._blane(cfg)),
            grid_spec=pt._grid_spec_t(nb_c, nself, s_t, G, out_specs,
                                      b=pt._blane(cfg), nr=nr),
            interpret=cfg.pallas_interpret,
        )(ws[sl], wc[sl],
          jax.lax.dynamic_slice_in_dim(ref, base * 3, nb_c * 3),
          fields,
          jax.lax.dynamic_slice_in_dim(selfrows, base * pt._blane(cfg),
                                       nb_c * pt._blane(cfg), axis=1))
        parts.append(out)
    if isinstance(parts[0], (tuple, list)):
        return tuple(jnp.concatenate([p[k] for p in parts], axis=1)
                     for k in range(len(parts[0])))
    return jnp.concatenate(parts, axis=1)


def _pallas_force_local(cfg: SphConfig, ext, cid_ext, rho_e, rho_l, ws, wc,
                        h_cap: int, p_cap: int):
    """Hydro acceleration over local rows with the production pallas kernel."""
    from functools import partial as _partial

    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt
    from ..ops import physics

    s_t = cfg.pallas_window_t
    e = ext.shape[0]
    e_pad = _pallas_ext_pad(cfg, h_cap, p_cap)
    nblocks = p_cap // pt._blane(cfg)
    cid_f = cid_ext.astype(jnp.float32)
    mass_e = ext[:, _MASS]
    rhoj_inv = 1.0 / jnp.where(rho_e > 0.0, rho_e, 1.0)
    p_j = (rho_e - _f32(cfg.rho0)) * _f32(cfg.stiffness)
    rimj = rhoj_inv * mass_e
    mjpwj = mass_e * (p_j * rhoj_inv * rhoj_inv)
    ones = jnp.ones((e, 1), jnp.float32)
    src_f = jnp.arange(e, dtype=jnp.int32).astype(jnp.float32)
    cand = jnp.concatenate(
        [ext[:, 0:3], ones, rimj[:, None] * ext[:, 3:6], rimj[:, None],
         cid_f[:, None], mass_e[:, None], mjpwj[:, None], src_f[:, None]],
        axis=1)
    pad = jnp.zeros((e_pad - e, cand.shape[1]), jnp.float32) \
        .at[:, 0:3].set(_BIG).at[:, 8].set(-10.0).at[:, 11].set(-1.0)
    cand = jnp.concatenate([cand, pad], axis=0)
    fields = pt._pad_rows(cand, e_pad, pt.LANE)
    loc = slice(h_cap, h_cap + p_cap)
    selfrows = jnp.concatenate(
        [ext[loc, 0:3], ext[loc, 3:6], ext[loc, _MASS:_MASS + 1],
         rho_l[:, None], cid_f[loc][:, None]], axis=1).T
    first = jnp.arange(nblocks, dtype=jnp.int32) * pt._blane(cfg) + h_cap
    ref = ext[first, 0:3].reshape(-1)
    acc_rows = _slab_chunked_call(
        cfg, pt._force_kernel_t, 9, s_t, h_cap, nblocks, ws, wc, ref,
        fields, selfrows,
        pl.BlockSpec((3, pt._blane(cfg)), lambda i, *_: (0, i),
                     memory_space=pt.pltpu.VMEM),
        lambda rows: jax.ShapeDtypeStruct((3, rows), jnp.float32))
    acc = acc_rows.T
    pos_l = ext[loc, 0:3]
    acc = acc + physics.central_gravity(cfg, pos_l)
    acc = acc + jnp.asarray(cfg.gravity, jnp.float32)
    return physics.cfl_clamp(cfg, acc)


class LazySlabCarry(NamedTuple):
    """Slab store + frozen binning structure (lazy rebinning).

    Between rebins the row ORDER of ``fields`` is frozen (sorted by bin-time
    cell id); only the values evolve.  ``pos_bin``/``cid``/``tabs`` are the
    frozen structure, rebuilt when the global per-axis displacement SPREAD
    exceeds cell - h — the same relative-drift invariant as the single-chip
    lazy driver (``ops.lazy`` module docstring; common-mode translation
    never expires bins).  Migration runs only at rebins and routes movers
    hop-by-hop until they land (multi-slab coasting between rebins is legal
    under the spread trigger).

    ``tabs`` is engine-specific: (rng_s, rng_e) for celllist sweeps,
    (ws, wc) for the exact pallas sweeps, and (ws, wc, sub_src, cand_cid_f,
    w_sub, sub_dropped) for capped pallas sweeps.
    """

    fields: jnp.ndarray       # [D*p_cap, 8] f32, bin-time sorted order
    count: jnp.ndarray        # [D] i32 valid rows per device
    pos_bin: jnp.ndarray      # [D*p_cap, 3] positions at bin time
    cid: jnp.ndarray          # [D*p_cap] i32 frozen sorted cell ids
    tabs: tuple               # frozen engine tables (see docstring)
    steps_since: jnp.ndarray  # [D] i32, -1 = initial build pending
    rebin_count: jnp.ndarray  # [D] i32 total rebins so far


def _pallas_density_local_capped(cfg: SphConfig, ext, g8, cid_ext, ws, wc,
                                 sub_src, cand_cid_f, w_sub,
                                 h_cap: int, p_cap: int, sub_len: int):
    """Density via the capped sub frame.  ``g8 = ext[sub_src]`` is gathered
    ONCE per step in ``slab_step_body`` and shared with the force sweep
    (candidate values drift between rebins; the kept set is frozen)."""
    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt

    sub_pad = _sub_pad(cfg, sub_len)
    m_t = g8[:, _MASS] * w_sub
    src_f = sub_src.astype(jnp.float32)
    cand = jnp.concatenate(
        [g8[:, 0:3], cand_cid_f[:, None], m_t[:, None], src_f[:, None]],
        axis=1)
    pad = jnp.zeros((sub_pad - sub_len, 6), jnp.float32) \
        .at[:, 0:3].set(_BIG).at[:, 3].set(-10.0).at[:, 5].set(-1.0)
    fields = pt._pad_rows(jnp.concatenate([cand, pad], axis=0), sub_pad,
                          pt.LANE)
    loc = slice(h_cap, h_cap + p_cap)
    cid_f = cid_ext.astype(jnp.float32)
    selfrows = jnp.concatenate(
        [ext[loc, 0:3], ext[loc, _MASS:_MASS + 1], cid_f[loc][:, None]],
        axis=1).T
    nblocks = p_cap // pt._blane(cfg)
    out_specs = (
        pl.BlockSpec((1, pt._blane(cfg)), lambda i, *_: (0, i),
                     memory_space=pt.pltpu.VMEM),
        pl.BlockSpec((1, pt._blane(cfg)), lambda i, *_: (0, i),
                     memory_space=pt.pltpu.VMEM),
    )
    rho, nc = _slab_chunked_call(
        cfg, pt._density_kernel_t, 5, cfg.pallas_window_t, h_cap, nblocks,
        ws, wc, jnp.zeros((nblocks * 3,), jnp.float32), fields, selfrows,
        out_specs,
        lambda rows: (jax.ShapeDtypeStruct((1, rows), jnp.float32),
                      jax.ShapeDtypeStruct((1, rows), jnp.int32)))
    return rho.reshape(p_cap), nc.reshape(p_cap)


def _pallas_force_local_capped(cfg: SphConfig, ext, g8, cid_ext, rho_e, rho_l,
                               ws, wc, sub_src, cand_cid_f, w_sub,
                               h_cap: int, p_cap: int, sub_len: int):
    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt
    from ..ops import physics

    sub_pad = _sub_pad(cfg, sub_len)
    rho_c = rho_e[sub_src]
    m_t = g8[:, _MASS] * w_sub
    rhoj_inv = 1.0 / jnp.where(rho_c > 0.0, rho_c, 1.0)
    p_j = (rho_c - _f32(cfg.rho0)) * _f32(cfg.stiffness)
    rimj = rhoj_inv * m_t
    mjpwj = m_t * (p_j * rhoj_inv * rhoj_inv)
    ones = jnp.ones((sub_len, 1), jnp.float32)
    src_f = sub_src.astype(jnp.float32)
    cand = jnp.concatenate(
        [g8[:, 0:3], ones, rimj[:, None] * g8[:, 3:6], rimj[:, None],
         cand_cid_f[:, None], m_t[:, None], mjpwj[:, None], src_f[:, None]],
        axis=1)
    pad = jnp.zeros((sub_pad - sub_len, cand.shape[1]), jnp.float32) \
        .at[:, 0:3].set(_BIG).at[:, 8].set(-10.0).at[:, 11].set(-1.0)
    fields = pt._pad_rows(jnp.concatenate([cand, pad], axis=0), sub_pad,
                          pt.LANE)
    loc = slice(h_cap, h_cap + p_cap)
    cid_f = cid_ext.astype(jnp.float32)
    selfrows = jnp.concatenate(
        [ext[loc, 0:3], ext[loc, 3:6], ext[loc, _MASS:_MASS + 1],
         rho_l[:, None], cid_f[loc][:, None]], axis=1).T
    nblocks = p_cap // pt._blane(cfg)
    first = jnp.arange(nblocks, dtype=jnp.int32) * pt._blane(cfg) + h_cap
    ref = ext[first, 0:3].reshape(-1)
    acc_rows = _slab_chunked_call(
        cfg, pt._force_kernel_t, 9, cfg.pallas_window_t, h_cap, nblocks,
        ws, wc, ref, fields, selfrows,
        pl.BlockSpec((3, pt._blane(cfg)), lambda i, *_: (0, i),
                     memory_space=pt.pltpu.VMEM),
        lambda rows: jax.ShapeDtypeStruct((3, rows), jnp.float32))
    acc = acc_rows.T
    pos_l = ext[loc, 0:3]
    acc = acc + physics.central_gravity(cfg, pos_l)
    acc = acc + jnp.asarray(cfg.gravity, jnp.float32)
    return physics.cfl_clamp(cfg, acc)


def _pallas_density_sub_local(cfg: SphConfig, g8, sub_src, cand_cid_f,
                              w_sub, ws_s, wc_s, sub_len: int):
    """Fused-path pre-pass: capped density of the SUB-frame rows themselves
    (the only densities the fused force terms need — see
    ``pallas_step_t._fused_kernel_t``).  Self rows carry the TRUE mass and
    the extended-frame row for src-vs-src self-exclusion."""
    from functools import partial as _partial

    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt

    sub_pad = _sub_pad(cfg, sub_len)
    b = pt._blane(cfg)
    m_t = g8[:, _MASS] * w_sub
    src_f = sub_src.astype(jnp.float32)
    cand = jnp.concatenate(
        [g8[:, 0:3], cand_cid_f[:, None], m_t[:, None], src_f[:, None]],
        axis=1)
    pad = jnp.zeros((sub_pad - sub_len, 6), jnp.float32) \
        .at[:, 0:3].set(_BIG).at[:, 3].set(-10.0).at[:, 5].set(-1.0)
    fields = pt._pad_rows(jnp.concatenate([cand, pad], axis=0), sub_pad,
                          pt.LANE)
    selfrows = jnp.concatenate(
        [g8[:, 0:3], g8[:, _MASS:_MASS + 1], cand_cid_f[:, None],
         src_f[:, None]], axis=1).T
    nblocks = -(-sub_len // b)
    selfrows = jnp.pad(selfrows, ((0, 0), (0, nblocks * b - sub_len)))
    out_specs = (
        pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pt.pltpu.VMEM),
        pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pt.pltpu.VMEM),
    )
    rho, _ = _slab_chunked_call(
        cfg, _partial(pt._density_kernel_t, self_src_row=5), 6,
        cfg.pallas_window_t, 0, nblocks,
        ws_s, wc_s, jnp.zeros((nblocks * 3,), jnp.float32), fields, selfrows,
        out_specs,
        lambda rows: (jax.ShapeDtypeStruct((1, rows), jnp.float32),
                      jax.ShapeDtypeStruct((1, rows), jnp.int32)))
    return rho.reshape(-1)[:sub_len]


def _pallas_fused_local_capped(cfg: SphConfig, ext, g8, cid_ext, rho_cand,
                               ws, wc, sub_src, cand_cid_f, w_sub,
                               h_cap: int, p_cap: int, sub_len: int):
    """One fused pass: (acc_l, rho_l, nc_l) for all local rows.  ``rho_cand``
    holds the per-sub-row densities (pre-pass locally, halo values from the
    neighbor's scattered exchange)."""
    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt
    from ..ops import physics

    b = pt._blane(cfg)
    m_t = g8[:, _MASS] * w_sub
    src_f = sub_src.astype(jnp.float32)
    fields = pt._pad_rows(
        pt.fused_cand_cols(cfg, g8[:, 0:3], g8[:, 3:6], rho_cand, m_t,
                           cand_cid_f, src_f),
        _sub_pad(cfg, sub_len), pt.LANE)
    loc = slice(h_cap, h_cap + p_cap)
    cid_f = cid_ext.astype(jnp.float32)
    selfrows = jnp.concatenate(
        [ext[loc, 0:3], ext[loc, 3:6], ext[loc, _MASS:_MASS + 1],
         cid_f[loc][:, None]], axis=1).T
    nblocks = p_cap // b
    first = jnp.arange(nblocks, dtype=jnp.int32) * b + h_cap
    ref = ext[first, 0:3].reshape(-1)
    out_specs = (
        pl.BlockSpec((3, b), lambda i, *_: (0, i), memory_space=pt.pltpu.VMEM),
        pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pt.pltpu.VMEM),
        pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pt.pltpu.VMEM),
    )
    acc_rows, rho, nc = _slab_chunked_call(
        cfg, pt._fused_kernel_t, 8, cfg.pallas_window_t, h_cap, nblocks,
        ws, wc, ref, fields, selfrows, out_specs,
        lambda rows: (jax.ShapeDtypeStruct((3, rows), jnp.float32),
                      jax.ShapeDtypeStruct((1, rows), jnp.float32),
                      jax.ShapeDtypeStruct((1, rows), jnp.int32)))
    acc = acc_rows.T
    pos_l = ext[loc, 0:3]
    acc = acc + physics.central_gravity(cfg, pos_l)
    acc = acc + jnp.asarray(cfg.gravity, jnp.float32)
    return (physics.cfl_clamp(cfg, acc), rho.reshape(-1)[:p_cap],
            nc.reshape(-1)[:p_cap])


def slab_step_body(cfg: SphConfig, ndev: int, p_cap: int, h_cap: int,
                   m_cap: int, chunk: int, sweeps: str,
                   zsplit: tuple[int, ...], lazy: bool, sub_len: int,
                   fields: jnp.ndarray, count: jnp.ndarray,
                   pos_bin: jnp.ndarray, cid_frozen: jnp.ndarray,
                   tabs: tuple,
                   steps_since: jnp.ndarray, rebin_count: jnp.ndarray):
    """shard_map body: one full physics step on one device's slab.

    The rebin predicate is a ``pmax``, so every device takes the SAME
    ``lax.cond`` branch — which makes it legal to put the migration
    collectives INSIDE the rebuild branch (uniform-branch collectives
    cannot diverge/deadlock).  Between rebins the step therefore runs zero
    migration traffic; only the halo/rho value exchanges and the diagnostic
    reductions execute every step.
    """
    from ..ops.lazy import skin_half

    nxny = cfg.grid_nx * cfg.grid_ny
    d = jax.lax.axis_index(_AXIS)
    cnt = count[0]
    zs = jnp.asarray(zsplit, jnp.int32)       # [D+1] plane split table
    slab_lo = zs[d] * nxny                    # first own cell id
    slab_hi = zs[d + 1] * nxny                # one-past-last own cell id
    # plane-local window-table extent: widest slab + one halo plane each
    # side (static), so the rebin histograms are O(N/D)-sized, not
    # grid-global (num_cells) — the grid-sized bincount+cumsum dominated
    # the rebin cost at small per-chip loads
    tab_base = slab_lo - nxny
    tab_cells = (max(b - a for a, b in zip(zsplit, zsplit[1:])) + 2) * nxny
    inert_row = jnp.zeros((1, _NCOLS), jnp.float32) \
        .at[0, 0:3].set(_BIG).at[0, _OID].set(-1.0)
    inert_m = jnp.broadcast_to(inert_row, (m_cap, _NCOLS))

    # ---- rebin decision (globally uniform) --------------------------------
    # Per-axis displacement SPREAD, like the single-chip driver (ops/lazy.py
    # module docstring): only RELATIVE drift expires frozen bins — a
    # uniformly-falling cloud rebins never.  max/min are reduced globally
    # (pmax/pmin), so `need` is uniform across devices by construction —
    # which keeps the migration collectives inside the rebuild branch legal.
    valid0 = fields[:, _OID] >= 0.0
    delta = fields[:, 0:3] - pos_bin
    d_hi = jax.lax.pmax(
        jnp.max(jnp.where(valid0[:, None], delta, -_BIG), axis=0), _AXIS)
    d_lo = -jax.lax.pmax(
        jnp.max(jnp.where(valid0[:, None], -delta, -_BIG), axis=0), _AXIS)
    spread = jnp.max(d_hi - d_lo)
    fresh = jax.lax.pmax((steps_since[0] < 0).astype(jnp.int32), _AXIS) > 0
    need = fresh | (spread > _f32(2.0 * skin_half(cfg)))
    if not lazy:
        need = need | True

    # ---- migration + local re-sort (rebins only, one uniform cond) --------
    # MULTI-HOP exchange: each hop routes movers one device toward their
    # destination; a uniform while_loop (psum'd pending count) repeats until
    # every mover has landed.  Under the old per-particle drift skin one hop
    # always sufficed; the spread trigger lets a uniformly-translating cloud
    # coast across MANY slab boundaries between rebins, so multi-slab movers
    # are now routine, not a blow-up symptom.  m_cap starvation per hop is
    # still dropped AND counted.
    def _dest(f):
        zp = jnp.clip(jnp.floor(f[:, 2] * _f32(cfg.inv_cell_size))
                      .astype(jnp.int32), 0, cfg.grid_nz - 1)
        return jnp.clip(jnp.searchsorted(zs, zp, side="right") - 1,
                        0, ndev - 1)

    def _pending(f):
        moving = (f[:, _OID] >= 0.0) & (_dest(f) != d)
        return jax.lax.psum(jnp.sum(moving.astype(jnp.int32)), _AXIS)

    def pack(f):
        valid_f = f[:, _OID] >= 0.0
        dest = _dest(f)
        go_left = valid_f & (dest < d)
        go_right = valid_f & (dest > d)
        stay = valid_f & (dest == d)
        # compact: stayers (0) | left (1) | right (2) | inert (3)
        key = jnp.where(stay, 0, jnp.where(go_left, 1,
                                           jnp.where(go_right, 2, 3)))
        _, perm2 = jax.lax.sort(
            (key.astype(jnp.int32), jnp.arange(p_cap, dtype=jnp.int32)),
            num_keys=1)
        packed_f = f[perm2]
        n_stay = jnp.sum(stay.astype(jnp.int32))
        n_left = jnp.sum(go_left.astype(jnp.int32))
        n_right = jnp.sum(go_right.astype(jnp.int32))
        # pad so take()'s dynamic start (<= p_cap) never clamps into stayers
        packed_pad = jnp.concatenate([packed_f, inert_m], axis=0)

        def take(start, n_take):
            rows = jax.lax.dynamic_slice_in_dim(packed_pad, start, m_cap)
            live = jnp.arange(m_cap, dtype=jnp.int32) < n_take
            return jnp.where(live[:, None], rows, inert_row)

        dropped = (jnp.maximum(n_left - m_cap, 0)
                   + jnp.maximum(n_right - m_cap, 0))
        out_l = take(n_stay, jnp.minimum(n_left, m_cap))
        out_r = take(n_stay + n_left, jnp.minimum(n_right, m_cap))
        return packed_f, n_stay, out_l, out_r, dropped

    def _hop(f):
        """One routing hop: send movers one device toward their dest."""
        packed_f, n_stay, out_left, out_right, dropped = pack(f)

        in_from_right = jax.lax.ppermute(out_left, _AXIS, _perm(ndev, -1))
        in_from_left = jax.lax.ppermute(out_right, _AXIS, _perm(ndev, 1))
        in_from_right = jnp.where(d == ndev - 1, inert_m, in_from_right)
        in_from_left = jnp.where(d == 0, inert_m, in_from_left)
        n_in_l = jnp.sum(in_from_left[:, _OID] >= 0.0).astype(jnp.int32)
        n_in_r = jnp.sum(in_from_right[:, _OID] >= 0.0).astype(jnp.int32)

        base = jnp.zeros((p_cap + 2 * m_cap, _NCOLS), jnp.float32) \
            .at[:, 0:3].set(_BIG).at[:, _OID].set(-1.0)
        live_stay = jnp.arange(p_cap, dtype=jnp.int32) < n_stay
        base = base.at[0:p_cap].set(
            jnp.where(live_stay[:, None], packed_f, inert_row))
        base = jax.lax.dynamic_update_slice_in_dim(
            base, in_from_left, n_stay, axis=0)
        base = jax.lax.dynamic_update_slice_in_dim(
            base, in_from_right, n_stay + n_in_l, axis=0)
        new_count = n_stay + n_in_l + n_in_r
        overflow = jnp.maximum(new_count - p_cap, 0)
        return base[0:p_cap], overflow, dropped

    def rebuild_store(f):
        """Route movers to their slabs (collectives included — the predicate
        is uniform), then re-sort the slab by cell id."""
        def cond(state):
            return state[3] > 0

        def body(state):
            buf, overflow, dropped, _ = state
            buf, ov, dr = _hop(buf)
            return (buf, overflow + ov, dropped + dr, _pending(buf))

        zero = jnp.zeros((), jnp.int32)
        buf, overflow, dropped, _ = jax.lax.while_loop(
            cond, body, (f, zero, zero, _pending(f)))
        cnt2 = jnp.sum(buf[:, _OID] >= 0.0).astype(jnp.int32)

        f_s, c_s = _sort_local(cfg, buf, slab_hi)
        return f_s, c_s, f_s[:, 0:3], cnt2, overflow, dropped

    def frozen_store(f):
        zero = jnp.zeros((), jnp.int32)
        return f, cid_frozen, pos_bin, cnt, zero, zero

    fields_s, cid_s, pos_bin2, cnt2, overflow, mig_dropped = jax.lax.cond(
        need, rebuild_store, frozen_store, fields)

    # ---- halo exchange (every step: values move, structure is frozen) -----
    # When not rebinning, cnt2 and cid_s are frozen, so the window starts and
    # exchanged cids re-derive the exact frozen structure; only the VALUES
    # (positions/velocities) the receiver sees are fresh — which is the point.
    send_up, cid_up = _edge_window(        # my top plane, for right neighbor
        fields_s, cid_s, cnt2, h_cap, tail=True)
    send_dn, cid_dn = _edge_window(        # my bottom plane, for left neighbor
        fields_s, cid_s, cnt2, h_cap, tail=False)
    from_left = jax.lax.ppermute(send_up, _AXIS, _perm(ndev, 1))
    cid_left = jax.lax.ppermute(cid_up, _AXIS, _perm(ndev, 1))
    from_right = jax.lax.ppermute(send_dn, _AXIS, _perm(ndev, -1))
    cid_right = jax.lax.ppermute(cid_dn, _AXIS, _perm(ndev, -1))
    # chain ends: no wrap-around space
    inert_h = jnp.zeros((h_cap, _NCOLS), jnp.float32).at[:, 0:3].set(_BIG)
    inert_h = inert_h.at[:, _OID].set(-1.0)
    # chain-end sentinel cids sit OUTSIDE every queryable cell ([-1] below,
    # [num_cells] above) so inert rows can never inflate a real cell's range
    from_left = jnp.where(d == 0, inert_h, from_left)
    cid_left = jnp.where(d == 0, -1, cid_left)
    from_right = jnp.where(d == ndev - 1, inert_h, from_right)
    cid_right = jnp.where(d == ndev - 1, cfg.num_cells, cid_right)

    ext = jnp.concatenate([from_left, fields_s, from_right], axis=0)
    cid_ext = jnp.concatenate([cid_left, cid_s, cid_right])

    # ---- frozen window tables (rebins only) --------------------------------
    row_valid = ext[h_cap:h_cap + p_cap, _OID] >= 0.0
    capped = bool(cfg.capped_candidates) and sweeps == "pallas"
    fused = bool(cfg.capped_fused)
    if capped:
        def build_tabs(_):
            from ..ops import pallas_step_t as pt

            sub_src, cand_cid_f, cid_search, w_sub, dropped = \
                _capped_sub_frame(cfg, ext, cid_ext, sub_len,
                                  slab_lo, slab_hi)
            ws, wc = _pallas_sub_tables(cfg, cid_s, cid_search, sub_len,
                                        cnt2, tab_base, tab_cells)
            if not fused:
                return (ws, wc, sub_src, cand_cid_f, w_sub, dropped[None])
            # fused path: window tables for the SUB-frame blocks too (the
            # density pre-pass sweeps the sub frame from the sub frame)
            b = pt._blane(cfg)
            nblocks_sub = -(-sub_len // b)
            cid_sub_loc = jnp.concatenate(
                [cid_search,
                 jnp.full((nblocks_sub * b - sub_len,), cfg.num_cells,
                          jnp.int32)])
            n_kept = jnp.sum((cand_cid_f >= 0).astype(jnp.int32))
            ws_s, wc_s = _pallas_sub_tables(cfg, cid_sub_loc, cid_search,
                                            sub_len, n_kept, tab_base,
                                            tab_cells)
            return (ws, wc, sub_src, cand_cid_f, w_sub, dropped[None],
                    ws_s, wc_s)
    elif sweeps == "pallas":
        def build_tabs(_):
            return _pallas_tables(cfg, cid_s, cid_ext, h_cap, p_cap,
                                  cnt2, slab_hi, tab_base, tab_cells)
    else:
        def build_tabs(_):
            return _local_ranges(cfg, cid_ext, cid_s, row_valid,
                                 ext.shape[0])

    tabs2 = jax.lax.cond(need, build_tabs, lambda _: tabs, None)

    # ---- sweeps ------------------------------------------------------------
    pos_i = fields_s[:, _POS]
    vel_i = fields_s[:, _VEL]
    mass_i = fields_s[:, _MASS]

    if capped and fused:
        ws2, wc2, sub_src, cand_cid_f, w_sub, dropped1, ws_s, wc_s = tabs2
        g8 = ext[sub_src]          # one shared [S,8] gather for the pass
        rho_sub = _pallas_density_sub_local(
            cfg, g8, sub_src, cand_cid_f, w_sub, ws_s, wc_s, sub_len)
        # scatter kept LOCAL sub densities into local-row layout: the edge
        # exchange below then ships exactly the rows the fields halo ships,
        # so halo candidates read their owner's pre-pass value
        local_idx = sub_src - h_cap
        is_local = ((cand_cid_f >= 0) & (local_idx >= 0)
                    & (local_idx < p_cap))
        idx = jnp.where(is_local, local_idx, p_cap)
        rho_l = jnp.zeros((p_cap + 1,), jnp.float32).at[idx].set(
            jnp.where(is_local, rho_sub, 0.0))[:p_cap]
        nc_l = None                        # fused sweep emits the real ones
        trunc = dropped1[0]
    elif capped:
        ws2, wc2, sub_src, cand_cid_f, w_sub, dropped1 = tabs2
        g8 = ext[sub_src]          # one shared [S,8] gather for both sweeps
        rho_l, nc_l = _pallas_density_local_capped(
            cfg, ext, g8, cid_ext, ws2, wc2, sub_src, cand_cid_f, w_sub,
            h_cap, p_cap, sub_len)
        trunc = dropped1[0]                    # counted sub-frame overflow
    elif sweeps == "pallas":
        ws2, wc2 = tabs2
        rho_l, nc_l = _pallas_density_local(cfg, ext, cid_ext, ws2, wc2,
                                            h_cap, p_cap)
        trunc = jnp.zeros((), jnp.int32)      # exact multi-chunk tails
    else:
        rng_s, rng_e = tabs2
        own_idx = h_cap + jnp.arange(p_cap, dtype=jnp.int32)
        pos_e, vel_e, mass_e = ext[:, _POS], ext[:, _VEL], ext[:, _MASS]
        rho_l, nc_l, trunc = celllist.density_rows(
            cfg, pos_e, mass_e, rng_s, rng_e, own_idx, pos_i, mass_i,
            chunk=min(chunk, p_cap))

    # force needs halo densities: exchange rho for the same edge windows
    rho_up = jax.lax.dynamic_slice_in_dim(rho_l, jnp.maximum(cnt2 - h_cap, 0),
                                          h_cap)
    rho_dn = jax.lax.dynamic_slice_in_dim(rho_l, 0, h_cap)
    rho_left = jax.lax.ppermute(rho_up, _AXIS, _perm(ndev, 1))
    rho_right = jax.lax.ppermute(rho_dn, _AXIS, _perm(ndev, -1))
    rho_left = jnp.where(d == 0, 0.0, rho_left)
    rho_right = jnp.where(d == ndev - 1, 0.0, rho_right)
    rho_e = jnp.concatenate([rho_left, rho_l, rho_right])

    if capped and fused:
        # candidate densities: local sub rows read back their own pre-pass
        # value, halo sub rows the neighbor's (same kept set both sides —
        # _capped_sub_frame's oid tie-break)
        rho_cand = rho_e[sub_src]
        acc_l, rho_l, nc_l = _pallas_fused_local_capped(
            cfg, ext, g8, cid_ext, rho_cand, ws2, wc2, sub_src,
            cand_cid_f, w_sub, h_cap, p_cap, sub_len)
    elif capped:
        acc_l = _pallas_force_local_capped(
            cfg, ext, g8, cid_ext, rho_e, rho_l, ws2, wc2, sub_src,
            cand_cid_f, w_sub, h_cap, p_cap, sub_len)
    elif sweeps == "pallas":
        acc_l = _pallas_force_local(cfg, ext, cid_ext, rho_e, rho_l,
                                    ws2, wc2, h_cap, p_cap)
    else:
        acc_l = celllist.force_rows(
            cfg, pos_e, vel_e, mass_e, rho_e, rng_s, rng_e, own_idx,
            pos_i, vel_i, rho_l, chunk=min(chunk, p_cap))

    # ---- integrate (inert rows stay inert: acc 0, vel 0) ------------------
    # Inert rows ride through the integrator at a SAFE in-box point: the
    # far-away sentinel position would blow up reflect_boundary's crossing
    # times (inf/NaN) and poison the NaN-propagating PE tally; mass 0 keeps
    # every tally contribution at zero, and the store is re-written to the
    # inert sentinel after integration regardless.
    safe = jnp.asarray(cfg.central_pos, jnp.float32)
    acc_l = jnp.where(row_valid[:, None], acc_l, 0.0)
    local_state = ParticleState(
        position=jnp.where(row_valid[:, None], pos_i, safe),
        velocity=jnp.where(row_valid[:, None], vel_i, 0.0),
        mass=jnp.where(row_valid, mass_i, 0.0),
        density=rho_l,
        acceleration=acc_l,
        neighbor_count=nc_l,
    )
    new_state, tally = kdk_integrate(cfg, local_state, acc_l)
    new_fields = jnp.concatenate(
        [new_state.position, new_state.velocity,
         mass_i[:, None], fields_s[:, _OID:_OID + 1]], axis=1)
    new_fields = jnp.where(row_valid[:, None], new_fields, inert_row)

    # ---- tallies + diagnostics (fused collectives) -------------------------
    # Inert rows contribute mass 0 / vel 0 -> KE 0, but PE uses G*M*m/(r):
    # mass 0 zeroes it; NaN-safety holds since positions finite.  |L| must
    # psum the VECTOR before taking the norm (sum of per-shard norms is not
    # the norm of the global sum) — kdk's tally carries l_vec for exactly
    # this.  Every psum-able per-step scalar rides ONE [10] psum and both
    # neighbor extrema ride ONE pmax (pmin(x) = -pmax(-x)): collectives are
    # per-step ICI latency on real meshes, and separate [p_cap] reduces
    # defeat XLA's epilogue fusion the same way the old per-scalar tally
    # did (tools/probe_tally.py).
    valid_n = new_fields[:, _OID] >= 0.0
    nc_w = jnp.where(row_valid, nc_l, 0)
    # an undersized halo window misses plane rows: COUNT them (valid rows in
    # an edge plane minus those the fixed window could carry).  The two edge
    # occupancy sums ride the same stacked reduce as the neighbor stats.
    top_plane = row_valid & (cid_s >= slab_hi - nxny)
    bot_plane = row_valid & (cid_s < slab_lo + nxny)
    nc_cols = jnp.stack([valid_n, nc_w.astype(jnp.float32),
                         top_plane, bot_plane], axis=1)
    s_nc = jnp.sum(nc_cols, axis=0)   # [4]: n_valid, nc_sum, pop_top, pop_bot
    halo_missed = (jnp.maximum(s_nc[2] - h_cap, 0.0)
                   + jnp.maximum(s_nc[3] - h_cap, 0.0))
    sums = jnp.stack([
        tally.kinetic, tally.potential,
        tally.l_vec[0], tally.l_vec[1], tally.l_vec[2],
        s_nc[0], s_nc[1],
        jnp.sum(trunc).astype(jnp.float32),
        halo_missed,
        (mig_dropped + overflow).astype(jnp.float32)])
    S = jax.lax.psum(sums, _AXIS)
    extrema = jax.lax.pmax(jnp.stack([
        jnp.max(nc_w).astype(jnp.float32),
        -jnp.min(jnp.where(row_valid, nc_l, jnp.int32(2**30)))
        .astype(jnp.float32)]), _AXIS)
    if cfg.compat:
        am = jnp.zeros((), jnp.float32)   # reference always logs 0 (quirk 8)
    else:
        am = jnp.linalg.norm(S[2:5])

    diag_vec = jnp.stack([
        S[0], S[1], am,
        S[6] / jnp.maximum(S[5], 1.0),
        extrema[0], -extrema[1],
        S[7], S[8], S[9]])
    steps2 = jnp.where(need, 0, steps_since[0] + 1)
    rebin2 = rebin_count[0] + need.astype(jnp.int32)
    return (new_fields, cnt2[None], pos_bin2, cid_s, tabs2,
            steps2[None], rebin2[None], diag_vec[None])


def _table_zeros(cfg: SphConfig, sweeps: str, ndev: int, p_cap: int,
                 sub_len: int = 0):
    """Placeholder frozen tables for the pre-first-rebin carry."""
    if sweeps == "pallas":
        from ..ops import pallas_step_t as pt

        tsize = (p_cap // pt._blane(cfg)) * cfg.pallas_groups * pt._nrods(cfg)
        tabs = (jnp.zeros((ndev * tsize,), jnp.int32),
                jnp.zeros((ndev * tsize,), jnp.int32))
        if cfg.capped_candidates:
            tabs += (jnp.zeros((ndev * sub_len,), jnp.int32),
                     jnp.zeros((ndev * sub_len,), jnp.float32),
                     jnp.zeros((ndev * sub_len,), jnp.float32),
                     jnp.zeros((ndev,), jnp.int32))
            if cfg.capped_fused:
                ssize = (-(-sub_len // pt._blane(cfg))
                         * cfg.pallas_groups * pt._nrods(cfg))
                tabs += (jnp.zeros((ndev * ssize,), jnp.int32),
                         jnp.zeros((ndev * ssize,), jnp.int32))
        return tabs
    return (jnp.zeros((ndev * p_cap, 9), jnp.int32),
            jnp.zeros((ndev * p_cap, 9), jnp.int32))


def init_lazy_slab(cfg: SphConfig, mesh: Mesh, carry: SlabCarry,
                   p_cap: int, sweeps: str = "celllist",
                   sub_len: int = 0) -> LazySlabCarry:
    """Wrap a freshly distributed store with empty frozen structure.

    ``steps_since = -1`` forces the first step to migrate/sort/build tables.
    """
    ndev = math.prod(mesh.devices.shape)
    sh = NamedSharding(mesh, P(_AXIS))
    tabs = _table_zeros(cfg, sweeps, ndev, p_cap, sub_len)
    put = lambda x: jax.device_put(x, sh)
    return LazySlabCarry(
        fields=carry.fields, count=carry.count,
        pos_bin=put(jnp.zeros((ndev * p_cap, 3), jnp.float32)),
        cid=put(jnp.zeros((ndev * p_cap,), jnp.int32)),
        tabs=tuple(put(t) for t in tabs),
        steps_since=put(jnp.full((ndev,), -1, jnp.int32)),
        rebin_count=put(jnp.zeros((ndev,), jnp.int32)),
    )


def derive_sub_len_slab(cfg: SphConfig, state: ParticleState, ndev: int,
                        zsplit: tuple[int, ...], margin: float = 1.15) -> int:
    """Host-side: bound the densest device's kept-candidate count (own slab
    + both halo planes) for the capped slab engine; 128-rounded."""
    import numpy as np

    from ..ops.grid import cell_coords, linear_cell_id

    if not cfg.capped_candidates:
        return 0
    cid = np.asarray(linear_cell_id(cfg, cell_coords(cfg, state.position)))
    occ = np.bincount(cid, minlength=cfg.num_cells)
    kept = np.minimum(occ, cfg.capped_candidates)
    nxny = cfg.grid_nx * cfg.grid_ny
    per_plane = kept.reshape(cfg.grid_nz, nxny).sum(axis=1)
    worst = 0
    for d in range(ndev):
        lo, hi = zsplit[d], zsplit[d + 1]
        own = per_plane[lo:hi].sum()
        halo = (per_plane[lo - 1] if lo > 0 else 0) \
            + (per_plane[hi] if hi < cfg.grid_nz else 0)
        worst = max(worst, int(own + halo))
    return -(-int(worst * margin + 128) // 128) * 128


def slab_imbalance(carry) -> float:
    """max/mean ratio of per-device valid-row counts (1.0 = perfect)."""
    import numpy as np

    counts = np.asarray(carry.count).astype(np.float64)
    return float(counts.max() / max(counts.mean(), 1.0))


def maybe_rebalance(cfg: SphConfig, mesh: Mesh, carry, n: int,
                    threshold: float = 1.5, headroom: float = 1.5):
    """Host-side dynamic re-partition (call at block/checkpoint boundaries).

    The zsplit frozen at t=0 goes stale when mass re-concentrates (a splash
    collapsing to the box floor); the only guard inside the step is counted
    drops.  This recomputes the z-plane histogram from the CURRENT particle
    distribution and, when the per-device load imbalance exceeds
    ``threshold``, re-collects and re-distributes the store under a fresh
    occupancy-weighted split (same machinery as ``derive_zsplit`` at t=0).

    Returns ``(carry, zsplit, caps, sub_len, changed)``; when ``changed``
    the caller must rebuild its step function for the new
    ``zsplit``/``caps``/``sub_len`` (a recompile — which is why this belongs
    at block boundaries, like the CLI's mid-run --apply).  ``sub_len`` is the
    re-derived capped sub-frame bound (0 when ``cfg.capped_candidates`` is
    off) — the t=0 bound goes stale with the partition, same as the caps.
    Collectives never run here: pure host work.
    """
    ndev = math.prod(mesh.devices.shape)
    if slab_imbalance(carry) <= threshold:
        return carry, None, None, None, False
    state = collect(carry, n)
    zsplit = derive_zsplit(cfg, state, ndev)
    caps = derive_slab_caps(cfg, state, ndev, headroom=headroom, zsplit=zsplit)
    sub_len = derive_sub_len_slab(cfg, state, ndev, zsplit)
    new_carry = distribute(cfg, state, mesh, caps[0], zsplit=zsplit)
    return new_carry, zsplit, caps, sub_len, True


def make_slab_step(cfg: SphConfig, mesh: Mesh, p_cap: int, h_cap: int,
                   m_cap: int, chunk: int = 1024, donate: bool = True,
                   sweeps: str = "celllist",
                   zsplit: tuple[int, ...] | None = None, lazy: bool = True,
                   sub_len: int | None = None, scan_block: int = 0
                   ) -> Callable[[SlabCarry | LazySlabCarry],
                                 tuple[LazySlabCarry, StepDiagnostics]]:
    """Fully-distributed step over ``mesh`` (see module docstring).

    ``sweeps="pallas"`` runs the SAME production sublane kernels as the
    single-chip path inside each device's shard (requires p_cap and h_cap to
    be multiples of 128; interpret mode on CPU).  ``"celllist"`` uses the
    portable XLA sweeps.

    ``lazy=True`` (default) freezes the per-device sort + window tables
    between rebins under the cell - h displacement-SPREAD skin — the
    distributed port of the single-chip lazy driver, amortizing the per-step
    rebuild the reference pays on every step
    (/root/reference/src/sph.cpp:438-481).  ``lazy=False`` rebins (and
    migrates) every step.

    ``scan_block=K`` (K > 1) runs K physics steps per dispatch via
    ``lax.scan``: the returned callable advances K steps per call and its
    ``StepDiagnostics`` leaves carry a leading [K] axis.  This is the slab
    port of the lazy driver's dispatch-amortization dial — at small per-chip
    loads (strong scaling, ~125k/chip) the ~2.4 ms tunnel dispatch plus the
    per-call output/diag fetch floor is a large share of the step, while at
    1M/chip it hides under the device step (docs/PERFORMANCE.md r3 #12).

    Accepts a plain ``SlabCarry`` (auto-initialized) or a ``LazySlabCarry``
    from a previous call; returns a ``LazySlabCarry``.
    """
    ndev = math.prod(mesh.devices.shape)
    _nzs(cfg, ndev)
    if zsplit is None:
        zsplit = uniform_zsplit(cfg, ndev)
    zsplit = tuple(int(z) for z in zsplit)
    if (len(zsplit) != ndev + 1 or zsplit[0] != 0
            or zsplit[-1] != cfg.grid_nz
            or any(b - a < 2 for a, b in zip(zsplit, zsplit[1:]))):
        raise ValueError(f"invalid zsplit {zsplit}: need {ndev + 1} "
                         "monotone entries spanning [0, grid_nz], >= 2 "
                         "planes per device")
    if sweeps not in ("celllist", "pallas"):
        raise ValueError(f"unknown sweeps engine: {sweeps!r}")
    if cfg.capped_candidates and sweeps != "pallas":
        raise ValueError("capped_candidates needs the pallas slab sweeps "
                         "(the celllist slab path has no subsample)")
    if sweeps == "pallas":
        if p_cap % 128 or h_cap % 128:
            raise ValueError("pallas sweeps need p_cap and h_cap % 128 == 0")
        if cfg.pallas_window_t <= 0:
            raise ValueError("pallas sweeps need pallas_window_t > 0 "
                             "(derive via ops.pallas_step_t.derive_window_t)")
        # same kernel constraints as the single-chip path (compat off,
        # groups/window shape, capped needs groups=1 and f32-exact row ids)
        from ..ops import pallas_step_t as pt

        pt._validate(cfg)
        if p_cap % pt._blane(cfg) or h_cap % pt._blane(cfg):
            raise ValueError("p_cap and h_cap must be multiples of "
                             "pallas_block_t (derive_slab_caps rounds "
                             "accordingly)")
    if cfg.capped_candidates and sweeps == "pallas":
        e = p_cap + 2 * h_cap
        sub_len = min(sub_len or e, e)
    else:
        sub_len = 0

    body = partial(slab_step_body, cfg, ndev, p_cap, h_cap, m_cap, chunk,
                   sweeps, zsplit, lazy, sub_len)
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(_AXIS),) * 4 + (P(_AXIS),) + (P(_AXIS),) * 2,
        out_specs=(P(_AXIS),) * 4 + (P(_AXIS),) + (P(_AXIS),) * 3,
        # pallas_call outputs don't carry vma annotations yet; the body is
        # manually-sharded SPMD either way
        check_vma=False,
    )

    def _diag(dv) -> StepDiagnostics:
        """[..., 9] psum'd diagnostic vector -> StepDiagnostics pytree."""
        zeros = jnp.zeros(dv.shape[:-1], jnp.int32)
        return StepDiagnostics(
            kinetic_energy=dv[..., 0], potential_energy=dv[..., 1],
            angular_momentum=dv[..., 2], neighbor_mean=dv[..., 3],
            neighbor_max=dv[..., 4].astype(jnp.int32),
            neighbor_min=dv[..., 5].astype(jnp.int32),
            overflow_cells=zeros,
            truncated_ranges=dv[..., 6].astype(jnp.int32),
            halo_dropped=dv[..., 7].astype(jnp.int32),
            migration_dropped=dv[..., 8].astype(jnp.int32),
        )

    def _step(carry: LazySlabCarry) -> tuple[LazySlabCarry, StepDiagnostics]:
        (fields, count, pos_bin, cid, tabs, steps_since, rebins,
         diag_rows) = sharded(carry.fields, carry.count, carry.pos_bin,
                              carry.cid, carry.tabs,
                              carry.steps_since, carry.rebin_count)
        return LazySlabCarry(fields, count, pos_bin, cid, tabs,
                             steps_since, rebins), _diag(diag_rows[0])

    def _step_scan(carry: LazySlabCarry
                   ) -> tuple[LazySlabCarry, StepDiagnostics]:
        def body(c: LazySlabCarry, _):
            (fields, count, pos_bin, cid, tabs, steps_since, rebins,
             diag_rows) = sharded(c.fields, c.count, c.pos_bin, c.cid,
                                  c.tabs, c.steps_since, c.rebin_count)
            return (LazySlabCarry(fields, count, pos_bin, cid, tabs,
                                  steps_since, rebins), diag_rows[0])

        carry, dvs = jax.lax.scan(body, carry, None, length=scan_block)
        return carry, _diag(dvs)   # [K, 9] -> leaves with leading [K]

    jitted = jax.jit(_step_scan if scan_block > 1 else _step,
                     donate_argnums=(0,) if donate else ())

    def step(carry):
        if not isinstance(carry, LazySlabCarry):
            carry = init_lazy_slab(cfg, mesh, carry, p_cap, sweeps, sub_len)
        return jitted(carry)

    return step
