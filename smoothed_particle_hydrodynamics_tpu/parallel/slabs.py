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
* migration: after the drift, leavers are compacted by a pair sort and the
  first ``m_cap`` per direction are exchanged; arrivals append at the local
  tail.  Capacity misses are COUNTED (``migration_dropped``), never silent.

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
    m_cap = max(h_cap // 2, 64)
    # 128-multiples so the pallas sweep variant's lane blocks tile exactly
    rnd = lambda v: -(-v // 128) * 128
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


def _pallas_density_local(cfg: SphConfig, ext, cid_ext, h_cap: int,
                          p_cap: int):
    """Density over local rows with the production sublane pallas kernel.

    Same kernel as the single-chip path (``ops.pallas_step_t``): the extended
    [halo | local | halo] rows become the candidate field array, windows are
    built per local 128-lane block searching the extended cids, and ``own``
    indices are offset by the halo so self-exclusion works in the extended
    frame.  Out-of-grid sentinel cids only add inert rows at the array ends
    (clipped in the histogram, rejected by the in-kernel cid mask).
    """
    from functools import partial as _partial

    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt

    s_t = cfg.pallas_window_t
    e = ext.shape[0]
    e_pad = pt._round_up(e + s_t, pt.LANE)
    nblocks = p_cap // pt.BLANE
    cid_f = cid_ext.astype(jnp.float32)
    cand = jnp.concatenate(
        [ext[:, 0:3], cid_f[:, None], ext[:, _MASS:_MASS + 1]], axis=1)
    pad = jnp.zeros((e_pad - e, 5), jnp.float32).at[:, 3].set(-10.0)
    cand = jnp.concatenate([cand, pad], axis=0)
    fields = pt._pad_rows(cand, e_pad, pt.LANE)
    loc = slice(h_cap, h_cap + p_cap)
    selfrows = jnp.concatenate(
        [ext[loc, 0:3], ext[loc, _MASS:_MASS + 1], cid_f[loc][:, None]],
        axis=1).T
    ws, wc = pt._block_windows_t(cfg, cid_ext[loc], nblocks, s_t, p_cap,
                                 e_pad, cid_search=cid_ext)
    ws, wc = ws.reshape(-1), wc.reshape(-1)
    first = jnp.arange(nblocks, dtype=jnp.int32) * pt.BLANE + h_cap
    ref = ext[first, 0:3].reshape(-1)
    out_specs = (
        pl.BlockSpec((1, pt.BLANE), lambda i, *_: (0, i),
                     memory_space=pt.pltpu.VMEM),
        pl.BlockSpec((1, pt.BLANE), lambda i, *_: (0, i),
                     memory_space=pt.pltpu.VMEM),
    )
    rho, nc = pl.pallas_call(
        _partial(pt._density_kernel_t, cfg, s_t, h_cap // pt.BLANE),
        out_shape=(jax.ShapeDtypeStruct((1, p_cap), jnp.float32),
                   jax.ShapeDtypeStruct((1, p_cap), jnp.int32)),
        grid_spec=pt._grid_spec_t(nblocks, 5, s_t, cfg.pallas_groups,
                                  out_specs),
        interpret=cfg.pallas_interpret,
    )(ws, wc, ref, fields, selfrows)
    return rho.reshape(p_cap), nc.reshape(p_cap)


def _pallas_force_local(cfg: SphConfig, ext, cid_ext, rho_e, rho_l,
                        h_cap: int, p_cap: int):
    """Hydro acceleration over local rows with the production pallas kernel."""
    from functools import partial as _partial

    from jax.experimental import pallas as pl

    from ..ops import pallas_step_t as pt
    from ..ops import physics

    s_t = cfg.pallas_window_t
    e = ext.shape[0]
    e_pad = pt._round_up(e + s_t, pt.LANE)
    nblocks = p_cap // pt.BLANE
    cid_f = cid_ext.astype(jnp.float32)
    mass_e = ext[:, _MASS]
    rhoj_inv = 1.0 / jnp.where(rho_e > 0.0, rho_e, 1.0)
    p_j = (rho_e - _f32(cfg.rho0)) * _f32(cfg.stiffness)
    rimj = rhoj_inv * mass_e
    mjpwj = mass_e * (p_j * rhoj_inv * rhoj_inv)
    ones = jnp.ones((e, 1), jnp.float32)
    cand = jnp.concatenate(
        [ext[:, 0:3], ones, rimj[:, None] * ext[:, 3:6], rimj[:, None],
         cid_f[:, None], mass_e[:, None], mjpwj[:, None]], axis=1)
    pad = jnp.zeros((e_pad - e, cand.shape[1]), jnp.float32).at[:, 8].set(-10.0)
    cand = jnp.concatenate([cand, pad], axis=0)
    fields = pt._pad_rows(cand, e_pad, pt.LANE)
    loc = slice(h_cap, h_cap + p_cap)
    selfrows = jnp.concatenate(
        [ext[loc, 0:3], ext[loc, 3:6], ext[loc, _MASS:_MASS + 1],
         rho_l[:, None], cid_f[loc][:, None]], axis=1).T
    ws, wc = pt._block_windows_t(cfg, cid_ext[loc], nblocks, s_t, p_cap,
                                 e_pad, cid_search=cid_ext)
    ws, wc = ws.reshape(-1), wc.reshape(-1)
    first = jnp.arange(nblocks, dtype=jnp.int32) * pt.BLANE + h_cap
    ref = ext[first, 0:3].reshape(-1)
    acc_rows = pl.pallas_call(
        _partial(pt._force_kernel_t, cfg, s_t, h_cap // pt.BLANE),
        out_shape=jax.ShapeDtypeStruct((3, p_cap), jnp.float32),
        grid_spec=pt._grid_spec_t(nblocks, 9, s_t, cfg.pallas_groups,
                                  pl.BlockSpec((3, pt.BLANE),
                                               lambda i, *_: (0, i),
                                               memory_space=pt.pltpu.VMEM)),
        interpret=cfg.pallas_interpret,
    )(ws, wc, ref, fields, selfrows)
    acc = acc_rows.T
    pos_l = ext[loc, 0:3]
    acc = acc + physics.central_gravity(cfg, pos_l)
    acc = acc + jnp.asarray(cfg.gravity, jnp.float32)
    return physics.cfl_clamp(cfg, acc)


def slab_step_body(cfg: SphConfig, ndev: int, p_cap: int, h_cap: int,
                   m_cap: int, chunk: int, sweeps: str,
                   zsplit: tuple[int, ...], fields: jnp.ndarray,
                   count: jnp.ndarray):
    """shard_map body: one full physics step on one device's slab."""
    nxny = cfg.grid_nx * cfg.grid_ny
    d = jax.lax.axis_index(_AXIS)
    cnt = count[0]
    zs = jnp.asarray(zsplit, jnp.int32)       # [D+1] plane split table
    slab_lo = zs[d] * nxny                    # first own cell id
    slab_hi = zs[d + 1] * nxny                # one-past-last own cell id

    # ---- local binning + sort --------------------------------------------
    fields_s, cid_s = _sort_local(cfg, fields, slab_hi)

    # ---- halo exchange (one cell plane each way) -------------------------
    send_up, cid_up = _edge_window(        # my top plane, for right neighbor
        fields_s, cid_s, cnt, h_cap, tail=True)
    send_dn, cid_dn = _edge_window(        # my bottom plane, for left neighbor
        fields_s, cid_s, cnt, h_cap, tail=False)
    # an undersized halo window misses plane rows: COUNT them (valid rows in
    # an edge plane minus those the fixed window could carry)
    valid_s = fields_s[:, _OID] >= 0.0
    pop_top = jnp.sum(valid_s & (cid_s >= slab_hi - nxny)).astype(jnp.int32)
    pop_bot = jnp.sum(valid_s & (cid_s < slab_lo + nxny)).astype(jnp.int32)
    halo_missed = (jnp.maximum(pop_top - h_cap, 0)
                   + jnp.maximum(pop_bot - h_cap, 0))

    from_left = jax.lax.ppermute(send_up, _AXIS, _perm(ndev, 1))
    cid_left = jax.lax.ppermute(cid_up, _AXIS, _perm(ndev, 1))
    from_right = jax.lax.ppermute(send_dn, _AXIS, _perm(ndev, -1))
    cid_right = jax.lax.ppermute(cid_dn, _AXIS, _perm(ndev, -1))
    # chain ends: no wrap-around space
    inert = jnp.zeros((h_cap, _NCOLS), jnp.float32).at[:, 0:3].set(_BIG)
    inert = inert.at[:, _OID].set(-1.0)
    # chain-end sentinel cids sit OUTSIDE every queryable cell ([-1] below,
    # [num_cells] above) so inert rows can never inflate a real cell's range
    from_left = jnp.where(d == 0, inert, from_left)
    cid_left = jnp.where(d == 0, -1, cid_left)
    from_right = jnp.where(d == ndev - 1, inert, from_right)
    cid_right = jnp.where(d == ndev - 1, cfg.num_cells, cid_right)

    ext = jnp.concatenate([from_left, fields_s, from_right], axis=0)
    cid_ext = jnp.concatenate([cid_left, cid_s, cid_right])

    # ---- candidate ranges + sweeps ---------------------------------------
    row_valid = ext[h_cap:h_cap + p_cap, _OID] >= 0.0
    pos_i = fields_s[:, _POS]
    vel_i = fields_s[:, _VEL]
    mass_i = fields_s[:, _MASS]

    if sweeps == "pallas":
        rho_l, nc_l = _pallas_density_local(cfg, ext, cid_ext, h_cap, p_cap)
        trunc = jnp.zeros((), jnp.int32)      # exact multi-chunk tails
    else:
        rng_s, rng_e = _local_ranges(cfg, cid_ext, cid_s, row_valid,
                                     ext.shape[0])
        own_idx = h_cap + jnp.arange(p_cap, dtype=jnp.int32)
        pos_e, vel_e, mass_e = ext[:, _POS], ext[:, _VEL], ext[:, _MASS]
        rho_l, nc_l, trunc = celllist.density_rows(
            cfg, pos_e, mass_e, rng_s, rng_e, own_idx, pos_i, mass_i,
            chunk=min(chunk, p_cap))

    # force needs halo densities: exchange rho for the same edge windows
    rho_up = jax.lax.dynamic_slice_in_dim(rho_l, jnp.maximum(cnt - h_cap, 0), h_cap)
    rho_dn = jax.lax.dynamic_slice_in_dim(rho_l, 0, h_cap)
    rho_left = jax.lax.ppermute(rho_up, _AXIS, _perm(ndev, 1))
    rho_right = jax.lax.ppermute(rho_dn, _AXIS, _perm(ndev, -1))
    rho_left = jnp.where(d == 0, 0.0, rho_left)
    rho_right = jnp.where(d == ndev - 1, 0.0, rho_right)
    rho_e = jnp.concatenate([rho_left, rho_l, rho_right])

    if sweeps == "pallas":
        acc_l = _pallas_force_local(cfg, ext, cid_ext, rho_e, rho_l,
                                    h_cap, p_cap)
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
    new_fields = jnp.where(row_valid[:, None], new_fields,
                           jnp.zeros((1, _NCOLS), jnp.float32)
                           .at[0, 0:3].set(_BIG).at[0, _OID].set(-1.0))

    # tallies: inert rows contribute mass 0 / vel 0 -> KE 0, but PE uses
    # G*M*m/(r): mass 0 zeroes it; NaN-safety holds since positions finite.
    # |L| must psum the VECTOR before taking the norm (sum of per-shard norms
    # is not the norm of the global sum); recompute L locally at the same
    # post-kick point energy_tally uses and reduce it as a 3-vector.
    ke = jax.lax.psum(tally.kinetic, _AXIS)
    pe = jax.lax.psum(tally.potential, _AXIS)
    if cfg.compat:
        am = jnp.zeros((), jnp.float32)   # reference always logs 0 (quirk 8)
    else:
        from ..ops.integrate import angular_momentum_vec

        l_vec = angular_momentum_vec(cfg, new_state.position,
                                     new_state.velocity, new_state.mass)
        am = jnp.linalg.norm(jax.lax.psum(l_vec, _AXIS))

    # ---- migration --------------------------------------------------------
    zp = jnp.clip(jnp.floor(new_fields[:, 2] * _f32(cfg.inv_cell_size))
                  .astype(jnp.int32), 0, cfg.grid_nz - 1)
    dest = jnp.clip(jnp.searchsorted(zs, zp, side="right") - 1, 0, ndev - 1)
    valid_n = new_fields[:, _OID] >= 0.0
    # one-hop exchange only: a particle crossing MORE than one slab in a
    # single step (>= nzs cell-planes of z drift — far beyond any CFL-sane
    # velocity) cannot be routed without breaking the in-slab cid invariant
    # the sort/halo machinery relies on; it is dropped AND counted.
    go_left = valid_n & (dest == d - 1)
    go_right = valid_n & (dest == d + 1)
    stay = valid_n & (dest == d)
    too_far = valid_n & (jnp.abs(dest - d) > 1)
    n_too_far = jnp.sum(too_far.astype(jnp.int32))
    # compact: stayers (key 0) | left-leavers (1) | right-leavers (2) | inert (3)
    key = jnp.where(stay, 0, jnp.where(go_left, 1, jnp.where(go_right, 2, 3)))
    key = key.astype(jnp.int32)
    _, perm2 = jax.lax.sort(
        (key, jnp.arange(p_cap, dtype=jnp.int32)), num_keys=1)
    packed = new_fields[perm2]
    n_stay = jnp.sum(stay.astype(jnp.int32))
    n_left = jnp.sum(go_left.astype(jnp.int32))
    n_right = jnp.sum(go_right.astype(jnp.int32))

    # pad so take()'s dynamic start (<= p_cap) never clamps into stayer rows
    inert_row = jnp.zeros((1, _NCOLS), jnp.float32) \
        .at[0, 0:3].set(_BIG).at[0, _OID].set(-1.0)
    packed_pad = jnp.concatenate(
        [packed, jnp.broadcast_to(inert_row, (m_cap, _NCOLS))], axis=0)

    def take(start, n_take):
        rows = jax.lax.dynamic_slice_in_dim(packed_pad, start, m_cap)
        live = jnp.arange(m_cap, dtype=jnp.int32) < n_take
        return jnp.where(live[:, None], rows, inert_row)

    # dropped = leavers beyond m_cap + multi-slab hops (counted, never
    # silently relocated)
    mig_dropped = (jnp.maximum(n_left - m_cap, 0)
                   + jnp.maximum(n_right - m_cap, 0) + n_too_far)
    out_left = take(n_stay, jnp.minimum(n_left, m_cap))
    out_right = take(n_stay + n_left, jnp.minimum(n_right, m_cap))

    in_from_right = jax.lax.ppermute(out_left, _AXIS, _perm(ndev, -1))
    in_from_left = jax.lax.ppermute(out_right, _AXIS, _perm(ndev, 1))
    inert_m = jnp.zeros((m_cap, _NCOLS), jnp.float32) \
        .at[:, 0:3].set(_BIG).at[:, _OID].set(-1.0)
    in_from_right = jnp.where(d == ndev - 1, inert_m, in_from_right)
    in_from_left = jnp.where(d == 0, inert_m, in_from_left)
    n_in_l = jnp.sum(in_from_left[:, _OID] >= 0.0).astype(jnp.int32)
    n_in_r = jnp.sum(in_from_right[:, _OID] >= 0.0).astype(jnp.int32)

    # rebuild local store: stayers then arrivals, inert tail
    base = jnp.zeros((p_cap + 2 * m_cap, _NCOLS), jnp.float32) \
        .at[:, 0:3].set(_BIG).at[:, _OID].set(-1.0)
    live_stay = jnp.arange(p_cap, dtype=jnp.int32) < n_stay
    base = base.at[0:p_cap].set(
        jnp.where(live_stay[:, None], packed,
                  jnp.zeros((1, _NCOLS), jnp.float32)
                  .at[0, 0:3].set(_BIG).at[0, _OID].set(-1.0)))
    base = jax.lax.dynamic_update_slice_in_dim(base, in_from_left, n_stay, axis=0)
    base = jax.lax.dynamic_update_slice_in_dim(
        base, in_from_right, n_stay + n_in_l, axis=0)
    new_count = n_stay + n_in_l + n_in_r
    overflow = jnp.maximum(new_count - p_cap, 0)
    new_count = jnp.minimum(new_count, p_cap)
    out_fields = base[0:p_cap]

    # ---- diagnostics -------------------------------------------------------
    n_total = jax.lax.psum(jnp.sum(valid_n.astype(jnp.int32)), _AXIS)
    nc_sum = jax.lax.psum(jnp.sum(jnp.where(row_valid, nc_l, 0)), _AXIS)
    nc_max = jax.lax.pmax(jnp.max(jnp.where(row_valid, nc_l, 0)), _AXIS)
    nc_min = jax.lax.pmin(
        jnp.min(jnp.where(row_valid, nc_l, jnp.int32(2**30))), _AXIS)
    truncated = jax.lax.psum(jnp.sum(trunc).astype(jnp.int32), _AXIS)
    halo_miss = jax.lax.psum(halo_missed.astype(jnp.int32), _AXIS)
    mig_drop = jax.lax.psum((mig_dropped + overflow).astype(jnp.int32), _AXIS)

    diag_vec = jnp.stack([
        ke, pe, am,
        nc_sum.astype(jnp.float32) / jnp.maximum(n_total, 1).astype(jnp.float32),
        nc_max.astype(jnp.float32), nc_min.astype(jnp.float32),
        truncated.astype(jnp.float32), halo_miss.astype(jnp.float32),
        mig_drop.astype(jnp.float32)])
    return out_fields, new_count[None], diag_vec[None]


def make_slab_step(cfg: SphConfig, mesh: Mesh, p_cap: int, h_cap: int,
                   m_cap: int, chunk: int = 1024, donate: bool = True,
                   sweeps: str = "celllist",
                   zsplit: tuple[int, ...] | None = None
                   ) -> Callable[[SlabCarry], tuple[SlabCarry, StepDiagnostics]]:
    """Jitted fully-distributed step over ``mesh`` (see module docstring).

    ``sweeps="pallas"`` runs the SAME production sublane kernels as the
    single-chip path inside each device's shard (requires p_cap and h_cap to
    be multiples of 128; interpret mode on CPU).  ``"celllist"`` uses the
    portable XLA sweeps."""
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
    if sweeps == "pallas":
        if p_cap % 128 or h_cap % 128:
            raise ValueError("pallas sweeps need p_cap and h_cap % 128 == 0")

    body = partial(slab_step_body, cfg, ndev, p_cap, h_cap, m_cap, chunk,
                   sweeps, zsplit)
    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(_AXIS), P(_AXIS)),
        out_specs=(P(_AXIS), P(_AXIS), P(_AXIS)),
        # pallas_call outputs don't carry vma annotations yet; the body is
        # manually-sharded SPMD either way
        check_vma=False,
    )

    def step(carry: SlabCarry) -> tuple[SlabCarry, StepDiagnostics]:
        fields, count, diag_rows = sharded(carry.fields, carry.count)
        dv = diag_rows[0]
        diag = StepDiagnostics(
            kinetic_energy=dv[0], potential_energy=dv[1],
            angular_momentum=dv[2], neighbor_mean=dv[3],
            neighbor_max=dv[4].astype(jnp.int32),
            neighbor_min=dv[5].astype(jnp.int32),
            overflow_cells=jnp.zeros((), jnp.int32),
            truncated_ranges=dv[6].astype(jnp.int32),
            halo_dropped=dv[7].astype(jnp.int32),
            migration_dropped=dv[8].astype(jnp.int32),
        )
        return SlabCarry(fields, count), diag

    return jax.jit(step, donate_argnums=(0,) if donate else ())
