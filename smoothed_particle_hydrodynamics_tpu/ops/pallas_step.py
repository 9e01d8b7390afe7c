"""Fused Pallas density + force kernels.

Why a kernel at all: the XLA cell-list backend spends ~95% of its time in
gathers (measured ~0.4M gathered rows/ms on v5e — 20x slower than streaming).
The sorted cell-list layout makes gathers unnecessary: for a block of B
consecutive *sorted* particles, each (dy,dz) stencil rod contributes one
**contiguous index window** (x-adjacent cells are adjacent in sorted order,
see ``ops/grid.py``).  The kernel replaces B x R x S random gathers with 9
contiguous-slab DMAs per block (fields stored tiled [N/128, F, 128] so each
window is ONE descriptor), double-buffered one block ahead.

Pair validity is decided IN-KERNEL from cell ids carried as a candidate
field: candidate j belongs to rod delta of particle i's cell c iff
``|cid_j - c - delta| <= 1`` — linear-id wraparound false-positives (x/y/z
edges) are provably eliminated by the d^2 < h^2 test, since wrapped cells are
at least a box-width away.  This removes the per-particle range tables (a
[N,18] gather measured at 29 ms/step at 1M) entirely; per-block DMA windows
come from the block's first/last cell only.

Window unions require sign-FREE stencil rods, so the kernel always uses the
27-cell stencil (9 rods, per-cell constants); with the octant stencil a block
mixes half-space signs and its union windows span ~2 plane populations
(measured p75 ~35k rows at 1M).

Blocks whose windows exceed the static window size (rod/plane-straddling
blocks, <2% after the sign-free stencil) are processed exactly by a dynamic
``fori_loop`` over window-sized chunks — nothing is silently dropped.

Reference counterpart: the SSE inner loop + density/force loops at
/root/reference/src/sph.cpp:598-683,721-766,778-934.  Compat-mode quirks are
order-dependent and stay on the XLA/compat path; this kernel is default-mode
only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SphConfig
from ..state import ParticleState
from . import celllist, physics
from .grid import build_grid, unsort

_f32 = jnp.float32

LANE = 128  # TPU lane width; DMA windows are aligned to it


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# The 9 stencil rods in (dy, dz) row-major order; linear-id offset is
# (dz*ny + dy)*nx per rod.
_RODS = [(dy, dz) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def _check_grid_nondegenerate(cfg: SphConfig) -> None:
    """The in-kernel rod test ``|cid_j - cid_i - delta| <= 1`` assumes rod
    deltas (multiples of grid_nx) are >= 3 apart and that linear-id-wrapped
    cells are > h away; grids narrower than 3 cells in any axis make rod
    acceptance windows overlap and wraparound pairs survive the d^2 < h^2
    test (double counting)."""
    if min(cfg.grid_nx, cfg.grid_ny, cfg.grid_nz) < 3:
        raise ValueError(
            "pallas backends require grid dims >= 3 in every axis "
            f"(got {cfg.grid_nx}x{cfg.grid_ny}x{cfg.grid_nz}); "
            "use the celllist backend for degenerate grids")


# ---------------------------------------------------------------------------
# Host-side plumbing
# ---------------------------------------------------------------------------

def _block_windows(cfg: SphConfig, cid_sorted: jnp.ndarray, cell_start,
                   cell_end, nblocks: int, block_rows: int, window: int,
                   n: int, n_pad: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per (block, rod): lane-aligned DMA window start + chunk count.

    The window for rod delta of a block covering cells [c_first, c_last] is
    [cell_start[c_first+delta-1], cell_end[c_last+delta+1]) clamped — tiny
    [nblocks, 9] gathers instead of per-particle range tables.
    """
    deltas = jnp.asarray([(dz * cfg.grid_ny + dy) * cfg.grid_nx
                          for dy, dz in _RODS], jnp.int32)
    pad = nblocks * block_rows - n
    cid_p = jnp.pad(cid_sorted, (0, pad), constant_values=cfg.num_cells - 1)
    blocks = cid_p.reshape(nblocks, block_rows)
    c_first = blocks[:, 0]
    c_last = blocks[:, -1]
    lo_cell = jnp.clip(c_first[:, None] + deltas[None, :] - 1, 0, cfg.num_cells - 1)
    hi_cell = jnp.clip(c_last[:, None] + deltas[None, :] + 1, 0, cfg.num_cells - 1)
    w_start = cell_start[lo_cell]
    w_end = cell_end[hi_cell]

    w_start = w_start & ~(LANE - 1)                        # lane alignment
    w_start = jnp.clip(w_start, 0, max(n_pad - window, 0))
    w_len = jnp.maximum(w_end - w_start, 0)
    max_chunks = jnp.maximum((n_pad - window) // window + 1, 1)
    w_chunks = jnp.where(w_len > 0,
                         jnp.clip(-(-w_len // window), 1, max_chunks), 0)
    # SMEM prefetch budget is ~1MB and each operand is row-padded, so the two
    # tables are PACKED into one i32: start is 128-aligned -> 7 free low bits
    # hold min(chunks, 127).  Chunk counts above 127 are clamped; the clamped
    # remainder is counted and surfaced as truncated_ranges (observable, and
    # astronomically rare: it needs one rod window spanning >127*window rows).
    clamped = jnp.maximum(w_chunks - 127, 0)
    packed = w_start.astype(jnp.int32) | jnp.minimum(w_chunks, 127).astype(jnp.int32)
    return packed, jnp.sum(clamped).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Kernel machinery shared by density and force
# ---------------------------------------------------------------------------

def _sweep_kernel_body(cfg, window, block_rows, block_base,
                       wtab_ref, fields_hbm,
                       cand, sem, init_carry, pair_compute):
    """Generic masked pair sweep: DMA rod windows, mask by cell-id delta,
    accumulate.  ``pair_compute(carry, cand_block [S/128,F,128], rod_index,
    not_self_mask) -> carry``.  ``block_base`` is the first global block of
    this grid chunk (large-N runs split the grid to bound SMEM tables)."""
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    b = block_rows
    s = window
    nranges = len(_RODS)
    jlane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    own = ((block_base + i) * b
           + jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0))

    def wstart(block, r):
        return wtab_ref[block * nranges + r] & ~(LANE - 1)

    def wchunks(block, r):
        return wtab_ref[block * nranges + r] & (LANE - 1)

    def dma(block, r, chunk, slot, chunk_slot=None):
        # fields are tiled [T, F, LANE]: a lane-aligned row window is one
        # contiguous slab -> ONE DMA descriptor
        t0 = wstart(block, r) // LANE + chunk * (s // LANE)
        dst = cand.at[slot, r] if chunk_slot is None else cand.at[chunk_slot, 0]
        sm = sem.at[slot, r] if chunk_slot is None else sem.at[chunk_slot, 0]
        return pltpu.make_async_copy(
            fields_hbm.at[pl.ds(t0, s // LANE)], dst, sm)

    def start_block(block, slot):
        for r in range(nranges):
            @pl.when(wchunks(block, r) > 0)
            def _():
                dma(block, r, 0, slot).start()

    @pl.when(i == 0)
    def _():
        start_block(0, 0)

    @pl.when(i + 1 < nblocks)
    def _():
        start_block(i + 1, (i + 1) % 2)

    def masked(carry, r, chunk, data):
        jg = wstart(i, r) + chunk * s + jlane                  # [1,S] global idx
        not_self = jg != own                                   # [B,S]
        return pair_compute(carry, data, r, not_self)

    slot = i % 2
    carry = init_carry
    for r in range(nranges):
        def process0(c, r=r):
            dma(i, r, 0, slot).wait()
            return masked(c, r, 0, cand[slot, r])

        carry = jax.lax.cond(wchunks(i, r) > 0,
                             process0, lambda c: c, carry)

        # Rare long windows (<2% of blocks): exact multi-chunk tail.
        def chunk_body(c, carry2, r=r):
            d = dma(i, r, c, slot, chunk_slot=2)
            d.start()
            d.wait()
            return masked(carry2, r, c, cand[2, 0])

        carry = jax.lax.fori_loop(1, wchunks(i, r), chunk_body, carry)
    return carry


def _rod_deltas(cfg: SphConfig):
    return [float((dz * cfg.grid_ny + dy) * cfg.grid_nx) for dy, dz in _RODS]


def _density_kernel(cfg: SphConfig, window: int, block_rows: int,
                    block_base: int,
                    wtab_ref,
                    fields_hbm, self_ref,
                    rho_ref, ncount_ref,
                    cand, sem):
    b, s = block_rows, window
    h2 = _f32(cfg.h2)
    deltas = _rod_deltas(cfg)
    xi = self_ref[0, :].reshape(b, 1)
    yi = self_ref[1, :].reshape(b, 1)
    zi = self_ref[2, :].reshape(b, 1)
    cid_i = self_ref[4, :].reshape(b, 1)                   # cell id as f32

    def pair_compute(carry, cand_blk, r, not_self):
        rho, ncount = carry
        xj = cand_blk[:, 0, :].reshape(1, s)
        yj = cand_blk[:, 1, :].reshape(1, s)
        zj = cand_blk[:, 2, :].reshape(1, s)
        mj = cand_blk[:, 3, :].reshape(1, s)
        cid_j = cand_blk[:, 4, :].reshape(1, s)
        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        d2 = dx * dx + dy * dy + dz * dz                   # unscaled, like mH2
        dc = cid_j - cid_i                                 # exact ints in f32
        rod_ok = jnp.abs(dc - _f32(deltas[r])) <= 1.0
        mask = rod_ok & not_self & (d2 < h2)
        t = _f32(cfg.h_scaled2) - d2 * _f32(cfg.sim_scale * cfg.sim_scale)
        w = _f32(cfg.poly6_norm) * t * t * t
        rho = rho + jnp.sum(jnp.where(mask, mj * w, 0.0), axis=1, keepdims=True)
        ncount = ncount + jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
        return rho, ncount

    init = (jnp.zeros((b, 1), jnp.float32), jnp.zeros((b, 1), jnp.int32))
    rho, ncount = _sweep_kernel_body(
        cfg, window, block_rows, block_base, wtab_ref, fields_hbm,
        cand, sem, init, pair_compute)

    if cfg.include_self_density:
        m_i = self_ref[3, :].reshape(b, 1)
        h2s = _f32(cfg.h_scaled2)
        rho = rho + m_i * _f32(cfg.poly6_norm) * h2s * h2s * h2s

    rho_ref[0, :] = rho.reshape(b)
    ncount_ref[0, :] = ncount.reshape(b)


def _force_kernel(cfg: SphConfig, window: int, block_rows: int,
                  block_base: int,
                  wtab_ref,
                  fields_hbm, self_ref,
                  acc_ref,
                  cand, sem):
    b, s = block_rows, window
    h2 = _f32(cfg.h2)
    h = _f32(cfg.h_scaled)
    scale = _f32(cfg.sim_scale)
    eps = _f32(cfg.pressure_softening)
    k = _f32(cfg.stiffness)
    rho0 = _f32(cfg.rho0)
    deltas = _rod_deltas(cfg)

    xi = self_ref[0, :].reshape(b, 1)
    yi = self_ref[1, :].reshape(b, 1)
    zi = self_ref[2, :].reshape(b, 1)
    vxi = self_ref[3, :].reshape(b, 1)
    vyi = self_ref[4, :].reshape(b, 1)
    vzi = self_ref[5, :].reshape(b, 1)
    rhoi = self_ref[7, :].reshape(b, 1)
    cid_i = self_ref[8, :].reshape(b, 1)

    p_i = (rhoi - rho0) * k
    rhoi_inv = 1.0 / jnp.where(rhoi > 0.0, rhoi, 1.0)
    pw_i = p_i * rhoi_inv * rhoi_inv

    def pair_compute(carry, cand_blk, r, not_self):
        ax, ay, az, vx, vy, vz = carry
        xj = cand_blk[:, 0, :].reshape(1, s)
        yj = cand_blk[:, 1, :].reshape(1, s)
        zj = cand_blk[:, 2, :].reshape(1, s)
        vxj = cand_blk[:, 3, :].reshape(1, s)
        vyj = cand_blk[:, 4, :].reshape(1, s)
        vzj = cand_blk[:, 5, :].reshape(1, s)
        mj = cand_blk[:, 6, :].reshape(1, s)
        rhoj = cand_blk[:, 7, :].reshape(1, s)
        cid_j = cand_blk[:, 8, :].reshape(1, s)

        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        d2u = dx * dx + dy * dy + dz * dz                  # unscaled
        dc = cid_j - cid_i
        rod_ok = jnp.abs(dc - _f32(deltas[r])) <= 1.0
        mask = rod_ok & not_self & (d2u < h2)

        d = jnp.sqrt(d2u) * scale                          # scaled distance
        # hd carries the mask: every downstream term is a product with it
        hd = jnp.where(mask, h - d, 0.0)

        p_j = (rhoj - rho0) * k
        rhoj_inv = 1.0 / jnp.where(rhoj > 0.0, rhoj, 1.0)
        pweight = pw_i + p_j * rhoj_inv * rhoj_inv         # textbook symmetric

        center = (hd * hd) * (mj * pweight) / (d + eps) * scale
        ax = ax + jnp.sum(dx * center, axis=1, keepdims=True)
        ay = ay + jnp.sum(dy * center, axis=1, keepdims=True)
        az = az + jnp.sum(dz * center, axis=1, keepdims=True)

        vweight = hd * (rhoj_inv * mj)
        vx = vx + jnp.sum((vxj - vxi) * vweight, axis=1, keepdims=True)
        vy = vy + jnp.sum((vyj - vyi) * vweight, axis=1, keepdims=True)
        vz = vz + jnp.sum((vzj - vzi) * vweight, axis=1, keepdims=True)
        return ax, ay, az, vx, vy, vz

    zero = jnp.zeros((b, 1), jnp.float32)
    init = (zero, zero, zero, zero, zero, zero)
    ax, ay, az, vx, vy, vz = _sweep_kernel_body(
        cfg, window, block_rows, block_base, wtab_ref, fields_hbm,
        cand, sem, init, pair_compute)

    norm = _f32(cfg.visc_lap_norm)
    mu_rhoi = _f32(cfg.viscosity) * rhoi_inv
    acc_ref[0, :] = (mu_rhoi * vx * norm + ax * norm).reshape(b)
    acc_ref[1, :] = (mu_rhoi * vy * norm + ay * norm).reshape(b)
    acc_ref[2, :] = (mu_rhoi * vz * norm + az * norm).reshape(b)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _make_grid_spec(nblocks: int, block_rows: int, nfields: int,
                    window: int, out_specs):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                             # packed window table
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # fields (HBM, tiled)
            pl.BlockSpec((nfields, block_rows), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),         # self rows
        ],
        out_specs=out_specs,
        scratch_shapes=[
            # [slot 0/1 = block pipeline, slot 2 rod 0 = multi-chunk overflow]
            pltpu.VMEM((3, len(_RODS), window // LANE, nfields, LANE),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((3, len(_RODS))),
        ],
    )


def compute_step_quantities(cfg: SphConfig, state: ParticleState
                            ) -> tuple[jnp.ndarray, jnp.ndarray, celllist.CellListAux]:
    """Pallas-backed density + acceleration.  Same contract as celllist's."""
    if cfg.compat:
        raise ValueError("pallas backend supports default mode only; "
                         "compat parity runs use the XLA backends")
    if cfg.capped_candidates:
        raise ValueError("capped_candidates is implemented in the sublane "
                         "layout (pallas_layout='sublane')")
    # f32 represents integers exactly up to 2^24, so max cid = num_cells-1
    # must satisfy num_cells <= 2^24 (256^3 is exactly at the limit).
    if cfg.num_cells > 1 << 24:
        raise ValueError("pallas backend stores cell ids in f32 "
                         "(exact up to 2^24 cells); shrink the grid")
    _check_grid_nondegenerate(cfg)
    b, s = cfg.pallas_block_rows, cfg.pallas_window
    if s % LANE:
        raise ValueError(f"pallas_window must be a multiple of {LANE}")
    n = state.position.shape[0]
    nblocks = -(-n // b)
    # SMEM prefetch tables are ~1MB-budgeted: split the grid into chunks of
    # at most MAX_BLOCKS blocks (each chunk = one pallas_call over a slice).
    MAX_BLOCKS = (512 << 10) // (len(_RODS) * 4)
    n_rows = nblocks * b
    pad_rows = n_rows - n

    g = build_grid(cfg, state.position)
    stacked = jnp.concatenate(
        [state.position, state.velocity, state.mass[:, None]], axis=1)
    stacked_s = stacked[g.order]                           # ONE row gather
    pos_s = stacked_s[:, 0:3]
    vel_s = stacked_s[:, 3:6]
    mass_s = stacked_s[:, 6]
    cid_f = g.cell_ids.astype(jnp.float32)                 # exact below 2^24

    n_pad = _round_up(n, LANE) + s
    def padf(a, fill=0.0):
        return jnp.pad(a, (0, n_pad - n), constant_values=fill)

    wtab, clamped_chunks = _block_windows(
        cfg, g.cell_ids, g.cell_start, g.cell_end, nblocks, b, s, n, n_pad)
    wtab = wtab.reshape(-1)          # SMEM operands are row-padded; keep 1-D

    def tiled(flat):
        # [F, n_pad] -> [n_pad/LANE, F, LANE]: one window = one contiguous slab
        f = flat.shape[0]
        return flat.reshape(f, n_pad // LANE, LANE).transpose(1, 0, 2)

    def selfpad(flat):
        return jnp.pad(flat[:, :n], ((0, 0), (0, pad_rows)))

    # padding cid = -10 keeps padded rows out of every rod mask
    cid_pad = padf(cid_f, fill=-10.0)

    # density fields: x, y, z, m, cid
    fields_d = jnp.stack([
        padf(pos_s[:, 0]), padf(pos_s[:, 1]), padf(pos_s[:, 2]),
        padf(mass_s), cid_pad,
    ])
    self_d = selfpad(fields_d)
    tiled_d = tiled(fields_d)
    rho_parts, nc_parts = [], []
    for base in range(0, nblocks, MAX_BLOCKS):
        nb_c = min(MAX_BLOCKS, nblocks - base)
        rows_c = nb_c * b
        grid_spec_d = _make_grid_spec(nb_c, b, 5, s, out_specs=(
            pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ))
        r_c, n_c = pl.pallas_call(
            partial(_density_kernel, cfg, s, b, base),
            out_shape=(
                jax.ShapeDtypeStruct((1, rows_c), jnp.float32),
                jax.ShapeDtypeStruct((1, rows_c), jnp.int32),
            ),
            grid_spec=grid_spec_d,
            interpret=cfg.pallas_interpret,
        )(jax.lax.dynamic_slice_in_dim(wtab, base * len(_RODS),
                                       nb_c * len(_RODS)),
          tiled_d,
          jax.lax.dynamic_slice_in_dim(self_d, base * b, rows_c, axis=1))
        rho_parts.append(r_c.reshape(rows_c))
        nc_parts.append(n_c.reshape(rows_c))
    rho_s = jnp.concatenate(rho_parts)[:n]
    ncount_s = jnp.concatenate(nc_parts)[:n]

    # force fields: x, y, z, vx, vy, vz, m, rho, cid
    fields_f = jnp.stack([
        padf(pos_s[:, 0]), padf(pos_s[:, 1]), padf(pos_s[:, 2]),
        padf(vel_s[:, 0]), padf(vel_s[:, 1]), padf(vel_s[:, 2]),
        padf(mass_s), padf(rho_s), cid_pad,
    ])
    self_f = selfpad(fields_f)
    tiled_f = tiled(fields_f)
    acc_parts = []
    for base in range(0, nblocks, MAX_BLOCKS):
        nb_c = min(MAX_BLOCKS, nblocks - base)
        rows_c = nb_c * b
        grid_spec_f = _make_grid_spec(
            nb_c, b, 9, s,
            out_specs=pl.BlockSpec((3, b), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM))
        a_c = pl.pallas_call(
            partial(_force_kernel, cfg, s, b, base),
            out_shape=jax.ShapeDtypeStruct((3, rows_c), jnp.float32),
            grid_spec=grid_spec_f,
            interpret=cfg.pallas_interpret,
        )(jax.lax.dynamic_slice_in_dim(wtab, base * len(_RODS),
                                       nb_c * len(_RODS)),
          tiled_f,
          jax.lax.dynamic_slice_in_dim(self_f, base * b, rows_c, axis=1))
        acc_parts.append(a_c)
    acc_rows = jnp.concatenate(acc_parts, axis=1)
    acc_s = acc_rows[:, :n].T                              # [N, 3]
    acc_s = acc_s + physics.central_gravity(cfg, pos_s)
    acc_s = acc_s + jnp.asarray(cfg.gravity, jnp.float32)
    acc_s = physics.cfl_clamp(cfg, acc_s)

    aux = celllist.CellListAux(
        neighbor_count=unsort(g.order, ncount_s),
        overflow_cells=g.overflow_cells,
        truncated_ranges=clamped_chunks,  # only >127-chunk windows clamp
    )
    return unsort(g.order, acc_s), unsort(g.order, rho_s), aux
