"""Transposed-tile Pallas sweeps: candidates along SUBLANES.

The lane-major kernel (`pallas_step.py`) pays a 128-lane alignment floor per
rod window, so its per-particle lane work is R x (B + L + 128).  This variant
puts CANDIDATES on the sublane axis and PARTICLES on the lane axis:

    fields HBM [n_pad, F] --(window DMA [S_sub, F], 8-aligned)--> VMEM
    VPU: [S_sub, B=128] tiles, reduced over sublanes

so the alignment floor drops 128 -> 8 and per-particle work becomes
R x (B + L + 8).  A probe at 1M-equivalent volume measured 23.0 -> 12.9 ms
(docs/PERFORMANCE.md, "Transposed tiles").

Masking, windows, deep pipelining and exact multi-chunk tails follow
pallas_step.py; the SMEM tables are two 1-D prefetch operands because 8-bit
alignment leaves too few bits to pack the chunk count.

Enable with ``SphConfig(pallas_layout="sublane")``.

STATUS: EXPERIMENTAL — blocked on hardware Mosaic: sliced HBM->VMEM DMA
requires the slice's lane dimension to be 128-aligned ("Slice shape along
dimension 1 must be aligned to tiling (128), but is 5"), so a narrow
[S_sub, F] window cannot be DMA'd directly.  Works in interpreter mode (the
CPU test suite covers it); the hardware path needs either F padded to 128
(16x DMA waste — rejected) or an in-VMEM tile transpose after a lane-tiled
DMA (round-2 work; the 1.8x compute win is probe-verified).
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
from .pallas_step import (_RODS, _check_grid_nondegenerate, _rod_deltas,
                          _round_up)

_f32 = jnp.float32

SUB = 8      # f32 sublane granularity: window offsets align to this
BLANE = 128  # particles per block = one lane width


def _block_windows_t(cfg: SphConfig, cid_sorted, cell_start, cell_end,
                     nblocks: int, window: int, n: int, n_pad: int):
    deltas = jnp.asarray([(dz * cfg.grid_ny + dy) * cfg.grid_nx
                          for dy, dz in _RODS], jnp.int32)
    pad = nblocks * BLANE - n
    cid_p = jnp.pad(cid_sorted, (0, pad), constant_values=cfg.num_cells - 1)
    blocks = cid_p.reshape(nblocks, BLANE)
    lo_cell = jnp.clip(blocks[:, 0][:, None] + deltas[None, :] - 1,
                       0, cfg.num_cells - 1)
    hi_cell = jnp.clip(blocks[:, -1][:, None] + deltas[None, :] + 1,
                       0, cfg.num_cells - 1)
    w_start = cell_start[lo_cell] & ~(SUB - 1)
    w_start = jnp.clip(w_start, 0, max(n_pad - window, 0))
    w_len = jnp.maximum(cell_end[hi_cell] - w_start, 0)
    max_chunks = jnp.maximum((n_pad - window) // window + 1, 1)
    w_chunks = jnp.where(w_len > 0,
                         jnp.clip(-(-w_len // window), 1, max_chunks), 0)
    return w_start.astype(jnp.int32), w_chunks.astype(jnp.int32)


def _sweep_body_t(cfg, window, block_base, ws_ref, wc_ref, fields_hbm,
                  cand, sem, init_carry, pair_compute):
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    s = window
    nranges = len(_RODS)
    jsub = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    own = ((block_base + i) * BLANE
           + jax.lax.broadcasted_iota(jnp.int32, (1, BLANE), 1))

    def dma(block, r, chunk, slot, chunk_slot=None):
        r0 = pl.multiple_of(ws_ref[block * nranges + r], SUB) + chunk * s
        dst = cand.at[slot, r] if chunk_slot is None else cand.at[chunk_slot, 0]
        sm = sem.at[slot, r] if chunk_slot is None else sem.at[chunk_slot, 0]
        return pltpu.make_async_copy(
            fields_hbm.at[pl.ds(r0, s), :], dst, sm)

    def start_block(block, slot):
        for r in range(nranges):
            @pl.when(wc_ref[block * nranges + r] > 0)
            def _():
                dma(block, r, 0, slot).start()

    @pl.when(i == 0)
    def _():
        start_block(0, 0)

    @pl.when(i + 1 < nblocks)
    def _():
        start_block(i + 1, (i + 1) % 2)

    def masked(carry, r, chunk, data):
        jg = ws_ref[i * nranges + r] + chunk * s + jsub        # [S,1]
        not_self = jg != own                                   # [S,B]
        return pair_compute(carry, data, r, not_self)

    slot = i % 2
    carry = init_carry
    for r in range(nranges):
        def process0(c, r=r):
            dma(i, r, 0, slot).wait()
            return masked(c, r, 0, cand[slot, r])

        carry = jax.lax.cond(wc_ref[i * nranges + r] > 0,
                             process0, lambda c: c, carry)

        def chunk_body(c, carry2, r=r):
            d = dma(i, r, c, slot, chunk_slot=2)
            d.start()
            d.wait()
            return masked(carry2, r, c, cand[2, 0])

        carry = jax.lax.fori_loop(1, wc_ref[i * nranges + r], chunk_body, carry)
    return carry


def _density_kernel_t(cfg: SphConfig, window: int, block_base: int,
                      ws_ref, wc_ref, fields_hbm, self_ref,
                      rho_ref, ncount_ref, cand, sem):
    s = window
    h2 = _f32(cfg.h2)
    deltas = _rod_deltas(cfg)
    xi = self_ref[0, :].reshape(1, BLANE)
    yi = self_ref[1, :].reshape(1, BLANE)
    zi = self_ref[2, :].reshape(1, BLANE)
    cid_i = self_ref[4, :].reshape(1, BLANE)

    def pair_compute(carry, cand_blk, r, not_self):
        rho, ncount = carry
        xj = cand_blk[:, 0].reshape(s, 1)
        yj = cand_blk[:, 1].reshape(s, 1)
        zj = cand_blk[:, 2].reshape(s, 1)
        mj = cand_blk[:, 3].reshape(s, 1)
        cid_j = cand_blk[:, 4].reshape(s, 1)
        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        d2 = dx * dx + dy * dy + dz * dz                       # [S,B]
        rod_ok = jnp.abs((cid_j - cid_i) - _f32(deltas[r])) <= 1.0
        mask = rod_ok & not_self & (d2 < h2)
        t = _f32(cfg.h_scaled2) - d2 * _f32(cfg.sim_scale * cfg.sim_scale)
        w = _f32(cfg.poly6_norm) * t * t * t
        rho = rho + jnp.sum(jnp.where(mask, mj * w, 0.0), axis=0, keepdims=True)
        ncount = ncount + jnp.sum(mask.astype(jnp.int32), axis=0, keepdims=True)
        return rho, ncount

    init = (jnp.zeros((1, BLANE), jnp.float32), jnp.zeros((1, BLANE), jnp.int32))
    rho, ncount = _sweep_body_t(cfg, window, block_base, ws_ref, wc_ref,
                                fields_hbm, cand, sem, init, pair_compute)
    if cfg.include_self_density:
        m_i = self_ref[3, :].reshape(1, BLANE)
        h2s = _f32(cfg.h_scaled2)
        rho = rho + m_i * _f32(cfg.poly6_norm) * h2s * h2s * h2s
    rho_ref[0, :] = rho.reshape(BLANE)
    ncount_ref[0, :] = ncount.reshape(BLANE)


def _force_kernel_t(cfg: SphConfig, window: int, block_base: int,
                    ws_ref, wc_ref, fields_hbm, self_ref,
                    acc_ref, cand, sem):
    s = window
    h2 = _f32(cfg.h2)
    h = _f32(cfg.h_scaled)
    scale = _f32(cfg.sim_scale)
    eps = _f32(cfg.pressure_softening)
    k = _f32(cfg.stiffness)
    rho0 = _f32(cfg.rho0)
    deltas = _rod_deltas(cfg)

    xi = self_ref[0, :].reshape(1, BLANE)
    yi = self_ref[1, :].reshape(1, BLANE)
    zi = self_ref[2, :].reshape(1, BLANE)
    vxi = self_ref[3, :].reshape(1, BLANE)
    vyi = self_ref[4, :].reshape(1, BLANE)
    vzi = self_ref[5, :].reshape(1, BLANE)
    rhoi = self_ref[7, :].reshape(1, BLANE)
    cid_i = self_ref[8, :].reshape(1, BLANE)

    p_i = (rhoi - rho0) * k
    rhoi_inv = 1.0 / jnp.where(rhoi > 0.0, rhoi, 1.0)
    pw_i = p_i * rhoi_inv * rhoi_inv

    def pair_compute(carry, cand_blk, r, not_self):
        ax, ay, az, vx, vy, vz = carry
        xj = cand_blk[:, 0].reshape(s, 1)
        yj = cand_blk[:, 1].reshape(s, 1)
        zj = cand_blk[:, 2].reshape(s, 1)
        vxj = cand_blk[:, 3].reshape(s, 1)
        vyj = cand_blk[:, 4].reshape(s, 1)
        vzj = cand_blk[:, 5].reshape(s, 1)
        mj = cand_blk[:, 6].reshape(s, 1)
        rhoj = cand_blk[:, 7].reshape(s, 1)
        cid_j = cand_blk[:, 8].reshape(s, 1)

        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        d2u = dx * dx + dy * dy + dz * dz
        rod_ok = jnp.abs((cid_j - cid_i) - _f32(deltas[r])) <= 1.0
        mask = rod_ok & not_self & (d2u < h2)

        d = jnp.sqrt(d2u) * scale
        hd = jnp.where(mask, h - d, 0.0)

        p_j = (rhoj - rho0) * k
        rhoj_inv = 1.0 / jnp.where(rhoj > 0.0, rhoj, 1.0)
        pweight = pw_i + p_j * rhoj_inv * rhoj_inv

        center = (hd * hd) * (mj * pweight) / (d + eps) * scale
        ax = ax + jnp.sum(dx * center, axis=0, keepdims=True)
        ay = ay + jnp.sum(dy * center, axis=0, keepdims=True)
        az = az + jnp.sum(dz * center, axis=0, keepdims=True)

        vweight = hd * (rhoj_inv * mj)
        vx = vx + jnp.sum((vxj - vxi) * vweight, axis=0, keepdims=True)
        vy = vy + jnp.sum((vyj - vyi) * vweight, axis=0, keepdims=True)
        vz = vz + jnp.sum((vzj - vzi) * vweight, axis=0, keepdims=True)
        return ax, ay, az, vx, vy, vz

    zero = jnp.zeros((1, BLANE), jnp.float32)
    ax, ay, az, vx, vy, vz = _sweep_body_t(
        cfg, window, block_base, ws_ref, wc_ref, fields_hbm, cand, sem,
        (zero,) * 6, pair_compute)
    norm = _f32(cfg.visc_lap_norm)
    mu_rhoi = _f32(cfg.viscosity) * rhoi_inv
    acc_ref[0, :] = (mu_rhoi * vx * norm + ax * norm).reshape(BLANE)
    acc_ref[1, :] = (mu_rhoi * vy * norm + ay * norm).reshape(BLANE)
    acc_ref[2, :] = (mu_rhoi * vz * norm + az * norm).reshape(BLANE)


def _grid_spec_t(nblocks: int, nfields: int, window: int, out_specs):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                             # wstart, wchunks (1-D)
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # fields [n_pad, F]
            pl.BlockSpec((nfields, BLANE), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),         # self rows
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((3, len(_RODS), window, nfields), jnp.float32),
            pltpu.SemaphoreType.DMA((3, len(_RODS))),
        ],
    )


def compute_step_quantities(cfg: SphConfig, state: ParticleState
                            ) -> tuple[jnp.ndarray, jnp.ndarray, celllist.CellListAux]:
    """Transposed-layout pallas backend; contract identical to pallas_step."""
    if cfg.compat:
        raise ValueError("pallas backend supports default mode only")
    if cfg.num_cells > 1 << 24:
        raise ValueError("cell ids stored in f32 (exact up to 2^24 cells)")
    _check_grid_nondegenerate(cfg)
    s = cfg.pallas_window_t
    if s % SUB:
        raise ValueError(f"pallas_window_t must be a multiple of {SUB}")
    n = state.position.shape[0]
    nblocks = -(-n // BLANE)
    n_rows = nblocks * BLANE
    pad_rows = n_rows - n
    MAX_BLOCKS = (384 << 10) // (len(_RODS) * 4)

    g = build_grid(cfg, state.position)
    stacked = jnp.concatenate(
        [state.position, state.velocity, state.mass[:, None]], axis=1)
    stacked_s = stacked[g.order]
    pos_s = stacked_s[:, 0:3]
    cid_f = g.cell_ids.astype(jnp.float32)

    n_pad = _round_up(n, SUB) + s
    def padf(a, fill=0.0):
        return jnp.pad(a, (0, n_pad - n), constant_values=fill)

    ws, wc = _block_windows_t(cfg, g.cell_ids, g.cell_start, g.cell_end,
                              nblocks, s, n, n_pad)
    ws = ws.reshape(-1)
    wc = wc.reshape(-1)
    cid_pad = padf(cid_f, fill=-10.0)

    def run_chunked(kernel, fields_cols, nfields, out_specs, make_out_shape):
        fields = jnp.stack(fields_cols, axis=1)           # [n_pad, F]
        selfrows = jnp.pad(fields[:n].T, ((0, 0), (0, pad_rows)))
        parts = []
        for base in range(0, nblocks, MAX_BLOCKS):
            nb_c = min(MAX_BLOCKS, nblocks - base)
            sl = slice(base * len(_RODS), (base + nb_c) * len(_RODS))
            out = pl.pallas_call(
                partial(kernel, cfg, s, base),
                out_shape=make_out_shape(nb_c * BLANE),
                grid_spec=_grid_spec_t(nb_c, nfields, s, out_specs),
                interpret=cfg.pallas_interpret,
            )(ws[sl], wc[sl], fields,
              jax.lax.dynamic_slice_in_dim(selfrows, base * BLANE,
                                           nb_c * BLANE, axis=1))
            parts.append(out)
        if isinstance(parts[0], (tuple, list)):
            return tuple(jnp.concatenate([p[k] for p in parts], axis=1)
                         for k in range(len(parts[0])))
        return jnp.concatenate(parts, axis=1)

    # density: x, y, z, m, cid
    rho_blocks, nc_blocks = run_chunked(
        _density_kernel_t,
        [padf(pos_s[:, 0]), padf(pos_s[:, 1]), padf(pos_s[:, 2]),
         padf(stacked_s[:, 6]), cid_pad],
        5,
        out_specs=(
            pl.BlockSpec((1, BLANE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLANE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ),
        make_out_shape=lambda rows: (
            jax.ShapeDtypeStruct((1, rows), jnp.float32),
            jax.ShapeDtypeStruct((1, rows), jnp.int32),
        ),
    )
    rho_s = rho_blocks.reshape(n_rows)[:n]
    ncount_s = nc_blocks.reshape(n_rows)[:n]

    # force: x, y, z, vx, vy, vz, m, rho, cid
    acc_rows = run_chunked(
        _force_kernel_t,
        [padf(pos_s[:, 0]), padf(pos_s[:, 1]), padf(pos_s[:, 2]),
         padf(stacked_s[:, 3]), padf(stacked_s[:, 4]), padf(stacked_s[:, 5]),
         padf(stacked_s[:, 6]), padf(rho_s), cid_pad],
        9,
        out_specs=pl.BlockSpec((3, BLANE), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        make_out_shape=lambda rows: jax.ShapeDtypeStruct((3, rows), jnp.float32),
    )
    acc_s = acc_rows[:, :n].T

    acc_s = acc_s + physics.central_gravity(cfg, pos_s)
    acc_s = acc_s + jnp.asarray(cfg.gravity, jnp.float32)
    acc_s = physics.cfl_clamp(cfg, acc_s)

    aux = celllist.CellListAux(
        neighbor_count=unsort(g.order, ncount_s),
        overflow_cells=g.overflow_cells,
        truncated_ranges=jnp.zeros((), jnp.int32),
    )
    return unsort(g.order, acc_s), unsort(g.order, rho_s), aux
