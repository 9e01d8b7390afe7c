"""Fused Pallas density + force kernels.

Why a kernel at all: the XLA cell-list backend spends ~95% of its time in
gathers (measured ~0.4M gathered rows/ms on v5e — 20x slower than streaming).
The sorted cell-list layout makes gathers unnecessary: for a block of B
consecutive *sorted* particles, each (dy,dz) stencil offset contributes one
**contiguous index window** (x-adjacent cells are adjacent in sorted order,
see ``ops/grid.py``).  So the kernel replaces B x R x S random gathers with a
few sequential-window DMAs per block:

    HBM fields [F, N] --(window DMAs, double-buffered)--> VMEM [F, S]
    VPU: [B, S] masked pair math, reduced over S

A block's union window is usually <= S (one DMA); blocks straddling grid-rod
or grid-plane boundaries get arbitrarily long windows, which are processed
exactly by a dynamic ``fori_loop`` over S-sized chunks — nothing is ever
silently dropped.

Per-particle validity (exact range membership, d^2 < h^2, self-exclusion) is
enforced with masks, so the result is identical in pair *set* to the XLA
backend; only summation order differs (window order vs candidate order),
giving ~1 ulp float differences.

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
from .grid import unsort

_f32 = jnp.float32

LANE = 128  # TPU lane width; DMA windows are aligned to it


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Host-side plumbing
# ---------------------------------------------------------------------------

def _block_windows(rng_start: jnp.ndarray, rng_end: jnp.ndarray,
                   nblocks: int, block_rows: int, window: int, n_pad: int
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per (block, stencil-offset): lane-aligned DMA window start + chunk count.

    The window is the union of the block rows' candidate ranges; it is
    processed in ``ceil(len/window)`` chunks inside the kernel.
    """
    r = rng_start.shape[1]
    rs = rng_start.reshape(nblocks, block_rows, r)
    re = rng_end.reshape(nblocks, block_rows, r)
    valid = rs < re                                       # empty ranges carry a
    w_start = jnp.min(jnp.where(valid, rs, jnp.iinfo(jnp.int32).max), axis=1)
    w_start = jnp.where(w_start == jnp.iinfo(jnp.int32).max, 0, w_start)
    w_start = w_start & ~(LANE - 1)                       # lane alignment
    w_start = jnp.clip(w_start, 0, max(n_pad - window, 0))
    # meaningless position value, so they must be masked out of the max too
    w_end = jnp.max(jnp.where(valid, re, 0), axis=1)
    w_len = jnp.maximum(w_end - w_start, 0)
    # chunk c covers [start + c*window, ...); last chunk must stay in bounds.
    # 0 chunks = no candidates at all: the kernel skips the DMA and compute.
    max_chunks = jnp.maximum((n_pad - window) // window + 1, 1)
    w_chunks = jnp.where(w_len > 0,
                         jnp.clip(-(-w_len // window), 1, max_chunks), 0)
    return w_start.astype(jnp.int32), w_chunks.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Kernel machinery shared by density and force
# ---------------------------------------------------------------------------

def _sweep_kernel_body(cfg, nranges, window, block_rows, nfields,
                       wstart_ref, wchunks_ref,
                       fields_hbm, rngs_ref, rnge_ref,
                       cand, sem, init_carry, pair_compute):
    """Generic masked pair sweep: DMA windows, mask, accumulate.

    ``pair_compute(carry, cand_block, mask) -> carry`` does the physics on a
    [F, S] candidate block against the (closed-over) self rows.
    """
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    b = block_rows
    s = window
    jlane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    own = (i * b + jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0))

    # Deep pipeline: the per-rod compute (~1-2 us on [B,S]) cannot hide a
    # single DMA's latency, so ALL nranges window DMAs for a block are issued
    # back-to-back one block ahead: slot parity (block % 2) x rod.
    def dma(block, r, chunk, slot, chunk_slot=None):
        # fields are tiled [T, F, LANE]: a lane-aligned row window is one
        # contiguous slab -> ONE DMA descriptor (the flat [F, N] layout costs
        # F strided strips per window and is descriptor-bound)
        t0 = wstart_ref[block * nranges + r] // LANE + chunk * (s // LANE)
        dst = cand.at[slot, r] if chunk_slot is None else cand.at[chunk_slot, 0]
        sm = sem.at[slot, r] if chunk_slot is None else sem.at[chunk_slot, 0]
        return pltpu.make_async_copy(
            fields_hbm.at[pl.ds(t0, s // LANE)], dst, sm)

    def start_block(block, slot):
        for r in range(nranges):
            @pl.when(wchunks_ref[block * nranges + r] > 0)
            def _():
                dma(block, r, 0, slot).start()

    @pl.when(i == 0)
    def _():
        start_block(0, 0)

    @pl.when(i + 1 < nblocks)
    def _():
        start_block(i + 1, (i + 1) % 2)

    def masked(carry, r, chunk, data):
        jg = wstart_ref[i * nranges + r] + chunk * s + jlane   # [1,S] global idx
        r_lo = rngs_ref[:, r].reshape(b, 1)
        r_hi = rnge_ref[:, r].reshape(b, 1)
        base_mask = (jg >= r_lo) & (jg < r_hi)
        if nranges != 9 or r == 4:
            # self-exclusion: own sorted index can only fall inside the
            # centre rod's range ((dy,dz)=(0,0) = index 4 of the 27-stencil)
            base_mask = base_mask & (jg != own)
        return pair_compute(carry, data, base_mask)

    slot = i % 2
    carry = init_carry
    for r in range(nranges):
        def process0(c, r=r):
            dma(i, r, 0, slot).wait()
            return masked(c, r, 0, cand[slot, r])

        carry = jax.lax.cond(wchunks_ref[i * nranges + r] > 0,
                             process0, lambda c: c, carry)

        # Rare long windows (<2% of blocks after the sign-free stencil):
        # exact multi-chunk tail through the dedicated overflow slot.
        r_lo = rngs_ref[:, r].reshape(b, 1)
        r_hi = rnge_ref[:, r].reshape(b, 1)

        def chunk_body(c, carry2):
            c_lo = wstart_ref[i * nranges + r] + c * s
            live = jnp.any((r_lo < c_lo + s) & (r_hi > c_lo))

            def do(carry3):
                d = dma(i, r, c, slot, chunk_slot=2)
                d.start()
                d.wait()
                return masked(carry3, r, c, cand[2, 0])

            return jax.lax.cond(live, do, lambda x: x, carry2)

        carry = jax.lax.fori_loop(1, wchunks_ref[i * nranges + r], chunk_body, carry)
    return carry


def _density_kernel(cfg: SphConfig, nranges: int, window: int, block_rows: int,
                    wstart_ref, wchunks_ref,
                    fields_hbm, rngs_ref, rnge_ref, self_ref,
                    rho_ref, ncount_ref,
                    cand, sem):
    b, s = block_rows, window
    h2 = _f32(cfg.h2)
    xi = self_ref[0, :].reshape(b, 1)
    yi = self_ref[1, :].reshape(b, 1)
    zi = self_ref[2, :].reshape(b, 1)

    def pair_compute(carry, cand_blk, base_mask):
        rho, ncount = carry
        xj = cand_blk[:, 0, :].reshape(1, s)
        yj = cand_blk[:, 1, :].reshape(1, s)
        zj = cand_blk[:, 2, :].reshape(1, s)
        mj = cand_blk[:, 3, :].reshape(1, s)
        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        d2 = dx * dx + dy * dy + dz * dz                   # unscaled, like mH2 test
        mask = base_mask & (d2 < h2)
        t = _f32(cfg.h_scaled2) - d2 * _f32(cfg.sim_scale * cfg.sim_scale)
        w = _f32(cfg.poly6_norm) * t * t * t
        rho = rho + jnp.sum(jnp.where(mask, mj * w, 0.0), axis=1, keepdims=True)
        ncount = ncount + jnp.sum(mask.astype(jnp.int32), axis=1, keepdims=True)
        return rho, ncount

    init = (jnp.zeros((b, 1), jnp.float32), jnp.zeros((b, 1), jnp.int32))
    rho, ncount = _sweep_kernel_body(
        cfg, nranges, window, block_rows, 4,
        wstart_ref, wchunks_ref, fields_hbm, rngs_ref, rnge_ref,
        cand, sem, init, pair_compute)

    if cfg.include_self_density:
        m_i = self_ref[3, :].reshape(b, 1)
        h2s = _f32(cfg.h_scaled2)
        rho = rho + m_i * _f32(cfg.poly6_norm) * h2s * h2s * h2s

    rho_ref[0, :] = rho.reshape(b)
    ncount_ref[0, :] = ncount.reshape(b)


def _force_kernel(cfg: SphConfig, nranges: int, window: int, block_rows: int,
                  wstart_ref, wchunks_ref,
                  fields_hbm, rngs_ref, rnge_ref, self_ref,
                  acc_ref,
                  cand, sem):
    b, s = block_rows, window
    h2 = _f32(cfg.h2)
    h = _f32(cfg.h_scaled)
    scale = _f32(cfg.sim_scale)
    eps = _f32(cfg.pressure_softening)
    k = _f32(cfg.stiffness)
    rho0 = _f32(cfg.rho0)

    xi = self_ref[0, :].reshape(b, 1)
    yi = self_ref[1, :].reshape(b, 1)
    zi = self_ref[2, :].reshape(b, 1)
    vxi = self_ref[3, :].reshape(b, 1)
    vyi = self_ref[4, :].reshape(b, 1)
    vzi = self_ref[5, :].reshape(b, 1)
    rhoi = self_ref[7, :].reshape(b, 1)

    p_i = (rhoi - rho0) * k
    rhoi_inv = 1.0 / jnp.where(rhoi > 0.0, rhoi, 1.0)
    pw_i = p_i * rhoi_inv * rhoi_inv

    def pair_compute(carry, cand_blk, base_mask):
        ax, ay, az, vx, vy, vz = carry
        xj = cand_blk[:, 0, :].reshape(1, s)
        yj = cand_blk[:, 1, :].reshape(1, s)
        zj = cand_blk[:, 2, :].reshape(1, s)
        vxj = cand_blk[:, 3, :].reshape(1, s)
        vyj = cand_blk[:, 4, :].reshape(1, s)
        vzj = cand_blk[:, 5, :].reshape(1, s)
        mj = cand_blk[:, 6, :].reshape(1, s)
        rhoj = cand_blk[:, 7, :].reshape(1, s)

        dx = xi - xj
        dy = yi - yj
        dz = zi - zj
        d2u = dx * dx + dy * dy + dz * dz                  # unscaled
        mask = base_mask & (d2u < h2)

        d = jnp.sqrt(d2u) * scale                          # scaled distance
        # hd carries the mask: every downstream term is a product with it,
        # so no further selects are needed
        hd = jnp.where(mask, h - d, 0.0)

        p_j = (rhoj - rho0) * k
        rhoj_safe = jnp.where(rhoj > 0.0, rhoj, 1.0)
        rhoj_inv = 1.0 / rhoj_safe
        pweight = pw_i + p_j * rhoj_inv * rhoj_inv         # textbook symmetric sum

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
        cfg, nranges, window, block_rows, 8,
        wstart_ref, wchunks_ref, fields_hbm, rngs_ref, rnge_ref,
        cand, sem, init, pair_compute)

    norm = _f32(cfg.visc_lap_norm)
    mu_rhoi = _f32(cfg.viscosity) * rhoi_inv
    acc_ref[0, :] = (mu_rhoi * vx * norm + ax * norm).reshape(b)
    acc_ref[1, :] = (mu_rhoi * vy * norm + ay * norm).reshape(b)
    acc_ref[2, :] = (mu_rhoi * vz * norm + az * norm).reshape(b)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _make_grid_spec(nblocks: int, block_rows: int, nranges: int, nfields: int,
                    window: int, out_specs):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                             # wstart, wchunks
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # fields (HBM)
            pl.BlockSpec((block_rows, nranges), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),         # rng_start
            pl.BlockSpec((block_rows, nranges), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),         # rng_end
            pl.BlockSpec((nfields, block_rows), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),         # self rows
        ],
        out_specs=out_specs,
        scratch_shapes=[
            # [slot 0/1 = block pipeline, slot 2 rod 0 = multi-chunk overflow]
            pltpu.VMEM((3, nranges, window // LANE, nfields, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3, nranges)),
        ],
    )


def compute_step_quantities(cfg: SphConfig, state: ParticleState
                            ) -> tuple[jnp.ndarray, jnp.ndarray, celllist.CellListAux]:
    """Pallas-backed density + acceleration.  Same contract as celllist's."""
    if cfg.compat:
        raise ValueError("pallas backend supports default mode only; "
                         "compat parity runs use the XLA backends")
    b, s = cfg.pallas_block_rows, cfg.pallas_window
    if s % LANE:
        raise ValueError(f"pallas_window must be a multiple of {LANE}")
    if cfg.pallas_interpret is False and s * b > 1 << 19:
        raise ValueError("pallas_window * pallas_block_rows too large for VMEM")
    n = state.position.shape[0]
    nblocks = -(-n // b)
    n_rows = nblocks * b

    # The window unions require sign-FREE stencil rods: with the octant
    # stencil a block mixes sz=+1/-1 rows, whose (0,sz) rods live in planes
    # z-1 and z+1 — ~two plane-populations apart in sorted index space — so
    # the union window explodes (measured: p75 window ~35k rows at 1M).  The
    # 27-cell stencil's 9 rods are per-cell constants, keeping every window
    # at (block-extent + 2 cells) * occupancy.
    p = celllist.prepare(cfg.replace(neighborhood="cell27"), state)
    nranges = p.rng_start.shape[1]

    pad_rows = n_rows - n
    rngs = jnp.pad(p.rng_start, ((0, pad_rows), (0, 0)))
    rnge = jnp.pad(p.rng_end, ((0, pad_rows), (0, 0)))

    n_pad = _round_up(n, LANE) + s
    def padf(a):
        return jnp.pad(a, (0, n_pad - n))

    wstart, wchunks = _block_windows(rngs, rnge, nblocks, b, s, n_pad)
    # SMEM prefetch operands are lane-padded per row; keep them 1-D.
    wstart = wstart.reshape(-1)
    wchunks = wchunks.reshape(-1)

    def tiled(flat):
        # [F, n_pad] -> [n_pad/LANE, F, LANE]: one window = one contiguous slab
        f = flat.shape[0]
        return flat.reshape(f, n_pad // LANE, LANE).transpose(1, 0, 2)

    # density fields: x, y, z, m
    fields_d = jnp.stack([
        padf(p.pos_s[:, 0]), padf(p.pos_s[:, 1]), padf(p.pos_s[:, 2]),
        padf(p.mass_s),
    ])
    self_d = jnp.pad(fields_d[:, :n], ((0, 0), (0, pad_rows)))
    fields_d = tiled(fields_d)

    grid_spec_d = _make_grid_spec(nblocks, b, nranges, 4, s, out_specs=(
        pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
    ))
    rho_blocks, nc_blocks = pl.pallas_call(
        partial(_density_kernel, cfg, nranges, s, b),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_rows), jnp.float32),
            jax.ShapeDtypeStruct((1, n_rows), jnp.int32),
        ),
        grid_spec=grid_spec_d,
        interpret=cfg.pallas_interpret,
    )(wstart, wchunks, fields_d, rngs, rnge, self_d)

    rho_s = rho_blocks.reshape(n_rows)[:n]
    ncount_s = nc_blocks.reshape(n_rows)[:n]

    # force fields: x, y, z, vx, vy, vz, m, rho
    fields_f = jnp.stack([
        padf(p.pos_s[:, 0]), padf(p.pos_s[:, 1]), padf(p.pos_s[:, 2]),
        padf(p.vel_s[:, 0]), padf(p.vel_s[:, 1]), padf(p.vel_s[:, 2]),
        padf(p.mass_s), padf(rho_s),
    ])
    self_f = jnp.pad(fields_f[:, :n], ((0, 0), (0, pad_rows)))
    fields_f = tiled(fields_f)

    grid_spec_f = _make_grid_spec(
        nblocks, b, nranges, 8, s,
        out_specs=pl.BlockSpec((3, b), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM))
    acc_rows = pl.pallas_call(
        partial(_force_kernel, cfg, nranges, s, b),
        out_shape=jax.ShapeDtypeStruct((3, n_rows), jnp.float32),
        grid_spec=grid_spec_f,
        interpret=cfg.pallas_interpret,
    )(wstart, wchunks, fields_f, rngs, rnge, self_f)

    acc_s = acc_rows[:, :n].T                              # [N, 3]
    acc_s = acc_s + physics.central_gravity(cfg, p.pos_s)
    acc_s = acc_s + jnp.asarray(cfg.gravity, jnp.float32)
    acc_s = physics.cfl_clamp(cfg, acc_s)

    g = p.grid
    aux = celllist.CellListAux(
        neighbor_count=unsort(g.order, ncount_s),
        overflow_cells=g.overflow_cells,
        truncated_ranges=jnp.zeros((), jnp.int32),  # multi-chunk: nothing dropped
    )
    return unsort(g.order, acc_s), unsort(g.order, rho_s), aux
