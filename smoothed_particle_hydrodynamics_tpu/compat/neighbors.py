"""Quirk-faithful emulation of the reference's findNeighbors.

Reproduces /root/reference/src/sph.cpp:484-692 decision-for-decision:

* octant voxel table with the slot-3 overwrite (the z-face cell is never
  searched) and slot 4 read from uninitialised stack memory — emulated as
  always-rejected, which matches the compiled binary in practice
  (src/sph.cpp:536-543,518-520; SURVEY.md §2.1.3);
* strict lower-boundary exclusion ``vxi > 0`` vs ``vxi < cells``
  (src/sph.cpp:578-582; quirk 4);
* the int32-wrapping LCG start offset ``1664525*(i+a)+1013904223`` with C
  truncated-modulo semantics — a negative offset makes the whole bucket
  out-of-bounds on its first 8-block, which aborts the bucket: this is why
  the reference finds zero neighbors for ~87% of particles (measured,
  BASELINE.md) (src/sph.cpp:590-592);
* parity-alternating iteration direction (src/sph.cpp:593);
* 8-wide blocks, bucket abandoned at the first block that touches either end
  (src/sph.cpp:618-620);
* early exit once more than 24 neighbors are stored (cap 32,
  src/sph.cpp:679-682);
* stored scaled distances reused by the later phases (src/sph.cpp:668,742).

Bucket contents are ascending particle ids — identical to the reference's
sequential push_back order (src/sph.cpp:476-480) — provided by the stable
cell-id sort in ``ops.grid``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SphConfig
from ..ops.grid import build_grid, cell_coords

_i32 = jnp.int32
K = 8  # the reference's SSE block width (src/sph.cpp:32)

# Voxel-offset table after the slot-3 overwrite; slot 4 is uninitialised in
# the reference and emulated as never-valid.  Entries are (use_x, use_y, use_z)
# multipliers on the per-particle octant signs.
_SLOTS = [
    (0, 0, 0),   # 0: own cell
    (1, 0, 0),   # 1: x face
    (0, 1, 0),   # 2: y face
    (1, 1, 0),   # 3: xy edge (overwrote the z face, src/sph.cpp:536-543)
    "GARBAGE",   # 4: uninitialised stack values (see slot4 handling below)
    (1, 0, 1),   # 5: xz edge
    (0, 1, 1),   # 6: yz edge
    (1, 1, 1),   # 7: corner
]


class CompatNeighbors(NamedTuple):
    ids: jnp.ndarray     # [N, 32] int32, valid in [0, count); padding = N
    dists: jnp.ndarray   # [N, 32] float32 scaled distances (as stored by ref)
    count: jnp.ndarray   # [N] int32
    overflow_cells: jnp.ndarray  # scalar int32 (emulation exact only if 0)


def _trunc_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """C's % (truncated toward zero; sign follows the dividend).  b > 0."""
    q = jnp.abs(a) // b
    return a - jnp.sign(a) * q * b


def build_cell_table(cfg: SphConfig, pos: jnp.ndarray
                     ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense [C, cap] table of ascending particle ids per cell + counts."""
    n = pos.shape[0]
    g = build_grid(cfg, pos)
    counts = g.cell_end - g.cell_start                      # [C]
    rank = jnp.arange(n, dtype=_i32) - g.cell_start[g.cell_ids]
    cap = cfg.cell_capacity
    table = jnp.full((cfg.num_cells, cap), n, _i32)
    # rank >= cap rows are dropped (counted via overflow_cells)
    table = table.at[g.cell_ids, rank].set(g.order, mode="drop")
    return table, counts, g.overflow_cells


def find_neighbors_compat(cfg: SphConfig, pos: jnp.ndarray,
                          slot4: str = "skip") -> CompatNeighbors:
    """Emulate findNeighbors for every particle.  [N]-vmapped, jittable.

    ``slot4`` selects how the uninitialised voxel-table slot 4 behaves in the
    compiled binary being matched: "skip" (garbage fails the bounds check,
    bucket never visited) or "bump" (garbage passes bounds + non-empty, so
    ``almost_a_random`` advances, but no neighbors are stored).  Which one is
    right is an empirical property of the binary; the parity harness checks.
    """
    n = pos.shape[0]
    cap = cfg.cell_capacity
    table, counts, overflow = build_cell_table(cfg, pos)
    coords = cell_coords(cfg, pos)                          # [N,3] clamped

    h = jnp.float32(cfg.h)
    h2 = jnp.float32(cfg.h2)
    cell = jnp.float32(cfg.cell_size)
    scale = jnp.float32(cfg.sim_scale)
    max_blocks = -(-cap // K)
    max_store = cfg.max_neighbors

    def per_particle(pi, my_pos, my_coord):
        orient = my_pos - my_coord.astype(jnp.float32) * cell
        sgn = jnp.where(orient > h, 1, -1).astype(_i32)     # src/sph.cpp:513-515

        ids0 = jnp.full((max_store + K,), n, _i32)          # slack for the last block
        dists0 = jnp.zeros((max_store + K,), jnp.float32)

        def do_slot(slot_mults, carry):
            ids, dists, cnt, almost, done = carry
            mults = jnp.asarray(slot_mults, _i32)
            v = my_coord + mults * sgn
            in_bounds = ((v[0] > 0) & (v[0] < cfg.grid_nx)
                         & (v[1] > 0) & (v[1] < cfg.grid_ny)
                         & (v[2] > 0) & (v[2] < cfg.grid_nz))
            cid = (v[2] * cfg.grid_ny + v[1]) * cfg.grid_nx + v[0]
            cid = jnp.clip(cid, 0, cfg.num_cells - 1)
            blen = counts[cid]
            process = in_bounds & (blen > 0) & ~done

            lcg = (_i32(1664525) * (pi + almost) + _i32(1013904223))
            almost = almost + process.astype(_i32)
            offset = _trunc_mod(lcg, jnp.maximum(blen, 1))
            direction = jnp.where(pi % 2 == 1, _i32(-1), _i32(1))
            max_steps = (blen + K - 1) // K

            def block_body(b, st):
                ids_b, dists_b, cnt_b, stop = st
                idxs = offset + jnp.arange(K, dtype=_i32) + (K * b) * direction
                oob = jnp.any((idxs < 0) | (idxs >= blen))
                active = process & ~stop & ~oob & (b < max_steps)

                cand = table[cid, jnp.clip(idxs, 0, cap - 1)]
                cand_pos = pos[jnp.clip(cand, 0, n - 1)]
                diff = my_pos - cand_pos
                not_self = cand != pi
                d2 = jnp.sum(diff * diff, axis=-1) * not_self.astype(jnp.float32)
                # Quirk: the reference's bitmask comes from _mm_loadu_ps /
                # _mm_movemask_ps on a float[8] buffer — __m128 holds FOUR
                # lanes, so bits 4..7 are always 0 and only the first half of
                # every 8-block can ever be accepted (src/sph.cpp:651-666).
                sse_lane = jnp.arange(K, dtype=_i32) < (K // 2)
                hit = active & not_self & (d2 < h2) & (cand < n) & sse_lane

                # compressed append in j order (src/sph.cpp:665-677)
                prefix = jnp.cumsum(hit.astype(_i32)) - hit.astype(_i32)
                tgt = jnp.where(hit, cnt_b + prefix, max_store + K - 1)
                ids_b = ids_b.at[tgt].set(jnp.where(hit, cand, ids_b[tgt]))
                d_store = jnp.sqrt(d2) * scale
                dists_b = dists_b.at[tgt].set(jnp.where(hit, d_store, dists_b[tgt]))
                cnt_b = cnt_b + jnp.sum(hit.astype(_i32))

                enough = cnt_b > (max_store - K)            # src/sph.cpp:679-682
                stop = stop | oob | (b + 1 >= max_steps) | enough | ~active
                return ids_b, dists_b, cnt_b, stop

            ids, dists, cnt, stop = jax.lax.fori_loop(
                0, max_blocks, block_body, (ids, dists, cnt, ~process))
            done = done | (cnt > (max_store - K))
            return ids, dists, cnt, almost, done

        carry = (ids0, dists0, _i32(0), _i32(0), jnp.bool_(False))
        for slot_mults in _SLOTS:
            if slot_mults == "GARBAGE":
                if slot4 == "bump":
                    ids, dists, cnt, almost, done = carry
                    almost = almost + (~done).astype(_i32)
                    carry = (ids, dists, cnt, almost, done)
                continue                                    # quirk 3: slot 4 garbage
            carry = do_slot(slot_mults, carry)
        ids, dists, cnt, _, _ = carry
        return ids[:max_store], dists[:max_store], cnt

    ids, dists, cnt = jax.vmap(per_particle)(
        jnp.arange(n, dtype=_i32), pos, coords)
    return CompatNeighbors(ids=ids, dists=dists, count=cnt,
                           overflow_cells=overflow)
