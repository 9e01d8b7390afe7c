"""Sub-phase timing of prepare_t (the capped-mode rebuild) on the device.

The rebuild is paid every ~3 steps under the lazy driver's drift skin, so its
cost is a first-order term of the capped step (docs/PERFORMANCE.md r3 #3).
This breaks it into: bin+sort, stacked field gather, rank/occ scans, the
kept-compaction sort, sub-frame cid gathers, and the window tables.

Usage: python tools/profile_prepare.py [N] [K_c]
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy, pallas_step_t as pst
from smoothed_particle_hydrodynamics_tpu.ops.grid import cell_coords, linear_cell_id


def _sync(out):
    import numpy as np

    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.ravel(leaf)[:1])
    return out


def bench(name, fn, *args, iters=10):
    out = _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s} {dt:9.3f} ms")
    return out


def main(n=1_000_000, k_c=4, steps_settle=10):
    overrides = dict(num_particles=n, cell_size_factor=1.25,
                     capped_candidates=k_c, pallas_window_t=0)
    cfg, state = make_scene("splash", **overrides)
    cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
    if cfg.capped_sub_len == 0:
        cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, state))
    print(f"n={n} K_c={k_c} window_t={cfg.pallas_window_t} "
          f"sub_len={cfg.capped_sub_len}")
    carry, _ = lazy.drive_loop_lazy(cfg, state, steps_settle,
                                    collect_diags=False, keep_carry=True)
    st = carry.state

    def phase_cid(pos):
        return linear_cell_id(cfg, cell_coords(cfg, pos))

    cid = bench("cell ids", jax.jit(phase_cid), st.position)
    iota = jnp.arange(n, dtype=jnp.int32)

    def phase_sort3(cid):
        return jax.lax.sort((cid, pst._hash32(iota), iota), num_keys=2)

    def phase_sort2(cid):
        return jax.lax.sort((cid, iota), num_keys=1)

    cid_sorted, _, order = bench("pair sort (cid,hash,iota)",
                                 jax.jit(phase_sort3), cid)
    bench("pair sort (cid,iota)  [exact's]", jax.jit(phase_sort2), cid)

    def phase_gather(order):
        stacked = jnp.concatenate(
            [st.position, st.velocity, st.mass[:, None]], axis=1)
        return stacked[order]

    bench("stacked [N,7] field gather", jax.jit(phase_gather), order)

    def phase_rank(cid_sorted):
        return pst._run_rank_occ(cid_sorted)

    rank, occ = bench("rank/occ scans", jax.jit(phase_rank), cid_sorted)

    def phase_compact(rank):
        keep = rank < k_c
        return jax.lax.sort(
            (jnp.where(keep, 0, 1).astype(jnp.int32), iota), num_keys=1)

    _, perm_full = bench("kept-compaction sort", jax.jit(phase_compact), rank)

    s_len = pst.sub_len(cfg, n)

    def phase_subcid(perm_full, cid_sorted):
        sub_perm = perm_full[:s_len]
        return cid_sorted[sub_perm]

    bench("sub cid gather [S]", jax.jit(phase_subcid), perm_full, cid_sorted)

    def phase_windows(cid_sorted, cid_search):
        nblocks = -(-n // pst.BLANE)
        return pst._block_windows_t(cfg, cid_sorted, nblocks,
                                    cfg.pallas_window_t,
                                    n, pst._n_pad_rows(cfg, s_len),
                                    cid_search=cid_search)

    cid_search = jnp.where(iota[:s_len] < s_len, cid_sorted[:s_len], 0)
    bench("window tables (bincount+cum)", jax.jit(phase_windows),
          cid_sorted, cid_search)

    prep = jax.jit(partial(pst.prepare_t, cfg))
    bench("prepare_t end-to-end", prep, st)


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(n, k_c)
