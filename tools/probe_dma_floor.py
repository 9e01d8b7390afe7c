"""DMA-floor probe: what the sweep pays for DMA bytes vs descriptors vs VPU.

Round-4 finding that motivated this tool: a probe kernel with the EXACT
production sweep structure (same prepare_t windows, same [s_t, 128] slab
DMAs, same double-buffered pipeline, same grid) runs at ~27 ms at 1M with
trivial compute, vs 44 ms for the real density sweep — so ~60% of the sweep
is NOT per-lane VPU math.  This probe decomposes that floor with three
variants at constant descriptor count and constant VPU volume:

* ``full``      — DMA s_t rows per window, compute K FMAs/lane on [s_t,128].
* ``halfbytes`` — DMA only s_t/2 rows (same descriptor count, HALF the
                  bytes), compute the same K FMAs/lane (twice on
                  [s_t/2,128]).  full - halfbytes = cost of s_t/2 rows of
                  pure DMA BYTES.
* ``nodma``     — no window DMA at all (compute on the scratch as-is).
                  The remaining time is grid iteration + output writes +
                  per-block bookkeeping.

The VPU ladder is a dependent FMA chain (acc = acc*c + t), which Mosaic
cannot reassociate away (verified: the earlier additive ladder folded flat).

Decision rule (VERDICT r3 #5): byte-packing levers (bf16 fields,
k-candidates-per-row packing) can save at most (full - halfbytes) * 2 *
pack_factor_share; if that is small next to the real sweeps, the levers
cannot pay and PERFORMANCE.md records the proof.

Usage: python tools/probe_dma_floor.py [N] [K_c]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst


def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(jnp.ravel(leaf)[:1])
    return x


def bench(name, fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:9.3f} ms", flush=True)
    return dt


def _probe_kernel(n_ops, mode, cfg, s_t, block_base,
                  ws_ref, wc_ref, ref_ref, fields_hbm, self_ref,
                  out_ref, cand, sem):
    """Production sweep skeleton; mode in {"full", "halfbytes", "nodma"}.

    VPU volume is held constant across modes: n_ops dependent FMAs per lane
    over s_t*128 lanes per (rod, chunk) — as one [s_t,128] ladder (full /
    nodma) or two [s_t/2,128] ladders (halfbytes)."""
    del wc_ref  # single-chunk timing probe: every window walks one chunk
    i = pl.program_id(0)
    nblocks = pl.num_programs(0)
    nranges = len(pst._RODS)
    xi = self_ref[0:1, :]
    c_fma = jnp.float32(0.9999999)

    def wsl(block, r):
        return ws_ref[block * nranges + r]

    def dma(block, r, slot):
        row0 = pl.multiple_of(wsl(block, r), pst.SUB)
        rows = s_t // 2 if mode == "halfbytes" else s_t
        return pltpu.make_async_copy(
            fields_hbm.at[pl.ds(row0, rows), :],
            cand.at[slot, r, 0, pl.ds(0, rows)],
            sem.at[slot, r, 0])

    def start_block(block, slot):
        for r in range(nranges):
            dma(block, r, slot).start()

    if mode != "nodma":
        @pl.when(i == 0)
        def _():
            start_block(0, 0)

        @pl.when(i + 1 < nblocks)
        def _():
            start_block(i + 1, (i + 1) % 2)

    slot = i % 2
    acc = jnp.zeros((1, pst.BLANE), jnp.float32)
    for r in range(nranges):
        if mode != "nodma":
            dma(i, r, slot).wait()
        if mode == "halfbytes":
            for half in range(2):
                t = cand[slot, r, 0, (s_t // 2) * half:(s_t // 2) * (half + 1)]
                u = t[:, 0:1] - xi
                for _ in range(n_ops):
                    u = u * c_fma + t[:, 1:2]
                acc = acc + jnp.sum(u, axis=0, keepdims=True)
        else:
            t = cand[slot, r, 0]
            u = t[:, 0:1] - xi
            for _ in range(n_ops):
                u = u * c_fma + t[:, 1:2]
            acc = acc + jnp.sum(u, axis=0, keepdims=True)
    out_ref[0, :] = acc.reshape(pst.BLANE)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    cfg, state = make_scene("splash", num_particles=n,
                            cell_size_factor=1.25)
    if k_c:
        cfg = cfg.replace(capped_candidates=k_c, pallas_window_t=0)
        cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, state))
    cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
    print(f"n={n} K_c={k_c} window_t={cfg.pallas_window_t}")

    prep = jax.jit(partial(pst.prepare_t, cfg))
    p = sync(prep(state))

    wc = np.asarray(p.wc)
    s_t = cfg.pallas_window_t
    # the probe walks exactly one chunk per window: its swept volume
    swept_lanes = int((wc > 0).sum()) * s_t * pst.BLANE
    swept_gb = swept_lanes * 4 / 1e9
    print(f"probe swept: {swept_lanes/1e9:.2f} G lanes = {swept_gb:.1f} GB "
          f"(production chunks {int(wc.sum())}, windows {int((wc>0).sum())})")

    iota_f = jnp.arange(p.pos_s.shape[0], dtype=jnp.int32).astype(jnp.float32)
    if cfg.capped_candidates:
        pv = pst.gather_sub_pv(p)
        cand = jnp.concatenate(
            [pv[:, 0:3], p.cand_cid_f[:, None], p.wm_sub[:, None],
             p.sub_perm.astype(jnp.float32)[:, None]], axis=1)
    else:
        cand = jnp.concatenate(
            [p.pos_s, p.cid_f[:, None], p.mass_s[:, None], iota_f[:, None]],
            axis=1)
    pad = jnp.zeros((pst._n_pad_rows(cfg, cand.shape[0]) - cand.shape[0],
                     cand.shape[1]), jnp.float32)
    cand = jnp.concatenate([cand, pad], axis=0)
    selfc = jnp.concatenate(
        [p.pos_s, p.mass_s[:, None], p.cid_f[:, None]], axis=1)

    def probe_fn(n_ops, mode):
        f = jax.jit(lambda c, s: pst._run_chunked(
            cfg, p, partial(_probe_kernel, n_ops, mode), c, s,
            out_specs=pl.BlockSpec((1, pst.BLANE), lambda i, *_: (0, i)),
            make_out_shape=lambda rows: jax.ShapeDtypeStruct(
                (1, rows), jnp.float32)))
        return lambda: f(cand, selfc)

    results = {}
    for mode in ("full", "halfbytes", "nodma"):
        for k in (2, 12, 24):
            results[(mode, k)] = bench(f"{mode:10s} {k:3d} FMA/lane",
                                       probe_fn(k, mode))

    print()
    for k in (2, 12, 24):
        full, half, nod = (results[("full", k)], results[("halfbytes", k)],
                           results[("nodma", k)])
        print(f"K={k:3d}: bytes(s_t/2 rows)={full-half:6.2f} ms  "
              f"dma_total={full-nod:6.2f} ms  grid+vpu={nod:6.2f} ms")
    # VPU issue rate from the FMA slope of the nodma variant
    b = (results[("nodma", 24)] - results[("nodma", 2)]) / 22
    rate = swept_lanes / (b * 1e-3) / 1e12 if b > 0 else float("inf")
    print(f"nodma FMA slope {b*1000:.1f} us/FMA -> {rate:.2f} TFMA/s over the "
          f"swept volume")

    # cross-check against the real sweeps in the same process
    rho_s = sync(jax.jit(partial(pst.density_sweep_t, cfg))(p))[0]
    bench("real density sweep", jax.jit(partial(pst.density_sweep_t, cfg)), p)
    bench("real force sweep", jax.jit(partial(pst.force_sweep_t, cfg)),
          p, rho_s)


if __name__ == "__main__":
    main()
