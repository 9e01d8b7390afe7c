"""DMA-floor probe: is the sweep issue-bound (VPU) or byte-bound (DMA)?

Runs kernels with the EXACT production sweep structure (same prepare_t
windows, same [s_t, 128] slab DMAs, same double-buffered pipeline, same
grid) but a controlled number of VPU ops per lane K in {1, 6, 12, 24, 48}.
A linear fit  time(K) = a + b*K  separates the two rooflines:

* ``a`` (intercept) = everything that is NOT per-lane VPU issue — the HBM
  DMA for the windows, per-rod bookkeeping, pipeline waits, output writes.
  Byte-packing levers (bf16 candidate fields, two-rods-per-row) can only
  ever attack ``a``; if a << production sweep time they cannot pay.
* ``b`` (slope, ms per op-per-lane) = the VPU issue cost of one
  elementwise op over the full swept volume.  b * swept_lanes gives the
  effective VPU rate, quotable as a fraction of the v5e VPU peak (the MFU
  line BASELINE.md carries).

The production density sweep issues ~24 ops/lane and force ~40 (counted in
ops/pallas_step_t.py pair_compute bodies); the fit prediction at those
op counts is cross-checked against the real sweeps in the same process.

Usage: python tools/probe_dma_floor.py [N] [K_c]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

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
    print(f"{name:40s} {dt:9.3f} ms", flush=True)
    return dt


def _probe_kernel(cfg, s_t, block_base, n_ops,
                  ws_ref, wc_ref, ref_ref, fields_hbm, self_ref,
                  out_ref, cand, sem):
    """Production sweep skeleton with n_ops VPU ops per lane.

    The op chain is a dependent multiply-add ladder on the [s_t, 128]
    broadcast of candidate column 0 against the self row — the same tile
    shape and broadcast pattern as the real pair math, unfusable and
    unhoistable (depends on both the tile and the accumulator).
    """
    xi = self_ref[0:1, :]

    def pair_compute(carry, tiles, r, jg, own, gate):
        t = tiles[0][:, 0:1] - xi          # [s_t, 128] broadcast, 1 op
        acc = carry
        for _ in range(max(n_ops - 2, 0) // 2):
            acc = acc + t * 1.0000001       # fused mul-add pair
        return acc + jnp.sum(t, axis=0, keepdims=True) * 0.0

    init = jnp.zeros((1, pst.BLANE), jnp.float32)
    acc = pst._sweep_body_t(cfg, s_t, block_base, ws_ref, wc_ref, ref_ref,
                            fields_hbm, self_ref, cand, sem,
                            init, pair_compute)
    out_ref[0, :] = jnp.sum(acc, axis=0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    cfg, state = make_scene("splash", num_particles=n,
                            cell_size_factor=1.25)
    if k_c:
        from smoothed_particle_hydrodynamics_tpu.ops.pallas_step_t import (
            derive_sub_len)
        cfg = cfg.replace(capped_candidates=k_c, pallas_window_t=0)
        cfg = cfg.replace(capped_sub_len=derive_sub_len(cfg, state))
    from smoothed_particle_hydrodynamics_tpu.ops.pallas_step_t import (
        derive_window_t)
    if cfg.pallas_window_t == 0:
        cfg = cfg.replace(pallas_window_t=derive_window_t(cfg, state))
    print(f"n={n} K_c={k_c} window_t={cfg.pallas_window_t}")

    prep = jax.jit(partial(pst.prepare_t, cfg))
    p = sync(prep(state))

    # swept volume for the MFU line: chunks * s_t * 128 lanes
    wc = np.asarray(p.wc)
    swept_lanes = int(wc.sum()) * cfg.pallas_window_t * pst.BLANE
    print(f"swept lanes/sweep: {swept_lanes/1e9:.2f} G "
          f"(windows {int((wc>0).sum())}, chunks {int(wc.sum())})")

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

    def probe_fn(n_ops):
        f = jax.jit(lambda c, s: pst._run_chunked(
            cfg, p, partial(_probe_kernel, n_ops=n_ops), c, s,
            out_specs=pl.BlockSpec((1, pst.BLANE), lambda i, *_: (0, i)),
            make_out_shape=lambda rows: jax.ShapeDtypeStruct(
                (1, rows), jnp.float32)))
        return lambda: f(cand, selfc)

    ks = [2, 6, 12, 24, 48]
    ts = []
    for k in ks:
        ts.append(bench(f"probe sweep, {k:3d} ops/lane", probe_fn(k)))

    b, a = np.polyfit(ks, ts, 1)
    print(f"\nfit: time = {a:.1f} ms + {b:.3f} ms/op  (r2 "
          f"{1 - np.var(np.polyval([b, a], ks) - ts)/np.var(ts):.4f})")
    print(f"DMA+bookkeeping floor a = {a:.1f} ms; at the production density "
          f"op count (~24): floor share {a/np.polyval([b,a],[24])[0]*100:.0f}%")
    rate = swept_lanes / (b * 1e-3) / 1e12
    print(f"VPU issue rate from slope: {rate:.2f} Tops/s "
          f"({rate/3.85*100:.0f}% of the ~3.85 Tops/s v5e VPU issue peak "
          f"[8x128 lanes x 4 slots x 0.94 GHz])")

    # cross-check against the real sweeps in the same process
    dens = jax.jit(lambda st: pst.density_sweep_t(cfg, pst.prepare_t(cfg, st)))
    rho_s = sync(jax.jit(lambda st: pst.density_sweep_t(
        cfg, pst.prepare_t(cfg, st))[0])(state))
    p_fixed = p
    dfn = jax.jit(partial(pst.density_sweep_t, cfg))
    bench("real density sweep", dfn, p_fixed)
    ffn = jax.jit(partial(pst.force_sweep_t, cfg))
    bench("real force sweep", ffn, p_fixed, rho_s[:p.pos_s.shape[0]])


if __name__ == "__main__":
    main()
