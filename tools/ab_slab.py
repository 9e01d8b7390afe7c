"""Interleaved A/B of the DISTRIBUTED slab engine under config-dial overrides.

Same interleaved design as ab_dials.py (tunnel drift hits all variants
equally), but drives the production distributed path at the strong-scaling
proxy geometry (``run_slab_benchmark`` semantics: n per chip in a
``grid_nz``-plane box, 1-device mesh, scan_block dispatch amortization) —
the workload VERDICT r4 #1 targets (125k/chip capped row -> <= 8 ms).

Usage: python tools/ab_slab.py [N] [K_c] [rounds] [block_calls] [grid_nz]
                               [scan_block] [only,names]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst
from smoothed_particle_hydrodynamics_tpu.parallel import slabs

VARIANTS = [
    ("baseline", {}),                                  # block 256 (prod dial)
    ("block512", {"pallas_block_t": 512}),             # measured loss at 125k
    ("block128", {"pallas_block_t": 128}),
    # cell size: bigger cells = harder K_c binding (fewer swept rows) +
    # bigger drift skin (fewer rebins), at the cost of sampling noise
    # (docs/PERFORMANCE.md r3 #9)
    ("csf1.0", {"cell_size_factor": 1.0}),
    ("csf1.5", {"cell_size_factor": 1.5}),
    ("csf1.75", {"cell_size_factor": 1.75}),
    ("csf2.0", {"cell_size_factor": 2.0}),
    ("csf2.5", {"cell_size_factor": 2.5}),
    ("csf1.75+b512", {"cell_size_factor": 1.75, "pallas_block_t": 512}),
    ("csf2.0+b512", {"cell_size_factor": 2.0, "pallas_block_t": 512}),
    # past-2.5 ladder + dispatch amortization (the _scan_block pseudo-dial
    # overrides the argv scan_block per variant)
    ("csf3.0", {"cell_size_factor": 3.0}),
    ("csf2.5+sb16", {"cell_size_factor": 2.5, "_scan_block": 16}),
    ("csf3.0+sb16", {"cell_size_factor": 3.0, "_scan_block": 16}),
    ("csf2.5+sb32", {"cell_size_factor": 2.5, "_scan_block": 32}),
    ("csf3.0+sb32", {"cell_size_factor": 3.0, "_scan_block": 32}),
    ("csf1.25+sb16", {"_scan_block": 16}),
    # r5 session 3: extend both ladders past the sb32/csf3.0 knee
    ("csf2.5+sb64", {"cell_size_factor": 2.5, "_scan_block": 64}),
    ("csf3.0+sb64", {"cell_size_factor": 3.0, "_scan_block": 64}),
    ("csf4.0+sb32", {"cell_size_factor": 4.0, "_scan_block": 32}),
    ("csf4.0+sb64", {"cell_size_factor": 4.0, "_scan_block": 64}),
    # window_t is auto-derived (p90) in capped mode; w64 forces the floor to
    # test whether the derived window still carries slack at big csf
    ("csf3.0+sb32+w64", {"cell_size_factor": 3.0, "_scan_block": 32,
                         "pallas_window_t": 64}),
    # r5 session 3b: the ablation anatomy (docs/ROUND5.md #12) shows the
    # sweeps are visit-fixed-cost bound at this load; block512 halves the
    # (block, rod) visit count, and at csf >= 3 the K4 windows stay under
    # the 64-row chunk floor even at double block extent (unlike csf <= 1.75
    # where block512 measured a loss)
    ("csf3.0+sb32+b512", {"cell_size_factor": 3.0, "_scan_block": 32,
                          "pallas_block_t": 512}),
    ("csf3.0+sb64+b512", {"cell_size_factor": 3.0, "_scan_block": 64,
                          "pallas_block_t": 512}),
    ("csf4.0+sb64+b512", {"cell_size_factor": 4.0, "_scan_block": 64,
                          "pallas_block_t": 512}),
    ("csf4.0+sb64+b512+w40", {"cell_size_factor": 4.0, "_scan_block": 64,
                              "pallas_block_t": 512, "pallas_window_t": 40}),
    # (b1024 was tried here and removed: Mosaic compile crash at csf3/4,
    # slower than b512 at csf5 — see _validate's note in pallas_step_t)
    ("csf5.0+sb64+b512", {"cell_size_factor": 5.0, "_scan_block": 64,
                          "pallas_block_t": 512}),
    ("csf6.0+sb64+b512", {"cell_size_factor": 6.0, "_scan_block": 64,
                          "pallas_block_t": 512}),
    ("csf5.0+sb128+b512", {"cell_size_factor": 5.0, "_scan_block": 128,
                           "pallas_block_t": 512}),
    ("csf4.0+sb128+b512", {"cell_size_factor": 4.0, "_scan_block": 128,
                           "pallas_block_t": 512}),
    # r5 session 3c: the fused capped sweep (one pass computes density AND
    # force, fed by the sub-frame density pre-pass — pallas_step_t
    # _fused_kernel_t); removes the full density sweep's visits
    ("csf4.0+sb64+b512+fused", {"cell_size_factor": 4.0, "_scan_block": 64,
                                "pallas_block_t": 512, "capped_fused": True}),
    ("csf5.0+sb64+b512+fused", {"cell_size_factor": 5.0, "_scan_block": 64,
                                "pallas_block_t": 512, "capped_fused": True}),
    ("csf2.5+sb32+fused", {"cell_size_factor": 2.5, "_scan_block": 32,
                           "capped_fused": True}),
    ("csf1.25+sb8+fused", {"_scan_block": 8, "capped_fused": True}),
    ("csf6.0+sb64+b512+fused", {"cell_size_factor": 6.0, "_scan_block": 64,
                                "pallas_block_t": 512, "capped_fused": True}),
    ("csf6.0+sb128+b512+fused", {"cell_size_factor": 6.0, "_scan_block": 128,
                                 "pallas_block_t": 512, "capped_fused": True}),
    ("csf5.0+sb128+b512+fused", {"cell_size_factor": 5.0, "_scan_block": 128,
                                 "pallas_block_t": 512, "capped_fused": True}),
    ("csf8.0+sb128+b512+fused", {"cell_size_factor": 8.0, "_scan_block": 128,
                                 "pallas_block_t": 512, "capped_fused": True}),
]

SETTLE_CALLS = 2


class Variant:
    def __init__(self, name, extra, n, k_c, grid_nz, scan_block):
        self.name = name
        extra = dict(extra)
        scan_block = extra.pop("_scan_block", scan_block)
        ov = dict(num_particles=n, cell_size_factor=1.25,
                  pallas_block_t=256,
                  pallas_interpret=jax.devices()[0].platform == "cpu")
        if grid_nz:
            ov["grid_nz"] = grid_nz
        if k_c:
            ov.update(capped_candidates=k_c, pallas_window_t=0)
        ov.update(extra)
        cfg, state = make_scene("splash", **ov)
        if cfg.pallas_window_t == 0:
            cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
        zsplit = slabs.derive_zsplit(cfg, state, 1)
        p_cap, h_cap, m_cap = slabs.derive_slab_caps(
            cfg, state, 1, zsplit=zsplit, headroom=1.05)
        sub_len = (slabs.derive_sub_len_slab(cfg, state, 1, zsplit)
                   if cfg.capped_candidates else None)
        self.carry = slabs.distribute(cfg, state, mesh, p_cap, zsplit=zsplit)
        self.k = max(scan_block, 1)
        self.step = slabs.make_slab_step(
            cfg, mesh, p_cap, h_cap, m_cap, sweeps="pallas", zsplit=zsplit,
            donate=True, sub_len=sub_len, scan_block=scan_block)
        for _ in range(SETTLE_CALLS):          # compile + settle off-clock
            self.carry, self.diag = self.step(self.carry)
        np.asarray(jax.device_get(self.carry.rebin_count))
        self.times = []

    def measure_block(self, calls):
        for _ in range(calls):
            t0 = time.perf_counter()
            self.carry, self.diag = self.step(self.carry)
            np.asarray(jax.device_get(self.carry.rebin_count))
            self.times.append((time.perf_counter() - t0) * 1000 / self.k)

    def report(self):
        t = np.asarray(self.times)
        print(f"{self.name:16s} mean {t.mean():8.3f}  med {np.median(t):8.3f}"
              f"  p10 {np.percentile(t, 10):8.3f} ms/step"
              f"  rebins {int(np.asarray(self.carry.rebin_count)[0])}"
              f"  mig_drop {int(np.ravel(self.diag.migration_dropped)[-1])}",
              flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 125_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    block_calls = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    grid_nz = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    scan_block = int(sys.argv[6]) if len(sys.argv) > 6 else 8
    only = sys.argv[7].split(",") if len(sys.argv) > 7 else None
    names = [(nm, ex) for nm, ex in VARIANTS if not only or nm in only]
    print(f"n={n} K_c={k_c} rounds={rounds} calls/round={block_calls} "
          f"grid_nz={grid_nz} scan_block={scan_block} "
          f"device={jax.devices()[0]}", flush=True)
    variants = []
    for nm, ex in names:
        print(f"  building {nm} ...", flush=True)
        try:
            variants.append(Variant(nm, ex, n, k_c, grid_nz, scan_block))
        except Exception as e:  # noqa: BLE001 - a variant that cannot
            print(f"  {nm} FAILED to build: {e!r:.300}", flush=True)
    for r in range(rounds):
        for v in variants:
            v.measure_block(block_calls)
        print(f"  round {r + 1}/{rounds} done", flush=True)
    for v in variants:
        v.report()


if __name__ == "__main__":
    main()
