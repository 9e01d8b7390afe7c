"""A/B the production lazy driver under config-dial overrides.

Interleaved design: every variant gets its own settled carry + jitted step,
then measurement alternates between variants in R rounds of B steps each
(V1 B-steps, V2 B-steps, ..., V1 B-steps, ...).  Tunnel/day drift hits all
variants equally, unlike sequential fresh-process runs where ±10% drift
between processes swamps few-percent dial effects (measured 2026-08-18:
capped baseline read 97.3 / 109.8 ms steady in two back-to-back processes).

Used for the r3-r5 hardware dial A/Bs (docs/PERFORMANCE.md r3 #18-24, r5
dial-hygiene note; the dead dials those A/Bs killed — fused_kdk,
force_recip, pallas_rods=3 — were deleted along with their variants here).

Usage: python tools/ab_dials.py [N] [K_c] [rounds] [block] [only,names]
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy
from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst

VARIANTS = [
    ("baseline", {}),
    # r4: wider kernel blocks — fewer DMA descriptors / per-rod fixed costs
    # for ~35% more cheap union-window lanes (PERFORMANCE.md r4 #32)
    ("block256", {"pallas_block_t": 256}),
    ("block512", {"pallas_block_t": 512}),
    # r5: cell size as a capped-mode dial — bigger cells bind K_c harder
    # (fewer swept rows) and enlarge the drift skin (fewer rebins), at the
    # cost of sampling noise (tools/capped_noise.py quantifies it)
    ("csf1.5", {"cell_size_factor": 1.5}),
    ("csf1.75", {"cell_size_factor": 1.75}),
    ("csf2.0", {"cell_size_factor": 2.0}),
    ("csf2.5", {"cell_size_factor": 2.5}),
]

SETTLE = 10


class Variant:
    def __init__(self, name, extra, n, k_c):
        self.name = name
        ov = dict(num_particles=n, cell_size_factor=1.25,
                  pallas_interpret=jax.devices()[0].platform == "cpu")
        if k_c:
            ov.update(capped_candidates=k_c, pallas_window_t=0)
        ov.update(extra)
        cfg, state = make_scene("splash", **ov)
        if cfg.pallas_window_t == 0:
            cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
        if k_c and cfg.capped_sub_len == 0:
            cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, state))
        self.carry, _ = lazy.drive_loop_lazy(cfg, state, SETTLE,
                                             collect_diags=False,
                                             keep_carry=True)
        self.step = jax.jit(lambda c, _cfg=cfg: lazy.lazy_step(_cfg, c)[0])
        c2 = self.step(self.carry)          # compile outside the timed region
        np.asarray(c2.state.position[:1, :1])
        self.times, self.rebinned = [], []

    def measure_block(self, block):
        rb_prev = int(self.carry.rebin_count)
        for _ in range(block):
            t0 = time.perf_counter()
            self.carry = self.step(self.carry)
            np.asarray(self.carry.state.position[:1, :1])
            self.times.append((time.perf_counter() - t0) * 1000)
            rb = int(self.carry.rebin_count)
            self.rebinned.append(rb > rb_prev)
            rb_prev = rb

    def report(self):
        t = np.asarray(self.times)
        m = np.asarray(self.rebinned)
        steady = float(np.median(t[~m])) if (~m).any() else float("nan")
        rebin = float(np.median(t[m])) if m.any() else float("nan")
        fp = float(self.carry.state.velocity[:, 0].sum())
        print(f"{self.name:14s} mean {t.mean():8.3f}  steady-med {steady:8.3f}"
              f" ms  rebin-med {rebin:8.3f} ms  (rebins {int(m.sum())}"
              f"/{len(t)})  fp {fp:+.6e}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    block = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    only = sys.argv[5].split(",") if len(sys.argv) > 5 else None
    names = [(nm, ex) for nm, ex in VARIANTS if not only or nm in only]
    print(f"n={n} K_c={k_c} rounds={rounds} block={block} "
          f"device={jax.devices()[0]}", flush=True)
    variants = []
    for nm, ex in names:
        print(f"  building {nm} ...", flush=True)
        variants.append(Variant(nm, ex, n, k_c))
    for r in range(rounds):
        for v in variants:
            v.measure_block(block)
        print(f"  round {r + 1}/{rounds} done", flush=True)
    for v in variants:
        v.report()


if __name__ == "__main__":
    main()
