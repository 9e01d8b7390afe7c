"""A/B the production lazy driver under config-dial overrides.

Times steady-state and rebin steps of the single-chip lazy pallas driver at
a given N for each named override set, all in one process from identical
initial state, printing a per-variant line.  Used for the round-3 hardware
A/Bs of ``fused_kdk``, ``force_recip``, and friends
(docs/PERFORMANCE.md round-3 session-3 items 18-21).

Usage: python tools/ab_dials.py [N] [K_c] [steps] -- then edit VARIANTS.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy
from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst

VARIANTS = [
    ("baseline", {}),
    ("fused_kdk", {"fused_kdk": True}),
    ("force_recip", {"force_recip": "recip"}),
    ("force_approx2", {"force_recip": "approx2"}),
    ("fused+recip", {"fused_kdk": True, "force_recip": "recip"}),
]


def run_variant(name, extra, n, k_c, steps, settle):
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

    carry, _ = lazy.drive_loop_lazy(cfg, state, settle,
                                    collect_diags=False, keep_carry=True)
    step = jax.jit(lambda c: lazy.lazy_step(cfg, c)[0])
    carry2 = step(carry)
    np.asarray(carry2.state.position[:1, :1])  # compile + sync

    times, rebinned = [], []
    rb_prev = int(carry.rebin_count)
    for _ in range(steps):
        t0 = time.perf_counter()
        carry = step(carry)
        np.asarray(carry.state.position[:1, :1])
        dt = (time.perf_counter() - t0) * 1000
        rb = int(carry.rebin_count)
        times.append(dt)
        rebinned.append(rb > rb_prev)
        rb_prev = rb
    t, m = np.asarray(times), np.asarray(rebinned)
    steady = float(t[~m].mean()) if (~m).any() else float("nan")
    rebin = float(t[m].mean()) if m.any() else float("nan")
    ke = float(carry.state.velocity[:, 0].sum())  # cheap state fingerprint
    print(f"{name:18s} all {t.mean():8.3f}  steady {steady:8.3f} ms  "
          f"rebin {rebin:8.3f} ms  (rebins {int(m.sum())}/{steps})  "
          f"fp {ke:+.6e}", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    settle = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    only = sys.argv[5].split(",") if len(sys.argv) > 5 else None
    print(f"n={n} K_c={k_c} steps={steps} settle={settle} "
          f"device={jax.devices()[0]}")
    for name, extra in VARIANTS:
        if only and name not in only:
            continue
        run_variant(name, extra, n, k_c, steps, settle)


if __name__ == "__main__":
    main()
