"""Per-step drift/skin + rebin trace of the SINGLE-CHIP lazy driver.

Counterpart of tools/profile_slab.py's drift column: shows how fast max
per-particle drift eats the (c-h)/2 skin between rebins, to compare rebin
cadence across the two engines at the same sim phase.

Usage: python tools/trace_drift.py [N] [K_c] [csf] [steps]
"""

import sys
import time
from functools import partial

import jax
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy
from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst


def main(n=1_000_000, k_c=4, csf=1.25, steps=24, settle=10):
    ov = dict(num_particles=n, cell_size_factor=csf)
    if k_c:
        ov.update(capped_candidates=k_c, pallas_window_t=0)
    cfg, state = make_scene("splash", **ov)
    if cfg.pallas_window_t == 0:
        cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
    if k_c and cfg.capped_sub_len == 0:
        cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, state))
    skin = lazy.skin_half(cfg)
    print(f"n={n} K_c={k_c} csf={csf} skin={skin:.6f} "
          f"device={jax.devices()[0]}")

    carry, _ = lazy.drive_loop_lazy(cfg, state, settle,
                                    collect_diags=False, keep_carry=True)
    step_fn = lazy._cached_lazy_step(cfg)
    rb_prev = int(carry.rebin_count)
    times = []
    rebinned = []
    for i in range(steps):
        t0 = time.perf_counter()
        carry, _ = step_fn(carry)
        np.asarray(carry.state.position[:1, :1])
        dt = (time.perf_counter() - t0) * 1000
        rb = int(carry.rebin_count)
        fired = rb > rb_prev
        rb_prev = rb
        drift = float(np.abs(np.asarray(carry.state.position)
                             - np.asarray(carry.pos_bin)).max())
        times.append(dt)
        rebinned.append(fired)
        print(f"  step {settle + i:3d}  {dt:9.3f} ms  "
              f"{'REBIN' if fired else '     '}  drift/skin {drift/skin:5.2f}")
    t, m = np.asarray(times), np.asarray(rebinned)
    if (~m).any():
        print(f"steady {t[~m].mean():8.3f} ms  rebin "
              f"{t[m].mean() if m.any() else float('nan'):8.3f} ms  "
              f"rebins {int(m.sum())}/{steps}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(n=int(a[0]) if len(a) > 0 else 1_000_000,
         k_c=int(a[1]) if len(a) > 1 else 4,
         csf=float(a[2]) if len(a) > 2 else 1.25,
         steps=int(a[3]) if len(a) > 3 else 24)
