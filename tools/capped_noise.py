"""Density noise of the capped ("Subsets") mode vs the exact oracle.

Settles the 1M splash for a few steps with the EXACT lazy driver, then
computes density on that same state twice — exact celllist oracle vs the
capped sweeps at the requested (K_c, cell_size_factor) — and reports the
relative L2 and the mean-density ratio (the reweighted mode's unbiasedness
check).  This is the measurement behind the noise column of the capped
table in docs/PERFORMANCE.md (round-3 finding 3).

Usage: python tools/capped_noise.py [N] [K_c] [csf]
"""

import sys
from functools import partial

import jax
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy, pallas_step_t as pst
from smoothed_particle_hydrodynamics_tpu.ops.step import compute_forces


def main(n=1_000_000, k_c=4, csf=1.25, steps_settle=10):
    # settle with the EXACT driver so the state is identical across dials
    cfg0, state = make_scene("splash", num_particles=n,
                             cell_size_factor=1.25, pallas_window_t=208)
    st = lazy.unsort_carry(lazy.drive_loop_lazy(
        cfg0, state, steps_settle, collect_diags=False, keep_carry=True)[0])

    _, rho_exact, _ = jax.jit(
        partial(compute_forces, cfg0, backend="celllist"))(st)
    rho_exact = np.asarray(rho_exact)

    cfg, _ = make_scene("splash", num_particles=n, cell_size_factor=csf,
                        capped_candidates=k_c, pallas_window_t=0)
    cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, st))
    if cfg.capped_sub_len == 0:
        cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, st))

    def capped_rho(st):
        p = pst.prepare_t(cfg, st)
        rho_s, _ = pst.density_sweep_t(cfg, p)
        inv = jax.numpy.zeros_like(p.order).at[p.order].set(
            jax.numpy.arange(rho_s.shape[0], dtype=p.order.dtype))
        return rho_s[inv]

    rho_c = np.asarray(jax.jit(capped_rho)(st))
    l2 = float(np.linalg.norm(rho_c - rho_exact) / np.linalg.norm(rho_exact))
    ratio = float(rho_c.mean() / rho_exact.mean())
    print(f"n={n} K_c={k_c} csf={csf} window_t={cfg.pallas_window_t} "
          f"sub_len={cfg.capped_sub_len}")
    print(f"density rel-L2 vs exact: {l2:.4f}   mean ratio: {ratio:.4f}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    csf = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    main(n, k_c, csf)
