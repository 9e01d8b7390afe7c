"""Ablation profile of the SINGLE-CHIP lazy pallas step (capped or exact).

Same method as tools/profile_slab.py: re-jit the production lazy_step with
one stage stubbed out (diagnostics reduces, kdk+tally, the pallas sweeps)
and per-step-time each variant from the same settled carry, so
"full - variant" attributes cost inside the compiled program.

Usage: python tools/profile_lazy.py [N] [K_c] [csf] [steps]  (K_c=0 -> exact)
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy
from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst


def _trace(step_fn, carry, steps, label):
    times, rebinned = [], []
    rb_prev = int(carry.rebin_count)
    for _ in range(steps):
        t0 = time.perf_counter()
        carry, _ = step_fn(carry)
        np.asarray(carry.state.position[:1, :1])
        dt = (time.perf_counter() - t0) * 1000
        rb = int(carry.rebin_count)
        times.append(dt)
        rebinned.append(rb > rb_prev)
        rb_prev = rb
    t, m = np.asarray(times), np.asarray(rebinned)
    steady = float(t[~m].mean()) if (~m).any() else float("nan")
    rebin = float(t[m].mean()) if m.any() else float("nan")
    print(f"{label:30s} steady {steady:8.3f} ms  rebin {rebin:8.3f} ms  "
          f"(rebins {int(m.sum())}/{steps})")
    return carry


def main(n=1_000_000, k_c=4, csf=1.25, steps=20, settle=10):
    ov = dict(num_particles=n, cell_size_factor=csf,
              pallas_interpret=jax.devices()[0].platform == "cpu")
    if k_c:
        ov.update(capped_candidates=k_c, pallas_window_t=0)
    cfg, state = make_scene("splash", **ov)
    if cfg.pallas_window_t == 0:
        cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
    if k_c and cfg.capped_sub_len == 0:
        cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, state))
    print(f"n={n} K_c={k_c} csf={csf} window_t={cfg.pallas_window_t} "
          f"sub_len={cfg.capped_sub_len} device={jax.devices()[0]}")

    carry, _ = lazy.drive_loop_lazy(cfg, state, settle,
                                    collect_diags=False, keep_carry=True)

    def jit_step():
        return jax.jit(partial(lazy.lazy_step, cfg), donate_argnums=(0,))

    carry = _trace(jit_step(), carry, steps, "full step")

    from smoothed_particle_hydrodynamics_tpu.ops.integrate import EnergyTally
    from smoothed_particle_hydrodynamics_tpu.state import StepDiagnostics

    real = {k: getattr(lazy, k)
            for k in ("make_step_diagnostics", "kdk_integrate",
                      "sweeps_sorted")}

    def stub_diag(tally, ncount, overflow_cells, truncated_ranges=None,
                  **kw):
        zi = jnp.zeros((), jnp.int32)
        zf = tally.kinetic * 0.0 + jnp.sum(ncount) * 0.0  # keep deps alive
        return StepDiagnostics(zf, zf, zf, zf, zi, zi, zi, zi, zi, zi)

    def stub_kdk(cfg_, st, acc):
        z = jnp.zeros((), jnp.float32)
        return st._replace(acceleration=acc), EnergyTally(
            z + jnp.sum(acc) * 1e-30, z, z, jnp.zeros((3,), jnp.float32))

    def stub_sweeps(cfg_, p):
        nrows = p.pos_s.shape[0]
        live = jnp.sum(p.pos_s[:, 0]) * jnp.float32(1e-30)
        return (jnp.zeros((nrows, 3), jnp.float32) + live,
                jnp.full((nrows,), 1.0, jnp.float32),
                jnp.zeros((nrows,), jnp.int32))

    variants = [
        ("no diag reduces", {"make_step_diagnostics": stub_diag}),
        ("no kdk+tally (frozen)", {"kdk_integrate": stub_kdk}),
        ("no sweeps", {"sweeps_sorted": stub_sweeps}),
        ("machinery only", {"make_step_diagnostics": stub_diag,
                            "kdk_integrate": stub_kdk,
                            "sweeps_sorted": stub_sweeps}),
    ]
    for label, patches in variants:
        try:
            for k, v in patches.items():
                setattr(lazy, k, v)
            cv = jax.tree.map(lambda x: x + 0, carry)
            fn = jit_step()
            cv, _ = fn(cv)
            np.asarray(cv.state.position[:1, :1])
            _trace(fn, cv, max(steps // 2, 8), label)
        finally:
            for k, v in real.items():
                setattr(lazy, k, v)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(n=int(a[0]) if len(a) > 0 else 1_000_000,
         k_c=int(a[1]) if len(a) > 1 else 4,
         csf=float(a[2]) if len(a) > 2 else 1.25,
         steps=int(a[3]) if len(a) > 3 else 20)
