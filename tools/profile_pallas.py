"""Phase-by-phase timing of the transposed pallas step (exact and capped).

Times each phase of the production lazy driver separately on the current
device: rebuild (prepare_t), the density and force sweeps, the capped mode's
per-step sub-frame gathers, integration, and the end-to-end lazy step
(steady-state, i.e. frozen bins).  Used to locate the non-sweep cost floor
of the capped mode (docs/PERFORMANCE.md round-3 finding 3).

Usage: python tools/profile_pallas.py [N] [K_c]   (K_c=0 -> exact mode)
"""

import time
from functools import partial

import jax
import jax.numpy as jnp

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy, pallas_step_t as pst
from smoothed_particle_hydrodynamics_tpu.ops.integrate import kdk_integrate


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


def main(n=1_000_000, k_c=4, steps_settle=10, csf=1.25):
    overrides = dict(num_particles=n, cell_size_factor=csf)
    if k_c:
        overrides.update(capped_candidates=k_c, pallas_window_t=0)
    else:
        overrides["pallas_window_t"] = 208
    cfg, state = make_scene("splash", **overrides)
    if cfg.pallas_window_t == 0:
        cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
    if k_c and cfg.capped_sub_len == 0:
        cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, state))
    print(f"n={n} K_c={k_c} window_t={cfg.pallas_window_t} "
          f"sub_len={cfg.capped_sub_len} device={jax.devices()[0]}")

    # settle into mid-splash so occupancies are realistic
    carry, _ = lazy.drive_loop_lazy(cfg, state, steps_settle,
                                    collect_diags=False, keep_carry=True)
    state_s = carry.state

    prep_fn = jax.jit(partial(pst.prepare_t, cfg))
    p = bench("prepare_t (rebuild)", prep_fn, state_s)

    dens_fn = jax.jit(partial(pst.density_sweep_t, cfg))
    rho_s, _ = bench("density sweep (incl. gathers)", dens_fn, p)

    force_fn = jax.jit(partial(pst.force_sweep_t, cfg))
    bench("force sweep (incl. gathers)", force_fn, p, rho_s)

    if k_c:
        def gather_d(p):
            return p.pos_s[p.sub_perm]

        def gather_f(p, rho_s):
            return jnp.concatenate(
                [p.pos_s, p.vel_s, rho_s[:, None]], axis=1)[p.sub_perm]

        bench("  sub gather density [S,3]", jax.jit(gather_d), p)
        bench("  sub gather force   [S,7]", jax.jit(gather_f), p, rho_s)

    def integ(st, acc):
        return kdk_integrate(cfg, st, acc)

    acc_s = jnp.zeros_like(state_s.position)
    bench("kdk_integrate", jax.jit(integ), state_s, acc_s)

    # steady-state lazy step (donated): the production per-step cost.
    # Use fresh carries per call so donation doesn't invalidate.
    step_fn = lazy._cached_lazy_step(cfg)
    c = jax.jit(partial(lazy.init_lazy, cfg))(state_s)
    _sync(c)
    c, _ = step_fn(c)
    _sync(c.state.position)
    t0 = time.perf_counter()
    iters = 20
    rb0 = int(c.rebin_count)
    for _ in range(iters):
        c, _ = step_fn(c)
    _sync(c.state.position)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{'lazy step end-to-end':34s} {dt:9.3f} ms   "
          f"(rebins {int(c.rebin_count) - rb0}/{iters})")


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    csf = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    main(n, k_c, csf=csf)
