"""Probe: where kdk_integrate's ~8.5 ms/step at 1M actually goes.

The integrate+tally pass is pure elementwise work plus one reduction over
~100 MB of state — HBM roofline well under 1 ms — yet costs ~8.5 ms in-situ
(docs/PERFORMANCE.md r3 finding 13).  Suspects: XLA's [N,3] layouts pad the
minor-3 axis on TPU tiles, the reflect pass's divide/select chains, and
fusion breaks around the tally reduce.

Measures, at 1M:
1. production kdk_integrate (reference point);
2. component ablations (no reflect / no second kick / no tally / bare drift);
3. the same full math as ONE Pallas kernel over a lane-perfect flat layout
   (each pos/vel/acc component a [N] column, blocks [rows,128], per-block
   tally partials reduced by XLA afterwards).

If (3) lands at <2 ms the fused-kdk rewrite is worth productionizing: the
saving applies to EVERY step of both engines, exact and capped.

Usage: python tools/probe_kdk.py [N]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops.integrate import (
    kdk_integrate, reflect_boundary, energy_tally)
from smoothed_particle_hydrodynamics_tpu.ops.pallas_kdk import (
    kdk_integrate_fused)
from smoothed_particle_hydrodynamics_tpu.ops.physics import central_gravity

_f32 = jnp.float32
ROWS = 256                     # sublane rows per pallas block


def _sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.ravel(leaf)[:1])


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:9.3f} ms")
    return out


def main(n=1_000_000):
    cfg, state = make_scene("splash", num_particles=n)
    print(f"n={n} second_kick={cfg.second_kick} boundary={cfg.boundary} "
          f"device={jax.devices()[0]}")
    acc = jnp.zeros_like(state.position) + 0.01

    bench("production kdk_integrate", partial(kdk_integrate, cfg),
          state, acc)

    def kick_drift(st, a):
        dt = _f32(cfg.dt)
        v_half = st.velocity + a * (dt * 0.5)
        new_pos = st.position + v_half * (dt / _f32(cfg.sim_scale))
        if cfg.second_kick == "gravity":
            new_vel = v_half + central_gravity(cfg, new_pos) * dt
        else:
            new_vel = v_half
        return new_pos, new_vel

    def no_tally(st, a):
        new_pos, new_vel = kick_drift(st, a)
        return reflect_boundary(cfg, st.position, new_pos, new_vel)

    def no_reflect(st, a):
        new_pos, new_vel = kick_drift(st, a)
        return new_pos, new_vel, energy_tally(cfg, new_pos, new_vel, st.mass)

    bare = kick_drift

    bench("  - tally removed", no_tally, state, acc)
    bench("  - reflect removed", no_reflect, state, acc)
    bench("  - bare kick+drift", bare, state, acc)

    # production fused pallas kdk (ops/pallas_kdk.py) — includes its own
    # pack/unpack, i.e. exactly what cfg.fused_kdk pays per step
    if jax.devices()[0].platform == "cpu":
        cfg = cfg.replace(pallas_interpret=True)
    out = bench("pallas fused kdk (production)",
                partial(kdk_integrate_fused, cfg), state, acc)

    st2, tally = jax.jit(partial(kdk_integrate, cfg))(state, acc)
    st_f, t_f = out
    p_err = np.abs(np.asarray(st_f.position) - np.asarray(st2.position)).max()
    v_err = np.abs(np.asarray(st_f.velocity) - np.asarray(st2.velocity)).max()
    print(f"pos max err {p_err:.3e}  vel max err {v_err:.3e}  "
          f"KE {float(t_f.kinetic):.6g} vs {float(tally.kinetic):.6g}  "
          f"PE {float(t_f.potential):.6g} vs {float(tally.potential):.6g}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
