"""Probe: per-kernel launch overhead on this device, and where kdk's fixed
~25-30 ms at 1M actually goes (tally? reflect? second kick? fusion count?).

Times single-kernel jitted programs vs multi-kernel chains at fixed bytes,
then kdk_integrate with pieces disabled.  If a trivial one-kernel program
costs ~1-3 ms, the per-step floor is launch/dispatch-bound and the fix is
fewer kernels (fused pallas integrate), not less arithmetic.

Usage: python tools/probe_dispatch.py [N]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops.integrate import (
    kdk_integrate, energy_tally, reflect_boundary)
from smoothed_particle_hydrodynamics_tpu.ops.physics import central_gravity


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
    print(f"{name:40s} {dt:9.3f} ms")
    return dt


def main(n=1_000_000):
    cfg, state = make_scene("splash", num_particles=n)
    x = state.position
    acc = jnp.zeros_like(x)
    print(f"n={n} device={jax.devices()[0]}")

    bench("x + 1  (one fused kernel)", lambda x: x + 1.0, x)
    bench("sum(x)  (one reduce)", lambda x: jnp.sum(x), x)

    def chain10(x):
        for i in range(10):
            x = x * 1.0000001 + 1e-9
        return x

    bench("10-op elementwise chain (fuses)", chain10, x)

    def barriers8(x):
        # 8 dependent reduce+broadcast pairs: XLA cannot fuse across the
        # reduces, so this is >= 8 separate kernels at the same bytes
        for i in range(8):
            x = x + jnp.sum(x) * 1e-20
        return x

    bench("8 reduce barriers (>=8 kernels)", barriers8, x)

    bench("kdk full", partial(kdk_integrate, cfg), state, acc)
    cfg_nr = cfg.replace(boundary="none")
    bench("kdk boundary=none", partial(kdk_integrate, cfg_nr), state, acc)
    cfg_nk = cfg.replace(second_kick="none")
    bench("kdk second_kick=none", partial(kdk_integrate, cfg_nk), state, acc)

    def kdk_no_tally(st, acc):
        dt = jnp.float32(cfg.dt)
        pos_dt = dt * jnp.float32(1.0 / cfg.sim_scale)
        v_half = st.velocity + acc * (dt * 0.5)
        new_pos = st.position + v_half * pos_dt
        a2 = central_gravity(cfg, new_pos)
        new_vel = v_half + a2 * dt
        new_pos, new_vel = reflect_boundary(cfg, st.position, new_pos, new_vel)
        return new_pos, new_vel

    bench("kdk without tally", kdk_no_tally, state, acc)
    bench("energy_tally alone", partial(energy_tally, cfg),
          x, state.velocity, state.mass)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
