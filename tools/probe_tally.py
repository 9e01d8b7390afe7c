"""Probe: why energy_tally costs ~15 ms in-situ inside kdk at 1M.

Tries alternative formulations of the KE/PE/L reductions fused with the kdk
update (stacked single reduce, two-stage blocked reduce, dot-product reduce)
and times each full kdk+tally program.  The winner replaces energy_tally's
reduction shape in ops/integrate.py.

Usage: python tools/probe_tally.py [N]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops.integrate import (
    kdk_integrate, reflect_boundary)
from smoothed_particle_hydrodynamics_tpu.ops.physics import central_gravity

_f32 = jnp.float32


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
    print(f"{name:44s} {dt:9.3f} ms")
    return dt


def main(n=1_000_000):
    cfg, state = make_scene("splash", num_particles=n)
    acc = jnp.zeros_like(state.position)
    print(f"n={n} device={jax.devices()[0]}")

    def kdk_core(st, acc):
        dt = _f32(cfg.dt)
        pos_dt = dt * _f32(1.0 / cfg.sim_scale)
        v_half = st.velocity + acc * (dt * 0.5)
        new_pos = st.position + v_half * pos_dt
        a2 = central_gravity(cfg, new_pos)
        new_vel = v_half + a2 * dt
        return reflect_boundary(cfg, st.position, new_pos, new_vel)

    center = jnp.asarray(cfg.central_pos, jnp.float32)
    gm = _f32(cfg.grav_constant) * _f32(cfg.central_mass)
    soft = _f32(cfg.softening_eff)
    scale = _f32(cfg.sim_scale)

    def tally_terms(pos, vel, mass):
        rel = (pos - center) * scale
        dist = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
        v2 = jnp.sum(vel * vel, axis=-1)
        ke_i = jnp.where(jnp.isfinite(v2), 0.5 * mass * v2, 0.0)
        pe_i = gm * mass / (dist + soft)
        l_i = mass[:, None] * jnp.cross(rel, vel)
        return ke_i, pe_i, l_i

    def v_current(st, acc):
        pos, vel = kdk_core(st, acc)
        ke_i, pe_i, l_i = tally_terms(pos, vel, st.mass)
        return (pos, vel, jnp.sum(ke_i), -jnp.sum(pe_i),
                jnp.linalg.norm(jnp.sum(l_i, axis=0)))

    def v_stacked(st, acc):
        pos, vel = kdk_core(st, acc)
        ke_i, pe_i, l_i = tally_terms(pos, vel, st.mass)
        cols = jnp.concatenate(
            [ke_i[:, None], pe_i[:, None], l_i], axis=1)     # [N,5]
        s = jnp.sum(cols, axis=0)
        return pos, vel, s[0], -s[1], jnp.linalg.norm(s[2:5])

    def v_twostage(st, acc):
        pos, vel = kdk_core(st, acc)
        ke_i, pe_i, l_i = tally_terms(pos, vel, st.mass)
        cols = jnp.concatenate([ke_i[:, None], pe_i[:, None], l_i], axis=1)
        m = cols.shape[0]
        b = 4096
        pad = (-m) % b
        cols = jnp.pad(cols, ((0, pad), (0, 0)))
        s = jnp.sum(cols.reshape(-1, b, 5), axis=1).sum(axis=0)
        return pos, vel, s[0], -s[1], jnp.linalg.norm(s[2:5])

    def v_dot(st, acc):
        pos, vel = kdk_core(st, acc)
        ke_i, pe_i, l_i = tally_terms(pos, vel, st.mass)
        cols = jnp.concatenate([ke_i[:, None], pe_i[:, None], l_i], axis=1)
        ones = jnp.ones((cols.shape[0],), jnp.float32)
        s = ones @ cols                                      # [5] via MXU
        return pos, vel, s[0], -s[1], jnp.linalg.norm(s[2:5])

    def v_flat(st, acc):
        # all three reduces over FLAT [N] arrays (no [N,3] axis games):
        pos, vel = kdk_core(st, acc)
        ke_i, pe_i, l_i = tally_terms(pos, vel, st.mass)
        ke = jnp.sum(ke_i)
        pe = jnp.sum(pe_i)
        lx = jnp.sum(l_i[:, 0]); ly = jnp.sum(l_i[:, 1]); lz = jnp.sum(l_i[:, 2])
        return pos, vel, ke, -pe, jnp.sqrt(lx*lx + ly*ly + lz*lz)

    bench("kdk + tally (current shape)", v_current, state, acc)
    bench("kdk + tally stacked [N,5] sum", v_stacked, state, acc)
    bench("kdk + tally two-stage blocked", v_twostage, state, acc)
    bench("kdk + tally ones@cols (MXU)", v_dot, state, acc)
    bench("kdk + tally flat per-column sums", v_flat, state, acc)
    bench("kdk production (reference point)",
          partial(kdk_integrate, cfg), state, acc)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
