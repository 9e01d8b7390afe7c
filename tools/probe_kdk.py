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


# ---------------------------------------------------------------------------
# Pallas fused kdk on a flat [9+1, N] component layout
# ---------------------------------------------------------------------------

def _kdk_kernel(cfg, x_ref, m_ref, o_ref, t_ref):
    """x_ref [9, ROWS, 128]: px py pz vx vy vz ax ay az; m_ref [ROWS,128].

    o_ref [6, ROWS, 128]: new p, new v.  t_ref [8, 128]: per-block tally
    partial (KE, PE, Lx, Ly, Lz, 0, 0, 0) summed over sublanes.
    """
    dt = _f32(cfg.dt)
    pos_dt = dt * _f32(1.0 / cfg.sim_scale)
    box = [float(b) for b in cfg.box_max]
    cx, cy, cz = [float(c) for c in cfg.central_pos]
    gm_py = float(cfg.grav_constant) * float(cfg.central_mass)
    gm = _f32(gm_py)
    soft = _f32(cfg.softening_eff)
    damp = _f32(cfg.damping)
    s = _f32(cfg.sim_scale)
    m = m_ref[...]

    def axis(i):
        p0 = x_ref[i]
        v = x_ref[3 + i] + x_ref[6 + i] * (dt * 0.5)
        return p0, v

    p0s, vhs = zip(*(axis(i) for i in range(3)))
    nps = [p0s[i] + vhs[i] * pos_dt for i in range(3)]

    if cfg.second_kick == "gravity" and gm_py != 0.0:
        # a = -G M rel / (|rel| + eps)^3, rel scaled (ops/physics.py:51-62)
        dx, dy, dz = nps[0] - cx, nps[1] - cy, nps[2] - cz
        r2 = (dx * dx + dy * dy + dz * dz) * (s * s)
        dist = jnp.sqrt(r2)
        den = dist + soft
        k = -gm / (den * den * den) * s
        nvs = [vhs[i] + k * (dx, dy, dz)[i] * dt for i in range(3)]
    else:
        nvs = list(vhs)

    if cfg.boundary == "reflect":
        out_p, out_v = [], []
        for i in range(3):
            npi, nvi, p0i = nps[i], nvs[i], p0s[i]
            below = npi < 0.0
            above = npi > box[i]
            crossed = below | above
            disp = npi - p0i
            safe = jnp.where(disp == 0.0, 1e-30, disp)
            f_hit = jnp.where(below, -p0i / safe,
                              jnp.where(above, (box[i] - p0i) / safe, 0.0))
            refl_v = jnp.where(crossed, -nvi, nvi)
            inter = p0i + disp * f_hit
            remain = jnp.maximum(1.0 - f_hit, 0.0)
            bounced = inter - disp * (remain * damp)
            pi = jnp.where(crossed, bounced, npi)
            out_p.append(jnp.clip(pi, 0.0, box[i]))
            out_v.append(refl_v)
        nps, nvs = out_p, out_v

    for i in range(3):
        o_ref[i] = nps[i]
        o_ref[3 + i] = nvs[i]

    # tally (default mode): KE, PE, L about the center
    rx, ry, rz = [(nps[i] - (cx, cy, cz)[i]) * s for i in range(3)]
    v2 = nvs[0] * nvs[0] + nvs[1] * nvs[1] + nvs[2] * nvs[2]
    ke = jnp.where(jnp.isfinite(v2), 0.5 * m * v2, 0.0)
    if gm_py != 0.0:
        dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        pe = gm * m / (dist + soft)
    else:
        # gm == 0 scenes: the PE column is identically zero; skipping the
        # sqrt/divide pass statically is exact (0.0 * x cannot fold in fp)
        pe = jnp.zeros_like(ke)
    lx = m * (ry * nvs[2] - rz * nvs[1])
    ly = m * (rz * nvs[0] - rx * nvs[2])
    lz = m * (rx * nvs[1] - ry * nvs[0])
    zero = jnp.zeros_like(ke)
    cols = [ke, pe, lx, ly, lz, zero, zero, zero]
    for c in range(8):
        t_ref[c] = jnp.sum(cols[c], axis=0)


def fused_kdk(cfg, n_pad, interpret=False):
    nblk = n_pad // (ROWS * 128)
    f = pl.pallas_call(
        partial(_kdk_kernel, cfg),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((9, ROWS, 128), lambda i: (0, i, 0)),
                  pl.BlockSpec((ROWS, 128), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((6, ROWS, 128), lambda i: (0, i, 0)),
                   pl.BlockSpec((8, 128), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((6, n_pad // 128, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8 * nblk, 128), jnp.float32)],
        interpret=interpret,
    )

    def run(x, m):
        out, part = f(x, m)
        t = jnp.sum(part.reshape(nblk, 8, 128), axis=(0, 2))
        return out, t[0], -t[1], t[2:5]
    return run


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

    # fused pallas variant on the flat component layout
    n_pad = -(-n // (ROWS * 128)) * (ROWS * 128)

    def to_flat(st, a):
        def col(v, i):
            c = jnp.zeros((n_pad,), jnp.float32)
            return c.at[:n].set(v[:, i]).reshape(n_pad // 128, 128)
        x = jnp.stack([col(st.position, 0), col(st.position, 1),
                       col(st.position, 2), col(st.velocity, 0),
                       col(st.velocity, 1), col(st.velocity, 2),
                       col(a, 0), col(a, 1), col(a, 2)])
        m = jnp.zeros((n_pad,), jnp.float32).at[:n].set(st.mass) \
            .reshape(n_pad // 128, 128)
        return x, m

    x, m = jax.jit(to_flat)(state, acc)
    run = fused_kdk(cfg, n_pad,
                    interpret=jax.devices()[0].platform == "cpu")
    out = bench("pallas fused kdk (flat layout)", run, x, m)
    bench("  flat pack cost (for reference)", to_flat, state, acc)

    # correctness vs production
    (st2, tally) = jax.jit(partial(kdk_integrate, cfg))(state, acc)
    o, ke, pe, l_vec = out
    o = np.asarray(o)[:, : -(-n // 128)].reshape(6, -1)[:, :n]
    p_err = np.abs(o[0:3].T - np.asarray(st2.position)).max()
    v_err = np.abs(o[3:6].T - np.asarray(st2.velocity)).max()
    print(f"pos max err {p_err:.3e}  vel max err {v_err:.3e}  "
          f"KE {float(ke):.6g} vs {float(tally.kinetic):.6g}  "
          f"PE {float(pe):.6g} vs {float(tally.potential):.6g}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
