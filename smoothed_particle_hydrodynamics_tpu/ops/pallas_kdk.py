"""Fused KDK integrate + boundary reflect + energy tally as ONE Pallas pass.

The XLA formulation (ops/integrate.py) is pure elementwise work plus one
stacked reduction over ~100 MB of state — HBM roofline well under 1 ms at
1M — yet measures ~8.5 ms in-situ on v5e (docs/PERFORMANCE.md r3 finding
13): the [N,3] layouts, the reflect pass's select chains, and the reduce
epilogue each break XLA's fusion.  This kernel runs the whole update over a
lane-perfect flat component layout ([9, rows, 128] in, [6, rows, 128] out,
per-block tally partials), so every element is touched exactly once.

Semantics match ops/integrate.py for the supported configs (second_kick in
("gravity", "none"), default non-compat tallies — the lazy driver's
envelope; reference behavior: /root/reference/src/sph.cpp:937-1022).
Positions and the kick/drift/reflect chain are bit-exact vs the oracle;
the gravity second kick and the tally sums can differ at f32 rounding
level (FMA contraction / reduction order — tests/test_pallas_kdk.py pins
the tolerances).

Opt-in via ``SphConfig.fused_kdk`` (single-chip sublane path); the XLA
formulation stays the default and the oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import SphConfig
from ..state import ParticleState
from .integrate import EnergyTally

_f32 = jnp.float32
ROWS = 256                      # sublane rows per grid block (lane = 128)
BLK = ROWS * 128                # particles per grid block


def _kdk_kernel(cfg: SphConfig, x_ref, m_ref, o_ref, t_ref):
    """x_ref [9, ROWS, 128]: px py pz vx vy vz ax ay az; m_ref [ROWS, 128].

    o_ref [6, ROWS, 128]: new positions, new velocities.  t_ref [8, 128]:
    per-block tally partials (KE, PE, Lx, Ly, Lz, 0, 0, 0) summed over
    sublanes — the caller sums blocks and lanes (f32 order differs from the
    XLA oracle only in the reduction, like every other per-backend tally).
    """
    dt = _f32(cfg.dt)
    pos_dt = dt * _f32(1.0 / cfg.sim_scale)
    box = [float(b) for b in cfg.box_max]
    cx, cy, cz = [float(c) for c in cfg.central_pos]
    gm_py = float(cfg.grav_constant) * float(cfg.central_mass)
    # the oracle forms G*M as a product of two f32 constants (two roundings:
    # ops/physics.py:62, ops/integrate.py:100) — folding f32(G*M) once
    # differs by 1 ulp for the disk scene, so mirror the f32 product
    import numpy as _np
    gm = _f32(float(_np.float32(cfg.grav_constant)
                    * _np.float32(cfg.central_mass)))
    soft = _f32(cfg.softening_eff)
    damp = _f32(cfg.damping)
    s = _f32(cfg.sim_scale)
    m = m_ref[...]

    p0s = [x_ref[i] for i in range(3)]
    vhs = [x_ref[3 + i] + x_ref[6 + i] * (dt * 0.5) for i in range(3)]
    nps = [p0s[i] + vhs[i] * pos_dt for i in range(3)]

    if cfg.second_kick == "gravity" and gm_py != 0.0:
        # a = -G M rel / (|rel| + eps)^3 — op order mirrors
        # ops/physics.py:51-62 exactly (rel scaled first, pow-3 denominator,
        # (-GM * rel) / denom) so single-call results stay bit-identical
        rel = [(nps[i] - (cx, cy, cz)[i]) * s for i in range(3)]
        dist = jnp.sqrt(rel[0] * rel[0] + rel[1] * rel[1] + rel[2] * rel[2])
        den = dist + soft
        denom = den * den * den
        nvs = [vhs[i] + (-gm * rel[i] / denom) * dt for i in range(3)]
    else:
        nvs = list(vhs)

    if cfg.boundary == "reflect":
        # rebuilt dead reference path, same math as integrate.reflect_boundary
        out_p, out_v = [], []
        for i in range(3):
            npi, nvi, p0i = nps[i], nvs[i], p0s[i]
            below = npi < 0.0
            above = npi > box[i]
            crossed = below | above
            disp = npi - p0i
            inv = 1.0 / jnp.where(disp == 0.0, 1e-30, disp)
            f_hit = jnp.where(below, -p0i * inv,
                              jnp.where(above, (box[i] - p0i) * inv, 0.0))
            inter = p0i + disp * f_hit
            remain = jnp.maximum(1.0 - f_hit, 0.0)
            bounced = inter - disp * (remain * damp)
            pi = jnp.where(crossed, bounced, npi)
            out_p.append(jnp.clip(pi, 0.0, box[i]))
            out_v.append(jnp.where(crossed, -nvi, nvi))
        nps, nvs = out_p, out_v

    for i in range(3):
        o_ref[i] = nps[i]
        o_ref[3 + i] = nvs[i]

    # energy tally at the post-kick state (integrate.energy_tally semantics)
    rx, ry, rz = [(nps[i] - (cx, cy, cz)[i]) * s for i in range(3)]
    v2 = nvs[0] * nvs[0] + nvs[1] * nvs[1] + nvs[2] * nvs[2]
    ke = jnp.where(jnp.isfinite(v2), 0.5 * m * v2, 0.0)
    if gm_py != 0.0:
        dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        pe = gm * m / (dist + soft)
    else:
        # keep the 0*x NaN canary (non-finite positions must surface as
        # non-finite PE for detect_blowup) without the sqrt/divide pass
        pe = (rx + ry + rz) * _f32(0.0)
    lx = m * (ry * nvs[2] - rz * nvs[1])
    ly = m * (rz * nvs[0] - rx * nvs[2])
    lz = m * (rx * nvs[1] - ry * nvs[0])
    zero = jnp.zeros_like(ke)
    for c, col in enumerate((ke, pe, lx, ly, lz, zero, zero, zero)):
        t_ref[c] = jnp.sum(col, axis=0)


def _supported(cfg: SphConfig) -> None:
    if cfg.compat:
        raise ValueError("fused_kdk supports default mode only")
    if cfg.second_kick not in ("gravity", "none"):
        raise ValueError("fused_kdk requires second_kick in ('gravity','none')")


def kdk_integrate_fused(cfg: SphConfig, state: ParticleState,
                        acceleration: jnp.ndarray
                        ) -> tuple[ParticleState, EnergyTally]:
    """Drop-in replacement for ops.integrate.kdk_integrate (supported cfgs).

    Bit-exact per-particle updates; tally sums differ from the XLA oracle
    only by f32 reduction order.
    """
    _supported(cfg)
    n = state.position.shape[0]
    n_pad = -(-n // BLK) * BLK
    nblk = n_pad // BLK
    rows_all = n_pad // 128

    def col(v):
        c = jnp.zeros((n_pad,), jnp.float32)
        return c.at[:n].set(v).reshape(rows_all, 128)

    x = jnp.stack([col(state.position[:, 0]), col(state.position[:, 1]),
                   col(state.position[:, 2]), col(state.velocity[:, 0]),
                   col(state.velocity[:, 1]), col(state.velocity[:, 2]),
                   col(acceleration[:, 0]), col(acceleration[:, 1]),
                   col(acceleration[:, 2])])
    m = col(state.mass)

    out, part = pl.pallas_call(
        partial(_kdk_kernel, cfg),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((9, ROWS, 128), lambda i: (0, i, 0)),
                  pl.BlockSpec((ROWS, 128), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((6, ROWS, 128), lambda i: (0, i, 0)),
                   pl.BlockSpec((8, 128), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((6, rows_all, 128), jnp.float32),
                   jax.ShapeDtypeStruct((8 * nblk, 128), jnp.float32)],
        interpret=cfg.pallas_interpret,
    )(x, m)

    flat = out.reshape(6, n_pad)[:, :n]
    new_pos = flat[0:3].T
    new_vel = flat[3:6].T
    t = jnp.sum(part.reshape(nblk, 8, 128), axis=(0, 2))
    l_vec = t[2:5]
    tally = EnergyTally(t[0], -t[1], jnp.linalg.norm(l_vec), l_vec)
    new_state = state._replace(position=new_pos, velocity=new_vel,
                               acceleration=acceleration)
    return new_state, tally
