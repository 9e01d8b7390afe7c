"""Loader for golden-state dumps produced by tools/golden_gen (the compiled
unmodified reference engine).  See tools/golden_main.cpp for the format."""

from __future__ import annotations

import os
import struct
from typing import NamedTuple

import numpy as np


class GoldenState(NamedTuple):
    n: int
    mass: np.ndarray          # [N] f32
    density: np.ndarray       # [N] f32
    position: np.ndarray      # [N,3] f32
    velocity: np.ndarray      # [N,3] f32
    acceleration: np.ndarray  # [N,3] f32
    neighbor_count: np.ndarray  # [N] i32
    neighbor_ids: np.ndarray    # [N,32] u32 (stale beyond count)
    neighbor_dists: np.ndarray  # [N,32] f32


def load_golden(path: str, cap: int = 32) -> GoldenState:
    with open(path, "rb") as f:
        n = struct.unpack("<i", f.read(4))[0]

        def rd(cnt, dt):
            return np.frombuffer(f.read(cnt * np.dtype(dt).itemsize), dt).copy()

        mass = rd(n, np.float32)
        dens = rd(n, np.float32)
        pos = rd(3 * n, np.float32).reshape(n, 3)
        vel = rd(3 * n, np.float32).reshape(n, 3)
        acc = rd(3 * n, np.float32).reshape(n, 3)
        nc = rd(n, np.int32)
        nid = rd(n * cap, np.uint32).reshape(n, cap)
        nd = rd(n * cap, np.float32).reshape(n, cap)
    return GoldenState(n, mass, dens, pos, vel, acc, nc, nid, nd)


def golden_dir() -> str | None:
    """Locate generated golden dumps (tools/golden_m4 by default)."""
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "tools", "golden_m4")
    return cand if os.path.isdir(cand) else None


def to_state(g: GoldenState):
    """GoldenState -> ParticleState."""
    import jax.numpy as jnp

    from ..state import ParticleState

    return ParticleState(
        position=jnp.asarray(g.position),
        velocity=jnp.asarray(g.velocity),
        mass=jnp.asarray(g.mass),
        density=jnp.asarray(g.density),
        acceleration=jnp.asarray(g.acceleration),
        neighbor_count=jnp.asarray(g.neighbor_count),
    )
