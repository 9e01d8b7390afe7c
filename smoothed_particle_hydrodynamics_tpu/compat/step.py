"""Quirk-faithful density / force / step using the compat neighbor tables.

Mirrors /root/reference/src/sph.cpp:721-766 (density), :778-934 (forces with
quirks 1-2), :937-1022 (KDK with gravity-only second kick and the compat
energy tallies), consuming the stored neighbor ids + distances in the exact
iteration order the reference produced them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SphConfig
from ..state import ParticleState, StepDiagnostics, make_step_diagnostics
from ..ops import physics
from ..ops.celllist import CellListAux
from ..ops.integrate import kdk_integrate
from .neighbors import CompatNeighbors, find_neighbors_compat

_f32 = jnp.float32


def compat_density(cfg: SphConfig, state: ParticleState,
                   nb: CompatNeighbors) -> jnp.ndarray:
    """rho_i over the stored table, reusing stored scaled distances
    (src/sph.cpp:721-766; no self term, redundant d > h recheck kept)."""
    n = state.position.shape[0]
    slots = jnp.arange(nb.ids.shape[1])
    valid = slots[None, :] < nb.count[:, None]
    ids = jnp.clip(nb.ids, 0, n - 1)
    m_j = state.mass[ids]
    d = nb.dists
    h = _f32(cfg.h_scaled)
    t = _f32(cfg.h_scaled2) - d * d
    w = _f32(cfg.poly6_norm) * t * t * t
    w = jnp.where(valid & (d <= h), w, 0.0)                 # ref: d > h -> w = 0
    return jnp.sum(m_j * w, axis=1)


def compat_acceleration(cfg: SphConfig, state: ParticleState, rho: jnp.ndarray,
                        nb: CompatNeighbors) -> jnp.ndarray:
    """Force loop with quirks 1-2, in stored neighbor order."""
    n = state.position.shape[0]
    slots = jnp.arange(nb.ids.shape[1])
    valid = slots[None, :] < nb.count[:, None]
    ids = jnp.clip(nb.ids, 0, n - 1)

    acc = physics.sph_acceleration(
        cfg.replace(compat=True),
        pos_i=state.position,
        vel_i=state.velocity,
        rho_i=rho,
        pos_j=state.position[ids],
        vel_j=state.velocity[ids],
        rho_j=rho[ids],
        m_j=state.mass[ids],
        d=nb.dists,
        mask=valid,
    )
    acc = acc + physics.central_gravity(cfg, state.position)
    return physics.cfl_clamp(cfg, acc)


def compute_compat_quantities(cfg: SphConfig, state: ParticleState
                              ) -> tuple[jnp.ndarray, jnp.ndarray, CellListAux]:
    """(acceleration, density, aux) with reference-exact neighbor sets."""
    nb = find_neighbors_compat(cfg, state.position)
    rho = compat_density(cfg, state, nb)
    acc = compat_acceleration(cfg, state, rho, nb)
    aux = CellListAux(
        neighbor_count=nb.count,
        overflow_cells=nb.overflow_cells,
        truncated_ranges=jnp.zeros((), jnp.int32),
    )
    return acc, rho, aux


def compat_step(cfg: SphConfig, state: ParticleState
                ) -> tuple[ParticleState, StepDiagnostics]:
    """One reference-exact step (compat voxelize/find/density/accel + KDK)."""
    cfg_compat = cfg.replace(compat=True)
    acc, rho, aux = compute_compat_quantities(cfg, state)
    state = state._replace(density=rho, neighbor_count=aux.neighbor_count)
    new_state, tally = kdk_integrate(cfg_compat, state, acc)
    diag = make_step_diagnostics(tally, aux.neighbor_count, aux.overflow_cells)
    return new_state, diag
