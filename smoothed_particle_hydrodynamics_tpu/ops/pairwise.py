"""All-pairs O(N^2) backend — the correctness oracle.

The reference's own README notes the voxel grid is *only* an optimisation:
"The result will still be correct because the smoothing kernel W will give 0
... for all particles that are outside the interaction radius"
(/root/reference/README.md, Optimizations).  This backend realises exactly
that: every pair is tested, masked by d < h.  It is used to validate the
cell-list and Pallas backends at small N, and is itself jittable.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import SphConfig
from ..state import ParticleState
from . import physics

_f32 = jnp.float32


def pair_distances(cfg: SphConfig, pos: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[N,N] scaled distances and the valid-pair mask (d < h, j != i)."""
    diff = pos[:, None, :] - pos[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d = jnp.sqrt(d2) * _f32(cfg.sim_scale)
    n = pos.shape[0]
    not_self = ~jnp.eye(n, dtype=bool)
    mask = (d2 < _f32(cfg.h2)) & not_self
    return d, mask


def compute_density(cfg: SphConfig, state: ParticleState) -> jnp.ndarray:
    d, mask = pair_distances(cfg, state.position)
    m_j = jnp.broadcast_to(state.mass[None, :], d.shape)
    return physics.density_sum(cfg, m_j, d, mask, m_self=state.mass)


def compute_acceleration(cfg: SphConfig, state: ParticleState,
                         rho: jnp.ndarray) -> jnp.ndarray:
    """Full acceleration: hydro + central gravity + CFL clamp."""
    d, mask = pair_distances(cfg, state.position)
    n = state.position.shape[0]
    acc = physics.sph_acceleration(
        cfg,
        pos_i=state.position,
        vel_i=state.velocity,
        rho_i=rho,
        pos_j=jnp.broadcast_to(state.position[None, :, :], (n, n, 3)),
        vel_j=jnp.broadcast_to(state.velocity[None, :, :], (n, n, 3)),
        rho_j=jnp.broadcast_to(rho[None, :], (n, n)),
        m_j=jnp.broadcast_to(state.mass[None, :], (n, n)),
        d=d,
        mask=mask,
    )
    acc = acc + physics.central_gravity(cfg, state.position)
    acc = acc + jnp.asarray(cfg.gravity, jnp.float32)
    return physics.cfl_clamp(cfg, acc)


def neighbor_counts(cfg: SphConfig, state: ParticleState) -> jnp.ndarray:
    _, mask = pair_distances(cfg, state.position)
    return jnp.sum(mask, axis=-1).astype(jnp.int32)
