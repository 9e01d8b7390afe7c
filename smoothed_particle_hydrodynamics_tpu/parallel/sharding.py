"""Sharded SPH step over a device mesh.

Decomposition: particles are globally sorted by linear cell id every step
(``ops.grid``).  Because the id is z-major — ``(z*ny + y)*nx + x`` — equal
contiguous blocks of the *sorted* order are contiguous z-slabs of space, so
giving device ``d`` sorted rows ``[d*N/D, (d+1)*N/D)`` is a genuine spatial
domain decomposition with load balance by construction (equal particles per
device, not equal volume).

Communication pattern per step, all compiled XLA collectives over ICI:

* binning/sort is computed from replicated positions (cheap relative to the
  pair sweeps; a distributed sort is a later optimisation);
* the density sweep runs on local rows; its output is all-gathered (GSPMD
  inserts the collective at the ``shard_map`` boundary) because the force
  sweep needs neighbor densities, which can live on the adjacent slab —
  the moral equivalent of a halo exchange, currently widened to a gather;
* energy/neighbor diagnostics are global reductions (``psum`` semantics via
  replicated sums).

The same ``step`` semantics hold on 1 chip and N chips — tested by the
1-vs-8-device equality test on a virtual CPU mesh.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SphConfig
from ..state import ParticleState, StepDiagnostics
from ..ops import celllist
from ..ops.grid import unsort
from ..ops.integrate import kdk_integrate


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
                " (for local testing set JAX_PLATFORMS=cpu and"
                " XLA_FLAGS=--xla_force_host_platform_device_count=N)")
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))


def shard_state(mesh: Mesh, state: ParticleState) -> ParticleState:
    """Place particle arrays sharded over their leading axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), state)


def step_sharded(cfg: SphConfig, mesh: Mesh, state: ParticleState,
                 chunk: int = 1024) -> tuple[ParticleState, StepDiagnostics]:
    """One physics step, sharded over ``mesh``'s 'data' axis.  Call under jit."""
    n = state.position.shape[0]
    ndev = math.prod(mesh.devices.shape)
    if n % ndev:
        raise ValueError(f"num_particles={n} must be divisible by {ndev} devices")
    rows = n // ndev
    local_chunk = min(chunk, rows)

    p = celllist.prepare(cfg, state)
    own_idx = jnp.arange(n, dtype=jnp.int32)

    density_local = jax.shard_map(
        partial(celllist.density_rows, cfg, chunk=local_chunk),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
    )
    rho_s, ncount_s, truncated = density_local(
        p.pos_s, p.mass_s, p.rng_start, p.rng_end, own_idx, p.pos_s, p.mass_s)

    force_local = jax.shard_map(
        partial(celllist.force_rows, cfg, chunk=local_chunk),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(),
                  P("data"), P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
    )
    acc_s = force_local(
        p.pos_s, p.vel_s, p.mass_s, rho_s,
        p.rng_start, p.rng_end, own_idx, p.pos_s, p.vel_s, rho_s)

    g = p.grid
    acc = unsort(g.order, acc_s)
    rho = unsort(g.order, rho_s)
    ncount = unsort(g.order, ncount_s)

    state = state._replace(density=rho, neighbor_count=ncount)
    new_state, tally = kdk_integrate(cfg, state, acc)
    # Keep the output sharded over particles for the next step.
    sharded = NamedSharding(mesh, P("data"))
    new_state = jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, sharded), new_state)

    diag = StepDiagnostics(
        kinetic_energy=tally.kinetic,
        potential_energy=tally.potential,
        angular_momentum=tally.angular_momentum,
        neighbor_mean=jnp.mean(ncount.astype(jnp.float32)),
        neighbor_max=jnp.max(ncount),
        neighbor_min=jnp.min(ncount),
        overflow_cells=g.overflow_cells,
    )
    return new_state, diag


def run_steps_sharded(cfg: SphConfig, mesh: Mesh, state: ParticleState,
                      num_steps: int, chunk: int = 1024
                      ) -> tuple[ParticleState, StepDiagnostics]:
    """lax.scan over the sharded step (whole-run loop on a mesh)."""

    def body(carry, _):
        return step_sharded(cfg, mesh, carry, chunk=chunk)

    return jax.lax.scan(body, state, None, length=num_steps)


def make_sharded_step(cfg: SphConfig, mesh: Mesh, donate: bool = True
                      ) -> Callable[[ParticleState], tuple[ParticleState, StepDiagnostics]]:
    f = partial(step_sharded, cfg, mesh)
    return jax.jit(f, donate_argnums=(0,) if donate else ())
