"""Halo-exchange sharded step vs single-device step (8 virtual CPU devices)."""

import jax
import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.config import SphConfig
from smoothed_particle_hydrodynamics_tpu.init import init_rotating_sphere
from smoothed_particle_hydrodynamics_tpu.ops.step import step
from smoothed_particle_hydrodynamics_tpu.parallel import make_mesh, shard_state
from smoothed_particle_hydrodynamics_tpu.parallel.sharding import step_sharded_halo


def make_case(n=2048, seed=0):
    cfg = SphConfig(num_particles=n, cell_capacity=64, range_slice=96)
    state = init_rotating_sphere(jax.random.PRNGKey(seed), cfg)
    return cfg, state


def test_halo_step_matches_single_device():
    cfg, state = make_case()
    mesh = make_mesh(8)
    s1, d1 = jax.jit(lambda s: step(cfg, s))(state)
    # generous halo: the disk concentrates in few z-slabs
    halo = cfg.num_particles // 8
    s8, d8 = jax.jit(lambda s: step_sharded_halo(cfg, mesh, s, halo_rows=halo))(
        shard_state(mesh, state))
    assert int(d8.halo_dropped) == 0, "halo too small for this scene"
    np.testing.assert_allclose(np.asarray(s8.position), np.asarray(s1.position),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s8.density), np.asarray(s1.density),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s8.neighbor_count),
                                  np.asarray(s1.neighbor_count))


def test_halo_overflow_detected():
    """A too-small halo must be *counted*, never silent."""
    cfg, state = make_case(seed=2)
    mesh = make_mesh(8)
    s8, d8 = jax.jit(lambda s: step_sharded_halo(cfg, mesh, s, halo_rows=8))(
        shard_state(mesh, state))
    assert int(d8.halo_dropped) > 0


def test_halo_rows_validation():
    cfg, state = make_case()
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="halo_rows"):
        step_sharded_halo(cfg, mesh, state, halo_rows=10_000)
