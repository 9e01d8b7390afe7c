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
    """1-vs-8 equality with the halo DERIVED from cell-plane occupancy (the
    production sizing policy), not a degenerate halo_rows == rows."""
    from smoothed_particle_hydrodynamics_tpu.parallel import derive_halo_rows

    from smoothed_particle_hydrodynamics_tpu.models import make_scene

    # a packed lattice spread over z: the derived halo must be a proper
    # subset of the slab, not the degenerate halo_rows == rows
    cfg, state = make_scene("dam_break", num_particles=4096,
                            grid_nx=32, grid_ny=32, grid_nz=64,
                            cell_capacity=16, range_slice=48)
    mesh = make_mesh(8)
    s1, d1 = jax.jit(lambda s: step(cfg, s))(state)
    halo = derive_halo_rows(cfg, state, 8)
    assert halo < cfg.num_particles // 8, "derived halo should be < rows"
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


def test_make_sharded_step_defaults_to_halo():
    """The production factory must run the halo variant with a derived halo
    and match the gathered oracle exactly."""
    from smoothed_particle_hydrodynamics_tpu.parallel import make_sharded_step

    cfg, state = make_case(seed=3)
    mesh = make_mesh(8)
    halo_step = make_sharded_step(cfg, mesh, donate=False)
    oracle = make_sharded_step(cfg, mesh, donate=False, variant="gather")
    s_h, d_h = halo_step(shard_state(mesh, state))
    s_g, d_g = oracle(shard_state(mesh, state))
    assert int(d_h.halo_dropped) == 0
    np.testing.assert_array_equal(np.asarray(s_h.neighbor_count),
                                  np.asarray(s_g.neighbor_count))
    np.testing.assert_allclose(np.asarray(s_h.position), np.asarray(s_g.position),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_h.density), np.asarray(s_g.density),
                               rtol=1e-6, atol=1e-6)
