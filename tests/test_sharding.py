"""Multi-device tests on the 8-way virtual CPU mesh (conftest sets XLA_FLAGS).

The sharded step must produce the same physics as the single-device step —
same densities, positions, velocities, and diagnostics — on 1 vs 8 devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.config import SphConfig
from smoothed_particle_hydrodynamics_tpu.init import init_rotating_sphere
from smoothed_particle_hydrodynamics_tpu.ops.step import step
from smoothed_particle_hydrodynamics_tpu.parallel import (
    make_mesh, make_sharded_step, shard_state)
from smoothed_particle_hydrodynamics_tpu.parallel.sharding import step_sharded


def setup_module(module):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"


def make_case(n=2048, seed=0):
    cfg = SphConfig(num_particles=n, cell_capacity=64, range_slice=96)
    state = init_rotating_sphere(jax.random.PRNGKey(seed), cfg)
    return cfg, state


def test_sharded_step_matches_single_device():
    cfg, state = make_case()
    mesh = make_mesh(8)
    s1, d1 = jax.jit(lambda s: step(cfg, s))(state)
    sharded_step = make_sharded_step(cfg, mesh, donate=False)
    s8, d8 = sharded_step(shard_state(mesh, state))
    np.testing.assert_allclose(np.asarray(s8.position), np.asarray(s1.position),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s8.velocity), np.asarray(s1.velocity),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s8.density), np.asarray(s1.density),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(s8.neighbor_count),
                                  np.asarray(s1.neighbor_count))
    np.testing.assert_allclose(float(d8.kinetic_energy), float(d1.kinetic_energy),
                               rtol=1e-5)
    assert int(d8.neighbor_max) == int(d1.neighbor_max)


def test_sharded_multi_step_stays_consistent():
    cfg, state = make_case(seed=5)
    mesh = make_mesh(8)
    sharded_step = make_sharded_step(cfg, mesh, donate=False)
    single = jax.jit(lambda s: step(cfg, s))
    s_multi = shard_state(mesh, state)
    s_single = state
    for _ in range(3):
        s_multi, _ = sharded_step(s_multi)
        s_single, _ = single(s_single)
    np.testing.assert_allclose(np.asarray(s_multi.position),
                               np.asarray(s_single.position),
                               rtol=1e-5, atol=1e-6)


def test_mesh_sizes():
    for ndev in (1, 2, 4, 8):
        cfg, state = make_case(n=1024)
        mesh = make_mesh(ndev)
        s, d = jax.jit(lambda st: step_sharded(cfg, mesh, st))(shard_state(mesh, state))
        assert np.isfinite(float(d.kinetic_energy))


def test_indivisible_particle_count_rejected():
    cfg, state = make_case(n=1001)  # not divisible by 8
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        step_sharded(cfg, mesh, state)
