"""Cell-list backend vs the O(N^2) all-pairs oracle.

The cell list (octant or 27-cell) must reproduce the oracle's densities,
neighbor counts, and accelerations exactly (same masked pair set, same f32
math) as long as no capacity is exceeded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.config import SphConfig
from smoothed_particle_hydrodynamics_tpu.init import init_rotating_sphere
from smoothed_particle_hydrodynamics_tpu.ops import celllist, pairwise
from smoothed_particle_hydrodynamics_tpu.ops.step import step
from smoothed_particle_hydrodynamics_tpu.state import ParticleState


def make_state(n=800, seed=0):
    cfg = SphConfig(num_particles=n, cell_capacity=64, range_slice=128)
    key = jax.random.PRNGKey(seed)
    state = init_rotating_sphere(key, cfg)
    return cfg, state


@pytest.mark.parametrize("stencil", ["octant", "cell27"])
def test_density_matches_oracle(stencil):
    cfg, state = make_state()
    cfg = cfg.replace(neighborhood=stencil)
    rho_oracle = pairwise.compute_density(cfg, state)
    _, rho_cell, aux = celllist.compute_step_quantities(cfg, state)
    assert int(aux.truncated_ranges) == 0
    # atol covers f32 summation-order noise on near-cancelling densities
    # (identical pair sets are asserted via neighbor counts below)
    np.testing.assert_allclose(np.asarray(rho_cell), np.asarray(rho_oracle),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("stencil", ["octant", "cell27"])
def test_neighbor_counts_match_oracle(stencil):
    cfg, state = make_state(seed=3)
    cfg = cfg.replace(neighborhood=stencil)
    nc_oracle = np.asarray(pairwise.neighbor_counts(cfg, state))
    _, _, aux = celllist.compute_step_quantities(cfg, state)
    np.testing.assert_array_equal(np.asarray(aux.neighbor_count), nc_oracle)


@pytest.mark.parametrize("stencil", ["octant", "cell27"])
def test_acceleration_matches_oracle(stencil):
    cfg, state = make_state(seed=1)
    cfg = cfg.replace(neighborhood=stencil)
    rho = pairwise.compute_density(cfg, state)
    acc_oracle = pairwise.compute_acceleration(cfg, state, rho)
    acc_cell, _, _ = celllist.compute_step_quantities(cfg, state)
    np.testing.assert_allclose(np.asarray(acc_cell), np.asarray(acc_oracle),
                               rtol=2e-4, atol=2e-5)


def test_full_step_matches_oracle():
    cfg, state = make_state(seed=2)
    s_cell, d_cell = step(cfg, state, backend="celllist")
    s_pair, d_pair = step(cfg, state, backend="pairwise")
    np.testing.assert_allclose(np.asarray(s_cell.position), np.asarray(s_pair.position),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_cell.velocity), np.asarray(s_pair.velocity),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(d_cell.kinetic_energy), float(d_pair.kinetic_energy),
                               rtol=1e-4)
    assert int(d_cell.neighbor_max) == int(d_pair.neighbor_max)


def test_truncation_is_detected():
    """With a tiny range_slice, truncation must be counted, not silent."""
    cfg, state = make_state()
    cfg = cfg.replace(range_slice=2)
    _, _, aux = celllist.compute_step_quantities(cfg, state)
    assert int(aux.truncated_ranges) > 0


def test_empty_and_single_cells():
    """Sparse scene: isolated particles -> zero density (ref has no self term)."""
    cfg = SphConfig(num_particles=4)
    pos = jnp.asarray(
        [[1.0, 1.0, 1.0], [5.0, 5.0, 5.0], [2.0, 4.0, 1.5], [6.0, 1.0, 6.0]],
        jnp.float32)
    state = ParticleState.from_arrays(pos, jnp.zeros((4, 3)), cfg=cfg)
    _, rho, aux = celllist.compute_step_quantities(cfg, state)
    np.testing.assert_array_equal(np.asarray(rho), np.zeros(4, np.float32))
    np.testing.assert_array_equal(np.asarray(aux.neighbor_count), np.zeros(4, np.int32))


def test_self_density_option():
    cfg = SphConfig(num_particles=2, include_self_density=True)
    pos = jnp.asarray([[1.0, 1.0, 1.0], [5.0, 5.0, 5.0]], jnp.float32)
    state = ParticleState.from_arrays(pos, jnp.zeros((2, 3)), cfg=cfg)
    _, rho, _ = celllist.compute_step_quantities(cfg, state)
    from smoothed_particle_hydrodynamics_tpu.ops.kernels import poly6_self
    np.testing.assert_allclose(np.asarray(rho), poly6_self(cfg), rtol=1e-5)
