"""drive_loop (host production loop) tests."""

import jax
import numpy as np

from smoothed_particle_hydrodynamics_tpu.config import SphConfig
from smoothed_particle_hydrodynamics_tpu.init import init_rotating_sphere
from smoothed_particle_hydrodynamics_tpu.ops.step import drive_loop, run_steps


def test_drive_loop_matches_scan():
    cfg = SphConfig(num_particles=1024)
    state = init_rotating_sphere(jax.random.PRNGKey(4), cfg)
    s_scan, d_scan = jax.jit(lambda s: run_steps(cfg, s, 5))(state)
    s_loop, d_loop = drive_loop(cfg, state, 5)
    np.testing.assert_allclose(np.asarray(s_loop.position),
                               np.asarray(s_scan.position), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_loop.kinetic_energy),
                               np.asarray(d_scan.kinetic_energy), rtol=1e-5)
    assert d_loop.kinetic_energy.shape == (5,)


def test_drive_loop_no_diags():
    cfg = SphConfig(num_particles=512)
    state = init_rotating_sphere(jax.random.PRNGKey(4), cfg)
    s, d = drive_loop(cfg, state, 3, collect_diags=False)
    assert d is None
    assert np.isfinite(np.asarray(s.position)).all()


def test_drive_loop_reuses_compiled_step():
    from smoothed_particle_hydrodynamics_tpu.ops import step as step_mod

    cfg = SphConfig(num_particles=512)
    state = init_rotating_sphere(jax.random.PRNGKey(4), cfg)
    f1 = step_mod._cached_step(cfg, "celllist")
    f2 = step_mod._cached_step(cfg, "celllist")
    assert f1 is f2
    drive_loop(cfg, state, 1)
