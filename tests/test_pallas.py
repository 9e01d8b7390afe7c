"""Pallas backend tests (interpreter mode — runs on CPU).

The fused kernels must reproduce the XLA cell-list backend exactly in pair
set (identical neighbor counts) and to float round-off in values.  Hardware
runs are validated separately on the TPU; interpret mode keeps the kernel
logic covered by the CPU test suite.
"""

import jax
import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import celllist, pallas_step

# End-to-end / compiled-kernel tests: minutes each on the virtual CPU
# mesh.  Excluded from the default lane (pyproject addopts -m "not slow");
# run the full lane with:  pytest -q -m ""  (see README Testing).
pytestmark = pytest.mark.slow


def make_case(n=1024, **kw):
    kw.setdefault("pallas_interpret", True)
    kw.setdefault("pallas_block_rows", 128)
    kw.setdefault("pallas_window", 256)
    return make_scene("disk", num_particles=n, **kw)


def test_pallas_matches_celllist():
    cfg, state = make_case()
    acc_c, rho_c, aux_c = celllist.compute_step_quantities(cfg, state)
    acc_p, rho_p, aux_p = pallas_step.compute_step_quantities(cfg, state)
    np.testing.assert_array_equal(np.asarray(aux_p.neighbor_count),
                                  np.asarray(aux_c.neighbor_count))
    np.testing.assert_allclose(np.asarray(rho_p), np.asarray(rho_c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_c),
                               rtol=1e-3, atol=1e-4)


def test_pallas_multichunk_windows_exact():
    """Tiny window forces the multi-chunk path; results must not change."""
    cfg, state = make_case(pallas_window=128)
    cfg_big, _ = make_case(pallas_window=512)
    _, rho_small, _ = pallas_step.compute_step_quantities(cfg, state)
    _, rho_big, _ = pallas_step.compute_step_quantities(cfg_big, state)
    np.testing.assert_allclose(np.asarray(rho_small), np.asarray(rho_big),
                               rtol=1e-6, atol=1e-7)


def test_pallas_rejects_compat():
    cfg, state = make_case(compat=True)
    with pytest.raises(ValueError, match="compat"):
        pallas_step.compute_step_quantities(cfg, state)


def test_pallas_window_must_be_lane_aligned():
    cfg, state = make_case(pallas_window=200)
    with pytest.raises(ValueError, match="multiple"):
        pallas_step.compute_step_quantities(cfg, state)


def test_pallas_rejects_degenerate_grid():
    """Rod-delta masking is only wrap-safe for grids >= 3 cells per axis."""
    from smoothed_particle_hydrodynamics_tpu.config import SphConfig
    from smoothed_particle_hydrodynamics_tpu.ops import pallas_step, pallas_step_t
    from smoothed_particle_hydrodynamics_tpu.state import ParticleState

    cfg = SphConfig(num_particles=64, grid_nx=2, grid_ny=8, grid_nz=8,
                    pallas_interpret=True)
    state = ParticleState.zeros(64)
    with pytest.raises(ValueError, match="grid dims >= 3"):
        pallas_step.compute_step_quantities(cfg, state)
    with pytest.raises(ValueError, match="grid dims >= 3"):
        pallas_step_t.compute_step_quantities(cfg, state)
