"""Transposed (sublane-candidate) pallas layout — interpreter-mode coverage.

The hardware path is blocked on a Mosaic DMA tiling constraint (see
pallas_step_t module docstring); the kernel logic itself is exact and kept
covered on CPU until the in-VMEM-transpose variant lands.
"""

import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import pairwise, pallas_step_t


def test_transposed_matches_oracle_interpret():
    cfg, state = make_scene("disk", num_particles=1024,
                            pallas_layout="sublane", pallas_interpret=True,
                            pallas_window_t=192)
    rho_o = pairwise.compute_density(cfg, state)
    nc_o = pairwise.neighbor_counts(cfg, state)
    acc_t, rho_t, aux = pallas_step_t.compute_step_quantities(cfg, state)
    np.testing.assert_array_equal(np.asarray(aux.neighbor_count), np.asarray(nc_o))
    np.testing.assert_allclose(np.asarray(rho_t), np.asarray(rho_o),
                               rtol=1e-5, atol=1e-6)
    acc_o = pairwise.compute_acceleration(cfg, state, rho_o)
    np.testing.assert_allclose(np.asarray(acc_t), np.asarray(acc_o),
                               rtol=1e-3, atol=1e-4)
