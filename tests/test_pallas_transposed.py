"""Transposed (sublane-candidate) pallas layout — interpreter-mode coverage.

The same kernels run compiled on TPU (Mosaic-verified on hardware since round
2; bench.py records a pallas-vs-celllist parity block on every run).  CPU CI
covers the kernel logic bit-for-bit in interpreter mode.
"""

import numpy as np
import pytest

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import pairwise, pallas_step_t

# End-to-end / compiled-kernel tests: minutes each on the virtual CPU
# mesh.  Excluded from the default lane (pyproject addopts -m "not slow");
# run the full lane with:  pytest -q -m ""  (see README Testing).
pytestmark = pytest.mark.slow


def _check_against_oracle(cfg, state):
    rho_o = pairwise.compute_density(cfg, state)
    nc_o = pairwise.neighbor_counts(cfg, state)
    acc_t, rho_t, aux = pallas_step_t.compute_step_quantities(cfg, state)
    np.testing.assert_array_equal(np.asarray(aux.neighbor_count), np.asarray(nc_o))
    np.testing.assert_allclose(np.asarray(rho_t), np.asarray(rho_o),
                               rtol=1e-5, atol=1e-6)
    acc_o = pairwise.compute_acceleration(cfg, state, rho_o)
    np.testing.assert_allclose(np.asarray(acc_t), np.asarray(acc_o),
                               rtol=1e-3, atol=1e-4)


def test_transposed_matches_oracle_interpret():
    cfg, state = make_scene("disk", num_particles=1024,
                            pallas_layout="sublane", pallas_interpret=True,
                            pallas_window_t=192)
    _check_against_oracle(cfg, state)


@pytest.mark.parametrize("groups", [1, 2, 4])
def test_transposed_groups_match_oracle(groups):
    """pallas_groups routes through its own window/merge/group-dot code paths
    (_lane_group_masks, _merge_cols, per-group DMA in _sweep_body_t, masks4
    group dots in the force kernel); every G must match the O(N^2) oracle."""
    cfg, state = make_scene("disk", num_particles=512,
                            pallas_layout="sublane", pallas_interpret=True,
                            pallas_window_t=96, pallas_groups=groups)
    _check_against_oracle(cfg, state)


@pytest.mark.parametrize("block", [256, 512])
def test_transposed_wide_blocks_match_oracle(block):
    """pallas_block_t widens the kernel grid step to 256/512 particles (union
    rod windows, [s_t, b] vector ops, wider MXU dots) — fewer DMA
    descriptors and per-rod fixed costs, same physics.  Both widths must
    match the O(N^2) oracle, including a non-multiple-of-b tail block."""
    cfg, state = make_scene("disk", num_particles=block * 3 + 64,
                            pallas_layout="sublane", pallas_interpret=True,
                            pallas_window_t=96, pallas_block_t=block)
    _check_against_oracle(cfg, state)


def test_transposed_wide_blocks_capped_matches_narrow():
    """Capped mode with wide blocks keeps the IDENTICAL kept set (selection
    is per cell, independent of block width), so densities must match the
    128-block capped run bit-for-bit."""
    kw = dict(num_particles=1024, pallas_layout="sublane",
              pallas_interpret=True, pallas_window_t=96,
              capped_candidates=2, cell_size_factor=2.0)
    cfg_n, state = make_scene("disk", **kw)
    cfg_w, _ = make_scene("disk", pallas_block_t=256, **kw)
    _, rho_n, aux_n = pallas_step_t.compute_step_quantities(cfg_n, state)
    _, rho_w, aux_w = pallas_step_t.compute_step_quantities(cfg_w, state)
    np.testing.assert_array_equal(np.asarray(aux_w.neighbor_count),
                                  np.asarray(aux_n.neighbor_count))
    np.testing.assert_array_equal(np.asarray(rho_w), np.asarray(rho_n))
