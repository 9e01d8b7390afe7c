"""Grid binning tests: cell ids, sorted order, offsets, overflow counting."""

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.config import SphConfig
from smoothed_particle_hydrodynamics_tpu.ops import grid as gridmod


def small_cfg(n=512):
    return SphConfig(num_particles=n, cell_capacity=64)


def random_positions(cfg, n, seed=0, spread=1.0):
    key = jax.random.PRNGKey(seed)
    box = jnp.asarray(cfg.box_max)
    return jax.random.uniform(key, (n, 3), jnp.float32) * box * spread


def test_cell_coords_matches_reference_formula():
    cfg = small_cfg()
    pos = random_positions(cfg, 512)
    coords = np.asarray(gridmod.cell_coords(cfg, pos))
    expected = np.floor(np.asarray(pos) * np.float32(cfg.inv_cell_size)).astype(np.int32)
    expected = np.clip(expected, 0, [cfg.grid_nx - 1, cfg.grid_ny - 1, cfg.grid_nz - 1])
    np.testing.assert_array_equal(coords, expected)


def test_out_of_box_clamped():
    cfg = small_cfg()
    pos = jnp.asarray([[-1.0, 3.0, 3.0], [100.0, 3.0, 3.0], [3.0, -0.1, 99.0]], jnp.float32)
    coords = np.asarray(gridmod.cell_coords(cfg, pos))
    assert coords[0, 0] == 0
    assert coords[1, 0] == cfg.grid_nx - 1
    assert coords[2, 1] == 0 and coords[2, 2] == cfg.grid_nz - 1


def test_linear_id_matches_reference():
    cfg = small_cfg()
    # ref: (z*ny + y)*nx + x  (/root/reference/src/sph.cpp:1151-1154)
    c = jnp.asarray([[3, 5, 7]], jnp.int32)
    got = int(gridmod.linear_cell_id(cfg, c)[0])
    assert got == (7 * cfg.grid_ny + 5) * cfg.grid_nx + 3


def test_build_grid_offsets_consistent():
    cfg = small_cfg()
    pos = random_positions(cfg, 512)
    g = gridmod.build_grid(cfg, pos)
    order = np.asarray(g.order)
    cid_sorted = np.asarray(g.cell_ids)
    start = np.asarray(g.cell_start)
    end = np.asarray(g.cell_end)

    # sorted ids are non-decreasing
    assert (np.diff(cid_sorted) >= 0).all()
    # each particle is inside its cell's [start, end)
    for i, c in enumerate(cid_sorted):
        assert start[c] <= i < end[c]
    # counts add up
    assert (end - start).sum() == 512
    # order is a permutation
    assert sorted(order.tolist()) == list(range(512))


def test_stable_order_matches_reference_bucket_order():
    """Within a cell, sorted order must be ascending particle index — the
    reference's sequential push_back order (/root/reference/src/sph.cpp:476-480)."""
    cfg = small_cfg()
    # Put several particles in the same cell, interleaved with others.
    pos = random_positions(cfg, 64)
    pos = pos.at[5].set(jnp.asarray([3.0, 3.0, 3.0]))
    pos = pos.at[50].set(jnp.asarray([3.01, 3.01, 3.01]))
    pos = pos.at[17].set(jnp.asarray([3.02, 3.0, 3.0]))
    g = gridmod.build_grid(cfg, pos)
    cid = np.asarray(gridmod.linear_cell_id(cfg, gridmod.cell_coords(cfg, pos)))
    target = cid[5]
    members = np.asarray(g.order)[np.asarray(g.cell_ids) == target]
    in_cell = [i for i in (5, 50, 17) if cid[i] == target]
    assert members.tolist() == sorted(set(in_cell) | set(members.tolist()))


def test_overflow_counting():
    cfg = small_cfg().replace(cell_capacity=4)
    # 10 particles in one cell
    pos = jnp.tile(jnp.asarray([[3.0, 3.0, 3.0]], jnp.float32), (10, 1))
    g = gridmod.build_grid(cfg, pos)
    assert int(g.overflow_cells) == 1


def test_unsort_roundtrip():
    cfg = small_cfg()
    pos = random_positions(cfg, 256)
    g = gridmod.build_grid(cfg, pos)
    vals = jnp.arange(256, dtype=jnp.float32)
    sorted_vals = vals[g.order]
    np.testing.assert_array_equal(np.asarray(gridmod.unsort(g.order, sorted_vals)), np.asarray(vals))
