"""Fully distributed slab engine (parallel/slabs.py) on the 8-device CPU mesh.

Checks the three contracts: (1) physics equals the single-device cell-list
path per particle id, (2) per-device memory is O(N/D + caps) by construction
(p_cap ≪ N), with cross-slab migration conserving particles, (3) capacity
misses are counted in diagnostics, never silent.
"""

import pytest

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops.step import step
from smoothed_particle_hydrodynamics_tpu.parallel import slabs
from smoothed_particle_hydrodynamics_tpu.parallel.sharding import make_mesh

# End-to-end / compiled-kernel tests: minutes each on the virtual CPU
# mesh.  Excluded from the default lane (pyproject addopts -m "not slow");
# run the full lane with:  pytest -q -m ""  (see README Testing).
pytestmark = pytest.mark.slow


def _scene(n=4096, **kw):
    base = dict(num_particles=n, grid_nx=16, grid_ny=16, grid_nz=16,
                cell_capacity=32, range_slice=64)
    base.update(kw)
    return make_scene("dam_break", **base)


def _run_single(cfg, state, steps):
    f = jax.jit(partial(step, cfg, backend="celllist"))
    for _ in range(steps):
        state, d = f(state)
    return state, d


def test_slab_step_matches_single_device():
    steps = 3
    cfg, state = _scene()
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)
    assert p_cap < cfg.num_particles, "p_cap must be O(N/D), not O(N)"

    carry = slabs.distribute(cfg, state, mesh, p_cap)
    f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False)
    for _ in range(steps):
        carry, diag = f(carry)
    got = slabs.collect(carry, cfg.num_particles)

    ref, ref_diag = _run_single(cfg, state, steps)

    assert int(diag.migration_dropped) == 0
    assert int(diag.halo_dropped) == 0
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.velocity),
                               np.asarray(ref.velocity),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(diag.kinetic_energy),
                               float(ref_diag.kinetic_energy), rtol=1e-4)
    # |L| must be the norm of the psum'd VECTOR, not the psum of per-shard
    # norms (those differ by ~12% on this scene)
    np.testing.assert_allclose(float(diag.angular_momentum),
                               float(ref_diag.angular_momentum), rtol=1e-4)
    np.testing.assert_allclose(float(diag.neighbor_mean),
                               float(ref_diag.neighbor_mean), rtol=1e-5)


def test_migration_conserves_particles():
    """Push every particle upward in z so slab crossings actually happen."""
    steps = 4
    cfg, state = _scene()
    # strong +z velocity: ~0.4 cells/step => guaranteed boundary crossings
    vz = 0.4 * cfg.cell_size / cfg.dt * cfg.sim_scale
    state = state._replace(
        velocity=state.velocity.at[:, 2].set(vz))
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8, headroom=2.0)
    carry = slabs.distribute(cfg, state, mesh, p_cap)
    f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False)
    counts0 = int(np.asarray(carry.count).sum())
    migrated_any = False
    prev = np.asarray(carry.count)
    for _ in range(steps):
        carry, diag = f(carry)
        cur = np.asarray(carry.count)
        migrated_any = migrated_any or (cur != prev).any()
        prev = cur
    assert int(np.asarray(carry.count).sum()) == counts0
    assert int(diag.migration_dropped) == 0
    assert migrated_any, "no particle ever crossed a slab boundary"

    # physics still matches the single-device oracle after migrations
    got = slabs.collect(carry, cfg.num_particles)
    ref, _ = _run_single(cfg, state, steps)
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-5, atol=1e-5)


def test_undersized_halo_is_counted():
    """A halo window smaller than an edge plane's population must surface in
    halo_dropped (the plane rows the fixed window could not carry)."""
    cfg, state = _scene()
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)
    small_h = 64  # deliberately below the densest plane population
    carry = slabs.distribute(cfg, state, mesh, p_cap)
    f = slabs.make_slab_step(cfg, mesh, p_cap, small_h, m_cap, donate=False)
    _, diag = f(carry)
    zp = np.floor(np.asarray(state.position)[:, 2] / cfg.cell_size).astype(int)
    plane = np.bincount(np.clip(zp, 0, cfg.grid_nz - 1), minlength=cfg.grid_nz)
    if plane.max() > small_h:
        assert int(diag.halo_dropped) > 0
    else:  # scene too sparse for the starvation to trigger — fail loudly
        raise AssertionError("test scene no longer dense enough to starve h_cap")


def test_capacity_misses_are_counted():
    """A starved migration buffer must surface in migration_dropped."""
    cfg, state = _scene(n=2048)
    vz = 0.4 * cfg.cell_size / cfg.dt * cfg.sim_scale
    state = state._replace(velocity=state.velocity.at[:, 2].set(vz))
    mesh = make_mesh(8)
    p_cap, h_cap, _ = slabs.derive_slab_caps(cfg, state, 8, headroom=2.0)
    m_cap = 64  # deliberately tiny (derive_slab_caps floor)
    carry = slabs.distribute(cfg, state, mesh, p_cap)
    f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False)
    dropped = 0
    for _ in range(4):
        carry, diag = f(carry)
        dropped += int(diag.migration_dropped)
    total = int(np.asarray(carry.count).sum())
    assert total + dropped == cfg.num_particles, (
        "every lost particle must be accounted for in migration_dropped")


def test_slab_pallas_sweeps_match_celllist_sweeps():
    """sweeps='pallas' runs the production sublane kernels inside each shard;
    physics must match the celllist slab path (interpret mode on CPU)."""
    steps = 2
    cfg, state = _scene(pallas_interpret=True, pallas_window_t=64)
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)

    carries = {}
    for eng in ("celllist", "pallas"):
        carry = slabs.distribute(cfg, state, mesh, p_cap)
        f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                                 donate=False, sweeps=eng)
        for _ in range(steps):
            carry, diag = f(carry)
        carries[eng] = (slabs.collect(carry, cfg.num_particles), diag)

    got, gd = carries["pallas"]
    ref, rd = carries["celllist"]
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(gd.neighbor_mean),
                               float(rd.neighbor_mean), rtol=1e-6)
    assert int(gd.migration_dropped) == 0


def test_slab_pallas_wide_blocks_match_celllist():
    """pallas_block_t=256 inside the slab engine (wider kernel grid steps,
    b-multiple caps): physics must match the celllist slab path, capped mode
    included (the capped kept set is block-width independent)."""
    steps = 2
    kw = dict(pallas_interpret=True, pallas_window_t=64, pallas_block_t=256,
              capped_candidates=0)
    cfg, state = _scene(**kw)
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)
    assert p_cap % 256 == 0 and h_cap % 256 == 0

    carries = {}
    for eng in ("celllist", "pallas"):
        carry = slabs.distribute(cfg, state, mesh, p_cap)
        f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                                 donate=False, sweeps=eng)
        for _ in range(steps):
            carry, diag = f(carry)
        carries[eng] = (slabs.collect(carry, cfg.num_particles), diag)

    got, gd = carries["pallas"]
    ref, rd = carries["celllist"]
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(gd.neighbor_mean),
                               float(rd.neighbor_mean), rtol=1e-6)
    assert int(gd.migration_dropped) == 0


def test_slab_capped_wide_blocks_match_narrow():
    """Capped slab sweeps at pallas_block_t=256 keep the identical kept set
    and pair mask as 128 — densities and positions must agree to f32
    round-off across block widths."""
    steps = 2
    base = dict(pallas_interpret=True, pallas_window_t=64,
                capped_candidates=2)
    mesh = make_mesh(8)
    outs = {}
    for b in (128, 256):
        cfg, state = _scene(pallas_block_t=b, **base)
        p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)
        carry = slabs.distribute(cfg, state, mesh, p_cap)
        f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                                 donate=False, sweeps="pallas")
        for _ in range(steps):
            carry, diag = f(carry)
        outs[b] = (slabs.collect(carry, cfg.num_particles), diag)
    got, gd = outs[256]
    ref, rd = outs[128]
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-6, atol=1e-7)
    assert int(gd.migration_dropped) == 0
    np.testing.assert_allclose(float(gd.neighbor_mean),
                               float(rd.neighbor_mean), rtol=1e-6)


def test_multi_slab_hop_is_delivered():
    """A particle moving MORE than one slab between rebins is routed hop by
    hop to its destination (uniform while_loop) — nothing dropped, nothing
    mis-binned, physics equal to the single-device oracle.  (Each device
    owns 2 z-planes here, so 2.5 planes/step of drift jumps ≥ 2 devices.)"""
    steps = 2
    cfg, state = _scene(n=2048)
    vz = 2.5 * cfg.cell_size / cfg.dt * cfg.sim_scale
    state = state._replace(velocity=state.velocity.at[:, 2].set(vz))
    mesh = make_mesh(8)
    # generous p_cap: the streaming cloud re-concentrates upward and the
    # point of THIS test is routing, not capacity accounting (that is
    # test_capacity_misses_are_counted / test_dynamic_rebalance)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8, headroom=4.0)
    carry = slabs.distribute(cfg, state, mesh, p_cap)
    f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False)
    dropped = 0
    for _ in range(steps):
        carry, diag = f(carry)
        dropped += int(diag.migration_dropped)
    assert dropped == 0, "multi-hop routing must deliver, not drop"
    assert int(np.asarray(carry.count).sum()) == cfg.num_particles
    got = slabs.collect(carry, cfg.num_particles)
    ref, _ = _run_single(cfg, state, steps)
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-5, atol=1e-5)


def test_uniform_translation_never_rebins_slab():
    """Common-mode motion must not expire the frozen slab structure: the
    spread trigger sees zero RELATIVE drift while the cloud coasts across
    many cells (and slab boundaries get crossed only at the eventual rebin)."""
    steps = 6
    cfg, state = _scene(cell_size_factor=1.25)
    from smoothed_particle_hydrodynamics_tpu.ops.lazy import skin_half

    # uniform +z velocity: one FULL skin of common-mode drift per step —
    # the old per-particle trigger would rebin every step
    vz = skin_half(cfg) / (cfg.dt / cfg.sim_scale)
    state = state._replace(velocity=jnp.zeros_like(state.velocity)
                           .at[:, 2].set(vz))
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8, headroom=2.0)
    carry = slabs.distribute(cfg, state, mesh, p_cap)
    f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False)
    for _ in range(steps):
        carry, diag = f(carry)
    rebins = int(np.asarray(carry.rebin_count)[0])
    assert rebins <= 1 + steps // 4, (
        f"coasting cloud rebinned {rebins}x in {steps} steps — the spread "
        "trigger is not seeing relative drift")
    assert int(diag.migration_dropped) == 0
    got = slabs.collect(carry, cfg.num_particles)
    ref, _ = _run_single(cfg, state, steps)
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-5, atol=1e-5)


def test_balanced_zsplit_matches_and_shrinks_pcap():
    """Occupancy-weighted plane partition: same physics as uniform slabs,
    but the densest device's capacity (= memory and sweep work) drops on a
    mass-concentrated scene."""
    steps = 2
    cfg, state = _scene()
    mesh = make_mesh(8)

    zsplit = slabs.derive_zsplit(cfg, state, 8)
    assert zsplit[0] == 0 and zsplit[-1] == cfg.grid_nz
    assert all(b - a >= 2 for a, b in zip(zsplit, zsplit[1:]))

    p_u, _, _ = slabs.derive_slab_caps(cfg, state, 8)
    p_b, h_b, m_b = slabs.derive_slab_caps(cfg, state, 8, zsplit=zsplit)
    assert p_b <= p_u, "balanced partition must not need more capacity"

    carry = slabs.distribute(cfg, state, mesh, p_b, zsplit=zsplit)
    f = slabs.make_slab_step(cfg, mesh, p_b, h_b, m_b, donate=False,
                             zsplit=zsplit)
    for _ in range(steps):
        carry, diag = f(carry)
    got = slabs.collect(carry, cfg.num_particles)
    ref, _ = _run_single(cfg, state, steps)
    assert int(diag.migration_dropped) == 0
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-5, atol=1e-5)


def test_slab_capped_matches_single_chip_capped():
    """Capped mode distributed: the kept set is decided by (cell,
    hash(original id)) — a GLOBAL deterministic policy — so the 8-mesh slab
    engine must reproduce the single-chip capped pallas physics."""
    from functools import partial as _partial

    from smoothed_particle_hydrodynamics_tpu.ops.step import step as chip_step

    steps = 2
    cfg, state = _scene(pallas_interpret=True, pallas_window_t=64,
                        cell_size_factor=1.25, capped_candidates=4)
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)
    zsplit = slabs.uniform_zsplit(cfg, 8)
    sub = slabs.derive_sub_len_slab(cfg, state, 8, zsplit)
    assert 0 < sub < p_cap + 2 * h_cap, sub

    carry = slabs.distribute(cfg, state, mesh, p_cap)
    f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False,
                             sweeps="pallas", sub_len=sub)
    for _ in range(steps):
        carry, diag = f(carry)
    got = slabs.collect(carry, cfg.num_particles)
    assert int(diag.truncated_ranges) == 0, "derived sub_len overflowed"

    ref = state
    g = jax.jit(_partial(chip_step, cfg, backend="pallas"))
    for _ in range(steps):
        ref, rdiag = g(ref)
    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(diag.neighbor_mean),
                               float(rdiag.neighbor_mean), rtol=1e-5)


def test_lazy_slab_freezes_rebuilds_and_matches_eager():
    """Drift below the (cell-h)/2 skin: the lazy engine must freeze the sort
    + window tables across steps (rebin_count stays at the initial build) and
    still produce the same physics as rebinning every step — the frozen
    structure is a candidate SUPERSET and the kernels mask true distances."""
    steps = 6
    # 1.25h cells: 0.125h drift skin (the dam_break default is h-cells = zero
    # skin, which degrades the lazy engine to eager — correct, never faster)
    cfg, state = _scene(cell_size_factor=1.25)
    # zero velocities: drift/step ~2e-5 world units << the 0.0125 skin
    state = state._replace(velocity=state.velocity * 0.0)
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)

    results = {}
    for lazy in (True, False):
        carry = slabs.distribute(cfg, state, mesh, p_cap)
        f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                                 donate=False, lazy=lazy)
        for _ in range(steps):
            carry, diag = f(carry)
        results[lazy] = (carry, slabs.collect(carry, cfg.num_particles), diag)

    lazy_carry, lazy_state, lazy_diag = results[True]
    eager_carry, eager_state, eager_diag = results[False]
    rebins_lazy = int(np.asarray(lazy_carry.rebin_count)[0])
    rebins_eager = int(np.asarray(eager_carry.rebin_count)[0])
    assert rebins_eager == steps
    assert rebins_lazy < steps, (
        f"lazy engine rebuilt every step ({rebins_lazy}/{steps}) — "
        "the drift skin never engaged")
    np.testing.assert_allclose(np.asarray(lazy_state.position),
                               np.asarray(eager_state.position),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(lazy_diag.kinetic_energy),
                               float(eager_diag.kinetic_energy), rtol=1e-5)
    np.testing.assert_allclose(float(lazy_diag.neighbor_mean),
                               float(eager_diag.neighbor_mean), rtol=1e-6)


def test_lazy_slab_pallas_freezes_and_matches():
    """Same freeze-equality contract through the production pallas sweeps
    (interpret mode): frozen ws/wc tables must reproduce eager physics."""
    steps = 4
    cfg, state = _scene(pallas_interpret=True, pallas_window_t=64,
                        cell_size_factor=1.25)
    state = state._replace(velocity=state.velocity * 0.0)
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)

    outs = {}
    for lazy in (True, False):
        carry = slabs.distribute(cfg, state, mesh, p_cap)
        f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                                 donate=False, sweeps="pallas", lazy=lazy)
        for _ in range(steps):
            carry, diag = f(carry)
        outs[lazy] = (carry, slabs.collect(carry, cfg.num_particles))
    assert int(np.asarray(outs[True][0].rebin_count)[0]) < steps
    np.testing.assert_allclose(np.asarray(outs[True][1].position),
                               np.asarray(outs[False][1].position),
                               rtol=1e-5, atol=1e-6)


def test_slab_window_tables_exclude_dead_and_inert_rows():
    """The store's dead tail (cid slab_hi-1) and chain-end inert halos
    (cid -1 / num_cells) must not inflate pallas window tables: at 1M scale
    the polluted windows swept ~500k junk rows per top-cell window and all
    h_cap inert rows per bottom-cell window (r3 hardware findings — the
    first stalled the TPU worker until the watchdog killed it)."""
    import jax.numpy as jnp

    from smoothed_particle_hydrodynamics_tpu.parallel.slabs import (
        _pallas_tables)

    cfg, state = _scene(n=4096, pallas_window_t=64)
    cfg = cfg.replace(pallas_window_t=64)
    nxny = cfg.grid_nx * cfg.grid_ny
    slab_hi = cfg.grid_nz * nxny          # 1-device slab = whole grid
    p_cap, h_cap = 1024, 128
    cnt = 500                             # 524 dead rows
    rng = np.random.default_rng(0)
    # valid rows concentrated in the TOP cells so windows touch slab_hi-1
    cid_valid = np.sort(rng.integers(slab_hi - 3 * nxny, slab_hi, cnt))
    cid_local = np.concatenate(
        [cid_valid, np.full(p_cap - cnt, slab_hi - 1)]).astype(np.int32)
    cid_ext = np.concatenate([
        np.full(h_cap, -1, np.int32),             # chain-end left halo
        cid_local,
        np.full(h_cap, cfg.num_cells, np.int32),  # chain-end right halo
    ])
    ws, wc = _pallas_tables(cfg, jnp.asarray(cid_local),
                            jnp.asarray(cid_ext), h_cap, p_cap,
                            jnp.int32(cnt), jnp.int32(slab_hi))
    wc = np.asarray(wc).reshape(p_cap // 128, 9)
    ws = np.asarray(ws).reshape(p_cap // 128, 9)
    # fully-dead blocks (first row >= cnt): no chunks at all
    assert (wc[4:] == 0).all(), wc
    # live blocks: no window may span the ~524-row dead run (occupancy here
    # is ~170 rows/cell worst case; 8 chunks of 64 bounds every real window)
    assert wc[:4].max() <= 8, wc[:4]


def test_dynamic_rebalance_prevents_overflow():
    """Mass streaming toward the box floor overloads the t=0 partition: the
    static split overflows p_cap (counted drops), while host-side
    maybe_rebalance at block boundaries re-derives the split + caps from the
    CURRENT histogram and the same run completes clean."""

    steps, block = 12, 2
    cfg, state = _scene()
    vz = -0.3 * cfg.cell_size / cfg.dt * cfg.sim_scale
    state = state._replace(velocity=state.velocity.at[:, 2].set(vz))
    mesh = make_mesh(8)
    zsplit = slabs.derive_zsplit(cfg, state, 8)
    _, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8, headroom=2.0,
                                             zsplit=zsplit)
    # p_cap just above the initial max slab population: any concentration
    # beyond the t=0 layout overflows
    zp = np.floor(np.asarray(state.position)[:, 2] / cfg.cell_size).astype(int)
    plane = np.bincount(np.clip(zp, 0, cfg.grid_nz - 1), minlength=cfg.grid_nz)
    slab_pop = max(plane[a:b].sum() for a, b in zip(zsplit, zsplit[1:]))
    p_cap = -(-int(slab_pop + 64) // 128) * 128

    # --- static split: drops ---
    carry = slabs.distribute(cfg, state, mesh, p_cap, zsplit=zsplit)
    f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False,
                             zsplit=zsplit)
    dropped_static = 0
    for _ in range(steps):
        carry, diag = f(carry)
        dropped_static += int(diag.migration_dropped)
    assert dropped_static > 0, (
        "scene no longer overloads the static split — tighten p_cap")

    # --- with block-boundary rebalancing: clean ---
    carry = slabs.distribute(cfg, state, mesh, p_cap, zsplit=zsplit)
    caps = (p_cap, h_cap, m_cap)
    zs = zsplit
    f = slabs.make_slab_step(cfg, mesh, *caps, donate=False, zsplit=zs)
    dropped = 0
    rebalanced = 0
    for b in range(steps // block):
        for _ in range(block):
            carry, diag = f(carry)
            dropped += int(diag.migration_dropped)
        carry2, zs2, caps2, _sub2, changed = slabs.maybe_rebalance(
            cfg, mesh, carry, cfg.num_particles, threshold=1.2)
        if changed:
            carry, zs, caps = carry2, zs2, caps2
            f = slabs.make_slab_step(cfg, mesh, *caps, donate=False, zsplit=zs)
            rebalanced += 1
    assert rebalanced > 0, "imbalance never crossed the rebalance threshold"
    assert dropped == 0, f"rebalanced run still dropped {dropped} particles"
    assert int(np.asarray(carry.count).sum()) == cfg.num_particles


def test_long_march_conservation():
    """60 steps of a tall-velocity dam break: particles stream across many
    slab boundaries; counts stay conserved, nothing drops, energies finite."""
    cfg, state = _scene(n=2048)
    vz = 0.25 * cfg.cell_size / cfg.dt * cfg.sim_scale
    state = state._replace(velocity=state.velocity.at[:, 2].set(vz))
    mesh = make_mesh(8)
    zsplit = slabs.derive_zsplit(cfg, state, 8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8, headroom=3.0,
                                                 zsplit=zsplit)
    carry = slabs.distribute(cfg, state, mesh, p_cap, zsplit=zsplit)
    f = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False,
                             zsplit=zsplit)
    for i in range(60):
        carry, diag = f(carry)
        if i % 20 == 19:
            assert int(diag.migration_dropped) == 0, f"step {i}"
            assert np.isfinite(float(diag.kinetic_energy)), f"step {i}"
            assert int(np.asarray(carry.count).sum()) == cfg.num_particles


def test_slab_pallas_enforces_kernel_constraints():
    """The distributed path must validate the same kernel constraints as
    the single-chip path (capped mode requires pallas_groups=1)."""
    import pytest

    cfg, state = _scene(pallas_interpret=True, pallas_window_t=64,
                        capped_candidates=4, pallas_groups=2)
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)
    with pytest.raises(ValueError, match="pallas_groups"):
        slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                             sweeps="pallas", sub_len=256)


def test_slab_scan_block_matches_per_step_dispatch():
    """scan_block=K (K steps per dispatch via lax.scan) must reproduce the
    per-step dispatch trajectory AND per-step diagnostics exactly — it is a
    dispatch-amortization dial, not a different engine."""
    steps, k = 6, 3
    cfg, state = _scene(cell_size_factor=1.25)
    mesh = make_mesh(8)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 8)

    carry = slabs.distribute(cfg, state, mesh, p_cap)
    f1 = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False)
    diags1 = []
    for _ in range(steps):
        carry, d = f1(carry)
        diags1.append(float(d.kinetic_energy))
    ref = slabs.collect(carry, cfg.num_particles)

    carry = slabs.distribute(cfg, state, mesh, p_cap)
    fk = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap, donate=False,
                              scan_block=k)
    diagsk = []
    for _ in range(steps // k):
        carry, dk = fk(carry)
        assert dk.kinetic_energy.shape == (k,), dk.kinetic_energy.shape
        diagsk.extend(np.asarray(dk.kinetic_energy).tolist())
    got = slabs.collect(carry, cfg.num_particles)

    np.testing.assert_allclose(np.asarray(got.position),
                               np.asarray(ref.position), rtol=0, atol=0)
    np.testing.assert_allclose(diagsk, diags1, rtol=1e-6)


def test_plane_local_window_tables_cover_candidates_mid_slab():
    """Plane-LOCAL window tables (base > 0, a middle device) must cover every
    true candidate row: halo rows deeper than the halo plane (below the local
    range) enter the bounds only as a positional offset, rows above the range
    land past every queried bound, dead rows keep their positional offset.
    Oracle: brute-force first/last candidate position per (block, rod)."""
    import jax.numpy as jnp

    from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pt
    from smoothed_particle_hydrodynamics_tpu.parallel.slabs import (
        _pallas_tables)

    cfg, _ = _scene(n=4096, pallas_window_t=64)
    nxny = cfg.grid_nx * cfg.grid_ny
    window = cfg.pallas_window_t
    # middle device of a 2-dev split: planes [8, 16) -> cells [slab_lo, hi)
    slab_lo, slab_hi = 8 * nxny, 16 * nxny
    base = slab_lo - nxny
    loc = (8 + 2) * nxny
    p_cap, h_cap, cnt = 256, 128, 200
    rng = np.random.default_rng(3)

    cid_local = np.sort(rng.integers(slab_lo, slab_hi, cnt))
    cid_local = np.concatenate(
        [cid_local, np.full(p_cap - cnt, slab_hi - 1)]).astype(np.int32)
    # left halo: 40 deep rows BELOW the halo plane + the halo plane itself
    left = np.sort(np.concatenate([
        rng.integers(slab_lo - 3 * nxny, slab_lo - nxny, 40),
        rng.integers(slab_lo - nxny, slab_lo, h_cap - 40)]))
    # right halo: halo plane + 30 deep rows ABOVE it
    right = np.sort(np.concatenate([
        rng.integers(slab_hi, slab_hi + nxny, h_cap - 30),
        rng.integers(slab_hi + nxny, slab_hi + 3 * nxny, 30)]))
    cid_ext = np.concatenate([left, cid_local, right]).astype(np.int32)

    ws, wc = _pallas_tables(cfg, jnp.asarray(cid_local), jnp.asarray(cid_ext),
                            h_cap, p_cap, jnp.int32(cnt), jnp.int32(slab_hi),
                            jnp.int32(base), loc)
    ws = np.asarray(ws).reshape(p_cap // pt.BLANE, len(pt._RODS))
    wc = np.asarray(wc).reshape(p_cap // pt.BLANE, len(pt._RODS))

    pos = np.arange(len(cid_ext))
    dead = (pos >= h_cap + cnt) & (pos < h_cap + p_cap)
    deltas = np.asarray([(dz * cfg.grid_ny + dy) * cfg.grid_nx
                         for dy, dz in pt._RODS])
    for b in range(p_cap // pt.BLANE):
        rows = cid_local[b * pt.BLANE:(b + 1) * pt.BLANE]
        for r, dlt in enumerate(deltas):
            lo = np.clip(rows[0] + dlt - 1, 0, cfg.num_cells - 1)
            hi = np.clip(rows[-1] + dlt + 1, 0, cfg.num_cells - 1)
            cand = (~dead & (cid_ext >= max(lo, base))
                    & (cid_ext <= min(hi, base + loc - 1)))
            if not cand.any():
                continue
            first, last = pos[cand][0], pos[cand][-1]
            end = ws[b, r] + wc[b, r] * window
            assert ws[b, r] <= first, (b, r, ws[b, r], first)
            assert end > last, (b, r, end, last)


