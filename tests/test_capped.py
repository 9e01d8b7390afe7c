"""Capped-candidate ("Subsets") mode — the reference's core optimization,
rebuilt TPU-natively.

The reference bounds neighbor work by stochastically subsampling candidates
(/root/reference/src/sph.cpp:98,590-598,679-682; README.md:267-268).  Here
the candidate SOURCE is capped at K_c hash-selected particles per cell
(``capped_candidates``), shrinking rod windows from extent*occupancy to
extent*K_c; ``capped_reweight`` keeps density unbiased.  These tests pin:
(1) keep-all == exact, (2) reweighted subsampling is mean-unbiased while
plain truncation is biased low (the reference's semantic), (3) the lazy
driver runs capped configs, (4) window tables never index the unkept tail.
"""

import numpy as np
import pytest

import jax

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import pairwise, pallas_step_t

# End-to-end / compiled-kernel tests: minutes each on the virtual CPU
# mesh.  Excluded from the default lane (pyproject addopts -m "not slow");
# run the full lane with:  pytest -q -m ""  (see README Testing).
pytestmark = pytest.mark.slow


def _dense_scene(**kw):
    base = dict(num_particles=2048, grid_nx=16, grid_ny=16, grid_nz=16,
                pallas_interpret=True, pallas_window_t=96,
                cell_size_factor=1.25)
    base.update(kw)
    return make_scene("dam_break", **base)


def test_keepall_cap_is_exact():
    """A cap above every cell's occupancy must reproduce the uncapped
    physics (only the within-cell candidate order differs)."""
    cfg, state = _dense_scene()
    rho_o = np.asarray(pairwise.compute_density(cfg, state))
    nc_o = np.asarray(pairwise.neighbor_counts(cfg, state))
    acc_o = np.asarray(pairwise.compute_acceleration(
        cfg, state, pairwise.compute_density(cfg, state)))

    cfg_c = cfg.replace(capped_candidates=1 << 14)
    acc, rho, aux = pallas_step_t.compute_step_quantities(cfg_c, state)
    np.testing.assert_array_equal(np.asarray(aux.neighbor_count), nc_o)
    np.testing.assert_allclose(np.asarray(rho), rho_o, rtol=1e-5, atol=1e-6)
    # slightly looser than the uncapped parity test: cells sum in hash order
    # here, so f32 association differs in near-cancelling components
    np.testing.assert_allclose(np.asarray(acc), acc_o, rtol=1e-3, atol=5e-4)


def test_reweighted_subsample_is_mean_unbiased():
    cfg, state = _dense_scene()
    rho_o = np.asarray(pairwise.compute_density(cfg, state))
    cfg_c = cfg.replace(capped_candidates=8)
    _, rho, aux = pallas_step_t.compute_step_quantities(cfg_c, state)
    ratio = float(np.asarray(rho).mean() / rho_o.mean())
    assert 0.97 < ratio < 1.03, f"reweighted density biased: {ratio}"
    # the cap actually binds: fewer pairs were summed
    nc_full = np.asarray(pairwise.neighbor_counts(cfg, state)).mean()
    assert float(np.asarray(aux.neighbor_count).mean()) < 0.85 * nc_full


def test_truncation_without_reweight_is_biased_low():
    """capped_reweight=False reproduces the reference's truncation semantic:
    density systematically underestimates by ~the kept fraction."""
    cfg, state = _dense_scene()
    rho_o = np.asarray(pairwise.compute_density(cfg, state))
    cfg_c = cfg.replace(capped_candidates=4, capped_reweight=False)
    _, rho, _ = pallas_step_t.compute_step_quantities(cfg_c, state)
    ratio = float(np.asarray(rho).mean() / rho_o.mean())
    assert ratio < 0.8, f"truncation should bias density low, got {ratio}"


def test_capped_never_reads_unkept_tail():
    """Unkept rows carry sentinel cids: every accepted pair's source must be
    a kept row.  Verified indirectly: per-particle neighbor count in capped
    mode is bounded by the uncapped count (a subsample can only lose pairs),
    and self-pairs stay excluded (rho has no self term)."""
    cfg, state = _dense_scene(num_particles=1024)
    nc_full = np.asarray(pairwise.neighbor_counts(cfg, state))
    cfg_c = cfg.replace(capped_candidates=6)
    _, rho, aux = pallas_step_t.compute_step_quantities(cfg_c, state)
    nc = np.asarray(aux.neighbor_count)
    assert (nc <= nc_full).all(), "capped mode found pairs the oracle lacks"
    # isolated particles (0 uncapped neighbors) must keep rho == 0: any
    # self-pair or tail read would show up here
    lonely = nc_full == 0
    if lonely.any():
        assert np.abs(np.asarray(rho)[lonely]).max() == 0.0


def test_lazy_driver_runs_capped():
    """The production lazy driver accepts capped configs: frozen subsample +
    windows between rebins, fresh gathers each step; first step must equal
    the eager capped step exactly (identical prepare)."""
    from smoothed_particle_hydrodynamics_tpu.ops.lazy import drive_loop_lazy
    from smoothed_particle_hydrodynamics_tpu.ops.step import drive_loop

    cfg, state = _dense_scene(capped_candidates=8)
    s_lazy, d_lazy = drive_loop_lazy(cfg, state, 1)
    # a few more steps stay finite under the frozen subsample
    s3, d3 = drive_loop_lazy(cfg, state, 4)
    assert np.isfinite(np.asarray(s3.position)).all()
    assert np.isfinite(float(d3.kinetic_energy[-1]))
    # (drive_loop donates its input state — call it last)
    s_eager, d_eager = drive_loop(cfg, state, 1, backend="pallas")
    np.testing.assert_allclose(np.asarray(s_lazy.position),
                               np.asarray(s_eager.position),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(d_lazy.kinetic_energy[0]),
                               float(d_eager.kinetic_energy[0]), rtol=1e-6)


def test_capped_sub_len_bound_and_overflow_counted():
    """capped_sub_len statically bounds the sub frame: a derived bound must
    reproduce the unbounded results exactly (same kept set), while an
    undersized bound drops tail candidates and COUNTS them."""
    from smoothed_particle_hydrodynamics_tpu.ops.pallas_step_t import (
        derive_sub_len)

    cfg, state = _dense_scene(capped_candidates=8)
    _, rho_full, aux_full = pallas_step_t.compute_step_quantities(cfg, state)
    assert int(aux_full.truncated_ranges) == 0

    derived = derive_sub_len(cfg, state)
    if derived:  # scene dense enough for a bound below N
        cfg_d = cfg.replace(capped_sub_len=derived)
        _, rho_d, aux_d = pallas_step_t.compute_step_quantities(cfg_d, state)
        assert int(aux_d.truncated_ranges) == 0, "derived bound overflowed"
        np.testing.assert_allclose(np.asarray(rho_d), np.asarray(rho_full),
                                   rtol=1e-6, atol=1e-7)

    cfg_s = cfg.replace(capped_sub_len=256)   # far below the kept count
    _, rho_s, aux_s = pallas_step_t.compute_step_quantities(cfg_s, state)
    assert int(aux_s.truncated_ranges) > 0, "overflow must be counted"
    assert np.isfinite(np.asarray(rho_s)).all()


def test_capped_rejected_outside_sublane_layout():
    cfg, state = _dense_scene(capped_candidates=8)
    from smoothed_particle_hydrodynamics_tpu.ops import pallas_step

    with pytest.raises(ValueError):
        pallas_step.compute_step_quantities(
            cfg.replace(pallas_layout="lane", pallas_window=512), state)


def test_derive_window_shrinks_under_cap():
    cfg, state = _dense_scene()
    w_full = pallas_step_t.derive_window_t(cfg, state)
    w_capped = pallas_step_t.derive_window_t(
        cfg.replace(capped_candidates=4), state)
    assert w_capped < w_full, (w_capped, w_full)


def test_capped_rejected_by_exact_backends():
    """Backends that cannot subsample must REFUSE a capped config rather
    than silently running exact physics under a dial the user set."""
    from smoothed_particle_hydrodynamics_tpu.ops.step import compute_forces

    cfg, state = _dense_scene(capped_candidates=8)
    for backend in ("celllist", "pairwise"):
        with pytest.raises(ValueError, match="capped_candidates"):
            compute_forces(cfg, state, backend=backend)


def test_capped_requires_f32_exact_row_ids():
    """Self-exclusion carries source row ids in f32 lanes: configs beyond
    2^24 particles must be rejected up front, not silently corrupted."""
    cfg, _ = _dense_scene(capped_candidates=4)
    big = cfg.replace(num_particles=(1 << 24) + 128)
    with pytest.raises(ValueError, match="2\\^24"):
        pallas_step_t._validate(big)


def _acceptance_run(scene: str, steps: int, **kw):
    """(exact_diags, capped_diags, exact_state, capped_state) over a long
    lazy run; both through the production lazy driver (scan-blocked)."""
    from smoothed_particle_hydrodynamics_tpu.ops.lazy import drive_loop_lazy

    cfg, state = make_scene(scene, **kw)
    cfg_c = cfg.replace(capped_candidates=4)
    s_e, d_e = drive_loop_lazy(cfg, state, steps, scan_block=50)
    s_c, d_c = drive_loop_lazy(cfg_c, state, steps, scan_block=50)
    return d_e, d_c, s_e, s_c


def _drift(diags) -> float:
    tot = (np.asarray(diags.kinetic_energy)
           + np.asarray(diags.potential_energy))
    return abs(float(tot[-1]) - float(tot[0])) / max(abs(float(tot[0])), 1e-30)


def _same_state_density_ratio(cfg, state) -> float:
    """Capped-vs-exact density MEAN ratio evaluated on the SAME state.

    This isolates instantaneous sampling bias from trajectory chaos: along
    diverged 500-step trajectories bulk statistics wander a few percent for
    physical reasons (measured: ratio 0.997 / 1.013 / 0.972 at steps
    1/50/200 on the small splash), which would mask a real reweighting bug.
    """
    cfg_c = cfg.replace(capped_candidates=4)
    _, rho_c, _ = pallas_step_t.compute_step_quantities(cfg_c, state)
    _, rho_e, _ = pallas_step_t.compute_step_quantities(
        cfg.replace(capped_candidates=0), state)
    return float(np.asarray(rho_c).mean() / np.asarray(rho_e).mean())


def _tail_mean(x, frac: float = 0.2) -> float:
    arr = np.asarray(x)
    return float(arr[-max(int(len(arr) * frac), 1):].mean())


def test_capped_physics_acceptance_splash():
    """Regression gate for the capped sampling physics (VERDICT r3 #7): a
    multi-hundred-step splash, capped K_c=4 reweighted vs exact.  Per-particle
    noise (rel-L2 ~0.3-0.4, docs/PERFORMANCE.md r3 #9) is expected; BIAS is
    not: (a) on the SAME state, capped density mean within 1% of exact;
    (b) along the capped trajectory, bulk energy stays finite and inside a
    stated envelope of the exact run's (time-averaged, so f32 chaos on a
    4k-particle box does not flake the gate).  A kernel change that skews
    the subsample (broken reweighting / hash selection) fails (a) at once
    and (b) soon after.  150 steps: systematic sampling bias compounds from
    step one (the same-state gate (a) catches it immediately, and the KE
    tail integrates it), while 500-step interpret-mode trajectories cost
    ~10 CPU-minutes each — this gate must stay cheap enough to run in every
    suite invocation."""
    steps = 150
    d_e, d_c, s_e, s_c = _acceptance_run(
        "splash", steps, num_particles=4096, grid_nx=16, grid_ny=16,
        grid_nz=16, pallas_interpret=True, pallas_window_t=96,
        cell_size_factor=1.25)
    # the cap must actually bind, or this test asserts nothing
    nm_e = float(np.asarray(d_e.neighbor_mean)[-1])
    nm_c = float(np.asarray(d_c.neighbor_mean)[-1])
    assert nm_c < 0.85 * nm_e, (nm_c, nm_e)
    # (a) same-state unbiasedness, at t=0 and at the evolved exact state
    cfg, state0 = make_scene(
        "splash", num_particles=4096, grid_nx=16, grid_ny=16, grid_nz=16,
        pallas_interpret=True, pallas_window_t=96, cell_size_factor=1.25)
    for st in (state0, s_e):
        ratio = _same_state_density_ratio(cfg, st)
        assert 0.99 < ratio < 1.01, f"capped density biased: {ratio}"
    # (b) trajectory envelope: finite, tail-averaged KE within 25%, total
    # energy drift within 2x exact + 10% absolute
    ke_c = np.asarray(d_c.kinetic_energy)
    assert np.isfinite(ke_c).all()
    tail_ratio = _tail_mean(d_c.kinetic_energy) / _tail_mean(d_e.kinetic_energy)
    assert 0.75 < tail_ratio < 1.25, f"capped KE envelope: {tail_ratio}"
    assert _drift(d_c) < 2.0 * _drift(d_e) + 0.10, (_drift(d_c), _drift(d_e))


def test_capped_physics_acceptance_disk():
    """Same gate on the reference's own scene: the rotating disk carries
    angular momentum, so |L| conservation is the extra invariant the splash
    cannot test (the reference logs |L| every step,
    /root/reference/src/sph.cpp:176-177)."""
    steps = 500
    # 2h cells (csf 2.0) so the disk's center is dense enough for K_c=4 to
    # bind, like the reference's own 2h grid (/root/reference/src/sph.cpp:64)
    kw = dict(num_particles=8192, pallas_interpret=True,
              pallas_window_t=96, cell_size_factor=2.0)
    d_e, d_c, s_e, s_c = _acceptance_run("disk", steps, **kw)
    nm_e = float(np.asarray(d_e.neighbor_mean)[-1])
    nm_c = float(np.asarray(d_c.neighbor_mean)[-1])
    assert nm_c < 0.85 * nm_e, (nm_c, nm_e)
    cfg, state0 = make_scene("disk", **kw)
    # wider envelope than the splash: the ratio's scatter scales with the
    # number of cells where the cap BINDS (one kept-set realization per
    # cell, errors correlated within a neighborhood) — the dilute disk has
    # ~10^3 binding cells vs the splash lattice's ~4x more, so ~2x the
    # scatter (measured 1.000 at 1M where millions of cells bind,
    # docs/PERFORMANCE.md r3 #9)
    for st in (state0, s_e):
        ratio = _same_state_density_ratio(cfg, st)
        assert 0.98 < ratio < 1.02, f"capped density biased: {ratio}"
    # |L| drift over the run, capped vs exact: the conservation envelope
    l_e = np.asarray(d_e.angular_momentum)
    l_c = np.asarray(d_c.angular_momentum)
    assert np.isfinite(l_c).all()
    drift_e = abs(float(l_e[-1]) - float(l_e[0])) / abs(float(l_e[0]))
    drift_c = abs(float(l_c[-1]) - float(l_c[0])) / abs(float(l_c[0]))
    assert drift_c < 2.0 * drift_e + 0.02, (drift_c, drift_e)
    tail_ratio = _tail_mean(d_c.kinetic_energy) / _tail_mean(d_e.kinetic_energy)
    assert 0.75 < tail_ratio < 1.25, f"capped KE envelope: {tail_ratio}"


def test_lazy_bench_rejects_non_pallas_backend():
    """run_benchmark(lazy=True) always drives the pallas kernels; labeling
    the row with another backend name would record an engine that never
    ran."""
    from smoothed_particle_hydrodynamics_tpu.utils.benchmark import (
        run_benchmark)

    with pytest.raises(ValueError, match="lazy"):
        run_benchmark(scene="dam_break", backend="celllist", steps=1,
                      warmup=1, lazy=True)


def test_fullrun_artifact_envelopes():
    """The FULL-duration capped acceptance record (VERDICT r4 missing #4).

    tools/capped_fullrun.py runs the reference workload (32k disk x 1001
    steps, /root/reference/src/sph.cpp:71,171) and the north-star workload
    (1M splash x 1000 steps) on real hardware, exact vs capped-K4-reweighted,
    and commits docs/capped_fullrun.json.  This gate asserts the COMMITTED
    artifact's envelopes, so regenerating it after a physics regression
    fails CI instead of silently shipping a worse record.  (The trajectory
    envelopes themselves are the small-n gates above; this test pins the
    full-run record.)"""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "capped_fullrun.json")
    if not os.path.exists(path):
        pytest.skip("docs/capped_fullrun.json not generated yet")
    art = json.load(open(path))
    assert art.get("steps_scale", 1.0) >= 1.0, "artifact is a smoke run"
    # Per-row envelopes at the MEASURED r5 values + regression margin
    # (docs/capped_fullrun.json, TPU v5e).  The two workloads stress the
    # approximation very differently:
    #  * splash_1m (production workload): occupancy stays moderate; K4
    #    reweighting is nearly transparent — KE ratio measured 1.053,
    #    density ratios 0.9995/0.9997.
    #  * disk_32k (reference workload): the disk COLLAPSES to high
    #    occupancy (exact neighbor mean 10.5 at 2h cells by step 1001,
    #    capped 2.6 — the cap binds 4x), so 1001 steps of Monte-Carlo
    #    force noise stochastically heat the disk: KE ratio measured
    #    1.334, energy drift 0.591 vs exact 0.064 (|L| drift still 2.3%).
    #    That heating is the inherent cost of the Subsets approximation on
    #    long dense runs — recorded honestly and pinned here so a regen
    #    that gets WORSE fails; the reference's own Subsets mode is far
    #    noisier still (87% of particles find zero neighbors,
    #    BASELINE.md measured-behavior note).
    env = {
        "disk_32k": {"ke": (0.70, 1.45), "drift_abs": 0.75},
        "splash_1m": {"ke": (0.85, 1.20), "drift_abs": None},
    }
    for name, row in art["rows"].items():
        e = env[name]
        assert row["exact"]["finite"] and row["capped_k4"]["finite"], name
        # same-state density unbiasedness at t=0 and at the evolved state
        # (this is the reweighting-correctness check; it holds at BOTH
        # workloads — the disk's trajectory heating is force noise, not
        # density bias)
        assert 0.97 < row["density_ratio_t0"] < 1.03, (name, row)
        assert 0.97 < row["density_ratio_end"] < 1.03, (name, row)
        # the cap must actually bind, or the row validates nothing
        assert row["cap_binds"], name
        assert e["ke"][0] < row["ke_tail_ratio"] < e["ke"][1], (name, row)
        if e["drift_abs"] is not None:
            assert row["capped_k4"]["energy_drift"] < e["drift_abs"], (name, row)
        else:
            # splash total energy starts near zero (KE ~ -PE), so relative
            # drift is ill-conditioned; bound capped relative to exact
            assert (row["capped_k4"]["energy_drift"]
                    < 1.5 * row["exact"]["energy_drift"] + 0.10), (name, row)
    # the reference workload row must be present at full duration
    assert "disk_32k" in art["rows"]
    assert art["rows"]["disk_32k"]["steps"] >= 1001
