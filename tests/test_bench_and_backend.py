"""Coverage for the bench parity helper and CLI backend auto-resolution."""

import argparse

import numpy as np

from smoothed_particle_hydrodynamics_tpu.cli import _resolve_backend
from smoothed_particle_hydrodynamics_tpu.utils.benchmark import run_parity_check


def test_run_parity_check_cpu_interpret():
    """The bench parity block must run anywhere (interpreter fallback on CPU)
    and pass against the cell-list oracle."""
    res = run_parity_check(n=1024)
    assert res["interpret"] is True
    assert res["neighbor_counts_equal"]
    assert res["rho_rel_l2"] < 1e-5
    assert res["acc_rel_l2"] < 1e-4
    assert res["pass"]


def _args(**kw):
    ns = argparse.Namespace(backend="auto", compat=False, devices=0)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_resolve_backend_auto_cpu_is_celllist():
    a = _args()
    _resolve_backend(a)
    assert a.backend == "celllist"  # tests force the CPU platform


def test_resolve_backend_compat_and_devices():
    a = _args(compat=True)
    _resolve_backend(a)
    assert a.backend == "compat"
    a = _args(devices=8)
    _resolve_backend(a)
    assert a.backend == "celllist"
    a = _args(backend="pallas")
    _resolve_backend(a)
    assert a.backend == "pallas"  # explicit choice is never overridden


def test_derive_window_t_matches_distribution():
    from smoothed_particle_hydrodynamics_tpu.models import make_scene
    from smoothed_particle_hydrodynamics_tpu.ops.pallas_step_t import derive_window_t

    cfg, state = make_scene("dam_break", num_particles=4096,
                            grid_nx=16, grid_ny=16, grid_nz=16)
    w = derive_window_t(cfg, state)
    assert w % 8 == 0 and w >= 64
    # packed block scene: windows must comfortably exceed one lane block's
    # own extent but stay far below the particle count
    assert w < cfg.num_particles


def test_cli_auto_window(tmp_path, capsys):
    from smoothed_particle_hydrodynamics_tpu.cli import main

    out = str(tmp_path / "outw")
    rc = main(["run", "--scene", "dam_break", "-n", "1024", "--steps", "2",
               "--block", "2", "--out", out, "--backend", "pallas",
               "--set", "pallas_window_t=0", "--set", "pallas_interpret=true",
               "--set", "grid_nx=16", "--set", "grid_ny=16",
               "--set", "grid_nz=16", "--quiet"])
    assert rc == 0
    assert "derived pallas_window_t=" in capsys.readouterr().out


def test_derive_range_slice_dilute_vs_dense():
    from smoothed_particle_hydrodynamics_tpu.models import make_scene
    from smoothed_particle_hydrodynamics_tpu.ops.celllist import derive_range_slice
    from smoothed_particle_hydrodynamics_tpu.ops.step import compute_forces

    cfg, state = make_scene("disk", num_particles=4096)
    rs = derive_range_slice(cfg, state)
    assert rs % 8 == 0 and rs >= 16
    # derived slice must not truncate on the state it was derived from
    cfg2 = cfg.replace(range_slice=rs)
    _, _, aux = compute_forces(cfg2, state, backend="celllist")
    assert int(aux.truncated_ranges) == 0
