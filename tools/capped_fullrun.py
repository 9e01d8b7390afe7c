"""Full-run capped-vs-exact acceptance artifact (VERDICT r4 missing #4).

The r4 acceptance gates run 150-500 steps at 4-8k particles
(tests/test_capped.py); the reference workload is 1001 steps
(/root/reference/src/sph.cpp:71,171).  This tool runs the FULL durations on
real hardware and records the capped-K4-reweighted envelopes against exact:

  * disk 32k x 1001 steps  — the reference's own workload (srand(42) scene,
    2h cells like /root/reference/src/sph.cpp:64), |L| is the key invariant
  * splash 1M x 1000 steps — the north-star throughput workload

Per run it records the energy drift, |L| drift, KE tail ratio, neighbor-mean
binding check, and same-state density mean ratios at the start and end
states.  Written to docs/capped_fullrun.json row by row (a wall-clock cutoff
keeps completed rows); tests/test_capped.py::test_fullrun_artifact_envelopes
asserts the committed artifact's envelopes so a regenerate-and-regress shows
up in CI.

Usage: python tools/capped_fullrun.py [--rows disk_32k,splash_1m] [--steps-scale 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _tail_mean(x, frac: float = 0.2) -> float:
    arr = np.asarray(x, dtype=np.float64)
    return float(arr[-max(int(len(arr) * frac), 1):].mean())


def _drift(ke, pe) -> float:
    tot = np.asarray(ke, np.float64) + np.asarray(pe, np.float64)
    return abs(float(tot[-1]) - float(tot[0])) / max(abs(float(tot[0])), 1e-30)


def _same_state_density_ratio(cfg, state) -> float:
    from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t

    _, rho_c, _ = pallas_step_t.compute_step_quantities(
        cfg.replace(capped_candidates=4), state)
    _, rho_e, _ = pallas_step_t.compute_step_quantities(
        cfg.replace(capped_candidates=0), state)
    return float(np.asarray(rho_c, np.float64).mean()
                 / np.asarray(rho_e, np.float64).mean())


def run_pair(scene: str, steps: int, scan_block: int, **kw) -> dict:
    """One exact + one capped-K4 full run through the production driver."""
    from smoothed_particle_hydrodynamics_tpu.models import make_scene
    from smoothed_particle_hydrodynamics_tpu.ops.lazy import drive_loop_lazy

    cfg, state0 = make_scene(scene, **kw)
    out = {"scene": scene, "steps": steps,
           "num_particles": kw.get("num_particles"),
           "overrides": {k: v for k, v in kw.items() if k != "num_particles"}}
    runs = {}
    for name, cfg_r in (("exact", cfg),
                        ("capped_k4", cfg.replace(capped_candidates=4))):
        t0 = time.perf_counter()
        s_end, d = drive_loop_lazy(cfg_r, state0, steps,
                                   scan_block=scan_block)
        wall = time.perf_counter() - t0
        ke = np.asarray(d.kinetic_energy, np.float64)
        pe = np.asarray(d.potential_energy, np.float64)
        ll = np.asarray(d.angular_momentum, np.float64)
        nm = np.asarray(d.neighbor_mean, np.float64)
        runs[name] = {
            "wall_s": wall, "ms_per_step": wall * 1e3 / steps,
            "finite": bool(np.isfinite(ke).all() and np.isfinite(ll).all()),
            "energy_drift": _drift(ke, pe),
            "ke_tail_mean": _tail_mean(ke),
            "l_drift": (abs(float(ll[-1]) - float(ll[0]))
                        / max(abs(float(ll[0])), 1e-30)),
            "neighbor_mean_last": float(nm[-1]),
            "state_end": s_end,
        }
        print(f"  {scene} {name}: {wall:.1f}s "
              f"({runs[name]['ms_per_step']:.1f} ms/step) "
              f"drift {runs[name]['energy_drift']:.4f} "
              f"|L| drift {runs[name]['l_drift']:.5f}", flush=True)
    e, c = runs["exact"], runs["capped_k4"]
    out["exact"] = {k: v for k, v in e.items() if k != "state_end"}
    out["capped_k4"] = {k: v for k, v in c.items() if k != "state_end"}
    out["ke_tail_ratio"] = c["ke_tail_mean"] / max(e["ke_tail_mean"], 1e-30)
    out["cap_binds"] = c["neighbor_mean_last"] < 0.85 * e["neighbor_mean_last"]
    # same-state unbiasedness at the initial and the evolved-exact state:
    # isolates sampling bias from trajectory chaos (tests/test_capped.py)
    out["density_ratio_t0"] = _same_state_density_ratio(cfg, state0)
    out["density_ratio_end"] = _same_state_density_ratio(cfg, e["state_end"])
    return out


ROWS = {
    # the reference workload: 32k disk, 1001 steps, 2h cells
    # (/root/reference/src/sph.cpp:59,64,71)
    "disk_32k": lambda scale: run_pair(
        "disk", max(int(1001 * scale), 2), scan_block=50,
        num_particles=32768, cell_size_factor=2.0),
    # the north-star workload: 1M splash, 1000 steps, production cell dial
    "splash_1m": lambda scale: run_pair(
        "splash", max(int(1000 * scale), 2), scan_block=25,
        num_particles=1_000_000, cell_size_factor=1.25),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="disk_32k,splash_1m")
    ap.add_argument("--steps-scale", type=float, default=1.0,
                    help="scale the step counts (smoke runs)")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "capped_fullrun.json"))
    args = ap.parse_args()

    import jax

    results = {"device": str(jax.devices()[0]),
               "steps_scale": args.steps_scale, "rows": {}}
    for row in args.rows.split(","):
        print(f"running {row} ...", flush=True)
        results["rows"][row] = ROWS[row](args.steps_scale)
        with open(args.out, "w") as f:   # write-as-you-go
            json.dump(results, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
