"""Strong-scaling projection: measured per-chip slab constants at N/D loads.

A D-chip slab run gives each chip a z-slab of the full scene: ~N/D
particles with the FULL pool depth over 1/D of the z-extent.  The proxy
therefore runs the 1-device-mesh slab engine on n = N/D particles in a
``grid_nz = nz/D``-plane box — same footprint-per-plane, same occupancy and
window structure, and (with the engine's plane-local window tables) the
same table-build cost as one device of the real mesh.  The halo/migration
machinery executes (self-permute) with the same code path.  What the proxy
omits is only the ICI hop itself (~0.5 MB of halo rows per step, tens of
microseconds on v5e ICI) and cross-device imbalance (bounded separately by
derive_zsplit's plane granularity, docs/PERFORMANCE.md round-3).

(The first projection instead ran n/D in the FULL 128-plane box: at 125k
that degenerates to a ~2-particle-layer sheet — derived window 504 vs 64,
sub frame 0.63N — and read ~3x pessimistic; superseded, see
docs/PERFORMANCE.md round-3 session 6.)

Each measurement runs in a FRESH subprocess via ``bench.py --row`` —
in-process sequences of large benchmarks contaminate each other by 10-15%
on this stack (docs/PERFORMANCE.md finding 7).

Usage: python tools/scale_projection.py [--sizes 125000,250000,...] [--chips 8]
Writes docs/scale_projection.json and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_row(row: str, n: int, grid_nz: int = 0,
            timeout: int = 1800, scan_block: int = 0) -> dict | None:
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--row", row,
           "-n", str(n), "--scene", "splash", "--steps", "50",
           "--warmup", "5", "--slab-sweeps", "pallas",
           "--grid-nz", str(grid_nz), "--scan-block", str(scan_block)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout, cwd=REPO)
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001 - record the failure, keep going
        print(f"  ROW FAILED {row} n={n}: {e}", flush=True)
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="125000,250000,500000,1000000,1250000")
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--rows", default="slab_1dev,slab_capped_k4")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "scale_projection.json"))
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = args.rows.split(",")
    d = args.chips

    # slab-proxy geometry: each chip of a D-mesh owns nz/D planes of the
    # full 128-plane splash box (grid_nz must stay >= 2 and divide evenly)
    grid_nz = 128 // d if 128 % d == 0 and 128 // d >= 2 else 0

    results = []
    for n in sizes:
        for row in rows:
            # dispatch amortization where the per-call floor dominates the
            # small device step (~2.4 ms/call, docs/PERFORMANCE.md r3 #12)
            scan_block = 8 if n <= 250_000 else (4 if n <= 500_000 else 0)
            print(f"measuring {row} @ n/chip={n} grid_nz={grid_nz} "
                  f"scan_block={scan_block} ...", flush=True)
            r = run_row(row, n, grid_nz, scan_block=scan_block)
            if r is None:
                continue
            ms = r["ms_per_step"]
            rec = {"row": row, "n_per_chip": n, "grid_nz": grid_nz,
                   "scan_block": scan_block,
                   "ms_per_step": ms,
                   "pps_per_chip": n / ms * 1e3,
                   "aggregate_n": n * d,
                   "projected_pps_x%d" % d: n * d / ms * 1e3,
                   "rebins": r.get("rebins"),
                   "migration_dropped": r.get("migration_dropped"),
                   "halo_dropped": r.get("halo_dropped")}
            results.append(rec)
            print("  " + json.dumps(rec), flush=True)
            # write-as-you-go: a wall-clock cutoff keeps the completed rows
            with open(args.out, "w") as f:
                json.dump({"chips": d, "rows": results}, f, indent=1)
    print(f"\nwrote {args.out}\n")

    key = "projected_pps_x%d" % d
    print(f"| mode | n/chip | ms/step | pps/chip | {d}-chip aggregate N "
          f"| projected {d}-chip pps |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['row']} | {r['n_per_chip']:,} | {r['ms_per_step']:.1f} "
              f"| {r['pps_per_chip']:.3g} | {r['aggregate_n']:,} "
              f"| **{r[key]:.3g}** |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
