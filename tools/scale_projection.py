"""Strong-scaling projection: measured per-chip slab constants at N/D loads.

A D-chip slab run gives each chip a z-slab of the full scene: ~N/D
particles with the FULL pool depth over 1/D of the z-extent.  The proxy
therefore runs the 1-device-mesh slab engine on n = N/D particles in a
``grid_nz = nz/D``-plane box — same footprint-per-plane, same occupancy and
window structure, and (with the engine's plane-local window tables) the
same table-build cost as one device of the real mesh.  The halo/migration
machinery executes (self-permute) with the same code path.  What the proxy
omits is the ICI hop itself and cross-device imbalance (bounded separately
by derive_zsplit's plane granularity, docs/PERFORMANCE.md round-3).  The
hop is therefore MODELED into every row (``ici_cost_ms``): measured caps ->
exact collective bytes -> time at the cited v5e link bandwidth, recorded as
``halo_bytes_per_step`` / ``migration_bytes_per_rebin`` /
``ms_per_step_with_ici`` / ``projected_pps_xD_with_ici`` columns.

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

# --- ICI cost model (VERDICT r4 missing #3: the hop must be IN the rows) ---
# v5e ICI one-way bandwidth per link: 4.5e10 B/s (public "How to Scale Your
# Model" hardware table, jax-ml.github.io/scaling-book — v5e 2D torus,
# 45 GB/s/link each direction).  Per-collective launch latency ~1 us.
ICI_BW = 4.5e10            # bytes/s, one-way per link
ICI_LAT = 1e-6             # seconds per collective launch
_NCOLS = 8                 # slabs.py fields row: pos3 + vel3 + mass + oid
F32 = 4


def ici_cost_ms(h_cap: int, m_cap: int, rebins: int, steps: int) -> dict:
    """Modeled per-step ICI time for the slab engine's collectives.

    Per step, each device ppermutes to each z-neighbor: its h_cap-row edge
    window of fields ([h_cap, 8] f32), the window's cell ids ([h_cap] i32)
    and, before the force sweep, the halo densities ([h_cap] f32) — 40 bytes
    per halo row per direction.  At rebins, each routing hop moves up to
    m_cap fields rows per direction (32 B/row); amortized over the rebin
    cadence.  The up/down sends ride DIFFERENT torus links and could overlap;
    the model SERIALIZES them (upper bound).  Six ppermutes + the stacked
    diagnostics psum/pmax ~ 8 collective launches per step.
    """
    halo_bytes_dir = h_cap * (_NCOLS + 1 + 1) * F32      # fields + cid + rho
    mig_bytes_dir = m_cap * _NCOLS * F32                  # per hop
    per_step = 2 * halo_bytes_dir / ICI_BW + 8 * ICI_LAT
    per_rebin = 2 * mig_bytes_dir / ICI_BW + 2 * ICI_LAT  # ~1 hop typical
    amort = per_rebin * (rebins / steps if steps else 0.0)
    return {
        "halo_bytes_per_step": 2 * halo_bytes_dir,
        "migration_bytes_per_rebin": 2 * mig_bytes_dir,
        "ici_ms_per_step": (per_step + amort) * 1e3,
    }


def run_row(row: str, n: int, grid_nz: int = 0,
            timeout: int = 1800, scan_block: int = 0,
            ovs: list[str] | None = None) -> dict | None:
    # >= 3 timed calls per row at any scan_block (run_slab_benchmark runs
    # steps//k calls; bench rows measure steps//3)
    steps = max(9 * scan_block, 50)
    cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--row", row,
           "-n", str(n), "--scene", "splash", "--steps", str(steps),
           "--warmup", "5", "--slab-sweeps", "pallas",
           "--grid-nz", str(grid_nz), "--scan-block", str(scan_block)]
    for kv in ovs or []:
        cmd += ["--ov", kv]
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
    ap.add_argument("--append", action="store_true",
                    help="keep rows already in --out (per-size row lists "
                         "differ, so the artifact is built in passes)")
    args = ap.parse_args()
    # a row spec is "name" or "name:k=v:k=v" — the k=v tail is forwarded as
    # bench.py --ov dial overrides and recorded in the row (e.g. the capped
    # cell-size ladder: "slab_capped_k4:cell_size_factor=2.5" buys ~20%
    # step time for 3.3x the sampling noise, PERFORMANCE.md #35-36)
    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    for spec in args.rows.split(","):
        name, *ovs = spec.split(":")
        # "scan_block=K" in a spec overrides the per-size dispatch policy
        # (e.g. the fused b512 ladder rows measured best at sb64)
        sb_ov = [o for o in ovs if o.startswith("scan_block=")]
        ovs = [o for o in ovs if not o.startswith("scan_block=")]
        rows.append((name, ovs, int(sb_ov[-1].split("=")[1]) if sb_ov else 0))
    d = args.chips

    # measured capped-noise ladder at 1M (rel-L2 of capped-K4-reweighted
    # density vs the exact oracle on the same state; mean stays unbiased):
    # docs/PERFORMANCE.md #36/#41, docs/noise_ladder_r5.log
    NOISE = {1.25: 0.36, 2.0: 0.758, 2.5: 1.204, 4.0: 2.55, 5.0: 3.52,
             6.0: 4.17}

    # slab-proxy geometry: each chip of a D-mesh owns nz/D planes of the
    # full 128-plane splash box (grid_nz must stay >= 2 and divide evenly)
    grid_nz = 128 // d if 128 % d == 0 and 128 // d >= 2 else 0

    results = []
    if args.append and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)["rows"]
    for n in sizes:
        for row, ovs, sb_spec in rows:
            # dispatch amortization: the slab step pays a ~24 ms/call
            # overhead on the axon tunnel (docs/ab_slab125_sb.log: sb8 8.1 ->
            # sb16 6.5 -> sb32 5.7 ms/step at 125k/chip; the non-slab lazy
            # driver pipelines dispatches and shows NO sb effect at 1M).
            # Larger K amortizes it; rebins stay in-graph so physics cadence
            # is unchanged (slabs.py scan body).
            scan_block = sb_spec or (
                32 if n <= 250_000 else (16 if n <= 500_000 else 8))
            label = row + ("".join("+" + o for o in ovs) if ovs else "")
            print(f"measuring {label} @ n/chip={n} grid_nz={grid_nz} "
                  f"scan_block={scan_block} ...", flush=True)
            r = run_row(row, n, grid_nz, scan_block=scan_block, ovs=ovs)
            if r is None:
                continue
            ms = r["ms_per_step"]
            csf = next((float(o.split("=")[1]) for o in ovs
                        if o.startswith("cell_size_factor=")),
                       1.25 if "capped" in row else None)
            rec = {"row": label, "n_per_chip": n, "grid_nz": grid_nz,
                   "scan_block": scan_block,
                   **({"noise_rel_l2_1m": NOISE[csf]}
                      if csf in NOISE and "capped" in row else {}),
                   "ms_per_step": ms,
                   "pps_per_chip": n / ms * 1e3,
                   "aggregate_n": n * d,
                   "projected_pps_x%d" % d: n * d / ms * 1e3,
                   "rebins": r.get("rebins"),
                   "migration_dropped": r.get("migration_dropped"),
                   "halo_dropped": r.get("halo_dropped")}
            # modeled ICI term (the one cost the 1-device proxy cannot pay):
            # measured caps -> bytes -> time at the cited v5e link bandwidth
            if r.get("h_cap"):
                ici = ici_cost_ms(r["h_cap"], r.get("m_cap", r["h_cap"]),
                                  r.get("rebins") or 0, r.get("steps") or 1)
                rec.update(h_cap=r["h_cap"], m_cap=r.get("m_cap"), **ici)
                ms_ici = ms + ici["ici_ms_per_step"]
                rec["ms_per_step_with_ici"] = ms_ici
                rec["projected_pps_x%d_with_ici" % d] = n * d / ms_ici * 1e3
            results.append(rec)
            print("  " + json.dumps(rec), flush=True)
            # write-as-you-go: a wall-clock cutoff keeps the completed rows
            with open(args.out, "w") as f:
                json.dump({"chips": d, "rows": results}, f, indent=1)
    print(f"\nwrote {args.out}\n")

    key = "projected_pps_x%d" % d
    key_ici = key + "_with_ici"
    print(f"| mode | n/chip | ms/step | pps/chip | {d}-chip aggregate N "
          f"| projected {d}-chip pps | with ICI |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        ici = f"**{r[key_ici]:.3g}**" if key_ici in r else "—"
        print(f"| {r['row']} | {r['n_per_chip']:,} | {r['ms_per_step']:.1f} "
              f"| {r['pps_per_chip']:.3g} | {r['aggregate_n']:,} "
              f"| **{r[key]:.3g}** | {ici} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
