"""Per-step timing trace of the distributed slab engine (1-device mesh).

Times every step individually (device-synced) and tags the ones where a
rebin fired, so the steady-state cost and the rebin-step cost of the slab
path fall out separately — the split the aggregate bench rows can't show.
Compare against tools/profile_pallas.py (single-chip phases) to locate the
slab machinery's per-step overhead (docs/PERFORMANCE.md round-3 finding 9:
at 10M the slab row ran 950 ms vs 805 single-chip).

Usage: python tools/profile_slab.py [N] [K_c] [csf] [steps] [grid_nz] [scan_block] [--phases]
       (K_c=0 -> exact; grid_nz/scan_block: strong-scaling proxy dials)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.parallel import slabs


def _trace(step, carry, steps, settle, label="", skin=None, k=1):
    """Per-call timing loop (k steps per call); returns (carry, steady_ms,
    rebin_ms) normalized per STEP.  A call is tagged REBIN if any of its k
    steps rebinned."""
    times, rebinned = [], []
    rb_prev = int(np.asarray(carry.rebin_count)[0])
    for i in range(steps):
        t0 = time.perf_counter()
        carry, diag = step(carry)
        np.asarray(carry.count)     # sync
        dt = (time.perf_counter() - t0) * 1000 / k
        rb = int(np.asarray(carry.rebin_count)[0])
        fired = rb > rb_prev
        rb_prev = rb
        times.append(dt)
        rebinned.append(fired)
        if not label:
            note = ""
            if skin:        # post-step drift vs the rebin skin (host-side)
                f = np.asarray(carry.fields)
                pb = np.asarray(carry.pos_bin)
                valid = f[:, 7] >= 0.0
                drift = np.abs(f[:, 0:3] - pb)[valid].max()
                note = f"  drift/skin {drift / skin:5.2f}"
            print(f"  step {settle + i:3d}  {dt:9.3f} ms  "
                  f"{'REBIN' if fired else '     '}{note}")
    t = np.asarray(times)
    m = np.asarray(rebinned)
    steady = float(t[~m].mean()) if (~m).any() else float("nan")
    rebin = float(t[m].mean()) if m.any() else float("nan")
    print(f"{label or 'full step':28s} steady {steady:8.3f} ms  "
          f"rebin {rebin:8.3f} ms  (rebins {int(m.sum())}/{steps})")
    return carry, steady, rebin


def main(n=1_000_000, k_c=4, csf=1.25, steps=24, settle=10, phases=False,
         grid_nz=0, scan_block=0):
    from jax.sharding import Mesh

    ov = dict(num_particles=n, cell_size_factor=csf)
    if grid_nz:
        # slab-proxy geometry (tools/scale_projection.py): n/chip in a
        # grid_nz-plane box == one chip of a 128//grid_nz-chip mesh
        ov["grid_nz"] = grid_nz
    if k_c:
        ov.update(capped_candidates=k_c, pallas_window_t=0)
    cfg, state = make_scene("splash", **ov)
    if cfg.pallas_window_t == 0:
        from smoothed_particle_hydrodynamics_tpu.ops.pallas_step_t import (
            derive_window_t)

        cfg = cfg.replace(pallas_window_t=derive_window_t(cfg, state))
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    zsplit = slabs.derive_zsplit(cfg, state, 1)
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 1,
                                                 zsplit=zsplit, headroom=1.05)
    sub_len = (slabs.derive_sub_len_slab(cfg, state, 1, zsplit)
               if cfg.capped_candidates else None)
    carry = slabs.distribute(cfg, state, mesh, p_cap, zsplit=zsplit)
    step = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                                sweeps="pallas", zsplit=zsplit, donate=True,
                                sub_len=sub_len, scan_block=scan_block)
    print(f"n={n} K_c={k_c} csf={csf} grid_nz={grid_nz} sb={scan_block} "
          f"window_t={cfg.pallas_window_t} "
          f"p_cap={p_cap} h_cap={h_cap} m_cap={m_cap} sub_len={sub_len} "
          f"device={jax.devices()[0]}")

    for _ in range(settle):          # compile + settle into mid-splash
        carry, diag = step(carry)
    np.asarray(carry.count)

    from smoothed_particle_hydrodynamics_tpu.ops.lazy import skin_half

    carry, steady_full, rebin_full = _trace(step, carry, steps, settle,
                                            skin=skin_half(cfg),
                                            k=max(scan_block, 1))

    if not phases:
        return

    # ---- ablation probes: stub out one stage, re-jit, re-trace ------------
    # Each variant runs the REAL step program minus one stage, from the same
    # settled carry (copied), so "full - variant" isolates that stage's cost
    # inside the compiled step (including what XLA would have fused/overlapped
    # — honest attribution needs the subtraction, not standalone timings).
    def stub_dens(cfg_, ext, g8, cid_ext, ws, wc, sub_src, cand_cid_f, w_sub,
                  h_cap_, p_cap_, sub_len_):
        # keep the halo exchange + g8 sub-frame gather live (data deps),
        # drop only the pallas sweep itself
        keep_live = (ext[h_cap_:h_cap_ + p_cap_, 6]
                     + jnp.sum(g8) * jnp.float32(1e-30))
        return (jnp.full((p_cap_,), 1.0, jnp.float32) + keep_live,
                jnp.zeros((p_cap_,), jnp.int32))

    def stub_force(cfg_, ext, g8, cid_ext, rho_e, rho_l, ws, wc, sub_src,
                   cand_cid_f, w_sub, h_cap_, p_cap_, sub_len_):
        # keep the rho halo exchange live via rho_e
        return (jnp.zeros((p_cap_, 3), jnp.float32)
                + (rho_l + jnp.sum(rho_e) * jnp.float32(1e-30))[:, None]
                * jnp.float32(1e-12))

    def stub_kdk(cfg_, st, acc):
        from smoothed_particle_hydrodynamics_tpu.ops.integrate import (
            EnergyTally)

        # freeze motion (drift stays 0 -> no rebins: pure steady floor) and
        # zero the tally; keeps state/tally shapes so everything downstream
        # still runs
        z = jnp.zeros((), jnp.float32)
        keep = st._replace(acceleration=acc)
        return keep, EnergyTally(z + jnp.sum(acc) * 1e-30, z, z,
                                 jnp.zeros((3,), jnp.float32))

    variants = [
        ("no density sweep", {"_pallas_density_local_capped": stub_dens}),
        ("no force sweep", {"_pallas_force_local_capped": stub_force}),
        ("no sweeps at all", {"_pallas_density_local_capped": stub_dens,
                              "_pallas_force_local_capped": stub_force}),
        ("no kdk+tally (frozen motion)", {"kdk_integrate": stub_kdk}),
        ("machinery only (all stubbed)",
         {"_pallas_density_local_capped": stub_dens,
          "_pallas_force_local_capped": stub_force,
          "kdk_integrate": stub_kdk}),
    ]
    for label, patches in variants:
        saved = {k: getattr(slabs, k) for k in patches}
        try:
            for k, v in patches.items():
                setattr(slabs, k, v)
            step_v = slabs.make_slab_step(
                cfg, mesh, p_cap, h_cap, m_cap, sweeps="pallas",
                zsplit=zsplit, donate=True, sub_len=sub_len,
                scan_block=scan_block)
            cv = jax.tree.map(lambda x: x + 0, carry)   # fresh copy
            for _ in range(3):
                cv, _ = step_v(cv)
            np.asarray(cv.count)
            _trace(step_v, cv, max(steps // 2, 8), settle, label=label,
                   k=max(scan_block, 1))
        finally:
            for k, v in saved.items():
                setattr(slabs, k, v)


if __name__ == "__main__":
    a = [x for x in sys.argv[1:] if x != "--phases"]
    main(n=int(a[0]) if len(a) > 0 else 1_000_000,
         k_c=int(a[1]) if len(a) > 1 else 4,
         csf=float(a[2]) if len(a) > 2 else 1.25,
         steps=int(a[3]) if len(a) > 3 else 24,
         grid_nz=int(a[4]) if len(a) > 4 else 0,
         scan_block=int(a[5]) if len(a) > 5 else 0,
         phases="--phases" in sys.argv[1:])
