"""Does the lazy step's rebin lax.cond cost real time on frozen steps?

The whole LazyCarry (~75 MB at 1M capped: state fields, frozen tables, sub
frame) flows through ``jax.lax.cond(need, rebuild, keep, carry)`` every
step.  If XLA materializes fresh buffers for the cond outputs, every frozen
step pays a full carry copy it does not need.  This probe interleaves (ABAB,
same process, same settled carry — tunnel drift hits both variants equally,
docs/PERFORMANCE.md r3 #22):

  A. the production ``lazy_step`` (cond included), pinned to frozen steps
     (pos_bin reset each call so drift never triggers),
  B. a hand-inlined FROZEN step: identical sweeps + kdk + diagnostics, no
     cond, no rebuild branch in the program at all,
  C. variant B with the sweeps stubbed — the true per-step machinery floor
     (sub-frame gathers, drift reduce, dispatch, buffer moves).

Usage: python tools/probe_cond.py [N] [K_c] [rounds]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy
from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst
from smoothed_particle_hydrodynamics_tpu.ops.integrate import kdk_integrate
from smoothed_particle_hydrodynamics_tpu.state import make_step_diagnostics


def frozen_step(cfg, carry):
    """lazy_step with the cond removed: always the frozen path."""
    p = pst.PreparedT(order=carry.order, pos_s=carry.state.position,
                      vel_s=carry.state.velocity, mass_s=carry.state.mass,
                      cid_f=carry.cid_f, ws=carry.ws, wc=carry.wc,
                      ref=carry.ref, sub_perm=carry.sub_perm,
                      cand_cid_f=carry.cand_cid_f, wm_sub=carry.wm_sub,
                      sub_dropped=carry.sub_dropped)
    acc_s, rho_s, ncount_s = pst.sweeps_sorted(cfg, p)
    state = carry.state._replace(density=rho_s, neighbor_count=ncount_s)
    new_state, tally = kdk_integrate(cfg, state, acc_s)
    diag = make_step_diagnostics(
        tally, ncount_s, overflow_cells=jnp.zeros((), jnp.int32),
        truncated_ranges=(carry.sub_dropped if carry.sub_dropped is not None
                          else jnp.zeros((), jnp.int32)))
    return carry._replace(state=new_state,
                          steps_since=carry.steps_since + 1), diag


def frozen_step_nosweeps(cfg, carry):
    nrows = carry.state.position.shape[0]
    live = jnp.sum(carry.state.position[:, 0]) * jnp.float32(1e-30)
    acc_s = jnp.zeros((nrows, 3), jnp.float32) + live
    rho_s = jnp.full((nrows,), 1.0, jnp.float32)
    ncount_s = jnp.zeros((nrows,), jnp.int32)
    state = carry.state._replace(density=rho_s, neighbor_count=ncount_s)
    new_state, tally = kdk_integrate(cfg, state, acc_s)
    diag = make_step_diagnostics(
        tally, ncount_s, overflow_cells=jnp.zeros((), jnp.int32),
        truncated_ranges=jnp.zeros((), jnp.int32))
    return carry._replace(state=new_state,
                          steps_since=carry.steps_since + 1), diag


def pin_frozen(carry):
    """Reset pos_bin to current positions so the drift check never fires."""
    return carry._replace(pos_bin=carry.state.position)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_c = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    block = 10
    cfg, state = make_scene("splash", num_particles=n, cell_size_factor=1.25)
    if k_c:
        cfg = cfg.replace(capped_candidates=k_c, pallas_window_t=0)
        cfg = cfg.replace(capped_sub_len=pst.derive_sub_len(cfg, state))
    cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
    print(f"n={n} K_c={k_c} window_t={cfg.pallas_window_t} "
          f"device={jax.devices()[0]}", flush=True)

    carry, _ = lazy.drive_loop_lazy(cfg, state, 10, collect_diags=False,
                                    keep_carry=True)

    variants = {
        "A cond (production)": jax.jit(partial(lazy.lazy_step, cfg)),
        "B no-cond frozen": jax.jit(partial(frozen_step, cfg)),
        "C no-cond no-sweeps": jax.jit(partial(frozen_step_nosweeps, cfg)),
    }
    # NB: no donation — both variants un-donated so the comparison is fair
    # and the settled carry can be reused across variants.
    for name, f in variants.items():  # compile
        out, _ = f(pin_frozen(carry))
        np.asarray(out.state.position[:1, :1])

    meds = {name: [] for name in variants}
    for r in range(rounds):
        for name, f in variants.items():
            c = pin_frozen(carry)
            t0 = time.perf_counter()
            for _ in range(block):
                c, _ = f(pin_frozen(c))
            np.asarray(c.state.position[:1, :1])
            dt = (time.perf_counter() - t0) / block * 1000
            meds[name].append(dt)
            print(f"round {r} {name:22s} {dt:8.3f} ms", flush=True)
    print()
    for name, ts in meds.items():
        print(f"{name:22s} median {np.median(ts):8.3f} ms")


if __name__ == "__main__":
    main()
