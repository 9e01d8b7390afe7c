"""Throughput benchmark harness.

Measures steady-state particle-steps/sec of the jitted scanned step on the
current default device, after warmup, with ``block_until_ready`` fencing.
The headline metric matches BASELINE.md: particle-steps/sec/chip, target
>= 1e9 at 1M particles on a TPU v5e chip.
"""

from __future__ import annotations

import time

import jax

from ..models import make_scene


def _sync(tree) -> None:
    """True device fence (block_until_ready is a no-op on the axon tunnel)."""
    import jax.numpy as jnp
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        np.asarray(jnp.ravel(leaf)[:1])


def run_benchmark(scene: str = "disk", backend: str = "celllist",
                  steps: int = 100, warmup: int = 10,
                  overrides: dict | None = None, lazy: bool = False) -> dict:
    from ..ops.step import drive_loop

    if lazy and backend != "pallas":
        # the lazy driver always runs the sublane pallas kernels; accepting
        # another backend name here would record a row labeled with an
        # engine that never executed
        raise ValueError(f"lazy=True benchmarks the pallas backend; got "
                         f"backend={backend!r} (drop --lazy or use "
                         f"--backend pallas)")
    cfg, state = make_scene(scene, **(overrides or {}))
    if backend == "pallas" and cfg.pallas_window_t == 0:
        # 0 = auto, resolved from this scene's actual rod-window lengths
        # (capped-aware), same as the CLI
        from ..ops.pallas_step_t import derive_window_t

        cfg = cfg.replace(pallas_window_t=derive_window_t(cfg, state))
    if (backend == "pallas" and cfg.capped_candidates
            and cfg.capped_sub_len == 0):
        from ..ops.pallas_step_t import derive_sub_len

        cfg = cfg.replace(capped_sub_len=derive_sub_len(cfg, state))

    if lazy:
        from ..ops.lazy import drive_loop_lazy

        def advance(st_or_carry, n, first=False):
            return drive_loop_lazy(cfg, st_or_carry if first else None, n,
                                   collect_diags=False, keep_carry=True,
                                   carry=None if first else st_or_carry)[0]
    else:
        def advance(st, n, first=False):
            return drive_loop(cfg, st, n, backend=backend,
                              collect_diags=False)[0]

    # Warmup: compile + a few steps.
    t0 = time.perf_counter()
    state = advance(state, max(warmup, 1), first=True)
    _sync(state)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state = advance(state, steps)
    _sync(state)
    elapsed = time.perf_counter() - t0

    n = cfg.num_particles
    pps = n * steps / elapsed
    device = jax.devices()[0]
    return {
        "metric": "particle-steps/sec/chip",
        "value": pps,
        "unit": "particle-steps/s",
        "scene": scene,
        "backend": backend,
        "lazy": lazy,
        "num_particles": n,
        "steps": steps,
        "ms_per_step": elapsed * 1000.0 / steps,
        "warmup_s": compile_s,
        "device": str(device),
        "platform": device.platform,
    }


def run_slab_benchmark(n: int = 1_000_000, steps: int = 15, warmup: int = 3,
                       sweeps: str = "pallas", headroom: float = 1.05,
                       overrides: dict | None = None,
                       scan_block: int = 0) -> dict:
    """Distributed slab engine on a 1-device mesh of the CURRENT chip.

    Measures the per-chip step-time constant of the production distributed
    path (local sort + frozen windows + halo/migration machinery with inert
    chain ends) so the multi-chip scale-out claim has a measured per-chip
    datum: D-chip throughput ~= D * (1e3 / ms_per_step) * n (minus halo
    growth, which the 8-CPU dryrun exercises functionally).

    ``scan_block=K`` dispatches K steps per jit call (``lax.scan``) — the
    dispatch-amortization dial for small per-chip loads (strong scaling).
    """
    import numpy as np
    from jax.sharding import Mesh

    from ..parallel import slabs

    ov = dict(num_particles=n, cell_size_factor=1.25)
    ov.update(overrides or {})
    cfg, state = make_scene("splash", **ov)
    if cfg.pallas_window_t == 0 or "pallas_window_t" not in ov:
        from ..ops.pallas_step_t import derive_window_t

        cfg = cfg.replace(pallas_window_t=derive_window_t(cfg, state))
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    zsplit = slabs.derive_zsplit(cfg, state, 1)
    # tight headroom: p_cap directly sets swept block count (dead blocks
    # still ride the grid); real multi-device runs keep caps fresh via
    # maybe_rebalance, so the per-chip constant is measured at working caps
    p_cap, h_cap, m_cap = slabs.derive_slab_caps(cfg, state, 1, zsplit=zsplit,
                                                 headroom=headroom)
    sub_len = (slabs.derive_sub_len_slab(cfg, state, 1, zsplit)
               if cfg.capped_candidates else None)
    carry = slabs.distribute(cfg, state, mesh, p_cap, zsplit=zsplit)
    step = slabs.make_slab_step(cfg, mesh, p_cap, h_cap, m_cap,
                                sweeps=sweeps, zsplit=zsplit, donate=True,
                                sub_len=sub_len, scan_block=scan_block)
    k = max(scan_block, 1)

    t0 = time.perf_counter()
    for _ in range(max(-(-warmup // k), 1)):
        carry, diag = step(carry)
    _sync(carry.fields)
    compile_s = time.perf_counter() - t0

    calls = max(steps // k, 1)
    t0 = time.perf_counter()
    for _ in range(calls):
        carry, diag = step(carry)
    _sync(carry.fields)
    elapsed = time.perf_counter() - t0
    steps_run = calls * k
    return {
        "metric": "slab-engine particle-steps/sec/chip (1-device mesh)",
        "value": n * steps_run / elapsed,
        "ms_per_step": elapsed * 1000.0 / steps_run,
        "num_particles": n,
        "steps": steps_run,
        "sweeps": sweeps,
        "scan_block": scan_block,
        "p_cap": p_cap, "h_cap": h_cap, "m_cap": m_cap,
        "window_t": cfg.pallas_window_t,
        "rebins": int(np.asarray(carry.rebin_count)[0]),
        "migration_dropped": int(np.ravel(diag.migration_dropped)[-1]),
        "halo_dropped": int(np.ravel(diag.halo_dropped)[-1]),
        "warmup_s": compile_s,
        "device": str(jax.devices()[0]),
    }


def run_parity_check(n: int = 32768, scene: str = "disk") -> dict:
    """Pallas-vs-celllist agreement ON THE CURRENT DEVICE.

    Interpreter-mode tests cover the kernel logic on CPU; this records that
    the compiled Mosaic kernels agree with the XLA cell-list oracle on real
    TPU hardware (VERDICT r1 weak #9).  Returns relative L2s + neighbor-count
    equality, emitted into bench.py's JSON line each round.
    """
    from functools import partial

    import numpy as np

    from ..ops.step import compute_forces

    device = jax.devices()[0]
    interpret = device.platform.lower() == "cpu"
    if interpret:
        n = min(n, 2048)  # interpreter-mode fallback so the check runs anywhere
    cfg, state = make_scene(scene, num_particles=n, pallas_interpret=interpret)

    acc_p, rho_p, aux_p = jax.jit(partial(compute_forces, cfg, backend="pallas"))(state)
    acc_c, rho_c, aux_c = jax.jit(partial(compute_forces, cfg, backend="celllist"))(state)

    rho_p, rho_c = np.asarray(rho_p), np.asarray(rho_c)
    acc_p, acc_c = np.asarray(acc_p), np.asarray(acc_c)
    nc_equal = bool((np.asarray(aux_p.neighbor_count)
                     == np.asarray(aux_c.neighbor_count)).all())
    rho_l2 = float(np.linalg.norm(rho_p - rho_c)
                   / max(np.linalg.norm(rho_c), 1e-30))
    acc_l2 = float(np.linalg.norm(acc_p - acc_c)
                   / max(np.linalg.norm(acc_c), 1e-30))
    return {
        "n": n,
        "scene": scene,
        "device": str(device),
        "interpret": interpret,
        "neighbor_counts_equal": nc_equal,
        "rho_rel_l2": rho_l2,
        "acc_rel_l2": acc_l2,
        "pass": nc_equal and rho_l2 < 1e-5 and acc_l2 < 1e-4,
    }
