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
                  overrides: dict | None = None) -> dict:
    from ..ops.step import drive_loop

    cfg, state = make_scene(scene, **(overrides or {}))

    # Warmup: compile + a few steps.
    t0 = time.perf_counter()
    state, _ = drive_loop(cfg, state, max(warmup, 1), backend=backend,
                          collect_diags=False)
    _sync(state)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, _ = drive_loop(cfg, state, steps, backend=backend,
                          collect_diags=False)
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
        "num_particles": n,
        "steps": steps,
        "ms_per_step": elapsed * 1000.0 / steps,
        "warmup_s": compile_s,
        "device": str(device),
        "platform": device.platform,
    }
