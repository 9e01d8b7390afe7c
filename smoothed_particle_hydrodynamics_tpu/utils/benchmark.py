"""Throughput benchmark harness.

Measures steady-state particle-steps/sec of the jitted scanned step on the
current default device, after warmup, with ``block_until_ready`` fencing.
The headline metric matches BASELINE.md: particle-steps/sec/chip, target
>= 1e9 at 1M particles on a TPU v5e chip.
"""

from __future__ import annotations

import time
from functools import partial

import jax

from ..models import make_scene
from ..ops.step import run_steps


def run_benchmark(scene: str = "disk", backend: str = "celllist",
                  steps: int = 100, warmup: int = 10,
                  overrides: dict | None = None) -> dict:
    cfg, state = make_scene(scene, **(overrides or {}))
    run = jax.jit(partial(run_steps, cfg, backend=backend),
                  static_argnames=("num_steps",))

    # Warmup: compile + a few steps.
    t0 = time.perf_counter()
    state_w, _ = run(state, num_steps=max(warmup, 1))
    jax.block_until_ready(state_w)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    state_b, diags = run(state_w, num_steps=steps)
    jax.block_until_ready(state_b)
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
