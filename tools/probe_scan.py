"""Probe: does scanning K lazy steps per dispatch pay at small n?

At 32k (the reference's own workload) the lazy step measures ~3.85 ms on
the axon tunnel, where each dispatch carries ~2.4 ms of call overhead plus
per-output-buffer cost (docs/PERFORMANCE.md r2 finding 2, r3 finding 12).
At 1M the overhead hides under the 60-120 ms device step, but at 32k it is
a large fraction — a ``lax.scan`` of K steps inside one jit call amortizes
it K-fold, IF the r2 scan-ys de-opt (stacked per-step diagnostics defeating
buffer reuse) doesn't return at this scale.

Measures, per n in (32k disk, 1M splash): host loop (production), scan K=8
with full StepDiagnostics ys, scan K=8 with ys=None.

Usage: python tools/probe_scan.py [n] [scene]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from smoothed_particle_hydrodynamics_tpu.models import make_scene
from smoothed_particle_hydrodynamics_tpu.ops import lazy


def _sync(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.ravel(leaf)[:1])


def main(n=32768, scene="disk", k=8, rounds=6):
    overrides = dict(num_particles=n, cell_size_factor=1.25,
                     pallas_window_t=0)
    if jax.devices()[0].platform == "cpu":
        overrides["pallas_interpret"] = True      # CPU sanity runs
    cfg, state = make_scene(scene, **overrides)
    from smoothed_particle_hydrodynamics_tpu.ops import pallas_step_t as pst
    cfg = cfg.replace(pallas_window_t=pst.derive_window_t(cfg, state))
    print(f"n={n} scene={scene} window_t={cfg.pallas_window_t} "
          f"device={jax.devices()[0]}")

    carry = jax.jit(partial(lazy.init_lazy, cfg))(state)
    step = jax.jit(partial(lazy.lazy_step, cfg), donate_argnums=(0,))

    # settle + warm the host-loop path
    for _ in range(2 * k):
        carry, d = step(carry)
    _sync(d)

    t0 = time.perf_counter()
    for _ in range(rounds * k):
        carry, d = step(carry)
    _sync(d)
    host_ms = (time.perf_counter() - t0) / (rounds * k) * 1e3
    print(f"host loop                 {host_ms:8.3f} ms/step")

    def scan_ys(c):
        def body(c, _):
            c, d = lazy.lazy_step(cfg, c)
            return c, d
        return jax.lax.scan(body, c, None, length=k)

    def scan_nys(c):
        def body(c, _):
            c, d = lazy.lazy_step(cfg, c)
            return c, None
        return jax.lax.scan(body, c, None, length=k)

    for name, fn in (("scan K=8, diag ys", scan_ys),
                     ("scan K=8, ys=None", scan_nys)):
        f = jax.jit(fn, donate_argnums=(0,))
        carry, d = f(carry)
        _sync(d if d is not None else carry.state.position)
        t0 = time.perf_counter()
        for _ in range(rounds):
            carry, d = f(carry)
        _sync(d if d is not None else carry.state.position)
        ms = (time.perf_counter() - t0) / (rounds * k) * 1e3
        print(f"{name:25s} {ms:8.3f} ms/step")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    scene = sys.argv[2] if len(sys.argv) > 2 else "disk"
    main(n, scene)
