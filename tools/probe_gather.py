"""Probe: cost of tpu.dynamic_gather (sublane gather) inside Pallas on v5e.

Round-3 design question (VERDICT item 1): can the capped-candidate sweep
compact rod windows [S,128] -> [C,128] with one in-kernel per-lane gather?
Only worth it if dynamic_gather's cost is ~O(S) elementwise-equivalent, not
O(S^2/8) vreg-select chains.

Measures, per source height S:
  - elementwise baseline (1 op over [S,128])
  - a ~24-op chain over [S,128]  (the density sweep's per-lane cost model)
  - dynamic_gather [S,128] -> [S,128], lane-VARYING indices
  - dynamic_gather with lane-UNIFORM indices (row permutation)
Also probes XLA row-gather rates at several row counts/widths (design C-block).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(f, *args, iters=20, warmup=3):
    for _ in range(warmup):
        fence(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1e3


def make_gather(S, nb, mode):
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)

    def kernel_ew(src_ref, idx_ref, out_ref):
        out_ref[:] = src_ref[:] * 2.0 + 1.0

    def kernel_chain(src_ref, idx_ref, out_ref):
        x = src_ref[:]
        for _ in range(12):
            x = x * 1.0001 + 0.5
        out_ref[:] = x

    k = {"gather": kernel, "ew": kernel_ew, "chain": kernel_chain}[mode]

    @jax.jit
    def run(src, idx):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((nb * S, 128), jnp.float32),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((S, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((S, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((S, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(src, idx)

    return run


def probe_dynamic_gather():
    print("== dynamic_gather probe ==")
    rng = np.random.default_rng(0)
    for S in (128, 256, 512, 1024, 1920):
        nb = max(1, (1 << 22) // (S * 128))  # ~4M elements total
        src = jnp.asarray(rng.standard_normal((nb * S, 128)), jnp.float32)
        idx_v = jnp.asarray(rng.integers(0, S, (nb * S, 128)), jnp.int32)
        idx_u = jnp.asarray(
            np.broadcast_to(rng.integers(0, S, (nb * S, 1)), (nb * S, 128)),
            jnp.int32)
        row = {"S": S, "nb": nb}
        for mode, idx in (("ew", idx_v), ("chain", idx_v),
                          ("gather", idx_v), ("gather_uniform", idx_u)):
            try:
                f = make_gather(S, nb, "gather" if "gather" in mode else mode)
                ms = timeit(f, src, idx)
                row[mode] = round(ms, 3)
            except Exception as e:  # noqa: BLE001
                row[mode] = f"FAIL: {str(e)[:120]}"
        print(row, flush=True)


def probe_xla_row_gather():
    print("== XLA row-gather probe ==")
    rng = np.random.default_rng(0)
    n = 1 << 20
    for rows, width in ((1 << 22, 8), (1 << 22, 32), (1 << 22, 128),
                        (1 << 20, 8), (1 << 23, 8)):
        src = jnp.asarray(rng.standard_normal((n, width)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, (rows,)), jnp.int32)

        @jax.jit
        def g(s, i):
            return jnp.take(s, i, axis=0)

        try:
            ms = timeit(g, src, idx, iters=10)
            print({"rows": rows, "width": width, "ms": round(ms, 3),
                   "Mrows_per_ms": round(rows / ms / 1e6, 3),
                   "GBps": round(rows * width * 4 / ms / 1e6, 1)}, flush=True)
        except Exception as e:  # noqa: BLE001
            print({"rows": rows, "width": width, "FAIL": str(e)[:120]})


if __name__ == "__main__":
    print(jax.devices())
    probe_dynamic_gather()
    probe_xla_row_gather()
