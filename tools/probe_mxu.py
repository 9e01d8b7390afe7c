"""Hardware probe: Mosaic primitives needed by the transposed MXU kernel.

Probes, in one pallas kernel:
1. transpose-via-matmul: dot_general(G[F,128], I_F[F,F], contract dim0/dim0)
   -> [128, F] (no tpu transpose primitive needed);
2. dynamic sublane slice of a VMEM scratch array;
3. small-K matmul D2 = dot_general(P[s,5], Q[5,128], contract 1/0) -> [s,128].

Run with --interpret first (CPU correctness), then on the TPU.
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 9
ST = 160  # tight window rows (8-aligned)


def kernel(g_ref, self_ref, off_ref, out_ref, tr_ref):
    # 1. transpose 3 granules of [F, 128] into tr_ref [384, F]
    eye = jnp.eye(F, dtype=jnp.float32)
    for c in range(3):
        g = g_ref[c]                                   # [F, 128]
        t = jax.lax.dot_general(g, eye, (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        tr_ref[pl.ds(c * 128, 128), :] = t             # [128, F]

    # 2. dynamic sublane slice [off : off+ST]
    off = off_ref[0]
    w = tr_ref[pl.ds(off, ST), :]                      # [ST, F]

    # 3. small-K matmul: D2 = |xi|^2 + |xj|^2 - 2 xi.xj via P @ Q
    xj = w[:, 0:3]                                     # [ST, 3]
    xj2 = jnp.sum(xj * xj, axis=1, keepdims=True)      # [ST, 1]
    ones = jnp.ones((ST, 1), jnp.float32)
    p = jnp.concatenate([xj, xj2, ones], axis=1)       # [ST, 5]

    xi = self_ref[0:3, :]                              # [3, 128]
    xi2 = jnp.sum(xi * xi, axis=0, keepdims=True)      # [1, 128]
    q = jnp.concatenate([-2.0 * xi, jnp.ones((1, 128), jnp.float32), xi2],
                        axis=0)                        # [5, 128]
    d2 = jax.lax.dot_general(p, q, (((1,), (0,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    out_ref[...] = d2                                  # [ST, 128]


def run(interpret: bool):
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (3, F, 128), jnp.float32)
    selfv = jax.random.normal(jax.random.PRNGKey(1), (F, 128), jnp.float32)
    off = jnp.asarray([40], jnp.int32)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ST, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3 * 128, F), jnp.float32)],
        interpret=interpret,
    )
    d2 = np.asarray(jax.jit(fn)(g, selfv, off))

    # reference
    tr = np.asarray(g).transpose(0, 2, 1).reshape(384, F)[40:40 + ST]
    xj = tr[:, 0:3]
    xi = np.asarray(selfv)[0:3, :]
    want = (xj * xj).sum(1)[:, None] + (xi * xi).sum(0)[None, :] \
        - 2.0 * xj @ xi
    err = np.abs(d2 - want).max()
    print(f"interpret={interpret}  max_abs_err={err:.3e}  "
          f"{'OK' if err < 1e-4 else 'FAIL'}")
    return err < 1e-4


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    ok = run(args.interpret)
    raise SystemExit(0 if ok else 1)
