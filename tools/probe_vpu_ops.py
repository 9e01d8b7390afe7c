"""Hardware probe: per-op VPU cost of the force kernel's transcendentals.

The force sweep spends one ``sqrt`` and one true divide per candidate lane
(docs/PERFORMANCE.md cost model: ~40 ops/lane incl. both).  If Mosaic lowers
divide / sqrt as multi-slot sequences while ``lax.rsqrt`` or
``pl.reciprocal(approx=True)`` are single-slot approximations, rewriting

    center = hd^2 * m * (pw_i + pw_j) / (d + eps) * scale      (sqrt + div)

as a reciprocal-multiply chain is a direct kernel win.  This probe measures
K-deep elementwise chains of each candidate op over identical tile volumes,
plus the two composite "center" formulations, and prints per-op cost
relative to multiply.  Accuracy of the approx reciprocal is printed too
(it decides whether the rewrite needs a Newton step).

Usage: python tools/probe_vpu_ops.py [--interpret]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 256          # sublanes per tile
BLOCKS = 512        # grid size
K = 64              # chain depth (dependent, but SIMD-pipelined across lanes)


def _chain_kernel(op, k, x_ref, o_ref):
    x = x_ref[...]
    for _ in range(k):
        x = op(x)
    o_ref[...] = x


def _time(fn, x, iters=20):
    out = fn(x)
    np.asarray(jnp.ravel(out)[:1])           # device fence (axon: no BUR)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    np.asarray(jnp.ravel(out)[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def probe(name, op, x, interpret, base_ms=None):
    blocks = x.shape[0] // ROWS
    k = 4 if interpret else K
    fn = pl.pallas_call(
        functools.partial(_chain_kernel, op, k),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(blocks,),
        in_specs=[pl.BlockSpec((ROWS, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0)),
        interpret=interpret,
    )
    ms = _time(jax.jit(fn), x, iters=1 if interpret else 20)
    lanes = blocks * ROWS * 128 * k / 1e9     # Glane-ops
    rel = f"  {ms / base_ms:5.2f}x mul" if base_ms else ""
    print(f"{name:28s} {ms:8.3f} ms  {lanes / ms * 1e3:7.1f} Gop/s{rel}")
    return ms


def main(interpret: bool):
    blocks = 1 if interpret else BLOCKS
    x = jnp.full((blocks * ROWS, 128), 1.3, jnp.float32) \
        + jax.random.uniform(jax.random.PRNGKey(0),
                             (blocks * ROWS, 128), jnp.float32) * 0.5

    base = probe("mul", lambda v: v * 1.0000001, x, interpret)
    probe("add", lambda v: v + 1e-7, x, interpret, base)
    probe("sqrt", jnp.sqrt, x, interpret, base)          # chain -> 1.0
    probe("rsqrt", jax.lax.rsqrt, x, interpret, base)
    probe("div (1/x chain)", lambda v: 1.0000001 / v, x, interpret, base)
    probe("recip exact", lambda v: pl.reciprocal(v), x, interpret, base)
    probe("recip approx",
          lambda v: pl.reciprocal(v, approx=True), x, interpret, base)
    probe("select", lambda v: jnp.where(v > 1.0, v * 0.9999, v), x,
          interpret, base)

    # composite: the force kernel's center term, current vs reciprocal forms.
    # values stay O(1): s in [1.3, 1.8] plays d2u, constants play h/eps/etc.
    h, eps, scale, m = 2.0, 1e-3, 0.77, 1.1

    def center_now(s):
        d = jnp.sqrt(s) * scale
        hd = h - d
        return (hd * hd) * m / (d + eps) * scale * 0.3 + s * 0.7

    def center_recip(s):
        d = jnp.sqrt(s) * scale
        hd = h - d
        return (hd * hd) * m * pl.reciprocal(d + eps, approx=True) \
            * scale * 0.3 + s * 0.7

    def center_rsqrt(s):
        # d = s * rsqrt(s) * scale; 1/(d+eps) via approx recip
        t = jax.lax.rsqrt(s)
        d = s * t * scale
        hd = h - d
        return (hd * hd) * m * pl.reciprocal(d + eps, approx=True) \
            * scale * 0.3 + s * 0.7

    probe("center: sqrt+div (now)", center_now, x, interpret, base)
    probe("center: sqrt+recip~", center_recip, x, interpret, base)
    probe("center: rsqrt+recip~", center_rsqrt, x, interpret, base)

    # accuracy of the approx reciprocal over the force kernel's d range
    d = jnp.linspace(1e-3, 4.0, 8192, dtype=jnp.float32) + 1e-3
    if not interpret:
        ker = pl.pallas_call(
            lambda i_ref, o_ref: o_ref.__setitem__(
                (...,), pl.reciprocal(i_ref[...], approx=True)),
            out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))
        approx = np.asarray(ker(d.reshape(64, 128))).ravel()
        rel = np.abs(approx - 1.0 / np.asarray(d)) * np.asarray(d)
        print(f"recip approx rel err: max {rel.max():.3e} "
              f"mean {rel.mean():.3e}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    main(args.interpret)
