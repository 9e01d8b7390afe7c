"""Microbenchmarks of the primitive ops the step is built from."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(jnp.ravel(leaf)[:1])
    return x


def bench(name, fn, *args, iters=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:9.3f} ms")
    return out


def main():
    key = jax.random.PRNGKey(0)
    n = 32768
    k_total = 12_582_912  # 32k particles x 384 candidates

    src3 = jax.random.normal(key, (n, 3), jnp.float32)
    src1 = jax.random.normal(key, (n,), jnp.float32)
    src8 = jax.random.normal(key, (n, 8), jnp.float32)
    idx = jax.random.randint(key, (k_total,), 0, n, jnp.int32)
    idx2d = idx.reshape(-1, 384)

    bench("gather [12.6M] rows from [32k,3]", jax.jit(lambda s, i: s[i]), src3, idx)
    bench("gather [12.6M] from [32k] 1D", jax.jit(lambda s, i: s[i]), src1, idx)
    bench("gather [12.6M] rows from [32k,8]", jax.jit(lambda s, i: s[i]), src8, idx)
    bench("take_along_axis 2d [32k,384] of [32k]",
          jax.jit(lambda s, i: jnp.take_along_axis(s[:, None], i % n, axis=0)),
          src1, idx2d)

    # one-hot matmul gather (MXU) for one 1024-chunk
    idx_c = idx2d[:1024]
    def onehot_gather(s, i):
        oh = jax.nn.one_hot(i, n, dtype=jnp.bfloat16)  # [1024, 384, n]
        return jnp.einsum("ckn,nf->ckf", oh, s.astype(jnp.bfloat16))
    # bench("onehot matmul gather 1 chunk", jax.jit(onehot_gather), src3, idx_c)

    # elementwise on the same volume
    big = jax.random.normal(key, (k_total,), jnp.float32)
    bench("elementwise mul+add on [12.6M]", jax.jit(lambda x: x * 1.5 + 2.0), big)

    # sort costs
    for m in (32768, 1_000_000):
        cid = jax.random.randint(key, (m,), 0, 32768, jnp.int32)
        bench(f"argsort [{m}] int32", jax.jit(lambda c: jnp.argsort(c, stable=True)), cid)
        sorted_cid = jnp.sort(cid)
        q = jnp.arange(32768, dtype=jnp.int32)
        bench(f"searchsorted 32k queries in [{m}]",
              jax.jit(lambda a, b: jnp.searchsorted(a, b)), sorted_cid, q)

    # dynamic_slice-based contiguous copy: 32k x 4 ranges of 96
    starts = jax.random.randint(key, (32768, 4), 0, n - 96, jnp.int32)

    def slice_gather(s, st):
        def per_row(row_starts):
            return jnp.stack([jax.lax.dynamic_slice(s, (rs,), (96,))
                              for rs in row_starts])
        return jax.vmap(per_row)(st)
    bench("vmap dynamic_slice 32k x 4 x 96 from [32k]", jax.jit(slice_gather), src1, starts)


if __name__ == "__main__":
    main()
