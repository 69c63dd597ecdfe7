"""TPU micro-op costs for the pair-granular intersector design.

Measures the XLA building blocks the pair path leans on, so the design's
overhead budget is data not guesswork (axon-tunnel chained timing):
  - argsort of 1M / 4.2M i32 keys (pair grouping)
  - top_k(4) / top_k(16) over (262144, 128) f32 (per-ray nearest lists)
  - gather of (262144, 8) rows by 1M indices (pair ray records)
  - scatter-min of 1M values into 262144 slots (per-ray reduction)
  - 33.5M-element cumsum (counting-sort alternative)
  - per-ray x cluster slab entries (262144 x 128) fused (the prelude)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=8):
    import jax
    import jax.numpy as jnp

    f = jax.jit(fn)
    o = f(*args)
    tok = jax.tree_util.tree_leaves(o)[0]
    np.asarray(tok.ravel()[0])

    def chain(k):
        def body(i, c):
            out = jax.tree_util.tree_leaves(fn(*args))[0]
            return c + out.ravel()[0].astype(jnp.float32) * 0.0

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    ch = jax.jit(chain)
    np.asarray(ch(1))
    t0 = time.perf_counter()
    np.asarray(ch(1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(ch(iters))
    tk = time.perf_counter() - t0
    return max(0.0, (tk - t1) / (iters - 1))


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    N, C = 262144, 128

    k1m = jnp.asarray(rng.integers(0, C, 1 << 20).astype(np.int32))
    k4m = jnp.asarray(rng.integers(0, C, 1 << 22).astype(np.int32))
    ent = jnp.asarray(rng.uniform(0, 100, (N, C)).astype(np.float32))
    rows = jnp.asarray(rng.uniform(-1, 1, (N, 8)).astype(np.float32))
    idx1m = jnp.asarray(rng.integers(0, N, 1 << 20).astype(np.int32))
    val1m = jnp.asarray(rng.uniform(0, 9, 1 << 20).astype(np.float32))
    big = jnp.asarray(rng.uniform(0, 1, 33554432).astype(np.float32))
    org = jnp.asarray(rng.uniform(-9, 9, (N, 3)).astype(np.float32))
    inv = jnp.asarray(rng.uniform(0.1, 3, (N, 3)).astype(np.float32))
    lo = jnp.asarray(rng.uniform(-10, 0, (C, 3)).astype(np.float32))
    hi = jnp.asarray(rng.uniform(0, 10, (C, 3)).astype(np.float32))

    t = timeit(lambda k: jnp.argsort(k), k1m)
    print(f"argsort 1M i32:        {t * 1e3:7.2f} ms", flush=True)
    t = timeit(lambda k: jnp.argsort(k), k4m)
    print(f"argsort 4.2M i32:      {t * 1e3:7.2f} ms", flush=True)
    t = timeit(lambda e: jax.lax.top_k(-e, 4), ent)
    print(f"top_k4 (262K,128):     {t * 1e3:7.2f} ms", flush=True)
    t = timeit(lambda e: jax.lax.top_k(-e, 16), ent)
    print(f"top_k16 (262K,128):    {t * 1e3:7.2f} ms", flush=True)
    t = timeit(lambda r, i: r[i], rows, idx1m)
    print(f"gather (1M,8):         {t * 1e3:7.2f} ms", flush=True)
    t = timeit(
        lambda i, v: jnp.full((N,), jnp.inf).at[i].min(v, mode="drop"),
        idx1m, val1m)
    print(f"scatter-min 1M->262K:  {t * 1e3:7.2f} ms", flush=True)
    t = timeit(lambda b: jnp.cumsum(b), big)
    print(f"cumsum 33.5M:          {t * 1e3:7.2f} ms", flush=True)

    def slab_all(o, iv):
        t0 = (lo[None] - o[:, None]) * iv[:, None]
        t1 = (hi[None] - o[:, None]) * iv[:, None]
        enter = jnp.maximum(jnp.minimum(t0, t1).max(-1), 1e-3)
        exit_ = jnp.maximum(t0, t1).min(-1)
        return jnp.where(enter <= exit_, enter, jnp.inf)

    t = timeit(slab_all, org, inv)
    print(f"slab (262K,128):       {t * 1e3:7.2f} ms", flush=True)

    # bitonic sort-within-rows alternative for grouping: sort (8192, 128)
    pk = jnp.asarray(rng.integers(0, 1 << 20, (8192, 128)).astype(np.int32))
    t = timeit(lambda p: jnp.sort(p, axis=1), pk)
    print(f"row-sort (8192,128):   {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
