"""Decompose the multi-round resort's per-round overhead on device.

The r5 on-device A/B showed LIBYAF_ROUNDS=3 at ~650 ms vs the 186 ms
single sweep on soup131/incoherent, while the exact-replay sim
(scripts/sim_rounds.py) predicted ~63 ms of kernel group-steps — so
~580 ms is per-round prelude (entry sort, block keys, argsorts, pack
permutes).  This probe times each prelude piece in isolation at the
real sizes so the optimization target is measured, not guessed.

  python scripts/probe_round_costs.py [--nrays 262144] [--ntris 131072]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np


def timeit(fn, *args, iters=20):
    import jax

    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--ntris", type=int, default=131072)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench_intersect import make_soup, make_rays
    from libyafaray_tpu.ops import pallas_intersect as pli

    print(f"device: {jax.devices()[0]}", flush=True)
    v0, e1, e2 = make_soup(args.ntris)
    order = pli.morton_order(v0, np.zeros(3), np.full(3, 10.0))
    pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order)
    pack = jnp.asarray(pack)
    pack16 = jnp.pad(pack, ((0, 6), (0, 0)))
    n_sc = pack.shape[1] // pli.SUB_BT
    pack16f, sub8p = pli._fine_tables(pack, pack16, args.ntris)
    org, dirn = make_rays(args.nrays, "incoherent", ctr=np.zeros(3),
                          ext=np.full(3, 10.0))
    org = jnp.asarray(org)
    dirn = jnp.asarray(dirn)
    n = args.nrays
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)
    bq = pli._fine_bq(n_sc)
    rays8, _ = pli._rays8_t([org, dirn, tmin, tmax], bq)
    npad = rays8.shape[1]
    print(f"n_sc={n_sc} bq={bq} npad={npad}", flush=True)

    for ch in (64, 128, 256):
        t = timeit(lambda o, d: pli._entry_sort_perm(
            o, d, tmin, tmax, sub8p, n_sc, ch=ch), org, dirn)
        print(f"entry_sort_perm ch={ch:4d}: {t * 1e3:7.2f} ms", flush=True)

    for ch in (32, 128, 256):
        t = timeit(lambda r8: pli._fine_block_keys(
            r8[0:3].T, r8[3:6].T, r8[6], r8[7], sub8p[:, :n_sc], bq,
            ch=ch), rays8)
        print(f"fine_block_keys ch={ch:4d}: {t * 1e3:7.2f} ms", flush=True)

    key = pli._fine_block_keys(rays8[0:3].T, rays8[3:6].T, rays8[6],
                               rays8[7], sub8p[:, :n_sc], bq)
    t = timeit(lambda k: pli._order_from_fine_keys(k)[0], key)
    print(f"order_from_fine_keys (argsort {key.shape}): {t * 1e3:7.2f} ms",
          flush=True)

    perm = jnp.asarray(np.random.permutation(n).astype(np.int32))
    pk = jnp.concatenate([org, dirn] + [tmin[:, None]] * 7, axis=1)
    t = timeit(lambda p, m: p[m], pk, perm)
    print(f"13-col pack gather-permute: {t * 1e3:7.2f} ms", flush=True)

    t = timeit(lambda o, d: pli._ray_sort_perm(o, d)[0], org, dirn)
    print(f"ray_sort_perm (morton): {t * 1e3:7.2f} ms", flush=True)

    def one_sweep(o, d):
        t_, c_ = pli._closest_fine_tcol(pack, pack16, o, d, tmin, tmax,
                                        args.ntris)
        return t_

    os.environ["LIBYAF_ROUNDS"] = "0"
    t = timeit(one_sweep, org, dirn, iters=8)
    print(f"single-sweep fine total: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
