"""Intersector microbenchmark on the real TPU chip.

Measures closest-hit + shadow kernel throughput for scene sizes spanning
the r2 weak spot (VERDICT Weak #1): 2.6K tris (cornell_path class),
20K, 100K-tri soups, with coherent (camera-like) and incoherent
(bounce-like) ray batches.  Timing per the axon-tunnel rules
(memory/axon-tunnel-behaviors.md): block_until_ready is unreliable, so
each measurement chains ITERS dependent calls and does ONE host fetch;
per-call time = (t_chain - t_one) / (ITERS - 1).

Usage: python scripts/bench_intersect.py [--sizes 2600,20000,100000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_soup(n, seed=0, extent=10.0, tri_size=0.4):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, tri_size, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, tri_size, (n, 3)).astype(np.float32)
    return v0, e1, e2


def make_rays(n, kind, seed=1, extent=10.0):
    rng = np.random.default_rng(seed)
    if kind == "coherent":
        # camera-like: one origin cluster, forward cone
        org = (np.array([0.0, 0.0, -3.0 * extent], np.float32)
               + rng.normal(0, 0.1, (n, 3)).astype(np.float32))
        tgt = rng.uniform(-extent, extent, (n, 2)).astype(np.float32)
        d = np.concatenate(
            [tgt, np.zeros((n, 1), np.float32)], axis=1) - org
    else:
        # bounce-like: origins inside the scene, directions uniform sphere
        org = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
        d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    return org, d.astype(np.float32)


def chain_time(fn, args, iters=8):
    """Dependent-chain timing: fn must map (org,...) -> outputs whose first
    element can perturb org.  We instead time a python loop of iters calls
    where each call's input is XORed with a tiny function of the previous
    output (forces sequencing) and fetch once."""
    import jax
    import jax.numpy as jnp

    org = args[0]

    def run(k):
        o = org
        out = None
        for i in range(k):
            out = fn(o, *args[1:])
            # data dependency via a guaranteed-FINITE token (t can be inf
            # for misses; 0*inf would poison the chain with NaNs)
            token = jnp.sum(out[-1].astype(jnp.float32))
            o = org + token * 0.0
        return out

    r1 = jax.jit(run, static_argnums=0)
    # warmup/compile both variants
    np.asarray(jax.tree_util.tree_leaves(r1(1))[0]).sum()
    np.asarray(jax.tree_util.tree_leaves(r1(iters))[0]).sum()
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(r1(1))[0]).sum()
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(jax.tree_util.tree_leaves(r1(iters))[0]).sum()
    t_chain = time.perf_counter() - t0
    return max(1e-9, (t_chain - t_one) / (iters - 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2600,20000,100000")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops import pallas_intersect as pli

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    results = []
    for n_tris in [int(s) for s in args.sizes.split(",")]:
        v0, e1, e2 = make_soup(n_tris)
        order = pli.morton_order(v0, e1, e2)
        pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order)
        pack = jnp.asarray(pack)
        cl = jnp.asarray(cl)
        filt4 = jnp.zeros((4, n_tris), jnp.float32)  # opaque
        for kind in ("coherent", "incoherent"):
            org, dirn = make_rays(args.nrays, kind)
            org_j = jnp.asarray(org)
            dirn_j = jnp.asarray(dirn)
            tmin = jnp.full((args.nrays,), 1e-4, jnp.float32)
            tmax = jnp.full((args.nrays,), jnp.inf, jnp.float32)
            dist = jnp.full((args.nrays,), 25.0, jnp.float32)

            def f_closest(o, d):
                t, tri, u, v, h = pli.closest_hit_pallas(
                    pack, cl, o, d, tmin, tmax, n_tris=n_tris)
                return (t, tri)

            def f_shadow(o, d):
                tr = pli.shadow_transmission_pallas(
                    pack, cl, filt4, o, d, dist, n_tris=n_tris)
                return (tr,)

            t_c = chain_time(f_closest, (org_j, dirn_j), args.iters)
            t_s = chain_time(f_shadow, (org_j, dirn_j), args.iters)
            mr_c = args.nrays / t_c / 1e6
            mr_s = args.nrays / t_s / 1e6
            row = dict(n_tris=n_tris, kind=kind,
                       closest_ms=round(t_c * 1e3, 2),
                       closest_mrays=round(mr_c, 1),
                       shadow_ms=round(t_s * 1e3, 2),
                       shadow_mrays=round(mr_s, 1))
            results.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
