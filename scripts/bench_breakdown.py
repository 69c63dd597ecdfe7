"""Breakdown of the large-scene closest-hit call on the real TPU chip.

Times the three stages of `closest_hit_pallas` separately (each as its
own jitted chained-dependency measurement, per the axon-tunnel timing
rules): the Morton ray sort, the per-block front-to-back cluster-list
prelude (`_block_cluster_order`, incl. sub-AABB keys), and the full
call.  kernel ~= full - sort - prelude.  This decides whether the r3
plateau (BENCH_ALL.md "r3 large-scene iteration") is prelude-bound or
kernel-bound before building sub-granular entry lists.

Usage: python scripts/bench_breakdown.py [--case soup131|spheres114]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from bench_intersect import make_soup, make_spheres_scene, make_rays


def chain_time(fn, token_of, seed_args, iters=8):
    """One compiled fori_loop chain; per-call = (t(iters)-t(1))/(iters-1)."""
    import jax
    import jax.numpy as jnp

    org = seed_args[0]

    def run(k):
        def body(i, o):
            out = fn(o, *seed_args[1:])
            return org + token_of(out) * 0.0

        o = jax.lax.fori_loop(0, k, body, org)
        return token_of(fn(o, *seed_args[1:]))

    r1 = jax.jit(run)
    np.asarray(r1(0))
    t0 = time.perf_counter()
    np.asarray(r1(0))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(r1(iters - 1))
    t_chain = time.perf_counter() - t0
    return max(1e-9, (t_chain - t_one) / (iters - 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="soup131")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops import pallas_intersect as pli

    print(f"device: {jax.devices()[0]}", flush=True)

    if args.case.startswith("soup"):
        v0, e1, e2 = make_soup(131072)
        ctr, ext = np.zeros(3), np.full(3, 10.0)
    else:
        v0, e1, e2 = make_spheres_scene(114000)
        ctr, ext = np.zeros(3), np.full(3, 9.0)
    n_tris = v0.shape[0]
    order = pli.morton_order(v0, e1, e2)
    pack, cl8 = pli.build_tri_pack(
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), order=order)
    pack = jax.device_put(pack)
    cl8 = jax.device_put(cl8)
    bt = pack.shape[1] // cl8.shape[1]
    print(f"case={args.case} n_tris={n_tris} BT={bt} "
          f"n_cl={cl8.shape[1]}", flush=True)

    o_np, d_np = make_rays(args.nrays, "incoherent", ctr=ctr, ext=ext)
    org = jnp.asarray(o_np)
    dirn = jnp.asarray(d_np)
    tmin = jnp.full((args.nrays,), 1e-3, jnp.float32)
    tmax = jnp.full((args.nrays,), 1e9, jnp.float32)

    # --- stage 1: ray sort ---
    def sort_fn(o, d):
        perm, unperm = pli._ray_sort_perm(o, d)
        rp = jnp.concatenate([o, d], axis=1)[perm]
        return rp[:, 0:3], rp[:, 3:6], unperm

    t_sort = chain_time(
        sort_fn, lambda out: jnp.sum(out[0][:, 0]) + 0.0 * out[2][0],
        [org, dirn], iters=args.iters)
    print(f"sort:    {t_sort * 1e3:8.1f} ms", flush=True)

    # --- stage 2: prelude (list building, incl. sub keys) ---
    bq = pli._pick_bq(bt)
    n_sub = (bt // pli.SUB_BT
             if bt > pli.SUB_BT and pack.shape[1] // pli.SUB_BT <= 2048
             else 1)
    sub8 = pli._sub_aabbs(pack, n_tris) if n_sub > 1 else None
    print(f"bq={bq} n_sub={n_sub}", flush=True)

    def prelude_fn(o, d):
        (op, dp, ivp, tl), _ = pli._pad_rays(
            [o, d, pli._inv_dir(d), jnp.stack([tmin, tmax], axis=1)], bq)
        ent, cnt = pli._block_cluster_order(
            op, dp, tl[:, 0], tl[:, 1], cl8, bq, sub8=sub8, n_sub=n_sub)
        return ent, cnt

    t_prel = chain_time(
        prelude_fn,
        lambda out: jnp.sum(out[1]).astype(jnp.float32)
        + 0.0 * out[0][0, 0].astype(jnp.float32),
        [org, dirn], iters=args.iters)
    print(f"prelude: {t_prel * 1e3:8.1f} ms", flush=True)

    # list-length stats (one host fetch, informational)
    ent, cnt = jax.jit(prelude_fn)(org, dirn)
    c = np.asarray(cnt)
    nb = args.nrays // bq
    print(f"list len (of {cl8.shape[1]}): mean={c[:nb].mean():.1f} "
          f"p50={np.percentile(c[:nb], 50):.0f} "
          f"p95={np.percentile(c[:nb], 95):.0f} max={c[:nb].max()}",
          flush=True)

    # --- stage 3: full call ---
    full = functools.partial(pli.closest_hit_pallas, pack, cl8,
                             n_tris=n_tris)

    def full_fn(o, d):
        return full(o, d, tmin, tmax)

    t_full = chain_time(
        full_fn, lambda out: jnp.sum(out[4].astype(jnp.float32)),
        [org, dirn], iters=args.iters)
    mrays = args.nrays / t_full / 1e6
    print(f"full:    {t_full * 1e3:8.1f} ms  ({mrays:.2f} Mrays/s)",
          flush=True)
    print(f"kernel~= {max(0.0, t_full - t_sort - t_prel) * 1e3:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__))))
    main()
