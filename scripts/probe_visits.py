"""Probe the block-sweep cost structure on the real TPU.

Splits closest-hit time into (prelude slab+order) vs (pallas kernel),
reports coarse/fine list-length stats, and times a standalone
jnp.argsort over (B, n_sc) to bound the cost of ordering FINE cluster
lists directly (the gathered-fine-tile design question, VERDICT r3 #1).

Usage: python scripts/probe_visits.py [--tris 131072] [--geo soup|spheres]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=131072)
    ap.add_argument("--geo", default="soup")
    ap.add_argument("--nrays", type=int, default=262144)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops import pallas_intersect as pli
    from scripts.bench_intersect import (chain_time, make_rays, make_soup,
                                         make_spheres_scene)

    if args.geo == "spheres":
        v0, e1, e2 = make_spheres_scene(args.tris)
        ctr, ext = np.zeros(3), np.full(3, 9.0)
    else:
        v0, e1, e2 = make_soup(args.tris)
        ctr, ext = np.zeros(3), np.full(3, 10.0)
    n_tris = v0.shape[0]
    order_h = pli.morton_order(v0, e1, e2)
    pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order_h)
    pack = jnp.asarray(pack)
    cl = jnp.asarray(cl)
    n_cl = cl.shape[1]
    bt = pack.shape[1] // n_cl
    bq = pli._pick_bq(bt)
    n_sub = pli._pick_nsub(pack, bt)
    print(json.dumps(dict(n_tris=n_tris, bt=bt, bq=bq, n_sub=n_sub,
                          n_cl=n_cl)), flush=True)

    for kind in ("coherent", "incoherent"):
        org, dirn = make_rays(args.nrays, kind, ctr=ctr, ext=ext)
        org_j = jnp.asarray(org)
        dirn_j = jnp.asarray(dirn)
        tmin = jnp.full((args.nrays,), 1e-4, jnp.float32)
        tmax = jnp.full((args.nrays,), jnp.inf, jnp.float32)

        # --- full closest-hit (reference point)
        def f_closest(o, d):
            t, tri, u, v, h = pli.closest_hit_pallas(
                pack, cl, o, d, tmin, tmax, n_tris=n_tris)
            return (t, tri)

        t_full = chain_time(f_closest, (org_j, dirn_j), 4)

        # --- prelude alone: sort + block order (same path the wrapper takes)
        sub8 = pli._sub_aabbs(pack, n_tris) if n_sub > 1 else None

        def f_prelude(o, d):
            perm, unperm = pli._ray_sort_perm(o, d)
            rp = jnp.concatenate(
                [o, d, tmin[:, None], tmax[:, None]], axis=1)[perm]
            rays8, _ = pli._rays8_t(
                [rp[:, 0:3], rp[:, 3:6], rp[:, 6], rp[:, 7]], bq)
            order, count = pli._block_cluster_order(
                rays8[0:3].T, rays8[3:6].T, rays8[6], rays8[7], cl, bq,
                sub8=sub8, n_sub=n_sub)
            return (order, count)

        t_pre = chain_time(f_prelude, (org_j, dirn_j), 4)

        # --- sort alone
        def f_sort(o, d):
            perm, unperm = pli._ray_sort_perm(o, d)
            return (perm,)

        t_sort = chain_time(f_sort, (org_j, dirn_j), 4)

        # --- list-length stats (coarse + fine) on the sorted rays
        perm, _ = pli._ray_sort_perm(org_j, dirn_j)
        rp = jnp.concatenate(
            [org_j, dirn_j, tmin[:, None], tmax[:, None]], axis=1)[perm]
        rays8, _ = pli._rays8_t(
            [rp[:, 0:3], rp[:, 3:6], rp[:, 6], rp[:, 7]], bq)
        _, count_c = pli._block_cluster_order(
            rays8[0:3].T, rays8[3:6].T, rays8[6], rays8[7], cl, bq,
            sub8=sub8, n_sub=n_sub)
        count_c = np.asarray(count_c)
        # fine-granularity counts: treat sub-boxes AS the clusters
        if n_sub > 1:
            _, count_f = pli._block_cluster_order(
                rays8[0:3].T, rays8[3:6].T, rays8[6], rays8[7], sub8, bq,
                sub8=None, n_sub=1)
            count_f = np.asarray(count_f)
        else:
            count_f = count_c
        # per-entry live-sub popcount (how full are coarse visits?)
        order_e, _ = pli._block_cluster_order(
            rays8[0:3].T, rays8[3:6].T, rays8[6], rays8[7], cl, bq,
            sub8=sub8, n_sub=n_sub)
        oe = np.asarray(order_e)
        masks = (oe >> 16) & 0xFF
        pops = np.zeros_like(masks)
        for b in range(8):
            pops += (masks >> b) & 1
        nb = count_c.shape[0]
        jidx = np.arange(oe.shape[1])[None, :]
        live = jidx < count_c[:, None]
        tot_visits = int(count_c.sum())
        mean_pop = float(pops[live].mean()) if live.any() else 0.0
        per_visit_us = (t_full - t_pre) / max(tot_visits, 1) * 1e6
        row = dict(kind=kind,
                   full_ms=round(t_full * 1e3, 2),
                   prelude_ms=round(t_pre * 1e3, 2),
                   sort_ms=round(t_sort * 1e3, 2),
                   kernel_ms=round((t_full - t_pre) * 1e3, 2),
                   coarse_mean=round(float(count_c.mean()), 1),
                   coarse_p95=int(np.percentile(count_c, 95)),
                   fine_mean=round(float(count_f.mean()), 1),
                   fine_p95=int(np.percentile(count_f, 95)),
                   livesubs_per_visit=round(mean_pop, 2),
                   visits=tot_visits,
                   per_visit_us=round(per_visit_us, 2))
        print(json.dumps(row), flush=True)

    # --- argsort cost over (B, n_sc) fine keys
    nb = args.nrays // bq
    for nsc in (1024, 2048, 4096):
        keys = jnp.asarray(
            np.random.default_rng(0).random((nb, nsc), np.float32))

        def f_as(k, _):
            return (jnp.argsort(k, axis=1),)

        t_as = chain_time(f_as, (keys, keys), 4)
        print(json.dumps(dict(argsort_shape=[nb, nsc],
                              ms=round(t_as * 1e3, 2))), flush=True)


if __name__ == "__main__":
    main()
