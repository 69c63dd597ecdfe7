"""Instrument the r4 gathered-fine path: round-1/round-2 visit counts,
prelude vs kernel time split, and a LIBYAF_K1 sweep hint.

Writes JSON lines to stdout (run with stdout to a FILE — grep in a pipe
block-buffers and loses output on timeout kills).

Usage: python scripts/probe_fine.py [--tris N] [--geo soup|spheres]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

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
    n_sc = pack.shape[1] // pli.SUB_BT
    pad_id = n_sc
    pack16 = jnp.pad(pack, ((0, 6), (0, 0)))
    pack16f, sub8p = pli._fine_tables(pack, pack16, n_tris)
    bq = pli._fine_bq(n_sc)
    k1 = pli._round_k1()
    k1e = k1 * pli.FINE_GROUP
    print(json.dumps(dict(n_tris=n_tris, n_sc=n_sc, bq=bq, k1=k1)),
          flush=True)

    for kind in ("coherent", "incoherent"):
        org, dirn = make_rays(args.nrays, kind, ctr=ctr, ext=ext)
        org_j = jnp.asarray(org)
        dirn_j = jnp.asarray(dirn)
        tmin = jnp.full((args.nrays,), 1e-4, jnp.float32)
        tmax = jnp.full((args.nrays,), jnp.inf, jnp.float32)

        def sorted_rays(o, d):
            perm, _ = pli._ray_sort_perm(o, d)
            rp = jnp.concatenate(
                [o, d, tmin[:, None], tmax[:, None]], axis=1)[perm]
            rays8, _ = pli._rays8_t(
                [rp[:, 0:3], rp[:, 3:6], rp[:, 6], rp[:, 7]], bq)
            return rays8

        rays8 = sorted_rays(org_j, dirn_j)
        npad = rays8.shape[1]

        def keys1(r8):
            return pli._fine_block_keys(r8[0:3].T, r8[3:6].T, r8[6],
                                        r8[7], sub8p[:, :n_sc], bq)

        key = keys1(rays8)
        order, count = pli._order_from_fine_keys(key)
        nk = pli._next_group_keys(key, order)
        init_t = jnp.full((1, npad), jnp.inf, jnp.float32)
        init_c = jnp.zeros((1, npad), jnp.int32)
        cnt1 = jnp.minimum(count, k1e)

        # round-1 kernel alone
        def f_r1(r8, _):
            t, c = pli._run_fine_closest(order, nk, cnt1, init_t, init_c,
                                         pack16f, sub8p, r8, bq, pad_id)
            return (t, c)

        t_r1 = chain_time(f_r1, (rays8, rays8), 4)
        t1, c1 = pli._run_fine_closest(order, nk, cnt1, init_t, init_c,
                                       pack16f, sub8p, rays8, bq, pad_id)

        # round-2 lists
        tmax2 = jnp.minimum(rays8[7], t1[0])
        key2 = keys1(rays8.at[7].set(tmax2))
        visited = order[:, :k1e]
        bidx = jax.lax.broadcasted_iota(jnp.int32, visited.shape, 0)
        key2m = key2.at[bidx, visited].set(jnp.inf)
        order2, count2 = pli._order_from_fine_keys(key2m)
        nk2 = pli._next_group_keys(key2m, order2)

        def f_r2(r8, _):
            t, c = pli._run_fine_closest(order2, nk2, count2, t1, c1,
                                         pack16f, sub8p, r8, bq, pad_id)
            return (t, c)

        t_r2 = chain_time(f_r2, (rays8, rays8), 4)

        # prelude (keys + argsort) alone
        def f_pre(r8, _):
            k = keys1(r8)
            o, c = pli._order_from_fine_keys(k)
            return (o, c)

        t_pre = chain_time(f_pre, (rays8, rays8), 4)

        # single-round full sweep (K1=0 equivalent)
        def f_full(r8, _):
            t, c = pli._run_fine_closest(order, nk, count, init_t, init_c,
                                         pack16f, sub8p, r8, bq, pad_id)
            return (t, c)

        t_fullk = chain_time(f_full, (rays8, rays8), 4)

        cnt_np = np.asarray(count)
        cnt2_np = np.asarray(count2)
        g1 = np.minimum(np.ceil(cnt_np / 8), k1).sum()
        g2 = np.ceil(cnt2_np / 8).sum()
        gf = np.ceil(cnt_np / 8).sum()
        row = dict(kind=kind,
                   r1_ms=round(t_r1 * 1e3, 2),
                   r2_ms=round(t_r2 * 1e3, 2),
                   pre_ms=round(t_pre * 1e3, 2),
                   single_round_ms=round(t_fullk * 1e3, 2),
                   fine_mean=round(float(cnt_np.mean()), 1),
                   r2_mean=round(float(cnt2_np.mean()), 1),
                   groups_r1=int(g1), groups_r2=int(g2),
                   groups_single=int(gf),
                   us_per_group_r1=round(t_r1 * 1e6 / max(g1, 1), 2),
                   us_per_group_full=round(t_fullk * 1e6 / max(gf, 1), 2))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
