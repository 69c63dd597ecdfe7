"""Oracle cost model for the fine-sweep plateau (VERDICT r4 #1c).

For a scene + ray set, computes with full knowledge of the true closest
hit t* per ray:

  own_cost_i   = #fine clusters the ray ITSELF must visit front-to-back
                 before per-ray early exit fires (entry <= t*) — the
                 kd-tree-equivalent floor in units of SUB_BT=128 tris.
  block_depth  = per current block grouping (sorted rays, bq=128), the
                 list position at which ray i is done; a block's cost is
                 max_i depth (block-level EE waits for the slowest lane).

Prints the gap between
  (a) current model:  sum_b max_i depth_ib        (what the kernel pays)
  (b) compaction:     multi-round schedule where survivors repack into
                      fresh dense blocks each round
  (c) floor:          sum_i own_cost_i / bq        (perfect per-ray lists)

all in total FINE_GROUP-cluster group-visits, the kernel's unit of work.
Decides whether multi-round compaction can reach the 10 Mrays/s target
or the bound is corridor-physical (VERDICT r4 #1 'break or bound').
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_intersect import make_rays, make_soup, make_spheres_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="soup131")
    ap.add_argument("--kind", default="incoherent")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--sort", default="entry")
    ap.add_argument("--bq", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops import pallas_intersect as pli

    if args.scene == "soup131":
        tris = make_soup(131072)
        ctr, ext = np.zeros(3), np.full(3, 10.0)
    elif args.scene == "soup524":
        tris = make_soup(524288)
        ctr, ext = np.zeros(3), np.full(3, 10.0)
    else:
        tris = make_spheres_scene(94000)
        ctr, ext = np.zeros(3), np.full(3, 9.0)
    v0, e1, e2 = tris
    n_tris = v0.shape[0]
    order = pli.morton_order(v0, e1, e2)
    pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order)
    pack = jnp.asarray(pack)
    n_sc = pack.shape[1] // pli.SUB_BT
    sub8p = pli._sub_aabbs(pack, n_tris)
    lo = np.asarray(sub8p[0:3, :n_sc]).T  # (n_sc, 3)
    hi = np.asarray(sub8p[3:6, :n_sc]).T

    org, dirn = make_rays(args.nrays, args.kind, ctr=ctr, ext=ext)
    n = args.nrays
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), jnp.inf, jnp.float32)

    # true closest t via the production kernel
    t_true, tri, u, v, h = pli.closest_hit_pallas(
        pack, jnp.asarray(cl), jnp.asarray(org), jnp.asarray(dirn),
        tmin, tmax, n_tris=n_tris)
    t_true = np.asarray(t_true)
    t_star = np.where(np.isfinite(t_true), t_true, 1e30)
    print(f"scene={args.scene} n_tris={n_tris} n_sc={n_sc} "
          f"kind={args.kind} hit_rate={np.isfinite(t_true).mean():.3f}",
          flush=True)

    # ray sort (same permutation the fine path uses)
    os.environ["LIBYAF_SORT"] = args.sort
    if args.sort == "entry":
        perm, _ = pli._entry_sort_perm(
            jnp.asarray(org), jnp.asarray(dirn), tmin, tmax,
            jnp.asarray(sub8p), n_sc)
        perm = np.asarray(perm)
    else:
        perm, _ = pli._ray_sort_perm(jnp.asarray(org), jnp.asarray(dirn))
        perm = np.asarray(perm)
    org_s, dirn_s, t_s = org[perm], dirn[perm], t_star[perm]

    # per-ray cluster entries, chunked on device
    @jax.jit
    def ray_entries(o, d, ts):
        iv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                             jnp.where(d < 0, -1e-12, 1e-12), d)
        t0 = (jnp.asarray(lo)[None] - o[:, None]) * iv[:, None]
        t1 = (jnp.asarray(hi)[None] - o[:, None]) * iv[:, None]
        ent = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), 1e-4)
        ext_ = jnp.min(jnp.maximum(t0, t1), -1)
        ent = jnp.where(ent <= ext_, ent, jnp.inf)
        # own cost: clusters whose entry <= t*  (must visit to confirm)
        own = jnp.sum(ent <= ts[:, None], axis=1)
        return ent, own

    bq = args.bq
    G = pli.FINE_GROUP
    own_all = np.zeros(n, np.int32)
    depth_all = np.zeros(n, np.int32)   # per-ray done-pos in block order
    blk_max_depth = []      # per block: max_i per-ray done-position
    blk_count = []          # per block: list length (finite keys)
    for c0 in range(0, n, args.chunk):
        c1 = min(n, c0 + args.chunk)
        ent, own = ray_entries(jnp.asarray(org_s[c0:c1]),
                               jnp.asarray(dirn_s[c0:c1]),
                               jnp.asarray(t_s[c0:c1]))
        ent = np.asarray(ent)
        own_all[c0:c1] = np.asarray(own)
        # block structure within the chunk (chunk is a bq multiple)
        for b0 in range(0, c1 - c0, bq):
            eb = ent[b0:b0 + bq]                      # (bq, n_sc)
            tb = t_s[c0 + b0:c0 + b0 + bq]
            bkey = eb.min(axis=0)                     # block key
            order_b = np.argsort(bkey)
            cnt = int(np.isfinite(bkey).sum())
            blk_count.append(cnt)
            # per-ray done position in block order: 1 + last position
            # among clusters with per-ray entry <= t*
            pos_of = np.empty(n_sc, np.int32)
            pos_of[order_b] = np.arange(n_sc, dtype=np.int32)
            need = eb <= tb[:, None]                  # (bq, n_sc)
            pos = np.where(need, pos_of[None, :], -1)
            depth = pos.max(axis=1) + 1               # 0 if no cluster
            depth_all[c0 + b0:c0 + b0 + bq] = depth
            blk_max_depth.append(int(depth.max()))
    blk_max_depth = np.array(blk_max_depth)
    blk_count = np.array(blk_count)
    own_all_f = own_all.astype(np.float64)

    def q(a, p):
        return float(np.percentile(a, p))

    gu = lambda c: (c + G - 1) // G  # groups
    cur_groups = int(np.sum(np.minimum(gu(blk_max_depth), gu(blk_count))))
    floor_groups = int(np.ceil(own_all_f.sum() / bq / G))
    print(f"own_cost clusters/ray: mean={own_all_f.mean():.1f} "
          f"p50={q(own_all_f, 50):.0f} p90={q(own_all_f, 90):.0f} "
          f"p99={q(own_all_f, 99):.0f}")
    print(f"block list count: mean={blk_count.mean():.0f} "
          f"p90={q(blk_count, 90):.0f}  of n_sc={n_sc}")
    print(f"block max-depth: mean={blk_max_depth.mean():.1f} "
          f"p50={q(blk_max_depth, 50):.0f} p90={q(blk_max_depth, 90):.0f}")
    print(f"group-visits  current(block-EE)={cur_groups}  "
          f"floor(per-ray)={floor_groups}  "
          f"ratio={cur_groups / max(floor_groups, 1):.1f}x")

    # multi-round compaction estimate: rounds of group budgets; after a
    # round, rays with depth <= visited are done; survivors repack
    # densely (their residual depth approx own-residual = max(0,
    # depth - visited) in a FRESH block ordering ~ own_cost residual).
    for sched in ([6, 24, 10 ** 9], [4, 12, 48, 10 ** 9],
                  [8, 10 ** 9], [2, 8, 32, 10 ** 9]):
        total = 0
        live = own_all_f.copy()  # residual clusters needed per ray
        # round 1 uses the MEASURED block depths (no repack yet); a ray
        # is done after round 1 iff its block-order done-position fits
        k = sched[0]
        total += int(np.sum(np.minimum(gu(blk_max_depth), k)))
        done = depth_all <= k * G
        live = np.maximum(live - k * G, 0.0)
        live[done] = 0.0
        for k in sched[1:]:
            nlive = int((live > 0).sum())
            if nlive == 0:
                break
            # survivors repacked densely, sorted by residual cost so a
            # block's max-depth (what block-EE pays) tracks its members
            resid = np.sort(live[live > 0])[::-1]
            nb = (nlive + bq - 1) // bq
            blocks = [resid[i * bq:(i + 1) * bq] for i in range(nb)]
            total += int(sum(min(gu(int(b.max())), k) for b in blocks))
            live = np.maximum(live - k * G, 0.0)
        print(f"sched={sched}: est group-visits={total} "
              f"({total / max(cur_groups, 1):.2f}x of current)")


if __name__ == "__main__":
    main()
