"""CPU simulation of the streaming front-to-back sweep's work profile.

For a scene + incoherent ray batch, computes exactly (numpy, no TPU):
  - per-block cluster-list length (the prelude's sub-tightened lists)
  - how many listed clusters actually get MT-swept under the kernel's
    front-to-back slab_any skip (any live ray's corridor still reaches
    the cluster given its CURRENT best-t)
  - the per-RAY equivalent (clusters a single ray would sweep with its
    own front-to-back early termination) — the gain ceiling for any
    per-ray / ray-cluster-pair redesign over the block design

This is the decision data for the r3 plateau (BENCH_ALL.md): if
block-MT'd ~= per-ray-MT'd, the block design is already near its
information-theoretic best and only per-visit cost reduction helps; if
block >> per-ray, pair-granular work assignment is the win.

Usage: python scripts/sim_sweep_stats.py [--case soup131|spheres114]
       [--nrays 16384] [--bt 1024]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_intersect import make_soup, make_spheres_scene, make_rays


def mt_hits(v0, e1, e2, org, dirn, tmin, tmax):
    """Brute-force closest t per ray (chunked numpy)."""
    n = org.shape[0]
    best = np.full(n, np.inf, np.float32)
    CH = 4096
    for t0 in range(0, v0.shape[0], CH):
        V0 = v0[t0:t0 + CH]
        E1 = e1[t0:t0 + CH]
        E2 = e2[t0:t0 + CH]
        for r0 in range(0, n, 8192):
            o = org[r0:r0 + 8192]
            d = dirn[r0:r0 + 8192]
            pv = np.cross(d[:, None], E2[None])          # (R, T, 3)
            det = np.einsum("rtk,tk->rt", pv, E1)
            inv = 1.0 / np.where(np.abs(det) < 1e-12, 1.0, det)
            tv = o[:, None] - V0[None]
            u = np.einsum("rtk,rtk->rt", tv, pv) * inv
            qv = np.cross(tv, E1[None])
            v = np.einsum("rk,rtk->rt", d, qv) * inv
            t = np.einsum("tk,rtk->rt", E2, qv) * inv
            ok = ((np.abs(det) >= 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (t > tmin[r0:r0 + 8192, None])
                  & (t < tmax[r0:r0 + 8192, None]))
            t = np.where(ok, t, np.inf)
            best[r0:r0 + 8192] = np.minimum(best[r0:r0 + 8192],
                                            t.min(axis=1))
    return best


def slab(lo, hi, org, inv, tmin, tmax):
    """(R, C) slab test: entry distance or inf."""
    t0 = (lo[None] - org[:, None]) * inv[:, None]        # (R, C, 3)
    t1 = (hi[None] - org[:, None]) * inv[:, None]
    enter = np.maximum(np.minimum(t0, t1).max(axis=-1), tmin[:, None])
    exit_ = np.minimum(np.maximum(t0, t1).min(axis=-1), tmax[:, None])
    return np.where(enter <= exit_, enter, np.inf)


def cluster_t(v0, e1, e2, org, dirn, tmin, tmax, cmap, n_cl):
    """Exact per-(ray, cluster) closest t (chunked)."""
    n = org.shape[0]
    out = np.full((n, n_cl), np.inf, np.float32)
    CH = 4096
    for t0c in range(0, v0.shape[0], CH):
        V0 = v0[t0c:t0c + CH]
        E1 = e1[t0c:t0c + CH]
        E2 = e2[t0c:t0c + CH]
        cm = cmap[t0c:t0c + CH]
        for r0 in range(0, n, 4096):
            o = org[r0:r0 + 4096]
            d = dirn[r0:r0 + 4096]
            pv = np.cross(d[:, None], E2[None])
            det = np.einsum("rtk,tk->rt", pv, E1)
            inv = 1.0 / np.where(np.abs(det) < 1e-12, 1.0, det)
            tv = o[:, None] - V0[None]
            u = np.einsum("rtk,rtk->rt", tv, pv) * inv
            qv = np.cross(tv, E1[None])
            v = np.einsum("rk,rtk->rt", d, qv) * inv
            t = np.einsum("tk,rtk->rt", E2, qv) * inv
            ok = ((np.abs(det) >= 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (t > tmin[r0:r0 + 4096, None])
                  & (t < tmax[r0:r0 + 4096, None]))
            t = np.where(ok, t, np.inf)
            # reduce to clusters present in this chunk
            for c in np.unique(cm):
                sel = cm == c
                out[r0:r0 + 4096, c] = np.minimum(
                    out[r0:r0 + 4096, c], t[:, sel].min(axis=1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="soup131")
    ap.add_argument("--nrays", type=int, default=16384)
    ap.add_argument("--bt", type=int, default=1024)
    ap.add_argument("--bq", type=int, default=128)
    args = ap.parse_args()

    if args.case.startswith("soup"):
        v0, e1, e2 = make_soup(131072)
        ctr, ext = np.zeros(3), np.full(3, 10.0)
    else:
        v0, e1, e2 = make_spheres_scene(114000)
        ctr, ext = np.zeros(3), np.full(3, 9.0)

    # Morton order + clusters, same as build_tri_pack
    from libyafaray_tpu.ops.pallas_intersect import morton_order

    order = morton_order(v0, e1, e2)
    v0, e1, e2 = v0[order], e1[order], e2[order]
    T = v0.shape[0]
    bt, bq = args.bt, args.bq
    Tp = ((T + bt - 1) // bt) * bt
    n_cl = Tp // bt
    pad = Tp - T
    if pad:
        v0p = np.concatenate([v0, np.full((pad, 3), 1e9, np.float32)])
        e1p = np.concatenate([e1, np.zeros((pad, 3), np.float32)])
        e2p = np.concatenate([e2, np.zeros((pad, 3), np.float32)])
    else:
        v0p, e1p, e2p = v0, e1, e2
    cmap = np.arange(Tp) // bt
    p1, p2 = v0p + e1p, v0p + e2p
    lo3 = np.minimum(np.minimum(v0p, p1), p2)
    hi3 = np.maximum(np.maximum(v0p, p1), p2)
    real = np.arange(Tp) < T
    lo3 = np.where(real[:, None], lo3, np.inf)
    hi3 = np.where(real[:, None], hi3, -np.inf)
    clo = lo3.reshape(n_cl, bt, 3).min(axis=1)
    chi = hi3.reshape(n_cl, bt, 3).max(axis=1)
    # sub-AABBs at 128 for sub-tight listing
    ns = bt // 128
    slo = lo3.reshape(n_cl * ns, 128, 3).min(axis=1)
    shi = hi3.reshape(n_cl * ns, 128, 3).max(axis=1)

    org, dirn = make_rays(args.nrays, "incoherent", ctr=ctr, ext=ext)
    tmin = np.full(args.nrays, 1e-3, np.float32)
    tmax = np.full(args.nrays, 1e9, np.float32)

    # ray sort (octant + origin morton), same as _ray_sort_perm
    lo = org.min(0)
    hi = org.max(0)
    q = np.clip((org - lo) / np.maximum(hi - lo, 1e-12) * 1023, 0,
                1023).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x

    m = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    octn = ((dirn[:, 0] < 0) | ((dirn[:, 1] < 0) << 1)
            | ((dirn[:, 2] < 0) << 2)).astype(np.uint32)
    perm = np.argsort((octn.astype(np.uint64) << np.uint64(30))
                      | m.astype(np.uint64), kind="stable")
    org, dirn = org[perm], dirn[perm]

    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn < 0, -1e-12, 1e-12), dirn)

    print(f"case={args.case} T={T} n_cl={n_cl} bt={bt} bq={bq} "
          f"rays={args.nrays}", flush=True)

    # exact per-(ray, cluster) t table (this is the slow part)
    tc = cluster_t(v0p, e1p, e2p, org, dirn, tmin, tmax, cmap, n_cl)
    print("cluster_t done", flush=True)

    # per-ray slab entries at cluster + sub granularity
    ent_cl = slab(clo, chi, org, inv, tmin, tmax)          # (R, C)
    ent_sub = slab(slo, shi, org, inv, tmin, tmax)         # (R, C*ns)
    sub_hit = np.isfinite(ent_sub).reshape(-1, n_cl, ns).any(axis=2)
    listed_ray = np.isfinite(ent_cl) & sub_hit             # sub-tight

    B = args.nrays // bq
    ent_blk = np.where(listed_ray, ent_cl, np.inf).reshape(
        B, bq, n_cl).min(axis=1)                           # (B, C)
    list_len = np.isfinite(ent_blk).sum(axis=1)

    # simulate the kernel: per block, clusters in ascending block-entry
    # order; maintain per-ray best-t; slab_any skip = any ray with
    # entry(cluster) <= best_t
    orderb = np.argsort(ent_blk, axis=1)
    mt_block = np.zeros(B, np.int64)
    mt_ray_equiv = 0  # per-ray front-to-back MT'd clusters (ceiling)
    for b in range(B):
        r0 = b * bq
        best = np.full(bq, np.inf, np.float32)
        tcb = tc[r0:r0 + bq]
        entb = np.where(listed_ray[r0:r0 + bq], ent_cl[r0:r0 + bq],
                        np.inf)
        for c in orderb[b]:
            if not np.isfinite(ent_blk[b, c]):
                break
            if not (entb[:, c] <= best).any():
                continue  # slab_any skip
            mt_block[b] += 1
            best = np.minimum(best, tcb[:, c])
    # per-ray ceiling: sort each ray's own listed clusters by its own
    # entry; count clusters until entry > own best-t-so-far
    ordr = np.argsort(np.where(listed_ray, ent_cl, np.inf), axis=1)
    for r in range(args.nrays):
        best = np.inf
        for c in ordr[r]:
            e = ent_cl[r, c]
            if not (np.isfinite(e) and listed_ray[r, c] and e <= best):
                break
            mt_ray_equiv += 1
            best = min(best, tc[r, c])

    print(f"list len/block: mean={list_len.mean():.1f} "
          f"p95={np.percentile(list_len, 95):.0f} of {n_cl}")
    print(f"MT'd clusters/block (slab_any, front-to-back): "
          f"mean={mt_block.mean():.1f} p95={np.percentile(mt_block, 95):.0f}")
    print(f"per-ray MT'd clusters (per-ray ceiling): "
          f"mean={mt_ray_equiv / args.nrays:.2f}")
    print(f"block tris tested/ray: {mt_block.mean() * bt:.0f}; "
          f"per-ray design would test: "
          f"{mt_ray_equiv / args.nrays * bt:.0f}")


if __name__ == "__main__":
    main()
