"""Simulate the pair-granular multi-round design's economics (CPU).

Round 1: each ray takes its K1 nearest listed clusters (by slab entry).
Round 2: rays whose best-t still exceeds some remaining cluster's entry
take those clusters (capped K2, count the stragglers past the cap).
Reports total pairs/ray per round — the MT work driver for the pair
design — and straggler rates, using exact per-(ray, cluster) t from
sim_sweep_stats machinery (per-ray stats are ray-count independent).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_intersect import make_soup, make_spheres_scene, make_rays
from sim_sweep_stats import cluster_t, slab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="soup131")
    ap.add_argument("--nrays", type=int, default=8192)
    ap.add_argument("--bt", type=int, default=1024)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=16)
    args = ap.parse_args()

    if args.case.startswith("soup"):
        v0, e1, e2 = make_soup(131072)
        ctr, ext = np.zeros(3), np.full(3, 10.0)
    else:
        v0, e1, e2 = make_spheres_scene(114000)
        ctr, ext = np.zeros(3), np.full(3, 9.0)

    from libyafaray_tpu.ops.pallas_intersect import morton_order

    order = morton_order(v0, e1, e2)
    v0, e1, e2 = v0[order], e1[order], e2[order]
    T = v0.shape[0]
    bt = args.bt
    Tp = ((T + bt - 1) // bt) * bt
    n_cl = Tp // bt
    pad = Tp - T
    if pad:
        v0 = np.concatenate([v0, np.full((pad, 3), 1e9, np.float32)])
        e1 = np.concatenate([e1, np.zeros((pad, 3), np.float32)])
        e2 = np.concatenate([e2, np.zeros((pad, 3), np.float32)])
    cmap = np.arange(Tp) // bt
    p1, p2 = v0 + e1, v0 + e2
    lo3 = np.minimum(np.minimum(v0, p1), p2)
    hi3 = np.maximum(np.maximum(v0, p1), p2)
    real = np.arange(Tp) < T
    lo3 = np.where(real[:, None], lo3, np.inf)
    hi3 = np.where(real[:, None], hi3, -np.inf)
    clo = lo3.reshape(n_cl, bt, 3).min(axis=1)
    chi = hi3.reshape(n_cl, bt, 3).max(axis=1)

    org, dirn = make_rays(args.nrays, "incoherent", ctr=ctr, ext=ext)
    tmin = np.full(args.nrays, 1e-3, np.float32)
    tmax = np.full(args.nrays, 1e9, np.float32)
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn < 0, -1e-12, 1e-12), dirn)

    tc = cluster_t(v0, e1, e2, org, dirn, tmin, tmax, cmap, n_cl)
    ent = slab(clo, chi, org, inv, tmin, tmax)  # (R, C) entry or inf

    N = args.nrays
    listed = np.isfinite(ent)
    print(f"case={args.case} T={T} n_cl={n_cl} per-ray listed "
          f"mean={listed.sum(1).mean():.1f}")

    # round 1: K1 nearest listed
    k1 = args.k1
    idx = np.argsort(ent, axis=1)[:, :k1]
    r1_valid = np.take_along_axis(listed, idx, axis=1)
    pairs1 = r1_valid.sum()
    t1 = np.where(r1_valid, np.take_along_axis(tc, idx, axis=1), np.inf)
    best = t1.min(axis=1)

    # round 2: remaining clusters with entry < best
    ent2 = ent.copy()
    np.put_along_axis(ent2, idx, np.inf, axis=1)
    need = ent2 < best[:, None]
    cnt2 = need.sum(axis=1)
    stragglers = (cnt2 > args.k2).sum()
    pairs2 = np.minimum(cnt2, args.k2).sum()
    # exact best after round 2 (uncapped — correctness reference)
    t_all = np.where(ent < best[:, None] + 1e30, tc, np.inf)
    print(f"round1 pairs/ray: {pairs1 / N:.2f}  "
          f"resolved(no round-2 work): {(cnt2 == 0).mean() * 100:.1f}%")
    print(f"round2 pairs/ray: {pairs2 / N:.2f}  "
          f"cnt2 p95={np.percentile(cnt2, 95):.0f} "
          f"max={cnt2.max()}  stragglers>{args.k2}: "
          f"{stragglers} ({stragglers / N * 100:.3f}%)")
    print(f"total pairs/ray: {(pairs1 + pairs2) / N:.2f} "
          f"(block design at 262K would MT ~52 clusters/blk; "
          f"per-ray term ceiling ~5.5)")

    # shadow-ray profile: finite dist = scene-scale segment
    dist = np.random.default_rng(2).uniform(
        0.3, 1.5, N).astype(np.float32) * ext[0]
    ent_s = slab(clo, chi, org, inv, np.full(N, 5e-4, np.float32),
                 dist * (1 - 1e-4))
    ls = np.isfinite(ent_s).sum(axis=1)
    print(f"shadow per-ray listed (finite dist): mean={ls.mean():.1f} "
          f"p95={np.percentile(ls, 95):.0f} max={ls.max()}")


if __name__ == "__main__":
    main()
