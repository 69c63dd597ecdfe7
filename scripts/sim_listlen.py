"""List-length-only sim at full ray count (slab tests only, CPU-cheap).

Block coherence depends on ray count (262K sorted rays make each
BQ-block's Morton box 32x tighter than 8K rays), so sim_sweep_stats'
8K-ray block stats understate coherence.  This measures per-block
cluster-list lengths and per-ray list lengths at the real 262K count.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_intersect import make_soup, make_spheres_scene, make_rays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="soup131")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--bt", type=int, default=1024)
    ap.add_argument("--bq", type=int, default=128)
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
    bt, bq = args.bt, args.bq
    Tp = ((T + bt - 1) // bt) * bt
    n_cl = Tp // bt
    pad = Tp - T
    if pad:
        v0 = np.concatenate([v0, np.full((pad, 3), 1e9, np.float32)])
        e1 = np.concatenate([e1, np.zeros((pad, 3), np.float32)])
        e2 = np.concatenate([e2, np.zeros((pad, 3), np.float32)])
    p1, p2 = v0 + e1, v0 + e2
    lo3 = np.minimum(np.minimum(v0, p1), p2)
    hi3 = np.maximum(np.maximum(v0, p1), p2)
    real = np.arange(Tp) < T
    lo3 = np.where(real[:, None], lo3, np.inf)
    hi3 = np.where(real[:, None], hi3, -np.inf)
    clo = lo3.reshape(n_cl, bt, 3).min(axis=1)
    chi = hi3.reshape(n_cl, bt, 3).max(axis=1)

    org, dirn = make_rays(args.nrays, "incoherent", ctr=ctr, ext=ext)
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
            | ((dirn[:, 2] < 0) << 2)).astype(np.uint64)
    perm = np.argsort((octn << np.uint64(30)) | m.astype(np.uint64),
                      kind="stable")
    org, dirn = org[perm], dirn[perm]
    inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                         np.where(dirn < 0, -1e-12, 1e-12), dirn)

    B = args.nrays // bq
    per_ray = np.zeros(args.nrays, np.int32)
    per_blk = np.zeros(B, np.int32)
    CH = 16384
    for r0 in range(0, args.nrays, CH):
        o = org[r0:r0 + CH]
        iv = inv[r0:r0 + CH]
        t0 = (clo[None] - o[:, None]) * iv[:, None]
        t1 = (chi[None] - o[:, None]) * iv[:, None]
        enter = np.maximum(np.minimum(t0, t1).max(axis=-1), 1e-3)
        exit_ = np.maximum(t0, t1).min(axis=-1)
        hit = enter <= exit_
        per_ray[r0:r0 + CH] = hit.sum(axis=1)
        hb = hit.reshape(-1, bq, n_cl).any(axis=1)
        per_blk[r0 // bq:(r0 + CH) // bq] = hb.sum(axis=1)

    print(f"case={args.case} T={T} n_cl={n_cl} bt={bt} bq={bq} "
          f"rays={args.nrays}")
    print(f"per-ray listed: mean={per_ray.mean():.1f} "
          f"p95={np.percentile(per_ray, 95):.0f}")
    print(f"per-block union: mean={per_blk.mean():.1f} "
          f"p95={np.percentile(per_blk, 95):.0f} of {n_cl}")
    print(f"union amplification: {per_blk.mean() / per_ray.mean():.2f}x")


if __name__ == "__main__":
    main()
