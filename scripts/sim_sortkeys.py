"""Compare ray sort keys by per-block cluster-list union length.

The streaming block-sweep kernel's cost is proportional to the UNION of
its BQ rays' cluster lists (BENCH_ALL.md r3 iteration).  The shipped
key is (octant << 30) | morton10(origin).  This sim measures union
amplification for alternative keys at the real ray count — a better key
is a ~free throughput lever (host-side argsort is already in the
pipeline).

Keys compared:
  oct-morton   : shipped (8 direction buckets, 30-bit origin morton)
  dir16-morton : 6 major axes x 4x4 secondary grid (96 dir buckets)
  morton-dir   : origin morton major, direction minor (locality first)
  m6d          : interleaved 6D morton over (origin, direction)
  entrycl      : first-hit cluster id major, octant minor
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_intersect import make_soup, make_spheres_scene, make_rays


def spread10(x):
    x = x.astype(np.uint32)
    x = (x | (x << 16)) & np.uint32(0x030000FF)
    x = (x | (x << 8)) & np.uint32(0x0300F00F)
    x = (x | (x << 4)) & np.uint32(0x030C30C3)
    x = (x | (x << 2)) & np.uint32(0x09249249)
    return x


def morton10(p, lo, hi):
    q = np.clip((p - lo) / np.maximum(hi - lo, 1e-12) * 1023, 0,
                1023).astype(np.uint32)
    return (spread10(q[:, 0]) | (spread10(q[:, 1]) << 1)
            | (spread10(q[:, 2]) << 2)).astype(np.uint64)


def spread5_6(x):
    """Spread 5 bits with stride 6 (for 6D interleave)."""
    x = x.astype(np.uint64)
    out = np.zeros_like(x)
    for b in range(5):
        out |= ((x >> b) & 1) << (6 * b)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="soup131")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--bt", type=int, default=1024)
    ap.add_argument("--bq", type=int, default=128)
    ap.add_argument("--mode", default="incoherent")
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

    org0, dir0 = make_rays(args.nrays, args.mode, ctr=ctr, ext=ext)
    lo = org0.min(0)
    hi = org0.max(0)

    def slab_hits(org, dirn):
        inv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                             np.where(dirn < 0, -1e-12, 1e-12), dirn)
        per_ray = np.zeros(args.nrays, np.int32)
        B = args.nrays // bq
        per_blk = np.zeros(B, np.int32)
        first_cl = np.zeros(args.nrays, np.int64)
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
            ent = np.where(hit, enter, np.inf)
            first_cl[r0:r0 + CH] = ent.argmin(axis=1)
            hb = hit.reshape(-1, bq, n_cl).any(axis=1)
            per_blk[r0 // bq:(r0 + CH) // bq] = hb.sum(axis=1)
        return per_ray, per_blk, first_cl

    # unsorted pass once to get first-cluster ids for the entrycl key
    pr0, _, fc0 = slab_hits(org0, dir0)

    m_org = morton10(org0, lo, hi)
    octn = ((dir0[:, 0] < 0) | ((dir0[:, 1] < 0) << 1)
            | ((dir0[:, 2] < 0) << 2)).astype(np.uint64)

    # dir16: major axis (6) x 4x4 grid of the two minor components
    ax = np.abs(dir0).argmax(axis=1)
    sgn = (np.take_along_axis(dir0, ax[:, None], 1)[:, 0] < 0)
    face = (ax * 2 + sgn).astype(np.uint64)          # 0..5
    u_idx = (ax + 1) % 3
    v_idx = (ax + 2) % 3
    mag = np.abs(np.take_along_axis(dir0, ax[:, None], 1)[:, 0])
    du = np.take_along_axis(dir0, u_idx[:, None], 1)[:, 0] / mag
    dv = np.take_along_axis(dir0, v_idx[:, None], 1)[:, 0] / mag
    qu = np.clip(((du + 1) * 2).astype(np.int64), 0, 3).astype(np.uint64)
    qv = np.clip(((dv + 1) * 2).astype(np.int64), 0, 3).astype(np.uint64)
    dir16 = (face << 4) | (qu << 2) | qv             # 96 buckets

    # 6D morton: 5 bits origin per axis interleaved with 5 bits dir
    qo = np.clip((org0 - lo) / np.maximum(hi - lo, 1e-12) * 31, 0,
                 31).astype(np.uint64)
    qd = np.clip((dir0 * 0.5 + 0.5) * 31, 0, 31).astype(np.uint64)
    m6 = np.zeros(args.nrays, np.uint64)
    for i in range(3):
        m6 |= spread5_6(qo[:, i]) << np.uint64(i)
        m6 |= spread5_6(qd[:, i]) << np.uint64(3 + i)

    keys = {
        "oct-morton": (octn << np.uint64(30)) | m_org,
        "dir16-morton": (dir16 << np.uint64(30)) | m_org,
        "morton-dir": (m_org << np.uint64(7)) | dir16,
        "m6d": m6,
        "entrycl": ((fc0.astype(np.uint64) << np.uint64(10))
                    | (octn << np.uint64(7)) | (dir16 & np.uint64(0x7f))),
    }
    print(f"case={args.case} mode={args.mode} T={T} n_cl={n_cl} "
          f"bt={bt} bq={bq} rays={args.nrays} "
          f"per-ray mean={pr0.mean():.1f}")
    for name, k in keys.items():
        perm = np.argsort(k, kind="stable")
        _, pb, _ = slab_hits(org0[perm], dir0[perm])
        print(f"  {name:14s} union mean={pb.mean():6.1f} "
              f"p95={np.percentile(pb, 95):5.0f} "
              f"amp={pb.mean() / pr0.mean():.2f}x")


if __name__ == "__main__":
    main()
