"""Exact-work simulation of the fine sweep's early-exit semantics
(VERDICT r4 #1c feasibility check, CPU-only).

For a scene + incoherent ray batch this computes, per ray, the TRUE
closest hit t* (threaded-BVH on CPU) and the set of SUB_BT sub-clusters
whose slab entry is <= t* — the clusters ANY front-to-back traversal
with exact early exit must test (the per-ray floor; the reference
kd-tree walk tests the same regions, SURVEY §2.3).  It then replays the
gathered-fine kernel's block-level early exit (block-sorted group keys,
FINE_GROUP quanta) under different ray orderings and under a
multi-round resort scheme, reporting group-step totals — the unit the
real kernel's runtime is proportional to (each group step = one
FINE_GROUP*SUB_BT tri tile DMA + MT sweep against bq rays).

Calibration: BENCH_ALL r4 measured soup131 incoherent closest at
~188 ms with the morton ordering; the morton row here supplies the
steps->ms constant, making the other rows runtime predictions.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # NOT setdefault: already set
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon

from bench_intersect import make_soup, make_spheres_scene, make_rays

SUB_BT = 128
GROUP = 8  # FINE_GROUP


def _spread(x):
    x = (x | (x << 16)) & np.uint32(0x030000FF)
    x = (x | (x << 8)) & np.uint32(0x0300F00F)
    x = (x | (x << 4)) & np.uint32(0x030C30C3)
    x = (x | (x << 2)) & np.uint32(0x09249249)
    return x


def morton_perm(org, dirn):
    lo, hi = org.min(0), org.max(0)
    q = ((org - lo) / np.maximum(hi - lo, 1e-12) * 511.0)
    q = np.clip(q, 0, 511).astype(np.uint32)
    m = _spread(q[:, 0]) | (_spread(q[:, 1]) << 1) | (_spread(q[:, 2]) << 2)
    octant = ((dirn[:, 0] < 0).astype(np.uint32)
              | ((dirn[:, 1] < 0).astype(np.uint32) << 1)
              | ((dirn[:, 2] < 0).astype(np.uint32) << 2))
    return np.argsort((octant << np.uint32(27)) | m, kind="stable")


def true_hits(v0, e1, e2, org, dirn, chunk=32768):
    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.accel.bvh import build_bvh
    from libyafaray_tpu.ops.bvh_traverse import closest_hit_bvh

    bvh = {k: jnp.asarray(a) for k, a in
           build_bvh(v0, e1, e2).items()}
    tris = {"v0": jnp.asarray(v0), "e1": jnp.asarray(e1),
            "e2": jnp.asarray(e2)}
    f = jax.jit(lambda o, d: closest_hit_bvh(bvh, tris, o, d))
    ts, tr = [], []
    for i in range(0, org.shape[0], chunk):
        h = f(jnp.asarray(org[i:i + chunk]), jnp.asarray(dirn[i:i + chunk]))
        ts.append(np.asarray(h.t))
        tr.append(np.where(np.asarray(h.hit), np.asarray(h.tri), -1))
    return np.concatenate(ts), np.concatenate(tr)


def entry_matrix(org, dirn, lo, hi, tmin, tmax, chunk=64):
    """(N, C) f32 slab entry, inf when the corridor misses."""
    n, c = org.shape[0], lo.shape[0]
    iv = 1.0 / np.where(np.abs(dirn) < 1e-12,
                        np.where(dirn < 0, -1e-12, 1e-12), dirn)
    out = np.empty((n, c), np.float32)
    for c0 in range(0, c, chunk):
        t0 = (lo[None, c0:c0 + chunk] - org[:, None]) * iv[:, None]
        t1 = (hi[None, c0:c0 + chunk] - org[:, None]) * iv[:, None]
        ent = np.maximum(np.minimum(t0, t1).max(-1), tmin[:, None])
        ext = np.minimum(np.maximum(t0, t1).min(-1), tmax[:, None])
        out[:, c0:c0 + chunk] = np.where(ent <= ext, ent, np.inf)
    return out


def block_steps(E, t_star, hitcl, bq, cap=None):
    """Replay the kernel's block early exit on entry matrix E (already
    in processing ray order).  Returns (steps_total, resolved_mask,
    processed_groups_per_block, block_group_orders).

    Per block: clusters sorted by block-min entry; group g's gate key =
    sorted key at slot g*GROUP (group 0 always runs).  Ray i processes
    groups until BOTH its hit cluster's group has run AND the next gate
    key exceeds t*_i; a miss ray runs every listed group.  Block runs
    max over its rays, capped at `cap` groups.  `resolved` = ray's exit
    arrived within the (possibly capped) processed prefix."""
    n, c = E.shape
    nb = n // bq
    steps = 0
    resolved = np.zeros(n, bool)
    ginfo = []
    for b in range(nb):
        sl = slice(b * bq, (b + 1) * bq)
        Eb = E[sl]
        key = Eb.min(0)
        order = np.argsort(key, kind="stable")
        count = int(np.isfinite(key).sum())
        if count == 0:
            ginfo.append((order, 0, 0))
            resolved[sl] = True
            continue
        ngr = (count + GROUP - 1) // GROUP
        gates = key[order[np.minimum(np.arange(1, ngr) * GROUP,
                                     c - 1)]]  # gate after group g-1
        ts = t_star[sl]
        # groups needed by the t*-bound: 1 + #gates <= t*
        need_t = 1 + (gates[None, :] <= ts[:, None]).sum(1)
        # group index of the ray's hit cluster within this block order
        pos = np.full(bq, 0, np.int64)
        hc = hitcl[sl]
        opos = np.empty(c, np.int64)
        opos[order] = np.arange(c)
        has = hc >= 0
        pos[has] = opos[hc[has]] // GROUP + 1
        need = np.maximum(need_t, pos)
        need[~has] = ngr  # miss rays drain the whole list
        need = np.minimum(need, ngr)
        g_run = int(need.max())
        if cap is not None:
            g_run = min(g_run, cap)
        steps += g_run
        resolved[sl] = need <= g_run
        ginfo.append((order, g_run, ngr))
    return steps, resolved, ginfo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="soup131")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--bq", type=int, default=128)
    ap.add_argument("--caps", default="4")
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--calib-ms", type=float, default=188.0,
                    help="measured ms for the morton row (soup131 incoh)")
    args = ap.parse_args()

    if args.case == "soup131":
        v0, e1, e2 = make_soup(131072)
        ctr, ext = np.zeros(3), np.full(3, 10.0)
    elif args.case == "soup524":
        v0, e1, e2 = make_soup(524288)
        ctr, ext = np.zeros(3), np.full(3, 10.0)
    else:
        v0, e1, e2 = make_spheres_scene(94000)
        ctr, ext = np.zeros(3), np.full(3, 9.0)

    from libyafaray_tpu.ops.pallas_intersect import morton_order

    order = np.asarray(morton_order(v0, e1, e2))
    T = v0.shape[0]
    inv_order = np.empty(T, np.int64)
    inv_order[order] = np.arange(T)
    v0s, e1s, e2s = v0[order], e1[order], e2[order]
    n_sc = (T + SUB_BT - 1) // SUB_BT
    pad = n_sc * SUB_BT - T
    if pad:
        v0s = np.concatenate([v0s, np.full((pad, 3), np.inf, np.float32)])
        e1s = np.concatenate([e1s, np.zeros((pad, 3), np.float32)])
        e2s = np.concatenate([e2s, np.zeros((pad, 3), np.float32)])
    p1, p2 = v0s + e1s, v0s + e2s
    lo = np.minimum(np.minimum(v0s, p1), p2).reshape(n_sc, SUB_BT, 3)
    hi = np.maximum(np.maximum(v0s, p1), p2).reshape(n_sc, SUB_BT, 3)
    lo, hi = lo.min(1), hi.max(1)

    org, dirn = make_rays(args.nrays, "incoherent", ctr=ctr, ext=ext)
    n = args.nrays

    t0 = time.time()
    t_star, tri_star = true_hits(v0, e1, e2, org, dirn)
    hitcl = np.where(tri_star >= 0, inv_order[np.maximum(tri_star, 0)]
                     // SUB_BT, -1).astype(np.int64)
    print(f"hits: {time.time()-t0:.1f}s  hit_rate="
          f"{(tri_star>=0).mean():.3f}", flush=True)

    t0 = time.time()
    tmin = np.full(n, 1e-4, np.float32)
    tmax = np.full(n, np.inf, np.float32)
    E = entry_matrix(org, dirn, lo, hi, tmin, tmax)
    print(f"entries: {time.time()-t0:.1f}s  "
          f"mean_entered={np.isfinite(E).sum(1).mean():.1f}", flush=True)

    # per-ray floor: clusters any exact front-to-back walk must test
    needed = (E <= np.where(np.isfinite(t_star), t_star,
                            np.inf)[:, None]).sum(1)
    # miss rays must drain their whole entered list
    miss = ~np.isfinite(t_star)
    needed[miss] = np.isfinite(E[miss]).sum(1)
    q = np.percentile(needed, [50, 90, 99])
    # floor in BLOCK units: perfect grouping shares each group-step
    # across bq rays
    floor_steps = int(np.ceil(np.ceil(needed / GROUP).clip(1).sum()
                              / args.bq))
    print(f"per-ray needed sub-clusters: mean={needed.mean():.1f} "
          f"p50={q[0]:.0f} p90={q[1]:.0f} p99={q[2]:.0f}", flush=True)

    res = {"case": args.case, "nrays": n, "n_sc": n_sc,
           "needed_mean": float(needed.mean())}

    def report(name, steps):
        res[name] = steps
        print(f"{name}: {steps} group-steps", flush=True)

    bq = args.bq
    # (a) morton ordering — the calibration row
    pm = morton_perm(org, dirn)
    sm, _, _ = block_steps(E[pm], t_star[pm], hitcl[pm], bq)
    report("morton_steps", sm)
    ms_per_step = args.calib_ms / sm

    # (b) corridor-head (entry) ordering
    head = np.where(np.isfinite(E).any(1), np.argmin(E, 1), n_sc)
    octant = ((dirn[:, 0] < 0).astype(np.uint32)
              | ((dirn[:, 1] < 0).astype(np.uint32) << 1)
              | ((dirn[:, 2] < 0).astype(np.uint32) << 2))
    pe = np.argsort((head.astype(np.uint64) << 3) | octant, kind="stable")
    se, _, _ = block_steps(E[pe], t_star[pe], hitcl[pe], bq)
    report("entry_steps", se)

    # (c) multi-round resort: cap groups per round, resort survivors by
    # their next unvisited needed cluster; per-ray visited sets masked.
    for cap in [int(c) for c in args.caps.split(",")]:
        Ew = E.copy()
        total = 0
        alive = np.ones(n, bool)
        tcur = np.full(n, np.inf, np.float32)
        for r in range(args.rounds):
            idx = np.where(alive)[0]
            head = np.where(np.isfinite(Ew[idx]).any(1),
                            np.argmin(Ew[idx], 1), n_sc)
            p = idx[np.argsort((head.astype(np.uint64) << 3)
                               | octant[idx], kind="stable")]
            npad = ((len(p) + bq - 1) // bq) * bq
            ppad = np.concatenate([p, p[:1].repeat(npad - len(p))])
            Eb = Ew[ppad]
            if npad > len(p):  # padding lanes: empty lists
                Eb[len(p):] = np.inf
            st, rs, gi = block_steps(Eb, t_star[ppad], hitcl[ppad], bq,
                                     cap=(None if r == args.rounds - 1
                                          else cap))
            total += st
            # mark visited clusters + fold hits found this round
            for b, (orderc, g_run, _) in enumerate(gi):
                sl = ppad[b * bq:(b + 1) * bq]
                vis = orderc[:g_run * GROUP]
                Ew[np.ix_(sl, vis)] = np.inf
                got = hitcl[sl] >= 0
                infront = np.zeros(len(sl), bool)
                if g_run:
                    opos = np.empty(n_sc, np.int64)
                    opos[orderc] = np.arange(n_sc)
                    infront[got] = opos[hitcl[sl][got]] < g_run * GROUP
                tcur[sl[infront]] = t_star[sl[infront]]
            Ew[Ew > tcur[:, None]] = np.inf  # tightened corridors
            alive[ppad[rs]] = False
            alive[np.where(~np.isfinite(Ew).any(1))[0]] = False
            print(f"  round {r}: steps={st} alive={alive.sum()}",
                  flush=True)
            if not alive.any():
                break
        report(f"rounds{cap}_steps", total)
        res[f"rounds{cap}_rounds_used"] = r + 1

    res["floor_steps"] = floor_steps
    res["ms_per_step"] = ms_per_step
    for k in res:
        if k.endswith("_steps"):
            ms = res[k] * ms_per_step
            print(f"{k[:-6]}: predicted {ms:.1f} ms -> "
                  f"{n / ms / 1e3:.2f} Mrays/s", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
