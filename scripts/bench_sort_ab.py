"""Paired on-device A/B of the fine-sweep ray orderings (VERDICT r4 #1a).

Runs LIBYAF_SORT=morton vs LIBYAF_SORT=entry back-to-back in ONE process
(same tunnel, same compile cache temperature) for each (scene, ray-kind,
query) case, so the comparison is paired rather than cross-process.
The sort mode is read at trace time inside the fine-path wrappers, so
flipping os.environ between jits yields two distinct traces.

Usage: python scripts/bench_sort_ab.py [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_intersect import (make_soup, make_spheres_scene, make_rays,
                             chain_time)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cases", default="soup131,spheres94,soup524")
    ap.add_argument("--sorts", default="morton,entry")
    args = ap.parse_args()

    import jax  # noqa: F401
    import jax.numpy as jnp

    from libyafaray_tpu.ops import pallas_intersect as pli

    print(f"device: {jax.devices()[0]}", flush=True)
    scenes = {}
    if "soup131" in args.cases:
        scenes["soup131"] = (make_soup(131072), np.zeros(3), np.full(3, 10.0))
    if "spheres94" in args.cases:
        v = make_spheres_scene(94000)
        scenes["spheres94"] = (v, np.zeros(3), np.full(3, 9.0))
    if "soup524" in args.cases:
        scenes["soup524"] = (make_soup(524288), np.zeros(3), np.full(3, 10.0))

    results = []
    for name, ((v0, e1, e2), ctr, ext) in scenes.items():
        n_tris = v0.shape[0]
        order = pli.morton_order(v0, e1, e2)
        pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order)
        pack = jnp.asarray(pack)
        cl = jnp.asarray(cl)
        filt4 = jnp.zeros((4, n_tris), jnp.float32)
        for kind in ("coherent", "incoherent"):
            org, dirn = make_rays(args.nrays, kind, ctr=ctr, ext=ext)
            org_j, dirn_j = jnp.asarray(org), jnp.asarray(dirn)
            tmin = jnp.full((args.nrays,), 1e-4, jnp.float32)
            tmax = jnp.full((args.nrays,), jnp.inf, jnp.float32)
            dist = jnp.full((args.nrays,), 25.0, jnp.float32)
            for srt in args.sorts.split(","):
                os.environ["LIBYAF_SORT"] = srt
                # see bench_rounds.py: the module-level jit caches the
                # first sort mode's trace — clear or the A/B is void
                pli.closest_hit_pallas.clear_cache()
                pli.shadow_transmission_pallas.clear_cache()

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
                row = dict(scene=name, n_tris=n_tris, kind=kind, sort=srt,
                           closest_ms=round(t_c * 1e3, 2),
                           closest_mrays=round(args.nrays / t_c / 1e6, 2),
                           shadow_ms=round(t_s * 1e3, 2),
                           shadow_mrays=round(args.nrays / t_s / 1e6, 2))
                results.append(row)
                print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
