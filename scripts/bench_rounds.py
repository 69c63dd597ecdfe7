"""On-device A/B of the multi-round resorted fine sweep (VERDICT r4
#1c) against the single-sweep fine path, closest-hit.

Usage: python scripts/bench_rounds.py [--cases soup131,spheres94,soup524]
       [--variants 0,3:4,3:8,4:4] [--out FILE]
variant "0" = rounds off (current default); "R:CAP" = R rounds, CAP
groups per round.  Paired in one process like bench_sort_ab.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from bench_intersect import (make_soup, make_spheres_scene, make_rays,
                             chain_time)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cases", default="soup131,spheres94,soup524")
    ap.add_argument("--variants", default="0,3:4,3:8,4:4")
    ap.add_argument("--kinds", default="incoherent,coherent")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops import pallas_intersect as pli

    print(f"device: {jax.devices()[0]}", flush=True)
    scenes = {}
    if "soup131" in args.cases:
        scenes["soup131"] = (make_soup(131072), np.zeros(3),
                             np.full(3, 10.0))
    if "spheres94" in args.cases:
        scenes["spheres94"] = (make_spheres_scene(94000), np.zeros(3),
                               np.full(3, 9.0))
    if "soup524" in args.cases:
        scenes["soup524"] = (make_soup(524288), np.zeros(3),
                             np.full(3, 10.0))

    results = []
    for name, ((v0, e1, e2), ctr, ext) in scenes.items():
        n_tris = v0.shape[0]
        order = pli.morton_order(v0, e1, e2)
        pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order)
        pack = jnp.asarray(pack)
        cl = jnp.asarray(cl)
        for kind in args.kinds.split(","):
            org, dirn = make_rays(args.nrays, kind, ctr=ctr, ext=ext)
            org_j, dirn_j = jnp.asarray(org), jnp.asarray(dirn)
            tmin = jnp.full((args.nrays,), 1e-4, jnp.float32)
            tmax = jnp.full((args.nrays,), jnp.inf, jnp.float32)
            base_t = None
            for var in args.variants.split(","):
                if ":" in var:
                    r, cap = var.split(":")
                    os.environ["LIBYAF_ROUNDS"] = r
                    os.environ["LIBYAF_RCAP"] = cap
                else:
                    os.environ["LIBYAF_ROUNDS"] = "0"
                # env knobs are read at TRACE time, and the module-level
                # jit CACHES traces by abstract args — without this the
                # first variant's executable silently serves every
                # later variant (identical-timing tell)
                pli.closest_hit_pallas.clear_cache()

                def f_closest(o, d):
                    t, tri, u, v, h = pli.closest_hit_pallas(
                        pack, cl, o, d, tmin, tmax, n_tris=n_tris)
                    return (t, tri)

                t_c = chain_time(f_closest, (org_j, dirn_j), args.iters)
                # exactness vs the variant-0 result on the same rays
                t_now, tri_now = jax.jit(f_closest)(org_j, dirn_j)
                if base_t is None:
                    base_t = (np.asarray(t_now), np.asarray(tri_now))
                    agree = 1.0
                else:
                    agree = float(np.mean(
                        (np.asarray(t_now) == base_t[0])
                        & (np.asarray(tri_now) == base_t[1])))
                row = dict(scene=name, n_tris=n_tris, kind=kind,
                           variant=var,
                           closest_ms=round(t_c * 1e3, 2),
                           closest_mrays=round(args.nrays / t_c / 1e6,
                                               2),
                           agree=agree)
                results.append(row)
                print(json.dumps(row), flush=True)
                if args.out:  # incremental: crashes keep earlier rows
                    with open(args.out, "a") as f:
                        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
