"""On-device A/B of the MXU Moller-Trumbore tile inside the gathered-
fine closest kernel (LIBYAF_MXU) vs the VPU tile.

The r5 probe showed the fine sweep is VPU-MT-bound (~5.35 us/step ~=
1.2 TFLOP/s f32 on the 128x1024 tile); the bilinear-form MXU tile
moves the O(rays x tris) work onto the systolic array, leaving a ~12
op/pair epilogue on the VPU.  r2's trial in the STREAM kernels ran the
dots at default (bf16) precision -> 0.7% wrong hits; this one runs
Precision.HIGHEST and reports both time and exact/near agreement vs
the VPU tile result.

  python scripts/bench_mxu_fine.py [--cases soup131,spheres94]
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
    ap.add_argument("--cases", default="soup131,spheres94")
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

    for name, ((v0, e1, e2), ctr, ext) in scenes.items():
        n_tris = v0.shape[0]
        order = pli.morton_order(v0, ctr, ext)
        pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order)
        pack = jnp.asarray(pack)
        cl = jnp.asarray(cl)
        for kind in args.kinds.split(","):
            org, dirn = make_rays(args.nrays, kind, ctr=ctr, ext=ext)
            org_j, dirn_j = jnp.asarray(org), jnp.asarray(dirn)
            tmin = jnp.full((args.nrays,), 1e-4, jnp.float32)
            tmax = jnp.full((args.nrays,), jnp.inf, jnp.float32)
            base = None
            for mxu in (False, True):
                pli.MXU_MT = mxu
                pli.closest_hit_pallas.clear_cache()

                def f_closest(o, d):
                    t, tri, u, v, h = pli.closest_hit_pallas(
                        pack, cl, o, d, tmin, tmax, n_tris=n_tris)
                    return (t, tri)

                t_c = chain_time(f_closest, (org_j, dirn_j), args.iters)
                t_now, tri_now = jax.jit(f_closest)(org_j, dirn_j)
                t_np, tri_np = np.asarray(t_now), np.asarray(tri_now)
                if base is None:
                    base = (t_np, tri_np)
                    agree = near = 1.0
                else:
                    same = (t_np == base[0]) & (tri_np == base[1])
                    agree = float(np.mean(same))
                    # near: same hit up to fp reassociation — t within
                    # 1e-4 relative (covers ULP-tie winner swaps)
                    ref = np.where(np.isfinite(base[0]), base[0], 0.0)
                    got = np.where(np.isfinite(t_np), t_np, 0.0)
                    both_miss = ~np.isfinite(base[0]) & ~np.isfinite(t_np)
                    close = np.abs(got - ref) <= 1e-4 * np.maximum(
                        1.0, np.abs(ref))
                    near = float(np.mean(
                        both_miss | (np.isfinite(base[0])
                                     & np.isfinite(t_np) & close)))
                row = dict(scene=name, n_tris=n_tris, kind=kind,
                           mxu=mxu, closest_ms=round(t_c * 1e3, 2),
                           closest_mrays=round(
                               args.nrays / t_c / 1e6, 2),
                           agree=round(agree, 6), near=round(near, 6))
                print(json.dumps(row), flush=True)
                if args.out:
                    with open(args.out, "a") as f:
                        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
