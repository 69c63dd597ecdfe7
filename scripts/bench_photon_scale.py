"""Photon gather at reference-scale budgets (VERDICT r3 #3; SURVEY §5.7
says the reference holds 10^6-10^7 photons).  Times the exact O(N*M)
flash sweep vs the Morton-culled streaming gather at 0.2M / 2M / 10M
photons, verifying equal results first.

Usage: python scripts/bench_photon_scale.py [--photons 200000,2000000,10000000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--photons", default="200000,2000000,10000000")
    ap.add_argument("--queries", type=int, default=65536)
    ap.add_argument("--radius-frac", type=float, default=0.01,
                    help="gather radius as a fraction of scene extent "
                         "(SPPM-initial-radius scale)")
    ap.add_argument("--skip-flash-above", type=int, default=3000000,
                    help="flash sweep is O(N*M); skip it above this")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops import photon_flash as pf
    from scripts.bench_intersect import chain_time

    print(f"device: {jax.devices()[0]}", flush=True)
    ext = 10.0
    radius = ext * 2 * args.radius_frac
    rng = np.random.default_rng(1)
    qp = jnp.asarray(rng.uniform(-ext, ext, (args.queries, 3)), jnp.float32)
    qn = rng.normal(size=(args.queries, 3))
    qn = jnp.asarray(qn / np.linalg.norm(qn, axis=1, keepdims=True),
                     jnp.float32)
    rad = jnp.full((args.queries,), radius, jnp.float32)

    for p in [int(x) for x in args.photons.split(",") if x]:
        # surface-ish photon cloud: points near a few planes + a blob
        pos = rng.uniform(-ext, ext, (p, 3)).astype(np.float32)
        pos[: p // 3, 2] = np.abs(pos[: p // 3, 2]) * 0.02 - ext  # floor
        val = rng.random((p, 3)).astype(np.float32) / p
        dirs = rng.normal(size=(p, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        valid = jnp.ones((p,), bool)
        posj, valj, dirj = (jnp.asarray(pos), jnp.asarray(val),
                            jnp.asarray(dirs))

        pack_c = jax.jit(pf.make_photon_pack_sorted)(posj, valid, dirj,
                                                     valj)
        jax.block_until_ready(pack_c["tbl"])

        def f_culled(q, tbl, cl_lo, cl_hi):
            p = dict(tbl=tbl, cl_lo=cl_lo, cl_hi=cl_hi)
            fl, ct = pf.density_culled(p, q, qn, rad)
            return (fl, ct)

        t_c = chain_time(f_culled, (qp, pack_c["tbl"], pack_c["cl_lo"],
                                    pack_c["cl_hi"]), 4)
        fl_c, ct_c = pf.density_culled(pack_c, qp, qn, rad)
        row = dict(photons=p, queries=args.queries, radius=radius,
                   culled_ms=round(t_c * 1e3, 2),
                   mean_cnt=round(float(jnp.mean(ct_c)), 2))

        if p <= args.skip_flash_above:
            pack_f = jax.jit(pf.make_photon_pack)(posj, valid, dirj, valj)
            jax.block_until_ready(pack_f["pos_t"])

            def f_flash(q, pos_t, dir_t, val_t):
                p = dict(pack_f, pos_t=pos_t, dir_t=dir_t, val_t=val_t)
                fl, ct = pf.density_flash(p, q, qn, rad)
                return (fl, ct)

            t_f = chain_time(f_flash, (qp, pack_f["pos_t"],
                                       pack_f["dir_t"], pack_f["val_t"]), 4)
            fl_f, ct_f = pf.density_flash(pack_f, qp, qn, rad)
            row["flash_ms"] = round(t_f * 1e3, 2)
            row["equal"] = bool(jnp.array_equal(ct_f, ct_c))
            row["flux_maxdiff"] = float(jnp.max(jnp.abs(fl_f - fl_c)))
            row["speedup"] = round(t_f / t_c, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
