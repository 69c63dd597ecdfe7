"""Pair-path vs block-sweep evaluation on the real TPU chip.

One process (one cold-compile tax): for each case (131K soup, 114K
spheres surface scene) and ray kind, verifies the pair path == the
block sweep on-device, then chain-times both paths (closest + shadow)
plus the stage breakdown (entries prelude, row argsort, pair rounds).

Usage: python scripts/bench_pairs.py [--cases soup131,spheres114]
       [--nrays 262144] [--iters 6]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from bench_intersect import make_soup, make_spheres_scene, make_rays


def chain_time(fn, token_of, seed_args, iters=6):
    import jax
    import jax.numpy as jnp

    org = seed_args[0]

    def run(k):
        def body(i, o):
            out = fn(o, *seed_args[1:])
            return org + token_of(out) * 0.0

        o = jax.lax.fori_loop(0, k, body, org)
        return token_of(fn(o, *seed_args[1:]))

    r1 = jax.jit(run)
    np.asarray(r1(0))
    t0 = time.perf_counter()
    np.asarray(r1(0))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(r1(iters - 1))
    t_chain = time.perf_counter() - t0
    return max(1e-9, (t_chain - t_one) / (iters - 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="soup131,spheres114")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops import pallas_intersect as pli

    print(f"device: {jax.devices()[0]}", flush=True)
    nr = args.nrays

    for case in args.cases.split(","):
        if case.startswith("soup"):
            v0, e1, e2 = make_soup(131072)
            ctr, ext = np.zeros(3), np.full(3, 10.0)
        else:
            v0, e1, e2 = make_spheres_scene(114000)
            ctr, ext = np.zeros(3), np.full(3, 9.0)
        n_tris = v0.shape[0]
        order = pli.morton_order(v0, e1, e2)
        pack, cl8, s_ord = pli.build_tri_pack(
            jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), order=order)
        pack16 = jnp.pad(pack, ((0, 6), (0, 0)))
        bt = pack.shape[1] // cl8.shape[1]
        print(f"\n=== {case}: T={n_tris} BT={bt} n_cl={cl8.shape[1]} "
              f"K1={pli.PAIR_K1} K2={pli.PAIR_K2} ===", flush=True)

        rng = np.random.default_rng(9)
        filt = (rng.random((n_tris, 3))
                * (rng.random((n_tris, 1)) > 0.5)).astype(np.float32)
        tp = pack.shape[1]  # s_ord is padded to the bt multiple
        real = (np.arange(tp) < n_tris)[None, :]
        fcols = np.where(real, filt[s_ord].T, 1.0).astype(np.float32)
        filt4 = jnp.asarray(
            np.concatenate([fcols, np.zeros((1, tp), np.float32)]))
        logf4 = jnp.maximum(jnp.log(jnp.maximum(filt4, 1e-35)), -80.0)
        pack16s = jnp.concatenate(
            [pack, logf4[:3], jnp.zeros((3, pack.shape[1]), jnp.float32)],
            axis=0)

        for kind in ("incoherent", "coherent"):
            o_np, d_np = make_rays(nr, kind, ctr=ctr, ext=ext)
            org = jnp.asarray(o_np)
            dirn = jnp.asarray(d_np)
            tmin = jnp.full((nr,), 1e-3, jnp.float32)
            tmax = jnp.full((nr,), 1e9, jnp.float32)
            dist = jnp.asarray(
                rng.uniform(0.3, 1.5, nr).astype(np.float32) * ext[0])

            pairs_fn = jax.jit(lambda o, d: pli._closest_hit_pairs(
                pack, pack16, cl8, o, d, tmin, tmax, n_tris))
            fb_fn = jax.jit(lambda o, d: pli._closest_fb_tcol(
                pack, pack16, cl8, o, d, tmin, tmax, n_tris))

            if not args.skip_verify and kind == "incoherent":
                tp, cp = [np.asarray(x) for x in pairs_fn(org, dirn)]
                tf, cf = [np.asarray(x) for x in fb_fn(org, dirn)]
                hm = np.isfinite(tf)
                assert np.array_equal(np.isfinite(tp), hm), "hit mismatch"
                assert np.allclose(tp[hm], tf[hm], rtol=1e-5), (
                    f"t mismatch {np.abs(tp[hm] - tf[hm]).max()}")
                neq = (cp[hm] != cf[hm]).sum()
                # col may differ on exact-tie tris; t equality is the gate
                print(f"  verify: hits equal, t equal "
                      f"(col diffs on ties: {neq})", flush=True)

            t_p = chain_time(pairs_fn, lambda o: jnp.sum(
                jnp.isfinite(o[0]).astype(jnp.float32)), [org, dirn],
                args.iters)
            t_f = chain_time(fb_fn, lambda o: jnp.sum(
                jnp.isfinite(o[0]).astype(jnp.float32)), [org, dirn],
                args.iters)
            print(f"  closest {kind:10s}: pairs {t_p * 1e3:7.1f} ms "
                  f"({nr / t_p / 1e6:5.2f} Mrays/s)   "
                  f"block {t_f * 1e3:7.1f} ms "
                  f"({nr / t_f / 1e6:5.2f} Mrays/s)   "
                  f"speedup {t_f / t_p:4.2f}x", flush=True)

            sh_pairs = jax.jit(lambda o, d: pli._shadow_transmission_pairs(
                pack, pack16s, cl8, o, d, dist, n_tris))
            sh_fb = jax.jit(lambda o, d: jnp.exp(pli._shadow_fb_lg(
                pack, pack16s, cl8, o, d, dist, n_tris)))
            if not args.skip_verify and kind == "incoherent":
                a = np.asarray(sh_pairs(org, dirn))
                b = np.asarray(sh_fb(org, dirn))
                err = np.abs(a - b).max()
                assert err < 2e-3, f"shadow mismatch {err}"
                print(f"  verify shadow: max err {err:.2e}", flush=True)
            t_sp = chain_time(sh_pairs, lambda o: jnp.sum(o),
                              [org, dirn], args.iters)
            t_sf = chain_time(sh_fb, lambda o: jnp.sum(o),
                              [org, dirn], args.iters)
            print(f"  shadow  {kind:10s}: pairs {t_sp * 1e3:7.1f} ms "
                  f"({nr / t_sp / 1e6:5.2f} Mrays/s)   "
                  f"block {t_sf * 1e3:7.1f} ms   "
                  f"speedup {t_sf / t_sp:4.2f}x", flush=True)

        # stage breakdown on the incoherent batch
        o_np, d_np = make_rays(nr, "incoherent", ctr=ctr, ext=ext)
        org = jnp.asarray(o_np)
        dirn = jnp.asarray(d_np)
        n_sub = pli._pick_nsub(pack, bt)
        sub8 = pli._sub_aabbs(pack, n_tris) if n_sub > 1 else None

        def ent_fn(o, d):
            return pli._ray_cluster_entries(o, d, tmin, tmax, cl8,
                                            sub8=sub8, n_sub=n_sub)

        t_ent = chain_time(ent_fn, lambda e: jnp.sum(
            jnp.isfinite(e).astype(jnp.float32)), [org, dirn], args.iters)

        def sort_fn(o, d):
            e = ent_fn(o, d)
            i = jnp.argsort(e, axis=1).astype(jnp.int32)
            return jnp.take_along_axis(e, i, axis=1), i

        t_srt = chain_time(sort_fn, lambda o: jnp.sum(
            o[1][:, 0].astype(jnp.float32)), [org, dirn], args.iters)
        print(f"  stages: entries {t_ent * 1e3:.1f} ms; +row-argsort "
              f"{t_srt * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
