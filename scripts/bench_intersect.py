"""Intersector microbenchmark on the real TPU chip.

Measures closest-hit + shadow kernel throughput for scene sizes spanning
the r2 weak spot (VERDICT Weak #1): 2.6K tris (cornell_path class),
20K, 100K-tri soups, with coherent (camera-like) and incoherent
(bounce-like) ray batches.  Timing per the axon-tunnel rules
(memory/axon-tunnel-behaviors.md): block_until_ready is unreliable, so
each measurement chains ITERS dependent calls and does ONE host fetch;
per-call time = (t_chain - t_one) / (ITERS - 1).

Usage: python scripts/bench_intersect.py [--sizes 2600,20000,100000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_soup(n, seed=0, extent=10.0, tri_size=0.4):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, tri_size, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, tri_size, (n, 3)).astype(np.float32)
    return v0, e1, e2


def make_spheres_scene(n_target, seed=0, extent=10.0):
    """A realistic SURFACE scene at ~n_target tris: ~60 UV-sphere shells
    scattered in a box plus the box walls.  Unlike the volumetric soup
    (whose Morton clusters overlap pervasively — worst case for AABB
    culling), surface geometry gives clusters the tight, disjoint boxes
    real scenes have."""
    rng = np.random.default_rng(seed)
    n_sph = 60
    per = max(n_target // n_sph, 32)
    # rings x segs quads = 2*rings^2 -> 4*rings^2 tris ~ per
    rings = max(int(np.sqrt(per / 4)), 3)
    segs = 2 * rings
    v0s, e1s, e2s = [], [], []

    def add_quad_mesh(P):  # P: (R+1, S+1, 3) grid
        a = P[:-1, :-1].reshape(-1, 3)
        b = P[1:, :-1].reshape(-1, 3)
        c = P[1:, 1:].reshape(-1, 3)
        d = P[:-1, 1:].reshape(-1, 3)
        v0s.append(a); e1s.append(b - a); e2s.append(c - a)
        v0s.append(a); e1s.append(c - a); e2s.append(d - a)

    th = np.linspace(0, np.pi, rings + 1)
    ph = np.linspace(0, 2 * np.pi, segs + 1)
    T, Ph = np.meshgrid(th, ph, indexing="ij")
    unit = np.stack([np.sin(T) * np.cos(Ph), np.sin(T) * np.sin(Ph),
                     np.cos(T)], axis=-1)
    for _ in range(n_sph):
        ctr = rng.uniform(-0.8 * extent, 0.8 * extent, 3)
        rad = rng.uniform(0.08, 0.22) * extent
        add_quad_mesh(ctr + rad * unit)
    # box walls (coarse grids so wall clusters stay tight)
    g = np.linspace(-extent, extent, 17)
    G1, G2 = np.meshgrid(g, g, indexing="ij")
    E = np.full_like(G1, extent)
    for P in (np.stack([G1, G2, -E], -1), np.stack([G1, G2, E], -1),
              np.stack([G1, -E, G2], -1), np.stack([G1, E, G2], -1),
              np.stack([-E, G1, G2], -1), np.stack([E, G1, G2], -1)):
        add_quad_mesh(P)
    v0 = np.concatenate(v0s).astype(np.float32)
    e1 = np.concatenate(e1s).astype(np.float32)
    e2 = np.concatenate(e2s).astype(np.float32)
    keep = (np.linalg.norm(np.cross(e1, e2), axis=1) > 1e-10)
    return v0[keep], e1[keep], e2[keep]


def make_rays(n, kind, seed=1, ctr=None, ext=None):
    rng = np.random.default_rng(seed)
    ctr = np.zeros(3) if ctr is None else np.asarray(ctr)
    ext = np.full(3, 10.0) if ext is None else np.asarray(ext)
    if kind == "coherent":
        # camera-like: one origin cluster, SCANLINE-ordered targets —
        # the engine's wavefront lanes arrive in pixel order, so
        # consecutive rays are neighbors (representative of bounce 0)
        org = (ctr + np.array([0.0, 0.0, 3.0]) * ext
               + rng.normal(0, 0.02, (n, 3)) * ext).astype(np.float32)
        side = int(np.sqrt(n))
        gy, gx = np.meshgrid(np.linspace(-1, 1, side),
                             np.linspace(-1, 1, side), indexing="ij")
        tgt = np.stack([gx.ravel(), gy.ravel(), np.zeros(side * side)],
                       axis=1)
        tgt = np.concatenate([tgt, tgt[: n - len(tgt)]])[:n] * ext + ctr
        d = tgt.astype(np.float32) - org
    else:
        # bounce-like: origins inside the scene, directions uniform sphere
        org = (ctr + rng.uniform(-1, 1, (n, 3)) * ext).astype(np.float32)
        d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-12
    return org, d.astype(np.float32)


def chain_time(fn, args, iters=8):
    """Dependent-chain timing with ONE compiled program: a fori_loop
    whose body re-runs fn with an input perturbed by a finite token of
    the previous output (forces sequencing; t can be inf for misses so
    the token uses the last output).  block_until_ready is unreliable
    over this tunnel — per-call time = (t(iters) - t(1)) / (iters - 1)
    with a single host fetch per measurement.  Keeping ONE jit keeps the
    remote-compiled module small (an unrolled 8-call chain produced a
    6.4 MB MLIR module that took minutes per compile)."""
    import jax
    import jax.numpy as jnp

    org = args[0]

    # extra operands ride as jit ARGUMENTS — a closed-over concrete
    # array is embedded in the HLO as a constant and shipped through the
    # remote-compile tunnel (a 10M-photon pack = 640 MB body -> HTTP 413)
    def run(k, o, *extra):
        def body(i, o):
            out = fn(o, *extra)
            token = jnp.sum(out[-1].astype(jnp.float32))
            return o + token * 0.0
        o = jax.lax.fori_loop(0, k, body, o)
        out = fn(o, *extra)
        return jnp.sum(out[-1].astype(jnp.float32))

    r1 = jax.jit(run)
    np.asarray(r1(0, org, *args[1:]))  # compile once + warm
    t0 = time.perf_counter()
    np.asarray(r1(0, org, *args[1:]))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(r1(iters - 1, org, *args[1:]))
    t_chain = time.perf_counter() - t0
    return max(1e-9, (t_chain - t_one) / (iters - 1))


def scene_tris(name):
    """Real scene geometry (surfaces, not a volumetric soup — the
    representative culling case)."""
    from libyafaray_tpu.scene.xml_parser import parse_xml_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = parse_xml_file(os.path.join(repo, "scenes", name))
    # force tessellated spheres so the triangle count matches the r2
    # benchmark row for this scene class
    scene.analytic_spheres, sph = [], scene.analytic_spheres
    from libyafaray_tpu.scene.mesh import make_sphere_mesh

    for (c, r, m) in sph:
        scene.extra_tri_blocks.append(make_sphere_mesh(c, r, m))
    cs = scene.compile()
    tr = cs.arrays["tris"]
    n = cs.static.n_tris_real
    return (np.asarray(tr["v0"])[:n], np.asarray(tr["e1"])[:n],
            np.asarray(tr["e2"])[:n])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2600,20000,100000")
    ap.add_argument("--scenes", default="")
    ap.add_argument("--spheres", default="",
                    help="comma list of target tri counts for the "
                         "surface-scene generator")
    ap.add_argument("--nrays", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--verify", action="store_true",
                    help="check pallas results vs brute force on-device "
                         "(8K-ray subset) before timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops import pallas_intersect as pli

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    results = []
    cases = [("soup", int(s)) for s in args.sizes.split(",") if s]
    cases += [("scene", s) for s in args.scenes.split(",") if s]
    if args.spheres:
        cases += [("spheres", int(s)) for s in args.spheres.split(",")]
    for kind_geo, n_tris in cases:
        if kind_geo == "spheres":
            v0, e1, e2 = make_spheres_scene(n_tris)
            n_tris = v0.shape[0]
            ctr, ext = np.zeros(3), np.full(3, 9.0)
        elif kind_geo == "scene":
            v0, e1, e2 = scene_tris(n_tris)
            n_tris = v0.shape[0]
            # rays from inside the scene's bbox
            lo = (v0.min(0) + (v0 + e1).min(0)) / 2
            hi = (v0.max(0) + (v0 + e2).max(0)) / 2
            ctr, ext = (lo + hi) / 2, (hi - lo) * 0.45
        else:
            v0, e1, e2 = make_soup(n_tris)
            ctr, ext = np.zeros(3), np.full(3, 10.0)
        order = pli.morton_order(v0, e1, e2)
        pack, cl, _ = pli.build_tri_pack(v0, e1, e2, order)
        pack = jnp.asarray(pack)
        cl = jnp.asarray(cl)
        filt4 = jnp.zeros((4, n_tris), jnp.float32)  # opaque
        for kind in ("coherent", "incoherent"):
            org, dirn = make_rays(args.nrays, kind, ctr=ctr, ext=ext)
            org_j = jnp.asarray(org)
            dirn_j = jnp.asarray(dirn)
            tmin = jnp.full((args.nrays,), 1e-4, jnp.float32)
            tmax = jnp.full((args.nrays,), jnp.inf, jnp.float32)
            dist = jnp.full((args.nrays,), 25.0, jnp.float32)

            def f_closest(o, d):
                t, tri, u, v, h = pli.closest_hit_pallas(
                    pack, cl, o, d, tmin, tmax, n_tris=n_tris)
                return (t, tri)

            def f_shadow(o, d):
                tr = pli.shadow_transmission_pallas(
                    pack, cl, filt4, o, d, dist, n_tris=n_tris)
                return (tr,)

            if args.verify:
                from libyafaray_tpu.ops.intersect import (
                    closest_hit_brute, pad_triangles)

                k = 8192
                t_p, tri_p, _, _, hit_p = pli.closest_hit_pallas(
                    pack, cl, org_j[:k], dirn_j[:k], tmin[:k], tmax[:k],
                    n_tris=n_tris)
                v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, 512)
                hb = closest_hit_brute(
                    dict(v0=jnp.asarray(v0p), e1=jnp.asarray(e1p),
                         e2=jnp.asarray(e2p)),
                    org_j[:k], dirn_j[:k],
                    jnp.full((k,), 1e-4, jnp.float32), chunk=512)
                hp = np.asarray(hit_p)
                hbt = np.asarray(hb.hit)
                agree = float((hp == hbt).mean())
                m = hp & hbt
                tdiff = float(np.abs(np.asarray(t_p)[m]
                                     - np.asarray(hb.t)[m]).max()) \
                    if m.any() else 0.0
                print(json.dumps(dict(verify=kind, hit_agree=agree,
                                      t_maxdiff=tdiff)), flush=True)

            t_c = chain_time(f_closest, (org_j, dirn_j), args.iters)
            t_s = chain_time(f_shadow, (org_j, dirn_j), args.iters)
            mr_c = args.nrays / t_c / 1e6
            mr_s = args.nrays / t_s / 1e6
            row = dict(n_tris=n_tris, kind=kind, geo=kind_geo,
                       bt=int(pack.shape[1]) // int(cl.shape[1]),
                       closest_ms=round(t_c * 1e3, 2),
                       closest_mrays=round(mr_c, 1),
                       shadow_ms=round(t_s * 1e3, 2),
                       shadow_mrays=round(mr_s, 1))
            results.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
