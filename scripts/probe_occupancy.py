"""Per-bounce live-lane occupancy probe (VERDICT r3 #5): renders a
deep-raydepth glass scene and reports what fraction of wavefront lanes
is still alive entering each bounce — the data the masked-lanes-vs-
compaction decision rests on (engine.py header).

Usage: python scripts/probe_occupancy.py [--scene cornell_path.xml]
           [--bounces 10] [--size 128] [--spp 16] [--cpu]
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
    ap.add_argument("--scene", default="cornell_path.xml")
    ap.add_argument("--bounces", type=int, default=10)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--time-sweep", action="store_true", dest="time_sweep")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from libyafaray_tpu.film.imagefilm import film_init
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.engine import make_sample_step
    from libyafaray_tpu.integrators.render import device_put_scene
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.scene.xml_parser import parse_xml_file

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = parse_xml_file(os.path.join(root, "scenes", args.scene))
    scene.render_params["width"] = args.size
    scene.render_params["height"] = args.size
    base = build_config(scene)
    cfg = RenderConfig(**{
        **base.__dict__, "integrator": "pathtracing",
        "bounces": args.bounces, "rr_min_bounces": args.bounces,
        "width": args.size, "height": args.size,
        "aa_samples": args.spp, "aa_passes": 1, "spp_batch": 1,
    })
    # rr_min_bounces = bounces disables Russian roulette so the numbers
    # isolate GEOMETRIC/absorption lane death; a second run keeps RR.
    cscene = scene.compile()
    arrays = device_put_scene(cscene)
    flags = jnp.ones((args.size, args.size), jnp.bool_)

    for rr, label in ((args.bounces, "no-RR"), (2, "RR-after-2")):
        from dataclasses import replace

        c = replace(cfg, rr_min_bounces=rr)
        step = jax.jit(make_sample_step(cscene.static, cscene.camera, c),
                       donate_argnums=(1,))
        f = film_init(args.size, args.size)
        f["rays"] = jnp.zeros((), jnp.float32)
        f["occupancy"] = jnp.zeros((args.bounces + 1,), jnp.float32)
        f["occupancy0"] = jnp.zeros((), jnp.float32)
        for _ in range(args.spp):
            f = step(arrays, f, flags)
        occ = np.asarray(f["occupancy"])
        n0 = float(f["occupancy0"])
        row = dict(label=label, scene=args.scene, bounces=args.bounces,
                   lanes=n0,
                   occupancy_pct=[round(100.0 * float(o) / max(n0, 1), 2)
                                  for o in occ])
        print(json.dumps(row), flush=True)

    if args.time_sweep:
        # marginal per-bounce cost: step time at bounce budget k minus
        # at k-1 — what a compacted deep phase could actually reclaim
        import time
        from dataclasses import replace

        times = []
        for k in range(0, args.bounces + 1, 2):
            c = replace(cfg, bounces=k, rr_min_bounces=2)
            step = jax.jit(
                make_sample_step(cscene.static, cscene.camera, c),
                donate_argnums=(1,))
            f = film_init(args.size, args.size)
            f["rays"] = jnp.zeros((), jnp.float32)
            f = step(arrays, f, flags)  # compile
            jax.block_until_ready(f["wsum"])
            t0 = time.perf_counter()
            for _ in range(args.spp):
                f = step(arrays, f, flags)
            jax.block_until_ready(f["wsum"])
            dt = (time.perf_counter() - t0) / args.spp
            times.append((k, round(dt * 1e3, 2)))
            print(json.dumps(dict(bounces=k, step_ms=times[-1][1])),
                  flush=True)


if __name__ == "__main__":
    main()
