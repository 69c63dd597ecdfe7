"""Driver benchmark: path-tracing throughput on one chip, MULTI-SCALE.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "detail": {..., "configs": {...}}}

The headline metric stays the 512² Cornell (32 tris) for round-over-
round continuity; `detail.configs` adds cornell_path (2.6K tris) and a
generated 164K-tri grid-spheres scene so the driver-visible bench
covers the regimes where intersection cost actually lives (VERDICT r4
#2 — a large-scene regression can no longer hide).  Baseline north
star (BASELINE.md): 100 Mrays/s/chip on the Cornell config.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def _bench_scene(path, spp, overrides=None, size=512):
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.render import render_timed
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.scene.xml_parser import parse_xml_file

    scene = parse_xml_file(path)
    scene.render_params["width"] = size
    scene.render_params["height"] = size
    cfg = build_config(scene)
    cfg = RenderConfig(**{
        **cfg.__dict__, "width": size, "height": size,
        "aa_samples": spp, "aa_passes": 1, **(overrides or {}),
    })
    t0 = time.time()
    cscene = scene.compile()
    compile_s = time.time() - t0
    res = render_timed(cscene, cfg, warmup=True)
    return {
        "mrays": round(res.mrays_per_sec, 3),
        "render_s": round(res.stats["render_s"], 3),
        "rays": float(res.stats["rays"]),
        "spp": spp,
        "n_tris": int(cscene.static.n_tris_real),
        "scene_compile_s": round(compile_s, 2),
    }


def main():
    import jax

    results = {}
    # 1) headline: 32-tri Cornell, same protocol as r1-r4
    results["cornell"] = _bench_scene(
        os.path.join(_REPO, "scenes", "cornell.xml"), spp=64,
        overrides=dict(integrator="pathtracing", bounces=4,
                       rr_min_bounces=2))
    # 2) cornell_path: 2.6K tris, the scene's own pathtracing config
    results["cornell_path"] = _bench_scene(
        os.path.join(_REPO, "scenes", "cornell_path.xml"), spp=16)
    # 3) generated 164K-tri grid-spheres (the weak regime, VERDICT r4)
    big = "/tmp/bench_grid_164k.xml"
    if not os.path.exists(big):
        subprocess.run(
            [sys.executable,
             os.path.join(_REPO, "scripts", "make_large_scene.py"),
             "--grid", "4", "--subdiv", "4", "--out", big],
            check=True, capture_output=True)
    results["grid_spheres_164k"] = _bench_scene(big, spp=4)

    mrays = results["cornell"]["mrays"]
    print(json.dumps({
        "metric": "cornell_pathtracing_throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "resolution": "512x512",
            "device": str(jax.devices()[0]),
            "configs": results,
        },
    }))


if __name__ == "__main__":
    main()
