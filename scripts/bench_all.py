"""Benchmark the reference configs on the TPU (BASELINE.md).
Writes BENCH_ALL_raw.json with wall times + throughput (BENCH_ALL.md is
hand-curated from it). Run:
    python scripts/bench_all.py [--quick] [--only name1,name2]
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CONFIGS = [
    ("directlighting", "scenes/cornell.xml", {}),
    ("pathtracing",    "scenes/cornell_path.xml", {}),
    ("photonmapping",  "scenes/cornell_photon.xml", {}),
    ("SPPM",           "scenes/cornell_sppm.xml", {}),
    ("environment/IBL", "scenes/ibl_spheres.xml", {}),
    ("bidirectional",  "scenes/cornell_bidir.xml", {}),
]


def main():
    quick = "--quick" in sys.argv
    size = 256 if quick else 512
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    import jax

    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import render_scene

    rows = []
    for name, scene_path, over in CONFIGS:
        if only is not None and not any(o in name for o in only):
            continue
        scene = parse_xml_file(os.path.join(_REPO, scene_path))
        scene.render_params["width"] = size
        scene.render_params["height"] = size
        if quick:
            scene.render_params["AA_minsamples"] = 8
        t0 = time.perf_counter()
        res = render_scene(scene)
        wall = time.perf_counter() - t0
        img = res.image
        rows.append(dict(
            config=name, scene=scene_path, size=size,
            wall_s=round(wall, 2),
            render_s=round(res.stats.get("render_s", 0.0), 2),
            preprocess_s=round(res.stats.get("preprocess_s", 0.0), 2),
            rays=res.stats.get("rays", 0.0),
            mrays_per_s=round(res.mrays_per_sec, 1),
            mean=float(img.mean()),
        ))
        print(json.dumps(rows[-1]), flush=True)

    out = os.path.join(_REPO, "BENCH_ALL_raw.json")
    existing = []
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.append(dict(device=str(jax.devices()[0]), rows=rows))
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print("appended to BENCH_ALL_raw.json")


if __name__ == "__main__":
    main()
