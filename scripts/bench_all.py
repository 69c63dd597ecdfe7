"""Benchmark all five reference configs on the TPU (BASELINE.md).
Writes BENCH_ALL.md with wall times + throughput. Run:
    python scripts/bench_all.py [--quick]
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
]


def main():
    quick = "--quick" in sys.argv
    size = 256 if quick else 512
    import jax

    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import render_scene

    rows = []
    for name, scene_path, over in CONFIGS:
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

    with open(os.path.join(_REPO, "BENCH_ALL.md"), "w") as f:
        f.write("# All-config TPU benchmark (device: %s)\n\n"
                % jax.devices()[0])
        f.write("| config | scene | res | wall s | render s | Mrays/s |"
                " mean |\n|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['config']} | {r['scene']} | {r['size']}² "
                    f"| {r['wall_s']} | {r['render_s']} "
                    f"| {r['mrays_per_s']} | {r['mean']:.4f} |\n")
        f.write("\nwall includes scene compile + jit compile; render_s is "
                "the pass loop (first pass includes jit).\n")
    print("wrote BENCH_ALL.md")


if __name__ == "__main__":
    main()
