"""Driver benchmark: Cornell-box path tracing throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
Baseline north star (BASELINE.md): 100 Mrays/s/chip.
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)


def main():
    import jax

    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.render import render_timed

    scene = parse_xml_file(os.path.join(_REPO, "scenes", "cornell.xml"))
    width = height = 512
    spp = 64
    scene.render_params["width"] = width
    scene.render_params["height"] = height
    cfg = build_config(scene)
    cfg = RenderConfig(**{
        **cfg.__dict__, "integrator": "pathtracing", "bounces": 4,
        "rr_min_bounces": 2, "width": width, "height": height,
        "aa_samples": spp, "aa_passes": 1,
    })
    cscene = scene.compile()
    res = render_timed(cscene, cfg, warmup=True)
    mrays = res.mrays_per_sec
    print(json.dumps({
        "metric": "cornell_pathtracing_throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "resolution": f"{width}x{height}", "spp": spp,
            "bounces": cfg.bounces, "rays": res.stats["rays"],
            "render_s": round(res.stats["render_s"], 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
