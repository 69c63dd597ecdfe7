"""TPU perf + physics gate probe (VERDICT r3 #6): renders one gated
config steady-state on the attached device and prints ONE JSON line
with throughput and (for the golden gate) RMSE vs the checked-in 512^2
EXR golden.  tests/test_tpu_gates.py asserts floors on these numbers so
a silent throughput or physics regression fails the suite instead of
only showing up at the next hand-run bench.

  python scripts/tpu_gate.py --what headline      # cornell.xml 512^2 PT
  python scripts/tpu_gate.py --what cornell_path  # 2.6K-tri glass+glossy
  python scripts/tpu_gate.py --what golden512     # RMSE vs goldens EXR
  python scripts/tpu_gate.py --what golden512 --make-golden  # (re)render
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

GOLDEN_PATH = os.path.join(_REPO, "scenes", "goldens",
                           "cornell_path_512.exr")
GOLDEN_SPP = 4096


def _build(scene_file: str, spp: int, seed: int = 0):
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.scene.xml_parser import parse_xml_file

    scene = parse_xml_file(os.path.join(_REPO, "scenes", scene_file))
    scene.render_params["width"] = 512
    scene.render_params["height"] = 512
    base = build_config(scene)
    cfg = RenderConfig(**{
        **base.__dict__, "integrator": "pathtracing", "bounces": 4,
        "rr_min_bounces": 2, "width": 512, "height": 512,
        "aa_samples": spp, "aa_passes": 1, "qmc_seed": seed,
    })
    return scene.compile(), cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", required=True,
                    choices=("headline", "cornell_path", "golden512"))
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--make-golden", action="store_true")
    args = ap.parse_args()

    import jax

    from libyafaray_tpu.integrators.render import render_timed

    if args.what == "headline":
        cscene, cfg = _build("cornell.xml", args.spp)
        res = render_timed(cscene, cfg, warmup=True)
        print(json.dumps({
            "what": "headline", "mrays": round(res.mrays_per_sec, 2),
            "render_s": round(res.stats["render_s"], 3),
            "device": str(jax.devices()[0])}))
        return

    if args.what == "cornell_path":
        cscene, cfg = _build("cornell_path.xml", args.spp)
        res = render_timed(cscene, cfg, warmup=True)
        print(json.dumps({
            "what": "cornell_path", "mrays": round(res.mrays_per_sec, 2),
            "render_s": round(res.stats["render_s"], 3),
            "device": str(jax.devices()[0])}))
        return

    # golden512: physics gate on the cornell_path PT image at 512^2.
    # The golden is an INDEPENDENT-seed render at GOLDEN_SPP, so the
    # gate bound is sampling noise of the measured render plus the
    # golden's own floor — not bitwise reproducibility across jax/XLA
    # versions.
    from libyafaray_tpu.io.exr import read_exr, write_exr

    if args.make_golden:
        cscene, cfg = _build("cornell_path.xml", GOLDEN_SPP, seed=0xB0B)
        res = render_timed(cscene, cfg, warmup=True)
        img = np.asarray(res.image, np.float32)
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        write_exr(GOLDEN_PATH, img, compression="PIZ")
        print(json.dumps({
            "what": "golden512", "made": True, "spp": GOLDEN_SPP,
            "mean": round(float(img.mean()), 6),
            "render_s": round(res.stats["render_s"], 3)}))
        return

    golden = read_exr(GOLDEN_PATH)
    if isinstance(golden, dict):  # multilayer reader returns {name: arr}
        golden = next(iter(golden.values()))
    golden = np.asarray(golden, np.float32)[..., :3]
    cscene, cfg = _build("cornell_path.xml", args.spp, seed=0)
    res = render_timed(cscene, cfg, warmup=True)
    img = np.asarray(res.image, np.float32)
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    print(json.dumps({
        "what": "golden512", "spp": args.spp, "rmse": round(rmse, 6),
        "mean": round(float(img.mean()), 6),
        "golden_mean": round(float(golden.mean()), 6),
        "mrays": round(res.mrays_per_sec, 2),
        "render_s": round(res.stats["render_s"], 3),
        "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
