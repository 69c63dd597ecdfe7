"""Generate the cross-integrator golden images (SURVEY §4.3/§4.5).

Renders the SAME Cornell scene with pathtracing, photonmapping(+FG) and
SPPM at high sample counts on the CPU backend, and stores float EXRs
under scenes/goldens/.  tests/test_golden.py asserts (a) the three
goldens agree pairwise within an RMSE bound — the physics-parity proxy
prescribed by SURVEY §4.3 (no reference binary exists to compare
against, §0) — and (b) fresh renders match the stored goldens.

Run:  python scripts/make_goldens.py   (takes a while; CPU-jitted)
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SIZE = 96
SPP_PT = 256


def main(only: str = ""):
    import numpy as np

    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.io.exr import write_exr

    out_dir = os.path.join(_REPO, "scenes", "goldens")
    os.makedirs(out_dir, exist_ok=True)

    configs = {
        "pathtracing": dict(integrator="pathtracing", bounces=6,
                            rr_min_bounces=2, aa_samples=SPP_PT,
                            aa_passes=1),
        "photonmapping": dict(integrator="photonmapping", photons=200_000,
                              caustic_photons=50_000, fg_samples=24,
                              raydepth=4, aa_samples=24, aa_passes=1),
        "SPPM": dict(integrator="SPPM", sppm_photons=100_000,
                     sppm_passes=48, raydepth=4),
    }
    from libyafaray_tpu.integrators.render import render
    from libyafaray_tpu.integrators.photonmap import render_photonmap
    from libyafaray_tpu.integrators.sppm import render_sppm

    for name, over in configs.items():
        if only and only != "cornell":
            break
        s = parse_xml_file(os.path.join(_REPO, "scenes", "cornell.xml"))
        s.render_params["width"] = SIZE
        s.render_params["height"] = SIZE
        cfg = build_config(s)
        cfg = RenderConfig(**{**cfg.__dict__, "width": SIZE,
                              "height": SIZE, **over})
        cs = s.compile()
        t0 = time.time()
        if cfg.integrator == "photonmapping":
            res = render_photonmap(cs, cfg)
        elif cfg.integrator == "SPPM":
            res = render_sppm(cs, cfg)
        else:
            res = render(cs, cfg)
        img = np.asarray(res.image, np.float32)
        path = os.path.join(out_dir, f"cornell_{name}.exr")
        write_exr(path, img)
        print(f"{name}: {time.time()-t0:.1f}s mean={img.mean():.4f} "
              f"-> {path}", flush=True)

    imgs = {}
    if only and only != "cornell":
        configs = {}
    from libyafaray_tpu.io.exr import read_exr
    for name in configs:
        imgs[name] = read_exr(os.path.join(out_dir,
                                           f"cornell_{name}.exr"))
    names = list(imgs)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            rmse = float(np.sqrt(np.mean(
                (imgs[names[i]] - imgs[names[j]]) ** 2)))
            print(f"RMSE {names[i]} vs {names[j]}: {rmse:.4f}", flush=True)

    # r5 (VERDICT r4 #6): goldens for the remaining driver configs —
    # ibl_spheres (environment/IBL, BASELINE config #5) and
    # cornell_bidir — rendered through the session dispatch at each
    # scene's OWN integrator, gated by tests/test_golden.py.
    from libyafaray_tpu.scene.session import render_scene

    extra = {"ibl_spheres": dict(aa_samples=192, aa_passes=1),
             "cornell_bidir": dict(aa_samples=192, aa_passes=1)}
    for name, over in extra.items():
        if only and only not in (name, "extra"):
            continue
        s = parse_xml_file(os.path.join(_REPO, "scenes", f"{name}.xml"))
        s.render_params["width"] = SIZE
        s.render_params["height"] = SIZE
        s.render_params["AA_minsamples"] = over["aa_samples"]
        s.render_params["AA_passes"] = over["aa_passes"]
        t0 = time.time()
        res = render_scene(s)
        img = np.asarray(res.image, np.float32)
        path = os.path.join(out_dir, f"{name}.exr")
        write_exr(path, img)
        print(f"{name}: {time.time()-t0:.1f}s mean={img.mean():.4f} "
              f"-> {path}", flush=True)


if __name__ == "__main__":
    import sys as _sys

    main(_sys.argv[1] if len(_sys.argv) > 1 else "")
