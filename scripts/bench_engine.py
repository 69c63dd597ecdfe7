"""End-to-end engine benchmarks on the TPU chip, one process (single
tunnel warmup): headline Cornell PT, cornell_path steady, IBL ablations.
"""
from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def load(scene_name, integrator=None, res=512, spp=64, **over):
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig

    scene = parse_xml_file(os.path.join(_REPO, "scenes", scene_name))
    scene.render_params["width"] = res
    scene.render_params["height"] = res
    cfg = build_config(scene)
    kw = dict(cfg.__dict__, width=res, height=res, aa_samples=spp,
              aa_passes=1)
    if integrator:
        kw["integrator"] = integrator
    kw.update(over)
    return scene.compile(), RenderConfig(**kw)


def steady(cs, cfg, steps=8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libyafaray_tpu.film.imagefilm import film_init
    from libyafaray_tpu.integrators.engine import make_sample_step

    arrays = jax.device_put(cs.arrays)
    step = jax.jit(make_sample_step(cs.static, cs.camera, cfg),
                   donate_argnums=(1,))
    flags = jnp.ones((cfg.height, cfg.width), jnp.bool_)

    def fresh():
        f = film_init(cfg.height, cfg.width)
        f["rays"] = jnp.zeros((), jnp.float32)
        return f

    t0 = time.perf_counter()
    f = step(arrays, fresh(), flags)
    np.asarray(f["rays"])
    t_compile = time.perf_counter() - t0
    f = fresh()
    t0 = time.perf_counter()
    for _ in range(steps):
        f = step(arrays, f, flags)
    rays = float(np.asarray(f["rays"]))
    t_run = time.perf_counter() - t0
    return dict(compile_s=round(t_compile, 1),
                step_s=round(t_run / steps, 3),
                mrays=round(rays / t_run / 1e6, 1),
                full64_s=round(t_run / steps * 64, 1))


def main():
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)

    cs, cfg = load("cornell.xml", "pathtracing", spp=64,
                   bounces=4, rr_min_bounces=2)
    r = steady(cs, cfg)
    print(json.dumps(dict(case="cornell_headline", **r)), flush=True)

    cs, cfg = load("cornell_path.xml")
    r = steady(cs, cfg)
    print(json.dumps(dict(case="cornell_path", **r)), flush=True)

    # IBL ablations
    sys.argv = ["profile_ibl", "512", "6"]
    import scripts.profile_ibl as pibl

    pibl.main()


if __name__ == "__main__":
    main()
