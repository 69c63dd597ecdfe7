"""VERDICT r2 next-step #2: where do the environment/IBL config's
seconds go?  Renders scenes/ibl_spheres.xml steady-state under ablations
and prints per-step timings (film donation chains the steps, so one
fetch times the whole run — block_until_ready is unreliable here).

Ablations:
  full        the config as parsed
  bilinear    mipmap textures forced to plain bilinear (no atlas LOD)
  notex       textures detached from materials entirely
  noibl       IBL light disabled (bg still visible; NEE skips it)
  spp4        spp_batch=4 (amortize per-step fixed cost)
"""
from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def build(variant: str, res: int):
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig

    path = os.path.join(_REPO, "scenes", "ibl_spheres.xml")
    text = open(path).read()
    if variant == "bilinear":
        text = text.replace("mipmap_trilinear", "bilinear").replace(
            "mipmap_ewa", "bilinear")
    if variant == "noibl":
        # the IBL light is appended at scene COMPILE from the bg spec —
        # disabling scene.lights rows misses it (r3 ablation bug)
        text = text.replace('<ibl bval="true"/>', '<ibl bval="false"/>')
    if variant == "nosphere":
        import re as _re

        text = _re.sub(r"<sphere name=\"s\d\">.*?</sphere>", "", text,
                       flags=_re.S)
    tmp = os.path.join(tempfile.gettempdir(), f"ibl_{variant}.xml")
    with open(tmp, "w") as f:
        f.write(text)
    # assets resolve relative to the scene file
    assets_src = os.path.join(_REPO, "scenes", "assets")
    assets_dst = os.path.join(tempfile.gettempdir(), "assets")
    if os.path.isdir(assets_src) and not os.path.isdir(assets_dst):
        import shutil

        shutil.copytree(assets_src, assets_dst)
    scene = parse_xml_file(tmp)
    scene.render_params["width"] = res
    scene.render_params["height"] = res
    if variant == "notex":
        for row in scene.materials:
            for k in ("tex_diffuse", "tex_glossy", "tex_mirror",
                      "tex_bump", "tex_transparency", "tex_translucency",
                      "tex_blend", "tex_sigma_oren"):
                if k in row:
                    row[k] = -1
            row["node_prog"] = -1
    cfg = build_config(scene)
    kw = dict(cfg.__dict__, width=res, height=res, aa_samples=4,
              aa_passes=1)
    if variant == "spp4":
        kw["spp_batch"] = 4
    if variant == "bounces1":
        kw["bounces"] = 1
        kw["raydepth"] = 2
    return scene.compile(), RenderConfig(**kw)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import jax
    import jax.numpy as jnp
    import numpy as np

    from libyafaray_tpu.film.imagefilm import film_init
    from libyafaray_tpu.integrators.engine import make_sample_step

    print(f"device: {jax.devices()[0]}  res={res} steps={steps}",
          flush=True)
    for variant in ("full", "bilinear", "noibl", "nosphere", "bounces1"):
        try:
            cs, cfg = build(variant, res)
        except Exception as e:  # noqa: BLE001
            print(json.dumps(dict(variant=variant, error=str(e)[:200])),
                  flush=True)
            continue
        arrays = jax.device_put(cs.arrays)
        step = jax.jit(make_sample_step(cs.static, cs.camera, cfg),
                       donate_argnums=(1,))
        flags = jnp.ones((res, res), jnp.bool_)

        def fresh():
            f = film_init(res, res)
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
        per = t_run / steps
        print(json.dumps(dict(
            variant=variant, compile_s=round(t_compile, 1),
            step_s=round(per, 3),
            mrays=round(rays / t_run / 1e6, 1))), flush=True)


if __name__ == "__main__":
    main()
