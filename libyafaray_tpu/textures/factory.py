"""Texture factory (reference src/textures/* — SURVEY §2.5).

Image textures load through io/image.py into linear float32; procedural
textures (clouds/marble/wood/voronoi/musgrave/distorted_noise/blend/
rgb_cube) are host objects whose device evaluation lives in
textures/procedural.py.  This stage exposes `.image` lat-long/2-D arrays
for the background path; full shader-node evaluation is wired by the node
compiler (textures/nodes.py).
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from ..scene.params import ParamMap

log = logging.getLogger("libyafaray_tpu")


@dataclass
class HostTexture:
    tex_type: str
    params: ParamMap
    image: np.ndarray | None = None  # (H,W,3) linear float32 for image tex
    use_alpha: bool = False
    interpolate: str = "bilinear"

    @property
    def spec(self) -> tuple:
        """Static, hashable spec for jit specialization
        (textures/eval.py): ("image",) or (type, frozen-params)."""
        if self.tex_type == "image":
            return ("image",)
        frozen = tuple(
            sorted(
                (k, v) for k, v in self.params.items()
                if isinstance(v, (int, float, str, bool))
            )
        )
        return (self.tex_type, frozen)


def texture_from_params(params: ParamMap) -> HostTexture:
    ttype = params.get_str("type", "image")
    tex = HostTexture(tex_type=ttype, params=ParamMap(params))
    if ttype == "image":
        from ..io.image import load_image

        fname = params.get_str("filename", "")
        gamma = params.get_float("gamma", 1.0)
        cspace = params.get_str("color_space", "")
        tex.interpolate = params.get_str("interpolate", "bilinear")
        tex.use_alpha = params.get_bool("use_alpha", False)
        try:
            tex.image = load_image(fname, color_space=cspace, gamma=gamma)
        except Exception as e:  # noqa: BLE001 - parity: warn, don't fail
            log.warning("texture: cannot load %r (%s); using checker",
                        fname, e)
            c = np.indices((16, 16)).sum(axis=0) % 2
            tex.image = np.stack([c, c, c], axis=-1).astype(np.float32)
    return tex
