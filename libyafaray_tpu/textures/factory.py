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


def _parse_ramp(params: ParamMap):
    """Color ramp / colorband (reference include/core_api/color_ramp.h,
    texture_t::colorRamp): up to N stops, each (position, color), with
    linear or constant interpolation of the texture intensity."""
    if not params.get_bool("use_color_ramp", False):
        return None
    n = params.get_int("ramp_num_items", 0)
    if n <= 0:
        return None
    items = []
    for i in range(n):
        c = params.get_color(f"ramp_item_{i}_color", (0.0, 0.0, 0.0, 1.0))
        pos = params.get_float(f"ramp_item_{i}_position",
                               i / max(n - 1, 1))
        items.append((float(pos), float(c[0]), float(c[1]), float(c[2])))
    items.sort()
    mode = params.get_str("ramp_interpolation", "linear").lower()
    return (mode, tuple(items))


def _parse_image_window(params: ParamMap):
    """Image-texture uv window (reference src/textures/imagetex.cc):
    xrepeat/yrepeat tiling, optional crop window, clipping mode
    (repeat/extend/clip/clipcube/checker), rot90, checker tile flags."""
    crop = (params.get_float("cropmin_x", 0.0),
            params.get_float("cropmin_y", 0.0),
            params.get_float("cropmax_x", 1.0),
            params.get_float("cropmax_y", 1.0))
    if crop == (0.0, 0.0, 1.0, 1.0):
        crop = None
    return (params.get_int("xrepeat", 1),
            params.get_int("yrepeat", 1),
            crop,
            params.get_str("clipping", "repeat").lower(),
            params.get_bool("rot90", False),
            params.get_bool("even_tiles", True),
            params.get_bool("odd_tiles", False))


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
        (textures/eval.py): ("image", window, ramp) or
        (type, frozen-params, ramp)."""
        ramp = _parse_ramp(self.params)
        if self.tex_type == "image":
            return ("image", _parse_image_window(self.params), ramp)
        frozen = tuple(
            sorted(
                (k, v) for k, v in self.params.items()
                if isinstance(v, (int, float, str, bool))
            )
        )
        return (self.tex_type, frozen, ramp)


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
