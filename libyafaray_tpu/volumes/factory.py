"""Volume region factory (reference src/volumes/* — SURVEY §2.9)."""
from __future__ import annotations

import logging
from dataclasses import dataclass

from ..scene.params import ParamMap

log = logging.getLogger("libyafaray_tpu")

VOL_UNIFORM = 0
VOL_EXP = 1
VOL_NOISE = 2
VOL_GRID = 3
VOL_SKY = 4

_TYPES = {
    "UniformVolume": VOL_UNIFORM,
    "ExpDensityVolume": VOL_EXP,
    "NoiseVolume": VOL_NOISE,
    "GridVolume": VOL_GRID,
    "SkyVolume": VOL_SKY,
}


@dataclass(frozen=True)
class VolumeRegion:
    vtype: int
    bmin: tuple
    bmax: tuple
    sigma_a: float
    sigma_s: float
    l_e: float
    g: float  # phase anisotropy (reference keeps isotropic in practice)
    # exp density
    a: float = 1.0
    b: float = 1.0
    # noise volume
    sharpness: float = 1.0
    cover: float = 1.0
    density: float = 1.0


def volume_from_params(params: ParamMap) -> VolumeRegion:
    tname = params.get_str("type", "UniformVolume")
    if tname not in _TYPES:
        log.warning("unknown volume type %r; UniformVolume", tname)
        tname = "UniformVolume"
    return VolumeRegion(
        vtype=_TYPES[tname],
        bmin=(params.get_float("minX", -1.0), params.get_float("minY", -1.0),
              params.get_float("minZ", -1.0)),
        bmax=(params.get_float("maxX", 1.0), params.get_float("maxY", 1.0),
              params.get_float("maxZ", 1.0)),
        sigma_a=params.get_float("sigma_a", 0.05),
        sigma_s=params.get_float("sigma_s", 0.05),
        l_e=params.get_float("l_e", 0.0),
        g=params.get_float("g", 0.0),
        a=params.get_float("a", 1.0),
        b=params.get_float("b", 1.0),
        sharpness=params.get_float("sharpness", 1.0),
        cover=params.get_float("cover", 1.0),
        density=params.get_float("density", 1.0),
    )
