"""Light factory: ParamMap -> light table row (+ synthetic emissive geometry
for intersectable lights, so BSDF-sampled MIS hits see them).

Reference: src/lights/* factories (SURVEY §2.6); parameter names follow the
reference XML schema (App. A).
"""
from __future__ import annotations

import logging
import math

import numpy as np

from ..scene.params import ParamMap
from .base import (
    LT_AREA, LT_DIRECTIONAL, LT_MESH, LT_POINT, LT_SPHERE, LT_SPOT, LT_SUN,
    default_light_row,
)

log = logging.getLogger("libyafaray_tpu")

_PI = math.pi


def light_from_params(params: ParamMap):
    """Returns (row, geometry) where geometry is None or a dict with
    pos (T,3,3) triangles + emit radiance (to be attached with a light_mat
    row by the scene)."""
    lt = params.get_str("type", "pointlight")
    row = default_light_row()
    row["enabled"] = params.get_bool("light_enabled", True)
    row["cast_shadows"] = params.get_bool("cast_shadows", True)
    row["photon_only"] = params.get_bool("photon_only", False)
    row["samples"] = max(1, params.get_int("samples", 1))
    color = np.asarray(params.get_rgb("color", (1.0, 1.0, 1.0)), np.float64)
    power = params.get_float("power", 1.0)
    geometry = None

    if lt == "pointlight":
        row["ltype"] = LT_POINT
        row["p0"] = params.get_point("from")
        row["intensity"] = tuple(color * power)
        row["is_delta"] = True

    elif lt == "spotlight":
        row["ltype"] = LT_SPOT
        row["p0"] = params.get_point("from")
        to = np.asarray(params.get_point("to"), np.float64)
        d = to - np.asarray(row["p0"], np.float64)
        d /= max(np.linalg.norm(d), 1e-12)
        row["direction"] = tuple(d)
        cone = params.get_float("cone_angle", 45.0)
        blend = params.get_float("blend", 0.15)
        cos_end = math.cos(math.radians(cone))
        cos_start = math.cos(math.radians(cone * (1.0 - blend)))
        row["cos_start"] = cos_start
        row["cos_end"] = cos_end
        row["spot_blend"] = blend
        row["intensity"] = tuple(color * power)
        row["is_delta"] = True
        # soft shadows: emitter jitter disk radius (0 = hard delta)
        if params.get_bool("soft_shadows", False):
            row["radius"] = params.get_float("shadowFuzzyness", 1.0)
            row["samples"] = max(row["samples"],
                                 params.get_int("samples", 8))

    elif lt in ("sunlight", "sun"):
        row["ltype"] = LT_SUN
        d = np.asarray(params.get_point("direction",
                                        params.get_point("from", (0, 0, 1))),
                       np.float64)
        # reference sunlight: `direction` points TOWARD the sun
        d /= max(np.linalg.norm(d), 1e-12)
        row["direction"] = tuple(-d)  # stored as light->scene direction
        angle = params.get_float("angle", 0.27)  # degrees angular radius
        row["cos_angle"] = math.cos(math.radians(max(angle, 1e-4)))
        row["radiance"] = tuple(color * power)
        row["samples"] = max(1, params.get_int("samples", 1))

    elif lt in ("directional",):
        row["ltype"] = LT_DIRECTIONAL
        d = np.asarray(params.get_point("direction",
                                        params.get_point("from", (0, 0, 1))),
                       np.float64)
        d /= max(np.linalg.norm(d), 1e-12)
        row["direction"] = tuple(-d)
        row["intensity"] = tuple(color * power)
        row["is_delta"] = True

    elif lt == "spherelight":
        row["ltype"] = LT_SPHERE
        row["p0"] = params.get_point("from")
        r = params.get_float("radius", 1.0)
        row["radius"] = r
        # radiance from total flux: L = Φ/(π·4πr²)
        rad = color * power / (4.0 * _PI * _PI * r * r)
        row["radiance"] = tuple(rad)
        row["area"] = 4.0 * _PI * r * r
        # intersectable (reference spherelight canIntersect): synthetic
        # emissive icosphere so BSDF-sampled hits see it; the engine MIS-
        # weights those hits with the CONE pdf (matching illumSample)
        row["intersectable"] = True
        from ..scene.mesh import make_sphere_mesh

        geometry = dict(
            pos=make_sphere_mesh(row["p0"], r, 0, subdiv=2)["pos"],
            radiance=tuple(rad))

    elif lt == "arealight":
        row["ltype"] = LT_AREA
        corner = np.asarray(params.get_point("corner"), np.float64)
        p1 = np.asarray(params.get_point("point1"), np.float64)
        p2 = np.asarray(params.get_point("point2"), np.float64)
        e1 = p1 - corner
        e2 = p2 - corner
        area = float(np.linalg.norm(np.cross(e1, e2)))
        row["p0"] = tuple(corner)
        row["e1"] = tuple(e1)
        row["e2"] = tuple(e2)
        row["area"] = max(area, 1e-12)
        # radiance from total flux: L = Φ/(π·A)
        rad = color * power / (_PI * max(area, 1e-12))
        row["radiance"] = tuple(rad)
        row["intersectable"] = True
        c = corner
        q = [c, c + e1, c + e1 + e2, c + e2]
        tris = np.asarray(
            [[q[0], q[1], q[2]], [q[0], q[2], q[3]]], np.float32
        )
        geometry = dict(pos=tris, radiance=tuple(rad))

    elif lt == "meshlight":
        # geometry resolved by the scene (object reference); radiance filled
        # there once total area is known
        row["ltype"] = LT_MESH
        row["intersectable"] = True
        row["double_sided"] = params.get_bool("double_sided", False)
        row["_object"] = params.get_str("object_name",
                                        str(params.get_int("object", 0)))
        row["_color"] = tuple(color)
        row["_power"] = power

    elif lt == "bglight":
        # created by the scene from the background (ibl flag) — stage:
        # lights/bglight.py fills the CDF tables
        row["ltype"] = 7  # LT_BACKGROUND
        row["samples"] = max(1, params.get_int("ibl_samples",
                                               params.get_int("samples", 16)))
        row["intersectable"] = True

    elif lt == "bgPortalLight":
        # portal re-sampling of the background through a mesh (reference
        # bgportallight.cc): area-sample the portal geometry, radiance from
        # the background along the sampled direction.  Estimator note: with
        # a portal light, background energy at non-specular vertices comes
        # exclusively through NEE (the engine zeroes diffuse-escape
        # background to avoid double counting) — unbiased when every escape
        # path crosses a portal, the light's intended use.
        from .base import LT_PORTAL

        row["ltype"] = LT_PORTAL
        row["_object"] = params.get_str("object_name",
                                        str(params.get_int("object", 0)))
        row["_color"] = (1.0, 1.0, 1.0)
        row["_power"] = params.get_float("power", 1.0)
        row["power"] = row["_power"]  # table field read by the sampler
        row["samples"] = max(1, params.get_int("samples", 16))
        row["intersectable"] = False

    elif lt == "ieslight":
        from .base import LT_IES
        from .ies import parse_ies

        row["ltype"] = LT_IES
        row["p0"] = params.get_point("from")
        to = np.asarray(params.get_point("to", (0, 0, -1)), np.float64)
        d = to - np.asarray(row["p0"], np.float64)
        n = np.linalg.norm(d)
        row["direction"] = tuple(d / n) if n > 1e-12 else (0.0, 0.0, -1.0)
        row["intensity"] = tuple(color * power)
        row["is_delta"] = True
        ies_file = params.get_str("file", params.get_str("filename", ""))
        try:
            row["_ies_profile"] = parse_ies(ies_file)
        except Exception as e:  # noqa: BLE001 — warn + isotropic fallback
            log.warning("ieslight: cannot parse %r (%s); isotropic",
                        ies_file, e)
            row["_ies_profile"] = np.ones(91, np.float32)

    else:
        log.warning("unknown light type %r; using pointlight", lt)
        row["ltype"] = LT_POINT
        row["p0"] = params.get_point("from")
        row["intensity"] = tuple(color * power)
        row["is_delta"] = True

    return row, geometry
