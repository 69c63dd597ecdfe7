"""Light table + per-type sampling kernels.

Reference surface (SURVEY §2.6, include/core_api/light.h): illumSample /
illuminate / intersect / emitPhoton / totalEnergy per light class
(arealight, meshlight, bglight, pointlight, spherelight, spotlight,
sunlight, directional, ieslight, bgPortalLight).

TPU-native design: lights live in one SoA table; the integrator loops over
lights with STATIC indices (light counts are tiny), gathering a scalar row
and broadcasting over all lanes — so delta vs area strategies compile to
separate fused code per light with no per-lane divergence.

Radiometric conventions (internally consistent; goldens are self-rendered,
SURVEY §6):
  point/spot/ies:  intensity I = color·power;            Li = I/d² (delta)
  area/mesh:       radiance  L = color·power/(π·A_total); Li = L, MIS-able
  sphere:          radiance  L = color·power/(4π²·r²);    cone-sampled
  sun:             radiance  L = color·power, angular-radius cone (delta-ish)
  directional:     irradiance E = color·power (delta)
  background(IBL): radiance from the background CDF tables (lights/bglight)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as vmath
from ..core.sampling import PI, sample_cone, \
    sample_disk_concentric, sample_triangle

LT_POINT = 0
LT_AREA = 1
LT_SPHERE = 2
LT_SPOT = 3
LT_SUN = 4
LT_DIRECTIONAL = 5
LT_MESH = 6
LT_BACKGROUND = 7
LT_IES = 8
LT_PORTAL = 9

_F3 = ["p0", "e1", "e2", "direction", "radiance", "intensity"]
_F1 = ["power", "radius", "cos_start", "cos_end", "area", "cos_angle",
       "spot_blend"]
_I1 = ["ltype", "samples", "tri_start", "tri_count"]
_B1 = ["enabled", "cast_shadows", "is_delta", "intersectable", "photon_only",
       "double_sided"]


def default_light_row() -> dict:
    row = {k: (0.0, 0.0, 0.0) for k in _F3}
    row.update({k: 0.0 for k in _F1})
    row.update({k: 0 for k in _I1})
    row.update({k: False for k in _B1})
    row["enabled"] = True
    row["cast_shadows"] = True
    row["samples"] = 1
    row["tri_start"] = -1
    return row


def build_light_table(rows: list[dict]) -> dict:
    if not rows:
        rows = []
    n = len(rows)
    out = {}
    for k in _F3:
        out[k] = np.asarray([r[k] for r in rows], np.float32).reshape(n, 3)
    for k in _F1:
        out[k] = np.asarray([r[k] for r in rows], np.float32).reshape(n)
    for k in _I1:
        out[k] = np.asarray([r[k] for r in rows], np.int32).reshape(n)
    for k in _B1:
        out[k] = np.asarray([r[k] for r in rows], np.bool_).reshape(n)
    return out


def light_row(lights: dict, li: int) -> dict:
    """Scalar row for a static light index."""
    return {k: v[li] for k, v in lights.items()}


# ---- per-type implementations (static dispatch from the integrator) -------
# Each returns dict(wi (N,3), dist (N,), li (N,3), pdf (N,) solid-angle pdf
# (1 for delta lights), delta (static bool), valid (N,)).  The integrator
# loops lights with static indices so each light compiles to fused code.


def sample_point(row, p, u1, u2):
    d = row["p0"] - p
    dist2 = jnp.maximum(vmath.dot(d, d), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = d / dist[..., None]
    li = row["intensity"] / dist2[..., None]
    return dict(wi=wi, dist=dist, li=li, pdf=jnp.ones_like(dist), delta=True,
                valid=jnp.ones(dist.shape, jnp.bool_))


def sample_spot(row, p, u1, u2):
    out = sample_point(row, p, u1, u2)
    # soft shadows (reference spotlight soft_shadows/shadowFuzzyness):
    # jitter the emitter position on a disk ⊥ the spot axis; radius 0
    # (the default) keeps the exact delta light.  With samples > 1 the
    # NEE average resolves the penumbra.
    r_j = row["radius"]
    ax = row["direction"] + jnp.zeros_like(p)
    t1 = vmath.normalize(jnp.cross(ax, jnp.where(
        jnp.abs(ax[..., 2:3]) < 0.9,
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0]))))
    t2 = jnp.cross(ax, t1)
    dx, dy = sample_disk_concentric(u1, u2)
    p0 = (row["p0"] + (dx * r_j)[..., None] * t1
          + (dy * r_j)[..., None] * t2)
    dvec = p0 - p
    d2 = jnp.maximum(vmath.dot(dvec, dvec), 1e-12)
    dist = jnp.sqrt(d2)
    out["wi"] = dvec / dist[..., None]
    out["dist"] = dist
    out["li"] = row["intensity"] / d2[..., None]
    cos_a = vmath.dot(-out["wi"], row["direction"])
    cs, ce = row["cos_start"], row["cos_end"]
    t = jnp.clip((cos_a - ce) / jnp.maximum(cs - ce, 1e-6), 0.0, 1.0)
    fall = t * t * (3.0 - 2.0 * t)  # smoothstep falloff (reference `blend`)
    out["li"] = out["li"] * fall[..., None]
    out["valid"] = cos_a > ce
    return out


def sample_directional(row, p, u1, u2):
    wi = -row["direction"] + jnp.zeros_like(p)
    dist = jnp.full(p.shape[:-1], 1e8, jnp.float32)
    li = row["intensity"] + jnp.zeros_like(p)
    return dict(wi=vmath.normalize(wi), dist=dist, li=li,
                pdf=jnp.ones(dist.shape, jnp.float32), delta=True,
                valid=jnp.ones(dist.shape, jnp.bool_))


def sample_sun(row, p, u1, u2):
    axis = -row["direction"] + jnp.zeros_like(p)
    wi, pdf = sample_cone(vmath.normalize(axis), row["cos_angle"], u1, u2)
    dist = jnp.full(p.shape[:-1], 1e8, jnp.float32)
    li = row["radiance"] + jnp.zeros_like(p)
    return dict(wi=wi, dist=dist, li=li, pdf=pdf + jnp.zeros(dist.shape),
                delta=False, valid=jnp.ones(dist.shape, jnp.bool_))


def sample_area(row, p, u1, u2):
    q = row["p0"] + u1[..., None] * row["e1"] + u2[..., None] * row["e2"]
    ln = vmath.normalize(jnp.cross(row["e1"], row["e2"]) + jnp.zeros_like(p))
    d = q - p
    dist2 = jnp.maximum(vmath.dot(d, d), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = d / dist[..., None]
    cos_l = vmath.dot(ln, -wi)
    cos_l_eff = jnp.where(row["double_sided"], jnp.abs(cos_l), cos_l)
    pdf = dist2 / jnp.maximum(row["area"] * jnp.maximum(cos_l_eff, 1e-6), 1e-9)
    li = row["radiance"] + jnp.zeros_like(p)
    return dict(wi=wi, dist=dist, li=li, pdf=pdf, delta=False,
                valid=cos_l_eff > 1e-6)


def sample_sphere_light(row, p, u1, u2):
    c = row["p0"] - p
    dist_c2 = jnp.maximum(vmath.dot(c, c), 1e-12)
    dist_c = jnp.sqrt(dist_c2)
    axis = c / dist_c[..., None]
    sin_max2 = jnp.clip(row["radius"] * row["radius"] / dist_c2, 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_max2))
    wi, pdf = sample_cone(axis, cos_max, u1, u2)
    # distance to sphere surface along wi (for shadow ray length)
    b = vmath.dot(wi, c)
    det = jnp.maximum(b * b - dist_c2 + row["radius"] ** 2, 0.0)
    dist = b - jnp.sqrt(det)
    li = row["radiance"] + jnp.zeros_like(p)
    return dict(wi=wi, dist=jnp.maximum(dist, 1e-4), li=li,
                pdf=pdf + jnp.zeros(dist.shape), delta=False,
                valid=dist_c > row["radius"])


def sample_mesh_light(row, p, u1, u2, tri_cdf, tri_pos):
    """Area sampling over a meshlight's triangles.  tri_cdf: (T+1,) CDF over
    the light's triangle areas (area-weighted ⇒ uniform-by-area overall);
    tri_pos: (T,3,3) its triangle corners (pre-sliced at trace time)."""
    nt = tri_pos.shape[0]
    idx = jnp.clip(jnp.searchsorted(tri_cdf, u1, side="right") - 1, 0, nt - 1)
    lo = tri_cdf[idx]
    hi = tri_cdf[idx + 1]
    u1r = jnp.clip((u1 - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0 - 1e-7)
    b0, b1 = sample_triangle(u1r, u2)
    tp = tri_pos[idx]  # (N,3,3)
    q = (
        b0[..., None] * tp[:, 0] + b1[..., None] * tp[:, 1]
        + (1.0 - b0 - b1)[..., None] * tp[:, 2]
    )
    ln = vmath.normalize(jnp.cross(tp[:, 1] - tp[:, 0], tp[:, 2] - tp[:, 0]))
    d = q - p
    dist2 = jnp.maximum(vmath.dot(d, d), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = d / dist[..., None]
    cos_l = jnp.abs(vmath.dot(ln, -wi))
    pdf = dist2 / jnp.maximum(row["area"] * jnp.maximum(cos_l, 1e-6), 1e-9)
    li = row["radiance"] + jnp.zeros_like(p)
    return dict(wi=wi, dist=dist, li=li, pdf=pdf, delta=False,
                valid=cos_l > 1e-6)


def pdf_hit_area(row, p_from, hit_p, hit_ng, wi):
    """Solid-angle pdf that light-sampling would have produced the
    BSDF-sampled hit on this area/mesh light — the MIS counterpart term."""
    d = hit_p - p_from
    dist2 = jnp.maximum(vmath.dot(d, d), 1e-12)
    cos_l = jnp.abs(vmath.dot(hit_ng, -wi))
    return dist2 / jnp.maximum(row["area"] * jnp.maximum(cos_l, 1e-6), 1e-9)
