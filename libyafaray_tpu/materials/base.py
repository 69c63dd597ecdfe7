"""Material system — SoA parameter table + masked-family BSDF kernels.

Reference surface (SURVEY §2.4, include/core_api/material.h): material types
shinydiffusemat / glossy / coated_glossy / glass / rough_glass / blend_mat /
mask_mat / light_mat / null, with the interface {initBSDF, eval, sample, pdf,
getSpecular, emit, getTransparency, volumeTransmittance}.

TPU-native design: there is no per-hit virtual dispatch.  All materials of a
scene live in one struct-of-arrays table; the wavefront shading kernel
evaluates each *family* (diffuse-stack / glossy / dielectric) for ALL lanes
and selects by material-type mask — the expert-parallel analog of the
reference's per-material C++ classes (SURVEY §2.14).  For small family
counts this beats sorting; a material-sorted dispatch can be layered on
later without changing this module's math.

Conventions (SURVEY App. B):
  * `eval` returns f(wo,wi) for NON-delta lobes only; integrators multiply
    by |cos(wi,N)| / pdf themselves (NEE) or use `sample`'s throughput.
  * `sample` returns the ready throughput multiplier f·|cos|/pdf (for delta
    lobes: the specular color, cos/pdf folded away), plus pdf for MIS
    (0 ⇒ delta, no MIS) and flag lanes.
  * shinydiffuse energy split: mirror → transparency → translucency →
    diffuse, each consuming remaining energy; fresnel modulates mirror.
  * Oren-Nayar replaces Lambert when sigma > 0.
  * Glass: unpolarized dielectric fresnel, TIR ⇒ full reflect, Beer
    absorption via per-lane medium tracking, `fake_shadows` filter.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as vmath
from ..core.sampling import INV_PI, PI
from ..core.color import luminance

# material type codes
MT_NULL = 0
MT_SHINYDIFFUSE = 1
MT_GLOSSY = 2
MT_COATED_GLOSSY = 3
MT_GLASS = 4
MT_ROUGH_GLASS = 5
MT_BLEND = 6
MT_MASK = 7
MT_LIGHT = 8

MATERIAL_TYPE_NAMES = {
    "null": MT_NULL,
    "shinydiffusemat": MT_SHINYDIFFUSE,
    "glossy": MT_GLOSSY,
    "coated_glossy": MT_COATED_GLOSSY,
    "glass": MT_GLASS,
    "rough_glass": MT_ROUGH_GLASS,
    "blend_mat": MT_BLEND,
    "mask_mat": MT_MASK,
    "light_mat": MT_LIGHT,
}

# columns: every material row carries every column (unused = 0); the table
# is tiny (M ≲ hundreds) so this costs nothing and keeps gathers trivial.
_SCALAR_COLS = [
    "diffuse_reflect", "specular_reflect", "transparency", "translucency",
    "emit_strength", "ior", "sigma", "exponent", "exp_u", "exp_v",
    "glossy_reflect", "dispersion_power", "blend_value", "mask_threshold",
    "wireframe_amount", "tex_colorfac", "bump_strength",
    # per-material sampling controls (reference material.h [M]):
    # additionalDepth extends the ray-depth budget for paths that passed
    # through the material; samplingFactor raises adaptive-AA resampling
    # priority where the material is primarily visible
    "sampling_factor", "additional_depth",
]
_VEC3_COLS = [
    "diffuse_color", "mirror_color", "glossy_color", "filter_color",
    "absorption_sigma", "emit_color", "mask_color",
]
_INT_COLS = ["mtype", "sub_mat1", "sub_mat2", "tex_blend_mode",
             # shader-node slots (texture index, -1 = none)
             "tex_diffuse", "tex_glossy", "tex_bump", "tex_mirror",
             "tex_transparency", "tex_translucency", "tex_blend", "tex_mask",
             "tex_sigma_oren", "tex_ior",
             # compiled node-DAG program index (textures/nodes.py; -1 none)
             "node_prog"]
_BOOL_COLS = ["fresnel_effect", "anisotropic", "as_diffuse", "fake_shadows",
              "double_sided", "receive_shadows"]


def default_row() -> dict:
    row = {c: 0.0 for c in _SCALAR_COLS}
    row.update({c: (0.0, 0.0, 0.0) for c in _VEC3_COLS})
    row.update({c: -1 for c in _INT_COLS})
    row.update({c: False for c in _BOOL_COLS})
    row["mtype"] = MT_NULL
    row["ior"] = 1.0
    row["bump_strength"] = 1.0
    row["diffuse_reflect"] = 1.0
    row["glossy_reflect"] = 1.0
    row["receive_shadows"] = True
    row["tex_colorfac"] = 1.0
    row["tex_blend_mode"] = 0  # mix
    row["sampling_factor"] = 1.0
    return row


def build_material_table(rows: list[dict]) -> dict:
    """host rows -> dict of numpy SoA arrays (device-ready).

    Also builds `__pack__`, all columns concatenated into ONE (M, C) f32
    matrix: per-hit parameter fetch is then a single device gather instead
    of ~36 (TPU gathers have a large fixed cost — this is the single
    biggest shading-cost lever on small scenes)."""
    if not rows:
        rows = [default_row()]
    out = {}
    for c in _SCALAR_COLS:
        out[c] = np.asarray([r[c] for r in rows], np.float32)
    for c in _VEC3_COLS:
        out[c] = np.asarray([r[c] for r in rows], np.float32).reshape(len(rows), 3)
    for c in _INT_COLS:
        out[c] = np.asarray([r[c] for r in rows], np.int32)
    for c in _BOOL_COLS:
        out[c] = np.asarray([r[c] for r in rows], np.bool_)
    packed = [out[c][:, None].astype(np.float32) for c in _SCALAR_COLS]
    packed += [out[c].astype(np.float32) for c in _VEC3_COLS]
    packed += [out[c][:, None].astype(np.float32) for c in _INT_COLS]
    packed += [out[c][:, None].astype(np.float32) for c in _BOOL_COLS]
    out["__pack__"] = np.concatenate(packed, axis=1)
    return out


def gather_rows(mats: dict, mid):
    """Per-lane material parameters: ONE packed gather + free slicing."""
    if "__pack__" not in mats:
        return {k: v[mid] for k, v in mats.items()
                if not k.startswith("__")}
    p = mats["__pack__"][mid]  # (N, C)
    row = {}
    o = 0
    for c in _SCALAR_COLS:
        row[c] = p[:, o]
        o += 1
    for c in _VEC3_COLS:
        row[c] = p[:, o:o + 3]
        o += 3
    for c in _INT_COLS:
        row[c] = p[:, o].astype(jnp.int32)
        o += 1
    for c in _BOOL_COLS:
        row[c] = p[:, o] > 0.5
        o += 1
    return row


# ---------------------------------------------------------------------------
# shared lobe math
# ---------------------------------------------------------------------------


def oren_nayar_factor(sigma, n, wo, wi):
    """Qualitative Oren-Nayar multiplier on the Lambert lobe."""
    s2 = sigma * sigma
    a = 1.0 - 0.5 * s2 / (s2 + 0.33)
    b = 0.45 * s2 / (s2 + 0.09)
    cos_o = jnp.clip(vmath.dot(n, wo), -1.0, 1.0)
    cos_i = jnp.clip(vmath.dot(n, wi), -1.0, 1.0)
    sin_o = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_o * cos_o))
    sin_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    # cos(phi_i - phi_o) via projected directions
    wo_t = wo - cos_o[..., None] * n
    wi_t = wi - cos_i[..., None] * n
    denom = jnp.maximum(vmath.length(wo_t) * vmath.length(wi_t), 1e-9)
    cos_dphi = jnp.clip(vmath.dot(wo_t, wi_t) / denom, -1.0, 1.0)
    # alpha = max angle, beta = min angle; tan(beta) = sin(beta)/cos(beta)
    # and beta's cosine is the LARGER of the two cosines (bounded away
    # from 0 unless both directions graze)
    sin_alpha = jnp.maximum(sin_o, sin_i)
    tan_beta = jnp.minimum(sin_o, sin_i) / jnp.maximum(
        jnp.maximum(jnp.abs(cos_o), jnp.abs(cos_i)), 1e-3
    )
    on = a + b * jnp.maximum(cos_dphi, 0.0) * sin_alpha * tan_beta
    return jnp.where(sigma > 1e-6, on, 1.0)


def _as_exponent(row, hx, hy, hz):
    """Ashikhmin-Shirley exponent: isotropic `exponent` or anisotropic
    combination of exp_u/exp_v by the half-vector azimuth."""
    denom = jnp.maximum(1.0 - hz * hz, 1e-8)
    e_aniso = (row["exp_u"] * hx * hx + row["exp_v"] * hy * hy) / denom
    return jnp.where(row["anisotropic"], e_aniso, row["exponent"])


def glossy_eval_local(row, wo_l, wi_l):
    """Ashikhmin-Shirley glossy + coupled diffuse, in the local shading frame
    (z = normal).  Returns (f_glossy (N,3), f_diffuse (N,3)).
    Semantics of reference glossy_mat.cc / microfacet.h (Blinn / AS-aniso
    NDF, Schlick fresnel on the lobe, `as_diffuse` handled by caller)."""
    cos_o = jnp.maximum(wo_l[..., 2], 0.0)
    cos_i = jnp.maximum(wi_l[..., 2], 0.0)
    h = vmath.normalize(wo_l + wi_l)
    hz = jnp.clip(h[..., 2], -1.0, 1.0)
    e = _as_exponent(row, h[..., 0], h[..., 1], hz)
    wo_h = jnp.maximum(vmath.dot(wo_l, h), 1e-6)
    norm_iso = (row["exponent"] + 1.0) / (8.0 * PI)
    norm_aniso = jnp.sqrt(
        jnp.maximum((row["exp_u"] + 1.0) * (row["exp_v"] + 1.0), 0.0)
    ) / (8.0 * PI)
    norm = jnp.where(row["anisotropic"], norm_aniso, norm_iso)
    d = jnp.power(jnp.maximum(hz, 0.0), e)
    denom = wo_h * jnp.maximum(jnp.maximum(cos_o, cos_i), 1e-6)
    rs = row["glossy_reflect"]
    fr = rs + (1.0 - rs) * jnp.power(1.0 - wo_h, 5.0)  # Schlick on lobe
    spec = norm * d / denom * fr
    f_glossy = spec[..., None] * row["glossy_color"]

    # AS coupled diffuse (energy-compensated Lambert)
    k = 28.0 / (23.0 * PI)
    t_o = 1.0 - jnp.power(1.0 - 0.5 * cos_o, 5.0)
    t_i = 1.0 - jnp.power(1.0 - 0.5 * cos_i, 5.0)
    fd = k * row["diffuse_reflect"] * (1.0 - rs) * t_o * t_i
    f_diffuse = fd[..., None] * row["diffuse_color"]
    valid = (cos_o > 1e-6) & (cos_i > 1e-6)
    return (
        jnp.where(valid[..., None], f_glossy, 0.0),
        jnp.where(valid[..., None], f_diffuse, 0.0),
    )


def glossy_pdf_local(row, wo_l, wi_l, p_diffuse):
    """Mixture pdf of the glossy material's sampler (cosine + Blinn/AS)."""
    cos_i = jnp.maximum(wi_l[..., 2], 0.0)
    pdf_d = cos_i * INV_PI
    h = vmath.normalize(wo_l + wi_l)
    hz = jnp.clip(h[..., 2], 0.0, 1.0)
    e = _as_exponent(row, h[..., 0], h[..., 1], hz)
    wo_h = jnp.maximum(vmath.dot(wo_l, h), 1e-6)
    norm_iso = (row["exponent"] + 1.0) / (2.0 * PI)
    norm_aniso = jnp.sqrt(
        jnp.maximum((row["exp_u"] + 1.0) * (row["exp_v"] + 1.0), 0.0)
    ) / (2.0 * PI)
    norm = jnp.where(row["anisotropic"], norm_aniso, norm_iso)
    pdf_h = norm * jnp.power(hz, e)
    pdf_g = pdf_h / (4.0 * wo_h)
    return p_diffuse * pdf_d + (1.0 - p_diffuse) * pdf_g


def sample_blinn_h(row, u1, u2):
    """Sample a half-vector from the Blinn (iso) or AS-aniso NDF, local frame."""
    # isotropic
    e_iso = row["exponent"]
    cos_h_iso = jnp.power(jnp.clip(u1, 1e-9, 1.0), 1.0 / (e_iso + 1.0))
    phi_iso = 2.0 * PI * u2

    # anisotropic (AS): per-quadrant phi warp
    eu, ev = row["exp_u"], row["exp_v"]
    q = jnp.floor(u1 * 4.0)
    u1q = jnp.clip(u1 * 4.0 - q, 1e-9, 1.0 - 1e-7)
    phi_q = jnp.arctan(jnp.sqrt((eu + 1.0) / jnp.maximum(ev + 1.0, 1e-6))
                       * jnp.tan(0.5 * PI * u1q))
    phi_aniso = jnp.where(
        q == 0, phi_q,
        jnp.where(q == 1, PI - phi_q, jnp.where(q == 2, PI + phi_q, 2 * PI - phi_q)),
    )
    cphi_a, sphi_a = jnp.cos(phi_aniso), jnp.sin(phi_aniso)
    e_a = eu * cphi_a * cphi_a + ev * sphi_a * sphi_a
    cos_h_aniso = jnp.power(jnp.clip(u2, 1e-9, 1.0), 1.0 / (e_a + 1.0))

    use_a = row["anisotropic"]
    cos_h = jnp.where(use_a, cos_h_aniso, cos_h_iso)
    phi = jnp.where(use_a, phi_aniso, phi_iso)
    sin_h = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_h * cos_h))
    return jnp.stack([sin_h * jnp.cos(phi), sin_h * jnp.sin(phi), cos_h], axis=-1)


# ---------------------------------------------------------------------------
# shinydiffuse energy split (App. B)
# ---------------------------------------------------------------------------


def shinydiffuse_weights(row, cos_o):
    """Returns (w_mirror, w_transp, w_transl, w_diff) lane scalars after the
    sequential energy split; fresnel_effect modulates the mirror share."""
    kr = jnp.where(
        row["fresnel_effect"],
        vmath.fresnel_dielectric(jnp.abs(cos_o), jnp.maximum(row["ior"], 1.0 + 1e-5)),
        1.0,
    )
    acc = jnp.ones_like(cos_o)
    w_mirror = row["specular_reflect"] * kr * acc
    acc = acc * (1.0 - row["specular_reflect"] * kr)
    w_transp = row["transparency"] * acc
    acc = acc * (1.0 - row["transparency"])
    w_transl = row["translucency"] * acc
    acc = acc * (1.0 - row["translucency"])
    w_diff = row["diffuse_reflect"] * acc
    return w_mirror, w_transp, w_transl, w_diff
