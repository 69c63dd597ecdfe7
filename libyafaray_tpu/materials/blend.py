"""blend_mat / mask_mat resolution (reference src/materials/blendmat.cc,
maskmat.cc — SURVEY §2.4).

blend_mat delegates every BSDF call to two child materials with
interpolated weights; mask_mat switches binarily by a texture threshold.
Wavefront resolution: when the scene contains any blend/mask material
(static flag), the shading wrappers below gather BOTH child rows and
  eval/pdf  -> lerp of the children's values
  sample    -> stochastic child pick (prob = blend factor), with the
               mixture pdf for MIS
One nesting level is resolved (a blend of blends warns at factory time) —
matching practical reference usage.
The blend factor comes from row["blend_value"], which apply_textures has
already overridden from the blend_shader slot when mapped; mask_mat
thresholds the mask texture the same way.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as vmath
from . import bsdf
from .base import MT_BLEND, MT_MASK, gather_rows


def _blend_factor(row):
    a = row["blend_value"]
    is_mask = row["mtype"] == MT_MASK
    a = jnp.where(is_mask,
                  (row["blend_value"] > row["mask_threshold"])
                  .astype(jnp.float32), a)
    return jnp.clip(a, 0.0, 1.0)


def _is_composite(row):
    return (row["mtype"] == MT_BLEND) | (row["mtype"] == MT_MASK)


def _child_rows(mats, row):
    m = mats["mtype"].shape[0]
    ra = gather_rows(mats, jnp.clip(row["sub_mat1"], 0, m - 1))
    rb = gather_rows(mats, jnp.clip(row["sub_mat2"], 0, m - 1))
    return ra, rb


def eval_bsdf(mats, row, n, ng, wo, wi, has_blend: bool,
              families=None):
    f = bsdf.eval_bsdf(row, n, ng, wo, wi, families=families)
    if not has_blend:
        return f
    comp = _is_composite(row)
    ra, rb = _child_rows(mats, row)
    a = _blend_factor(row)[..., None]
    fa = bsdf.eval_bsdf(ra, n, ng, wo, wi, families=families)
    fb = bsdf.eval_bsdf(rb, n, ng, wo, wi, families=families)
    return jnp.where(comp[..., None], (1.0 - a) * fa + a * fb, f)


def pdf_bsdf(mats, row, n, ng, wo, wi, has_blend: bool,
             families=None):
    p = bsdf.pdf_bsdf(row, n, ng, wo, wi, families=families)
    if not has_blend:
        return p
    comp = _is_composite(row)
    ra, rb = _child_rows(mats, row)
    a = _blend_factor(row)
    pa = bsdf.pdf_bsdf(ra, n, ng, wo, wi, families=families)
    pb = bsdf.pdf_bsdf(rb, n, ng, wo, wi, families=families)
    return jnp.where(comp, (1.0 - a) * pa + a * pb, p)


def sample_bsdf(mats, row, n, ng, wo, u1, u2, u_lobe, has_blend: bool,
                wavelength=None, families=None):
    if not has_blend:
        return bsdf.sample_bsdf(row, n, ng, wo, u1, u2, u_lobe,
                                wavelength=wavelength, families=families)
    comp = _is_composite(row)
    ra, rb = _child_rows(mats, row)
    a = _blend_factor(row)
    # stochastic child pick; remap u_lobe to keep stratification
    pick_b = u_lobe < a
    u_rem = jnp.where(pick_b,
                      u_lobe / jnp.maximum(a, 1e-8),
                      (u_lobe - a) / jnp.maximum(1.0 - a, 1e-8))
    row_sel = {
        k: jnp.where(
            comp if row[k].ndim == 1 else comp[..., None],
            jnp.where(pick_b if row[k].ndim == 1 else pick_b[..., None],
                      rb[k], ra[k]),
            row[k],
        )
        for k in row
    }
    out = bsdf.sample_bsdf(row_sel, n, ng, wo, u1, u2, u_rem,
                           wavelength=wavelength, families=families)
    # mixture pdf for MIS on composite non-delta samples
    pa = bsdf.pdf_bsdf(ra, n, ng, wo, out["wi"], families=families)
    pb = bsdf.pdf_bsdf(rb, n, ng, wo, out["wi"], families=families)
    mix_pdf = (1.0 - a) * pa + a * pb
    out["pdf"] = jnp.where(comp & ~out["specular"], mix_pdf, out["pdf"])
    return out


def emission(mats, row, ng, wo, has_blend: bool):
    e = bsdf.emission(row, ng, wo)
    if not has_blend:
        return e
    comp = _is_composite(row)
    ra, rb = _child_rows(mats, row)
    a = _blend_factor(row)[..., None]
    ea = bsdf.emission(ra, ng, wo)
    eb = bsdf.emission(rb, ng, wo)
    return jnp.where(comp[..., None], (1.0 - a) * ea + a * eb, e)
