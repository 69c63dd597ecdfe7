"""blend_mat / mask_mat resolution (reference src/materials/blendmat.cc,
maskmat.cc — SURVEY §2.4).

blend_mat delegates every BSDF call to two child materials with
interpolated weights; mask_mat switches binarily by a texture threshold.
Wavefront resolution: when the scene contains composites, the shading
wrappers below gather the child rows and
  eval/pdf/emit -> lerp of the children's values (recursive: a child
                   that is itself a blend expands one more level)
  sample        -> stochastic descent (prob = blend factor per level,
                   u_lobe remapped to keep stratification) to a LEAF
                   row, with the full mixture pdf for MIS
`depth` is the static MAX NESTING DEPTH from scene compile
(scene.py _blend_depth — reference blendmat.cc composes arbitrary
children, including other blends); the recursion unrolls 2^depth leaf
evals for eval/pdf, so compile cost grows with real nesting only.
The blend factor comes from row["blend_value"], which apply_textures has
already overridden from the blend_shader/mask_shader slot when mapped.
NESTED children (r5): when the scene compiler finds a textured
composite child (SceneStatic.blend_child_textured), the engine passes a
`resolve` callback — apply_textures closed over the lane surface points
— and _child_rows re-resolves each gathered child row per nesting
level, so shader-mapped blend factors (and any other textured child
parameter) work at every depth, matching blendmat.cc's full delegation
of initBSDF to both children.  Untextured scenes pass resolve=None and
pay nothing.
"""
from __future__ import annotations

import jax.numpy as jnp

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


def _child_rows(mats, row, resolve=None):
    m = mats["mtype"].shape[0]
    ra = gather_rows(mats, jnp.clip(row["sub_mat1"], 0, m - 1))
    rb = gather_rows(mats, jnp.clip(row["sub_mat2"], 0, m - 1))
    if resolve is not None:
        ra = resolve(ra)
        rb = resolve(rb)
    return ra, rb


def eval_bsdf(mats, row, n, ng, wo, wi, depth: int, families=None,
              resolve=None):
    f = bsdf.eval_bsdf(row, n, ng, wo, wi, families=families)
    if not depth:
        return f
    comp = _is_composite(row)
    ra, rb = _child_rows(mats, row, resolve)
    a = _blend_factor(row)[..., None]
    fa = eval_bsdf(mats, ra, n, ng, wo, wi, depth - 1, families=families,
                   resolve=resolve)
    fb = eval_bsdf(mats, rb, n, ng, wo, wi, depth - 1, families=families,
                   resolve=resolve)
    return jnp.where(comp[..., None], (1.0 - a) * fa + a * fb, f)


def pdf_bsdf(mats, row, n, ng, wo, wi, depth: int, families=None,
             resolve=None):
    p = bsdf.pdf_bsdf(row, n, ng, wo, wi, families=families)
    if not depth:
        return p
    comp = _is_composite(row)
    ra, rb = _child_rows(mats, row, resolve)
    a = _blend_factor(row)
    pa = pdf_bsdf(mats, ra, n, ng, wo, wi, depth - 1, families=families,
                  resolve=resolve)
    pb = pdf_bsdf(mats, rb, n, ng, wo, wi, depth - 1, families=families,
                  resolve=resolve)
    return jnp.where(comp, (1.0 - a) * pa + a * pb, p)


def sample_bsdf(mats, row, n, ng, wo, u1, u2, u_lobe, depth: int,
                wavelength=None, families=None, resolve=None):
    if not depth:
        return bsdf.sample_bsdf(row, n, ng, wo, u1, u2, u_lobe,
                                wavelength=wavelength, families=families)
    comp_top = _is_composite(row)
    # stochastic descent: at each level, composite lanes pick a child by
    # the (remapped) lobe uniform; leaf lanes pass through unchanged
    cur = row
    for _ in range(depth):
        comp = _is_composite(cur)
        ra, rb = _child_rows(mats, cur, resolve)
        a = _blend_factor(cur)
        pick_b = u_lobe < a
        u_rem = jnp.where(pick_b,
                          u_lobe / jnp.maximum(a, 1e-8),
                          (u_lobe - a) / jnp.maximum(1.0 - a, 1e-8))
        u_lobe = jnp.where(comp, jnp.clip(u_rem, 0.0, 1.0 - 1e-7),
                           u_lobe)
        cur = {
            k: jnp.where(
                comp if cur[k].ndim == 1 else comp[..., None],
                jnp.where(pick_b if cur[k].ndim == 1
                          else pick_b[..., None], rb[k], ra[k]),
                cur[k],
            )
            for k in cur
        }
    out = bsdf.sample_bsdf(cur, n, ng, wo, u1, u2, u_lobe,
                           wavelength=wavelength, families=families)
    # full mixture pdf for MIS on composite non-delta samples (the
    # recursive pdf expands nested children to the same leaf mixture the
    # descent above samples from)
    mix_pdf = pdf_bsdf(mats, row, n, ng, wo, out["wi"], depth,
                       families=families, resolve=resolve)
    out["pdf"] = jnp.where(comp_top & ~out["specular"], mix_pdf,
                           out["pdf"])
    return out


def emission(mats, row, ng, wo, depth: int, resolve=None):
    e = bsdf.emission(row, ng, wo)
    if not depth:
        return e
    comp = _is_composite(row)
    ra, rb = _child_rows(mats, row, resolve)
    a = _blend_factor(row)[..., None]
    ea = emission(mats, ra, ng, wo, depth - 1, resolve=resolve)
    eb = emission(mats, rb, ng, wo, depth - 1, resolve=resolve)
    return jnp.where(comp[..., None], (1.0 - a) * ea + a * eb, e)
