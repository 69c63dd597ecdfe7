"""Background (IBL) light — importance sampling of the environment map.

Reference: src/lights/bglight.cc (SURVEY §2.6): marginal-row +
conditional-column 1-D CDF tables over a lat-long luminance grid with sinθ
weighting; pdf conversions for MIS against BSDF-sampled environment hits.

TPU-native: a flat Walker alias table is built once at scene compile
(numpy) and sampled with two data-dependent gathers per lane
(lights/alias.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as vmath


def build_bg_cdf(image: np.ndarray) -> dict:
    """image: (H,W,3) linear lat-long map (v=0 top ⇒ θ=0).
    Returns numpy arrays: a flat (H·W) alias table (prob + alias) over
    sinθ-weighted texel luminance plus pdf_grid (H,W), the probability
    density over the unit (u,v) square (the role of bglight.cc's CDF
    pair — see sample_bg_light for why alias instead of CDF here)."""
    from .alias import build_alias_table

    img = np.maximum(np.asarray(image, np.float64), 0.0)
    h, w = img.shape[:2]
    lum = img.mean(axis=-1)
    theta = (np.arange(h) + 0.5) / h * np.pi
    weight = lum * np.sin(theta)[:, None]
    total = weight.sum()
    if total <= 0:
        weight = np.ones_like(weight)
        total = weight.sum()
    prob, alias = build_alias_table(weight.ravel())
    # density over (u,v) in [0,1)²: p(u,v) = w(y,x)·H·W / total
    pdf_grid = weight * (h * w) / total
    return dict(
        bg_alias_prob=prob,
        bg_alias=alias,
        bg_pdf_grid=pdf_grid.astype(np.float32),
    )


def sample_bg_light(arrays, spec, p, u1, u2):
    """Sample an incident direction from the environment importance
    table.  Returns dict(wi, dist, li, pdf (solid angle), delta=False,
    valid).

    TPU-native: a single flat Walker alias table over all H·W texels
    (lights/alias.py) replaces the reference's marginal-row +
    conditional-column CDF bisections — 2 data-dependent gathers per
    sample instead of ~21 (the bisections' scalar gathers measured as
    the dominant term of the whole IBL config's step time).  The QMC
    pair (u1,u2) keeps its roles: u1 picks the texel (plus rescaled
    in-cell u), u2 the in-cell v."""
    prob = arrays["bg_alias_prob"]
    alias = arrays["bg_alias"]
    pdf_grid = arrays["bg_pdf_grid"]
    img = arrays.get("bg_image_ibl", arrays["bg_image"])  # ibl_blur
    h, w = pdf_grid.shape

    from .alias import sample_alias

    cell, du = sample_alias(prob, alias, u1)
    y = cell // w
    x = cell - y * w
    u = (x.astype(jnp.float32) + du) / w
    v = (y.astype(jnp.float32) + jnp.clip(u2, 0.0, 1.0 - 1e-6)) / h

    from ..backgrounds.base import uv_to_dir

    wi = uv_to_dir(spec, u, v)
    theta = v * jnp.pi
    sin_t = jnp.maximum(jnp.sin(theta), 1e-5)
    p_uv = pdf_grid[y, x]
    pdf = p_uv / (2.0 * jnp.pi * jnp.pi * sin_t)
    li = img[y, x] * spec.power
    dist = jnp.full(u1.shape, 1e8, jnp.float32)
    return dict(wi=wi, dist=dist, li=li, pdf=pdf, delta=False,
                valid=pdf > 1e-10)


def pdf_bg_dir(arrays, spec, d):
    """Solid-angle pdf the IBL sampler would give direction d — the MIS
    counterpart at background escapes."""
    from ..backgrounds.base import dir_to_uv

    pdf_grid = arrays["bg_pdf_grid"]
    h, w = pdf_grid.shape
    u, v = dir_to_uv(spec, d)
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    theta = v * jnp.pi
    sin_t = jnp.maximum(jnp.sin(theta), 1e-5)
    return pdf_grid[y, x] / (2.0 * jnp.pi * jnp.pi * sin_t)
