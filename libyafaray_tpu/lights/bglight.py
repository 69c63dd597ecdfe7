"""Background (IBL) light — importance sampling of the environment map.

Reference: src/lights/bglight.cc (SURVEY §2.6): marginal-row +
conditional-column 1-D CDF tables over a lat-long luminance grid with sinθ
weighting; pdf conversions for MIS against BSDF-sampled environment hits.

TPU-native: the CDFs are built once at scene compile (numpy) and sampled
with two vectorized searchsorted calls per lane.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import math as vmath


def build_bg_cdf(image: np.ndarray) -> dict:
    """image: (H,W,3) linear lat-long map (v=0 top ⇒ θ=0).
    Returns numpy arrays: row_cdf (H+1,), col_cdf (H, W+1), pdf_grid (H,W)
    where pdf_grid is the probability density over the unit (u,v) square."""
    img = np.maximum(np.asarray(image, np.float64), 0.0)
    h, w = img.shape[:2]
    lum = img.mean(axis=-1)
    theta = (np.arange(h) + 0.5) / h * np.pi
    weight = lum * np.sin(theta)[:, None]
    row_w = weight.sum(axis=1)
    total = row_w.sum()
    if total <= 0:
        weight = np.ones_like(weight)
        row_w = weight.sum(axis=1)
        total = row_w.sum()
    row_cdf = np.concatenate([[0.0], np.cumsum(row_w / total)])
    row_cdf[-1] = 1.0
    col_cdf = np.zeros((h, w + 1))
    safe = np.maximum(row_w, 1e-20)
    col_cdf[:, 1:] = np.cumsum(weight / safe[:, None], axis=1)
    col_cdf[:, -1] = 1.0
    # density over (u,v) in [0,1)²: p(u,v) = w(y,x)·H·W / total
    pdf_grid = weight * (h * w) / total
    return dict(
        bg_row_cdf=row_cdf.astype(np.float32),
        bg_col_cdf=col_cdf.astype(np.float32),
        bg_pdf_grid=pdf_grid.astype(np.float32),
    )


def sample_bg_light(arrays, spec, p, u1, u2):
    """Sample an incident direction from the environment CDFs.
    Returns dict(wi, dist, li, pdf (solid angle), delta=False, valid)."""
    row_cdf = arrays["bg_row_cdf"]
    col_cdf = arrays["bg_col_cdf"]
    pdf_grid = arrays["bg_pdf_grid"]
    img = arrays["bg_image"]
    h, w = pdf_grid.shape

    y = jnp.clip(jnp.searchsorted(row_cdf, u1, side="right") - 1, 0, h - 1)
    lo = row_cdf[y]
    hi = row_cdf[y + 1]
    dv = jnp.clip((u1 - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0 - 1e-6)
    v = (y.astype(jnp.float32) + dv) / h

    cc = col_cdf[y]  # (N, W+1)
    x = jnp.clip(
        jax_vector_searchsorted(cc, u2) - 1, 0, w - 1
    )
    clo = jnp.take_along_axis(cc, x[:, None], axis=1)[:, 0]
    chi = jnp.take_along_axis(cc, x[:, None] + 1, axis=1)[:, 0]
    du = jnp.clip((u2 - clo) / jnp.maximum(chi - clo, 1e-12), 0.0,
                  1.0 - 1e-6)
    u = (x.astype(jnp.float32) + du) / w

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


def jax_vector_searchsorted(sorted_rows, vals):
    """Row-wise searchsorted: sorted_rows (N, K) monotone rows, vals (N,).
    Vectorized binary search (static log2(K) steps on the VPU)."""
    n, k = sorted_rows.shape
    lo = jnp.zeros((n,), jnp.int32)
    hi = jnp.full((n,), k, jnp.int32)
    steps = int(np.ceil(np.log2(max(k, 2)))) + 1
    for _ in range(steps):
        mid = (lo + hi) // 2
        midv = jnp.take_along_axis(sorted_rows,
                                   jnp.clip(mid[:, None], 0, k - 1),
                                   axis=1)[:, 0]
        go_right = midv <= vals
        lo = jnp.where(go_right, jnp.minimum(mid + 1, k), lo)
        hi = jnp.where(go_right, hi, mid)
    return lo
