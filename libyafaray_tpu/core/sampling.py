"""Sampling warps, MIS heuristics, CDF tables.

Reference: include/utilities/sample_utils.h (SURVEY §2.1) — cosine/sphere/
cone warps, power & balance heuristics, Pdf1D CDF tables.  Here every warp is
a batched jnp function; CDF tables are device arrays sampled via
jnp.searchsorted (vectorized binary search — fine on VPU).
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as vmath

PI = jnp.pi
INV_PI = 1.0 / jnp.pi


def sample_cos_hemisphere(n, u1, u2):
    """Cosine-weighted hemisphere around normal n. Returns (dir, pdf)."""
    u, v = vmath.build_onb(n)
    r = jnp.sqrt(jnp.maximum(u1, 0.0))
    phi = 2.0 * PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    d = x[..., None] * u + y[..., None] * v + z[..., None] * n
    pdf = jnp.maximum(z, 1e-8) * INV_PI
    return d, pdf


def sample_sphere(u1, u2):
    """Uniform direction on the unit sphere. pdf = 1/(4π)."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_cone(axis, cos_max, u1, u2):
    """Uniform direction in a cone around `axis`. pdf = 1/(2π(1-cosMax))."""
    u, v = vmath.build_onb(axis)
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * PI * u2
    d = (
        (sin_t * jnp.cos(phi))[..., None] * u
        + (sin_t * jnp.sin(phi))[..., None] * v
        + cos_t[..., None] * axis
    )
    pdf = 1.0 / jnp.maximum(2.0 * PI * (1.0 - cos_max), 1e-9)
    return d, pdf


def sample_triangle(u1, u2):
    """Uniform barycentric coords on a triangle (sqrt warp)."""
    su1 = jnp.sqrt(jnp.maximum(u1, 0.0))
    b0 = 1.0 - su1
    b1 = u2 * su1
    return b0, b1


def sample_disk_concentric(u1, u2):
    """Shirley–Chiu concentric disk warp -> (x, y) in unit disk."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    zero = (jnp.abs(ox) < 1e-9) & (jnp.abs(oy) < 1e-9)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    safe_ox = jnp.where(jnp.abs(ox) < 1e-12, 1.0, ox)
    safe_oy = jnp.where(jnp.abs(oy) < 1e-12, 1.0, oy)
    theta = jnp.where(
        use_x,
        (PI / 4.0) * (oy / safe_ox),
        (PI / 2.0) - (PI / 4.0) * (ox / safe_oy),
    )
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    return jnp.where(zero, 0.0, x), jnp.where(zero, 0.0, y)


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic β=2 (App. B: required between light & BSDF
    strategies for non-delta lights)."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)


def balance_heuristic(pdf_a, pdf_b):
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


# ---------------------------------------------------------------------------
# 1-D / 2-D CDF tables (reference Pdf1D_t; used by bglight IBL + light pick)
# ---------------------------------------------------------------------------


def build_cdf_1d(func):
    """func: (..., N) nonneg weights -> (cdf (..., N+1), integral (...,))."""
    n = func.shape[-1]
    integral = jnp.sum(func, axis=-1)
    safe = jnp.maximum(integral, 1e-20)
    cdf = jnp.cumsum(func, axis=-1) / safe[..., None]
    zeros = jnp.zeros(func.shape[:-1] + (1,), func.dtype)
    cdf = jnp.concatenate([zeros, cdf], axis=-1)
    # force exact 1.0 at the end
    cdf = cdf.at[..., -1].set(1.0)
    return cdf, integral / n


def sample_cdf_1d(cdf, u):
    """Sample index + remapped-u + pdf-scale from a CDF built above.

    cdf: (N+1,) array; u: (...,) uniforms.
    Returns (idx (int32), du in [0,1), pdf_times_n) where the true pdf of
    bin idx is pdf_times_n = (cdf[i+1]-cdf[i]) * N (density wrt uniform bin
    measure)."""
    n = cdf.shape[-1] - 1
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, n - 1)
    lo = cdf[idx]
    hi = cdf[idx + 1]
    width = jnp.maximum(hi - lo, 1e-20)
    du = jnp.clip((u - lo) / width, 0.0, 1.0 - 1e-7)
    pdf_times_n = width * n
    return idx.astype(jnp.int32), du, pdf_times_n
