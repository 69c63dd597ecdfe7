"""Color & spectra (reference: include/core_api/color.h, spectrum.cc).

Rendering is linear RGB float32; output transforms (sRGB / gamma / XYZ)
happen at film flush.  Dispersion support: wl2rgb + Cauchy coefficients
(SURVEY §2.1 "Spectra", App. B glass rules).
"""
from __future__ import annotations

import jax.numpy as jnp


def luminance(c):
    """Rec.709 luminance of linear RGB (..., 3)."""
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722


def col2bri(c):
    """Reference `col2bri`: average energy of RGB."""
    return jnp.mean(c, axis=-1)


def max_component(c):
    return jnp.max(c, axis=-1)


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    lo = c * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-8), 1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def srgb_to_linear(c):
    lo = c / 12.92
    hi = jnp.power((c + 0.055) / 1.055, 2.4)
    return jnp.where(c <= 0.04045, lo, hi)


def apply_gamma(c, gamma: float):
    if gamma == 1.0:
        return c
    return jnp.power(jnp.maximum(c, 0.0), 1.0 / gamma)


def decode_gamma(c, gamma: float):
    if gamma == 1.0:
        return c
    return jnp.power(jnp.maximum(c, 0.0), gamma)


# linear RGB <-> CIE XYZ (sRGB primaries, D65)
_RGB2XYZ = jnp.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    dtype=jnp.float32,
)
_XYZ2RGB = jnp.array(
    [
        [3.2404542, -1.5371385, -0.4985314],
        [-0.9692660, 1.8760108, 0.0415560],
        [0.0556434, -0.2040259, 1.0572252],
    ],
    dtype=jnp.float32,
)


def rgb_to_xyz(c):
    return jnp.einsum("ij,...j->...i", _RGB2XYZ, c)


def xyz_to_rgb(c):
    return jnp.einsum("ij,...j->...i", _XYZ2RGB, c)


def output_transform(c, color_space: str, gamma: float):
    """Film flush transform, parity with reference color_space param
    (sRGB | LinearRGB | XYZ | Raw_Manual_Gamma)."""
    cs = color_space.lower()
    if cs == "srgb":
        return linear_to_srgb(c)
    if cs in ("linearrgb", "linear_rgb", "linear"):
        return c
    if cs == "xyz":
        return rgb_to_xyz(c)
    if cs in ("raw_manual_gamma", "raw"):
        return apply_gamma(c, gamma)
    return linear_to_srgb(c)


# ---------------------------------------------------------------------------
# Spectral dispersion helpers (glass `dispersion_power`)
# ---------------------------------------------------------------------------


def wl_to_rgb(w):
    """Map wavelength parameter w ∈ [0,1] (380..780nm linear) to a linear
    RGB weight whose integral over w approximates (1,1,1) — a smooth
    analytic approximation of the CIE-based table the reference ships
    (spectrum.cc).  Normalized so mean over w of each channel ≈ 1."""
    nm = 380.0 + 400.0 * w
    # smooth gaussian-lobe fit of CIE-ish RGB response, normalized
    def lobe(mu, sig):
        return jnp.exp(-0.5 * ((nm - mu) / sig) ** 2)

    r = 1.065 * lobe(600.0, 38.0) + 0.30 * lobe(445.0, 22.0)
    g = 1.020 * lobe(548.0, 42.0)
    b = 1.130 * lobe(450.0, 28.0)
    rgb = jnp.stack([r, g, b], axis=-1)
    # normalization constants: mean over uniform w (precomputed analytically)
    norm = jnp.array([0.29477, 0.26832, 0.19696], dtype=jnp.float32)
    return rgb / norm


def cauchy_coefficients(ior: float | jnp.ndarray, dispersion_power):
    """Cauchy n(λ)=A+B/λ² coefficients from base IOR and the reference's
    `dispersion_power` knob (App. B).  λ in micrometers.  dispersion_power
    directly scales B; A is adjusted so n(589nm)=ior."""
    b = dispersion_power * 0.01
    lam_d2 = 0.589**2
    a = ior - b / lam_d2
    return a, b


def cauchy_ior(a, b, w):
    """IOR at wavelength parameter w∈[0,1] (380..780nm)."""
    lam = (380.0 + 400.0 * w) * 1e-3  # micrometers
    return a + b / (lam * lam)
