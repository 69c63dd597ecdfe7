"""Output-stage image denoise — reference v3 optional CImg non-local-means
(SURVEY §2.12 imageHandler `denoise` + denoiseHLum/denoiseHCol/denoiseMix
params, tagged [L]; src/image_handlers/*.cc in v3 builds WITH_OpenCV/CImg).

TPU-native replacement: a jitted patch-based non-local-means over the
final image, luminance and chroma filtered with separate strengths
(hLum/hCol, on the reference's 0-255 scale), blended with the original by
`mix` — the same three knobs the reference exposes.  Runs as one XLA
program (static offset unroll, edge-clamped shifts), so it adds one fused
pass over the film rather than a host round trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# search window radius (offsets) and patch radius for the SSD metric —
# CImg's NLM defaults are patch 3x3 in a 7x7-ish window at these h scales
_SEARCH = 3
_PATCH = 1


def _shift2d(img, dy: int, dx: int):
    """img[y-dy, x-dx] with edge-clamped boundaries (static offsets)."""
    h, w = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
    pad += [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    y0 = max(-dy, 0)
    x0 = max(-dx, 0)
    return p[y0:y0 + h, x0:x0 + w]


def _box(x, r: int):
    """Separable (2r+1)^2 mean filter with edge-clamped boundaries."""
    acc = x
    for d in range(1, r + 1):
        acc = acc + _shift2d(x, d, 0) + _shift2d(x, -d, 0)
    acc = acc / (2 * r + 1)
    out = acc
    for d in range(1, r + 1):
        out = out + _shift2d(acc, 0, d) + _shift2d(acc, 0, -d)
    return out / (2 * r + 1)


def _rgb_to_ycc(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564
    cr = (r - y) * 0.713
    return jnp.stack([y, cb, cr], axis=-1)


def _ycc_to_rgb(ycc):
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    r = y + 1.403 * cr
    b = y + 1.773 * cb
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return jnp.stack([r, g, b], axis=-1)


def nlm_denoise(img, h_lum: float = 5.0, h_col: float = 5.0,
                mix: float = 0.8):
    """Non-local-means denoise of an (H, W, 3) linear image.

    h_lum/h_col: filter strengths on the reference's 0-255 8-bit scale
    (luminance / chroma); mix: result = mix*denoised + (1-mix)*original
    (reference denoiseMix).  h <= 0 disables that band.
    """
    img = jnp.asarray(img, jnp.float32)
    ycc = _rgb_to_ycc(img)
    h = jnp.asarray([max(h_lum, 0.0), max(h_col, 0.0),
                     max(h_col, 0.0)], jnp.float32) / 255.0
    h2 = jnp.maximum(h * h, 1e-12)
    num = jnp.zeros_like(ycc)
    den = jnp.zeros_like(ycc)
    for dy in range(-_SEARCH, _SEARCH + 1):
        for dx in range(-_SEARCH, _SEARCH + 1):
            sh = _shift2d(ycc, dy, dx)
            d2 = _box((ycc - sh) ** 2, _PATCH)
            w = jnp.exp(-d2 / h2)
            num = num + w * sh
            den = den + w
    out = num / jnp.maximum(den, 1e-12)
    out = jnp.where(h[None, None, :] > 0.0, out, ycc)
    rgb = _ycc_to_rgb(out)
    m = jnp.float32(jnp.clip(mix, 0.0, 1.0))
    return m * rgb + (1.0 - m) * img


# strengths/mix are static (hashable floats): one compile per setting,
# and the Python-level max()/clip in the body stay concrete
_nlm_jit = jax.jit(nlm_denoise, static_argnums=(1, 2, 3))


def denoise_image(img, h_lum: float = 5.0, h_col: float = 5.0,
                  mix: float = 0.8):
    """Host entry: jitted NLM, returns numpy-convertible array."""
    import numpy as np

    return np.asarray(_nlm_jit(jnp.asarray(img, jnp.float32),
                               float(h_lum), float(h_col), float(mix)))
