"""Image film — weighted accumulation, scatter-free splatting, adaptive AA.

Reference: src/yafraycore/imagefilm.cc (SURVEY §2.11): per-pixel (ΣwC, Σw)
accumulation, splatting reconstruction filters, adaptive AA passes driven by
per-pixel noise detection, density buffer for SPPM, binary save/load for
resume.

TPU-native design (the key inversion vs the reference):
  * the ray arena is PIXEL-ORDERED — each wavefront step carries exactly one
    sample per pixel, so "splatting" a filter of radius R is (2R+1)² dense
    shifted plane-adds (pad+slice), never a scatter and never a mutex;
  * adaptive AA keeps shapes static: every pass samples every pixel lane but
    multiplies contribution by the per-pixel resample flag (0/1) — the
    estimator matches the reference exactly (unflagged pixels receive no
    new samples); flagged-lane compaction is a later perf layer;
  * sample-index continuation: per-pixel i32 sample counters feed the QMC
    stream so added passes extend the low-discrepancy sequence (reference
    `pixelSample + samplingOffs` semantics);
  * film save/load = np.savez with a param-hash guard (reference binary
    film autosave/resume, SURVEY §5.4).
"""
from __future__ import annotations

import hashlib

import numpy as np
import jax.numpy as jnp

from .filters import eval_filter_2d, filter_radius


def film_init(h: int, w: int, with_density: bool = False,
              with_alpha: bool = False,
              with_variance: bool = False) -> dict:
    film = dict(
        wsum=jnp.zeros((h, w, 3), jnp.float32),
        w=jnp.zeros((h, w), jnp.float32),
        nsamples=jnp.zeros((h, w), jnp.int32),
        flags=jnp.ones((h, w), jnp.bool_),
    )
    if with_density:
        film["density"] = jnp.zeros((h, w, 3), jnp.float32)
    if with_alpha:
        # coverage/alpha plane (reference colorA_t alpha accumulated in
        # the film; bg_transp/bg_transp_refract semantics) — filter-
        # weighted like wsum, normalized by the same w at flush
        film["alpha"] = jnp.zeros((h, w, 1), jnp.float32)
    if with_variance:
        # second-moment plane (sum of w * C^2, same filter footprint as
        # wsum) driving the stderr adaptive estimator — a TPU-first
        # extension beyond the reference's neighbor-contrast detection,
        # which cannot target a GLOBAL error level (at thresholds near
        # the per-pixel noise it re-flags true image edges forever)
        film["m2"] = jnp.zeros((h, w, 3), jnp.float32)
    return film


def _shift2d(a, oy: int, ox: int):
    """Shift a (H,W,...) plane by static offsets, zero-filling."""
    if oy == 0 and ox == 0:
        return a
    h, w = a.shape[0], a.shape[1]
    pad_width = [(max(oy, 0), max(-oy, 0)), (max(ox, 0), max(-ox, 0))]
    pad_width += [(0, 0)] * (a.ndim - 2)
    padded = jnp.pad(a, pad_width)
    return padded[max(-oy, 0):max(-oy, 0) + h, max(-ox, 0):max(-ox, 0) + w]


def film_splat(film: dict, color, sx, sy, active,
               filter_type: str, pixel_width: float,
               clamp_samples: float = 0.0) -> dict:
    """Accumulate one sample-per-pixel plane into the film.

    color: (H,W,3) radiance of this pass-step's sample for each pixel.
    sx, sy: (H,W) subpixel position in [0,1) of the sample inside its pixel.
    active: (H,W) float 0/1 — adaptive-AA resample flag for this pass.
    """
    if clamp_samples > 0.0:
        # reference AA_clamp_samples: clamp sample color magnitude
        m = jnp.max(color, axis=-1, keepdims=True)
        scale = jnp.where(m > clamp_samples, clamp_samples / jnp.maximum(m, 1e-9), 1.0)
        color = color * scale

    r = filter_radius(filter_type, pixel_width)
    wsum = film["wsum"]
    wacc = film["w"]
    for oy in range(-r, r + 1):
        for ox in range(-r, r + 1):
            # distance from neighbor pixel center (o+0.5 in pixel units)
            # to the sample at (sx, sy)
            dx = ox + 0.5 - sx
            dy = oy + 0.5 - sy
            wgt = eval_filter_2d(filter_type, dx, dy, pixel_width) * active
            # contribution of this pixel's sample onto pixel (p + o):
            wsum = wsum + _shift2d(wgt[..., None] * color, oy, ox)
            wacc = wacc + _shift2d(wgt, oy, ox)
    out = dict(film)
    out["wsum"] = wsum
    out["w"] = wacc
    out["nsamples"] = film["nsamples"] + active.astype(jnp.int32)
    return out


def splat_plane(acc, val, sx, sy, active, filter_type: str,
                pixel_width: float):
    """Filter-weighted accumulation of one (H,W,C) sample plane — the
    same footprint math as film_splat's wsum (normalize by film['w'] at
    flush).  Used for the AOV planes that enter the indirect-pass
    decomposition: subtracting a plain per-sample mean from the
    filter-weighted combined image mismatches estimators near
    high-contrast edges (ADVICE r2)."""
    r = filter_radius(filter_type, pixel_width)
    for oy in range(-r, r + 1):
        for ox in range(-r, r + 1):
            dx = ox + 0.5 - sx
            dy = oy + 0.5 - sy
            wgt = eval_filter_2d(filter_type, dx, dy, pixel_width) * active
            acc = acc + _shift2d(wgt[..., None] * val, oy, ox)
    return acc


def film_splat_compact(film: dict, color, pix, sx, sy, active,
                       filter_type: str, pixel_width: float,
                       clamp_samples: float = 0.0) -> dict:
    """film_splat for a COMPACTED lane set: color (N, 3) samples at flat
    pixel ids pix (N,) i32 (active=0 lanes are ignored; pass pix>=0),
    scatter-added with the SAME filter-footprint math as the dense
    splat.  Used by the adaptive-AA compact passes (render.py): when few
    pixels are flagged, lanes cover only those pixels, so the step's
    wavefront cost scales with the flagged count instead of H*W."""
    if clamp_samples > 0.0:
        m = jnp.max(color, axis=-1, keepdims=True)
        scale = jnp.where(m > clamp_samples,
                          clamp_samples / jnp.maximum(m, 1e-9), 1.0)
        color = color * scale
    h, w = film["wsum"].shape[:2]
    pixc = jnp.maximum(pix, 0)
    py, px = jnp.divmod(pixc, w)
    r = filter_radius(filter_type, pixel_width)
    wsum = film["wsum"]
    wacc = film["w"]
    for oy in range(-r, r + 1):
        for ox in range(-r, r + 1):
            dx = ox + 0.5 - sx
            dy = oy + 0.5 - sy
            wgt = eval_filter_2d(filter_type, dx, dy, pixel_width) * active
            yy = py + oy
            xx = px + ox
            ob = (yy < 0) | (yy >= h) | (xx < 0) | (xx >= w)
            wgt = jnp.where(ob, 0.0, wgt)
            yy = jnp.clip(yy, 0, h - 1)
            xx = jnp.clip(xx, 0, w - 1)
            wsum = wsum.at[yy, xx].add(wgt[:, None] * color)
            wacc = wacc.at[yy, xx].add(wgt)
    out = dict(film)
    out["wsum"] = wsum
    out["w"] = wacc
    out["nsamples"] = film["nsamples"].at[py, px].add(
        (active > 0.0).astype(jnp.int32))
    return out


def splat_plane_compact(acc, val, pix, sx, sy, active, filter_type: str,
                        pixel_width: float):
    """splat_plane for a compacted lane set (val (N, C))."""
    h, w = acc.shape[:2]
    pixc = jnp.maximum(pix, 0)
    py, px = jnp.divmod(pixc, w)
    r = filter_radius(filter_type, pixel_width)
    for oy in range(-r, r + 1):
        for ox in range(-r, r + 1):
            dx = ox + 0.5 - sx
            dy = oy + 0.5 - sy
            wgt = eval_filter_2d(filter_type, dx, dy, pixel_width) * active
            yy = py + oy
            xx = px + ox
            ob = (yy < 0) | (yy >= h) | (xx < 0) | (xx >= w)
            wgt = jnp.where(ob, 0.0, wgt)
            yy = jnp.clip(yy, 0, h - 1)
            xx = jnp.clip(xx, 0, w - 1)
            acc = acc.at[yy, xx].add(wgt[:, None] * val)
    return acc


def film_image(film: dict) -> jnp.ndarray:
    """Current weighted-mean image (H,W,3), linear RGB."""
    img = film["wsum"] / jnp.maximum(film["w"], 1e-8)[..., None]
    if "density" in film:
        img = img + film["density"]
    return img


def film_alpha(film: dict):
    """Weighted-mean alpha (H,W) in [0,1], or None if the film carries no
    alpha plane.  Pixels with no samples read 0 (fully transparent)."""
    if "alpha" not in film:
        return None
    return jnp.clip(
        film["alpha"][..., 0] / jnp.maximum(film["w"], 1e-8), 0.0, 1.0)


def compute_aa_flags(film: dict, threshold: float,
                     dark_detection: str = "none",
                     dark_factor: float = 1.0,
                     detect_color_noise: bool = False,
                     threshold_scale=None) -> jnp.ndarray:
    """Per-pixel resample flags for the next adaptive pass (reference
    imagefilm AA noise detection, SURVEY App. B): flag when the max-channel
    delta to any 4-neighbor exceeds the threshold; dark-detection variants
    scale the threshold down in dark regions; flags are dilated one pixel
    (the reference flags neighbors of noisy pixels too)."""
    img = film_image(film)
    thr = jnp.float32(threshold)
    if threshold_scale is not None:
        # per-pixel scale (material samplingFactor: factor>1 lowers the
        # threshold there, driving more adaptive resampling)
        thr = thr * threshold_scale
    if dark_detection == "linear":
        bri = jnp.mean(img, axis=-1)
        thr = thr * jnp.clip(bri * dark_factor, 0.25, 1.0)
    elif dark_detection == "curve":
        bri = jnp.mean(img, axis=-1)
        thr = thr * jnp.clip(jnp.sqrt(jnp.maximum(bri, 0.0)) * dark_factor,
                             0.1, 1.0)

    def delta(o):
        d = jnp.abs(img - _shift2d(img, o[0], o[1]))
        if detect_color_noise:
            return jnp.max(d, axis=-1)
        return jnp.mean(d, axis=-1)

    flag = jnp.zeros(img.shape[:2], jnp.bool_)
    for o in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        flag = flag | (delta(o) > thr)
    # dilate to neighbors
    dil = flag
    for o in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        dil = dil | _shift2d(flag, o[0], o[1])
    return dil


def film_stderr(film: dict) -> jnp.ndarray:
    """(H, W) standard-error estimate of the filtered pixel mean from
    the film's second-moment plane: sqrt(mean_rgb(var) / w) with
    var = m2/w - (wsum/w)^2.  Up to a filter-footprint constant this is
    the 1-sigma error of the current pixel estimate; QMC correlation
    makes it conservative (true error converges faster).  Used by the
    `variance` AA estimator (flag while stderr > threshold), which CAN
    target a global RMSE level where the reference's neighbor-contrast
    detector can't (see film_init)."""
    w = jnp.maximum(film["w"], 1e-9)[..., None]
    mean = film["wsum"] / w
    var = jnp.maximum(film["m2"] / w - mean * mean, 0.0)
    return jnp.sqrt(jnp.mean(var, axis=-1) / w[..., 0])


def compute_stderr_flags(film: dict, threshold: float,
                         threshold_scale=None) -> jnp.ndarray:
    """Per-pixel resample flags from the stderr estimator: flag while
    the estimated 1-sigma pixel error exceeds `threshold` (optionally
    scaled per pixel by material samplingFactor, like the contrast
    detector).  Pixels with no samples yet always flag."""
    thr = jnp.float32(threshold)
    if threshold_scale is not None:
        thr = thr * threshold_scale
    err = film_stderr(film)
    return (err > thr) | (film["nsamples"] < 1)


def add_density(film: dict, contrib) -> dict:
    """SPPM density layer accumulation (reference addDensitySample)."""
    out = dict(film)
    out["density"] = film.get("density", jnp.zeros_like(contrib)) + contrib
    return out


# ---------------------------------------------------------------------------
# save / load for resume (reference binary film + autosave, SURVEY §5.4)
# ---------------------------------------------------------------------------


def film_param_hash(params: dict) -> str:
    s = repr(sorted(params.items()))
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def film_save(path: str, film: dict, params: dict, pass_idx: int):
    arrays = {k: np.asarray(v) for k, v in film.items()}
    np.savez_compressed(
        path, __hash__=film_param_hash(params), __pass__=pass_idx, **arrays
    )


def film_load(path: str, params: dict):
    """Returns (film, pass_idx) or None on hash mismatch / missing file."""
    try:
        data = np.load(path, allow_pickle=False)
    except (FileNotFoundError, OSError):
        return None
    if str(data["__hash__"]) != film_param_hash(params):
        return None
    film = {
        k: jnp.asarray(data[k])
        for k in data.files
        if not k.startswith("__")
    }
    return film, int(data["__pass__"])
