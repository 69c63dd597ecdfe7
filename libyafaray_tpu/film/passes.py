"""Render passes / AOVs (reference src/yafraycore/renderpasses.cc —
SURVEY §2.11: ~30 pass types; this module provides the engine-collectable
set, the rest compose from these at flush).

Pass planes live in the film dict as `aov_<source>` arrays accumulated per
sample; `extract_passes` normalizes by the per-pixel sample count and
applies per-pass postprocessing (normal remap, z normalization, index
masks, mist, toon/edge post-filters).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# pass name -> (engine aux source, channels)
PASS_SOURCES = {
    "z-depth-abs": ("z", 1),
    "z-depth-norm": ("z", 1),
    "mist": ("z", 1),
    "normal-smooth": ("normal", 3),
    "normal-geom": ("geo_normal", 3),
    "uv": ("uv", 2),
    "mat-index-abs": ("mat_index", 1),
    "mat-index-norm": ("mat_index", 1),
    "mat-index-auto": ("mat_index", 1),
    "mat-index-mask": ("mat_index", 1),
    "obj-index-abs": ("obj_index", 1),
    "obj-index-norm": ("obj_index", 1),
    "obj-index-auto": ("obj_index", 1),
    "obj-index-mask": ("obj_index", 1),
    "diffuse-color": ("diffuse_color", 3),
    "emit": ("emit", 3),
    "direct": ("direct", 3),
    "diffuse-direct": ("direct", 3),
    "ao": ("ao", 3),
    "ao-clay": ("ao", 3),
    "shadow": ("shadow", 1),
    "reflect": ("reflect", 3),
    "refract": ("refract", 3),
    "debug-nu": ("nu", 3),
    "debug-nv": ("nv", 3),
    "debug-dpdu": ("dpdu", 3),
    "debug-dpdv": ("dpdv", 3),
}

# post-processed passes computed from other planes at flush (reference's
# toon & object-edge passes are film post-filters; diffuse-indirect /
# indirect decompose combined - direct - emit - specular — SURVEY §2.11)
POST_PASSES = ("edge", "toon", "indirect", "diffuse-indirect")
PASS_NAMES = tuple(PASS_SOURCES) + POST_PASSES

# planes accumulated with the reconstruction-filter weights (normalize by
# film["w"]); everything else is a plain per-sample mean (film nsamples).
# These four enter the indirect decomposition against the filter-weighted
# combined image, so their estimators must match (ADVICE r2).
FILTER_WEIGHTED_AOVS = frozenset({"direct", "emit", "reflect", "refract"})


def film_add_passes(film: dict, h: int, w: int, passes: tuple) -> dict:
    """Allocate the accumulation planes needed by the requested passes."""
    need: dict[str, int] = {}
    for p in passes:
        if p in ("edge", "toon"):  # edge/toon need normals + z
            need["normal"] = 3
            need["z"] = 1
        if p in ("indirect", "diffuse-indirect"):
            need["direct"] = 3
            need["emit"] = 3
            need["reflect"] = 3
            need["refract"] = 3
        if p in PASS_SOURCES:
            src, ch = PASS_SOURCES[p]
            need[src] = ch
    for src, ch in need.items():
        film[f"aov_{src}"] = jnp.zeros((h, w, ch), jnp.float32)
    return film


def extract_passes(film: dict, passes: tuple) -> dict:
    """-> name -> (H,W,C) numpy planes, normalized & postprocessed."""
    ns = np.maximum(np.asarray(film["nsamples"], np.float32), 1.0)[..., None]
    wf = np.maximum(np.asarray(film["w"]), 1e-8)[..., None]
    out = {}
    for p in passes:
        if p not in PASS_SOURCES:
            continue
        src, ch = PASS_SOURCES[p]
        norm = wf if src in FILTER_WEIGHTED_AOVS else ns
        plane = np.asarray(film[f"aov_{src}"]) / norm
        if p == "z-depth-norm":
            zmax = plane.max() or 1.0
            plane = plane / zmax
        elif p == "mist":
            zmax = plane.max() or 1.0
            plane = 1.0 - plane / zmax
        elif p in ("normal-smooth", "normal-geom"):
            plane = plane * 0.5 + 0.5
        elif p in ("mat-index-norm", "obj-index-norm"):
            m = plane.max() or 1.0
            plane = plane / m
        elif p in ("mat-index-auto", "obj-index-auto"):
            # reference auto-color: a stable pseudo-random color per index
            idx = np.round(plane[..., 0]).astype(np.uint32)
            h32 = (idx * np.uint32(2654435761)) & np.uint32(0xFFFFFF)
            plane = np.stack([(h32 >> 16) & 0xFF, (h32 >> 8) & 0xFF,
                              h32 & 0xFF], axis=-1) / 255.0
        elif p in ("mat-index-mask", "obj-index-mask"):
            # binary mask of index 0 by default (reference pass_mask_*
            # params select others; the plane stays composable)
            plane = (np.round(plane) == 0.0).astype(np.float32)
        elif p == "ao-clay":
            # AO on a white clay material: drop the surface color by
            # using the luminance only
            lum = plane.mean(axis=-1, keepdims=True)
            plane = np.repeat(lum, 3, axis=-1)
        out[p] = plane.astype(np.float32)
    for p in passes:
        if p in ("indirect", "diffuse-indirect"):
            # decomposition at flush: combined - direct - emit - specular
            # (clamped; indirect = everything that bounced at least once
            # on a non-specular chain)
            img = np.asarray(film["wsum"]) / np.maximum(
                np.asarray(film["w"]), 1e-8)[..., None]
            sub = np.zeros_like(img)
            for src in ("direct", "emit", "reflect", "refract"):
                key = f"aov_{src}"
                if key in film:
                    # filter-weighted planes: same estimator as wsum/w
                    sub = sub + np.asarray(film[key]) / wf
            out[p] = np.clip(img - sub, 0.0, None).astype(np.float32)
            continue
        if p not in ("edge", "toon"):
            continue
        ns2 = np.maximum(np.asarray(film["nsamples"], np.float32), 1.0)
        nrm = np.asarray(film["aov_normal"]) / ns2[..., None]
        z = (np.asarray(film["aov_z"]) / ns2[..., None])[..., 0]

        def grad(a):
            gx = np.zeros_like(a)
            gy = np.zeros_like(a)
            gx[:, 1:] = a[:, 1:] - a[:, :-1]
            gy[1:, :] = a[1:, :] - a[:-1, :]
            return np.abs(gx) + np.abs(gy)

        e_n = grad(nrm[..., 0]) + grad(nrm[..., 1]) + grad(nrm[..., 2])
        zmax = z.max() or 1.0
        e_z = grad(z / zmax)
        edge = np.clip(e_n * 0.5 + e_z * 4.0, 0.0, 1.0)
        if p == "edge":
            out[p] = np.repeat(edge[..., None], 3, axis=-1).astype(np.float32)
        else:  # toon: quantized combined color with dark edges
            img = np.asarray(film["wsum"]) / np.maximum(
                np.asarray(film["w"]), 1e-8)[..., None]
            quant = np.round(np.clip(img, 0, 1) * 4.0) / 4.0
            out[p] = (quant * (1.0 - edge[..., None])).astype(np.float32)
    return out
