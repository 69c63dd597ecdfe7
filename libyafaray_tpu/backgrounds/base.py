"""Backgrounds (reference src/backgrounds/ — SURVEY §2.7).

constant, gradient, textureback (lat-long / angular HDR, IBL), sunsky
(Preetham), darksky (Hosek-Wilkie).  A background is compiled to
(static spec, device arrays); `eval_background(spec, arrays, dir)` returns
radiance for rays that escape the scene.  IBL importance sampling lives in
lights/bglight.py over the same arrays.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..core import math as vmath

BG_NONE = -1
BG_CONSTANT = 0
BG_GRADIENT = 1
BG_TEXTURE = 2
BG_SUNSKY = 3
BG_DARKSKY = 4


@dataclass(frozen=True)
class BackgroundSpec:
    bg_type: int = BG_NONE
    power: float = 1.0
    # constant
    color: tuple = (0.0, 0.0, 0.0)
    # gradient
    horizon_color: tuple = (0.0, 0.0, 0.0)
    zenith_color: tuple = (0.0, 0.0, 0.0)
    horizon_ground_color: tuple = (0.0, 0.0, 0.0)
    zenith_ground_color: tuple = (0.0, 0.0, 0.0)
    # texture
    mapping: str = "sphere"  # sphere (lat-long) | probe (angular)
    rotation: float = 0.0
    ibl: bool = False
    ibl_samples: int = 16
    # ibl_blur (v3.2+ textureback): gaussian prefilter of the env map used
    # by the IBL LIGHTING lookups (NEE samples, portal radiance, CDF) —
    # the directly-visible background stays sharp.  Quadratic response:
    # sigma_uv = ibl_blur² / 2 (reference blurs a mip copy; approximation)
    ibl_blur: float = 0.0
    with_caustic: bool = True
    with_diffuse: bool = True


def eval_background(spec: BackgroundSpec, bg_image, d):
    """Radiance of escaping rays with direction d (N,3). bg_image: (Hb,Wb,3)
    device array for texture backgrounds (None otherwise)."""
    if spec.bg_type == BG_NONE:
        return jnp.zeros(d.shape[:-1] + (3,), jnp.float32)

    if spec.bg_type == BG_CONSTANT:
        c = jnp.asarray(spec.color, jnp.float32) * spec.power
        return jnp.broadcast_to(c, d.shape[:-1] + (3,))

    if spec.bg_type == BG_GRADIENT:
        z = d[..., 2]
        t = jnp.clip(jnp.abs(z), 0.0, 1.0)[..., None]
        sky = (1.0 - t) * jnp.asarray(spec.horizon_color, jnp.float32) + t * (
            jnp.asarray(spec.zenith_color, jnp.float32)
        )
        ground = (1.0 - t) * jnp.asarray(
            spec.horizon_ground_color, jnp.float32
        ) + t * jnp.asarray(spec.zenith_ground_color, jnp.float32)
        return jnp.where((z >= 0.0)[..., None], sky, ground) * spec.power

    if spec.bg_type == BG_TEXTURE:
        u, v = dir_to_uv(spec, d)
        hb, wb = bg_image.shape[0], bg_image.shape[1]
        x = jnp.clip((u * wb).astype(jnp.int32), 0, wb - 1)
        y = jnp.clip((v * hb).astype(jnp.int32), 0, hb - 1)
        return bg_image[y, x] * spec.power

    raise ValueError(f"background type {spec.bg_type} not compiled here")


def dir_to_uv(spec: BackgroundSpec, d):
    """Direction -> texture uv for texture backgrounds (sphere = lat-long
    with z-up, probe = angular map), with rotation degrees around z."""
    rot = spec.rotation * jnp.pi / 180.0
    if spec.mapping == "probe":
        # angular probe: r = acos(dz)/pi spread over the forward axis (-y)
        dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
        r = jnp.arccos(jnp.clip(-dy, -1.0, 1.0)) / jnp.pi
        denom = jnp.maximum(jnp.sqrt(dx * dx + dz * dz), 1e-9)
        u = 0.5 + 0.5 * r * dx / denom
        v = 0.5 + 0.5 * r * dz / denom
        return u, v
    phi = jnp.arctan2(d[..., 1], d[..., 0]) + rot
    u = (phi / (2.0 * jnp.pi)) % 1.0
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    v = theta / jnp.pi
    return u, v


def uv_to_dir(spec: BackgroundSpec, u, v):
    """Inverse of dir_to_uv for lat-long maps (used by IBL sampling)."""
    rot = spec.rotation * jnp.pi / 180.0
    phi = u * 2.0 * jnp.pi - rot
    theta = v * jnp.pi
    st = jnp.sin(theta)
    return jnp.stack(
        [st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )
