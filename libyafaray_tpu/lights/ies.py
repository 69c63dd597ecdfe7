"""IES photometric profile support (reference src/lights/ieslight.cc +
include/utilities/iesUtils.h — SURVEY §2.6).

Host side parses the IESNA LM-63 file into a FULL (θ, φ) candela grid
(LM-63 horizontal-symmetry rules expanded: 0°=axial, 90°=quadrant,
180°=bilateral, 360°=full); the device side modulates a point light's
intensity by bilinear interpolation at the emission angles, with the
azimuth frame built deterministically around the light axis.
"""
from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

log = logging.getLogger("libyafaray_tpu")

PROFILE_RES = 91  # 2-degree vertical resolution, interpolated
PROFILE_HRES = 73  # 5-degree azimuthal resolution (phi in [0, 360])


def parse_ies(path: str) -> np.ndarray:
    """Parse an IESNA LM-63 file -> normalized intensity profile over
    vertical angle theta in [0, pi], (PROFILE_RES,) float32.
    Candela values are azimuthally averaged and peak-normalized (the
    light's `power` param carries the magnitude)."""
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        text = f.read()
    # find the TILT line; numeric payload starts after it
    lines = text.splitlines()
    start = 0
    for i, ln in enumerate(lines):
        if ln.strip().upper().startswith("TILT="):
            tilt = ln.split("=", 1)[1].strip().upper()
            start = i + 1
            if tilt == "INCLUDE":
                # skip tilt block: <angles line> <n> <angles...> <factors...>
                nums_seen = 0
                j = start
                vals = []
                while j < len(lines) and nums_seen < 2:
                    vals += lines[j].split()
                    j += 1
                    nums_seen = len(vals)
                n_tilt = int(float(vals[1]))
                need = 2 + 2 * n_tilt
                while len(vals) < need and j < len(lines):
                    vals += lines[j].split()
                    j += 1
                start = j
            break
    nums: list[float] = []
    for ln in lines[start:]:
        for tok in ln.replace(",", " ").split():
            try:
                nums.append(float(tok))
            except ValueError:
                pass
    # header: lamps, lumens/lamp, multiplier, n_v, n_h, photometric type,
    # units, width, length, height, ballast, future, watts
    if len(nums) < 13:
        raise ValueError("truncated IES file")
    n_v = int(nums[3])
    n_h = int(nums[4])
    mult = nums[2]
    idx = 13
    v_angles = np.asarray(nums[idx:idx + n_v])
    idx += n_v
    h_angles = np.asarray(nums[idx:idx + n_h])
    idx += n_h
    candela = np.asarray(nums[idx:idx + n_v * n_h])
    if candela.size < n_v * n_h:
        raise ValueError("truncated candela table")
    candela = candela.reshape(n_h, n_v) * mult

    # horizontal symmetry expansion (LM-63): the last horizontal angle
    # declares the coverage
    h_last = h_angles[-1] if n_h else 0.0
    if n_h <= 1 or h_last == 0.0:
        h_full = np.asarray([0.0, 360.0])
        c_full = np.broadcast_to(candela[:1], (2, n_v))
    elif abs(h_last - 90.0) < 1e-6:
        h_full = np.concatenate([h_angles, 180.0 - h_angles[::-1][1:],
                                 180.0 + h_angles[1:],
                                 360.0 - h_angles[::-1][1:]])
        c_full = np.concatenate([candela, candela[::-1][1:],
                                 candela[1:], candela[::-1][1:]])
    elif abs(h_last - 180.0) < 1e-6:
        h_full = np.concatenate([h_angles, 360.0 - h_angles[::-1][1:]])
        c_full = np.concatenate([candela, candela[::-1][1:]])
    else:
        h_full = h_angles
        c_full = candela

    theta = np.linspace(0.0, 180.0, PROFILE_RES)
    phi = np.linspace(0.0, 360.0, PROFILE_HRES)
    # resample each horizontal slice over theta, then over phi
    c_v = np.stack([
        np.interp(theta, v_angles, c_full[h],
                  left=c_full[h][0], right=0.0)
        for h in range(c_full.shape[0])
    ])  # (H_in, PROFILE_RES)
    grid = np.stack([
        np.interp(phi, h_full, c_v[:, t],
                  left=c_v[0, t], right=c_v[-1, t])
        for t in range(PROFILE_RES)
    ])  # (PROFILE_RES, PROFILE_HRES)
    peak = grid.max()
    if peak <= 0:
        raise ValueError("empty IES profile")
    return (grid / peak).astype(np.float32)


def apply_ies_profile(profile, light_dir, wi):
    """Modulate intensity by the profile at the emission direction -wi.
    profile: (PROFILE_RES,) vertical-only or (PROFILE_RES, PROFILE_HRES)
    full (θ, φ) grid; returns (N,) factor.  The azimuth frame is a
    deterministic ONB around the light axis (the reference fixes it from
    the luminaire orientation; any consistent frame is equivalent up to
    profile rotation)."""
    from ..core import math as vmath

    d = -wi
    ld = light_dir + jnp.zeros_like(wi)
    cos_t = jnp.clip(jnp.sum(d * ld, axis=-1), -1.0, 1.0)
    theta = jnp.arccos(cos_t)  # 0 = straight down the light axis
    x = theta / jnp.pi * (PROFILE_RES - 1)
    i0 = jnp.clip(x.astype(jnp.int32), 0, PROFILE_RES - 2)
    fx = x - i0
    if profile.ndim == 1:
        return profile[i0] * (1.0 - fx) + profile[i0 + 1] * fx
    t1, t2 = vmath.build_onb(vmath.normalize(ld))
    phi = jnp.arctan2(jnp.sum(d * t2, axis=-1),
                      jnp.sum(d * t1, axis=-1))  # [-pi, pi]
    y = (phi / (2.0 * jnp.pi) % 1.0) * (PROFILE_HRES - 1)
    j0 = jnp.clip(y.astype(jnp.int32), 0, PROFILE_HRES - 2)
    fy = y - j0
    c00 = profile[i0, j0]
    c10 = profile[i0 + 1, j0]
    c01 = profile[i0, j0 + 1]
    c11 = profile[i0 + 1, j0 + 1]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)
