"""IES photometric profile support (reference src/lights/ieslight.cc +
include/utilities/iesUtils.h — SURVEY §2.6).

Host side parses the IESNA LM-63 file into a vertical-angle intensity
profile (azimuthally averaged — matching the reference's practical use for
point-source luminaires); the device side modulates a point light's
intensity by interpolating the profile at the emission angle.
"""
from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp

log = logging.getLogger("libyafaray_tpu")

PROFILE_RES = 91  # 2-degree vertical resolution, interpolated


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
    profile_v = candela.mean(axis=0)  # azimuthal average

    theta = np.linspace(0.0, 180.0, PROFILE_RES)
    prof = np.interp(theta, v_angles, profile_v,
                     left=profile_v[0], right=0.0)
    peak = prof.max()
    if peak <= 0:
        raise ValueError("empty IES profile")
    return (prof / peak).astype(np.float32)


def apply_ies_profile(profile, light_dir, wi):
    """Modulate intensity by the profile at the angle between the light's
    nadir axis (light_dir) and the emission direction (-wi).
    profile: (PROFILE_RES,) device array; returns (N,) factor."""
    cos_t = jnp.clip(jnp.sum(-wi * light_dir, axis=-1), -1.0, 1.0)
    theta = jnp.arccos(cos_t)  # 0 = straight down the light axis
    x = theta / jnp.pi * (PROFILE_RES - 1)
    i0 = jnp.clip(x.astype(jnp.int32), 0, PROFILE_RES - 2)
    fx = x - i0
    return profile[i0] * (1.0 - fx) + profile[i0 + 1] * fx
