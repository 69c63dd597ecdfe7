"""Procedural textures + noise generators.

Reference (SURVEY §2.1 'Noise generators' + §2.5 basictex.cc): Blender-
compatible procedural set — clouds, marble, wood, voronoi (4 metrics,
weighted F1..F4), musgrave fractals (fBm / ridged / hybrid), distorted
noise, blend gradient, RGB cube — over Perlin-style gradient noise.

TPU-native: hash-based gradient noise computed lane-wise (no permutation
tables in memory; the hash IS the table), fixed-octave fractals (static
unroll), all pure jnp.  Texture spec tuples are static so each used texture
compiles to straight-line VPU code.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import qmc


def _hash3(ix, iy, iz, seed=0):
    return qmc.hash_combine(
        qmc.hash_combine(ix.astype(jnp.uint32) + jnp.uint32(seed),
                         iy.astype(jnp.uint32)),
        iz.astype(jnp.uint32),
    )


def _grad_dot(h, fx, fy, fz):
    """Gradient from hash (12 directions), dotted with offset."""
    h = h % jnp.uint32(12)
    u = jnp.where(h < 8, fx, fy)
    v = jnp.where(h < 4, fy, jnp.where((h == 12) | (h == 14), fx, fz))
    su = jnp.where((h & jnp.uint32(1)) == 0, u, -u)
    sv = jnp.where((h & jnp.uint32(2)) == 0, v, -v)
    return su + sv


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def gradient_noise(p, seed: int = 0):
    """Perlin-style gradient noise in [-1, 1], p (...,3)."""
    pi = jnp.floor(p)
    pf = p - pi
    ix = pi[..., 0].astype(jnp.int32)
    iy = pi[..., 1].astype(jnp.int32)
    iz = pi[..., 2].astype(jnp.int32)
    fx, fy, fz = pf[..., 0], pf[..., 1], pf[..., 2]

    def corner(dx, dy, dz):
        h = _hash3(ix + dx, iy + dy, iz + dz, seed)
        return _grad_dot(h, fx - dx, fy - dy, fz - dz)

    u = _fade(fx)
    v = _fade(fy)
    w = _fade(fz)

    def lerp(a, b, t):
        return a + (b - a) * t

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    x00 = lerp(c000, c100, u)
    x10 = lerp(c010, c110, u)
    x01 = lerp(c001, c101, u)
    x11 = lerp(c011, c111, u)
    return lerp(lerp(x00, x10, v), lerp(x01, x11, v), w) * 0.97


def turbulence(p, octaves: int, hard: bool = False, seed: int = 0):
    """fBm / turbulence, result ~[0,1] (abs-sum when hard)."""
    amp = 1.0
    freq = 1.0
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    norm = 0.0
    for o in range(max(1, min(octaves, 8))):
        n = gradient_noise(p * freq, seed + o)
        total = total + amp * (jnp.abs(n) if hard else n)
        norm += amp
        amp *= 0.5
        freq *= 2.0
    t = total / norm
    return t if hard else t * 0.5 + 0.5


def voronoi_f(p, metric: str = "dist", seed: int = 0):
    """Voronoi F1..F4 distances (Worley).  Returns (f1, f2, f3, f4, cell_hash
    of nearest)."""
    pi = jnp.floor(p)
    pf = p - pi
    f = [jnp.full(p.shape[:-1], 1e10, jnp.float32) for _ in range(4)]
    best_h = jnp.zeros(p.shape[:-1], jnp.uint32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                ix = pi[..., 0].astype(jnp.int32) + dx
                iy = pi[..., 1].astype(jnp.int32) + dy
                iz = pi[..., 2].astype(jnp.int32) + dz
                h = _hash3(ix, iy, iz, seed)
                jx = (h & jnp.uint32(1023)).astype(jnp.float32) / 1023.0
                jy = ((h >> 10) & jnp.uint32(1023)).astype(jnp.float32) / 1023.0
                jz = ((h >> 20) & jnp.uint32(1023)).astype(jnp.float32) / 1023.0
                ox = dx + jx - pf[..., 0]
                oy = dy + jy - pf[..., 1]
                oz = dz + jz - pf[..., 2]
                if metric == "manhattan":
                    d = jnp.abs(ox) + jnp.abs(oy) + jnp.abs(oz)
                elif metric == "chebychev":
                    d = jnp.maximum(jnp.maximum(jnp.abs(ox), jnp.abs(oy)),
                                    jnp.abs(oz))
                elif metric == "dist_squared":
                    d = ox * ox + oy * oy + oz * oz
                else:
                    d = jnp.sqrt(ox * ox + oy * oy + oz * oz)
                is_f1 = d < f[0]
                best_h = jnp.where(is_f1, h, best_h)
                # keep the 4 smallest of {f1..f4, d} via min-extraction
                cand = [f[0], f[1], f[2], f[3], d]
                fs = []
                rem = cand
                for _ in range(4):
                    m = rem[0]
                    for r in rem[1:]:
                        m = jnp.minimum(m, r)
                    fs.append(m)
                    # remove one instance of the min
                    removed = jnp.zeros_like(m, dtype=jnp.bool_)
                    new_rem = []
                    for r in rem:
                        is_min = (r == m) & ~removed
                        removed = removed | is_min
                        new_rem.append(jnp.where(is_min, 1e10, r))
                    rem = new_rem
                f = fs
    return f[0], f[1], f[2], f[3], best_h


def musgrave(p, mtype: str, octaves: int = 6, h_exp: float = 1.0,
             lacunarity: float = 2.0, offset: float = 1.0,
             gain: float = 1.0, seed: int = 0):
    value = jnp.zeros(p.shape[:-1], jnp.float32)
    freq = 1.0
    amp = 1.0
    if mtype == "ridged_multifractal":
        signal = offset - jnp.abs(gradient_noise(p, seed))
        signal = signal * signal
        value = signal
        weight = jnp.ones_like(value)
        for o in range(1, max(2, min(octaves, 8))):
            freq *= lacunarity
            weight = jnp.clip(signal * gain, 0.0, 1.0)
            signal = offset - jnp.abs(gradient_noise(p * freq, seed + o))
            signal = signal * signal * weight
            value = value + signal / (freq ** h_exp)
        return value
    if mtype == "hybrid_multifractal":
        value = gradient_noise(p, seed) + offset
        weight = value
        for o in range(1, max(2, min(octaves, 8))):
            freq *= lacunarity
            weight = jnp.minimum(weight, 1.0)
            signal = (gradient_noise(p * freq, seed + o) + offset) \
                / (freq ** h_exp)
            value = value + weight * signal
            weight = weight * signal
        return value
    # fBm / multifractal
    for o in range(max(1, min(octaves, 8))):
        value = value + gradient_noise(p * freq, seed + o) * amp
        freq *= lacunarity
        amp /= lacunarity ** h_exp
    return value


def eval_procedural(spec: tuple, p, uv):
    """spec: static tuple from textures/factory compile:
    (type, size, params...).  Returns (N,3)."""
    ttype = spec[0]
    params = dict(spec[1]) if len(spec) > 1 and spec[1] else {}
    size = float(params.get("size", 1.0))
    q = p * size

    if ttype == "clouds":
        depth = int(params.get("depth", 2))
        t = turbulence(q, depth + 1, hard=bool(params.get("hard", False)))
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "marble":
        depth = int(params.get("depth", 2))
        turb = float(params.get("turbulence", 5.0))
        sharp = float(params.get("sharpness", 1.0))
        n = turb * turbulence(q, depth + 1, hard=True)
        t = jnp.sin((q[..., 0] + q[..., 1] + q[..., 2]) * jnp.pi + n)
        t = jnp.power(jnp.abs(t), 1.0 / max(sharp, 1e-3)) * jnp.sign(t)
        t = t * 0.5 + 0.5
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "wood":
        turb = float(params.get("turbulence", 2.0))
        n = turb * 0.1 * turbulence(q, 3, hard=True)
        r = jnp.sqrt(q[..., 0] ** 2 + q[..., 1] ** 2)
        wtype = params.get("wood_type", "rings")
        base = r if wtype in ("rings", "ringnoise") else (
            q[..., 0] + q[..., 1])
        t = jnp.abs(jnp.sin(base * 10.0 + n * 6.2831))
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "voronoi":
        metric = params.get("distance_metric", "dist")
        w1 = float(params.get("weight_1", 1.0))
        w2 = float(params.get("weight_2", 0.0))
        w3 = float(params.get("weight_3", 0.0))
        w4 = float(params.get("weight_4", 0.0))
        isc = float(params.get("intensity", 1.0))
        f1, f2, f3, f4, h = voronoi_f(q, metric)
        ctype = params.get("color_type", "int")
        t = jnp.clip(isc * (w1 * f1 + w2 * f2 + w3 * f3 + w4 * f4),
                     0.0, 1.0)
        if ctype in ("col1", "col2", "col3"):
            # cell colors from the nearest feature hash
            r = (h & jnp.uint32(255)).astype(jnp.float32) / 255.0
            g = ((h >> 8) & jnp.uint32(255)).astype(jnp.float32) / 255.0
            b = ((h >> 16) & jnp.uint32(255)).astype(jnp.float32) / 255.0
            return jnp.stack([r, g, b], axis=-1) * t[..., None]
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "musgrave":
        mtype = params.get("musgrave_type", "fBm")
        t = musgrave(
            q, mtype,
            octaves=int(params.get("octaves", 6)),
            h_exp=float(params.get("H", 1.0)),
            lacunarity=float(params.get("lacunarity", 2.0)),
            offset=float(params.get("offset", 1.0)),
            gain=float(params.get("gain", 1.0)),
        )
        t = jnp.clip(t * float(params.get("intensity", 1.0)) * 0.5 + 0.5,
                     0.0, 1.0)
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "distorted_noise":
        dist = float(params.get("distort", 1.0))
        n1 = gradient_noise(q, 7)
        t = gradient_noise(q + dist * n1[..., None], 13) * 0.5 + 0.5
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "blend":
        stype = params.get("stype", "lin")
        t = jnp.clip(uv[..., 0], 0.0, 1.0)
        if stype == "quad":
            t = t * t
        elif stype == "ease":
            t = t * t * (3.0 - 2.0 * t)
        elif stype in ("diag",):
            t = 0.5 * (uv[..., 0] + uv[..., 1])
        elif stype in ("sphere", "halo"):
            dx = uv[..., 0] - 0.5
            dy = uv[..., 1] - 0.5
            t = jnp.clip(1.0 - 2.0 * jnp.sqrt(dx * dx + dy * dy), 0.0, 1.0)
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "rgb_cube":
        return jnp.clip(jnp.abs(p), 0.0, 1.0)

    # unknown: mid grey (warn happened at factory time)
    t = jnp.full(p.shape[:-1], 0.5, jnp.float32)
    return jnp.stack([t, t, t], axis=-1)
