"""Procedural textures + noise generators.

Reference (SURVEY §2.1 'Noise generators' + §2.5 basictex.cc): Blender-
compatible procedural set — clouds, marble, wood, voronoi (4 metrics,
weighted F1..F4), musgrave fractals (fBm / ridged / hybrid), distorted
noise, blend gradient, RGB cube — over a selectable noise BASIS
(noise_type param): `newperlin`/`stdperlin` are the canonical Improved
Perlin (2002) with the published reference permutation (numerically the
function Blender's newPerlin implements); `voronoi_f1..f4`, `crackle`
and `cellnoise` reuse the Worley machinery; `blender` (the default
orgBlenderNoise) is a hash-gradient stand-in — its fitted table is not
re-derivable offline (PARITY.md).

TPU-native: lane-wise evaluation (the canonical basis does its 512-entry
permutation lookups as jnp gathers; the hash bases need no tables),
fixed-octave fractals (static unroll), all pure jnp.  Texture spec
tuples are static so each used texture compiles to straight-line VPU
code.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import qmc

# Ken Perlin's reference permutation (2002 "Improving Noise", public
# reference implementation) — doubled to avoid index wrapping.
_PERLIN_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7,
    225, 140, 36, 103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6,
    148, 247, 120, 234, 75, 0, 26, 197, 62, 94, 252, 219, 203, 117, 35,
    11, 32, 57, 177, 33, 88, 237, 149, 56, 87, 174, 20, 125, 136, 171,
    168, 68, 175, 74, 165, 71, 134, 139, 48, 27, 166, 77, 146, 158,
    231, 83, 111, 229, 122, 60, 211, 133, 230, 220, 105, 92, 41, 55,
    46, 245, 40, 244, 102, 143, 54, 65, 25, 63, 161, 1, 216, 80, 73,
    209, 76, 132, 187, 208, 89, 18, 169, 200, 196, 135, 130, 116, 188,
    159, 86, 164, 100, 109, 198, 173, 186, 3, 64, 52, 217, 226, 250,
    124, 123, 5, 202, 38, 147, 118, 126, 255, 82, 85, 212, 207, 206,
    59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183, 170, 213, 119,
    248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172, 9,
    129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185,
    112, 104, 218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12,
    191, 179, 162, 241, 81, 51, 145, 235, 249, 14, 239, 107, 49, 192,
    214, 31, 181, 199, 106, 157, 184, 84, 204, 176, 115, 121, 50, 45,
    127, 4, 150, 254, 138, 236, 205, 93, 222, 114, 67, 29, 24, 72, 243,
    141, 128, 195, 78, 66, 215, 61, 156, 180], np.int32)
_PERLIN_PERM2 = np.concatenate([_PERLIN_PERM, _PERLIN_PERM])


def _perlin_grad(h, x, y, z):
    """Canonical improved-Perlin gradient: h & 15 selects one of 12 edge
    vectors (with 4 repeats), dotted with the offset."""
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return (jnp.where((h & 1) == 0, u, -u)
            + jnp.where((h & 2) == 0, v, -v))


def perlin_noise(p):
    """Improved Perlin noise (2002), canonical: reference permutation,
    quintic fade, 12 edge gradients.  Zero at every integer lattice
    point; range within [-1, 1].  This is the function Blender's
    `newPerlin` basis evaluates — numeric parity for that basis."""
    perm = jnp.asarray(_PERLIN_PERM2)
    pi = jnp.floor(p)
    pf = p - pi
    xi = (pi[..., 0].astype(jnp.int32)) & 255
    yi = (pi[..., 1].astype(jnp.int32)) & 255
    zi = (pi[..., 2].astype(jnp.int32)) & 255
    x, y, z = pf[..., 0], pf[..., 1], pf[..., 2]
    u, v, w = _fade(x), _fade(y), _fade(z)
    a = perm[xi] + yi
    aa = perm[a] + zi
    ab = perm[a + 1] + zi
    b = perm[xi + 1] + yi
    ba = perm[b] + zi
    bb = perm[b + 1] + zi

    def lerp(lo, hi, t):
        return lo + (hi - lo) * t

    c000 = _perlin_grad(perm[aa], x, y, z)
    c100 = _perlin_grad(perm[ba], x - 1, y, z)
    c010 = _perlin_grad(perm[ab], x, y - 1, z)
    c110 = _perlin_grad(perm[bb], x - 1, y - 1, z)
    c001 = _perlin_grad(perm[aa + 1], x, y, z - 1)
    c101 = _perlin_grad(perm[ba + 1], x - 1, y, z - 1)
    c011 = _perlin_grad(perm[ab + 1], x, y - 1, z - 1)
    c111 = _perlin_grad(perm[bb + 1], x - 1, y - 1, z - 1)
    return lerp(
        lerp(lerp(c000, c100, u), lerp(c010, c110, u), v),
        lerp(lerp(c001, c101, u), lerp(c011, c111, u), v), w)


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


def noise_basis(p, basis: str = "blender", seed: int = 0):
    """Selectable noise basis in [-1, 1] (Blender noise_type values,
    reference src/textures/basictex.cc + BLI noise):
      blender      hash-gradient stand-in (orgBlenderNoise table is not
                   re-derivable offline — PARITY.md)
      newperlin    canonical Improved Perlin (exact; seed ignored like
                   Blender — octaves decorrelate by frequency)
      stdperlin    mapped to newperlin (the 1985 table is generated from
                   a seeded libc RNG; not reproducible offline)
      voronoi_f1..f4, voronoi_crackle, cellnoise: Worley-based values.
    """
    if basis in ("newperlin", "improvedperlin", "stdperlin", "perlin"):
        return perlin_noise(p)
    if basis.startswith("voronoi") or basis == "crackle":
        f1, f2, f3, f4, _ = voronoi_f(p, "dist", seed)
        if basis.endswith("f2"):
            v = f2
        elif basis.endswith("f3"):
            v = f3
        elif basis.endswith("f4"):
            v = f4
        elif basis.endswith("crackle") or basis == "crackle":
            v = f2 - f1
        else:
            v = f1
        return jnp.clip(v, 0.0, 1.0) * 2.0 - 1.0
    if basis == "cellnoise":
        pi = jnp.floor(p)
        h = _hash3(pi[..., 0].astype(jnp.int32),
                   pi[..., 1].astype(jnp.int32),
                   pi[..., 2].astype(jnp.int32), seed)
        return (h & jnp.uint32(0xFFFF)).astype(jnp.float32) \
            / 32767.5 - 1.0
    return gradient_noise(p, seed)


def turbulence(p, octaves: int, hard: bool = False, seed: int = 0,
               basis: str = "blender"):
    """fBm / turbulence, result ~[0,1] (abs-sum when hard)."""
    amp = 1.0
    freq = 1.0
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    norm = 0.0
    for o in range(max(1, min(octaves, 8))):
        n = noise_basis(p * freq, basis, seed + o)
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
             gain: float = 1.0, seed: int = 0, basis: str = "blender"):
    value = jnp.zeros(p.shape[:-1], jnp.float32)
    freq = 1.0
    amp = 1.0
    if mtype == "ridged_multifractal":
        signal = offset - jnp.abs(noise_basis(p, basis, seed))
        signal = signal * signal
        value = signal
        weight = jnp.ones_like(value)
        for o in range(1, max(2, min(octaves, 8))):
            freq *= lacunarity
            weight = jnp.clip(signal * gain, 0.0, 1.0)
            signal = offset - jnp.abs(noise_basis(p * freq, basis, seed + o))
            signal = signal * signal * weight
            value = value + signal / (freq ** h_exp)
        return value
    if mtype == "hybrid_multifractal":
        value = noise_basis(p, basis, seed) + offset
        weight = value
        for o in range(1, max(2, min(octaves, 8))):
            freq *= lacunarity
            weight = jnp.minimum(weight, 1.0)
            signal = (noise_basis(p * freq, basis, seed + o) + offset) \
                / (freq ** h_exp)
            value = value + weight * signal
            weight = weight * signal
        return value
    # fBm / multifractal
    for o in range(max(1, min(octaves, 8))):
        value = value + noise_basis(p * freq, basis, seed + o) * amp
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

    basis = str(params.get("noise_type", "blender")).lower()
    if ttype == "clouds":
        depth = int(params.get("depth", 2))
        t = turbulence(q, depth + 1, hard=bool(params.get("hard", False)),
                       basis=basis)
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "marble":
        depth = int(params.get("depth", 2))
        turb = float(params.get("turbulence", 5.0))
        sharp = float(params.get("sharpness", 1.0))
        n = turb * turbulence(q, depth + 1, hard=True, basis=basis)
        t = jnp.sin((q[..., 0] + q[..., 1] + q[..., 2]) * jnp.pi + n)
        t = jnp.power(jnp.abs(t), 1.0 / max(sharp, 1e-3)) * jnp.sign(t)
        t = t * 0.5 + 0.5
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "wood":
        turb = float(params.get("turbulence", 2.0))
        n = turb * 0.1 * turbulence(q, 3, hard=True, basis=basis)
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
            basis=basis,
        )
        t = jnp.clip(t * float(params.get("intensity", 1.0)) * 0.5 + 0.5,
                     0.0, 1.0)
        return jnp.stack([t, t, t], axis=-1)

    if ttype == "distorted_noise":
        dist = float(params.get("distort", 1.0))
        b1 = str(params.get("noise_type1", basis)).lower()
        b2 = str(params.get("noise_type2", basis)).lower()
        # the +13.5 lattice offset decorrelates the distortion field
        # from the carrier when both use the same (seedless) basis
        n1 = noise_basis(q + 13.5, b1, 7)
        t = noise_basis(q + dist * n1[..., None], b2, 13) * 0.5 + 0.5
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
