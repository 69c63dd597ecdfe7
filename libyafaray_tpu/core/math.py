"""Vector math over stacked SoA arrays (reference: include/core_api/vector3d.h).

All functions operate on arrays whose trailing axis is 3 (xyz).  They are pure
jnp functions, usable inside jit / shard_map / pallas host code alike.  The
reference's `vector3d_t` scalar methods (reflect_dir, refract, fresnel,
createCS) become batched lane-wise ops here.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def dot(a, b):
    """Batched 3-vector dot product -> (...,) scalar."""
    return jnp.sum(a * b, axis=-1)


def dot_keep(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v):
    return v / jnp.maximum(length(v)[..., None], 1e-20)


def reflect(d, n):
    """Mirror direction of incident dir `d` (pointing *away* from surface,
    i.e. wo convention) about normal `n`:  r = 2(n·d)n - d."""
    return 2.0 * dot_keep(n, d) * n - d


def reflect_incoming(d, n):
    """Mirror of a ray direction `d` travelling *into* the surface."""
    return d - 2.0 * dot_keep(n, d) * n


def refract(wo, n, eta):
    """Refract wo (away-from-surface convention) through normal n with
    relative IOR eta = n_inside/n_outside already resolved by caller for
    the side of `n` wo lives on.  Returns (wi, valid) where valid=False on
    total internal reflection.  Matches vector3d.h `refract` semantics
    (Snell, unpolarized)."""
    cos_i = dot(n, wo)
    inv_eta = jnp.asarray(1.0 / eta)
    sin2_t = inv_eta * inv_eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    valid = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wi = -inv_eta[..., None] * wo + (inv_eta * cos_i - cos_t)[..., None] * n
    wi = normalize(wi)
    return wi, valid


def fresnel_dielectric(cos_i, eta):
    """Unpolarized Fresnel reflectance for a dielectric.

    cos_i: |cos| of the angle between wo and the (front-facing) normal.
    eta:  ior ratio n_transmitted / n_incident  (>1 entering denser medium).
    Returns Kr in [0,1]; returns 1.0 under total internal reflection.
    Reference semantics: vector3d.h `fresnel` (SURVEY App. B glass rules).
    """
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (1.0 / (eta * eta)) * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    kr = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, jnp.clip(kr, 0.0, 1.0))


def schlick_fresnel(cos_i, r0):
    c = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    c2 = c * c
    return r0 + (1.0 - r0) * c2 * c2 * c


def build_onb(n):
    """Orthonormal basis from unit normal (branchless Duff/Frisvad 2017).
    Returns (u, v) with (u, v, n) right-handed.  Reference: `createCS`."""
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    u = jnp.stack([1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1)
    v = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return u, v


def to_local(u, v, n, w):
    """World dir -> local frame components (x=u, y=v, z=n)."""
    return jnp.stack([dot(w, u), dot(w, v), dot(w, n)], axis=-1)


def from_local(u, v, n, wl):
    return wl[..., 0:1] * u + wl[..., 1:2] * v + wl[..., 2:3] * n


def spherical_dir(cos_theta, sin_theta, phi):
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def face_forward(n, d):
    """Flip n to lie in the hemisphere of d."""
    return jnp.where(dot_keep(n, d) < 0.0, -n, n)


def transform_point(m, p):
    """Apply 4x4 affine matrix (…,4,4) or (4,4) to points (…,3)."""
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], p) + m[..., :3, 3]


def transform_dir(m, d):
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], d)
