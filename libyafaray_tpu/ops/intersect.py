"""Ray-scene intersection kernels.

Reference role: triKdTree_t::{intersect, intersectS, intersectTS}
(src/yafraycore/kdtree.cc — SURVEY §2.3, the reference's performance-
critical native core) + triangle_t::intersect.

TPU-native design: intersection is a *batched dense* problem, not a
pointer-chase.  Two strategies, chosen per scene at compile time:

1. `brute` — all-pairs Möller-Trumbore over (lane × triangle-chunk) tiles,
   reduced with argmin.  For scenes up to a few thousand triangles this IS
   the speed-of-light approach on a vector machine: it is one fused
   VPU loop with zero divergence, no memory indirection, and the triangle
   data resident in VMEM.  (The Cornell benchmark scene has ~36 triangles;
   a kd-tree would be pure overhead.)

2. `bvh` — wide BVH with threaded (skip-link) stackless traversal under
   `lax.while_loop`, gathering node AABBs per lane (ops/bvh_traverse.py).

Shadow queries come in the same two flavors the reference has: boolean
any-hit (`intersectS`) and transparent-shadow filter accumulation
(`intersectTS`) — the latter computed in log space as a masked product over
hits, which needs no sorting and no shadow_depth loop at all (a strict
generalization of the reference's ≤ shadow_depth walk).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

RAY_EPS = 5e-5  # reference ray_min_dist default (SURVEY App. B)
SHADOW_EPS = 5e-4  # reference shadow_bias default


class Hit(NamedTuple):
    t: jnp.ndarray  # (N,) hit distance (inf if miss)
    tri: jnp.ndarray  # (N,) int32 triangle index (0 if miss; check .hit)
    u: jnp.ndarray  # (N,) barycentric u (weight of corner 1)
    v: jnp.ndarray  # (N,) barycentric v (weight of corner 2)
    hit: jnp.ndarray  # (N,) bool


def _ray_tri_chunk(v0, e1, e2, org, dirn, tmin, tmax):
    """Möller-Trumbore: rays (N,3) × tri chunk (C,3) -> (N,C) t/u/v/valid."""
    # broadcast (N,1,3) x (C,3)
    o = org[:, None, :]
    d = dirn[:, None, :]
    pvec = jnp.cross(d, e2[None, :, :])  # (N,C,3)
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)  # (N,C)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tvec = o - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > tmin[:, None]) & (t < tmax[:, None])
    )
    return t, u, v, valid


SMALL_SCENE_TRIS = 128  # unrolled per-tri loop below this count


def _pad_to_chunk(tris: dict, chunk: int, extra=()):
    """Pad SoA triangle arrays (and optional aligned per-tri `extra`
    arrays) to a multiple of `chunk` with never-hit degenerates
    (e1=e2=0 ⇒ det=0 ⇒ invalid).  The chunked brute loops floor-divide
    the triangle count, so an unpadded tail would be silently SKIPPED
    (production scenes pre-pad at compile — scene.py:397 — but direct
    callers hit this; found by an on-device cross-check in r3)."""
    t = tris["v0"].shape[0]
    pad = (-t) % chunk
    if pad == 0:
        return tris, extra
    z = ((0, pad), (0, 0))
    tris = {
        "v0": jnp.pad(tris["v0"], z, constant_values=1e30),
        "e1": jnp.pad(tris["e1"], z),
        "e2": jnp.pad(tris["e2"], z),
    }
    return tris, tuple(jnp.pad(a, z) for a in extra)


def _closest_hit_small(tris: dict, org, dirn, tmin, tmax,
                       geom_pack=None) -> Hit:
    """Tiny-scene variant: static unroll over triangles with scalar tri
    data — every intermediate stays (N,)-shaped (perfect VPU lane
    alignment, zero padding waste).

    Perf note: the per-triangle tests are kept INDEPENDENT (constant tmax,
    no running-min in the test) so XLA can overlap all of them; the winner
    is selected by one argmin tree-reduction afterwards and its barycentrics
    recomputed from gathered triangle data — ~4x faster than a sequential
    best-so-far loop whose compare chained every iteration."""
    n = org.shape[0]
    t_total = tris["v0"].shape[0]
    ts = []
    for k in range(t_total):
        v0 = tris["v0"][k]
        e1 = tris["e1"][k]
        e2 = tris["e2"][k]
        pvec = jnp.cross(dirn, e2[None, :])
        det = jnp.sum(pvec * e1, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        tvec = org - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1[None, :])
        v = jnp.sum(dirn * qvec, axis=-1) * inv_det
        t = jnp.sum(qvec * e2, axis=-1) * inv_det
        ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > tmin) & (t < tmax))
        ts.append(jnp.where(ok, t, jnp.inf))
    tstack = jnp.stack(ts, axis=0)  # (K, N)
    best_tri = jnp.argmin(tstack, axis=0).astype(jnp.int32)
    best_t = jnp.min(tstack, axis=0)
    hit_any = jnp.isfinite(best_t)
    # recompute the winner's barycentrics from gathered triangle data
    # (one packed gather when available: gathers have a high fixed cost)
    if geom_pack is not None:
        gp = geom_pack[jnp.clip(best_tri, 0, geom_pack.shape[0] - 1)]
        v0w, e1w, e2w = gp[:, 0:3], gp[:, 3:6], gp[:, 6:9]
    else:
        v0w = tris["v0"][best_tri]
        e1w = tris["e1"][best_tri]
        e2w = tris["e2"][best_tri]
    pvec = jnp.cross(dirn, e2w)
    det = jnp.sum(pvec * e1w, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tvec = org - v0w
    best_u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1w)
    best_v = jnp.sum(dirn * qvec, axis=-1) * inv_det
    return Hit(t=best_t, tri=best_tri,
               u=jnp.where(hit_any, best_u, 0.0),
               v=jnp.where(hit_any, best_v, 0.0), hit=hit_any)


def _shadow_small(tris: dict, filt, org, dirn, dist):
    n = org.shape[0]
    t_total = tris["v0"].shape[0]
    tmin = jnp.full((n,), SHADOW_EPS, jnp.float32)
    tmax = dist * (1.0 - 1e-4) - SHADOW_EPS
    log_f = jnp.log(jnp.maximum(filt, 1e-12))
    opaque = jnp.max(filt, axis=-1) < 1e-6
    log_tr = jnp.zeros((n, 3), jnp.float32)
    blocked = jnp.zeros((n,), jnp.bool_)
    for k in range(t_total):
        v0 = tris["v0"][k]
        e1 = tris["e1"][k]
        e2 = tris["e2"][k]
        pvec = jnp.cross(dirn, e2[None, :])
        det = jnp.sum(pvec * e1, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        tvec = org - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1[None, :])
        v = jnp.sum(dirn * qvec, axis=-1) * inv_det
        t = jnp.sum(qvec * e2, axis=-1) * inv_det
        ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > tmin) & (t < tmax))
        blocked = blocked | (ok & opaque[k])
        log_tr = log_tr + jnp.where(ok[..., None], log_f[k], 0.0)
    return jnp.where(blocked[:, None], 0.0, jnp.exp(log_tr))


def closest_hit_brute(tris: dict, org, dirn, tmin=None, tmax=None,
                      chunk: int = 512, geom_pack=None) -> Hit:
    """Nearest-hit over all triangles; tris: v0/e1/e2 (T,3) padded arrays."""
    n = org.shape[0]
    t_total = tris["v0"].shape[0]
    if tmin is None:
        tmin = jnp.full((n,), RAY_EPS, jnp.float32)
    if tmax is None:
        tmax = jnp.full((n,), jnp.inf, jnp.float32)
    if t_total <= SMALL_SCENE_TRIS:
        return _closest_hit_small(tris, org, dirn, tmin, tmax, geom_pack)
    tris, _ = _pad_to_chunk(tris, chunk)
    t_total = tris["v0"].shape[0]

    def do_chunk(carry, c0):
        best_t, best_tri, best_u, best_v = carry
        v0 = lax.dynamic_slice_in_dim(tris["v0"], c0, chunk, 0)
        e1 = lax.dynamic_slice_in_dim(tris["e1"], c0, chunk, 0)
        e2 = lax.dynamic_slice_in_dim(tris["e2"], c0, chunk, 0)
        t, u, v, valid = _ray_tri_chunk(v0, e1, e2, org, dirn, tmin,
                                        jnp.minimum(tmax, best_t))
        t = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t, axis=1)  # (N,)
        rows = jnp.arange(n)
        tj = t[rows, j]
        better = tj < best_t
        best_t = jnp.where(better, tj, best_t)
        best_tri = jnp.where(better, c0 + j.astype(jnp.int32), best_tri)
        best_u = jnp.where(better, u[rows, j], best_u)
        best_v = jnp.where(better, v[rows, j], best_v)
        return (best_t, best_tri, best_u, best_v), None

    init = (
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    n_chunks = t_total // chunk
    if n_chunks <= 1:
        carry, _ = do_chunk(init, jnp.int32(0))
    else:
        starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
        carry, _ = lax.scan(do_chunk, init, starts)
    best_t, best_tri, best_u, best_v = carry
    return Hit(t=best_t, tri=best_tri, u=best_u, v=best_v,
               hit=jnp.isfinite(best_t))


def shadow_transmission_brute(tris: dict, filt, org, dirn, dist,
                              chunk: int = 512):
    """Transparent-shadow transmission along segments org -> org + dirn*dist.

    filt: (T,3) per-triangle transmission filter (0 ⇒ opaque; from
    material shadow_filter, texture-resolved at scene compile).
    Returns (N,3) transmission (0 where fully occluded).
    Matches intersectS when all filters are 0/1 and intersectTS otherwise.
    """
    n = org.shape[0]
    t_total = tris["v0"].shape[0]
    if t_total <= SMALL_SCENE_TRIS:
        return _shadow_small(tris, filt, org, dirn, dist)
    tris, (filt,) = _pad_to_chunk(tris, chunk, (filt,))
    t_total = tris["v0"].shape[0]
    tmin = jnp.full((n,), SHADOW_EPS, jnp.float32)
    log_f = jnp.log(jnp.maximum(filt, 1e-12))  # (T,3)
    opaque = jnp.max(filt, axis=-1) < 1e-6  # (T,)

    def do_chunk(carry, c0):
        log_tr, blocked = carry
        v0 = lax.dynamic_slice_in_dim(tris["v0"], c0, chunk, 0)
        e1 = lax.dynamic_slice_in_dim(tris["e1"], c0, chunk, 0)
        e2 = lax.dynamic_slice_in_dim(tris["e2"], c0, chunk, 0)
        lf = lax.dynamic_slice_in_dim(log_f, c0, chunk, 0)
        op = lax.dynamic_slice_in_dim(opaque, c0, chunk, 0)
        tmax = dist * (1.0 - 1e-4) - SHADOW_EPS
        _, _, _, valid = _ray_tri_chunk(v0, e1, e2, org, dirn, tmin, tmax)
        blocked = blocked | jnp.any(valid & op[None, :], axis=1)
        log_tr = log_tr + jnp.einsum(
            "nc,cd->nd", valid.astype(jnp.float32), lf
        )
        return (log_tr, blocked), None

    init = (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.bool_))
    n_chunks = t_total // chunk
    if n_chunks <= 1:
        carry, _ = do_chunk(init, jnp.int32(0))
    else:
        starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
        carry, _ = lax.scan(do_chunk, init, starts)
    log_tr, blocked = carry
    tr = jnp.exp(log_tr)
    return jnp.where(blocked[:, None], 0.0, tr)


def pad_triangles(v0, e1, e2, multiple: int):
    """Pad triangle SoA arrays to a multiple of the chunk size with
    never-hit degenerates (e1=e2=0 ⇒ det=0 ⇒ invalid)."""
    import numpy as np

    t = v0.shape[0]
    pad = (-t) % multiple
    if pad == 0:
        return v0, e1, e2, t
    z = np.zeros((pad, 3), np.float32)
    far = np.full((pad, 3), 1e30, np.float32)
    return (
        np.concatenate([v0, far]), np.concatenate([e1, z]),
        np.concatenate([e2, z]), t,
    )
