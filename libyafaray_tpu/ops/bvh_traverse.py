"""Stackless threaded-BVH traversal (device side).

Reference role: triKdTree_t::intersect / intersectS / intersectTS stack
walks (src/yafraycore/kdtree.cc).  TPU-native design: every node of the
BVH carries `hit_next` / `miss_next` indices (accel/bvh.py), so traversal
is a `lax.while_loop` where each lane holds only a node pointer — no
per-lane stack in memory.  All lanes step in lockstep; finished lanes park
at node -1.  Leaves test <= LEAF_SIZE triangles via gathers.

This is the fallback path for scenes above the clustered dense kernel's
budget (ops/pallas_intersect.MAX_TRIS); smaller scenes use the cluster-
culled dense kernels which need no gathers at all.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..accel.bvh import LEAF_SIZE
from .intersect import Hit, RAY_EPS, SHADOW_EPS


def _aabb_hit(bb_min, bb_max, org, inv_dir, tmin, tmax):
    t0 = (bb_min - org) * inv_dir
    t1 = (bb_max - org) * inv_dir
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    enter = jnp.maximum(jnp.max(tlo, axis=-1), tmin)
    exit_ = jnp.minimum(jnp.min(thi, axis=-1), tmax)
    return enter <= exit_


def _leaf_tris(bvh, tris, node, k):
    ti = bvh["tri_order"][jnp.clip(bvh["first_tri"][node] + k, 0,
                                   bvh["tri_order"].shape[0] - 1)]
    return ti, tris["v0"][ti], tris["e1"][ti], tris["e2"][ti]


def _ray_tri_one(v0, e1, e2, org, dirn, tmin, tmax):
    pvec = jnp.cross(dirn, e2)
    det = jnp.sum(pvec * e1, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tvec = org - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(dirn * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > tmin) & (t < tmax))
    return t, u, v, ok


def closest_hit_bvh(bvh: dict, tris: dict, org, dirn, tmin=None,
                    tmax=None) -> Hit:
    n = org.shape[0]
    if tmin is None:
        tmin = jnp.full((n,), RAY_EPS, jnp.float32)
    if tmax is None:
        tmax = jnp.full((n,), jnp.inf, jnp.float32)
    inv_dir = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                              jnp.where(dirn < 0, -1e-12, 1e-12), dirn)

    def cond(state):
        node = state[0]
        return jnp.any(node >= 0)

    def body(state):
        node, best_t, best_tri, best_u, best_v = state
        nd = jnp.maximum(node, 0)
        bb_min = bvh["bb_min"][nd]
        bb_max = bvh["bb_max"][nd]
        active = node >= 0
        entered = active & _aabb_hit(bb_min, bb_max, org, inv_dir, tmin,
                                     jnp.minimum(tmax, best_t))
        is_leaf = bvh["first_tri"][nd] >= 0
        # leaf: test its triangles
        do_leaf = entered & is_leaf
        for k in range(LEAF_SIZE):
            ti, v0, e1, e2 = _leaf_tris(bvh, tris, nd, k)
            in_leaf = do_leaf & (k < bvh["tri_count"][nd])
            t, u, v, ok = _ray_tri_one(v0, e1, e2, org, dirn, tmin,
                                       jnp.minimum(tmax, best_t))
            ok = ok & in_leaf
            better = ok & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_tri = jnp.where(better, ti, best_tri)
            best_u = jnp.where(better, u, best_u)
            best_v = jnp.where(better, v, best_v)
        nxt = jnp.where(entered & ~is_leaf, bvh["hit_next"][nd],
                        bvh["miss_next"][nd])
        node = jnp.where(active, nxt, node)
        return node, best_t, best_tri, best_u, best_v

    state = (
        jnp.zeros((n,), jnp.int32),
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )
    _, best_t, best_tri, best_u, best_v = lax.while_loop(cond, body, state)
    return Hit(t=best_t, tri=best_tri, u=best_u, v=best_v,
               hit=jnp.isfinite(best_t))


def shadow_transmission_bvh(bvh: dict, tris: dict, filt, org, dirn, dist):
    """Transparent-shadow transmission via BVH walk; accumulates the filter
    product over every hit in (tmin, tmax) — intersectTS analog."""
    n = org.shape[0]
    tmin = jnp.full((n,), SHADOW_EPS, jnp.float32)
    tmax = dist * (1.0 - 1e-4) - SHADOW_EPS
    inv_dir = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                              jnp.where(dirn < 0, -1e-12, 1e-12), dirn)
    log_f = jnp.log(jnp.maximum(filt, 1e-12))
    opaque = jnp.max(filt, axis=-1) < 1e-6

    def cond(state):
        node, log_tr, blocked = state
        return jnp.any((node >= 0) & ~blocked)

    def body(state):
        node, log_tr, blocked = state
        nd = jnp.maximum(node, 0)
        active = (node >= 0) & ~blocked
        entered = active & _aabb_hit(bvh["bb_min"][nd], bvh["bb_max"][nd],
                                     org, inv_dir, tmin, tmax)
        is_leaf = bvh["first_tri"][nd] >= 0
        do_leaf = entered & is_leaf
        for k in range(LEAF_SIZE):
            ti, v0, e1, e2 = _leaf_tris(bvh, tris, nd, k)
            in_leaf = do_leaf & (k < bvh["tri_count"][nd])
            _, _, _, ok = _ray_tri_one(v0, e1, e2, org, dirn, tmin, tmax)
            ok = ok & in_leaf
            blocked = blocked | (ok & opaque[ti])
            log_tr = log_tr + jnp.where(ok[..., None], log_f[ti], 0.0)
        nxt = jnp.where(entered & ~is_leaf, bvh["hit_next"][nd],
                        bvh["miss_next"][nd])
        node = jnp.where(node >= 0, nxt, node)
        return node, log_tr, blocked

    state = (jnp.zeros((n,), jnp.int32), jnp.zeros((n, 3), jnp.float32),
             jnp.zeros((n,), jnp.bool_))
    _, log_tr, blocked = lax.while_loop(cond, body, state)
    return jnp.where(blocked[:, None], 0.0, jnp.exp(log_tr))
