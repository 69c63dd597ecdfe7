"""Pallas TPU kernels for small-scene intersection (the hot ops).

Reference role: the inner hot kernels of SURVEY §3.3 (triKdTree_t walks).
XLA's lowering of the unrolled Möller-Trumbore loop fragments into ~16
memory-bound fusions with (N,)-sized HBM intermediates between them; these
kernels keep the whole test loop in registers — triangle data is loaded
once into VMEM (it is tiny), the ray arena streams through in blocks, and
the only HBM traffic is rays in / hits out (~40 B/ray round trip).

Layouts: the ray arena is reshaped to (3, M, 128) — component-major SoA
with full (sublane × lane) 2-D tiles so every VPU op runs at 8×128
occupancy; triangle data is (9, T) f32 rows (v0|e1|e2) read as scalars.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 32  # rays per block = ROWS * LANE
INTERPRET = False  # tests flip this to run kernels on CPU
NEG_EPS = 1e-12
UNROLL_TRIS = 64  # static unroll below; lax.fori_loop above
MAX_TRIS = 4096  # VMEM-resident triangle budget (9*T*4 bytes)


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


def _mt_test(tri9, k, ox, oy, oz, dx, dy, dz):
    """Möller-Trumbore test of one triangle (scalar column k of tri9 — a
    ref or a loaded chunk value, k static) against a (ROWS, LANE) ray
    tile.  Returns (t, u, v, det_ok)."""
    v0x = tri9[0, k]
    v0y = tri9[1, k]
    v0z = tri9[2, k]
    e1x = tri9[3, k]
    e1y = tri9[4, k]
    e1z = tri9[5, k]
    e2x = tri9[6, k]
    e2y = tri9[7, k]
    e2z = tri9[8, k]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    inv = 1.0 / jnp.where(jnp.abs(det) < NEG_EPS, 1.0, det)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = ((jnp.abs(det) > NEG_EPS) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0))
    return t, u, v, ok


def _closest_kernel(tri_ref, org_ref, dir_ref, tlim_ref,
                    t_out, tri_out, u_out, v_out, *, n_tris: int):
    ox, oy, oz = org_ref[0], org_ref[1], org_ref[2]
    dx, dy, dz = dir_ref[0], dir_ref[1], dir_ref[2]
    tmin, tmax = tlim_ref[0], tlim_ref[1]

    # no bool vectors in the loop carry (Mosaic can't legalize i1 loop
    # args): hit is derived from best_t at the end
    best_t = jnp.full_like(tmax, jnp.inf)
    best_u = jnp.zeros_like(best_t)
    best_v = jnp.zeros_like(best_t)
    best_k = jnp.zeros_like(best_t, dtype=jnp.int32)

    def step(tri9, k, kid, carry):
        best_t, best_u, best_v, best_k = carry
        t, u, v, ok = _mt_test(tri9, k, ox, oy, oz, dx, dy, dz)
        ok = ok & (t > tmin) & (t < best_t) & (t < tmax)
        best_t = jnp.where(ok, t, best_t)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
        best_k = jnp.where(ok, kid, best_k)
        return best_t, best_u, best_v, best_k

    carry = (best_t, best_u, best_v, best_k)
    if n_tris <= UNROLL_TRIS:
        for k in range(n_tris):
            carry = step(tri_ref, k, jnp.int32(k), carry)
    else:
        # chunked: fori over 128-wide aligned chunks loaded into registers;
        # static inner unroll extracts per-triangle scalars from the value
        n_chunks = tri_ref.shape[1] // LANE

        def chunk_step(c, carry):
            chunk = tri_ref[:, pl.ds(c * LANE, LANE)]
            base = c * LANE
            for k in range(LANE):
                carry = step(chunk, k, base + k, carry)
            return carry

        carry = jax.lax.fori_loop(0, n_chunks, chunk_step, carry)
    best_t, best_u, best_v, best_k = carry
    hit = jnp.isfinite(best_t)

    t_out[:, :] = jnp.where(hit, best_t, jnp.inf)
    tri_out[:, :] = best_k
    u_out[:, :] = best_u
    v_out[:, :] = best_v


def _shadow_kernel(tri_ref, filt_ref, org_ref, dir_ref, dist_ref,
                   tr_out, *, n_tris: int):
    ox, oy, oz = org_ref[0], org_ref[1], org_ref[2]
    dx, dy, dz = dir_ref[0], dir_ref[1], dir_ref[2]
    dist = dist_ref[0]
    tmin = 5e-4
    tmax = dist * (1.0 - 1e-4) - 5e-4

    def step(tri9, filt, k, carry):
        tr_r, tr_g, tr_b = carry
        t, u, v, ok = _mt_test(tri9, k, ox, oy, oz, dx, dy, dz)
        okf = (ok & (t > tmin) & (t < tmax)).astype(jnp.float32)
        tr_r = tr_r * (1.0 - okf * (1.0 - filt[0, k]))
        tr_g = tr_g * (1.0 - okf * (1.0 - filt[1, k]))
        tr_b = tr_b * (1.0 - okf * (1.0 - filt[2, k]))
        return tr_r, tr_g, tr_b

    carry = (jnp.ones_like(ox), jnp.ones_like(ox), jnp.ones_like(ox))
    if n_tris <= UNROLL_TRIS:
        for k in range(n_tris):
            carry = step(tri_ref, filt_ref, k, carry)
    else:
        n_chunks = tri_ref.shape[1] // LANE

        def chunk_step(c, carry):
            chunk = tri_ref[:, pl.ds(c * LANE, LANE)]
            fchunk = filt_ref[:, pl.ds(c * LANE, LANE)]
            for k in range(LANE):
                carry = step(chunk, fchunk, k, carry)
            return carry

        carry = jax.lax.fori_loop(0, n_chunks, chunk_step, carry)
    tr_r, tr_g, tr_b = carry

    tr_out[0] = tr_r
    tr_out[1] = tr_g
    tr_out[2] = tr_b


def _to_tiles(x):
    """(C, N) -> (C, M, LANE) padded so M % ROWS == 0; returns (tiles, N)."""
    c, n = x.shape
    m = -(-n // LANE)
    m = -(-m // ROWS) * ROWS
    pad = m * LANE - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x.reshape(c, m, LANE), n


@functools.partial(jax.jit, static_argnames=("n_tris",))
def closest_hit_pallas(tri_pack9, org, dirn, tmin, tmax, n_tris: int):
    """tri_pack9: (9, T) f32; org/dirn (N,3).
    Returns (t, tri, u, v, hit)."""
    org_t, n = _to_tiles(org.T)
    dir_t, _ = _to_tiles(dirn.T)
    tlim, _ = _to_tiles(jnp.stack([tmin, tmax], axis=0))
    m = org_t.shape[1]
    grid = (m // ROWS,)
    if n_tris > UNROLL_TRIS:
        pad = (-tri_pack9.shape[1]) % LANE
        if pad:
            tri_pack9 = jnp.pad(tri_pack9, ((0, 0), (0, pad)))

    kernel = functools.partial(_closest_kernel, n_tris=n_tris)
    ray_spec = lambda c: pl.BlockSpec((c, ROWS, LANE), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tris, whole
            ray_spec(3), ray_spec(3), ray_spec(2),
        ],
        out_specs=[out_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((m, LANE), jnp.float32),
            jax.ShapeDtypeStruct((m, LANE), jnp.int32),
            jax.ShapeDtypeStruct((m, LANE), jnp.float32),
            jax.ShapeDtypeStruct((m, LANE), jnp.float32),
        ],
        interpret=INTERPRET,
    )(tri_pack9, org_t, dir_t, tlim)
    t = t.reshape(-1)[:n]
    return (t, tri.reshape(-1)[:n], u.reshape(-1)[:n], v.reshape(-1)[:n],
            jnp.isfinite(t))


@functools.partial(jax.jit, static_argnames=("n_tris",))
def shadow_transmission_pallas(tri_pack9, filt4, org, dirn, dist,
                               n_tris: int):
    """filt4: (4, T) f32 (rgb filter rows; 4th row padding).
    Returns (N, 3) transmission."""
    org_t, n = _to_tiles(org.T)
    dir_t, _ = _to_tiles(dirn.T)
    dist_t, _ = _to_tiles(dist[None, :])
    m = org_t.shape[1]
    grid = (m // ROWS,)
    if n_tris > UNROLL_TRIS:
        pad = (-tri_pack9.shape[1]) % LANE
        if pad:
            tri_pack9 = jnp.pad(tri_pack9, ((0, 0), (0, pad)))
            filt4 = jnp.pad(filt4, ((0, 0), (0, pad)))

    kernel = functools.partial(_shadow_kernel, n_tris=n_tris)
    ray_spec = lambda c: pl.BlockSpec((c, ROWS, LANE), lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
    tr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            ray_spec(3), ray_spec(3), ray_spec(1),
        ],
        out_specs=pl.BlockSpec((3, ROWS, LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, m, LANE), jnp.float32),
        interpret=INTERPRET,
    )(tri_pack9, filt4, org_t, dir_t, dist_t)
    return tr.reshape(3, -1)[:, :n].T
