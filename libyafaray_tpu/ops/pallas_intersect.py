"""Pallas TPU kernels for dense clustered ray-scene intersection.

Reference role: the inner hot kernels of SURVEY §3.3 (triKdTree_t walks).
XLA's lowering of the unrolled Möller-Trumbore loop fragments into ~16
memory-bound fusions with (N,)-sized HBM intermediates between them; these
kernels do the whole (ray x triangle) sweep inside VMEM and the only HBM
traffic is rays in / hits out (~40 B/ray round trip).

Design: flash-attention-style blocking (same structure as
ops/photon_flash).  A 2-D sequential grid (ray blocks x triangle
clusters) computes a (BQ, BT) Möller-Trumbore tile per step via explicit
coordinate broadcasts — ray components as (BQ, 1) columns against
triangle component rows (1, BT) — and folds the per-tile argmin into
running per-ray best outputs.  Everything is full-width VPU work.

Scaling past a few thousand triangles comes from CLUSTER CULLING, the
TPU-native replacement for tree traversal: triangles are sorted in BVH
leaf order at scene compile (accel/bvh.py tri_order — spatially
coherent), grouped into BT-sized clusters with precomputed AABBs, and
each grid step slab-tests its ray block against the cluster box first —
`pl.when` skips the whole 256x256 MT tile when no ray in the block can
hit it (or when every ray's current best hit is already nearer).  A
coherent ray block touches O(few) of the clusters, so effective cost
approaches BVH traversal without a single per-lane gather.  Original
triangle ids ride in the pack's 10th row and are recovered with the same
one-hot dot that selects the winner's barycentrics.

An earlier formulation unrolled a 128-triangle scalar loop inside a
fori_loop (per-triangle scalars broadcast against a ray tile); Mosaic
took 100-200 s to compile its thousands of scalar statements, which
dominated every CLI render's wall clock.  The tile formulation compiles
in ~1-2 s (after the per-process remote-compile warmup) and runs faster.

Layouts: rays (N, 3) padded to BQ blocks; triangle data (10, T) f32 rows
(v0|e1|e2|orig_id), T padded to a BT multiple; cluster boxes (8, C)
(bbmin|bbmax|pad2) so the slab test reads one lane column per step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 512      # rays per block (512 amortizes grid-step overhead ~1.6x
BT = 512      # vs 256; measured on v5e)  # triangles per cluster/block
INTERPRET = False  # tests flip this to run kernels on CPU
NEG_EPS = 1e-12
MAX_TRIS = 1 << 20  # streaming-path budget (scene compile picks BVH
# above this; on CPU it switches at CPU_DENSE_MAX).  r3: the streaming
# kernels keep the (16, T) pack in HBM and DMA one (16, BT) tile at a
# time, so T is not VMEM-bound; the gather-walk BVH fallback measured
# ~900-1500 ms / 262K rays at 100K tris AND its long lockstep
# while_loop can trip the TPU-worker watchdog at wavefront lane counts,
# so the streaming path carries scenes up to 1M tris.
CPU_DENSE_MAX = 131072  # on CPU the pallas kernels run interpreted;
# above this the threaded-BVH gather walk wins there
_BIG_I32 = 2 ** 30  # python int: jnp scalars become captured consts


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


def morton_order(v0, e1, e2):
    """Spatial sort of triangles by the Morton code of their centroid
    (vectorized numpy; milliseconds at 100K tris).  Gives the cluster
    locality the AABB culling needs — the role the BVH leaf order plays
    for the tree path, without a tree build."""
    v0 = np.asarray(v0, np.float64)
    c = v0 + (np.asarray(e1, np.float64) + np.asarray(e2, np.float64)) / 3.0
    lo, hi = c.min(axis=0), c.max(axis=0)
    q = ((c - lo) / np.maximum(hi - lo, 1e-12) * 1023.0).astype(np.uint32)
    q = np.minimum(q, 1023)

    def spread(x):
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint32(1))
            | (spread(q[:, 2]) << np.uint32(2)))
    return np.argsort(code, kind="stable")


def _pick_bt(t: int) -> int:
    """Cluster width.  Small clusters = tight AABBs = effective culling;
    since r3 moved the per-block cluster lists out of SMEM (each block
    DMAs its own (C,) row HBM→SMEM scratch, see _closest_kernel_stream)
    C is no longer SMEM-bound, so width is chosen purely by measured
    per-visit overhead vs culling quality.  LIBYAF_BT env overrides."""
    import os

    ov = os.environ.get("LIBYAF_BT")
    if ov:
        return int(ov)
    if t <= 32768:
        return 128
    if t <= 65536:
        return 256
    return 1024  # r3 sweep: coarser tiles win above 64K (fewer
    # per-visit fixed costs; culling quality is corridor-bound anyway)


def _pick_bq(bt: int = 0) -> int:
    """Rays per block.  Smaller blocks = tighter ray corridors = fewer
    clusters visited per block (the dominant cost at scene scale), at
    the price of more grid steps.  r3 sweep at 114-131K tris: BQ=128
    beats 512 on incoherent rays (soup 232->180 ms) and ties coherent,
    while small scenes keep BQ=512 (grid-step overhead dominates their
    trivial tiles).  LIBYAF_BQ env overrides."""
    import os

    ov = os.environ.get("LIBYAF_BQ")
    if ov:
        return int(ov)
    return 128 if bt >= 1024 else BQ


def _slab_mode() -> bool:
    """Whether the streaming kernels re-check each listed cluster's slab
    against the block's live best-t before running the MT tile (front-
    to-back early termination).  The check costs a vector→scalar
    reduction + branch per visit; LIBYAF_SLAB=0 disables it."""
    import os

    return os.environ.get("LIBYAF_SLAB", "1") == "1"


def build_tri_pack(v0, e1, e2, order=None):
    """Host-side pack build: (10, T') triangle rows + (8, C) cluster AABBs.

    order: optional spatial permutation (e.g. accel.bvh tri_order); row 9
    carries the ORIGINAL triangle index so kernel output needs no remap
    gather.  Padded triangles are degenerate (det=0) and their clusters
    get inverted (never-hit) boxes.  The cluster width (pack_T //
    n_clusters) is chosen per scene; the kernels read it back from the
    array shapes.
    """
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    t = v0.shape[0]
    bt = _pick_bt(t)
    if order is None:
        order = np.arange(t)
    order = np.asarray(order)
    v0o, e1o, e2o = v0[order], e1[order], e2[order]
    pad = (-t) % bt
    if pad:
        z = np.zeros((pad, 3), np.float32)
        v0o = np.concatenate([v0o, z])
        e1o = np.concatenate([e1o, z])
        e2o = np.concatenate([e2o, z])
        order = np.concatenate([order, np.zeros(pad, order.dtype)])
    tp = v0o.shape[0]
    pack10 = np.empty((10, tp), np.float32)
    pack10[0:3] = v0o.T
    pack10[3:6] = e1o.T
    pack10[6:9] = e2o.T
    pack10[9] = order
    # per-cluster AABBs over REAL triangles only (masked min/max —
    # empty all-pad clusters come out inverted = never hit)
    n_cl = tp // bt
    cl = np.empty((8, n_cl), np.float32)
    cl[6:] = 0.0
    p1 = v0o + e1o
    p2 = v0o + e2o
    lo = np.minimum(np.minimum(v0o, p1), p2).reshape(n_cl, bt, 3)
    hi = np.maximum(np.maximum(v0o, p1), p2).reshape(n_cl, bt, 3)
    real = (np.arange(tp) < t).reshape(n_cl, bt)[..., None]
    cl[0:3] = np.where(real, lo, np.inf).min(axis=1).T
    cl[3:6] = np.where(real, hi, -np.inf).max(axis=1).T
    return pack10, np.ascontiguousarray(cl), order


def _mt_tile(tri_ref, org_ref, dir_ref):
    """(BQ, BT) Möller-Trumbore tile: ray columns vs triangle rows.
    Returns (t, u, v, ok) tiles (ok = det/bary tests, no t-range)."""
    ox, oy, oz = org_ref[:, 0:1], org_ref[:, 1:2], org_ref[:, 2:3]
    dx, dy, dz = dir_ref[:, 0:1], dir_ref[:, 1:2], dir_ref[:, 2:3]
    v0x, v0y, v0z = tri_ref[0:1, :], tri_ref[1:2, :], tri_ref[2:3, :]
    e1x, e1y, e1z = tri_ref[3:4, :], tri_ref[4:5, :], tri_ref[5:6, :]
    e2x, e2y, e2z = tri_ref[6:7, :], tri_ref[7:8, :], tri_ref[8:9, :]

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


import os as _os

MXU_MT = _os.environ.get("LIBYAF_MXU", "0") == "1"  # read at import; the
# kernels trace once per process, so flip it via env before the first call


def _mt_tile_mxu(tri_ref, org_ref, dir_ref, ctr):
    """Möller-Trumbore tile on the MXU: every per-pair quantity is a
    bilinear form ray-features x tri-features —

        det   = -d·n                    n  = e1 x e2
        u·det = (o'xd)·e2 + d·(v0'xe2)  (scalar triple identities)
        v·det = -(o'xd)·e1 - d·(v0'xe1)
        t·det = o'·n - v0'·n

    with o' = o - ctr, v0' = v0 - ctr (cluster-center translation keeps
    the cross-product magnitudes at cluster scale — the triple products
    cancel).  Four (BQ,16)x(16,BT) dots replace ~45 VPU ops/pair with
    ~12 (epilogue) plus MXU work at ~100x VPU throughput.  r5: dots run
    at Precision.HIGHEST (6-pass bf16 decomposition ~ f32) — the r2
    default-precision trial's 0.7% wrong hits were bf16 rounding of the
    bilinear forms, not a formulation error.
    Returns (t, u, v, ok) like _mt_tile."""
    f32 = jnp.float32
    ox = org_ref[:, 0:1] - ctr[0]
    oy = org_ref[:, 1:2] - ctr[1]
    oz = org_ref[:, 2:3] - ctr[2]
    dx, dy, dz = dir_ref[:, 0:1], dir_ref[:, 1:2], dir_ref[:, 2:3]
    cx = oy * dz - oz * dy
    cy = oz * dx - ox * dz
    cz = ox * dy - oy * dx
    one = jnp.ones_like(ox)
    # ray features (BQ, 16): [d, oxd, o, 1, pad...]
    F = jnp.concatenate(
        [dx, dy, dz, cx, cy, cz, ox, oy, oz, one,
         jnp.zeros((ox.shape[0], 6), f32)], axis=1)

    v0x = tri_ref[0:1, :] - ctr[0]
    v0y = tri_ref[1:2, :] - ctr[1]
    v0z = tri_ref[2:3, :] - ctr[2]
    e1x, e1y, e1z = tri_ref[3:4, :], tri_ref[4:5, :], tri_ref[5:6, :]
    e2x, e2y, e2z = tri_ref[6:7, :], tri_ref[7:8, :], tri_ref[8:9, :]
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x
    w2x = v0y * e2z - v0z * e2y     # v0' x e2
    w2y = v0z * e2x - v0x * e2z
    w2z = v0x * e2y - v0y * e2x
    w1x = v0y * e1z - v0z * e1y     # v0' x e1
    w1y = v0z * e1x - v0x * e1z
    w1z = v0x * e1y - v0y * e1x
    zero = jnp.zeros_like(nx)
    bt = nx.shape[1]

    def G(rows):
        rows = list(rows) + [zero] * (16 - len(rows))
        return jnp.concatenate(rows, axis=0)  # (16, BT)

    dot = lambda g: jax.lax.dot_general(
        F, g, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)
    det = dot(G([-nx, -ny, -nz]))
    u_num = dot(G([w2x, w2y, w2z, e2x, e2y, e2z]))
    v_num = -dot(G([w1x, w1y, w1z, e1x, e1y, e1z]))
    t_num = dot(G([zero, zero, zero, zero, zero, zero, nx, ny, nz,
                   -(v0x * nx + v0y * ny + v0z * nz)]))
    s = jnp.sign(det)
    adet = jnp.abs(det)
    inv = 1.0 / jnp.where(adet < NEG_EPS, 1.0, det)
    u = u_num * inv
    v = v_num * inv
    t = t_num * inv
    ok = ((adet > NEG_EPS) & (u_num * s >= 0.0) & (v_num * s >= 0.0)
          & ((u_num + v_num) * s <= adet))
    return t, u, v, ok


def _slab_any(cl_ref, j, org_ref, inv_ref, tmin, tmax):
    """Does ANY ray in the block enter cluster j's AABB within
    [tmin, tmax]?  cl_ref is the whole (8, C) cluster array in SMEM
    (scalar memory allows the dynamic j index).  Returns a 0/1 f32 flag."""
    enter = tmin
    exit_ = tmax
    for a in range(3):
        o = org_ref[:, a:a + 1]
        iv = inv_ref[:, a:a + 1]
        t0 = (cl_ref[a, j] - o) * iv
        t1 = (cl_ref[a + 3, j] - o) * iv
        enter = jnp.maximum(enter, jnp.minimum(t0, t1))
        exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
    hit = enter <= exit_
    return jnp.max(hit.astype(jnp.float32))


def _closest_kernel(tri_ref, cl_ref, rays_ref, t_out, tri_out,
                    best_t, best_c):
    """Grid (blocks x clusters) kernel for small cluster counts.  Same
    (best-t, best PACK COLUMN) contract as the streaming kernel — the
    wrapper recomputes u/v/orig-id from the column.  Per-ray best state
    rides in (bq, 1) VMEM scratch across the j steps; the (1, bq)
    transposed out rows are written once at the last cluster."""
    j = pl.program_id(1)
    n_cl = pl.num_programs(1)
    bt = tri_ref.shape[1]
    org_ref, dir_ref, inv_ref, rp = _unpack_rays8(rays_ref)
    tmin, tmax = rp[:, 6:7], rp[:, 7:8]

    @pl.when(j == 0)
    def _():
        best_t[:] = jnp.full_like(best_t, jnp.inf)
        best_c[:] = jnp.zeros_like(best_c)

    # cluster cull: skip the tile unless some ray can still hit this box
    # nearer than its current best
    any_hit = _slab_any(cl_ref, j, org_ref, inv_ref, tmin,
                        jnp.minimum(tmax, best_t[:]))

    @pl.when(any_hit > 0.0)
    def _():
        t, u, v, ok = _mt_tile(tri_ref, org_ref, dir_ref)
        ok = ok & (t > tmin) & (t < tmax)
        t_ok = jnp.where(ok, t, jnp.inf)
        tile_min = jnp.min(t_ok, axis=1, keepdims=True)        # (BQ, 1)
        # first column achieving the tile minimum (deterministic ties);
        # no-hit rows give a bogus k_min but `better` is False there
        kcol = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        kcand = jnp.where(t_ok <= tile_min, kcol, _BIG_I32)
        k_min = jnp.min(kcand, axis=1, keepdims=True)          # (BQ, 1)

        better = tile_min < best_t[:]
        best_t[:] = jnp.where(better, tile_min, best_t[:])
        best_c[:] = jnp.where(better, j * bt + k_min, best_c[:])

    @pl.when(j == n_cl - 1)
    def _():
        t_out[:] = best_t[:].T
        tri_out[:] = best_c[:].T


def _shadow_kernel(tri_ref, cl_ref, logf_ref, rays_ref, lg_out, lg_buf):
    """Accumulates LOG transmission (the wrapper exps once per ray):
    per-pair work is one multiply-add against the PRECOMPUTED per-tri
    log-filter row — per-pair log/exp transcendentals cost a measured
    ~5x on the VPU (Mosaic has no reduce_prod to do it directly)."""
    j = pl.program_id(1)
    n_cl = pl.num_programs(1)
    org_ref, dir_ref, inv_ref, rp = _unpack_rays8(rays_ref)
    dist = rp[:, 7:8]

    @pl.when(j == 0)
    def _():
        lg_buf[:] = jnp.zeros_like(lg_buf)

    tmin = 5e-4
    tmax = dist * (1.0 - 1e-4) - 5e-4
    any_hit = _slab_any(cl_ref, j, org_ref, inv_ref,
                        jnp.full_like(dist, tmin), tmax)

    @pl.when(any_hit > 0.0)
    def _():
        t, _, _, ok = _mt_tile(tri_ref, org_ref, dir_ref)
        okf = (ok & (t > tmin) & (t < tmax)).astype(jnp.float32)
        lg = lg_buf[:]
        cols = []
        for c in range(3):
            acc = jnp.sum(okf * logf_ref[c:c + 1, :], axis=1,
                          keepdims=True)                       # (BQ, 1)
            cols.append(lg[:, c:c + 1] + acc)
        lg_buf[:] = jnp.concatenate(cols, axis=1)

    @pl.when(j == n_cl - 1)
    def _():
        lg_out[:] = lg_buf[:].T


def _pad_rays(cols, bq=BQ):
    """Pad (N, c) ray arrays to a bq multiple; returns (padded..., N)."""
    n = cols[0].shape[0]
    pad = (-n) % bq
    if pad:
        cols = [jnp.pad(c, ((0, pad), (0, 0))) for c in cols]
    return cols, n


def _rays8_t(cols, bq):
    """Build the (8, NPAD) TRANSPOSED per-ray pallas operand from (N,)
    and (N, 3) columns.  Measured layout fact (BENCH_ALL.md r3): XLA:TPU
    materializes row-major (N, small-C) pallas operands/outputs through
    a tiled-layout copy that pads the minor dim to 128 lanes — 2 GB of
    HBM temp per operand at 2M rays (the 164K-tri 512² render OOM'd on
    exactly these).  With 8 sublane rows x N lanes the buffers are
    unpadded and the copies vanish (the TINY kernels' _to_tiles_t
    convention, extended to the block/stream kernels)."""
    rows = []
    for c in cols:
        rows.append(c.T if c.ndim == 2 else c[None, :])
    rp = jnp.concatenate(rows, axis=0)
    if rp.shape[0] < 8:
        rp = jnp.pad(rp, ((0, 8 - rp.shape[0]), (0, 0)))
    n = rp.shape[1]
    pad = (-n) % bq
    if pad:
        rp = jnp.pad(rp, ((0, 0), (0, pad)))
    return rp, n


def _unpack_rays8(rays_ref):
    """One (8, bq) -> (bq, 8) relayout per grid step; returns
    (org (bq,3), dir (bq,3), inv (bq,3), rp (bq,8) for rows 6/7)."""
    rp = rays_ref[...].T
    org = rp[:, 0:3]
    dirn = rp[:, 3:6]
    inv = 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                          jnp.where(dirn < 0, -1e-12, 1e-12), dirn)
    return org, dirn, inv, rp


def _inv_dir(dirn):
    return 1.0 / jnp.where(jnp.abs(dirn) < 1e-12,
                           jnp.where(dirn < 0, -1e-12, 1e-12), dirn)


SORT_MIN_CLUSTERS = 16  # sort rays only when culling has enough to skip
FB_MIN_CLUSTERS = 4     # front-to-back cluster lists pay off above this


SUB_BT = 128  # sub-cluster width for fine culling


def _submask_mode() -> bool:
    """Whether the streaming kernels BRANCH per SUB_BT sub-tile on the
    prelude's live-sub mask.  Measured a net LOSS on v5e (8 predicated
    regions per cluster defeat Mosaic's pipelining; the saved MT work is
    smaller than the stalls), so default OFF — the sub-granularity
    prelude still tightens the cluster lists (a cluster is listed only
    if one of its SUB-boxes is hit), which is free.  LIBYAF_SUBMASK=1
    re-enables in-kernel masking for experiments."""
    import os

    return os.environ.get("LIBYAF_SUBMASK", "0") == "1"


def _sub_aabbs(tri_pack10, n_tris: int, bts: int = SUB_BT):
    """(8, T//bts) fine AABB table derived from the pack ON DEVICE (one
    tiny fused reduction, traced once per jit).  Padded / out-of-range
    columns get never-hit (inverted) boxes via the static n_tris."""
    t = tri_pack10.shape[1]
    v0 = tri_pack10[0:3]
    p1 = v0 + tri_pack10[3:6]
    p2 = v0 + tri_pack10[6:9]
    lo = jnp.minimum(jnp.minimum(v0, p1), p2)
    hi = jnp.maximum(jnp.maximum(v0, p1), p2)
    real = (jnp.arange(t) < n_tris)[None, :]
    lo = jnp.where(real, lo, jnp.inf)
    hi = jnp.where(real, hi, -jnp.inf)
    c = t // bts
    lo = jnp.min(lo.reshape(3, c, bts), axis=2)
    hi = jnp.max(hi.reshape(3, c, bts), axis=2)
    return jnp.concatenate([lo, hi, jnp.zeros((2, c), jnp.float32)],
                           axis=0)


def _block_cluster_order(org, dirn, tmin, tmax, cluster8, bq: int,
                         sub8=None, n_sub: int = 1):
    """Per-ray-block FRONT-TO-BACK active-cluster lists (plain JAX
    prelude to the _fb kernels; the r2 design doc's scalar-prefetch
    index-map plan, VERDICT r2 next-step #1).

    For every BQ-ray block: slab-test each ray against every cluster
    AABB, key each cluster by the block-min entry distance (inf when no
    ray can enter), and argsort — active clusters come first, nearest
    first.  The kernel then (a) visits only `count[i]` clusters per
    block, (b) in an order that makes the per-ray best-t cull terminate
    the sweep early for closest-hit queries.  Positions past the count
    repeat the last active cluster id so the pipelined tri-tile DMA
    sees an unchanged block index (no refetch) on the dead tail.

    r3 fine culling: with `sub8` ((8, C*n_sub) AABBs at SUB_BT
    granularity) the slab sweep runs at SUB-cluster resolution; each
    entry then carries `cluster_id | (live-sub bitmask << 16)` so the
    kernel skips dead SUB_BT-column tiles inside a listed cluster —
    and a cluster is listed at all only if one of its SUBS is hit
    (tighter than the coarse AABB test).

    org/dirn/tmin/tmax are already ray-sorted and padded to a BQ
    multiple.  Returns (entries (B, C) i32, count (B,) i32).
    """
    n_cl = cluster8.shape[1]
    b = org.shape[0] // bq
    o = org.reshape(b, bq, 3)
    iv = _inv_dir(dirn).reshape(b, bq, 3)
    tmin_b = tmin.reshape(b, bq)
    tmax_b = tmax.reshape(b, bq)
    table = sub8 if n_sub > 1 else cluster8
    n_sc = table.shape[1]  # n_cl * n_sub
    lo = table[0:3].T  # (C*n_sub, 3)
    hi = table[3:6].T
    keys = []
    ch = 8 if n_sub == 1 else 16  # chunk bounds the (B,bq,ch,3) temp
    for c0 in range(0, n_sc, ch):
        loc = lo[c0:c0 + ch]
        hic = hi[c0:c0 + ch]
        t0 = (loc[None, None] - o[:, :, None]) * iv[:, :, None]
        t1 = (hic[None, None] - o[:, :, None]) * iv[:, :, None]
        enter = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1),
                            tmin_b[..., None])
        exit_ = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1),
                            tmax_b[..., None])
        hit = enter <= exit_
        keys.append(jnp.min(jnp.where(hit, enter, jnp.inf), axis=1))
    key_sub = jnp.concatenate(keys, axis=1)  # (B, n_sc)
    if n_sub > 1:
        ks = key_sub.reshape(b, n_cl, n_sub)
        key = jnp.min(ks, axis=2)
        bits = (1 << jnp.arange(n_sub, dtype=jnp.int32))[None, None]
        mask = jnp.sum(jnp.where(jnp.isfinite(ks), bits, 0),
                       axis=2).astype(jnp.int32)
    else:
        key = key_sub
        mask = jnp.ones((b, n_cl), jnp.int32)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(jnp.isfinite(key), axis=1).astype(jnp.int32)
    entries = order | (jnp.take_along_axis(mask, order, axis=1) << 16)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (b, n_cl), 1)
    last = jnp.take_along_axis(entries,
                               jnp.maximum(count - 1, 0)[:, None], axis=1)
    entries = jnp.where(jidx < jnp.maximum(count, 1)[:, None], entries,
                        last)
    return entries, count


def _order_groups(order):
    """Reshape the (B, C) cluster-order table for 8-aligned group DMA:
    rows padded to a multiple of 8, columns to a multiple of 128
    (Mosaic DMA slice tiling), grouped as (G, 8, C128)."""
    bb, c = order.shape
    c128 = ((c + 127) // 128) * 128
    b8 = ((bb + 7) // 8) * 8
    order = jnp.pad(order, ((0, b8 - bb), (0, c128 - c)))
    return order.reshape(b8 // 8, 8, c128), c128


def _stream_pipeline(cnt, get_dma, process):
    """Two-slot software pipeline over a block's cluster list with
    STATIC slot indices (a dynamic first-dim VMEM index per iteration
    lowers to per-step copies in Mosaic).  get_dma(slot, j) returns the
    copy descriptor; process(slot, j) consumes a landed tile."""

    @pl.when(cnt > 0)
    def _():
        get_dma(0, 0).start()

    def body(jj, _):
        j0 = 2 * jj

        @pl.when(j0 < cnt)
        def _():
            @pl.when(j0 + 1 < cnt)
            def _():
                get_dma(1, j0 + 1).start()

            get_dma(0, j0).wait()
            process(0, j0)

        @pl.when(j0 + 1 < cnt)
        def _():
            @pl.when(j0 + 2 < cnt)
            def _():
                get_dma(0, j0 + 2).start()

            get_dma(1, j0 + 1).wait()
            process(1, j0 + 1)

        return 0

    jax.lax.fori_loop(0, (cnt + 1) // 2, body, 0)


def _closest_kernel_stream(order_hbm, count_ref, tri_hbm, cl_ref, rays_ref,
                           t_out, tri_out, tri_buf, ord_smem,
                           sems, osem, best_t, best_c,
                           *, do_slab=True, n_sub=1):
    """Streaming front-to-back kernel: ONE grid step per ray block; the
    block's active-cluster list (its row of order_hbm, DMA'd into SMEM
    scratch — whole-array SMEM operands hit the 1 MB cap at fine
    cluster widths) is walked by an in-kernel pipeline that double-
    buffers each (16, bt) triangle tile HBM->VMEM with explicit DMA.
    This removes the measured ~4.5 us fixed cost per Pallas grid step
    that made a (blocks x clusters) grid regress at fine cluster widths
    — the grid is n_blocks steps total, and skipped clusters cost one
    scalar branch, not a grid step."""
    i = pl.program_id(0)
    cnt = count_ref[i]
    bt = tri_buf.shape[-1]
    sub = i % 8

    # one (8, C128) group DMA per 8 consecutive blocks: Mosaic DMA
    # slices need 8-aligned sublanes (a (1, C) row slice is rejected),
    # and scratch persists across grid steps, so the group fetch is
    # amortized — blocks 8g..8g+7 all read ord_smem[i % 8]
    @pl.when(sub == 0)
    def _():
        ocp = pltpu.make_async_copy(order_hbm.at[i // 8], ord_smem, osem)
        ocp.start()
        ocp.wait()

    org_ref, dir_ref, inv_ref, rp = _unpack_rays8(rays_ref)
    tmin, tmax = rp[:, 6:7], rp[:, 7:8]
    # per-ray best state lives in (bq, 1) VMEM scratch (the math's
    # column orientation); the (1, bq) out rows are written once at the
    # end — keeps the read-modify-write loop transpose-free
    best_t[:] = jnp.full_like(best_t, jnp.inf)
    best_c[:] = jnp.zeros_like(best_c)

    sbt = bt // n_sub

    def get_dma(slot, j):
        c = jnp.bitwise_and(ord_smem[sub, j], 0xFFFF)
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(c * bt, bt)], tri_buf.at[slot],
            sems.at[slot])

    def process(slot, j):
        cm = ord_smem[sub, j]
        c = jnp.bitwise_and(cm, 0xFFFF)

        def mt_sub(s):
            # one SUB_BT-column MT tile (static column slice of the
            # landed VMEM tile).  The tile keeps only (best-t, best
            # PACK COLUMN) per ray — u/v/orig-id selection moved out of
            # the kernel (one gather + 40-flop recompute in the
            # wrapper), which shrinks the per-tile epilogue to two
            # lane-reductions and makes fine tiles profitable.
            tri_ref = tri_buf[slot, :, s * sbt:(s + 1) * sbt]
            if MXU_MT:
                ctr = tuple(0.5 * (cl_ref[a, c] + cl_ref[a + 3, c])
                            for a in range(3))
                t, u, v, ok = _mt_tile_mxu(tri_ref, org_ref, dir_ref, ctr)
            else:
                t, u, v, ok = _mt_tile(tri_ref, org_ref, dir_ref)
            ok = ok & (t > tmin) & (t < tmax)
            t_ok = jnp.where(ok, t, jnp.inf)
            tile_min = jnp.min(t_ok, axis=1, keepdims=True)
            kcol = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            # no-hit rows: tile_min=inf makes every kcand live, but
            # `better` below is then False, so the bogus k_min is inert
            kcand = jnp.where(t_ok <= tile_min, kcol, _BIG_I32)
            k_min = jnp.min(kcand, axis=1, keepdims=True)

            better = tile_min < best_t[:]
            best_t[:] = jnp.where(better, tile_min, best_t[:])
            best_c[:] = jnp.where(better, c * bt + s * sbt + k_min,
                                  best_c[:])

        def mt_tile():
            if n_sub == 1:
                mt_sub(0)
            else:
                # fine culling: the entry's high bits say which SUB_BT
                # sub-tiles any ray's corridor touches (prelude mask)
                for s in range(n_sub):
                    # ids use bits 0:16 only, so arithmetic >> is exact
                    bit = jnp.bitwise_and(jnp.right_shift(cm, 16 + s), 1)
                    pl.when(bit > 0)(functools.partial(mt_sub, s))

        if do_slab:
            # front-to-back early termination: once every ray's best hit
            # is nearer than this cluster's entry skip the whole MT tile
            any_hit = _slab_any(cl_ref, c, org_ref, inv_ref, tmin,
                                jnp.minimum(tmax, best_t[:]))
            pl.when(any_hit > 0.0)(mt_tile)
        else:
            mt_tile()

    _stream_pipeline(cnt, get_dma, process)
    t_out[:] = best_t[:].T
    tri_out[:] = best_c[:].T


def _shadow_kernel_stream(order_hbm, count_ref, tri_hbm, cl_ref, rays_ref,
                          lg_out, tri_buf, ord_smem, sems, osem, lg_buf,
                          *, do_slab=True, n_sub=1):
    """Streaming shadow kernel over a (16, T) pack (tri rows 0:10 +
    rgb log-filter rows 10:13 + pad), same structure as
    _closest_kernel_stream."""
    i = pl.program_id(0)
    cnt = count_ref[i]
    bt = tri_buf.shape[-1]
    sub = i % 8

    @pl.when(sub == 0)
    def _():
        ocp = pltpu.make_async_copy(order_hbm.at[i // 8], ord_smem, osem)
        ocp.start()
        ocp.wait()

    org_ref, dir_ref, inv_ref, rp = _unpack_rays8(rays_ref)
    dist = rp[:, 7:8]
    lg_buf[:] = jnp.zeros_like(lg_buf)
    tmin = 5e-4
    tmax = dist * (1.0 - 1e-4) - 5e-4

    sbt = bt // n_sub

    def get_dma(slot, j):
        c = jnp.bitwise_and(ord_smem[sub, j], 0xFFFF)
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(c * bt, bt)], tri_buf.at[slot],
            sems.at[slot])

    def process(slot, j):
        cm = ord_smem[sub, j]
        c = jnp.bitwise_and(cm, 0xFFFF)

        def mt_sub(s):
            tri_ref = tri_buf[slot, :, s * sbt:(s + 1) * sbt]
            if MXU_MT:
                ctr = tuple(0.5 * (cl_ref[a, c] + cl_ref[a + 3, c])
                            for a in range(3))
                t, _, _, ok = _mt_tile_mxu(tri_ref, org_ref, dir_ref,
                                           ctr)
            else:
                t, _, _, ok = _mt_tile(tri_ref, org_ref, dir_ref)
            okf = (ok & (t > tmin) & (t < tmax)).astype(jnp.float32)
            lg = lg_buf[:]
            cols = []
            for ci in range(3):
                acc = jnp.sum(okf * tri_ref[10 + ci:11 + ci, :], axis=1,
                              keepdims=True)
                cols.append(jnp.maximum(lg[:, ci:ci + 1] + acc, -80.0))
            lg_buf[:] = jnp.concatenate(cols, axis=1)

        def mt_tile():
            if n_sub == 1:
                mt_sub(0)
            else:
                for s in range(n_sub):
                    bit = jnp.bitwise_and(jnp.right_shift(cm, 16 + s), 1)
                    pl.when(bit > 0)(functools.partial(mt_sub, s))

        if do_slab:
            any_hit = _slab_any(cl_ref, c, org_ref, inv_ref,
                                jnp.full_like(dist, tmin), tmax)
            # opacity early-out: once every ray's log-transmission has
            # saturated opaque, later clusters can't change the result
            not_done = jnp.max(lg_buf[:]) > -79.0
            pl.when((any_hit > 0.0) & not_done)(mt_tile)
        else:
            mt_tile()

    _stream_pipeline(cnt, get_dma, process)
    lg_out[:] = lg_buf[:].T


# ---------------------------------------------------------------------------
# Gathered-fine streaming kernels (r4): the block sweep's measured
# plateau (BENCH_ALL.md r3: 1-2.5 Mrays/s at 114-131K tris) is MT work
# against the per-block UNION of COARSE (BT-wide) cluster lists — a
# listed 1024-tri cluster is swept whole even when the block's corridor
# touches one of its 128-tri sub-boxes.  Per-visit overhead pins the
# profitable tile at ~BQ x 1024 pairs (finer BT measured worse), so the
# r4 design decouples the two granularities: the per-block front-to-back
# list is built at SUB_BT=128 granularity (fine slab keys + one (B,
# n_sc) argsort — measured 0.24 ms at (2048, 1024) on v5e), and each
# visit GATHERS the next FINE_GROUP listed fine clusters via FINE_GROUP
# concurrent sub-DMAs into one (16, FINE_GROUP*SUB_BT) VMEM tile — the
# same amortized tile shape, every column from the tightened list.
#
# On top rides two-round early termination (the per-RAY analog of
# kdtree.cc's early walk exit, SURVEY §2.3): round 1 visits only the
# first K1 groups of each block's list; round 2 recomputes the lists
# with per-ray tmax lowered to the round-1 best t (a resolved ray's
# corridor collapses to the clusters that could still beat its hit),
# masks out the block's round-1 visited ids, and finishes the
# stragglers starting from the round-1 best.  Exactness: a cluster can
# improve a ray iff its slab entry < best_t, and every such cluster is
# either in the block's round-1 prefix (tested, or provably skipped
# against a then-better best) or in its round-2 list.
# ---------------------------------------------------------------------------

FINE_GROUP = 8       # fine clusters gathered per visit
MAX_FINE_SC = 8192   # fine-path cap on sub-cluster count (prelude cost)


def _fine_mode() -> bool:
    import os

    return os.environ.get("LIBYAF_FINE", "1") == "1"


def _round_k1() -> int:
    """Round-1 visit budget in GROUPS of FINE_GROUP fine clusters
    (0 disables the two-round split)."""
    import os

    return int(os.environ.get("LIBYAF_K1", "6"))


def _stream_pipeline_multi(cnt, start_dmas, wait_dmas, process,
                           flags=None):
    """Two-slot pipeline like _stream_pipeline, but each step issues a
    GROUP of concurrent sub-DMAs (start_dmas/wait_dmas take (slot, g)).

    flags: optional SMEM (2,) i32 scratch [done, started] enabling
    EARLY EXIT — `process` may set flags[0]=1 when the remaining list
    provably cannot change the result (front-to-back key bound, or
    saturated shadow opacity); later groups then neither start DMAs nor
    compute.  flags[1] is a monotone started-until counter so a group's
    wait runs iff its start did (the one in-flight group at exit time is
    drained, keeping the shared DMA semaphores balanced across grid
    steps).  The fori_loop itself still spins over the dead tail —
    SMEM-read iterations, ~2 orders cheaper than a visited group."""
    if flags is None:
        @pl.when(cnt > 0)
        def _():
            start_dmas(0, 0)

        def body(jj, _):
            g0 = 2 * jj

            @pl.when(g0 < cnt)
            def _():
                @pl.when(g0 + 1 < cnt)
                def _():
                    start_dmas(1, g0 + 1)

                wait_dmas(0, g0)
                process(0, g0)

            @pl.when(g0 + 1 < cnt)
            def _():
                @pl.when(g0 + 2 < cnt)
                def _():
                    start_dmas(0, g0 + 2)

                wait_dmas(1, g0 + 1)
                process(1, g0 + 1)

            return 0

        jax.lax.fori_loop(0, (cnt + 1) // 2, body, 0)
        return

    flags[0] = 0
    flags[1] = 0

    @pl.when(cnt > 0)
    def _():
        start_dmas(0, 0)
        flags[1] = 1

    def half(slot, g):
        @pl.when((g + 1 < cnt) & (flags[0] == 0))
        def _():
            start_dmas(1 - slot, g + 1)
            flags[1] = g + 2

        @pl.when(g < flags[1])
        def _():
            wait_dmas(slot, g)

            @pl.when(flags[0] == 0)
            def _():
                process(slot, g)

    def body(jj, _):
        g0 = 2 * jj

        @pl.when(g0 < cnt)
        def _():
            half(0, g0)

        @pl.when(g0 + 1 < cnt)
        def _():
            half(1, g0 + 1)

        return 0

    jax.lax.fori_loop(0, (cnt + 1) // 2, body, 0)


def _fine_group_ids(ord_smem, sub, cnt, g, pad_id):
    """The FINE_GROUP fine-cluster ids of group g (list tail -> pad_id,
    whose pack block is all-degenerate and whose sub box is inverted).
    The SMEM index is clamped: the last group can address up to
    FINE_GROUP-1 slots past cnt (<= row length + 7 when n_sc is a
    multiple of the 128-column row padding)."""
    cmax = ord_smem.shape[1] - 1
    ids = []
    for s in range(FINE_GROUP):
        j = g * FINE_GROUP + s
        ids.append(jnp.where(j < cnt,
                             ord_smem[sub, jnp.minimum(j, cmax)], pad_id))
    return ids


def _closest_kernel_fine(order_hbm, nk_hbm, count_ref, init_t, init_c,
                         tri_hbm, sub_ref, rays_ref, t_out, tri_out,
                         tri_buf, ord_smem, nk_smem, sems, osem, best_t,
                         best_c, flags, *, pad_id: int, do_slab=True,
                         ee=True):
    """Gathered-fine closest-hit: one grid step per ray block; the
    block's FINE front-to-back list is walked FINE_GROUP entries per
    visit, each visit DMA-gathering its fine tiles into one (16,
    FINE_GROUP*SUB_BT) buffer and folding one MT tile into the running
    per-ray best.  init_t/init_c seed the best state (round 2 resumes
    from round 1; round 1 passes +inf/0).

    EARLY EXIT (the per-block analog of kdtree.cc's front-to-back walk
    termination): nk_hbm[b, g] is the slab-entry key of group g+1's
    FIRST list entry; once max over the block's rays of min(best_t,
    tmax) <= that bound, every remaining cluster's entry distance —
    hence any hit it could produce — is no nearer than what each ray
    already has, so the sweep stops (DMAs suppressed, see
    _stream_pipeline_multi flags)."""
    i = pl.program_id(0)
    cnt = count_ref[i]
    sub = i % 8

    @pl.when(sub == 0)
    def _():
        ocp = pltpu.make_async_copy(order_hbm.at[i // 8], ord_smem,
                                    osem.at[0])
        ocp.start()
        ncp = pltpu.make_async_copy(nk_hbm.at[i // 8], nk_smem,
                                    osem.at[1])
        ncp.start()
        ocp.wait()
        ncp.wait()

    org_ref, dir_ref, inv_ref, rp = _unpack_rays8(rays_ref)
    tmin, tmax = rp[:, 6:7], rp[:, 7:8]
    best_t[:] = init_t[...].T
    best_c[:] = init_c[...].T
    n_groups = (cnt + FINE_GROUP - 1) // FINE_GROUP

    def start_dmas(slot, g):
        ids = _fine_group_ids(ord_smem, sub, cnt, g, pad_id)
        for s in range(FINE_GROUP):
            pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(ids[s] * SUB_BT, SUB_BT)],
                tri_buf.at[slot, :, pl.ds(s * SUB_BT, SUB_BT)],
                sems.at[slot, s]).start()

    def wait_dmas(slot, g):
        ids = _fine_group_ids(ord_smem, sub, cnt, g, pad_id)
        for s in range(FINE_GROUP):
            pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(ids[s] * SUB_BT, SUB_BT)],
                tri_buf.at[slot, :, pl.ds(s * SUB_BT, SUB_BT)],
                sems.at[slot, s]).wait()

    def process(slot, g):
        ids = _fine_group_ids(ord_smem, sub, cnt, g, pad_id)

        def mt_tile():
            if MXU_MT:
                # ids[0] is always real (groups only run while
                # g*FINE_GROUP < cnt), so its box center is finite —
                # pad boxes are inverted (inf, -inf) and would NaN
                ctr = tuple(0.5 * (sub_ref[a, ids[0]]
                                   + sub_ref[a + 3, ids[0]])
                            for a in range(3))
                t, u, v, ok = _mt_tile_mxu(tri_buf[slot], org_ref,
                                           dir_ref, ctr)
            else:
                t, u, v, ok = _mt_tile(tri_buf[slot], org_ref, dir_ref)
            ok = ok & (t > tmin) & (t < tmax)
            t_ok = jnp.where(ok, t, jnp.inf)
            tile_min = jnp.min(t_ok, axis=1, keepdims=True)
            # global pack-column vector: sub s's 128 lanes map to
            # columns ids[s]*SUB_BT .. +127 of the (padded) pack
            cols = jnp.concatenate(
                [ids[s] * SUB_BT
                 + jax.lax.broadcasted_iota(jnp.int32, (1, SUB_BT), 1)
                 for s in range(FINE_GROUP)], axis=1)
            kcand = jnp.where(t_ok <= tile_min, cols, _BIG_I32)
            k_min = jnp.min(kcand, axis=1, keepdims=True)
            better = tile_min < best_t[:]
            best_t[:] = jnp.where(better, tile_min, best_t[:])
            best_c[:] = jnp.where(better, k_min, best_c[:])

        if do_slab:
            # group skip: can any ray hit ANY of the group's sub boxes
            # nearer than its current best?
            tb = jnp.minimum(tmax, best_t[:])
            any_hit = _slab_any(sub_ref, ids[0], org_ref, inv_ref,
                                tmin, tb)
            for s in range(1, FINE_GROUP):
                any_hit = jnp.maximum(
                    any_hit, _slab_any(sub_ref, ids[s], org_ref,
                                       inv_ref, tmin, tb))
            pl.when(any_hit > 0.0)(mt_tile)
        else:
            mt_tile()
        if ee:
            bound = jnp.max(jnp.minimum(best_t[:], tmax))
            flags[0] = (bound <= nk_smem[sub, g]).astype(jnp.int32)

    _stream_pipeline_multi(n_groups, start_dmas, wait_dmas, process,
                           flags=flags if ee else None)
    t_out[:] = best_t[:].T
    tri_out[:] = best_c[:].T


def _shadow_kernel_fine(order_hbm, count_ref, tri_hbm, sub_ref, rays_ref,
                        lg_out, tri_buf, ord_smem, sems, osem, lg_buf,
                        flags, *, pad_id: int, do_slab=True, ee=True):
    """Gathered-fine shadow kernel: accumulates LOG transmission over
    the block's fine list (pack rows 10:13 are the rgb log-filter rows;
    the pad block's tris are degenerate so list tails can't
    double-count).  EARLY EXIT: once every lane is either opaque-
    saturated (lg <= -79) or dead (no corridor), the rest of the list
    cannot change the output and the sweep stops."""
    i = pl.program_id(0)
    cnt = count_ref[i]
    sub = i % 8

    @pl.when(sub == 0)
    def _():
        ocp = pltpu.make_async_copy(order_hbm.at[i // 8], ord_smem, osem)
        ocp.start()
        ocp.wait()

    org_ref, dir_ref, inv_ref, rp = _unpack_rays8(rays_ref)
    dist = rp[:, 7:8]
    lg_buf[:] = jnp.zeros_like(lg_buf)
    tmin = 5e-4
    tmax = dist * (1.0 - 1e-4) - 5e-4
    n_groups = (cnt + FINE_GROUP - 1) // FINE_GROUP

    def start_dmas(slot, g):
        ids = _fine_group_ids(ord_smem, sub, cnt, g, pad_id)
        for s in range(FINE_GROUP):
            pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(ids[s] * SUB_BT, SUB_BT)],
                tri_buf.at[slot, :, pl.ds(s * SUB_BT, SUB_BT)],
                sems.at[slot, s]).start()

    def wait_dmas(slot, g):
        ids = _fine_group_ids(ord_smem, sub, cnt, g, pad_id)
        for s in range(FINE_GROUP):
            pltpu.make_async_copy(
                tri_hbm.at[:, pl.ds(ids[s] * SUB_BT, SUB_BT)],
                tri_buf.at[slot, :, pl.ds(s * SUB_BT, SUB_BT)],
                sems.at[slot, s]).wait()

    def process(slot, g):
        ids = _fine_group_ids(ord_smem, sub, cnt, g, pad_id)

        def mt_tile():
            t, _, _, ok = _mt_tile(tri_buf[slot], org_ref, dir_ref)
            okf = (ok & (t > tmin) & (t < tmax)).astype(jnp.float32)
            lg = lg_buf[:]
            cols = []
            for ci in range(3):
                acc = jnp.sum(okf * tri_buf[slot, 10 + ci:11 + ci, :],
                              axis=1, keepdims=True)
                cols.append(jnp.maximum(lg[:, ci:ci + 1] + acc, -80.0))
            lg_buf[:] = jnp.concatenate(cols, axis=1)

        if do_slab:
            any_hit = _slab_any(sub_ref, ids[0], org_ref, inv_ref,
                                jnp.full_like(dist, tmin), tmax)
            for s in range(1, FINE_GROUP):
                any_hit = jnp.maximum(
                    any_hit, _slab_any(sub_ref, ids[s], org_ref,
                                       inv_ref,
                                       jnp.full_like(dist, tmin), tmax))
            not_done = jnp.max(lg_buf[:]) > -79.0
            pl.when((any_hit > 0.0) & not_done)(mt_tile)
        else:
            mt_tile()
        if ee:
            live_lg = jnp.max(jnp.where(tmax > 0.0, lg_buf[:],
                                        jnp.float32(-1e3)))
            flags[0] = (live_lg <= -79.0).astype(jnp.int32)

    _stream_pipeline_multi(n_groups, start_dmas, wait_dmas, process,
                           flags=flags if ee else None)
    lg_out[:] = lg_buf[:].T


def _spread_bits(x):
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _ray_sort_perm(org, dirn, dead=None):
    """Spatial ray ordering: direction octant (major) then Morton code of
    the origin (9 bits/axis over the batch's own bounding box — 27 bits,
    leaving room for the 3 octant bits; the r2 10-bit layout silently
    overflowed the z-sign bit out of uint32).  Blocks of sorted rays
    share a direction cone + a tight origin box, so each block's
    reachable corridor covers few clusters — what makes per-block
    cluster culling effective for incoherent bounce/photon rays.
    `dead` rays (already resolved by the pair path) sort to the tail so
    their blocks carry empty cluster lists.  Returns (perm, inv)."""
    lo = jnp.min(org, axis=0)
    hi = jnp.max(org, axis=0)
    q = ((org - lo) / jnp.maximum(hi - lo, 1e-12) * 511.0)
    q = jnp.clip(q, 0.0, 511.0).astype(jnp.uint32)
    morton = (_spread_bits(q[:, 0]) | (_spread_bits(q[:, 1]) << 1)
              | (_spread_bits(q[:, 2]) << 2))
    octant = ((dirn[:, 0] < 0).astype(jnp.uint32)
              | ((dirn[:, 1] < 0).astype(jnp.uint32) << 1)
              | ((dirn[:, 2] < 0).astype(jnp.uint32) << 2))
    key = (octant << jnp.uint32(27)) | morton
    if dead is not None:
        key = key | (dead.astype(jnp.uint32) << jnp.uint32(30))
    perm = jnp.argsort(key)
    # scatter-based inverse: TPU argsort is a multi-pass bitonic sort
    # (~10 ms at 262K keys) — one is enough
    n = perm.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv


# ---------------------------------------------------------------------------
# Pair-granular path (r3): per-RAY front-to-back cluster lists expanded
# into (ray, cluster) PAIR slots, grouped cluster-major, and swept by a
# streaming kernel whose MT work is proportional to the SUM of per-ray
# list lengths — not to the per-block UNION of lists, which measured
# 3.7x larger on 131K-tri incoherent batches (scripts/sim_listlen.py)
# and is the r3 block-sweep plateau documented in BENCH_ALL.md.  Early
# termination survives as ROUNDS: round 1 tests each ray's K1 nearest
# clusters; round 2 tests the remaining clusters whose slab entry is
# closer than the round-1 hit (K2 cap); a final block-sweep pass with
# per-ray-tightened tmax (resolved rays killed, stragglers sorted into
# dense blocks) guarantees exactness whatever the caps.  Role:
# src/yafraycore/kdtree.cc [H] per-ray traversal order + early
# termination (SURVEY §2.3), recast as static-shape wavefront rounds.
#
# MEASURED RESULT (scripts/bench_pairs.py on the real v5e chip,
# BENCH_ALL.md r3 table): the pair path LOSES to the block sweep on
# every case — 0.14-0.17x closest, 0.04-0.46x shadow on the 131K soup.
# The 3.7x list-length saving is swamped by the pair machinery (pair
# expansion + cluster-major regroup + 128-slot tiles that re-DMA each
# cluster once per touching pair block, where the block sweep's 128-ray
# blocks amortize one tile DMA over BQ rays).  Default OFF
# (LIBYAF_PAIRS=1 re-enables for experiments); kept as the measured
# negative result that bounds what per-ray list granularity buys here.

PAIR_K1 = 4    # round-1 nearest clusters per ray
PAIR_K2 = 16   # round-2 cap (leftovers -> exact fallback pass)
PAIR_KB = 16   # pair-blocks (128 slots each) streamed per grid step
PAIRS_MIN_CLUSTERS = 64  # below this, block unions are already tight


def _pairs_mode() -> bool:
    import os

    return os.environ.get("LIBYAF_PAIRS", "0") == "1"


def _ray_cluster_entries(org, dirn, tmin, tmax, cluster8, sub8=None,
                         n_sub: int = 1):
    """Per-RAY slab entry distance to each cluster: (N, C) f32, inf when
    the ray's [tmin, tmax] corridor misses the cluster AABB.  With sub8,
    a cluster's entry is the min over its SUB_BT sub-boxes (tighter: the
    corridor must hit an occupied sub-box, not just the coarse hull).
    Chunked over (sub-)clusters so temporaries stay (N, 16, 3)."""
    iv = _inv_dir(dirn)
    table = sub8 if n_sub > 1 else cluster8
    n_sc = table.shape[1]
    lo = table[0:3].T
    hi = table[3:6].T
    outs = []
    ch = 16
    for c0 in range(0, n_sc, ch):
        loc = lo[c0:c0 + ch]
        hic = hi[c0:c0 + ch]
        t0 = (loc[None] - org[:, None]) * iv[:, None]
        t1 = (hic[None] - org[:, None]) * iv[:, None]
        enter = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1),
                            tmin[:, None])
        exit_ = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1),
                            tmax[:, None])
        e = jnp.where(enter <= exit_, enter, jnp.inf)
        if n_sub > 1:
            e = jnp.min(e.reshape(org.shape[0], -1, n_sub), axis=2)
        outs.append(e)
    return jnp.concatenate(outs, axis=1)


def _pair_tables(scl, n_cl: int, kb: int):
    """Visit tables for the pair kernels from cluster-sorted slot ids.

    scl: (P,) i32 ascending cluster ids (n_cl = invalid/padding).  A
    VISIT is one (128-slot pair-block, distinct cluster) run; since the
    ids are globally sorted, runs split only at block edges or id
    changes, so total visits <= P/128 + n_cl — the static table bound.
    Returns (vis_cl, vis_blk, start, cnt): per-visit cluster id and
    sub-block index within its grid step, and each step's [start,
    start+cnt) visit range."""
    p = scl.shape[0]
    nb = p // 128
    n_steps = nb // kb
    blk = jnp.arange(p, dtype=jnp.int32) // 128
    prev_s = jnp.concatenate([jnp.full((1,), -1, jnp.int32), scl[:-1]])
    prev_b = jnp.concatenate([jnp.full((1,), -1, jnp.int32), blk[:-1]])
    first = ((scl != prev_s) | (blk != prev_b)) & (scl < n_cl)
    vpos = jnp.cumsum(first.astype(jnp.int32)) - 1
    v_cap = nb + n_cl
    tgt = jnp.where(first, vpos, v_cap)
    vis_cl = jnp.zeros((v_cap,), jnp.int32).at[tgt].set(scl, mode="drop")
    vis_blk = jnp.zeros((v_cap,), jnp.int32).at[tgt].set(
        blk % kb, mode="drop")
    stepv = jnp.where(first, blk // kb, n_steps)
    start = jnp.full((n_steps,), v_cap, jnp.int32).at[stepv].min(
        vpos, mode="drop")
    last = jnp.full((n_steps,), -1, jnp.int32).at[stepv].max(
        vpos, mode="drop")
    has = last >= 0
    cnt = jnp.where(has, last - start + 1, 0)
    start = jnp.where(has, start, 0)
    return vis_cl, vis_blk, start, cnt


def _pairs_closest_kernel(viscl_ref, visblk_ref, start_ref, cnt_ref,
                          tri_hbm, ray_ref, slotcl_ref,
                          t_out, col_out, tri_buf, sems):
    """Pair sweep: one grid step covers PAIR_KB 128-slot pair-blocks;
    each visit DMAs its cluster's (16, BT) tile (double-buffered) and
    MTs it against the visit's 128 ray rows, masked to slots whose
    cluster matches (blocks straddling a cluster boundary get one visit
    per distinct cluster).  Slot cluster ids ride as f32 VALUES."""
    s = pl.program_id(0)
    base = start_ref[s]
    cnt = cnt_ref[s]
    bt = tri_buf.shape[-1]
    t_out[:] = jnp.full_like(t_out, jnp.inf)
    col_out[:] = jnp.zeros_like(col_out)

    def get_dma(slot, j):
        c = viscl_ref[base + j]
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(c * bt, bt)], tri_buf.at[slot],
            sems.at[slot])

    def process(slot, j):
        c = viscl_ref[base + j]
        r0 = visblk_ref[base + j] * 128
        rows = pl.ds(r0, 128)
        org = ray_ref[rows, 0:3]
        dirn = ray_ref[rows, 3:6]
        tmin = ray_ref[rows, 6:7]
        tmax = ray_ref[rows, 7:8]
        t, _, _, ok = _mt_tile(tri_buf[slot], org, dirn)
        rowm = slotcl_ref[rows, :] == c.astype(jnp.float32)
        ok = ok & rowm & (t > tmin) & (t < tmax)
        t_ok = jnp.where(ok, t, jnp.inf)
        tile_min = jnp.min(t_ok, axis=1, keepdims=True)
        kcol = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        kcand = jnp.where(t_ok <= tile_min, kcol, _BIG_I32)
        k_min = jnp.min(kcand, axis=1, keepdims=True)
        cur = t_out[rows, :]
        better = tile_min < cur
        t_out[rows, :] = jnp.where(better, tile_min, cur)
        cc = col_out[rows, :]
        col_out[rows, :] = jnp.where(better, c * bt + k_min, cc)

    _stream_pipeline(cnt, get_dma, process)


def _pairs_shadow_kernel(viscl_ref, visblk_ref, start_ref, cnt_ref,
                         tri_hbm, ray_ref, slotcl_ref,
                         lg_out, tri_buf, sems):
    """Pair variant of the shadow kernel: accumulates LOG transmission
    per pair slot from its own cluster's tile (rows 10:13 of the
    streamed pack are the rgb log-filter rows)."""
    s = pl.program_id(0)
    base = start_ref[s]
    cnt = cnt_ref[s]
    bt = tri_buf.shape[-1]
    lg_out[:] = jnp.zeros_like(lg_out)

    def get_dma(slot, j):
        c = viscl_ref[base + j]
        return pltpu.make_async_copy(
            tri_hbm.at[:, pl.ds(c * bt, bt)], tri_buf.at[slot],
            sems.at[slot])

    def process(slot, j):
        c = viscl_ref[base + j]
        r0 = visblk_ref[base + j] * 128
        rows = pl.ds(r0, 128)
        org = ray_ref[rows, 0:3]
        dirn = ray_ref[rows, 3:6]
        tmin = ray_ref[rows, 6:7]
        tmax = ray_ref[rows, 7:8]
        t, _, _, ok = _mt_tile(tri_buf[slot], org, dirn)
        rowm = slotcl_ref[rows, :] == c.astype(jnp.float32)
        okf = (ok & rowm & (t > tmin) & (t < tmax)).astype(jnp.float32)
        lg = lg_out[rows, :]
        cols = []
        for ch in range(3):
            acc = jnp.sum(okf * tri_buf[slot, 10 + ch:11 + ch, :],
                          axis=1, keepdims=True)
            cols.append(lg[:, ch:ch + 1] + acc)
        lg_out[rows, :] = jnp.concatenate(cols, axis=1)

    _stream_pipeline(cnt, get_dma, process)


def _pairs_sweep(kernel, pack16, ray8, slotcl, vis, bt: int, out_cols):
    """Launch a pair kernel over cluster-sorted slots.  out_cols: list
    of (ncols, dtype) output planes, each (P, ncols)."""
    vis_cl, vis_blk, start, cnt = vis
    p = ray8.shape[0]
    kbq = 128 * PAIR_KB
    qspec = lambda c: pl.BlockSpec((kbq, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(p // kbq,),
        in_specs=[smem, smem, smem, smem,
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  qspec(8), qspec(1)],
        out_specs=[qspec(c) for c, _ in out_cols],
        scratch_shapes=[pltpu.VMEM((2, 16, bt), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        out_shape=[jax.ShapeDtypeStruct((p, c), d) for c, d in out_cols],
        interpret=INTERPRET,
    )(vis_cl, vis_blk, start, cnt, pack16, ray8, slotcl)
    return outs


def _expand_pairs(idx, valid, n_cl: int):
    """(N, K) per-ray cluster picks -> cluster-sorted pair slots.
    Returns (sray, scl, slotcl) with P padded to a PAIR_KB*128 multiple;
    invalid/padding slots carry scl == n_cl and sort to the tail."""
    n, k = idx.shape
    keys = jnp.where(valid, idx, n_cl).astype(jnp.int32).ravel()
    p = n * k
    kbq = 128 * PAIR_KB
    pp = ((p + kbq - 1) // kbq) * kbq
    keys = jnp.pad(keys, (0, pp - p), constant_values=n_cl)
    perm = jnp.argsort(keys)
    scl = keys[perm]
    sray = jnp.pad(jnp.arange(p, dtype=jnp.int32) // k, (0, pp - p))[perm]
    return sray, scl, scl.astype(jnp.float32)[:, None]


def _pair_round(pack16, ray8_n, idx, valid, n_cl: int, bt: int):
    """One closest-hit pair round over each ray's picked clusters.
    Returns per-ray (t, col) for this round (inf/0 when none hit)."""
    n = ray8_n.shape[0]
    sray, scl, slotcl = _expand_pairs(idx, valid, n_cl)
    ray8 = ray8_n[sray]
    vis = _pair_tables(scl, n_cl, PAIR_KB)
    t_s, col_s = _pairs_sweep(_pairs_closest_kernel, pack16, ray8,
                              slotcl, vis, bt,
                              [(1, jnp.float32), (1, jnp.int32)])
    t_s = jnp.where(scl < n_cl, t_s[:, 0], jnp.inf)
    col_s = col_s[:, 0]
    t_ray = jnp.full((n,), jnp.inf).at[sray].min(t_s, mode="drop")
    win = (t_s == t_ray[sray]) & jnp.isfinite(t_s)
    col_ray = jnp.full((n,), _BIG_I32, jnp.int32).at[sray].min(
        jnp.where(win, col_s, _BIG_I32), mode="drop")
    col_ray = jnp.where(jnp.isfinite(t_ray), col_ray, 0)
    return t_ray, col_ray


def _closest_hit_pairs(tri_pack10, pack16, cluster8, org, dirn, tmin,
                       tmax, n_tris: int):
    """Pair-granular closest hit: two pair rounds + exact fallback.
    Returns per-ray (t, col) in original ray order."""
    n_cl = cluster8.shape[1]
    bt = tri_pack10.shape[1] // n_cl
    n = org.shape[0]
    n_sub = _pick_nsub(tri_pack10, bt)
    sub8 = _sub_aabbs(tri_pack10, n_tris) if n_sub > 1 else None
    ent = _ray_cluster_entries(org, dirn, tmin, tmax, cluster8,
                               sub8=sub8, n_sub=n_sub)
    # one row argsort orders each ray's clusters front-to-back; both
    # rounds and the straggler test slice it
    sidx = jnp.argsort(ent, axis=1).astype(jnp.int32)
    sent = jnp.take_along_axis(ent, sidx, axis=1)
    ray8 = jnp.concatenate(
        [org, dirn, tmin[:, None], tmax[:, None]], axis=1)

    k1 = min(PAIR_K1, n_cl)
    t1, c1 = _pair_round(pack16, ray8, sidx[:, :k1],
                         jnp.isfinite(sent[:, :k1]), n_cl, bt)
    k2 = min(PAIR_K1 + PAIR_K2, n_cl)
    if k2 > k1:
        v2 = jnp.isfinite(sent[:, k1:k2]) & (sent[:, k1:k2] < t1[:, None])
        t2, c2 = _pair_round(pack16, ray8, sidx[:, k1:k2], v2, n_cl, bt)
        use2 = t2 < t1
        t12 = jnp.where(use2, t2, t1)
        c12 = jnp.where(use2, c2, c1)
    else:
        t12, c12 = t1, c1
    # stragglers: clusters past the caps still closer than the best hit
    if n_cl > k2:
        has3 = jnp.any(sent[:, k2:] < t12[:, None], axis=1)
        tmax3 = jnp.where(has3, jnp.minimum(tmax, t12), -1.0)
        t_fb, col_fb = _closest_fb_tcol(tri_pack10, pack16, cluster8,
                                        org, dirn, tmin, tmax3, n_tris,
                                        dead=~has3, ent=ent)
        usef = t_fb < t12
        t12 = jnp.where(usef, t_fb, t12)
        c12 = jnp.where(usef, col_fb, c12)
    return t12, c12


def _pick_nsub(tri_pack10, bt: int) -> int:
    """Sub-granularity for list tightening while the prelude's sub-level
    slab sweep stays cheap; huge scenes fall back to coarse keys."""
    return (bt // SUB_BT
            if bt > SUB_BT and tri_pack10.shape[1] // SUB_BT <= 2048
            else 1)


def _block_order_from_entries(ent_p, bq: int, tmax_p):
    """Per-block front-to-back cluster lists from a PRECOMPUTED per-ray
    entry matrix (pair path reuse — no slab recompute).  Lowering tmax
    only changes reachability via `entry <= tmax`: the slab enter term
    has no tmax dependence, and entry <= exit already held when the
    entry was stored, so new-hit <=> entry <= new tmax, exactly."""
    key_ray = jnp.where(ent_p <= tmax_p[:, None], ent_p, jnp.inf)
    b = ent_p.shape[0] // bq
    key = jnp.min(key_ray.reshape(b, bq, -1), axis=1)
    n_cl = key.shape[1]
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(jnp.isfinite(key), axis=1).astype(jnp.int32)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (b, n_cl), 1)
    last = jnp.take_along_axis(order,
                               jnp.maximum(count - 1, 0)[:, None], axis=1)
    order = jnp.where(jidx < jnp.maximum(count, 1)[:, None], order, last)
    return order, count


def _closest_fb_tcol(tri_pack10, pack16, cluster8, org, dirn, tmin, tmax,
                     n_tris: int, presorted: bool = False, dead=None,
                     ent=None):
    """Front-to-back streaming block sweep returning per-ray (t, best
    PACK COLUMN) in ORIGINAL ray order.  `dead` marks rays to sort to
    the tail (their empty lists then cost nothing); `ent` is an optional
    precomputed (N, C) per-ray entry matrix (pair-path fallback) that
    replaces the prelude's slab sweep."""
    n_cl = cluster8.shape[1]
    bt = tri_pack10.shape[1] // n_cl
    n = org.shape[0]
    sort = (not presorted) and n_cl >= SORT_MIN_CLUSTERS
    unperm = None
    if sort:
        perm, unperm = _ray_sort_perm(org, dirn, dead=dead)
        ray_pack = jnp.concatenate(
            [org, dirn, tmin[:, None], tmax[:, None]], axis=1)[perm]
        org, dirn = ray_pack[:, 0:3], ray_pack[:, 3:6]
        tmin, tmax = ray_pack[:, 6], ray_pack[:, 7]
        if ent is not None:
            ent = ent[perm]
    bq = _pick_bq(bt)
    rays8, _ = _rays8_t([org, dirn, tmin, tmax], bq)
    npad = rays8.shape[1]
    out_shape = [
        jax.ShapeDtypeStruct((1, npad), jnp.float32),
        jax.ShapeDtypeStruct((1, npad), jnp.int32),
    ]
    if ent is not None:
        ent_p = jnp.pad(ent, ((0, npad - n), (0, 0)),
                        constant_values=jnp.inf)
        order, count = _block_order_from_entries(
            ent_p, bq, jnp.pad(tmax, (0, npad - n)))
        k_sub = 1
    else:
        n_sub = _pick_nsub(tri_pack10, bt)
        sub8 = (_sub_aabbs(tri_pack10, n_tris) if n_sub > 1 else None)
        order, count = _block_cluster_order(
            rays8[0:3].T, rays8[3:6].T, rays8[6], rays8[7], cluster8, bq,
            sub8=sub8, n_sub=n_sub)
        k_sub = n_sub if _submask_mode() else 1
    order, c128 = _order_groups(order)
    # count rides as a plain SMEM operand; order stays in HBM and
    # each block DMAs its own (C,) row into SMEM scratch in-kernel
    # (a whole-array SMEM operand exceeds the 1 MB SMEM cap at fine
    # cluster widths, and PrefetchScalarGridSpec kernels took
    # 15+ min per remote Mosaic compile in this environment)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ospec = lambda r: pl.BlockSpec((r, bq), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    t, col = pl.pallas_call(
        functools.partial(_closest_kernel_stream,
                          do_slab=_slab_mode(), n_sub=k_sub),
        grid=(npad // bq,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # order in HBM
            smem,
            pl.BlockSpec(memory_space=pltpu.HBM),  # pack in HBM
            smem,
            ospec(8),                              # transposed ray pack
        ],
        out_specs=[ospec(1)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 16, bt), jnp.float32),
            pltpu.SMEM((8, c128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.int32),
        ],
        out_shape=out_shape,
        interpret=INTERPRET,
    )(order, count, pack16, cluster8, rays8)
    t, col = t[0, :n], col[0, :n]
    if sort:
        # one packed un-permute gather; col ids ride as f32 VALUES
        # (exact below 2^24 — a bitcast would produce denormals, which
        # the TPU flushes to zero)
        pk = jnp.stack([t, col.astype(jnp.float32)], axis=1)[unperm]
        t, col = pk[:, 0], pk[:, 1].astype(jnp.int32)
    return t, col


def _fine_block_keys(org, dirn, tmin, tmax, table, bq: int, ch: int = 32):
    """Per-block front-to-back keys over a FINE AABB table: (B, n_sc)
    f32, entry distance of the block's nearest-entering ray (inf when no
    ray's [tmin, tmax] corridor enters).  org/dirn/tmin/tmax are sorted
    and padded to a bq multiple; chunked over clusters to bound the
    (B, bq, ch, 3) temporary."""
    n_sc = table.shape[1]
    b = org.shape[0] // bq
    o = org.reshape(b, bq, 3)
    iv = _inv_dir(dirn).reshape(b, bq, 3)
    tmin_b = tmin.reshape(b, bq)
    tmax_b = tmax.reshape(b, bq)
    nch = -(-n_sc // ch)
    padc = nch * ch - n_sc
    # fori_loop (not an unrolled Python loop): at 4096 sub-clusters the
    # unrolled form's 128 chunk iterations OOM'd HBM — XLA scheduled
    # their (B, bq, ch, 3) temps with overlapping lifetimes.  Pad
    # clusters carry a (+inf, +inf) box (entry inf/NaN in every octant,
    # masked by enter<=exit), sliced off on return.
    lo = jnp.pad(table[0:3].T, ((0, padc), (0, 0)),
                 constant_values=jnp.inf).reshape(nch, ch, 3)
    hi = jnp.pad(table[3:6].T, ((0, padc), (0, 0)),
                 constant_values=jnp.inf).reshape(nch, ch, 3)

    def body(c, keys):
        loc = jax.lax.dynamic_index_in_dim(lo, c, keepdims=False)
        hic = jax.lax.dynamic_index_in_dim(hi, c, keepdims=False)
        t0 = (loc[None, None] - o[:, :, None]) * iv[:, :, None]
        t1 = (hic[None, None] - o[:, :, None]) * iv[:, :, None]
        enter = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1),
                            tmin_b[..., None])
        exit_ = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1),
                            tmax_b[..., None])
        hit = enter <= exit_
        kc = jnp.min(jnp.where(hit, enter, jnp.inf), axis=1)
        return jax.lax.dynamic_update_slice(keys, kc, (0, c * ch))

    keys = jax.lax.fori_loop(
        0, nch, body, jnp.full((b, nch * ch), jnp.inf, jnp.float32))
    return keys[:, :n_sc]


def _order_from_fine_keys(key):
    """(entries, count) from a (B, n_sc) key matrix.  No dead-tail fill:
    the fine kernels substitute pad_id for slots past count."""
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(jnp.isfinite(key), axis=1).astype(jnp.int32)
    return order, count


def _fine_bq(n_sc: int) -> int:
    """Rays per block for the fine path: small scenes keep big blocks
    (grid-step overhead dominates their short lists); at scene scale the
    tighter 128-ray corridors win (same measured tradeoff as
    _pick_bq)."""
    return _pick_bq(1024) if n_sc >= 64 else BQ


def _fine_tables(tri_pack10, pack16, n_tris: int):
    """Padded fine tables for the gathered kernels: the streamed pack
    gains one all-degenerate SUB_BT block at column n_sc*SUB_BT (the
    never-hit pad_id target) and the sub-AABB table one inverted box."""
    sub8 = _sub_aabbs(tri_pack10, n_tris)
    padcol = jnp.concatenate(
        [jnp.full((3, 1), jnp.inf, jnp.float32),
         jnp.full((3, 1), -jnp.inf, jnp.float32),
         jnp.zeros((2, 1), jnp.float32)], axis=0)
    sub8p = jnp.concatenate([sub8, padcol], axis=1)
    pack16f = jnp.pad(pack16, ((0, 0), (0, SUB_BT)))
    return pack16f, sub8p


def _ee_mode() -> bool:
    """In-kernel early exit for the fine sweeps (exact; off only for
    A/B measurement)."""
    import os

    return os.environ.get("LIBYAF_EE", "1") == "1"


def _sort_mode() -> str:
    """Ray ordering for the fine sweeps: 'morton' = origin Morton code
    + direction octant (_ray_sort_perm); 'entry' = corridor-head sort
    (first fine cluster the ray's corridor enters, then octant) — the
    per-block list UNION matters most in the first front-to-back groups
    where EE resolves most rays, and rays sharing their corridor head
    share exactly those."""
    import os

    return os.environ.get("LIBYAF_SORT", "morton")


def _entry_sort_perm(org, dirn, tmin, tmax, sub8p, n_sc: int,
                     ch: int = 256):
    """Corridor-head ray ordering (see _sort_mode).  A fori_loop running
    argmin over ch-cluster slices of the fine AABB table bounds BOTH the
    (N, ch) temporaries' live set and the trace size — the r5 unrolled
    variant OOM'd HBM at 4096 sub-clusters (XLA overlapped the 64
    chunk iterations' 64 MB temps under remat).  Pad clusters carry a
    (+inf, +inf) box: their slab entry is +inf or NaN in every octant,
    so the enter<=exit mask sends them to the inf tail.  Misses (no
    cluster entered) sort to the tail.  Returns (perm, inv)."""
    n = org.shape[0]
    iv = _inv_dir(dirn)
    nch = -(-n_sc // ch)
    padc = nch * ch - n_sc
    lo = jnp.pad(sub8p[0:3, :n_sc].T, ((0, padc), (0, 0)),
                 constant_values=jnp.inf).reshape(nch, ch, 3)
    hi = jnp.pad(sub8p[3:6, :n_sc].T, ((0, padc), (0, 0)),
                 constant_values=jnp.inf).reshape(nch, ch, 3)

    def body(c, carry):
        best, bid = carry
        loc = jax.lax.dynamic_index_in_dim(lo, c, keepdims=False)
        hic = jax.lax.dynamic_index_in_dim(hi, c, keepdims=False)
        t0 = (loc[None] - org[:, None]) * iv[:, None]
        t1 = (hic[None] - org[:, None]) * iv[:, None]
        ent = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1),
                          tmin[:, None])
        ext = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1),
                          tmax[:, None])
        ent = jnp.where(ent <= ext, ent, jnp.inf)
        am = jnp.argmin(ent, axis=1)
        bv = jnp.take_along_axis(ent, am[:, None], axis=1)[:, 0]
        upd = bv < best
        best = jnp.where(upd, bv, best)
        bid = jnp.where(upd, c * ch + am.astype(jnp.int32), bid)
        return best, bid

    best, bid = jax.lax.fori_loop(
        0, nch, body,
        (jnp.full((n,), jnp.inf, jnp.float32),
         jnp.full((n,), n_sc, jnp.int32)))
    bid = jnp.where(jnp.isfinite(best), bid, n_sc)
    octant = ((dirn[:, 0] < 0).astype(jnp.uint32)
              | ((dirn[:, 1] < 0).astype(jnp.uint32) << 1)
              | ((dirn[:, 2] < 0).astype(jnp.uint32) << 2))
    key = (bid.astype(jnp.uint32) << jnp.uint32(3)) | octant
    perm = jnp.argsort(key)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv


def _next_group_keys(key, order):
    """(B, G) f32: for group g, the sorted slab-entry key of group
    g+1's first entry (the front-to-back bound the early exit compares
    against).  The last group's slot is harmless (exit after it skips
    nothing)."""
    n_sc = key.shape[1]
    ks = jnp.take_along_axis(key, order, axis=1)
    g = (n_sc + FINE_GROUP - 1) // FINE_GROUP
    idx = jnp.minimum((jnp.arange(g) + 1) * FINE_GROUP, n_sc - 1)
    return ks[:, idx]


def _run_fine_closest(order, nk, count, init_t, init_c, pack16f, sub8p,
                      rays8, bq: int, pad_id: int):
    """One gathered-fine closest sweep.  init_t/init_c and the returned
    (t, col) are (1, npad) rows in the rays8 (sorted) order."""
    order_g, c128 = _order_groups(order)
    nk_g, g128 = _order_groups(nk)
    npad = rays8.shape[1]
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ospec = lambda r: pl.BlockSpec((r, bq), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    t, col = pl.pallas_call(
        functools.partial(_closest_kernel_fine, pad_id=pad_id,
                          do_slab=_slab_mode(), ee=_ee_mode()),
        grid=(npad // bq,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # order groups
            pl.BlockSpec(memory_space=pltpu.HBM),  # next-group keys
            smem,                                  # count
            ospec(1), ospec(1),                    # init best
            pl.BlockSpec(memory_space=pltpu.HBM),  # pack
            smem,                                  # sub AABBs
            ospec(8),                              # transposed rays
        ],
        out_specs=[ospec(1)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 16, FINE_GROUP * SUB_BT), jnp.float32),
            pltpu.SMEM((8, c128), jnp.int32),
            pltpu.SMEM((8, g128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, FINE_GROUP)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        interpret=INTERPRET,
    )(order_g, nk_g, count, init_t, init_c, pack16f, sub8p, rays8)
    return t, col


def _closest_fine_tcol(tri_pack10, pack16, org, dirn, tmin, tmax,
                       n_tris: int, presorted: bool = False):
    """Gathered-fine closest hit with two-round early termination (see
    the r4 design block above _closest_kernel_fine).  Returns per-ray
    (t, best PACK COLUMN) in ORIGINAL ray order."""
    tp = tri_pack10.shape[1]
    n_sc = tp // SUB_BT
    if _rounds_mode() >= 2 and n_sc >= SORT_MIN_CLUSTERS:
        return _closest_fine_rounds_tcol(tri_pack10, pack16, org, dirn,
                                         tmin, tmax, n_tris)
    pad_id = n_sc
    pack16f, sub8p = _fine_tables(tri_pack10, pack16, n_tris)
    n = org.shape[0]
    sort = (not presorted) and n_sc >= SORT_MIN_CLUSTERS
    unperm = None
    if sort:
        if _sort_mode() == "entry":
            perm, unperm = _entry_sort_perm(org, dirn, tmin, tmax,
                                            sub8p, n_sc)
        else:
            perm, unperm = _ray_sort_perm(org, dirn)
        ray_pack = jnp.concatenate(
            [org, dirn, tmin[:, None], tmax[:, None]], axis=1)[perm]
        org, dirn = ray_pack[:, 0:3], ray_pack[:, 3:6]
        tmin, tmax = ray_pack[:, 6], ray_pack[:, 7]
    bq = _fine_bq(n_sc)
    rays8, _ = _rays8_t([org, dirn, tmin, tmax], bq)
    npad = rays8.shape[1]
    key = _fine_block_keys(rays8[0:3].T, rays8[3:6].T, rays8[6],
                           rays8[7], sub8p[:, :n_sc], bq)
    order, count = _order_from_fine_keys(key)
    nk = _next_group_keys(key, order)
    k1 = _round_k1()
    k1e = k1 * FINE_GROUP
    two_rounds = k1 > 0 and n_sc > 2 * k1e
    init_t = jnp.full((1, npad), jnp.inf, jnp.float32)
    init_c = jnp.zeros((1, npad), jnp.int32)
    cnt1 = jnp.minimum(count, k1e) if two_rounds else count
    t, col = _run_fine_closest(order, nk, cnt1, init_t, init_c, pack16f,
                               sub8p, rays8, bq, pad_id)
    if two_rounds:
        # round 2: corridors re-keyed against the round-1 best t (a
        # resolved ray keeps only clusters that could still beat its
        # hit), minus the block's visited prefix.  Unlisted-in-round-1
        # clusters stay unlisted (round-2 tmax is never larger).
        tmax2 = jnp.minimum(rays8[7], t[0])
        key2 = _fine_block_keys(rays8[0:3].T, rays8[3:6].T, rays8[6],
                                tmax2, sub8p[:, :n_sc], bq)
        visited = order[:, :k1e]
        bidx = jax.lax.broadcasted_iota(jnp.int32, visited.shape, 0)
        key2 = key2.at[bidx, visited].set(jnp.inf)
        order2, count2 = _order_from_fine_keys(key2)
        nk2 = _next_group_keys(key2, order2)
        t, col = _run_fine_closest(order2, nk2, count2, t, col, pack16f,
                                   sub8p, rays8, bq, pad_id)
    t, col = t[0, :n], col[0, :n]
    if sort:
        pk = jnp.stack([t, col.astype(jnp.float32)], axis=1)[unperm]
        t, col = pk[:, 0], pk[:, 1].astype(jnp.int32)
    return t, col


def _rounds_mode() -> int:
    """Multi-round resorted fine sweep (VERDICT r4 #1c): value R >= 2
    enables R rounds; 0/1 keeps the single-membership two-round path.
    Mechanism measured first in scripts/sim_rounds.py: the block-sweep
    plateau is max-over-rays drain of per-block UNION lists under fixed
    membership; capping each round's visits and RESORTING survivors by
    their next unvisited corridor head concentrates stragglers into few
    dense blocks (predicted ~3.9x fewer group-steps on the 131K soup,
    incoherent closest, vs the morton single sweep)."""
    import os

    return int(os.environ.get("LIBYAF_ROUNDS", "0"))


def _rounds_cap() -> int:
    """Per-block visit budget (groups of FINE_GROUP) in every round but
    the last (which is uncapped for exactness)."""
    import os

    return int(os.environ.get("LIBYAF_RCAP", "4"))


def _closest_fine_rounds_tcol(tri_pack10, pack16, org, dirn, tmin, tmax,
                              n_tris: int):
    """Gathered-fine closest hit, R rounds with per-round RESORT.

    Reference role: kdtree.cc's per-ray front-to-back walk with early
    termination (SURVEY §2.3), recast as wavefront rounds that keep the
    DMA-amortizing block sweep as the executor.  Per round: sort rays by
    corridor head over their REMAINING corridor [frontier, min(tmax,
    best_t)], build per-block fine lists, visit at most `cap` groups,
    then advance each unresolved ray's frontier to its block's gate key
    at the cap position.  Exactness argument: after a round every
    cluster with entry_i < gate_b has block key < gate_b, hence was in
    the visited prefix — so listing [frontier, min(tmax, best_t)] next
    round covers every cluster that could still beat the ray's best; a
    ray retires (lists nothing, via tmax_eff sentinel) once its bound
    passes the gate or its block drained, and the final round runs
    uncapped.  The kernel is unchanged — done/frontier fall out of
    (count, nk, t) on the host side of the same jit."""
    tp = tri_pack10.shape[1]
    n_sc = tp // SUB_BT
    pad_id = n_sc
    pack16f, sub8p = _fine_tables(tri_pack10, pack16, n_tris)
    n = org.shape[0]
    rounds = max(_rounds_mode(), 2)
    cap = _rounds_cap()
    bq = _fine_bq(n_sc)
    neg = jnp.float32(-3e38)  # retired-ray listing sentinel (tmax < tmin)
    best_t = jnp.full((n,), jnp.inf, jnp.float32)
    best_c = jnp.zeros((n,), jnp.float32)  # rides as f32 (exact < 2^24)
    frontier = tmin
    done = jnp.zeros((n,), jnp.float32)
    for r in range(rounds):
        last = r == rounds - 1
        tmax_eff = jnp.where(done > 0.0, neg, jnp.minimum(tmax, best_t))
        perm, unperm = _entry_sort_perm(org, dirn, frontier, tmax_eff,
                                        sub8p, n_sc)
        pk = jnp.concatenate(
            [org, dirn, tmin[:, None], tmax[:, None], frontier[:, None],
             tmax_eff[:, None], best_t[:, None], best_c[:, None],
             done[:, None]], axis=1)[perm]
        org_s, dirn_s = pk[:, 0:3], pk[:, 3:6]
        tmin_s, tmax_s = pk[:, 6], pk[:, 7]
        rays8, _ = _rays8_t([org_s, dirn_s, tmin_s, tmax_s], bq)
        npad = rays8.shape[1]
        padn = npad - n
        fr_p = jnp.pad(pk[:, 8], (0, padn))
        tme_p = jnp.pad(pk[:, 9], (0, padn), constant_values=-3e38)
        key = _fine_block_keys(rays8[0:3].T, rays8[3:6].T, fr_p, tme_p,
                               sub8p[:, :n_sc], bq)
        order, count = _order_from_fine_keys(key)
        nk = _next_group_keys(key, order)
        cnt_r = count if last else jnp.minimum(count,
                                               cap * FINE_GROUP)
        init_t = jnp.pad(pk[:, 10], (0, padn),
                         constant_values=jnp.inf)[None]
        init_c = jnp.pad(pk[:, 11].astype(jnp.int32), (0, padn))[None]
        t, col = _run_fine_closest(order, nk, cnt_r, init_t, init_c,
                                   pack16f, sub8p, rays8, bq, pad_id)
        t_s, c_s = t[0, :n], col[0, :n]
        if last:
            out = jnp.stack([t_s, c_s.astype(jnp.float32)],
                            axis=1)[unperm]
            return out[:, 0], out[:, 1].astype(jnp.int32)
        # gate key at the cap position: everything the block visited has
        # block key < gate, so entry_i < gate => visited (see docstring)
        gate_b = nk[:, cap - 1]
        drained_b = (count <= cap * FINE_GROUP).astype(jnp.float32)
        gate = jnp.repeat(gate_b, bq)[:n]
        drained = jnp.repeat(drained_b, bq)[:n]
        bound = jnp.minimum(t_s, tmax_s)
        done_s = jnp.maximum(pk[:, 12],
                             jnp.maximum(drained,
                                         (bound <= gate)
                                         .astype(jnp.float32)))
        fr_s = jnp.where(done_s > 0.0, pk[:, 8],
                         jnp.maximum(pk[:, 8], gate))
        out = jnp.stack([t_s, c_s.astype(jnp.float32), done_s, fr_s],
                        axis=1)[unperm]
        best_t, best_c = out[:, 0], out[:, 1]
        done, frontier = out[:, 2], out[:, 3]


def _shadow_fine_lg(tri_pack10, pack16s, org, dirn, dist, n_tris: int,
                    presorted: bool = False):
    """Gathered-fine shadow sweep: (N, 3) LOG transmission in ORIGINAL
    ray order.  Single round — transmission needs the whole corridor
    (the in-kernel opaque early-out still applies)."""
    tp = tri_pack10.shape[1]
    n_sc = tp // SUB_BT
    pad_id = n_sc
    pack16f, sub8p = _fine_tables(tri_pack10, pack16s, n_tris)
    n = org.shape[0]
    sort = (not presorted) and n_sc >= SORT_MIN_CLUSTERS
    unperm = None
    if sort:
        if _sort_mode() == "entry":
            perm, unperm = _entry_sort_perm(
                org, dirn, jnp.full_like(dist, 5e-4),
                dist * (1.0 - 1e-4) - 5e-4, sub8p, n_sc)
        else:
            perm, unperm = _ray_sort_perm(org, dirn)
        ray_pack = jnp.concatenate([org, dirn, dist[:, None]],
                                   axis=1)[perm]
        org, dirn, dist = (ray_pack[:, 0:3], ray_pack[:, 3:6],
                           ray_pack[:, 6])
    bq = _fine_bq(n_sc)
    rays8, _ = _rays8_t([org, dirn, jnp.zeros_like(dist), dist], bq)
    npad = rays8.shape[1]
    d = rays8[7]
    key = _fine_block_keys(rays8[0:3].T, rays8[3:6].T,
                           jnp.full_like(d, 5e-4),
                           d * (1.0 - 1e-4) - 5e-4, sub8p[:, :n_sc], bq)
    order, count = _order_from_fine_keys(key)
    order_g, c128 = _order_groups(order)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ospec = lambda r: pl.BlockSpec((r, bq), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    lg = pl.pallas_call(
        functools.partial(_shadow_kernel_fine, pad_id=pad_id,
                          do_slab=_slab_mode(), ee=_ee_mode()),
        grid=(npad // bq,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  smem,
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  smem,
                  ospec(8)],
        out_specs=ospec(3),
        scratch_shapes=[
            pltpu.VMEM((2, 16, FINE_GROUP * SUB_BT), jnp.float32),
            pltpu.SMEM((8, c128), jnp.int32),
            pltpu.SemaphoreType.DMA((2, FINE_GROUP)),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((bq, 3), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
        ],
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.float32),
        interpret=INTERPRET,
    )(order_g, count, pack16f, sub8p, rays8)
    lg = lg[:, :n].T
    if sort:
        lg = lg[unperm]
    return lg


def _closest_epilogue(tri_pack10, org, dirn, t, col, n_tris: int):
    """(best-t, best PACK COLUMN) -> (t, tri, u, v, hit): u/v/orig-id
    are recomputed from one 10-row gather + the same 40-flop MT (the
    select epilogue in-kernel cost more than the whole MT at fine tile
    widths).  hit lanes recompute to the kernel's t (identical math/
    precision); misses carry col 0 and are masked by isfinite."""
    hit = jnp.isfinite(t)
    c10 = jnp.take(tri_pack10, col, axis=1)  # (10, n)
    v0c = c10[0:3].T
    e1c = c10[3:6].T
    e2c = c10[6:9].T
    pv = jnp.cross(dirn, e2c)
    det = jnp.sum(pv * e1c, axis=-1)
    invd = 1.0 / jnp.where(jnp.abs(det) < NEG_EPS, 1.0, det)
    tv = org - v0c
    u = jnp.sum(tv * pv, axis=-1) * invd
    qv = jnp.cross(tv, e1c)
    v = jnp.sum(dirn * qv, axis=-1) * invd
    t_re = jnp.sum(e2c * qv, axis=-1) * invd
    t = jnp.where(hit, t_re, jnp.inf)
    tri = jnp.minimum(c10[9].astype(jnp.int32), n_tris - 1)
    return (t, tri, u, v, hit)


@functools.partial(jax.jit, static_argnames=("n_tris", "presorted"))
def closest_hit_pallas(tri_pack10, cluster8, org, dirn, tmin, tmax,
                       n_tris: int, presorted: bool = False):
    """tri_pack10: (10, T) f32 (v0|e1|e2|orig_id); cluster8 (8, T//BT);
    org/dirn (N,3).  Returns (t, tri, u, v, hit) — tri in ORIGINAL ids.
    presorted: caller vouches the rays arrive spatially coherent
    (scanline camera rays) — skips the ~8 ms/262K-ray TPU argsort."""
    if n_tris <= TINY_TRIS:
        return _closest_hit_tiny(tri_pack10, org, dirn, tmin, tmax,
                                 n_tris=n_tris)
    n_cl = cluster8.shape[1]
    bt = tri_pack10.shape[1] // n_cl
    use_fb = n_cl >= FB_MIN_CLUSTERS
    if use_fb:
        # DMA-sliceable VMEM tiles need sublane counts aligned to 8:
        # pad the 10-row pack to 16 rows (rows 10:16 unused)
        pack16 = jnp.pad(tri_pack10, ((0, 6), (0, 0)))
        n_sc = tri_pack10.shape[1] // SUB_BT
        if _pairs_mode() and n_cl >= PAIRS_MIN_CLUSTERS:
            t, col = _closest_hit_pairs(tri_pack10, pack16, cluster8,
                                        org, dirn, tmin, tmax, n_tris)
        elif (_fine_mode() and FINE_GROUP <= n_sc <= MAX_FINE_SC
              and tri_pack10.shape[1] % SUB_BT == 0):
            t, col = _closest_fine_tcol(tri_pack10, pack16, org, dirn,
                                        tmin, tmax, n_tris,
                                        presorted=presorted)
        else:
            t, col = _closest_fb_tcol(tri_pack10, pack16, cluster8,
                                      org, dirn, tmin, tmax, n_tris,
                                      presorted=presorted)
        return _closest_epilogue(tri_pack10, org, dirn, t, col, n_tris)
    bq = _pick_bq(bt)
    rays8, n = _rays8_t([org, dirn, tmin, tmax], bq)
    npad = rays8.shape[1]
    qspec = lambda r: pl.BlockSpec((r, bq), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM)
    t, col = pl.pallas_call(
        _closest_kernel,
        grid=(npad // bq, n_cl),
        in_specs=[
            pl.BlockSpec((10, bt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cluster table
            qspec(8),
        ],
        out_specs=[qspec(1)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.int32),
        ],
        interpret=INTERPRET,
    )(tri_pack10, cluster8, rays8)
    return _closest_epilogue(tri_pack10, org, dirn, t[0, :n], col[0, :n],
                             n_tris)


SHADOW_KS = 24  # pair-path cap on per-ray listed clusters (shadow)


def _shadow_fb_lg(tri_pack10, pack16s, cluster8, org, dirn, dist,
                  n_tris: int, presorted: bool = False, dead=None,
                  ent=None):
    """Front-to-back streaming shadow sweep returning per-ray (N, 3)
    LOG transmission in ORIGINAL ray order.  `dead` rays sort to the
    tail (empty lists); `ent` is an optional precomputed per-ray entry
    matrix replacing the prelude slab sweep (pair-path reuse)."""
    n_cl = cluster8.shape[1]
    bt = tri_pack10.shape[1] // n_cl
    n = org.shape[0]
    sort = (not presorted) and n_cl >= SORT_MIN_CLUSTERS
    unperm = None
    if sort:
        perm, unperm = _ray_sort_perm(org, dirn, dead=dead)
        ray_pack = jnp.concatenate([org, dirn, dist[:, None]],
                                   axis=1)[perm]
        org, dirn, dist = (ray_pack[:, 0:3], ray_pack[:, 3:6],
                           ray_pack[:, 6])
        if ent is not None:
            ent = ent[perm]
    bq = _pick_bq(bt)
    rays8, _ = _rays8_t([org, dirn, jnp.zeros_like(dist), dist], bq)
    npad = rays8.shape[1]
    d = rays8[7]
    if ent is not None:
        ent_p = jnp.pad(ent, ((0, npad - n), (0, 0)),
                        constant_values=jnp.inf)
        order, count = _block_order_from_entries(
            ent_p, bq, d * (1.0 - 1e-4) - 5e-4)
        k_sub = 1
    else:
        n_sub = _pick_nsub(tri_pack10, bt)
        sub8 = (_sub_aabbs(tri_pack10, n_tris) if n_sub > 1 else None)
        order, count = _block_cluster_order(
            rays8[0:3].T, rays8[3:6].T, jnp.full_like(d, 5e-4),
            d * (1.0 - 1e-4) - 5e-4, cluster8, bq,
            sub8=sub8, n_sub=n_sub)
        k_sub = n_sub if _submask_mode() else 1
    order, c128 = _order_groups(order)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ospec = lambda r: pl.BlockSpec((r, bq), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    lg = pl.pallas_call(
        functools.partial(_shadow_kernel_stream,
                          do_slab=_slab_mode(), n_sub=k_sub),
        grid=(npad // bq,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),  # order HBM
                  smem,
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  smem,
                  ospec(8)],
        out_specs=ospec(3),
        scratch_shapes=[
            pltpu.VMEM((2, 16, bt), jnp.float32),
            pltpu.SMEM((8, c128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((bq, 3), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.float32),
        interpret=INTERPRET,
    )(order, count, pack16s, cluster8, rays8)
    lg = lg[:, :n].T
    if sort:
        lg = lg[unperm]
    return lg


def _shadow_transmission_pairs(tri_pack10, pack16s, cluster8, org, dirn,
                               dist, n_tris: int):
    """Pair-granular shadow transmission: rays whose (finite-dist)
    corridor lists <= SHADOW_KS clusters are handled entirely by one
    pair sweep (per-slot log transmission scatter-ADDED per ray); the
    rest — no caps apply to them — run the block sweep, sorted into
    dense straggler blocks.  Returns (N, 3) transmission."""
    n_cl = cluster8.shape[1]
    bt = tri_pack10.shape[1] // n_cl
    n = org.shape[0]
    tmin = jnp.full_like(dist, 5e-4)
    tmax = dist * (1.0 - 1e-4) - 5e-4
    n_sub = _pick_nsub(tri_pack10, bt)
    sub8 = _sub_aabbs(tri_pack10, n_tris) if n_sub > 1 else None
    ent = _ray_cluster_entries(org, dirn, tmin, tmax, cluster8,
                               sub8=sub8, n_sub=n_sub)
    ks = min(SHADOW_KS, n_cl)
    negv, idx = jax.lax.top_k(-ent, ks)
    fin = jnp.isfinite(negv)
    capable = (jnp.sum(jnp.isfinite(ent), axis=1) <= ks)
    valid = fin & capable[:, None]
    sray, scl, slotcl = _expand_pairs(idx, valid, n_cl)
    ray8 = jnp.concatenate(
        [org, dirn, tmin[:, None], tmax[:, None]], axis=1)[sray]
    vis = _pair_tables(scl, n_cl, PAIR_KB)
    (lg_s,) = _pairs_sweep(_pairs_shadow_kernel, pack16s, ray8, slotcl,
                           vis, bt, [(3, jnp.float32)])
    lg_s = jnp.where((scl < n_cl)[:, None], lg_s, 0.0)
    lg_ray = jnp.zeros((n, 3), jnp.float32).at[sray].add(
        lg_s, mode="drop")
    # stragglers (uncapped corridors) via the block sweep; killed rays'
    # negative dist makes an empty corridor -> log 0 -> transmission 1
    dist_fb = jnp.where(capable, -1.0, dist)
    lg_fb = _shadow_fb_lg(tri_pack10, pack16s, cluster8, org, dirn,
                          dist_fb, n_tris, dead=capable, ent=ent)
    return jnp.exp(lg_ray + lg_fb)


@functools.partial(jax.jit, static_argnames=("n_tris", "presorted"))
def shadow_transmission_pallas(tri_pack10, cluster8, filt4, org, dirn,
                               dist, n_tris: int,
                               presorted: bool = False):
    """filt4: (4, T) f32 rgb filter rows (in PACK order) + padding row.
    Returns (N, 3) transmission."""
    if n_tris <= TINY_TRIS:
        return _shadow_transmission_tiny(tri_pack10, filt4, org, dirn,
                                         dist, n_tris=n_tris)
    n_cl = cluster8.shape[1]
    bt = tri_pack10.shape[1] // n_cl
    use_fb = n_cl >= FB_MIN_CLUSTERS
    pad = tri_pack10.shape[1] - filt4.shape[1]
    if pad:
        # padded triangles never hit; filter value is irrelevant but keep 1
        filt4 = jnp.pad(filt4, ((0, 0), (0, pad)), constant_values=1.0)
    # per-tri log filter rows; -80 (exp -> flushed 0) marks opaque
    logf4 = jnp.maximum(jnp.log(jnp.maximum(filt4, 1e-35)), -80.0)
    if use_fb:
        # (16, T) streamed pack: tri rows 0:10 + rgb log-filter rows
        # 10:13 + padding to the 8-sublane DMA alignment
        pack16s = jnp.concatenate(
            [tri_pack10, logf4,
             jnp.zeros((2, tri_pack10.shape[1]), jnp.float32)], axis=0)
        n_sc = tri_pack10.shape[1] // SUB_BT
        if _pairs_mode() and n_cl >= PAIRS_MIN_CLUSTERS:
            return _shadow_transmission_pairs(
                tri_pack10, pack16s, cluster8, org, dirn, dist, n_tris)
        if (_fine_mode() and FINE_GROUP <= n_sc <= MAX_FINE_SC
                and tri_pack10.shape[1] % SUB_BT == 0):
            return jnp.exp(_shadow_fine_lg(
                tri_pack10, pack16s, org, dirn, dist, n_tris,
                presorted=presorted))
        return jnp.exp(_shadow_fb_lg(
            tri_pack10, pack16s, cluster8, org, dirn, dist, n_tris,
            presorted=presorted))
    bq = _pick_bq(bt)
    rays8, n = _rays8_t([org, dirn, jnp.zeros_like(dist), dist], bq)
    npad = rays8.shape[1]
    qspec = lambda r: pl.BlockSpec((r, bq), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM)
    tspec = lambda c: pl.BlockSpec((c, bt), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM)
    lg = pl.pallas_call(
        _shadow_kernel,
        grid=(npad // bq, n_cl),
        in_specs=[tspec(10),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  tspec(4), qspec(8)],
        out_specs=qspec(3),
        out_shape=jax.ShapeDtypeStruct((3, npad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, 3), jnp.float32)],
        interpret=INTERPRET,
    )(tri_pack10, cluster8, logf4, rays8)
    return jnp.exp(lg[:, :n].T)


# ---------------------------------------------------------------------------
# Tiny-scene kernels (n_tris <= TINY_TRIS): the round-1 design — per-
# triangle scalars statically unrolled against (ROWS, LANE)-tiled ray
# blocks, whole pack VMEM-resident, grid over ray blocks only.  For the
# 32-tri Cornell benchmark this measured ~15x faster per call than the
# clustered tile kernel (whose per-grid-step and reduction overheads
# dominate when the tile work is trivial); above TINY_TRIS the unrolled
# scalar code explodes Mosaic compile time and the clustered kernels win.
# ---------------------------------------------------------------------------

TINY_TRIS = 64
_T_LANE = 128
_T_ROWS = 32  # rays per block = _T_ROWS * _T_LANE


def _mt_test_scalar(tri9, k, ox, oy, oz, dx, dy, dz):
    """Möller-Trumbore test of one triangle (static column k of the
    (10, T) pack) against a (_T_ROWS, _T_LANE) ray tile."""
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


def _closest_kernel_tiny(tri_ref, org_ref, dir_ref, tlim_ref,
                         t_out, tri_out, u_out, v_out, *, n_tris: int):
    ox, oy, oz = org_ref[0], org_ref[1], org_ref[2]
    dx, dy, dz = dir_ref[0], dir_ref[1], dir_ref[2]
    tmin, tmax = tlim_ref[0], tlim_ref[1]
    best_t = jnp.full_like(tmax, jnp.inf)
    best_u = jnp.zeros_like(best_t)
    best_v = jnp.zeros_like(best_t)
    best_k = jnp.zeros_like(best_t, dtype=jnp.int32)
    for k in range(n_tris):
        t, u, v, ok = _mt_test_scalar(tri_ref, k, ox, oy, oz, dx, dy, dz)
        ok = ok & (t > tmin) & (t < best_t) & (t < tmax)
        best_t = jnp.where(ok, t, best_t)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
        best_k = jnp.where(ok, k, best_k)
    t_out[:, :] = best_t
    tri_out[:, :] = best_k
    u_out[:, :] = best_u
    v_out[:, :] = best_v


def _shadow_kernel_tiny(tri_ref, logf_ref, org_ref, dir_ref, dist_ref,
                        lg_out, *, n_tris: int):
    ox, oy, oz = org_ref[0], org_ref[1], org_ref[2]
    dx, dy, dz = dir_ref[0], dir_ref[1], dir_ref[2]
    dist = dist_ref[0]
    tmin = 5e-4
    tmax = dist * (1.0 - 1e-4) - 5e-4
    lg_r = jnp.zeros_like(ox)
    lg_g = jnp.zeros_like(ox)
    lg_b = jnp.zeros_like(ox)
    for k in range(n_tris):
        t, _, _, ok = _mt_test_scalar(tri_ref, k, ox, oy, oz, dx, dy, dz)
        okf = (ok & (t > tmin) & (t < tmax)).astype(jnp.float32)
        lg_r = lg_r + okf * logf_ref[0, k]
        lg_g = lg_g + okf * logf_ref[1, k]
        lg_b = lg_b + okf * logf_ref[2, k]
    lg_out[0] = lg_r
    lg_out[1] = lg_g
    lg_out[2] = lg_b


def _to_tiles_t(x):
    """(C, N) -> (C, M, _T_LANE) padded so M % _T_ROWS == 0."""
    c, n = x.shape
    m = -(-n // _T_LANE)
    m = -(-m // _T_ROWS) * _T_ROWS
    pad = m * _T_LANE - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x.reshape(c, m, _T_LANE), n


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _closest_hit_tiny(tri_pack10, org, dirn, tmin, tmax, n_tris: int):
    org_t, n = _to_tiles_t(org.T)
    dir_t, _ = _to_tiles_t(dirn.T)
    tlim, _ = _to_tiles_t(jnp.stack([tmin, tmax], axis=0))
    m = org_t.shape[1]
    grid = (m // _T_ROWS,)
    kernel = functools.partial(_closest_kernel_tiny, n_tris=n_tris)
    rspec = lambda c: pl.BlockSpec((c, _T_ROWS, _T_LANE),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((_T_ROWS, _T_LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  rspec(3), rspec(3), rspec(2)],
        out_specs=[ospec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((m, _T_LANE), jnp.float32),
            jax.ShapeDtypeStruct((m, _T_LANE), jnp.int32),
            jax.ShapeDtypeStruct((m, _T_LANE), jnp.float32),
            jax.ShapeDtypeStruct((m, _T_LANE), jnp.float32),
        ],
        interpret=INTERPRET,
    )(tri_pack10, org_t, dir_t, tlim)
    t = t.reshape(-1)[:n]
    return (t, tri.reshape(-1)[:n], u.reshape(-1)[:n], v.reshape(-1)[:n],
            jnp.isfinite(t))


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _shadow_transmission_tiny(tri_pack10, filt4, org, dirn, dist,
                              n_tris: int):
    org_t, n = _to_tiles_t(org.T)
    dir_t, _ = _to_tiles_t(dirn.T)
    dist_t, _ = _to_tiles_t(dist[None, :])
    m = org_t.shape[1]
    grid = (m // _T_ROWS,)
    logf4 = jnp.maximum(jnp.log(jnp.maximum(filt4, 1e-35)), -80.0)
    kernel = functools.partial(_shadow_kernel_tiny, n_tris=n_tris)
    rspec = lambda c: pl.BlockSpec((c, _T_ROWS, _T_LANE),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    lg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  rspec(3), rspec(3), rspec(1)],
        out_specs=pl.BlockSpec((3, _T_ROWS, _T_LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, m, _T_LANE), jnp.float32),
        interpret=INTERPRET,
    )(tri_pack10, logf4, org_t, dir_t, dist_t)
    return jnp.exp(lg.reshape(3, -1)[:, :n].T)
