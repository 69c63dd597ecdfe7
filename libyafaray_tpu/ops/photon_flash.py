"""Flash-style Pallas TPU kernels for photon density / nearest lookups.

Reference roles replaced (SURVEY §2.3): `kdtree::pointKdTree<photon_t>::
lookup` (k-NN density + radiance-map nearest) and `hashGrid_t::gather`
(SPPM flux transfer).  Round-1 used a sorted spatial hash grid with row
gathers (`ops/photon_grid.py`); TPU gathers move ~5 GB/s, making one 16K-
query lookup cost 260-880 ms — the measured bottleneck of the photon
integrators (VERDICT r1 weak #2).

TPU-native insight: a photon map of even a few hundred thousand photons is
VMEM-scale data (350K x 10 f32 = 14 MB), and a fixed-radius density
estimate is an "attention" pattern —

    flux_q = sum_p [ |q-p|^2 <= r^2 ] * [ n_q . dir_p > 0 ] * power_p

So: brute force over ALL photons with flash-attention blocking (query
blocks x photon blocks on a sequential grid).  The (BQ, BP) distance /
side tiles are computed on the VPU from explicit coordinate broadcasts
(exact f32 — an MXU formulation of |q-p|^2 via -2q.p + |p|^2 needs
precision=HIGHEST to survive the cancellation, which triples runtime and
exploded Mosaic compile time); only the flux accumulation W @ power rides
the MXU, where bf16 input rounding (~0.4%) is far below photon noise.
The indicator tile W never leaves VMEM.

This is EXACT in the radius test (no per-cell candidate cap, no
cell-size/radius contract like the hash grid had) and 5-30x faster than
the gather design.  Invalid photons carry a sentinel position (1e9) so
d2 overflows every radius test.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256   # queries per block
BP = 512   # photons per block
INTERPRET = False
SENTINEL = 1.0e9  # invalid-photon position -> d2 ~ 1e18 fails any r2


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


def make_photon_pack(pos, valid, direction, value) -> dict:
    """Device-side photon pack for the flash kernels.

    pos (P,3); valid (P,) bool; direction (P,3) — the stored incoming
    direction (toward where the photon came from) used for the front-side
    test, or any unit field for packs that skip it; value (P,3) — flux
    (density) or radiance (nearest).  P is padded to a BP multiple.

    Layout: transposed (3, P) so a (c, BP) block is c sublanes x 128-lane
    tiles (pos rows broadcast against query columns on the VPU).
    """
    p = pos.shape[0]
    pad = (-p) % BP
    if pad:
        z3 = ((0, pad), (0, 0))
        pos = jnp.pad(pos, z3)
        direction = jnp.pad(direction, z3)
        value = jnp.pad(value, z3)
        valid = jnp.pad(valid, (0, pad))
    pos = jnp.where(valid[:, None], pos, SENTINEL)
    # NOTE: packs must be passed as jit ARGUMENTS, never closed over — a
    # closure array is baked into the HLO as a literal and Mosaic compile
    # time grows quadratically in P (measured: 0.6s as arg, minutes as
    # 350K-photon constant).
    return dict(
        pos_t=pos.astype(jnp.float32).T,          # (3, P')
        aux_t=direction.astype(jnp.float32).T,    # (3, P')
        val=value.astype(jnp.float32),            # (P', 3)
    )


def _pad_queries(qp, extra, pad_val=0.0):
    n = qp.shape[0]
    pad = (-n) % BQ
    if pad:
        qp = jnp.pad(qp, ((0, pad), (0, 0)), constant_values=pad_val)
        extra = [jnp.pad(e, ((0, pad),) + ((0, 0),) * (e.ndim - 1))
                 for e in extra]
    return qp.astype(jnp.float32), extra, n


def _r2_col(radius, n):
    r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (n,))
    return (r * r)[:, None]


def _d2_tile(qp_ref, pos_ref):
    """(BQ, BP) squared distances: explicit per-axis broadcasts (VPU)."""
    dx = qp_ref[:, 0:1] - pos_ref[0:1, :]
    dy = qp_ref[:, 1:2] - pos_ref[1:2, :]
    dz = qp_ref[:, 2:3] - pos_ref[2:3, :]
    return dx * dx + dy * dy + dz * dz


def _density_kernel(qp_ref, qn_ref, r2_ref, pos_ref, dir_ref, val_ref,
                    flux_out, cnt_out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        flux_out[:] = jnp.zeros_like(flux_out)
        cnt_out[:] = jnp.zeros_like(cnt_out)

    d2 = _d2_tile(qp_ref, pos_ref)
    side = (qn_ref[:, 0:1] * dir_ref[0:1, :]
            + qn_ref[:, 1:2] * dir_ref[1:2, :]
            + qn_ref[:, 2:3] * dir_ref[2:3, :])
    w = ((d2 <= r2_ref[:]) & (side > 0.0)).astype(jnp.float32)
    flux_out[:] += jnp.dot(w, val_ref[:],
                           preferred_element_type=jnp.float32)
    cnt_out[:] += jnp.sum(w, axis=1, keepdims=True)


def _nearest_kernel(qp_ref, r2_ref, pos_ref, val_ref, best_out, val_out):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_out[:] = jnp.full_like(best_out, jnp.inf)
        val_out[:] = jnp.zeros_like(val_out)

    d2 = _d2_tile(qp_ref, pos_ref)
    m = jnp.min(d2, axis=1, keepdims=True)                     # (BQ, 1)
    onehot = (d2 <= m).astype(jnp.float32)
    # ties are broadcast: normalize so the value stays an average of the
    # tied photons rather than a sum (exact duplicates only)
    onehot = onehot / jnp.maximum(
        jnp.sum(onehot, axis=1, keepdims=True), 1.0)
    v = jnp.dot(onehot, val_ref[:], preferred_element_type=jnp.float32)
    better = (m < best_out[:]) & (m <= r2_ref[:])
    best_out[:] = jnp.where(better, m, best_out[:])
    val_out[:] = jnp.where(better, v, val_out[:])


def density_flash(pack: dict, query_p, query_n, radius):
    """Σ Φ_i over photons within `radius` (scalar or (N,)) of each query,
    front side only.  Returns (flux (N,3), count (N,))."""
    r2 = _r2_col(radius, query_p.shape[0])
    qp, (qn, r2), n = _pad_queries(query_p, [query_n.astype(jnp.float32),
                                             r2], pad_val=-SENTINEL)
    if not _use_pallas():
        return _density_ref(pack, qp, qn, r2, n)
    p_pad = pack["pos_t"].shape[1]
    grid = (qp.shape[0] // BQ, p_pad // BP)
    qspec = lambda c: pl.BlockSpec((BQ, c), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    pspec = lambda c: pl.BlockSpec((c, BP), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM)
    flux, cnt = pl.pallas_call(
        _density_kernel,
        grid=grid,
        in_specs=[qspec(3), qspec(3), qspec(1),
                  pspec(3), pspec(3),
                  pl.BlockSpec((BP, 3), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[qspec(3), qspec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], 3), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.float32),
        ],
        interpret=INTERPRET,
    )(qp, qn, r2, pack["pos_t"], pack["aux_t"], pack["val"])
    return flux[:n], cnt[:n, 0]


def nearest_flash(pack: dict, query_p, radius):
    """Value of the nearest photon within `radius` of each query.
    Returns (value (N,3), found (N,))."""
    r2 = _r2_col(radius, query_p.shape[0])
    qp, (r2,), n = _pad_queries(query_p, [r2], pad_val=-SENTINEL)
    if not _use_pallas():
        return _nearest_ref(pack, qp, r2, n)
    p_pad = pack["pos_t"].shape[1]
    grid = (qp.shape[0] // BQ, p_pad // BP)
    qspec = lambda c: pl.BlockSpec((BQ, c), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    best, val = pl.pallas_call(
        _nearest_kernel,
        grid=grid,
        in_specs=[qspec(3), qspec(1),
                  pl.BlockSpec((3, BP), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BP, 3), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[qspec(1), qspec(3)],
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], 3), jnp.float32),
        ],
        interpret=INTERPRET,
    )(qp, r2, pack["pos_t"], pack["val"])
    return val[:n], jnp.isfinite(best[:n, 0])


# ---- XLA reference path (CPU backend / validation): same math, photon
# blocks under lax.scan so the (N, BP) indicator tile never hits HBM whole.

def _density_ref(pack, qp, qn, r2, n):
    p_pad = pack["pos_t"].shape[1]
    pos = pack["pos_t"].T.reshape(p_pad // BP, BP, 3)
    dirs = pack["aux_t"].T.reshape(p_pad // BP, BP, 3)
    vals = pack["val"].reshape(p_pad // BP, BP, 3)

    def body(carry, blk):
        flux, cnt = carry
        pp, dr, vl = blk
        d2 = jnp.sum((qp[:, None, :] - pp[None]) ** 2, axis=-1)
        side = qn @ dr.T
        w = ((d2 <= r2) & (side > 0.0)).astype(jnp.float32)
        return (flux + w @ vl, cnt + jnp.sum(w, axis=1)), None

    (flux, cnt), _ = jax.lax.scan(
        body,
        (jnp.zeros((qp.shape[0], 3), jnp.float32),
         jnp.zeros((qp.shape[0],), jnp.float32)),
        (pos, dirs, vals))
    return flux[:n], cnt[:n]


def _nearest_ref(pack, qp, r2, n):
    p_pad = pack["pos_t"].shape[1]
    pos = pack["pos_t"].T.reshape(p_pad // BP, BP, 3)
    vals = pack["val"].reshape(p_pad // BP, BP, 3)

    def body(carry, blk):
        best, val = carry
        pp, vl = blk
        d2 = jnp.sum((qp[:, None, :] - pp[None]) ** 2, axis=-1)
        m = jnp.min(d2, axis=1, keepdims=True)
        onehot = (d2 <= m).astype(jnp.float32)
        onehot = onehot / jnp.maximum(
            jnp.sum(onehot, axis=1, keepdims=True), 1.0)
        v = onehot @ vl
        better = (m < best) & (m <= r2)
        return (jnp.where(better, m, best),
                jnp.where(better, v, val)), None

    (best, val), _ = jax.lax.scan(
        body,
        (jnp.full((qp.shape[0], 1), jnp.inf, jnp.float32),
         jnp.zeros((qp.shape[0], 3), jnp.float32)),
        (pos, vals))
    return val[:n], jnp.isfinite(best[:n, 0])


# ---------------------------------------------------------------------------
# Morton-culled gather (r4, VERDICT r3 #3): the flash sweep is exact
# O(N·M) — perfect at 0.2-1M photons, but the reference holds 10^6-10^7
# (SURVEY §5.7) and at 10M the (Q/BQ, P/BP) grid alone is ~5M steps.
# Scale path: sort photons by Morton code into BP-wide clusters with
# AABBs, sort queries the same way, and per query block DMA-stream ONLY
# the clusters whose box is within the block's max gather radius — the
# same streaming-list trick as ops/pallas_intersect, radius-disc instead
# of ray-corridor.  Exact: a photon within radius r of a query q lies in
# a cluster whose AABB is within r of q, hence within rmax(block) of the
# block's query box.
# ---------------------------------------------------------------------------

def _spread3(x):
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _morton_points(p, lo, hi):
    q = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0,
                 0.0, 1023.0).astype(jnp.uint32)
    return (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
            | (_spread3(q[:, 2]) << 2))


def make_photon_pack_sorted(pos, valid, direction, value) -> dict:
    """Morton-sorted photon pack + per-cluster AABBs for the culled
    gather.  Same contract as make_photon_pack (pass as jit ARGS)."""
    pos = pos.astype(jnp.float32)
    lo = jnp.min(jnp.where(valid[:, None], pos, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], pos, -jnp.inf), axis=0)
    key = jnp.where(valid, _morton_points(pos, lo, hi),
                    jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(key)
    pos, direction = pos[perm], direction.astype(jnp.float32)[perm]
    value, valid = value.astype(jnp.float32)[perm], valid[perm]
    p = pos.shape[0]
    pad = (-p) % BP
    if pad:
        z3 = ((0, pad), (0, 0))
        pos = jnp.pad(pos, z3)
        direction = jnp.pad(direction, z3)
        value = jnp.pad(value, z3)
        valid = jnp.pad(valid, (0, pad))
    posv = jnp.where(valid[:, None], pos, SENTINEL)
    c = posv.shape[0] // BP
    lo_c = jnp.min(jnp.where(valid[:, None], pos, jnp.inf)
                   .reshape(c, BP, 3), axis=1)
    hi_c = jnp.max(jnp.where(valid[:, None], pos, -jnp.inf)
                   .reshape(c, BP, 3), axis=1)
    # one streamable (16, P') table: rows 0:3 pos, 3:6 dir, 6:9 value
    tbl = jnp.concatenate([
        posv.T, direction.T, value.T,
        jnp.zeros((7, posv.shape[0]), jnp.float32)], axis=0)
    return dict(tbl=tbl, cl_lo=lo_c, cl_hi=hi_c,
                n_valid=jnp.sum(valid.astype(jnp.int32)))


def _q8(query_p, query_n, r2):
    """(8, NQ') transposed query rows [x y z nx ny nz r2 pad], padded to
    a BQ multiple with far-sentinel positions."""
    n = query_p.shape[0]
    pad = (-n) % BQ
    qp = jnp.pad(query_p.astype(jnp.float32), ((0, pad), (0, 0)),
                 constant_values=-SENTINEL)
    qn = jnp.pad(query_n.astype(jnp.float32), ((0, pad), (0, 0)))
    r2p = jnp.pad(r2[:, 0], (0, pad))
    return jnp.concatenate([qp.T, qn.T, r2p[None],
                            jnp.zeros((1, qp.shape[0]), jnp.float32)],
                           axis=0), n


def _density_kernel_culled(order_hbm, count_ref, tbl_hbm, q_ref,
                           flux_out, cnt_out,
                           tile_buf, ord_smem, sems, osem):
    i = pl.program_id(0)
    cnt = count_ref[i]
    sub = i % 8

    @pl.when(sub == 0)
    def _():
        ocp = pltpu.make_async_copy(order_hbm.at[i // 8], ord_smem, osem)
        ocp.start()
        ocp.wait()

    q = q_ref[...].T                       # (BQ, 8)
    qp, qn, r2 = q[:, 0:3], q[:, 3:6], q[:, 6:7]
    flux_out[:] = jnp.zeros_like(flux_out)
    cnt_out[:] = jnp.zeros_like(cnt_out)
    cmax = ord_smem.shape[1] - 1

    def get_dma(slot, j):
        cid = ord_smem[sub, jnp.minimum(j, cmax)]
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(cid * BP, BP)],
            tile_buf.at[slot], sems.at[slot])

    def process(slot, j):
        t = tile_buf[slot]
        dx = qp[:, 0:1] - t[0:1, :]
        dy = qp[:, 1:2] - t[1:2, :]
        dz = qp[:, 2:3] - t[2:3, :]
        d2 = dx * dx + dy * dy + dz * dz
        side = (qn[:, 0:1] * t[3:4, :] + qn[:, 1:2] * t[4:5, :]
                + qn[:, 2:3] * t[5:6, :])
        wgt = ((d2 <= r2) & (side > 0.0)).astype(jnp.float32)
        flux_out[:] += jnp.dot(wgt, t[6:9, :].T,
                               preferred_element_type=jnp.float32)
        cnt_out[:] += jnp.sum(wgt, axis=1, keepdims=True)

    from .pallas_intersect import _stream_pipeline

    _stream_pipeline(cnt, get_dma, process)


def density_culled(pack: dict, query_p, query_n, radius):
    """density_flash semantics via per-block cluster culling — the
    photon-count-scalable path (use for packs above ~1M photons)."""
    nq = query_p.shape[0]
    r2 = _r2_col(radius, nq)
    # sort queries along the same Morton curve so blocks are compact
    lo = jnp.min(pack["cl_lo"], axis=0)
    hi = jnp.max(pack["cl_hi"], axis=0)
    qkey = _morton_points(query_p.astype(jnp.float32), lo, hi)
    perm = jnp.argsort(qkey)
    q8, _ = _q8(query_p[perm], query_n[perm], r2[perm])
    npad = q8.shape[1]
    b = npad // BQ
    # per-block query AABB + max radius
    qs = q8[0:3].T.reshape(b, BQ, 3)
    live = q8[0:3].T.reshape(b, BQ, 3)[..., 0] > -SENTINEL * 0.5
    qlo = jnp.min(jnp.where(live[..., None], qs, jnp.inf), axis=1)
    qhi = jnp.max(jnp.where(live[..., None], qs, -jnp.inf), axis=1)
    rmax2 = jnp.max(q8[6].reshape(b, BQ), axis=1)           # (B,)
    # block-box to cluster-box squared distance
    dd = jnp.maximum(
        jnp.maximum(pack["cl_lo"][None] - qhi[:, None], 0.0),
        jnp.maximum(qlo[:, None] - pack["cl_hi"][None], 0.0))  # (B,C,3)
    d2 = jnp.sum(dd * dd, axis=-1)
    key = jnp.where(d2 <= rmax2[:, None], d2, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    count = jnp.sum(jnp.isfinite(key), axis=1).astype(jnp.int32)
    # dead tail -> repeat the last live id (no refetch, never matches)
    jidx = jax.lax.broadcasted_iota(jnp.int32, order.shape, 1)
    last = jnp.take_along_axis(order,
                               jnp.maximum(count - 1, 0)[:, None], axis=1)
    order = jnp.where(jidx < jnp.maximum(count, 1)[:, None], order, last)
    from .pallas_intersect import _order_groups

    order_g, c128 = _order_groups(order)
    qspec = pl.BlockSpec((8, BQ), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    ospec = lambda c: pl.BlockSpec((BQ, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    flux, cnt = pl.pallas_call(
        _density_kernel_culled,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  qspec],
        out_specs=[ospec(3), ospec(1)],
        scratch_shapes=[
            pltpu.VMEM((2, 16, BP), jnp.float32),
            pltpu.SMEM((8, c128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 3), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        interpret=INTERPRET,
    )(order_g, count, pack["tbl"], q8)
    unperm = jnp.argsort(perm)
    return flux[:nq][unperm], cnt[:nq, 0][unperm]


CULL_MIN_PHOTONS = 1 << 20  # packs >= ~1M photons stream culled clusters


def make_photon_pack_auto(pos, valid, direction, value) -> dict:
    """Pack for `density_auto`: the exact flash layout at practical
    budgets, the Morton-culled layout at reference-scale ones (the
    O(N*M) sweep's grid alone is millions of steps at 10M photons)."""
    if pos.shape[0] >= CULL_MIN_PHOTONS and (_use_pallas() or INTERPRET):
        return make_photon_pack_sorted(pos, valid, direction, value)
    return make_photon_pack(pos, valid, direction, value)


def density_auto(pack: dict, query_p, query_n, radius):
    """Dispatch density gather on the pack layout (see
    make_photon_pack_auto)."""
    if "tbl" in pack:
        return density_culled(pack, query_p, query_n, radius)
    return density_flash(pack, query_p, query_n, radius)
