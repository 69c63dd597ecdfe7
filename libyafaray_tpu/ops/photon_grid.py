"""Photon storage + density gather via a sorted spatial hash grid.

Reference roles replaced (SURVEY §2.3):
  * `kdtree::pointKdTree<photon_t>::lookup` k-NN max-heap search
  * `hashGrid_t` (SPPM hitpoint flux scatter)

TPU-native design: photons are SORTED BY CELL HASH once per map build
(argsort — a few million uint32 keys, fine on device), giving contiguous
cell runs addressed by vectorized binary search.  A fixed-radius gather
visits the 27 neighbor cells with a static unrolled loop and a bounded
per-cell scan (masked), which replaces both the kd k-NN (density estimates
use the fixed search radius the reference caps k-NN with) and the SPPM
hash-grid scatter (scatter is re-formulated as gather from the hitpoint
side — mathematically identical, and contention-free).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_PER_CELL = 64  # photons examined per cell per gather (masked scan)


def _cell_coords(p, bmin, inv_cell):
    return jnp.floor((p - bmin) * inv_cell).astype(jnp.int32)


def _cell_hash(c, table_size):
    """Spatial hash of integer cell coords (Teschner-style primes)."""
    h = (
        c[..., 0].astype(jnp.uint32) * jnp.uint32(73856093)
        ^ c[..., 1].astype(jnp.uint32) * jnp.uint32(19349663)
        ^ c[..., 2].astype(jnp.uint32) * jnp.uint32(83492791)
    )
    return (h % jnp.uint32(table_size)).astype(jnp.uint32)


def build_photon_grid(pos, valid, cell_size: float, bmin, extra: dict,
                      table_size: int | None = None) -> dict:
    """Sort photons (and any `extra` per-photon arrays) by cell hash.

    pos: (P,3); valid: (P,) bool — invalid photons are sorted to a
    sentinel bucket (table_size) and never match a query.
    Returns grid dict with sorted arrays + 'starts' (searchsorted per query).
    """
    p = pos.shape[0]
    if table_size is None:
        table_size = max(64, int(2 ** (int(p).bit_length())))
    inv_cell = jnp.float32(1.0 / cell_size)
    bmin = jnp.asarray(bmin, jnp.float32)
    cells = _cell_coords(pos, bmin, inv_cell)
    h = _cell_hash(cells, table_size)
    h = jnp.where(valid, h, jnp.uint32(table_size))  # park invalid at end
    order = jnp.argsort(h)
    out = dict(
        hash_sorted=h[order],
        pos=pos[order],
        valid=valid[order],
        bmin=bmin,
        inv_cell=inv_cell,
        table_size=table_size,
        cell_size=jnp.float32(cell_size),
    )
    for k, v in extra.items():
        out[k] = v[order]
    # Single-gather pack (TPU gathers cost ~1 ms each regardless of width;
    # per-field per-photon gathers made one lookup ~2 s and tripped the TPU
    # execution watchdog).  Columns: [hash, valid, pos(3), extra... in
    # sorted-key order].  Hash values < table_size <= 2^24 are exact in f32,
    # so the run-membership equality test stays exact.
    cols = [out["hash_sorted"].astype(jnp.float32)[:, None],
            out["valid"].astype(jnp.float32)[:, None],
            out["pos"]]
    for k in sorted(extra.keys()):
        v = out[k]
        cols.append(v[:, None].astype(jnp.float32) if v.ndim == 1
                    else v.astype(jnp.float32))
    out["pack"] = jnp.concatenate(cols, axis=1)
    return out


_NEIGHBOR_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
]


def gather_photons(grid: dict, query_p, radius, accumulate_fn, init,
                   max_per_cell: int = MAX_PER_CELL):
    """Visit photons within `radius` (scalar or (N,) per-query) of each
    query point and fold them with `accumulate_fn`.

    CONTRACT: radius <= grid cell_size — only the +/-1 cell neighborhood
    (27 cells) is visited, so larger query radii silently miss photons.
    Build the grid with cell_size = the largest radius it will serve.

    accumulate_fn(carry, photon: dict(pos=..., d2=..., <extra keys>...),
    w_mask) -> carry, where each photon field is (N, K, ...) — the K =
    max_per_cell candidates of one neighbor cell — and w_mask (N, K) is
    1.0 inside the radius else 0.0.  The fold runs once per neighbor cell
    (27 `lax.scan` steps), each fetching its whole K-photon run with ONE
    batched gather of the (P, C) pack — per-photon fori-loop gathers cost
    ~1.3 ms each on TPU (27 x 64 of them = seconds per lookup, long
    enough that the fused program trips the TPU execution watchdog).
    init: initial carry (pytree of (N, ...) arrays).
    """
    n = query_p.shape[0]
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (n,))
    r2 = radius * radius
    qc = _cell_coords(query_p, grid["bmin"], grid["inv_cell"])
    hs = grid["hash_sorted"]
    extra_keys = sorted(
        k for k in grid
        if k not in ("hash_sorted", "pos", "valid", "bmin", "inv_cell",
                     "table_size", "cell_size", "pack"))
    # static pack column layout (mirrors build_photon_grid)
    col = 5
    layout = {}
    for k in extra_keys:
        nc = 1 if grid[k].ndim == 1 else grid[k].shape[1]
        layout[k] = (col, nc)
        col += nc
    p_total = hs.shape[0]
    kk = max_per_cell

    offsets = jnp.asarray(_NEIGHBOR_OFFSETS, jnp.int32)  # (27, 3)

    def per_offset(carry, off):
        c = qc + off
        h = _cell_hash(c, grid["table_size"])
        start = jnp.searchsorted(hs, h, side="left").astype(jnp.int32)
        idx = start[:, None] + jnp.arange(kk, dtype=jnp.int32)  # (N, K)
        in_bounds = idx < p_total
        rows = grid["pack"][jnp.minimum(idx, p_total - 1)]  # (N, K, C)
        in_run = in_bounds & (rows[..., 0] == h.astype(jnp.float32)[:, None])
        pvalid = rows[..., 1] > 0.0
        ppos = rows[..., 2:5]
        # exact cell membership: when two of the 27 neighbor offsets hash
        # to the SAME bucket, the same sorted run is scanned twice — the
        # coordinate test (recomputed from photon pos exactly as at build)
        # keeps each photon counted once, for the one offset whose cell it
        # actually lies in (hash equality alone double-counts its flux)
        pcell = _cell_coords(ppos, grid["bmin"], grid["inv_cell"])
        in_cell = jnp.all(pcell == c[:, None, :], axis=-1)
        d = ppos - query_p[:, None, :]
        d2 = jnp.sum(d * d, axis=-1)
        w = jnp.where(in_run & in_cell & pvalid & (d2 <= r2[:, None]),
                      1.0, 0.0)
        photon = {}
        for k2 in extra_keys:
            c0, nc = layout[k2]
            v = rows[..., c0:c0 + nc]
            photon[k2] = v[..., 0] if grid[k2].ndim == 1 else v
        photon["pos"] = ppos
        photon["d2"] = d2
        return accumulate_fn(carry, photon, w), None

    carry, _ = jax.lax.scan(per_offset, init, offsets)
    return carry


def density_estimate(grid: dict, query_p, query_n, radius,
                     max_per_cell: int = MAX_PER_CELL):
    """Photon-map radiance numerator: Σ Φ_i over photons within radius whose
    incoming direction is on the query normal's side (the reference's
    simple-kernel estimate; caller divides by π r² and applies the BSDF).
    Returns (flux_sum (N,3), count (N,))."""

    def acc(carry, ph, w):
        flux, cnt = carry
        # front-side check: photon stored with incoming direction `dir`
        side = jnp.sum(ph["dir"] * query_n[:, None, :], axis=-1) > 0.0
        w = w * side.astype(jnp.float32)  # (N, K)
        return (flux + jnp.sum(w[..., None] * ph["power"], axis=1),
                cnt + jnp.sum(w, axis=1))

    n = query_p.shape[0]
    return gather_photons(
        grid, query_p, radius, acc,
        (jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.float32)),
        max_per_cell,
    )


def nearest_photon(grid: dict, query_p, radius, value_key: str,
                   max_per_cell: int = MAX_PER_CELL):
    """Nearest-photon lookup (radiance-map final gather).  Returns
    (value (N,3), found (N,))."""

    def acc(carry, ph, w):
        best_d2, val = carry
        # reduce this cell's K candidates, then fold into the carry
        d2m = jnp.where(w > 0.0, ph["d2"], jnp.inf)  # (N, K)
        ksel = jnp.argmin(d2m, axis=1)
        d2_best = jnp.take_along_axis(d2m, ksel[:, None], 1)[:, 0]
        v_best = jnp.take_along_axis(ph[value_key], ksel[:, None, None],
                                     1)[:, 0, :]
        better = d2_best < best_d2
        best_d2 = jnp.where(better, d2_best, best_d2)
        val = jnp.where(better[..., None], v_best, val)
        return best_d2, val

    n = query_p.shape[0]
    best_d2, val = gather_photons(
        grid, query_p, radius, acc,
        (jnp.full((n,), jnp.inf, jnp.float32),
         jnp.zeros((n, 3), jnp.float32)),
        max_per_cell,
    )
    return val, jnp.isfinite(best_d2)
