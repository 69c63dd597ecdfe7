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
    return out


_NEIGHBOR_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
]


def gather_photons(grid: dict, query_p, radius, accumulate_fn, init,
                   max_per_cell: int = MAX_PER_CELL):
    """Visit photons within `radius` (scalar or (N,) per-query) of each
    query point and fold them with `accumulate_fn`.

    accumulate_fn(carry, photon: dict(pos=..., <extra keys>...), w_mask)
      -> carry, where w_mask (N,) is 1.0 inside the radius else 0.0.
    init: initial carry (pytree of (N, ...) arrays).
    """
    n = query_p.shape[0]
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (n,))
    r2 = radius * radius
    qc = _cell_coords(query_p, grid["bmin"], grid["inv_cell"])
    hs = grid["hash_sorted"]
    extra_keys = [k for k in grid
                  if k not in ("hash_sorted", "pos", "valid", "bmin",
                               "inv_cell", "table_size", "cell_size")]
    p_total = hs.shape[0]

    offsets = jnp.asarray(_NEIGHBOR_OFFSETS, jnp.int32)  # (27, 3)

    def per_offset(carry, off):
        c = qc + off
        h = _cell_hash(c, grid["table_size"])
        start = jnp.searchsorted(hs, h, side="left").astype(jnp.int32)

        def scan_cell(k, inner):
            carry = inner
            idx = jnp.minimum(start + k, p_total - 1)
            in_run = (start + k < p_total) & (hs[idx] == h)
            ppos = grid["pos"][idx]
            d = ppos - query_p
            d2 = jnp.sum(d * d, axis=-1)
            w = jnp.where(in_run & grid["valid"][idx] & (d2 <= r2),
                          1.0, 0.0)
            photon = {k2: grid[k2][idx] for k2 in extra_keys}
            photon["pos"] = ppos
            photon["d2"] = d2
            return accumulate_fn(carry, photon, w)

        carry = jax.lax.fori_loop(0, max_per_cell, scan_cell, carry)
        return carry, None

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
        side = jnp.sum(ph["dir"] * query_n, axis=-1) > 0.0
        w = w * side.astype(jnp.float32)
        return flux + w[..., None] * ph["power"], cnt + w

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
        better = (w > 0.0) & (ph["d2"] < best_d2)
        best_d2 = jnp.where(better, ph["d2"], best_d2)
        val = jnp.where(better[..., None], ph[value_key], val)
        return best_d2, val

    n = query_p.shape[0]
    best_d2, val = gather_photons(
        grid, query_p, radius, acc,
        (jnp.full((n,), jnp.inf, jnp.float32),
         jnp.zeros((n, 3), jnp.float32)),
        max_per_cell,
    )
    return val, jnp.isfinite(best_d2)
