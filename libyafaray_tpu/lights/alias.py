"""Walker/Vose alias tables — O(1) discrete sampling for the IBL
environment CDF (reference src/lights/bglight.cc builds marginal +
conditional CDFs and bisects per sample; SURVEY §2.6).

TPU-native rationale: the two binary searches cost ~21 data-dependent
scalar gathers per NEE sample (measured as the dominant term of the IBL
config's step time — random gathers are the VPU's weakest op), while an
alias lookup is 2 gathers (prob + alias) regardless of table size.  The
table is built once per scene compile on the host.

The inversion u -> (cell, in-cell offset) stays unbiased: the coin that
picks primary vs alias is rescaled to a fresh uniform conditional on the
branch (standard alias-method remainder reuse).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def build_alias_table(weights: np.ndarray):
    """weights: (N,) nonnegative.  Returns (prob (N,) f32, alias (N,) i32)
    such that drawing i = floor(u*N), taking i if frac < prob[i] else
    alias[i], yields P(k) = weights[k] / sum(weights)."""
    w = np.asarray(weights, np.float64).ravel()
    n = w.size
    total = w.sum()
    if not np.isfinite(total) or total <= 0.0:
        return (np.ones(n, np.float32), np.arange(n, dtype=np.int32))
    scaled = w * (n / total)
    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int32)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        if scaled[l] < 1.0:
            small.append(l)
        else:
            large.append(l)
    for i in small + large:
        prob[i] = 1.0
    return prob.astype(np.float32), alias


def sample_alias(prob, alias, u):
    """Vectorized draw: u (L,) in [0,1) -> (cell (L,) i32, u_rest (L,) f32)
    where u_rest is a fresh uniform (the rescaled coin) usable for an
    in-cell jitter coordinate."""
    n = prob.shape[0]
    z = jnp.clip(u * n, 0.0, n * (1.0 - 1e-7))
    i = z.astype(jnp.int32)
    coin = z - i.astype(jnp.float32)
    p = prob[i]
    take_alias = coin >= p
    cell = jnp.where(take_alias, alias[i], i)
    # conditional re-uniformize: coin | coin<p ~ U[0,p); coin | coin>=p
    # ~ U[p,1) -> map both back to U[0,1)
    u_rest = jnp.where(take_alias,
                       (coin - p) / jnp.maximum(1.0 - p, 1e-12),
                       coin / jnp.maximum(p, 1e-12))
    return cell, jnp.clip(u_rest, 0.0, 1.0 - 1e-7)
