"""QMC sampling — hash-based Owen-scrambled Sobol (0,2) pairs, lane-wise.

Reference semantics (SURVEY §2.1 mcqmc.h + App. D): the reference uses
scrambled Halton with Faure permutations and a per-pixel sampling offset
(`pixelSample + samplingOffs`) so each pixel gets a decorrelated but
stratified QMC stream, plus branch-decorrelation scalars (dc1/dc2) for
split paths.  Parity is statistical (per-pixel stratification + pixel
decorrelation), not bitwise — App. D says exactly that.

TPU-native design: everything is uint32 VPU math with no tables in the hot
path.  Each consecutive (even, odd) dimension pair is a Sobol (0,2)-net
— dim0 = van-der-Corput bit reversal, dim1 = the classic second Sobol
dimension (direction numbers v_k = v_{k-1} ^ (v_{k-1} >> 1)) — and every
dimension is independently Owen-scrambled with a Laine-Karras hash keyed by
(pixel_hash, dim): per-pixel streams are provably uncorrelated across
pixels and across dimension pairs, while each pair keeps full 2-D
elementary-interval stratification (hash-based Owen scrambling, Burley,
JCGT 2020 — public technique, re-implemented).

Dimension allocation convention (App. D adapted to pair structure):
  dims 0,1  pixel AA offset        (pair)
  dims 2,3  lens / DOF             (pair)
  per bounce b, block of DIMS_PER_BOUNCE starting at 4 + 6b:
    +0,+1  bsdf u,v                (pair)
    +2,+3  light u,v               (pair)
    +4     light pick
    +5     russian roulette
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

DIM_PIXEL_X = 0
DIM_PIXEL_Y = 1
DIM_LENS_U = 2
DIM_LENS_V = 3
BOUNCE_DIMS_START = 4
DIMS_PER_BOUNCE = 6
SLOT_BSDF_U = 0
SLOT_BSDF_V = 1
SLOT_LIGHT_U = 2
SLOT_LIGHT_V = 3
SLOT_LIGHT_PICK = 4
SLOT_RR = 5

_INV_U32 = float(2.3283064365386963e-10)  # 1/2^32

# second Sobol dimension direction numbers: v_k = v_{k-1} ^ (v_{k-1} >> 1)
def _gen_sobol2_dirs():
    v = np.zeros(32, np.uint32)
    v[0] = np.uint32(0x80000000)
    for k in range(1, 32):
        v[k] = v[k - 1] ^ (v[k - 1] >> np.uint32(1))
    return v


_SOBOL2_DIRS = tuple(int(x) for x in _gen_sobol2_dirs())


def hash_u32(x):
    """lowbias32 integer hash (Chris Wellons), uint32 -> uint32."""
    x = jnp.asarray(x, jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def hash_combine(a, b):
    return hash_u32(jnp.asarray(a, jnp.uint32) ^ (hash_u32(b) + jnp.uint32(0x9E3779B9)))


def reverse_bits32(n):
    n = jnp.asarray(n, jnp.uint32)
    n = ((n << 16) | (n >> 16)) & jnp.uint32(0xFFFFFFFF)
    n = ((n & jnp.uint32(0x00FF00FF)) << 8) | ((n & jnp.uint32(0xFF00FF00)) >> 8)
    n = ((n & jnp.uint32(0x0F0F0F0F)) << 4) | ((n & jnp.uint32(0xF0F0F0F0)) >> 4)
    n = ((n & jnp.uint32(0x33333333)) << 2) | ((n & jnp.uint32(0xCCCCCCCC)) >> 2)
    n = ((n & jnp.uint32(0x55555555)) << 1) | ((n & jnp.uint32(0xAAAAAAAA)) >> 1)
    return n


def _sobol2_bits(idx):
    """Second Sobol dimension sample bits for index array idx."""
    idx = jnp.asarray(idx, jnp.uint32)
    out = jnp.zeros_like(idx)
    for k in range(32):
        bit = (idx >> jnp.uint32(k)) & jnp.uint32(1)
        out = out ^ (bit * jnp.uint32(_SOBOL2_DIRS[k]))
    return out


def nested_uniform_scramble(x, seed):
    """Hash-based Owen scramble of sample bits x (uint32) with seed."""
    x = reverse_bits32(x)
    x = x + jnp.asarray(seed, jnp.uint32)
    x ^= x * jnp.uint32(0x6C50B47C)
    x ^= x * jnp.uint32(0xB82F1E52)
    x ^= x * jnp.uint32(0xC7AFE638)
    x ^= x * jnp.uint32(0x8D22F6E6)
    return reverse_bits32(x)


def radical_inverse_base2(n):
    """Van-der-Corput base-2 radical inverse (unscrambled)."""
    return reverse_bits32(n).astype(jnp.float32) * _INV_U32


def radical_inverse(n, base: int):
    """General-base radical inverse (host-side checks & CDF utilities)."""
    if base == 2:
        return radical_inverse_base2(n)
    n = jnp.asarray(n, jnp.uint32)
    digits = 1
    cap = base
    while cap < 2**32:
        cap *= base
        digits += 1
    inv_base = jnp.float32(1.0 / base)

    def body(_, carry):
        n, result, inv = carry
        digit = n % base
        n = n // base
        result = result + digit.astype(jnp.float32) * inv
        inv = inv * inv_base
        return n, result, inv

    _, result, _ = lax.fori_loop(
        0, digits, body, (n, jnp.zeros(n.shape, jnp.float32), inv_base)
    )
    return jnp.minimum(result, 1.0 - 1e-7)


def _shuffled_index(sample_idx, scramble_key, pair_key):
    """Owen-shuffle the sample index per (pixel, dimension-pair).  The seed
    depends on the PAIR (dim>>1), not the dim, so both components of a
    (0,2)-net pair stay index-aligned; different pairs (and different
    pixels) get independent shuffles — pointwise decorrelated, while any
    power-of-2 prefix still maps to a dyadic Sobol block (keeps (0,2)-net
    prefixes).  This is the 'shuffled scrambled Sobol' padding construction
    that replaces the reference's dc1/dc2 branch decorrelation."""
    idx = jnp.asarray(sample_idx, jnp.uint32)
    seed = hash_u32(jnp.asarray(scramble_key, jnp.uint32)
                    ^ (jnp.asarray(pair_key, jnp.uint32)
                       * jnp.uint32(0x9E3779B9) + jnp.uint32(0x55AACC33)))
    return nested_uniform_scramble(idx, seed)


def _component_bits(idx, component):
    """Sobol pair component bits: 0 -> VdC, 1 -> second Sobol dim."""
    if isinstance(component, int):
        return reverse_bits32(idx) if component == 0 else _sobol2_bits(idx)
    b0 = reverse_bits32(idx)
    b1 = _sobol2_bits(idx)
    return jnp.where(component == 0, b0, b1)


def sample_dim(sample_idx, dim: int, scramble_key):
    """One QMC sample in [0,1): Owen-scrambled Sobol (0,2)-pair component.

    sample_idx: uint32/int32 array (lanes) — per-pixel sample counter.
    dim:        STATIC python int (see allocation table above).
    scramble_key: uint32 array (lanes) — hash of pixel id (and branch id for
                  split paths, replacing reference dc1/dc2).
    """
    idx = _shuffled_index(sample_idx, scramble_key, jnp.uint32(dim >> 1))
    seed = hash_combine(scramble_key, jnp.uint32(dim))
    bits = _component_bits(idx, dim & 1)
    u_bits = nested_uniform_scramble(bits, seed)
    # upper 24 bits -> float to keep exact [0,1) without rounding to 1.0
    return (u_bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def sample_dim2(sample_idx, dim: int, scramble_key):
    """Two consecutive dims as a stratified 2-D point (dim must be even for
    full (0,2)-net stratification; odd also works, just unpaired)."""
    return (
        sample_dim(sample_idx, dim, scramble_key),
        sample_dim(sample_idx, dim + 1, scramble_key),
    )


def bounce_dim(bounce: int, slot: int) -> int:
    """Dimension index for a given bounce and slot (static ints)."""
    return BOUNCE_DIMS_START + bounce * DIMS_PER_BOUNCE + slot


def sample_dim_pair(sample_idx, dim: int, scramble_key):
    """Both components of the (even,odd) Sobol pair starting at `dim`
    (static, even) — one index shuffle shared, ~40% cheaper than two
    sample_dim calls."""
    assert dim % 2 == 0
    idx = _shuffled_index(sample_idx, scramble_key, jnp.uint32(dim >> 1))
    b0 = reverse_bits32(idx)
    b1 = _sobol2_bits(idx)
    u0 = nested_uniform_scramble(b0, hash_combine(scramble_key,
                                                  jnp.uint32(dim)))
    u1 = nested_uniform_scramble(b1, hash_combine(scramble_key,
                                                  jnp.uint32(dim + 1)))
    inv = jnp.float32(1.0 / (1 << 24))
    return ((u0 >> jnp.uint32(8)).astype(jnp.float32) * inv,
            (u1 >> jnp.uint32(8)).astype(jnp.float32) * inv)


def dynamic_sample_dim(sample_idx, dim, scramble_key):
    """Traced-dim sampler for deep-bounce dimensions: pure hash noise.

    QMC stratification stops paying off a few path dims in (the reference's
    scrHalton also falls back to random past its table — SURVEY App. D);
    the full Sobol machinery (bit-reverse + 32-term direction XOR) costs
    ~200 VPU ops per dim inside the bounce scan, the hash costs ~15."""
    dim = jnp.asarray(dim, jnp.uint32)
    h = hash_combine(hash_combine(scramble_key, dim),
                     jnp.asarray(sample_idx, jnp.uint32))
    return h.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)
