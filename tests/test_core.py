"""Unit tests for L0 core: math, QMC, sampling warps, CDF, color.

SURVEY §4 unit level: analytic invariants the reference also satisfies.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from libyafaray_tpu.core import math as vmath
from libyafaray_tpu.core import qmc
from libyafaray_tpu.core import sampling
from libyafaray_tpu.core import color


def test_normalize_reflect():
    d = jnp.asarray([[1.0, 2.0, -3.0], [0.0, 0.0, 1.0]])
    n = vmath.normalize(d)
    assert np.allclose(np.asarray(vmath.length(n)), 1.0, atol=1e-6)
    nrm = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = vmath.normalize(jnp.asarray([[1.0, 0.0, 1.0]]))
    r = vmath.reflect(wo, nrm)
    assert np.allclose(np.asarray(r), [[-0.7071068, 0.0, 0.7071068]], atol=1e-5)


def test_refract_snell_and_tir():
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    wo = vmath.normalize(jnp.asarray([[1.0, 0.0, 1.0], [1.0, 0.0, 0.05]]))
    wi, valid = vmath.refract(wo, n, jnp.asarray([1.5, 1.0 / 1.5]))
    assert bool(valid[0])  # entering glass at 45deg: fine
    assert not bool(valid[1])  # exiting at grazing angle: TIR
    # Snell: sin_t = sin_i / 1.5
    sin_i = np.sqrt(0.5)
    sin_t = np.sqrt(wi[0, 0] ** 2 + wi[0, 1] ** 2)
    assert np.isclose(float(sin_t), sin_i / 1.5, atol=1e-5)


def test_fresnel_limits():
    # normal incidence: ((n-1)/(n+1))^2
    kr0 = vmath.fresnel_dielectric(jnp.asarray([1.0]), 1.5)
    assert np.isclose(float(kr0[0]), ((0.5 / 2.5) ** 2), atol=1e-5)
    # grazing: -> 1
    kr_g = vmath.fresnel_dielectric(jnp.asarray([0.001]), 1.5)
    assert float(kr_g[0]) > 0.98
    # TIR from inside
    kr_tir = vmath.fresnel_dielectric(jnp.asarray([0.3]), 1.0 / 1.5)
    assert float(kr_tir[0]) == 1.0


def test_onb_orthonormal():
    rng = np.random.default_rng(0)
    n = vmath.normalize(jnp.asarray(rng.normal(size=(100, 3))))
    u, v = vmath.build_onb(n)
    assert np.allclose(np.asarray(vmath.dot(u, v)), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(vmath.dot(u, n)), 0.0, atol=1e-5)
    assert np.allclose(np.asarray(vmath.length(u)), 1.0, atol=1e-5)
    cr = vmath.cross(u, v)
    assert np.allclose(np.asarray(cr), np.asarray(n), atol=1e-5)


def test_halton_low_discrepancy():
    """First 256 points of base-2/3 radical inverse are stratified: every
    1/16 interval contains exactly 16 points (base 2)."""
    idx = jnp.arange(256, dtype=jnp.uint32)
    h2 = np.asarray(qmc.radical_inverse(idx, 2))
    h3 = np.asarray(qmc.radical_inverse(idx, 3))
    counts2 = np.histogram(h2, bins=16, range=(0, 1))[0]
    assert np.all(counts2 == 16)
    counts3 = np.histogram(h3, bins=9, range=(0, 1))[0]
    assert np.abs(counts3 - 256 / 9).max() <= 1.0
    # in range
    assert h2.min() >= 0 and h2.max() < 1
    assert h3.min() >= 0 and h3.max() < 1


def test_scrambled_dims_decorrelated():
    idx = jnp.arange(1024, dtype=jnp.uint32)
    key_a = jnp.full(1024, 123, jnp.uint32)
    key_b = jnp.full(1024, 999, jnp.uint32)
    for dim in (0, 1, 5):
        a = np.asarray(qmc.sample_dim(idx, dim, key_a))
        b = np.asarray(qmc.sample_dim(idx, dim, key_b))
        # same dim, different pixels: decorrelated but both uniform
        assert abs(np.corrcoef(a, b)[0, 1]) < 0.1, dim
        assert abs(a.mean() - 0.5) < 0.02 and abs(b.mean() - 0.5) < 0.02
    # different dim pairs of the same pixel are decorrelated too
    a = np.asarray(qmc.sample_dim(idx, 0, key_a))
    c = np.asarray(qmc.sample_dim(idx, 4, key_a))
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.1


def test_owen_sobol_stratified():
    """Owen scrambling preserves elementary-interval stratification: any
    power-of-2 prefix fills power-of-2 bins evenly, and the (even,odd) pair
    is a (0,2)-net: 16x16 grid of 256 points has exactly one point/cell."""
    idx = jnp.arange(256, dtype=jnp.uint32)
    key = jnp.full(256, 77, jnp.uint32)
    u0 = np.asarray(qmc.sample_dim(idx, 0, key))
    u1 = np.asarray(qmc.sample_dim(idx, 1, key))
    assert np.all(np.histogram(u0, 16, range=(0, 1))[0] == 16)
    assert np.all(np.histogram(u1, 16, range=(0, 1))[0] == 16)
    cells = np.histogram2d(u0, u1, bins=16, range=((0, 1), (0, 1)))[0]
    assert np.all(cells == 1), cells


def test_cos_hemisphere_pdf_chi2():
    """sample/pdf consistency: cosine-weighted histogram matches pdf."""
    rng = np.random.default_rng(1)
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (20000, 1)))
    u1 = jnp.asarray(rng.random(20000))
    u2 = jnp.asarray(rng.random(20000))
    d, pdf = sampling.sample_cos_hemisphere(n, u1, u2)
    d = np.asarray(d)
    cos_t = d[:, 2]
    assert cos_t.min() >= -1e-6
    # E[cos] under cos-weighted sampling = 2/3
    assert abs(cos_t.mean() - 2.0 / 3.0) < 0.01
    assert np.allclose(np.asarray(pdf), np.maximum(cos_t, 1e-8) / np.pi,
                       atol=1e-5)


def test_cone_sampling_inside_cone():
    axis = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (1000, 1)))
    rng = np.random.default_rng(2)
    cos_max = 0.9
    d, pdf = sampling.sample_cone(axis, cos_max,
                                  jnp.asarray(rng.random(1000)),
                                  jnp.asarray(rng.random(1000)))
    assert np.asarray(d)[:, 2].min() >= cos_max - 1e-5
    assert np.isclose(float(pdf), 1.0 / (2 * np.pi * (1 - cos_max)), rtol=1e-5)


def test_cdf_1d_sampling():
    w = jnp.asarray([1.0, 0.0, 3.0, 0.0])
    cdf, integral = sampling.build_cdf_1d(w)
    assert np.isclose(float(integral), 1.0)  # mean of weights
    u = jnp.asarray(np.linspace(0.001, 0.999, 4001))
    idx, du, pdfn = sampling.sample_cdf_1d(cdf, u)
    idx = np.asarray(idx)
    frac = np.bincount(idx, minlength=4) / len(idx)
    assert abs(frac[0] - 0.25) < 0.01
    assert abs(frac[2] - 0.75) < 0.01
    assert frac[1] == 0 and frac[3] == 0


def test_mis_power_heuristic():
    w = sampling.power_heuristic(jnp.asarray([1.0]), jnp.asarray([1.0]))
    assert np.isclose(float(w[0]), 0.5)
    w2 = sampling.power_heuristic(jnp.asarray([10.0]), jnp.asarray([0.1]))
    assert float(w2[0]) > 0.99


def test_srgb_roundtrip():
    c = jnp.asarray(np.linspace(0, 1, 64).reshape(-1))
    rt = np.asarray(color.srgb_to_linear(color.linear_to_srgb(c)))
    assert np.allclose(rt, np.asarray(c), atol=1e-4)


def test_wl2rgb_integrates_to_white():
    w = jnp.asarray(np.linspace(0, 1, 2048))
    rgb = np.asarray(color.wl_to_rgb(w)).mean(axis=0)
    assert np.allclose(rgb, 1.0, atol=0.06), rgb


def test_filter_normalization():
    """Discrete filter sums over the splat taps are ~constant across
    subpixel positions (no energy ripple)."""
    from libyafaray_tpu.film.filters import eval_filter_2d, filter_radius

    for ft, width in (("box", 1.0), ("mitchell", 2.0), ("gauss", 1.5),
                      ("lanczos", 2.0)):
        r = filter_radius(ft, width)
        sums = []
        for sx in np.linspace(0.05, 0.95, 7):
            s = 0.0
            for ox in range(-r, r + 1):
                for oy in range(-r, r + 1):
                    s += float(eval_filter_2d(
                        ft, jnp.asarray(ox + 0.5 - sx),
                        jnp.asarray(oy + 0.5 - 0.5), width))
            sums.append(s)
        sums = np.asarray(sums)
        # the film divides by the accumulated weight sum (splat-filter
        # convention, same as the reference's filter table), so the only
        # hard requirement is positivity of the discrete tap sums
        assert sums.min() > 0.0, (ft, sums)
        if ft == "box":
            assert sums.max() / sums.min() < 3.0, (ft, sums)
