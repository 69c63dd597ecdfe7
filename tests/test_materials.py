"""BSDF-level tests: white furnace (energy), sample/pdf consistency,
eval/sample agreement (SURVEY §4 unit level)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libyafaray_tpu.materials.base import (
    MT_GLASS, MT_GLOSSY, MT_SHINYDIFFUSE, build_material_table, default_row,
    gather_rows,
)
from libyafaray_tpu.materials import bsdf
from libyafaray_tpu.core import math as vmath


def _table(**over):
    row = default_row()
    row.update(over)
    t = build_material_table([row])
    return {k: jnp.asarray(v) for k, v in t.items()}


def _lanes(table, n):
    return gather_rows(table, jnp.zeros(n, jnp.int32))


N = 4096
RNG = np.random.default_rng(7)
NRM = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (N, 1)), jnp.float32)
WO = vmath.normalize(jnp.asarray(np.tile([[0.3, 0.1, 0.8]], (N, 1)),
                                 jnp.float32))
U1 = jnp.asarray(RNG.random(N), jnp.float32)
U2 = jnp.asarray(RNG.random(N), jnp.float32)
UL = jnp.asarray(RNG.random(N), jnp.float32)


def _sample(table):
    row = _lanes(table, N)
    return row, bsdf.sample_bsdf(row, NRM, NRM, WO, U1, U2, UL)


def test_lambert_white_furnace():
    """Pure diffuse albedo-1: MC estimate of directional-hemispherical
    reflectance == 1 (lossless)."""
    t = _table(mtype=MT_SHINYDIFFUSE, diffuse_color=(1.0, 1.0, 1.0),
               diffuse_reflect=1.0)
    row, s = _sample(t)
    tp = np.asarray(s["tp"])[np.asarray(s["valid"])]
    est = tp.mean(axis=0)
    assert np.allclose(est, 1.0, atol=0.02), est


def test_lambert_sample_pdf_matches_pdf_fn():
    t = _table(mtype=MT_SHINYDIFFUSE, diffuse_color=(0.5, 0.5, 0.5))
    row, s = _sample(t)
    pdf2 = bsdf.pdf_bsdf(row, NRM, NRM, WO, s["wi"])
    v = np.asarray(s["valid"])
    assert np.allclose(np.asarray(s["pdf"])[v], np.asarray(pdf2)[v],
                       atol=1e-4)


def test_lambert_eval_reciprocal_and_correct():
    t = _table(mtype=MT_SHINYDIFFUSE, diffuse_color=(0.6, 0.3, 0.1))
    row = _lanes(t, N)
    wi = vmath.normalize(
        jnp.asarray(np.tile([[-0.2, 0.4, 0.9]], (N, 1)), jnp.float32))
    f = np.asarray(bsdf.eval_bsdf(row, NRM, NRM, WO, wi))
    assert np.allclose(f[0], np.asarray([0.6, 0.3, 0.1]) / np.pi, atol=1e-5)
    f2 = np.asarray(bsdf.eval_bsdf(row, NRM, NRM, wi, WO))
    assert np.allclose(f, f2, atol=1e-6)  # reciprocity


def test_oren_nayar_reduces_to_lambert_at_sigma0():
    t0 = _table(mtype=MT_SHINYDIFFUSE, diffuse_color=(0.5, 0.5, 0.5),
                sigma=0.0)
    t1 = _table(mtype=MT_SHINYDIFFUSE, diffuse_color=(0.5, 0.5, 0.5),
                sigma=0.3)
    row0 = _lanes(t0, N)
    row1 = _lanes(t1, N)
    wi = vmath.normalize(jnp.asarray(RNG.normal(size=(N, 3)), jnp.float32))
    wi = jnp.where(wi[..., 2:3] < 0, -wi, wi)
    f0 = np.asarray(bsdf.eval_bsdf(row0, NRM, NRM, WO, wi))
    f1 = np.asarray(bsdf.eval_bsdf(row1, NRM, NRM, WO, wi))
    assert not np.allclose(f0, f1)
    # ON redistributes energy (backscatter brightening is expected) but
    # stays within a sane bound of the Lambert lobe
    assert f1.max() <= f0.max() * 2.0


def test_glossy_energy_bounded_and_pdf_consistent():
    t = _table(mtype=MT_GLOSSY, diffuse_color=(0.3, 0.3, 0.3),
               glossy_color=(1.0, 1.0, 1.0), glossy_reflect=0.8,
               diffuse_reflect=0.3, exponent=80.0)
    row, s = _sample(t)
    v = np.asarray(s["valid"]) & ~np.asarray(s["specular"])
    tp = np.asarray(s["tp"])[v]
    est = tp.mean(axis=0)
    assert np.all(est < 1.05), est  # energy conservation
    pdf2 = bsdf.pdf_bsdf(row, NRM, NRM, WO, s["wi"])
    r = np.asarray(s["pdf"])[v] / np.maximum(np.asarray(pdf2)[v], 1e-9)
    assert np.quantile(np.abs(r - 1.0), 0.95) < 1e-3


def test_glass_fresnel_split_and_snell():
    t = _table(mtype=MT_GLASS, ior=1.5, filter_color=(1.0, 1.0, 1.0),
               mirror_color=(1.0, 1.0, 1.0))
    row, s = _sample(t)
    trans = np.asarray(s["transmit"])
    wi = np.asarray(s["wi"])
    # transmitted rays are below the surface, reflected above
    assert np.all(wi[trans][:, 2] < 0)
    assert np.all(wi[~trans][:, 2] > 0)
    # fraction reflected ~ fresnel at this angle
    cos_i = float(vmath.dot(NRM, WO)[0])
    kr = float(vmath.fresnel_dielectric(jnp.asarray([cos_i]), 1.5)[0])
    frac = (~trans).mean()
    assert abs(frac - kr) < 0.02
    # all glass samples are delta
    assert np.all(np.asarray(s["specular"]))
    # energy: tp == 1 for both lobes here
    assert np.allclose(np.asarray(s["tp"]), 1.0, atol=1e-5)


def test_shinydiffuse_mirror_energy_split():
    t = _table(mtype=MT_SHINYDIFFUSE, diffuse_color=(1.0, 1.0, 1.0),
               mirror_color=(1.0, 1.0, 1.0), specular_reflect=0.3,
               diffuse_reflect=1.0)
    row, s = _sample(t)
    v = np.asarray(s["valid"])
    spec = np.asarray(s["specular"]) & v
    # total reflectance (mirror + diffuse) == 1 for albedo-1 material
    est = np.asarray(s["tp"])[v].mean(axis=0)
    assert np.allclose(est, 1.0, atol=0.03), est
    # mirror picked ~30%
    assert abs(spec.mean() - 0.3) < 0.02


def test_shadow_filter_host_matches_device():
    """materials.host.shadow_filter_np must stay in sync with the jnp
    shadow_filter (used by shadow kernels via the scene compile)."""
    from libyafaray_tpu.materials.host import shadow_filter_np
    from libyafaray_tpu.materials.bsdf import shadow_filter
    from libyafaray_tpu.materials.base import build_material_table, MT_NULL

    rows = []
    for over in (
        dict(mtype=MT_SHINYDIFFUSE, transparency=0.4,
             filter_color=(0.9, 0.5, 0.2)),
        dict(mtype=MT_SHINYDIFFUSE, transparency=0.4, specular_reflect=0.5,
             fresnel_effect=True, ior=1.5, filter_color=(1.0, 1.0, 1.0)),
        dict(mtype=MT_GLASS, fake_shadows=True, filter_color=(0.7, 0.8, 0.9)),
        dict(mtype=MT_GLASS, fake_shadows=False),
        dict(mtype=MT_NULL),
        dict(mtype=MT_GLOSSY),
    ):
        r = default_row()
        r.update(over)
        rows.append(r)
    table = build_material_table(rows)
    host = shadow_filter_np(table)
    dev = np.asarray(shadow_filter({k: jnp.asarray(v)
                                    for k, v in table.items()}))
    assert np.allclose(host, dev, atol=1e-5), (host, dev)


def test_transparency_shadow_filter():
    from libyafaray_tpu.materials.bsdf import shadow_filter

    t = _table(mtype=MT_SHINYDIFFUSE, transparency=0.5,
               filter_color=(1.0, 0.2, 0.2))
    f = np.asarray(shadow_filter(_lanes(t, 4)))
    assert np.allclose(f[0], [0.5, 0.1, 0.1], atol=1e-5)
    t2 = _table(mtype=MT_GLASS, fake_shadows=True,
                filter_color=(0.8, 0.9, 1.0))
    f2 = np.asarray(shadow_filter(_lanes(t2, 4)))
    assert np.allclose(f2[0], [0.8, 0.9, 1.0], atol=1e-5)
    t3 = _table(mtype=MT_GLASS, fake_shadows=False)
    f3 = np.asarray(shadow_filter(_lanes(t3, 4)))
    assert np.allclose(f3[0], 0.0)


def test_blend_material_mixes_children():
    """blend_mat: eval is the lerp of its children; sample picks children
    in proportion (reference blendmat.cc semantics)."""
    from libyafaray_tpu.materials import blend as blendmod
    from libyafaray_tpu.materials.base import MT_BLEND

    rows = []
    r1 = default_row()
    r1.update(dict(mtype=MT_SHINYDIFFUSE, diffuse_color=(1.0, 0.0, 0.0)))
    r2 = default_row()
    r2.update(dict(mtype=MT_SHINYDIFFUSE, diffuse_color=(0.0, 1.0, 0.0)))
    rb = default_row()
    rb.update(dict(mtype=MT_BLEND, sub_mat1=0, sub_mat2=1,
                   blend_value=0.25))
    rows = [r1, r2, rb]
    t = build_material_table(rows)
    mats = {k: jnp.asarray(v) for k, v in t.items()}
    row = gather_rows(mats, jnp.full(N, 2, jnp.int32))
    wi = vmath.normalize(
        jnp.asarray(np.tile([[0.1, -0.2, 0.9]], (N, 1)), jnp.float32))
    f = np.asarray(blendmod.eval_bsdf(mats, row, NRM, NRM, WO, wi, True))
    expect = (0.75 * np.asarray([1.0, 0, 0]) + 0.25 * np.asarray([0, 1.0, 0])) / np.pi
    assert np.allclose(f[0], expect, atol=1e-5), f[0]
    # sampling picks child 2 with prob 0.25
    s = blendmod.sample_bsdf(mats, row, NRM, NRM, WO, U1, U2, UL, True)
    tp = np.asarray(s["tp"])
    green_frac = (tp[:, 1] > tp[:, 0]).mean()
    assert abs(green_frac - 0.25) < 0.03
    # mixture pdf matches the blended pdf fn
    p1 = np.asarray(blendmod.pdf_bsdf(mats, row, NRM, NRM, WO, s["wi"], True))
    assert np.allclose(np.asarray(s["pdf"]), p1, atol=1e-4)


def test_blend_material_nested_two_levels():
    """blend of a blend (reference blendmat.cc composes arbitrary
    children): eval/pdf expand recursively and sample's mixture pdf
    matches; depth comes from scene compile (_blend_depth)."""
    from libyafaray_tpu.materials import blend as blendmod
    from libyafaray_tpu.materials.base import MT_BLEND
    from libyafaray_tpu.scene.scene import _blend_depth

    r1 = default_row()
    r1.update(dict(mtype=MT_SHINYDIFFUSE, diffuse_color=(1.0, 0.0, 0.0)))
    r2 = default_row()
    r2.update(dict(mtype=MT_SHINYDIFFUSE, diffuse_color=(0.0, 1.0, 0.0)))
    r3 = default_row()
    r3.update(dict(mtype=MT_SHINYDIFFUSE, diffuse_color=(0.0, 0.0, 1.0)))
    inner = default_row()
    inner.update(dict(mtype=MT_BLEND, sub_mat1=0, sub_mat2=1,
                      blend_value=0.5))
    outer = default_row()
    outer.update(dict(mtype=MT_BLEND, sub_mat1=3, sub_mat2=2,
                      blend_value=0.4))
    rows = [r1, r2, r3, inner, outer]
    assert _blend_depth(rows) == 2
    t = build_material_table(rows)
    mats = {k: jnp.asarray(v) for k, v in t.items()}
    row = gather_rows(mats, jnp.full(N, 4, jnp.int32))
    wi = vmath.normalize(
        jnp.asarray(np.tile([[0.1, -0.2, 0.9]], (N, 1)), jnp.float32))
    f = np.asarray(blendmod.eval_bsdf(mats, row, NRM, NRM, WO, wi, 2))
    expect = (0.6 * (0.5 * np.asarray([1.0, 0, 0])
                     + 0.5 * np.asarray([0, 1.0, 0]))
              + 0.4 * np.asarray([0, 0, 1.0])) / np.pi
    assert np.allclose(f[0], expect, atol=1e-5), f[0]
    # depth 1 only expands one level: the inner blend contributes its
    # own (leaf) row eval — NOT the children mix — so depths differ
    f1 = np.asarray(blendmod.eval_bsdf(mats, row, NRM, NRM, WO, wi, 1))
    assert not np.allclose(f1[0], expect, atol=1e-5)
    # sampling: leaf pick fractions ~ (0.3 red, 0.3 green, 0.4 blue)
    s = blendmod.sample_bsdf(mats, row, NRM, NRM, WO, U1, U2, UL, 2)
    tp = np.asarray(s["tp"])
    lead = tp.argmax(axis=1)
    fr = [(lead == c).mean() for c in range(3)]
    assert abs(fr[0] - 0.3) < 0.04 and abs(fr[1] - 0.3) < 0.04 \
        and abs(fr[2] - 0.4) < 0.04, fr
    # sample pdf equals the recursive mixture pdf
    p = np.asarray(blendmod.pdf_bsdf(mats, row, NRM, NRM, WO, s["wi"], 2))
    assert np.allclose(np.asarray(s["pdf"]), p, atol=1e-4)


def test_rough_glass_sample_eval_pdf_consistent():
    """Walter-07 rough glass: sampled tp == f·|cos|/(pdf·...) lane-wise,
    pdf(sample) == pdf_bsdf(wi), energy bounded (reference
    src/materials/roughglass.cc; SURVEY §2.4)."""
    from libyafaray_tpu.materials.base import MT_ROUGH_GLASS

    t = _table(mtype=MT_ROUGH_GLASS, ior=1.5, exponent=60.0,
               filter_color=(1.0, 1.0, 1.0), mirror_color=(1.0, 1.0, 1.0))
    row, s = _sample(t)
    v = np.asarray(s["valid"])
    assert not np.asarray(s["specular"])[v].any()  # non-delta now
    assert np.asarray(s["chain"])[v].all()  # but still a chain lobe
    pdf_s = np.asarray(s["pdf"])
    assert (pdf_s[v] > 0).all()

    # pdf from the standalone pdf fn at the sampled direction matches the
    # sampler's reported pdf
    pdf2 = np.asarray(bsdf.pdf_bsdf(row, NRM, NRM, WO, s["wi"]))
    r = pdf_s[v] / np.maximum(pdf2[v], 1e-12)
    assert np.quantile(np.abs(r - 1.0), 0.9) < 5e-3, np.quantile(
        np.abs(r - 1.0), 0.9)

    # sampled throughput equals f·|cos|/pdf (self-consistency of the
    # microfacet weight simplification)
    f = np.asarray(bsdf.eval_bsdf(row, NRM, NRM, WO, s["wi"]))
    ci = np.abs(np.asarray(s["wi"])[:, 2])
    tp_ref = f * (ci / np.maximum(pdf_s, 1e-12))[:, None]
    tp = np.asarray(s["tp"])
    ok = v & (pdf_s > 1e-6) & (ci > 1e-3)
    rel = np.abs(tp[ok] - tp_ref[ok]) / np.maximum(tp_ref[ok], 1e-3)
    assert np.quantile(rel, 0.9) < 2e-2, np.quantile(rel, 0.9)

    # energy: mean weight ≤ ~1 (white furnace-ish bound)
    est = tp[v].mean(axis=0)
    assert np.all(est < 1.1), est


def test_rough_glass_smooth_limit_matches_delta_glass():
    """High exponent → rough glass converges to the delta glass split."""
    from libyafaray_tpu.materials.base import MT_ROUGH_GLASS

    t = _table(mtype=MT_ROUGH_GLASS, ior=1.5, exponent=20000.0,
               filter_color=(1.0, 1.0, 1.0), mirror_color=(1.0, 1.0, 1.0))
    row, s = _sample(t)
    v = np.asarray(s["valid"])
    trans = np.asarray(s["transmit"]) & v
    cos_i = float(vmath.dot(NRM, WO)[0])
    kr = float(vmath.fresnel_dielectric(jnp.asarray([cos_i]), 1.5)[0])
    frac = 1.0 - trans[v].mean()
    assert abs(frac - kr) < 0.03
    # weights near 1 in the smooth limit
    tp = np.asarray(s["tp"])[v]
    assert np.quantile(np.abs(tp - 1.0), 0.8) < 0.05, np.quantile(
        np.abs(tp - 1.0), 0.8)
