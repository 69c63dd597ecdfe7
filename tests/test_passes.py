"""Render-pass / AOV tests (reference src/yafraycore/renderpasses.cc —
SURVEY §2.11)."""
import os

import numpy as np
import pytest

SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                     "cornell.xml")

ALL_PASSES = (
    "z-depth-abs", "z-depth-norm", "mist", "normal-smooth", "normal-geom",
    "uv", "mat-index-abs", "mat-index-norm", "mat-index-auto",
    "mat-index-mask", "obj-index-abs", "obj-index-auto", "diffuse-color",
    "emit", "direct", "ao", "ao-clay", "shadow", "reflect", "refract",
    "debug-nu", "debug-nv", "debug-dpdu", "debug-dpdv",
    "edge", "toon", "indirect", "diffuse-indirect",
)


pytestmark = pytest.mark.slow  # full engine renders (compile-heavy); quick tier skips

@pytest.fixture(scope="module")
def cornell_passes():
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.render import render

    s = parse_xml_file(SCENE)
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "pathtracing",
                          "bounces": 2, "width": 24, "height": 24,
                          "aa_samples": 4, "aa_passes": 1,
                          "passes": ALL_PASSES, "ao_samples": 4})
    return render(s.compile(), cfg)


def test_pass_count_and_shapes(cornell_passes):
    planes = cornell_passes.passes
    assert len(planes) == len(ALL_PASSES), sorted(
        set(ALL_PASSES) - set(planes))
    for name, plane in planes.items():
        assert plane.shape[:2] == (24, 24), name
        assert np.isfinite(plane).all(), name


def test_pass_semantics(cornell_passes):
    planes = cornell_passes.passes
    # shadow in [0,1] and some pixels are at least partly occluded
    sh = planes["shadow"]
    assert sh.min() >= -1e-6 and sh.max() <= 1.0 + 1e-6
    assert (sh < 0.95).any()
    # AO bounded; clay variant is gray (equal channels)
    clay = planes["ao-clay"]
    assert np.allclose(clay[..., 0], clay[..., 1])
    # diffuse-only cornell: reflect/refract stay ~0
    assert planes["reflect"].max() < 1e-4
    assert planes["refract"].max() < 1e-4
    # pathtracing has bounce light: indirect nonzero and nonnegative
    ind = planes["indirect"]
    assert ind.min() >= 0.0
    assert ind.mean() > 1e-3
    # index-auto gives distinct colors for distinct indices
    auto = planes["mat-index-auto"]
    cols = {tuple(np.round(c, 3)) for c in auto.reshape(-1, 3)}
    assert len(cols) >= 2
    # mask is binary
    mask = planes["mat-index-mask"]
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    # debug frames are unit vectors per sample; the per-pixel average can
    # shrink where AA samples straddle surfaces with different frames
    nu = planes["debug-nu"]
    nlen = np.linalg.norm(nu, axis=-1)
    hit = planes["z-depth-abs"][..., 0] > 0
    assert (nlen[hit] <= 1.0 + 1e-3).all()
    assert np.median(nlen[hit]) > 0.99
    # dPdU/dPdV: display-normalized derivatives, unit where hit and the
    # uv parameterization exists; dPdU ⟂-ish dPdV on the box quads
    du = planes["debug-dpdu"]
    dv = planes["debug-dpdv"]
    dul = np.linalg.norm(du, axis=-1)
    assert (dul[hit] <= 1.0 + 1e-3).all()
    assert np.median(dul[hit]) > 0.99
    dot = np.abs((du * dv).sum(axis=-1))
    assert np.median(dot[hit]) < 0.1


def test_reflect_pass_sees_mirror_bounce():
    """A mirror sphere in a lit box routes its contributions into the
    reflect pass (bounce-0 specular-reflect chain)."""
    from libyafaray_tpu.scene.scene import Scene
    from libyafaray_tpu.scene.params import ParamMap
    from libyafaray_tpu.scene.session import render_scene

    s = Scene()
    s.create_material("mirror", ParamMap({
        "type": "shinydiffusemat", "specular_reflect": 1.0,
        "mirror_color": (1.0, 1.0, 1.0)}))
    s.add_sphere((0.0, 0.0, 0.0), 1.0, "mirror")
    s.create_background("bg", ParamMap({
        "type": "constant", "color": (0.8, 0.4, 0.2)}))
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": 24, "resy": 24,
        "from": (0.0, -4.0, 0.0), "to": (0.0, 0.0, 0.0),
        "up": (0.0, -4.0, 1.0), "focal": 1.8}))
    s.create_integrator("default", ParamMap({
        "type": "pathtracing", "bounces": 2, "raydepth": 3}))
    s.render_params = ParamMap({
        "width": 24, "height": 24, "AA_minsamples": 2,
        "integrator_name": "default", "camera_name": "cam",
        "render_passes": "reflect refract"})
    res = render_scene(s)
    refl = res.passes["reflect"]
    # center pixels see the env through the mirror -> reflect pass > 0
    assert refl[10:14, 10:14].mean() > 0.05, refl.mean()
    assert res.passes["refract"].max() < 1e-4
