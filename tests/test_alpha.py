"""Alpha/coverage plane (reference colorA_t + bg_transp /
bg_transp_refract render params, imageOutput alpha; SURVEY §2.11/§2.12).

Semantics under MC sampling: a camera-visibility chain that reaches the
background through nothing but null passthrough / straight-through
transparency (and refracted specular chains when bg_transp_refract) makes
the sample transparent; fractional material transparency emerges as the
sample average.
"""
import numpy as np
import pytest

from libyafaray_tpu.scene.xml_parser import parse_xml_string
from libyafaray_tpu.scene.session import render_scene


def _scene_xml(mat_block: str, render_extra: str = "", spp: int = 16,
               raydepth: int = 4) -> str:
    # centered quad (fills image center) in front of a constant background
    return f"""<?xml version="1.0"?>
<scene type="triangle">
  {mat_block}
  <light name="sun">
    <type sval="pointlight"/>
    <from x="0.0" y="-4.0" z="4.0"/>
    <color r="1.0" g="1.0" b="1.0"/>
    <power fval="60.0"/>
  </light>
  <camera name="cam">
    <type sval="perspective"/>
    <from x="0.0" y="-6.0" z="0.0"/>
    <to x="0.0" y="0.0" z="0.0"/>
    <up x="0.0" y="-6.0" z="1.0"/>
    <resx ival="32"/><resy ival="32"/>
    <focal fval="1.1"/>
  </camera>
  <background name="bg">
    <type sval="constant"/><color r="0.2" g="0.4" b="0.6"/>
  </background>
  <mesh id="1" vertices="4" faces="2" has_uv="false" type="0">
    <p x="-2.0" y="0.0" z="-2.0"/>
    <p x="2.0"  y="0.0" z="-2.0"/>
    <p x="2.0"  y="0.0" z="2.0"/>
    <p x="-2.0" y="0.0" z="2.0"/>
    <set_material sval="m"/>
    <f a="0" b="1" c="2"/>
    <f a="0" b="2" c="3"/>
  </mesh>
  <integrator name="default">
    <type sval="directlighting"/><raydepth ival="{raydepth}"/>
  </integrator>
  <integrator name="volintegr"><type sval="none"/></integrator>
  <render>
    <camera_name sval="cam"/>
    <integrator_name sval="default"/>
    <background_name sval="bg"/>
    <width ival="32"/><height ival="32"/>
    <AA_passes ival="1"/><AA_minsamples ival="{spp}"/>
    <bg_transp bval="true"/>
    {render_extra}
  </render>
</scene>
"""


OPAQUE = """
  <material name="m">
    <type sval="shinydiffusemat"/>
    <color r="0.7" g="0.7" b="0.7"/>
  </material>
"""

SEMI = """
  <material name="m">
    <type sval="shinydiffusemat"/>
    <color r="0.7" g="0.7" b="0.7"/>
    <transparency fval="0.6"/>
  </material>
"""

GLASS = """
  <material name="m">
    <type sval="glass"/>
    <IOR fval="1.5"/>
    <filter_color r="1.0" g="1.0" b="1.0"/>
  </material>
"""


def _center_border(a):
    center = a[12:20, 12:20]
    border = np.concatenate([a[:2].ravel(), a[-2:].ravel(),
                             a[:, :2].ravel(), a[:, -2:].ravel()])
    return center, border


@pytest.mark.slow
def test_alpha_opaque_vs_background():
    res = render_scene(parse_xml_string(_scene_xml(OPAQUE, spp=4)))
    a = res.alpha
    assert a is not None and a.shape == (32, 32)
    center, border = _center_border(a)
    assert center.mean() > 0.99
    assert border.mean() < 0.01
    # the color image still shows the background in the corners
    img = res.image
    assert img[:2, :2].mean() > 0.05


@pytest.mark.slow
def test_no_alpha_without_bg_transp():
    xml = _scene_xml(OPAQUE, spp=2).replace(
        '<bg_transp bval="true"/>', "")
    res = render_scene(parse_xml_string(xml))
    assert res.alpha is None


@pytest.mark.slow
def test_fractional_alpha_semi_transparent():
    # transparency 0.6 -> expected coverage ~0.4 (MC over spp)
    res = render_scene(parse_xml_string(_scene_xml(SEMI, spp=64)))
    center, border = _center_border(res.alpha)
    assert abs(center.mean() - 0.4) < 0.08, center.mean()
    assert border.mean() < 0.01


@pytest.mark.parametrize("refract_flag,expect_low", [(False, False),
                                                     (True, True)])
@pytest.mark.slow
def test_glass_refract_alpha(refract_flag, expect_low):
    extra = ('<bg_transp_refract bval="true"/>' if refract_flag else "")
    res = render_scene(parse_xml_string(_scene_xml(GLASS, extra, spp=32)))
    center, _ = _center_border(res.alpha)
    if expect_low:
        # refracted chains reach the background; only the fresnel-reflect
        # picks stay opaque
        assert center.mean() < 0.25, center.mean()
    else:
        assert center.mean() > 0.95, center.mean()


def test_premult_parse():
    from libyafaray_tpu.scene.session import build_config

    s = parse_xml_string(_scene_xml(
        OPAQUE, '<premult bval="true"/>', spp=2))
    cfg = build_config(s)
    assert cfg.premult_alpha and cfg.transp_background
