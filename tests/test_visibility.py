"""Object visibility flags (reference v3 objectbase.h visibility_t:
normal / invisible / shadow_only / no_shadows), parsed from the mesh
element's `visibility` attribute and baked into the camera-visible vs
shadow-caster triangle sets at scene compile (scene.py).

Also gates the r3 compile fast path: when every object is "normal" the
shadow set must ALIAS the visible set's arrays (no duplicate concat or
pack build) and still render identically.
"""
import numpy as np
import pytest

from libyafaray_tpu.scene.xml_parser import parse_xml_string
from libyafaray_tpu.scene.session import render_scene


pytestmark = pytest.mark.slow  # full engine renders (compile-heavy); quick tier skips

def _scene_xml(visibility: str) -> str:
    vis = f' visibility="{visibility}"' if visibility != "normal" else ""
    # floor at z=0, occluder quad at z=2 (in view), pointlight at z=4
    return f"""<?xml version="1.0"?>
<scene type="triangle">
  <material name="white">
    <type sval="shinydiffusemat"/>
    <color r="0.8" g="0.8" b="0.8"/>
  </material>
  <material name="gray">
    <type sval="shinydiffusemat"/>
    <color r="0.3" g="0.3" b="0.3"/>
  </material>
  <light name="sun">
    <type sval="pointlight"/>
    <from x="0.0" y="0.0" z="4.0"/>
    <color r="1.0" g="1.0" b="1.0"/>
    <power fval="80.0"/>
  </light>
  <camera name="cam">
    <type sval="perspective"/>
    <from x="0.0" y="-6.0" z="3.0"/>
    <to x="0.0" y="0.0" z="0.0"/>
    <up x="0.0" y="-6.0" z="4.0"/>
    <resx ival="48"/><resy ival="48"/>
    <focal fval="1.1"/>
  </camera>
  <background name="bg">
    <type sval="constant"/><color r="0.0" g="0.0" b="0.0"/>
  </background>
  <mesh id="1" vertices="4" faces="2" has_uv="false" type="0">
    <p x="-4.0" y="-4.0" z="0.0"/>
    <p x="4.0"  y="-4.0" z="0.0"/>
    <p x="4.0"  y="4.0"  z="0.0"/>
    <p x="-4.0" y="4.0"  z="0.0"/>
    <set_material sval="white"/>
    <f a="0" b="1" c="2"/>
    <f a="0" b="2" c="3"/>
  </mesh>
  <mesh id="2" vertices="4" faces="2" has_uv="false"{vis} type="0">
    <p x="-1.0" y="-1.0" z="2.0"/>
    <p x="1.0"  y="-1.0" z="2.0"/>
    <p x="1.0"  y="1.0"  z="2.0"/>
    <p x="-1.0" y="1.0"  z="2.0"/>
    <set_material sval="gray"/>
    <f a="0" b="1" c="2"/>
    <f a="0" b="2" c="3"/>
  </mesh>
  <integrator name="default">
    <type sval="directlighting"/><raydepth ival="2"/>
  </integrator>
  <integrator name="volintegr"><type sval="none"/></integrator>
  <render>
    <camera_name sval="cam"/>
    <integrator_name sval="default"/>
    <width ival="48"/><height ival="48"/>
    <AA_passes ival="1"/><AA_minsamples ival="4"/>
    <filter_type sval="box"/>
  </render>
</scene>
"""


@pytest.fixture(scope="module")
def images():
    out = {}
    for vis in ("normal", "invisible", "shadow_only", "no_shadows"):
        scene = parse_xml_string(_scene_xml(vis))
        out[vis] = np.asarray(render_scene(scene).image)
    return out


def _center_mean(img):
    h, w, _ = img.shape
    return img[h // 2 - 4:h // 2 + 4, w // 2 - 4:w // 2 + 4].mean()


def test_compile_set_split():
    normal = parse_xml_string(_scene_xml("normal")).compile()
    sonly = parse_xml_string(_scene_xml("shadow_only")).compile()
    nshad = parse_xml_string(_scene_xml("no_shadows")).compile()
    invis = parse_xml_string(_scene_xml("invisible")).compile()
    assert normal.static.n_tris_real == normal.static.n_stris_real == 4
    # all-normal fast path: shadow pack aliases the visible pack
    assert normal.arrays["tri_pack10"] is normal.arrays["stri_pack10"]
    assert (sonly.static.n_tris_real, sonly.static.n_stris_real) == (2, 4)
    assert (nshad.static.n_tris_real, nshad.static.n_stris_real) == (4, 2)
    assert (invis.static.n_tris_real, invis.static.n_stris_real) == (2, 2)


def test_visibility_semantics(images):
    # center pixel = floor at the origin, directly under the light and
    # the occluder: hard-shadowed whenever the occluder casts; the
    # occluder itself projects onto other rows.
    assert _center_mean(images["normal"]) < 0.05
    assert _center_mean(images["shadow_only"]) < 0.05
    assert _center_mean(images["invisible"]) > 0.5   # lit floor
    assert _center_mean(images["no_shadows"]) > 0.5
    # shadow presence drops total energy (casting vs non-casting pair
    # with the occluder equally (in)visible)
    assert images["shadow_only"].mean() < 0.9 * images["invisible"].mean()
    assert images["normal"].mean() < 0.9 * images["no_shadows"].mean()
    # camera visibility: occluder pixels differ between the visible and
    # hidden variants of each casting class
    assert np.abs(images["normal"] - images["shadow_only"]).max() > 0.05
    assert np.abs(images["no_shadows"] - images["invisible"]).max() > 0.05
    # the shadow field itself is identical whether or not the occluder
    # is camera-visible: compare the shadowed floor center block
    h = images["normal"].shape[0]
    sl = np.s_[h // 2 - 2:h // 2 + 2, h // 2 - 2:h // 2 + 2]
    assert np.allclose(images["normal"][sl], images["shadow_only"][sl],
                       atol=1e-5)
