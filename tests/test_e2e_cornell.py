"""End-to-end slice: Cornell XML -> parse -> compile -> render -> image.

This is the SURVEY §7.1 stage-1 gate: geometry, shinydiffuse, arealight NEE,
film, and the CLI path all work together.
"""
import os

import numpy as np
import pytest

SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.xml")


@pytest.fixture(scope="module")
def cornell_scene():
    from libyafaray_tpu.scene.xml_parser import parse_xml_file

    return parse_xml_file(SCENE)


def test_parse(cornell_scene):
    s = cornell_scene
    assert len(s.materials) >= 4  # default + white/red/green
    assert len(s.lights) == 1
    assert "cam" in s.cameras
    assert s.render_params.get_int("width") == 512


def test_compile(cornell_scene):
    cs = cornell_scene.compile()
    # 30 wall/block tris + 2 light panel tris
    assert cs.static.n_tris_real == 32
    assert cs.static.intersector == "brute"
    assert len(cs.static.lights) == 1
    assert cs.static.lights[0].intersectable


@pytest.mark.slow
def test_render_small(cornell_scene):
    """Low-res, low-spp render: image is sane (lit, colored walls, light
    panel brightest)."""
    from libyafaray_tpu.scene.session import render_scene

    s = cornell_scene
    s.render_params["width"] = 64
    s.render_params["height"] = 64
    s.render_params["AA_minsamples"] = 4
    res = render_scene(s)
    img = res.image
    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img))
    mean = img.mean()
    assert 0.01 < mean < 5.0, f"implausible exposure: mean={mean}"
    # camera looks +y with +x to image-right: green wall (x=0) on the left,
    # red wall (x=5.56) on the right
    left = img[28:36, 2:8]
    right = img[28:36, 56:62]
    assert left[..., 1].mean() > left[..., 0].mean()
    assert right[..., 0].mean() > right[..., 1].mean()
    # ceiling light panel is the brightest area
    assert img.max() > img.mean() * 3
