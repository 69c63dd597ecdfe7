"""Ambient occlusion (reference sampleAmbientOcclusion, SURVEY §2.10):
batched occlusion rays darken concave geometry and scale with AO color."""
import pytest
import numpy as np

from libyafaray_tpu.scene.params import ParamMap
from libyafaray_tpu.scene.scene import Scene


def _corner_scene():
    """An open corner: floor + wall meeting at x=0; AO darkens the
    crease relative to the open floor."""
    sc = Scene()
    sc.create_material("w", ParamMap({"type": "shinydiffusemat",
                                      "diffuse_color": (0.8, 0.8, 0.8)}))
    sc.start_tri_mesh()
    for (x, y, z) in ((0, -2, 0), (4, -2, 0), (4, 2, 0), (0, 2, 0),
                      (0, -2, 0), (0, 2, 0), (0, 2, 4), (0, -2, 4)):
        sc.add_vertex(x, y, z)
    sc.add_triangle(0, 1, 2, "w")
    sc.add_triangle(0, 2, 3, "w")
    sc.add_triangle(4, 5, 6, "w")
    sc.add_triangle(4, 6, 7, "w")
    sc.end_tri_mesh()
    sc.create_light("L", ParamMap({
        "type": "pointlight", "from": (3.0, 0.0, 3.0),
        "color": (1, 1, 1), "power": 20.0,
    }))
    sc.create_camera("cam", ParamMap({
        "type": "perspective", "from": (3.0, 0.0, 1.2),
        "to": (0.0, 0.0, 0.6), "up": (3.0, 1.0, 1.2),
        "resx": 32, "resy": 32, "focal": 0.8,
    }))
    return sc


@pytest.mark.slow
def test_ao_darkens_crease():
    from dataclasses import replace

    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.render import render

    sc = _corner_scene()
    cs = sc.compile()
    base = RenderConfig(width=32, height=32, integrator="directlighting",
                        raydepth=1, aa_samples=4)
    img_off = render(cs, base).image
    img_on = render(cs, replace(base, do_ao=True, ao_samples=8,
                                ao_distance=2.0,
                                ao_color=(0.6, 0.6, 0.6))).image
    assert np.isfinite(img_on).all()
    # AO ADDS an ambient term (reference directlighting AO): brightens
    # open areas more than the crease
    gain = img_on.mean(axis=-1) - img_off.mean(axis=-1)
    assert gain.mean() > 1e-4
    # the crease (middle rows of the image, where wall meets floor)
    # sees more occlusion -> less ambient gain than the open extremes
    mid = gain[10:20].mean()
    edges = 0.5 * (gain[:4].mean() + gain[-4:].mean())
    assert mid < edges - 1e-3
