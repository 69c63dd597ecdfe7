"""Per-pass AA sample-multiplier factors (reference imagefilm
AA_sample_multiplier_factor / AA_light_sample_multiplier_factor /
AA_indirect_sample_multiplier_factor — VERDICT r2 missing #6)."""
import pytest
import numpy as np

from libyafaray_tpu.integrators.config import RenderConfig, \
    config_from_params
from libyafaray_tpu.scene.params import ParamMap


def test_multiplier_params_parse():
    render = ParamMap({
        "AA_sample_multiplier_factor": 2.0,
        "AA_light_sample_multiplier_factor": 1.5,
        "AA_indirect_sample_multiplier_factor": 3.0,
    })
    cfg = config_from_params(render, ParamMap({"type": "pathtracing"}))
    assert cfg.aa_sample_multiplier_factor == 2.0
    assert cfg.aa_light_sample_multiplier_factor == 1.5
    assert cfg.aa_indirect_sample_multiplier_factor == 3.0
    assert cfg.light_ns_mult == 1.0  # per-pass value starts at 1


def _tiny_scene():
    from libyafaray_tpu.scene.scene import Scene

    sc = Scene()
    sc.create_material("w", ParamMap({"type": "shinydiffusemat",
                                      "diffuse_color": (0.7, 0.7, 0.7)}))
    sc.start_tri_mesh()
    for (x, y) in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        sc.add_vertex(x, y, 0.0)
    sc.add_triangle(0, 1, 2, "w")
    sc.add_triangle(0, 2, 3, "w")
    sc.end_tri_mesh()
    sc.create_light("L", ParamMap({
        "type": "arealight", "corner": (-0.3, -0.3, 2.0),
        "point1": (0.3, -0.3, 2.0), "point2": (-0.3, 0.3, 2.0),
        "color": (1, 1, 1), "power": 8.0, "samples": 2,
    }))
    sc.create_camera("cam", ParamMap({
        "type": "perspective", "from": (0, 0, 3), "to": (0, 0, 0),
        "up": (0, 1, 3), "resx": 24, "resy": 24, "focal": 1.0,
    }))
    return sc


@pytest.mark.slow
def test_render_with_multipliers_runs_and_adds_samples():
    from libyafaray_tpu.integrators.render import render

    sc = _tiny_scene()
    cs = sc.compile()
    cfg = RenderConfig(width=24, height=24, integrator="pathtracing",
                       bounces=1, aa_passes=2, aa_samples=2,
                       aa_inc_samples=2, aa_threshold=1e-6,
                       aa_sample_multiplier_factor=2.0,
                       aa_light_sample_multiplier_factor=2.0,
                       aa_indirect_sample_multiplier_factor=2.0)
    res = render(cs, cfg)
    ns = np.asarray(res.film["nsamples"])
    # pass 0 = 2 samples; pass 1 flags everything (threshold ~0) and the
    # AA factor doubles its 2 added steps to 4 -> 6 total
    assert ns.max() == 6
    img = res.image
    assert np.isfinite(img).all() and img.max() > 0.0
