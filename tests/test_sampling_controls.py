"""Per-material sampling controls + camera knobs (reference material.h
additionalDepth/samplingFactor [M], angularCamera mirrored/max_angle,
shinydiff IOR_shader [M])."""
import pytest
import numpy as np
import jax.numpy as jnp

from libyafaray_tpu.scene.scene import Scene
from libyafaray_tpu.scene.params import ParamMap
from libyafaray_tpu.scene.session import build_config
from libyafaray_tpu.integrators.render import render


pytestmark = pytest.mark.slow  # full engine renders (compile-heavy); quick tier skips

def _corridor_scene(additional_depth: int, res=8):
    """Camera behind a stack of 3 fully transparent quads, bright constant
    background: reaching the background needs 3 path vertices, one per
    quad, so with bounces=2 the escape is only found when the quads'
    material raises the depth budget via additionaldepth."""
    s = Scene()
    s.create_material("pane", ParamMap({
        "type": "shinydiffusemat", "transparency": 1.0,
        "diffuse_reflect": 0.0,
        "additionaldepth": additional_depth,
    }))
    for i in range(3):
        y = 1.0 + 0.5 * i
        a, b = (-5.0, y, -5.0), (5.0, y, -5.0)
        c, d = (5.0, y, 5.0), (-5.0, y, 5.0)
        s.add_triangle(a, b, c, "pane")
        s.add_triangle(a, c, d, "pane")
    s.create_background("bg", ParamMap({
        "type": "constant", "color": (1.0, 1.0, 1.0)}))
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": res, "resy": res,
        "from": (0.0, -2.0, 0.0), "to": (0.0, 0.0, 0.0),
        "up": (0.0, -2.0, 1.0), "focal": 1.8,
    }))
    s.create_integrator("default", ParamMap({
        "type": "pathtracing", "bounces": 2, "raydepth": 2,
    }))
    s.render_params = ParamMap({
        "width": res, "height": res, "AA_minsamples": 4,
        "integrator_name": "default", "camera_name": "cam",
    })
    return s


def test_additional_depth_extends_budget():
    s0 = _corridor_scene(0)
    c0 = s0.compile()
    assert c0.static.max_additional_depth == 0
    img0 = render(c0, build_config(s0)).image
    # 3 panes > 2-bounce budget: background unreachable
    assert img0.mean() < 1e-3, img0.mean()

    s1 = _corridor_scene(1)
    c1 = s1.compile()
    assert c1.static.max_additional_depth == 1
    img1 = render(c1, build_config(s1)).image
    # additionaldepth=1 raises the per-lane budget to 3: bright
    assert img1.mean() > 0.9, img1.mean()


def test_sampling_factor_plane_and_threshold():
    """samplingFactor: the primary-hit factor plane accumulates under
    adaptive AA and scales the noise threshold per pixel."""
    s = _corridor_scene(0)
    # replace pane material: opaque diffuse with samplingfactor=8
    s.create_material("pane", ParamMap({
        "type": "shinydiffusemat", "color": (0.5, 0.5, 0.5),
        "samplingfactor": 8.0,
    }))
    s.create_integrator("default", ParamMap({
        "type": "pathtracing", "bounces": 2, "raydepth": 2,
        "AA_passes": 2, "AA_inc_samples": 2, "AA_threshold": 0.05,
    }))
    c = s.compile()
    assert c.static.has_sampling_factor
    cfg = build_config(s)
    assert cfg.aa_passes == 2
    res = render(c, cfg)
    assert "aov_samp_factor" in res.film
    sfac = np.asarray(res.film["aov_samp_factor"][..., 0]
                      / np.maximum(np.asarray(res.film["nsamples"]), 1.0))
    # every camera ray hits the pane -> factor 8 everywhere
    assert abs(sfac.mean() - 8.0) < 1e-3, sfac.mean()

    from libyafaray_tpu.film.imagefilm import compute_aa_flags

    flags_hi = compute_aa_flags(res.film, 1e9)
    # scaling the huge threshold down by 8 per pixel must flag >= pixels
    flags_lo = compute_aa_flags(res.film, 1e9,
                                threshold_scale=jnp.full(
                                    (cfg.height, cfg.width), 1e-12))
    assert int(flags_lo.sum()) >= int(flags_hi.sum())


def test_angular_mirrored_and_max_angle():
    from libyafaray_tpu.cameras.base import Camera, CAM_ANGULAR, shoot_rays

    base = dict(cam_type=CAM_ANGULAR, resx=16, resy=16, angle_deg=180.0)
    cam = Camera(**base)
    camm = Camera(**base, mirrored=True)
    px = jnp.asarray([4.0, 12.0])
    py = jnp.asarray([8.0, 8.0])
    lu = lv = jnp.zeros(2)
    _, d0, w0 = shoot_rays(cam, px, py, lu, lv)
    _, dm, wm = shoot_rays(camm, px, py, lu, lv)
    # mirrored: left pixel's ray equals the unmirrored right pixel's ray
    np.testing.assert_allclose(np.asarray(dm[0]), np.asarray(d0[1]),
                               atol=1e-6)
    assert float(w0.min()) > 0.0

    # max_angle masks rays beyond the half-angle even inside the fov
    camc = Camera(**base, max_angle_deg=40.0)
    pxs = jnp.linspace(0.5, 15.5, 16)
    pys = jnp.full((16,), 8.0)
    _, _, wc = shoot_rays(camc, pxs, pys, jnp.zeros(16), jnp.zeros(16))
    _, _, wf = shoot_rays(cam, pxs, pys, jnp.zeros(16), jnp.zeros(16))
    assert int((wc > 0).sum()) < int((wf > 0).sum())
    # center stays unmasked
    assert float(wc[8]) > 0.0


def test_ior_shader_resolves_and_renders():
    """IOR_shader: the shader scalar drives the per-lane fresnel IOR."""
    s = Scene()
    s.create_texture("iortex", ParamMap({
        "type": "clouds", "size": 2.0,
    }))
    s.create_material("m", ParamMap({
        "type": "shinydiffusemat", "color": (0.6, 0.6, 0.6),
        "specular_reflect": 0.4, "fresnel_effect": True, "IOR": 1.5,
        "IOR_shader": "iortex",
    }))
    mid = s.material_names["m"]
    assert s.materials[mid]["tex_ior"] >= 0
    s.create_background("bg", ParamMap({
        "type": "constant", "color": (0.8, 0.8, 0.8)}))
    a, b = (-5.0, 2.0, -5.0), (5.0, 2.0, -5.0)
    c, d = (5.0, 2.0, 5.0), (-5.0, 2.0, 5.0)
    s.add_triangle(a, b, c, "m")
    s.add_triangle(a, c, d, "m")
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": 8, "resy": 8,
        "from": (0.0, -2.0, 0.0), "to": (0.0, 0.0, 0.0),
        "up": (0.0, -2.0, 1.0), "focal": 1.8,
    }))
    s.create_integrator("default", ParamMap({
        "type": "pathtracing", "bounces": 2, "raydepth": 2,
    }))
    s.render_params = ParamMap({
        "width": 8, "height": 8, "AA_minsamples": 4,
        "integrator_name": "default", "camera_name": "cam",
    })
    img = render(s.compile(), build_config(s)).image
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
