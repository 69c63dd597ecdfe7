"""Bidirectional integrator tests (integrators/bidir.py — reference
src/integrators/bidirpath.cc role, SURVEY §2.10)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libyafaray_tpu.scene.params import ParamMap
from libyafaray_tpu.scene.scene import Scene


def _box_scene(integrator, extra_mats=()):
    """Small box: diffuse walls, point-ish area light; optional glass
    sphere for the caustic test."""
    s = Scene()
    s.create_material("white", ParamMap({
        "type": "shinydiffusemat", "color": (0.7, 0.7, 0.7)}))
    for name, params in extra_mats:
        s.create_material(name, ParamMap(params))
    s.create_light("L", ParamMap({
        "type": "arealight", "corner": (-0.4, -0.4, 1.98),
        "point1": (-0.4, 0.4, 1.98), "point2": (0.4, -0.4, 1.98),
        "power": 8.0, "color": (1.0, 1.0, 1.0), "samples": 4}))
    m = s.start_tri_mesh()
    # floor + back wall
    for (x, y, z) in ((-2, -2, 0), (2, -2, 0), (2, 2, 0), (-2, 2, 0),
                      (-2, 2, 0), (2, 2, 0), (2, 2, 3), (-2, 2, 3)):
        s.add_vertex(float(x), float(y), float(z))
    s.add_triangle(0, 1, 2, "white")
    s.add_triangle(0, 2, 3, "white")
    s.add_triangle(4, 5, 6, "white")
    s.add_triangle(4, 6, 7, "white")
    s.end_tri_mesh()
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": 32, "resy": 32,
        "from": (0.0, -5.0, 1.2), "to": (0.0, 0.0, 0.9),
        "up": (0.0, -5.0, 2.2), "focal": 1.4}))
    s.create_integrator("default", ParamMap({
        "type": integrator, "bounces": 3, "raydepth": 4,
        # pin the PARTITION variant (integrators/bidir.py) — the full
        # (s,t)-MIS default is covered by tests/test_veach.py
        "full_mis": False,
        "photons": 8192, "photon_bounces": 4}))
    s.render_params = ParamMap({
        "width": 32, "height": 32, "AA_minsamples": 8,
        "integrator_name": "default", "camera_name": "cam"})
    return s


def test_light_trace_splat_matches_pathtracer():
    """CALIBRATION: light tracing over ALL diffuse vertices must
    reproduce the path tracer's image (direct+indirect) — pins the
    camera-connection splat weight (We measure, focal², pixel area)."""
    from libyafaray_tpu.integrators.bidir import make_light_trace_pass
    from libyafaray_tpu.integrators.photonmap import _light_cdf
    from libyafaray_tpu.integrators.render import device_put_scene, render
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig

    s = _box_scene("pathtracing")
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "pathtracing",
                          "bounces": 3, "width": 32, "height": 32,
                          "aa_samples": 48, "aa_passes": 1,
                          "photons": 16384, "photon_bounces": 4})
    cs = s.compile()
    img_pt = render(cs, cfg).image

    arrays = device_put_scene(cs)
    cdf, total_flux = _light_cdf(cs.static, arrays)
    lt = make_light_trace_pass(cs, cfg, mode="diffuse")
    splat = jnp.zeros((32, 32, 3), jnp.float32)
    n_em = 0
    for p in range(6):
        plane, lanes = lt(arrays, jnp.asarray(cdf), total_flux, 99 + p)
        splat = splat + plane
        n_em += lanes
    img_lt = np.asarray(splat) / n_em

    # compare SURFACE regions (light tracing has no s=0 strategy: the
    # directly-visible light panel is the eye strategy's by construction,
    # so global means differ by the panel pixels)
    for region in ((slice(18, 30), slice(4, 28)),    # floor
                   (slice(8, 16), slice(6, 26))):    # back wall
        m_pt = float(img_pt[region].mean())
        m_lt = float(img_lt[region].mean())
        assert m_pt > 1e-3
        assert abs(m_lt - m_pt) / m_pt < 0.25, (region, m_pt, m_lt)


def test_bidirectional_runs_and_matches_pt_on_diffuse_scene():
    """On a purely diffuse scene the caustic family is empty: the
    bidirectional result must equal plain path tracing (light strategy
    contributes ~nothing, eye strategy excludes nothing)."""
    from libyafaray_tpu.scene.session import render_scene

    img_bd = render_scene(_box_scene("bidirectional")).image
    img_pt = render_scene(_box_scene("pathtracing")).image
    assert np.isfinite(img_bd).all()
    m_bd, m_pt = float(img_bd.mean()), float(img_pt.mean())
    assert abs(m_bd - m_pt) / max(m_pt, 1e-6) < 0.05, (m_bd, m_pt)
