"""Full (s,t)-MIS BDPT tests (integrators/veach.py — reference
src/integrators/bidirpath.cc role, SURVEY §2.10).

The partition-variant tests live in test_bidir.py; these gate the full
Veach implementation: strategy completeness (means match PT), MIS
sanity (no fireflies from wrong weights on a glossy scene), and the
t=1 splat measure (light image is consistent with the eye image)."""
import numpy as np
import pytest

from libyafaray_tpu.scene.params import ParamMap
from libyafaray_tpu.scene.scene import Scene


pytestmark = pytest.mark.slow  # full engine renders (compile-heavy); quick tier skips

def _scene(integrator, extra_mats=(), sphere_mat=None,
           power=8.0, res=32, spp=8, lights=None):
    """lights: None -> the default area light; otherwise a list of
    (name, params) created INSTEAD (never clear s.lights after creation —
    an area light's synthetic panel tris would stay behind, orphaned)."""
    s = Scene()
    s.create_material("white", ParamMap({
        "type": "shinydiffusemat", "color": (0.7, 0.7, 0.7)}))
    for name, params in extra_mats:
        s.create_material(name, ParamMap(params))
    if lights is None:
        lights = [("L", {
            "type": "arealight", "corner": (-0.4, -0.4, 1.98),
            "point1": (-0.4, 0.4, 1.98), "point2": (0.4, -0.4, 1.98),
            "power": power, "color": (1.0, 1.0, 1.0), "samples": 4})]
    for lname, lparams in lights:
        s.create_light(lname, ParamMap(lparams))
    m = s.start_tri_mesh()
    for (x, y, z) in ((-2, -2, 0), (2, -2, 0), (2, 2, 0), (-2, 2, 0),
                      (-2, 2, 0), (2, 2, 0), (2, 2, 3), (-2, 2, 3)):
        s.add_vertex(float(x), float(y), float(z))
    s.add_triangle(0, 1, 2, "white")
    s.add_triangle(0, 2, 3, "white")
    s.add_triangle(4, 5, 6, "white")
    s.add_triangle(4, 6, 7, "white")
    s.end_tri_mesh()
    if sphere_mat:
        s.add_sphere((0.0, 0.0, 0.7), 0.55, sphere_mat)
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": res, "resy": res,
        "from": (0.0, -5.0, 1.2), "to": (0.0, 0.0, 0.9),
        "up": (0.0, -5.0, 2.2), "focal": 1.4}))
    s.create_integrator("default", ParamMap({
        "type": integrator, "bounces": 3, "raydepth": 4,
        "photons": 8192, "photon_bounces": 4}))
    s.render_params = ParamMap({
        "width": res, "height": res, "AA_minsamples": spp,
        "integrator_name": "default", "camera_name": "cam"})
    return s


def test_veach_matches_pt_diffuse():
    """All strategies + MIS on a diffuse box must reproduce the path
    tracer (same transport, different estimator)."""
    from libyafaray_tpu.scene.session import render_scene

    img_bd = render_scene(_scene("bidirectional", spp=16)).image
    img_pt = render_scene(_scene("pathtracing", spp=16)).image
    assert np.isfinite(img_bd).all()
    m_bd, m_pt = float(img_bd.mean()), float(img_pt.mean())
    assert abs(m_bd - m_pt) / max(m_pt, 1e-6) < 0.06, (m_bd, m_pt)
    # per-region agreement (floor / back wall), not just global mean
    for region in ((slice(18, 30), slice(4, 28)),
                   (slice(8, 16), slice(6, 26))):
        r_bd = float(img_bd[region].mean())
        r_pt = float(img_pt[region].mean())
        assert abs(r_bd - r_pt) / max(r_pt, 1e-6) < 0.10, (
            region, r_bd, r_pt)


def test_veach_matches_pt_glossy():
    """MIS weights must stay consistent with a non-delta glossy lobe in
    the chain (exercises pdf_rev bookkeeping through eval/pdf lobes)."""
    from libyafaray_tpu.scene.session import render_scene

    mats = (("gl", {"type": "glossy", "color": (0.6, 0.6, 0.6),
                    "diffuse_reflect": 0.3, "glossy_reflect": 0.6,
                    "exponent": 40.0}),)
    img_bd = render_scene(
        _scene("bidirectional", extra_mats=mats, sphere_mat="gl",
               spp=16)).image
    img_pt = render_scene(
        _scene("pathtracing", extra_mats=mats, sphere_mat="gl",
               spp=16)).image
    assert np.isfinite(img_bd).all()
    m_bd, m_pt = float(img_bd.mean()), float(img_pt.mean())
    assert abs(m_bd - m_pt) / max(m_pt, 1e-6) < 0.08, (m_bd, m_pt)


def test_veach_point_light():
    """Delta-position lights: s=0 impossible, s=1 delta handling, light
    subpaths from a point emitter."""
    from libyafaray_tpu.scene.session import render_scene

    def mk(integrator):
        return _scene(integrator, spp=16, lights=[("P", {
            "type": "pointlight", "from": (0.0, 0.0, 1.9),
            "power": 6.0, "color": (1.0, 1.0, 1.0)})])

    img_bd = render_scene(mk("bidirectional")).image
    img_pt = render_scene(mk("pathtracing")).image
    assert np.isfinite(img_bd).all()
    m_bd, m_pt = float(img_bd.mean()), float(img_pt.mean())
    assert abs(m_bd - m_pt) / max(m_pt, 1e-6) < 0.06, (m_bd, m_pt)


def test_veach_first_hit_aovs():
    """BDPT renders fill the first-hit AOV planes (z/normal) like the
    engine integrators do."""
    from libyafaray_tpu.scene.session import render_scene

    s = _scene("bidirectional", res=16, spp=2)
    s.render_params["render_passes"] = "z-depth-norm normal-smooth"
    res = render_scene(s)
    p = res.passes
    assert float(np.abs(p["z-depth-norm"]).mean()) > 0.0
    assert float(np.abs(p["normal-smooth"]).mean()) > 0.0


def test_veach_multidevice_equals_single_device():
    """BDPT on the 8-device film-row mesh must reproduce the
    single-device image (same wiring criterion the engine integrators
    meet; the t=1 splat plane is GSPMD-reduced to a replicated output,
    so only float reduction order may differ)."""
    from libyafaray_tpu.integrators.veach import render_bdpt
    from libyafaray_tpu.parallel.mesh import make_device_mesh
    from libyafaray_tpu.scene.session import build_config

    s = _scene("bidirectional", res=16, spp=2)
    cfg = build_config(s)
    cs = s.compile()
    img1 = render_bdpt(cs, cfg).image
    mesh = make_device_mesh(8)
    img8 = render_bdpt(cs, cfg, mesh=mesh).image
    assert np.abs(img8 - img1).max() <= 1e-4, np.abs(img8 - img1).max()


def test_veach_sun_directional_lights():
    """Lights outside the BDPT strategy set (sun/directional: zero pick
    pmf, not hittable) must still illuminate via the weight-1 eye-side
    NEE — they rendered black before the eye-only pass existed."""
    from libyafaray_tpu.scene.session import render_scene

    def mk(integrator):
        # `direction` points TOWARD the emitter (reference convention)
        return _scene(integrator, res=16, spp=4, lights=[
            ("S", {"type": "sunlight", "direction": (0.3, 0.3, 1.0),
                   "power": 2.0, "color": (1.0, 1.0, 1.0), "angle": 0.5}),
            ("D", {"type": "directional", "direction": (-0.2, 0.1, 1.0),
                   "power": 1.0, "color": (1.0, 0.9, 0.8)})])

    img_bd = render_scene(mk("bidirectional")).image
    img_pt = render_scene(mk("pathtracing")).image
    m_bd, m_pt = float(img_bd.mean()), float(img_pt.mean())
    assert m_bd > 1e-3, "sun/directional render black under BDPT"
    assert abs(m_bd - m_pt) / max(m_pt, 1e-6) < 0.08, (m_bd, m_pt)
