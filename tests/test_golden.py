"""Cross-integrator convergence gate (SURVEY §4.3/§4.5).

The three photon-transport algorithms must converge to the same Cornell
image — the physics-parity proxy in lieu of a runnable reference binary
(SURVEY §0).  Goldens are produced by scripts/make_goldens.py on the CPU
backend and checked in under scenes/goldens/.
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "scenes",
                          "goldens")
NAMES = ("pathtracing", "photonmapping", "SPPM")


def _load(name):
    from libyafaray_tpu.io.exr import read_exr

    path = os.path.join(GOLDEN_DIR, f"cornell_{name}.exr")
    if not os.path.exists(path):
        pytest.skip("goldens not generated (scripts/make_goldens.py)")
    return read_exr(path)


def test_goldens_pairwise_convergence():
    """PT ↔ photonmapping+FG ↔ SPPM pairwise RMSE on the identical
    Cornell scene.  Residual differences are MC noise + the biased
    estimators' kernel radii; the bound catches double-counting or
    missing-transport bugs (which show up as ≥5-10% shifts)."""
    imgs = {n: _load(n) for n in NAMES}
    for i, a in enumerate(NAMES):
        for b in NAMES[i + 1:]:
            rmse = float(np.sqrt(np.mean((imgs[a] - imgs[b]) ** 2)))
            assert rmse < 0.035, (a, b, rmse)
            # mean brightness agreement (energy conservation cross-check)
            ma, mb = float(imgs[a].mean()), float(imgs[b].mean())
            assert abs(ma - mb) / max(ma, mb) < 0.08, (a, b, ma, mb)


@pytest.mark.slow
def test_render_matches_golden_pathtracing():
    """A fresh (lower-spp) pathtracing render agrees with its stored
    golden within MC-noise RMSE — the regression gate for the whole
    pipeline (camera/QMC/BSDF/NEE/film)."""
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.render import render

    golden = _load("pathtracing")
    size = golden.shape[0]
    s = parse_xml_file(os.path.join(os.path.dirname(__file__), "..",
                                    "scenes", "cornell.xml"))
    s.render_params["width"] = size
    s.render_params["height"] = size
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "pathtracing",
                          "bounces": 6, "rr_min_bounces": 2,
                          "width": size, "height": size,
                          "aa_samples": 64, "aa_passes": 1})
    img = render(s.compile(), cfg).image
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    assert rmse < 0.02, rmse


def _fresh_render_rmse(scene_name, golden_file, spp):
    """Render scene_name at the golden's size with `spp` samples via
    the session dispatch (the scene's own integrator) and return RMSE
    vs the stored golden."""
    from libyafaray_tpu.io.exr import read_exr
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import render_scene

    path = os.path.join(GOLDEN_DIR, golden_file)
    if not os.path.exists(path):
        pytest.skip("goldens not generated (scripts/make_goldens.py)")
    golden = read_exr(path)
    size = golden.shape[0]
    s = parse_xml_file(os.path.join(os.path.dirname(__file__), "..",
                                    "scenes", f"{scene_name}.xml"))
    s.render_params["width"] = size
    s.render_params["height"] = size
    s.render_params["AA_minsamples"] = spp
    s.render_params["AA_passes"] = 1
    img = render_scene(s).image
    return float(np.sqrt(np.mean((img - golden) ** 2)))


@pytest.mark.slow
def test_render_matches_golden_ibl_spheres():
    """IBL/environment physics gate (VERDICT r4 #6): a fresh
    ibl_spheres render agrees with its golden within MC noise —
    regressions in background importance sampling, EWA texture lookup
    or glossy/glass BSDFs surface here."""
    rmse = _fresh_render_rmse("ibl_spheres", "ibl_spheres.exr", 48)
    # measured 0.040 at 48spp vs the 192spp golden (fireflies off the
    # glossy/glass spheres dominate); a physics regression in the env
    # CDF/alias weighting shifts this by >0.1
    assert rmse < 0.05, rmse


@pytest.mark.slow
def test_render_matches_golden_bidir():
    """BDPT gate (VERDICT r4 #6): a fresh cornell_bidir render agrees
    with its golden within MC noise — regressions in the (s,t)-MIS
    weights or light-path transport surface here."""
    rmse = _fresh_render_rmse("cornell_bidir", "cornell_bidir.exr", 48)
    assert rmse < 0.035, rmse
