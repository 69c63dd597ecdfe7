"""Glass dispersion + non-perspective cameras + bokeh shapes (the
untested paths VERDICT r2 Weak #7 lists: nothing exercised dispersion,
architect/angular/equirectangular cameras, or bokeh warps)."""
import pytest
import numpy as np
import jax.numpy as jnp

from libyafaray_tpu.scene.params import ParamMap


def _glass_row(n, dispersion=0.01):
    from libyafaray_tpu.materials.base import (build_material_table,
                                               gather_rows)
    from libyafaray_tpu.materials.factory import material_row_from_params

    row = material_row_from_params(ParamMap({
        "type": "glass", "IOR": 1.55,
        "dispersion_power": dispersion,
        "filter_color": (1.0, 1.0, 1.0),
    }), {}, {})
    table = build_material_table([row])
    return gather_rows(table, jnp.zeros((n,), jnp.int32))


@pytest.mark.slow
def test_glass_dispersion_samples_wavelengths_and_spreads():
    """Chromatic lanes through dispersive glass: a wavelength is sampled,
    the refracted angle varies with it (Cauchy), and the wl->RGB weights
    average to white over the spectrum (App. B glass rules)."""
    from libyafaray_tpu.materials import bsdf

    n = 4096
    rng = np.random.default_rng(5)
    row = _glass_row(n)
    nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    # oblique incident direction (45 deg)
    wo = jnp.tile(jnp.asarray([[np.sqrt(0.5), 0.0, np.sqrt(0.5)]],
                              jnp.float32), (n, 1))
    u1 = jnp.asarray(rng.random(n), jnp.float32)
    u2 = jnp.asarray(rng.random(n), jnp.float32)
    ul = jnp.asarray(rng.random(n), jnp.float32)
    wl = jnp.full((n,), -1.0, jnp.float32)  # chromatic
    smp = bsdf.sample_bsdf(row, nrm, nrm, wo, u1, u2, ul, wavelength=wl)

    tr = np.asarray(smp["transmit"]) & np.asarray(smp["valid"])
    assert tr.sum() > n // 4
    new_wl = np.asarray(smp["new_wavelength"])
    # every sampled lane got a wavelength in [0,1]
    assert (new_wl[tr] >= 0.0).all() and (new_wl[tr] <= 1.0).all()
    # refraction angle varies monotonically-ish with wavelength: compare
    # the transmitted x-component between the spectrum ends
    wi = np.asarray(smp["wi"])
    lo = tr & (new_wl < 0.2)
    hi = tr & (new_wl > 0.8)
    assert lo.sum() > 50 and hi.sum() > 50
    assert abs(wi[lo, 0].mean() - wi[hi, 0].mean()) > 1e-4

    from libyafaray_tpu.core.color import wl_to_rgb

    grid = jnp.linspace(0.0, 1.0, 2048)
    mean_rgb = np.asarray(jnp.mean(wl_to_rgb(grid), axis=0))
    assert np.all(np.abs(mean_rgb - 1.0) < 0.15), mean_rgb
    # a non-dispersive glass keeps lanes chromatic
    row0 = _glass_row(n, dispersion=0.0)
    smp0 = bsdf.sample_bsdf(row0, nrm, nrm, wo, u1, u2, ul, wavelength=wl)
    assert (np.asarray(smp0["new_wavelength"]) < 0.0).all()


def _cam(params):
    from libyafaray_tpu.cameras.factory import camera_from_params

    return camera_from_params(ParamMap(dict(params)))


def _shoot(cam, px, py, lu=0.5, lv=0.5):
    from libyafaray_tpu.cameras.base import shoot_rays

    n = len(px)
    org, d, wt = shoot_rays(
        cam, jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
        jnp.full((n,), lu, jnp.float32), jnp.full((n,), lv, jnp.float32))
    return np.asarray(org), np.asarray(d), np.asarray(wt)


BASE = {"from": (1.0, 2.0, 3.0), "to": (1.0, 2.0, 0.0),
        "up": (1.0, 3.0, 3.0), "resx": 64, "resy": 64}


def test_equirectangular_covers_sphere():
    cam = _cam({**BASE, "type": "equirectangular"})
    org, d, _ = _shoot(cam, [32.0, 0.0, 64.0], [32.0, 32.0, 32.0])
    fwd = np.array([0.0, 0.0, -1.0])
    # center pixel looks forward
    assert np.allclose(d[0], fwd, atol=1e-2)
    # px=0 and px=res look backward (azimuth +-pi) and agree (wraparound)
    assert np.dot(d[1], fwd) < -0.9
    assert np.allclose(d[1], d[2], atol=1e-2)
    # full rows are unit + finite
    px = np.linspace(0.01, 63.99, 128)
    _, dd, _ = _shoot(cam, px, np.full(128, 10.0))
    assert np.allclose(np.linalg.norm(dd, axis=1), 1.0, atol=1e-4)


def test_angular_fisheye_angle_proportional_to_radius():
    # convention (cameras/base.py): `angle` = full FOV; edge pixel sits
    # at angle/2 from the axis, and angle grows linearly with radius
    cam = _cam({**BASE, "type": "angular", "angle": 90.0})
    org, d, wt = _shoot(cam, [32.0, 48.0, 63.9], [32.0, 32.0, 32.0])
    fwd = np.array([0.0, 0.0, -1.0])
    assert np.allclose(d[0], fwd, atol=1e-2)
    ang = np.degrees(np.arccos(np.clip(d[1] @ fwd, -1, 1)))
    assert abs(ang - 22.5) < 1.5  # half radius -> half of 45
    ang2 = np.degrees(np.arccos(np.clip(d[2] @ fwd, -1, 1)))
    assert abs(ang2 - 45.0) < 1.5  # edge -> angle/2


def test_orthographic_parallel_rays():
    cam = _cam({**BASE, "type": "orthographic", "scale": 2.0})
    org, d, _ = _shoot(cam, [8.0, 56.0], [8.0, 56.0])
    assert np.allclose(d[0], d[1], atol=1e-6)  # parallel
    assert np.linalg.norm(org[0] - org[1]) > 0.5  # origins offset


def test_architect_keeps_verticals():
    cam = _cam({**BASE, "type": "architect",
                "from": (0.0, -3.0, 1.0), "to": (0.0, 0.0, 2.0),
                "up": (0.0, -3.0, 2.0)})
    # two pixels in the same column: architect removes the vertical
    # convergence, so both rays stay in the same vertical plane
    org, d, _ = _shoot(cam, [20.0, 20.0], [10.0, 54.0])
    # plane through origin spanned by world-up x ray0: ray1's horizontal
    # component must match ray0's
    assert abs(d[0][0] - d[1][0]) < 1e-5


def _lens_offsets(cam, n=4096):
    rng = np.random.default_rng(7)
    from libyafaray_tpu.cameras.base import shoot_rays

    org, d, _ = shoot_rays(
        cam, jnp.full((n,), 32.0), jnp.full((n,), 32.0),
        jnp.asarray(rng.random(n), jnp.float32),
        jnp.asarray(rng.random(n), jnp.float32))
    off = np.asarray(org) - np.asarray(cam.origin, np.float32)
    right = np.asarray(cam.right, np.float32)
    up = np.asarray(cam.up, np.float32)
    return off @ right, off @ up


def test_bokeh_shapes():
    base = {**BASE, "type": "perspective", "aperture": 0.5,
            "dof_distance": 3.0}
    # ring: all lens samples on the unit circle (no center coverage)
    xr, yr = _lens_offsets(_cam({**base, "bokeh_type": "ring"}))
    r = np.hypot(xr, yr)
    assert r.min() > 0.9 * r.max()
    # triangle: samples fill a 3-gon — center covered, 3 corners present
    xt, yt = _lens_offsets(_cam({**base, "bokeh_type": "triangle"}))
    rt = np.hypot(xt, yt)
    assert rt.min() < 0.1 * rt.max()
    # a triangle's area/circumradius² = 3*sqrt(3)/4 ≈ 1.3 vs disk pi:
    # mean radius of uniform triangle samples is well below the disk's
    xd, yd = _lens_offsets(_cam({**base, "bokeh_type": "disk1"}))
    rd = np.hypot(xd, yd)
    assert rt.mean() < 0.85 * rd.max()
    # disk1: concentric map covers the full disk uniformly
    assert rd.min() < 0.1 * rd.max() and rd.max() <= 0.51


def test_dof_focuses_at_distance():
    """Rays from different lens points intersect at the focal plane."""
    cam = _cam({**BASE, "type": "perspective", "aperture": 0.4,
                "dof_distance": 3.0, "focal": 1.2})
    from libyafaray_tpu.cameras.base import shoot_rays

    org, d, _ = shoot_rays(
        cam, jnp.full((2,), 20.0), jnp.full((2,), 40.0),
        jnp.asarray([0.1, 0.9], jnp.float32),
        jnp.asarray([0.2, 0.8], jnp.float32))
    org = np.asarray(org)
    d = np.asarray(d)
    fwd = np.asarray(cam.fwd, np.float32)
    # advance each ray to depth 3 along fwd; both land at the same point
    t0 = 3.0 / (d[0] @ fwd)
    t1 = 3.0 / (d[1] @ fwd)
    p0 = org[0] + t0 * d[0]
    p1 = org[1] + t1 * d[1]
    assert np.linalg.norm(p0 - p1) < 1e-3
