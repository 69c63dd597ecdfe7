"""Volume integrators (analytic slab checks — SURVEY §4.2), film
save/load resume, caustic-map-in-pathtracer smoke."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from libyafaray_tpu.scene.params import ParamMap
from libyafaray_tpu.volumes.factory import volume_from_params


def test_homogeneous_slab_transmittance_analytic():
    """Uniform volume: T == exp(-sigma_t * overlap) exactly."""
    from libyafaray_tpu.volumes.integrate import transmittance

    vol = volume_from_params(ParamMap({
        "type": "UniformVolume", "sigma_a": 0.3, "sigma_s": 0.2,
        "minX": -1.0, "maxX": 1.0, "minY": -1.0, "maxY": 1.0,
        "minZ": -1.0, "maxZ": 1.0,
    }))
    org = jnp.asarray([[0.0, -5.0, 0.0], [0.0, -5.0, 3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    dist = jnp.asarray([100.0, 100.0], jnp.float32)
    tr = np.asarray(transmittance((vol,), org, d, dist))
    assert np.isclose(tr[0], np.exp(-0.5 * 2.0), atol=1e-5)  # crosses slab
    assert np.isclose(tr[1], 1.0)  # misses the box


def test_exp_density_transmittance_monotonic():
    from libyafaray_tpu.volumes.integrate import transmittance

    vol = volume_from_params(ParamMap({
        "type": "ExpDensityVolume", "sigma_a": 0.5, "sigma_s": 0.0,
        "a": 1.0, "b": 2.0,
        "minX": -1.0, "maxX": 1.0, "minY": -1.0, "maxY": 1.0,
        "minZ": 0.0, "maxZ": 2.0,
    }))
    # horizontal rays at increasing height: less density -> more T
    org = jnp.asarray([[-5.0, 0.0, 0.1], [-5.0, 0.0, 1.0],
                       [-5.0, 0.0, 1.9]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]] * 3, jnp.float32)
    dist = jnp.full((3,), 100.0, jnp.float32)
    tr = np.asarray(transmittance((vol,), org, d, dist))
    assert tr[0] < tr[1] < tr[2] < 1.0


def test_grid_volume_df3_roundtrip(tmp_path):
    from libyafaray_tpu.volumes.factory import read_df3
    from libyafaray_tpu.volumes.integrate import _density

    g = (np.arange(8, dtype=np.float32).reshape(2, 2, 2) / 7.0)
    path = tmp_path / "t.df3"
    with open(path, "wb") as f:
        f.write((2).to_bytes(2, "big") * 3)
        f.write((g.reshape(-1) * 255).astype(">u1").tobytes())
    back = read_df3(str(path))
    assert back.shape == (2, 2, 2)
    assert np.allclose(back, g, atol=1 / 255)

    vol = volume_from_params(ParamMap({
        "type": "GridVolume", "density_file": str(path),
        "minX": 0.0, "maxX": 1.0, "minY": 0.0, "maxY": 1.0,
        "minZ": 0.0, "maxZ": 1.0, "sigma_a": 1.0,
    }))
    p = jnp.asarray([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9], [2.0, 2.0, 2.0]],
                    jnp.float32)
    dens = np.asarray(_density(vol, p))
    assert dens[0] < dens[1]  # increasing values along the grid
    assert dens[2] == 0.0  # outside


@pytest.mark.slow
def test_volume_render_darkens_background():
    """A absorbing slab in front of a bright background dims it through the
    CLI-equivalent render path (EmissionIntegrator with l_e=0)."""
    from libyafaray_tpu.scene.scene import Scene
    from libyafaray_tpu.scene.session import render_scene

    def build(with_vol):
        s = Scene()
        s.create_background("bg", ParamMap({"type": "constant",
                                            "color": (1.0, 1.0, 1.0)}))
        s.create_camera("cam", ParamMap({
            "type": "perspective", "resx": 16, "resy": 16,
            "from": (0.0, -5.0, 0.0), "to": (0.0, 0.0, 0.0),
            "up": (0.0, -5.0, 1.0), "focal": 1.0,
        }))
        if with_vol:
            s.create_volume_region("v", ParamMap({
                "type": "UniformVolume", "sigma_a": 0.5, "sigma_s": 0.0,
                "minX": -3.0, "maxX": 3.0, "minY": -1.0, "maxY": 1.0,
                "minZ": -3.0, "maxZ": 3.0,
            }))
        s.create_integrator("default", ParamMap({
            "type": "directlighting", "raydepth": 1}))
        s.create_integrator("volintegr", ParamMap({
            "type": "EmissionIntegrator", "stepSize": 0.2}))
        s.render_params = ParamMap({
            "width": 16, "height": 16, "AA_minsamples": 1,
            "camera_name": "cam", "integrator_name": "default",
            "volintegrator_name": "volintegr",
        })
        return render_scene(s).image

    bright = build(False)
    dimmed = build(True)
    assert np.isclose(bright.mean(), 1.0, atol=1e-3)
    # central ray crosses the 2-unit slab perpendicular: T = exp(-1);
    # oblique rays cross more, so the mean sits slightly below
    assert np.isclose(dimmed[8, 8].mean(), np.exp(-1.0), atol=0.02), \
        dimmed[8, 8]
    assert dimmed.mean() <= np.exp(-1.0) + 0.01


def test_film_save_load_resume(tmp_path):
    from libyafaray_tpu.film.imagefilm import film_init, film_save, \
        film_load, film_image

    film = film_init(8, 8)
    film["wsum"] = jnp.ones((8, 8, 3)) * 2.0
    film["w"] = jnp.ones((8, 8)) * 2.0
    film["rays"] = jnp.asarray(123.0)
    path = str(tmp_path / "f.npz")
    film_save(path, film, {"cfg": "X"}, pass_idx=3)
    loaded = film_load(path, {"cfg": "X"})
    assert loaded is not None
    f2, p = loaded
    assert p == 3
    assert np.allclose(np.asarray(film_image(f2)), 1.0)
    # param hash guard rejects mismatched configs
    assert film_load(path, {"cfg": "Y"}) is None


@pytest.mark.slow
def test_pathtracer_caustic_map_smoke():
    """caustic_type=photon builds a caustic map and renders (glass sphere
    over a floor under a point light)."""
    from libyafaray_tpu.scene.scene import Scene
    from libyafaray_tpu.scene.session import render_scene

    s = Scene()
    s.create_material("floor", ParamMap({
        "type": "shinydiffusemat", "color": (0.7, 0.7, 0.7)}))
    s.create_material("glass", ParamMap({"type": "glass", "IOR": 1.5}))
    s.create_background("bg", ParamMap({"type": "constant",
                                        "color": (0.0, 0.0, 0.0)}))
    m = s.start_tri_mesh()
    for p in ((-3, -3, 0), (3, -3, 0), (3, 3, 0), (-3, 3, 0)):
        s.add_vertex(*p)
    s.add_triangle(0, 1, 2, "floor")
    s.add_triangle(0, 2, 3, "floor")
    s.end_tri_mesh()
    s.add_sphere((0.0, 0.0, 1.2), 0.7, "glass")
    s.create_light("L", ParamMap({
        "type": "pointlight", "from": (0.0, 0.0, 4.0),
        "color": (1, 1, 1), "power": 30.0}))
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": 24, "resy": 24,
        "from": (0.0, -6.0, 3.0), "to": (0.0, 0.0, 0.5),
        "up": (0.0, -6.0, 4.0), "focal": 1.2}))
    s.create_integrator("default", ParamMap({
        "type": "pathtracing", "bounces": 3, "raydepth": 4,
        "caustic_type": "photon", "photons": 2048, "cPhotons": 2048,
        "causticRadius": 0.15}))
    s.render_params = ParamMap({
        "width": 24, "height": 24, "AA_minsamples": 2,
        "camera_name": "cam", "integrator_name": "default"})
    img = render_scene(s).image
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4


def _scatter_scene(vol_params, vol_integ_params):
    from libyafaray_tpu.scene.scene import Scene

    s = Scene()
    s.create_background("bg", ParamMap({"type": "constant",
                                        "color": (0.0, 0.0, 0.0)}))
    s.create_light("L", ParamMap({
        "type": "pointlight", "from": (0.0, 0.0, 2.5), "power": 40.0,
        "color": (1.0, 1.0, 1.0)}))
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": 16, "resy": 16,
        "from": (0.0, -5.0, 0.0), "to": (0.0, 0.0, 0.0),
        "up": (0.0, -5.0, 1.0), "focal": 1.0}))
    s.create_volume_region("v", ParamMap(vol_params))
    s.create_integrator("default", ParamMap({
        "type": "directlighting", "raydepth": 1}))
    s.create_integrator("volintegr", ParamMap(vol_integ_params))
    s.render_params = ParamMap({
        "width": 16, "height": 16, "AA_minsamples": 1,
        "camera_name": "cam", "integrator_name": "default",
        "volintegrator_name": "volintegr"})
    return s


@pytest.mark.slow
def test_sky_volume_scatters_light():
    """SkyVolume (exp-height density, Rayleigh/Mie phase) in-scatters the
    point light -> visible glow against a black background."""
    from libyafaray_tpu.scene.session import render_scene

    s = _scatter_scene(
        {"type": "SkyVolume", "sigma_a": 0.02, "sigma_s": 0.3,
         "a": 1.0, "b": 0.4, "sigma_r": 0.02, "sigma_m": 0.005,
         "minX": -2.0, "maxX": 2.0, "minY": -2.0, "maxY": 2.0,
         "minZ": -2.0, "maxZ": 2.0},
        {"type": "SingleScatterIntegrator", "stepSize": 0.2})
    img = render_scene(s).image
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3, img.mean()
    # exp-height density falloff is monotonic in z (checked directly —
    # in the image the point light's 1/d² proximity dominates rows)
    import jax.numpy as jnp
    from libyafaray_tpu.volumes.integrate import _density

    vol = s.volumes[0]
    lo = np.asarray(_density(vol, jnp.asarray([[0.0, 0.0, -1.5]])))
    hi = np.asarray(_density(vol, jnp.asarray([[0.0, 0.0, 1.5]])))
    assert lo[0] > 2.0 * hi[0], (lo, hi)


@pytest.mark.slow
def test_single_scatter_optimize_grid_matches_exact():
    """`optimize` (attenuation-grid precompute) vs exact per-step shadow
    rays: same scene, close images (reference attenuationGridMap)."""
    from libyafaray_tpu.scene.session import render_scene

    vol = {"type": "UniformVolume", "sigma_a": 0.05, "sigma_s": 0.25,
           "minX": -2.0, "maxX": 2.0, "minY": -2.0, "maxY": 2.0,
           "minZ": -2.0, "maxZ": 2.0}
    img_exact = render_scene(_scatter_scene(
        vol, {"type": "SingleScatterIntegrator", "stepSize": 0.2})).image
    img_opt = render_scene(_scatter_scene(
        vol, {"type": "SingleScatterIntegrator", "stepSize": 0.2,
              "optimize": True})).image
    assert np.isfinite(img_opt).all()
    assert img_exact.mean() > 1e-3
    rel = abs(img_opt.mean() - img_exact.mean()) / img_exact.mean()
    assert rel < 0.05, (img_exact.mean(), img_opt.mean())


def test_hg_phase_normalization():
    """HG and SkyVolume phase functions integrate to 1 over the sphere."""
    import jax.numpy as jnp
    from libyafaray_tpu.volumes.factory import VolumeRegion, VOL_SKY, \
        VOL_UNIFORM
    from libyafaray_tpu.volumes.integrate import _phase

    rng = np.random.default_rng(0)
    n = 200_000
    # uniform directions -> E[phase] * 4pi = 1
    z = rng.uniform(-1, 1, n).astype(np.float32)
    for vol in (
        VolumeRegion(vtype=VOL_UNIFORM, bmin=(0, 0, 0), bmax=(1, 1, 1),
                     sigma_a=0, sigma_s=1, l_e=0, g=0.0),
        VolumeRegion(vtype=VOL_UNIFORM, bmin=(0, 0, 0), bmax=(1, 1, 1),
                     sigma_a=0, sigma_s=1, l_e=0, g=0.6),
        VolumeRegion(vtype=VOL_SKY, bmin=(0, 0, 0), bmax=(1, 1, 1),
                     sigma_a=0, sigma_s=1, l_e=0, g=0.76,
                     s_ray=0.01, s_mie=0.004),
    ):
        ph = np.asarray(_phase(vol, jnp.asarray(z)))
        integral = ph.mean() * 4.0 * np.pi
        assert abs(integral - 1.0) < 0.02, (vol.vtype, vol.g, integral)


def test_adaptive_marching_refines_vertical_exp_transmittance():
    """`adaptive` (reference SingleScatterIntegrator param): 4-substep
    refinement must beat the plain 16-step midpoint rule on a ray along
    a steep exponential gradient, against the closed-form integral."""
    from libyafaray_tpu.volumes.integrate import transmittance

    vol = volume_from_params(ParamMap({
        "type": "ExpDensityVolume", "sigma_a": 1.0, "sigma_s": 0.0,
        "a": 6.0, "b": 3.0,
        "minX": -1.0, "maxX": 1.0, "minY": -1.0, "maxY": 1.0,
        "minZ": 0.0, "maxZ": 2.0,
    }))
    # vertical ray: tau = 6/3 (1 - exp(-3*2))
    org = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    dist = jnp.full((1,), 100.0, jnp.float32)
    tau_true = 2.0 * (1.0 - np.exp(-6.0))
    t_true = np.exp(-tau_true)
    t_fix = float(np.asarray(transmittance((vol,), org, d, dist))[0])
    t_ad = float(np.asarray(
        transmittance((vol,), org, d, dist, adaptive=True))[0])
    assert abs(t_ad - t_true) < abs(t_fix - t_true)
    assert abs(t_ad - t_true) < 2e-3
    # uniform volumes are exact either way: adaptive is a no-op
    uni = volume_from_params(ParamMap({
        "type": "UniformVolume", "sigma_a": 0.5, "sigma_s": 0.0,
        "minX": -1.0, "maxX": 1.0, "minY": -1.0, "maxY": 1.0,
        "minZ": 0.0, "maxZ": 2.0,
    }))
    ta = np.asarray(transmittance((uni,), org, d, dist, adaptive=True))
    tb = np.asarray(transmittance((uni,), org, d, dist))
    assert np.allclose(ta, tb)
