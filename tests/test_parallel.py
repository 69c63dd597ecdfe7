"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY §4.4 / §5.8): the sharded render must equal the single-device
render (determinism: per-pixel QMC is position-keyed)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

SCENE = os.path.join(os.path.dirname(__file__), "..", "scenes",
                     "cornell.xml")


@pytest.fixture(scope="module")
def small_scene():
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig

    s = parse_xml_file(SCENE)
    s.render_params["width"] = 32
    s.render_params["height"] = 32
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "pathtracing",
                          "bounces": 2, "width": 32, "height": 32,
                          "aa_samples": 2})
    return s.compile(), cfg


def test_mesh_available():
    assert len(jax.devices()) >= 8


@pytest.mark.slow
def test_sharded_render_matches_single_device(small_scene):
    from libyafaray_tpu.parallel.mesh import make_device_mesh, render_sharded
    from libyafaray_tpu.integrators.engine import make_sample_step
    from libyafaray_tpu.film.imagefilm import film_init, film_image

    cscene, cfg = small_scene

    # single device
    step = jax.jit(make_sample_step(cscene.static, cscene.camera, cfg))
    film = film_init(cfg.height, cfg.width)
    film["rays"] = jnp.zeros((), jnp.float32)
    flags = jnp.ones((cfg.height, cfg.width), jnp.bool_)
    arrays = jax.device_put(cscene.arrays)
    for _ in range(2):
        film = step(arrays, film, flags)
    img_single = np.asarray(film_image(film))

    # 8-device mesh, film rows sharded
    mesh = make_device_mesh(8)
    film8 = render_sharded(cscene, cfg, mesh, n_steps=2)
    img_mesh = np.asarray(film8["wsum"]
                          / np.maximum(np.asarray(film8["w"]), 1e-8)[..., None])

    assert np.isfinite(img_mesh).all()
    assert np.allclose(img_single, img_mesh, atol=1e-5), np.abs(
        img_single - img_mesh).max()
    # ray counters agree too (psum across shards)
    assert abs(float(film8["rays"]) - float(film["rays"])) < 1.0


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_photonmap_matches_single_device():
    """Photon transport across the mesh (SURVEY §5.8): lane-sharded
    shooting + replicated packs + film-sharded shading must equal the
    single-device photonmapping render."""
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.photonmap import render_photonmap
    from libyafaray_tpu.parallel.mesh import make_device_mesh

    s = parse_xml_file(SCENE)
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "photonmapping",
                          "photons": 2048, "caustic_photons": 1024,
                          "fg_samples": 2, "aa_samples": 1, "aa_passes": 1,
                          "width": 16, "height": 16, "raydepth": 2,
                          "photon_bounces": 3})
    cs = s.compile()
    img1 = render_photonmap(cs, cfg).image
    mesh = make_device_mesh(8)
    img8 = render_photonmap(cs, cfg, mesh=mesh).image
    assert np.isfinite(img8).all()
    assert np.allclose(img1, img8, atol=1e-4), np.abs(img1 - img8).max()


@pytest.mark.slow
def test_sharded_sppm_matches_single_device():
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.sppm import render_sppm
    from libyafaray_tpu.parallel.mesh import make_device_mesh

    s = parse_xml_file(SCENE)
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "SPPM",
                          "sppm_photons": 2048, "sppm_passes": 2,
                          "width": 16, "height": 16, "raydepth": 2,
                          "photon_bounces": 3})
    cs = s.compile()
    img1 = render_sppm(cs, cfg).image
    mesh = make_device_mesh(8)
    img8 = render_sppm(cs, cfg, mesh=mesh).image
    assert np.isfinite(img8).all()
    assert np.allclose(img1, img8, atol=1e-4), np.abs(img1 - img8).max()


def test_distributed_helpers_single_host():
    """init_distributed degrades gracefully on a single host; global_mesh
    spans the virtual device set."""
    from libyafaray_tpu.parallel.distributed import global_mesh

    mesh = global_mesh()
    assert mesh.devices.size >= 8
    assert mesh.axis_names == ("film",)
