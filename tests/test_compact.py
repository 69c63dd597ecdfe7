"""Compact adaptive-AA passes (engine make_sample_step(compact_n=...) +
film_splat_compact): a resample pass over a gathered flagged-pixel lane
set must reproduce the dense masked pass exactly — same QMC streams
(per-pixel hash + nsamples-derived sample indices), same filter
footprints — so the films agree.  Reference: imagefilm.cc resamples
only flagged pixels (SURVEY §2.11)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from libyafaray_tpu.film.imagefilm import film_init
from libyafaray_tpu.integrators.engine import make_sample_step
from libyafaray_tpu.integrators.render import device_put_scene, render
from libyafaray_tpu.scene.params import ParamMap
from libyafaray_tpu.scene.scene import Scene
from libyafaray_tpu.scene.session import build_config


def _scene(res=32, aa_passes=1, threshold=0.05):
    s = Scene()
    s.create_material("white", ParamMap({
        "type": "shinydiffusemat", "color": (0.7, 0.7, 0.7)}))
    s.create_material("lamp", ParamMap({
        "type": "light_mat", "color": (1.0, 0.9, 0.8), "power": 6.0}))
    # floor + a small emissive quad above it
    s.add_triangle((-4.0, -4.0, 0.0), (4.0, -4.0, 0.0), (4.0, 4.0, 0.0),
                   "white")
    s.add_triangle((-4.0, -4.0, 0.0), (4.0, 4.0, 0.0), (-4.0, 4.0, 0.0),
                   "white")
    s.add_triangle((-1.0, -1.0, 3.0), (1.0, -1.0, 3.0), (1.0, 1.0, 3.0),
                   "lamp")
    s.end_tri_mesh()
    # corner/point1/point2 ordered so e1 x e2 points DOWN (-z) at the
    # floor — the arealight is single-sided; the first version of this
    # scene faced it up and every test compared all-black films
    s.create_light("l", ParamMap({
        "type": "arealight", "corner": (-1.0, -1.0, 2.9),
        "point1": (-1.0, 1.0, 2.9), "point2": (1.0, -1.0, 2.9),
        "color": (1.0, 1.0, 1.0), "power": 20.0, "samples": 1}))
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": res, "resy": res,
        "from": (0.0, -6.0, 3.0), "to": (0.0, 0.0, 0.5),
        "up": (0.0, -6.0, 4.0), "focal": 1.4}))
    s.create_integrator("default", ParamMap({
        "type": "pathtracing", "bounces": 2, "raydepth": 3}))
    s.render_params = ParamMap({
        "width": res, "height": res, "AA_minsamples": 1,
        "AA_passes": aa_passes, "AA_inc_samples": 1,
        "AA_threshold": threshold,
        "integrator_name": "default", "camera_name": "cam"})
    return s


@pytest.mark.slow
def test_compact_step_equals_dense_masked_step():
    s = _scene()
    c = s.compile()
    cfg = build_config(s)
    arrays = device_put_scene(c)
    h = w = cfg.height
    rng = np.random.default_rng(5)
    flags_np = np.zeros((h, w), bool)
    sel = rng.choice(h * w, 37, replace=False)
    flags_np[np.unravel_index(sel, (h, w))] = True

    def fresh_film():
        f = film_init(h, w)
        f["rays"] = jnp.zeros((), jnp.float32)
        # non-zero sample history so s_idx gathering is exercised
        f["nsamples"] = jnp.asarray(
            rng.integers(0, 5, (h, w)).astype(np.int32))
        return f

    ns0 = np.asarray(fresh_film()["nsamples"])  # rng consumed once

    def fixed_film():
        f = film_init(h, w)
        f["rays"] = jnp.zeros((), jnp.float32)
        f["nsamples"] = jnp.asarray(ns0)
        return f

    dense = jax.jit(make_sample_step(c.static, c.camera, cfg))
    film_d = dense(arrays, fixed_film(), jnp.asarray(flags_np))

    nc = 64
    idx = np.flatnonzero(flags_np).astype(np.int32)
    pix = jnp.asarray(np.concatenate(
        [idx, np.full(nc - idx.size, -1, np.int32)]))
    compact = jax.jit(make_sample_step(c.static, c.camera, cfg,
                                       compact_n=nc))
    film_c = compact(arrays, fixed_film(), pix)

    ns_d = np.asarray(film_d["nsamples"]) - ns0
    ns_c = np.asarray(film_c["nsamples"]) - ns0
    assert np.array_equal(ns_d, ns_c)
    assert np.array_equal(ns_d > 0, flags_np)
    assert np.allclose(np.asarray(film_d["w"]), np.asarray(film_c["w"]),
                       atol=1e-5)
    assert np.allclose(np.asarray(film_d["wsum"]),
                       np.asarray(film_c["wsum"]), atol=1e-5)
    assert float(film_d["rays"]) == float(film_c["rays"])


@pytest.mark.slow
def test_render_compact_pass_matches_dense(monkeypatch):
    """End-to-end: an adaptive render whose resample passes go compact
    must produce the same film as the dense-masked fallback."""
    s = _scene(res=64, aa_passes=3, threshold=0.08)
    c = s.compile()
    cfg = build_config(s)
    monkeypatch.setenv("LIBYAF_COMPACT", "1")
    r1 = render(c, cfg)
    monkeypatch.setenv("LIBYAF_COMPACT", "0")
    r0 = render(c, cfg)
    ns1 = np.asarray(r1.film["nsamples"])
    ns0 = np.asarray(r0.film["nsamples"])
    assert np.array_equal(ns1, ns0)
    assert np.allclose(r1.image, r0.image, atol=2e-5)


def test_film_stderr_math():
    """film_stderr == sqrt(mean_rgb(var)/w) for a hand-built film."""
    from libyafaray_tpu.film.imagefilm import film_stderr

    rng = np.random.default_rng(3)
    n = 64
    samples = rng.random((n, 2, 2, 3)).astype(np.float32)
    film = dict(
        wsum=jnp.asarray(samples.sum(0)),
        w=jnp.full((2, 2), float(n), jnp.float32),
        m2=jnp.asarray((samples ** 2).sum(0)),
        nsamples=jnp.full((2, 2), n, jnp.int32),
    )
    got = np.asarray(film_stderr(film))
    var = samples.var(axis=0)           # population variance
    want = np.sqrt(var.mean(axis=-1) / n)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_variance_estimator_adaptive_render():
    """AA_estimator=variance: the stderr-driven adaptive render unflags
    converged pixels (sample counts become nonuniform) and agrees with
    the uniform render's image."""
    s = _scene(res=32, aa_passes=1)
    s.render_params["AA_minsamples"] = 24
    c = s.compile()
    ref = render(c, build_config(s))

    s2 = _scene(res=32, aa_passes=6)
    s2.render_params["AA_minsamples"] = 4
    s2.render_params["AA_inc_samples"] = 4
    s2.render_params["AA_estimator"] = "variance"
    # pass-0 stderr on this scene spans 0..0.013: a 4e-3 target keeps
    # the noisier half flagged and unflags the converged pixels
    s2.render_params["AA_threshold"] = 0.004
    c2 = s2.compile()
    cfg2 = build_config(s2)
    assert cfg2.aa_estimator == "variance"
    r = render(c2, cfg2)
    ns = np.asarray(r.film["nsamples"])
    assert "m2" in r.film
    # stderr-driven unflagging concentrates samples: counts nonuniform
    assert ns.min() >= 4 and ns.max() > ns.min()
    assert np.isfinite(r.image).all()
    # same physics: images agree to sampling noise
    d = float(np.sqrt(np.mean((r.image - ref.image) ** 2)))
    assert d < 0.08, d


@pytest.mark.slow
def test_render_compact_with_aov_passes_matches_dense(monkeypatch):
    """r5 (VERDICT r4 #5): AOV planes no longer disable compaction —
    the compact resample pass splats passes too, equal to dense."""
    s = _scene(res=48, aa_passes=3, threshold=0.08)
    s.render_params["render_passes"] = "z-depth-norm normal-smooth reflect"
    c = s.compile()
    cfg = build_config(s)
    assert cfg.passes
    monkeypatch.setenv("LIBYAF_COMPACT", "1")
    r1 = render(c, cfg)
    monkeypatch.setenv("LIBYAF_COMPACT", "0")
    r0 = render(c, cfg)
    assert np.array_equal(np.asarray(r1.film["nsamples"]),
                          np.asarray(r0.film["nsamples"]))
    assert np.allclose(r1.image, r0.image, atol=2e-5)
    p1, p0 = r1.passes, r0.passes
    assert set(p1) == set(p0) and len(p1) >= 3
    for k in p0:
        assert np.allclose(p1[k], p0[k], atol=3e-5), k


@pytest.mark.slow
def test_render_compact_sharded_matches_dense(monkeypatch):
    """r5 (VERDICT r4 #5): compaction now runs under a device mesh —
    the lane list shards over the mesh axis; film equals the
    single-device dense render."""
    from libyafaray_tpu.parallel.mesh import make_device_mesh

    s = _scene(res=64, aa_passes=3, threshold=0.08)
    c = s.compile()
    cfg = build_config(s)
    monkeypatch.setenv("LIBYAF_COMPACT", "0")
    r0 = render(c, cfg)
    monkeypatch.setenv("LIBYAF_COMPACT", "1")
    mesh = make_device_mesh(8)
    r8 = render(c, cfg, mesh=mesh)
    assert np.array_equal(np.asarray(r8.film["nsamples"]),
                          np.asarray(r0.film["nsamples"]))
    assert np.allclose(r8.image, r0.image, atol=2e-5)
