"""Texture & shader-node tests: procedural noise sanity, image sampling,
mapper resolution, textured-material shading (SURVEY §2.5)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libyafaray_tpu.scene.params import ParamMap
from libyafaray_tpu.scene.scene import Scene


def test_gradient_noise_range_and_smoothness():
    from libyafaray_tpu.textures.procedural import gradient_noise

    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-10, 10, (4096, 3)), jnp.float32)
    n = np.asarray(gradient_noise(p))
    assert n.min() >= -1.01 and n.max() <= 1.01
    assert abs(n.mean()) < 0.05
    # smooth: tiny offset -> tiny delta
    n2 = np.asarray(gradient_noise(p + 1e-3))
    assert np.abs(n2 - n).max() < 0.05


def test_procedural_types_finite():
    from libyafaray_tpu.textures.procedural import eval_procedural

    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.uniform(-2, 2, (512, 3)), jnp.float32)
    uv = jnp.asarray(rng.random((512, 2)), jnp.float32)
    for spec in (
        ("clouds", (("depth", 2), ("size", 1.0))),
        ("marble", (("sharpness", 2.0),)),
        ("wood", ()),
        ("voronoi", (("distance_metric", "dist"),)),
        ("musgrave", (("musgrave_type", "fBm"),)),
        ("musgrave", (("musgrave_type", "ridged_multifractal"),)),
        ("distorted_noise", ()),
        ("blend", ()),
        ("rgb_cube", ()),
    ):
        c = np.asarray(eval_procedural(spec, p, uv))
        assert np.isfinite(c).all(), spec
        assert c.shape == (512, 3)


def test_image_bilinear_interpolation():
    from libyafaray_tpu.textures.eval import sample_image_bilinear

    img = jnp.asarray(np.array([[[0, 0, 0], [1, 1, 1]],
                                [[0, 0, 0], [1, 1, 1]]], np.float32))
    # texel centers: u=0.25 -> left (0), u=0.75 -> right (1)
    u = jnp.asarray([0.25, 0.75, 0.5])
    v = jnp.asarray([0.5, 0.5, 0.5])
    c = np.asarray(sample_image_bilinear(img, u, v))
    assert np.allclose(c[:, 0], [0.0, 1.0, 0.5], atol=1e-5)


def test_shader_node_resolution_to_texture_slot():
    """Material with a texture_mapper node list resolves diffuse_shader to
    the texture id; the mapper transform is recorded."""
    s = Scene()
    s.create_texture("T", ParamMap({"type": "clouds", "size": 2.0}))
    node = ParamMap({
        "element": "shader_node", "name": "map0", "type": "texture_mapper",
        "texture": "T", "texco": "global", "mapping": "plain",
        "scale": (2.0, 2.0, 2.0),
    })
    s.create_material("m", ParamMap({
        "type": "shinydiffusemat", "color": (1.0, 1.0, 1.0),
        "diffuse_shader": "map0", "__list__": [node],
    }))
    row = s.materials[s.material_names["m"]]
    assert row["tex_diffuse"] == 0
    assert s.texture_mappers[0][0] == "global"
    assert s.texture_mappers[0][2] == (2.0, 2.0, 2.0)


def test_textured_material_renders():
    """End-to-end: checker-ish procedural texture drives the floor color."""
    from libyafaray_tpu.scene.session import render_scene

    s = Scene()
    s.create_texture("tex", ParamMap({"type": "blend", "stype": "lin"}))
    node = ParamMap({"name": "m0", "type": "texture_mapper",
                     "texture": "tex", "texco": "uv"})
    s.create_material("floor", ParamMap({
        "type": "shinydiffusemat", "color": (1.0, 1.0, 1.0),
        "diffuse_shader": "m0", "__list__": [node],
    }))
    s.create_background("bg", ParamMap({"type": "constant",
                                        "color": (1.0, 1.0, 1.0),
                                        "ibl": True, "ibl_samples": 4}))
    m = s.start_tri_mesh(has_uv=True)
    for (x, y), (u, v) in zip(((-2, -2), (2, -2), (2, 2), (-2, 2)),
                              ((0, 0), (1, 0), (1, 1), (0, 1))):
        s.add_vertex(x, y, 0.0)
        s.add_uv(u, v)
    s.add_triangle(0, 1, 2, "floor", 0, 1, 2)
    s.add_triangle(0, 2, 3, "floor", 0, 2, 3)
    s.end_tri_mesh()
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": 32, "resy": 32,
        "from": (0.0, 0.0, 4.0), "to": (0.0, 0.001, 0.0),
        "up": (0.0, 1.0, 4.0), "focal": 1.0,
    }))
    s.create_integrator("default", ParamMap({"type": "directlighting",
                                             "raydepth": 1}))
    s.render_params = ParamMap({"width": 32, "height": 32,
                                "AA_minsamples": 8,
                                "camera_name": "cam",
                                "integrator_name": "default"})
    img = render_scene(s).image
    assert np.isfinite(img).all()
    # blend texture: brightness varies along u (image x) on the floor
    left = img[8:24, 2:8].mean()
    right = img[8:24, 24:30].mean()
    assert abs(right - left) > 0.05, (left, right)
