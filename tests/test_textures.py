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


@pytest.mark.slow
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


def test_color_ramp_linear_and_constant():
    """Colorband maps texture intensity to interpolated stop colors
    (reference color_ramp.h getColorInterpolated)."""
    from libyafaray_tpu.textures.eval import apply_color_ramp

    ramp = ("linear", ((0.0, 1.0, 0.0, 0.0), (1.0, 0.0, 0.0, 1.0)))
    val = jnp.stack([jnp.asarray([0.0, 0.5, 1.0])] * 3, axis=-1)
    out = np.asarray(apply_color_ramp(val, ramp))
    assert np.allclose(out[0], [1, 0, 0], atol=1e-5)   # at stop 0
    assert np.allclose(out[1], [0.5, 0, 0.5], atol=1e-5)  # midpoint
    assert np.allclose(out[2], [0, 0, 1], atol=1e-5)   # at stop 1
    outc = np.asarray(apply_color_ramp(
        val, ("constant", ramp[1])))
    assert np.allclose(outc[1], [1, 0, 0], atol=1e-5)  # holds left stop
    # out-of-range clamps to end stops
    val2 = jnp.full((2, 3), 5.0)
    out2 = np.asarray(apply_color_ramp(val2, ramp))
    assert np.allclose(out2, [[0, 0, 1]] * 2, atol=1e-5)


def test_image_window_crop_clip_checker():
    """imagetex.cc uv window: repeat tiling, crop remap, clip-to-black,
    checker tiles."""
    from libyafaray_tpu.textures.eval import _sample_image_windowed

    img = jnp.asarray(np.array([[[0, 0, 0], [1, 1, 1]],
                                [[0, 0, 0], [1, 1, 1]]], np.float32))
    u = jnp.asarray([0.25, 0.75])
    v = jnp.asarray([0.5, 0.5])
    # crop to the right half -> everything samples the bright texel
    win = (1, 1, (0.5, 0.0, 1.0, 1.0), "repeat", False, True, False)
    c = np.asarray(_sample_image_windowed(img, u, v, win))
    assert (c[:, 0] > 0.45).all(), c
    # clip: outside [0,1) -> black
    win = (1, 1, None, "clip", False, True, False)
    c = np.asarray(_sample_image_windowed(
        img, jnp.asarray([-0.5, 0.75]), v, win))
    assert np.allclose(c[0], 0.0) and c[1, 0] > 0.9
    # checker with xrepeat=2: even tile shows, odd tile black
    win = (2, 1, None, "checker", False, True, False)
    c = np.asarray(_sample_image_windowed(
        img, jnp.asarray([0.3, 0.8]), jnp.asarray([0.4, 0.4]), win))
    assert c[0].max() >= 0.0 and np.allclose(c[1], 0.0), c


@pytest.mark.slow
def test_ramp_through_scene_compile():
    """use_color_ramp on a texture flows through Scene.compile into the
    static spec and renders finite."""
    s = Scene()
    s.create_texture("t", ParamMap({
        "type": "clouds", "size": 2.0, "use_color_ramp": True,
        "ramp_num_items": 2, "ramp_interpolation": "linear",
        "ramp_item_0_color": (1.0, 0.0, 0.0, 1.0),
        "ramp_item_0_position": 0.0,
        "ramp_item_1_color": (0.0, 0.0, 1.0, 1.0),
        "ramp_item_1_position": 1.0,
    }))
    node = ParamMap({
        "element": "shader_node", "name": "map", "type": "texture_mapper",
        "texture": "t", "texco": "global", "mapping": "plain",
    })
    s.create_material("m", ParamMap({
        "type": "shinydiffusemat", "color": (0.5, 0.5, 0.5),
        "diffuse_shader": "map", "__list__": [node],
    }))
    s.create_background("bg", ParamMap({"type": "constant",
                                        "color": (1.0, 1.0, 1.0),
                                        "ibl": True, "ibl_samples": 2}))
    s.add_sphere((0.0, 0.0, 0.0), 1.0, "m")
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": 12, "resy": 12,
        "from": (0.0, -4.0, 0.0), "to": (0.0, 0.0, 0.0),
        "up": (0.0, -4.0, 1.0), "focal": 1.8}))
    s.create_integrator("default", ParamMap({
        "type": "directlighting", "raydepth": 2}))
    s.render_params = ParamMap({
        "width": 12, "height": 12, "AA_minsamples": 4,
        "integrator_name": "default", "camera_name": "cam"})
    from libyafaray_tpu.scene.session import render_scene
    res = render_scene(s)
    img = res.image
    assert np.isfinite(img).all()
    # ramp output is red<->blue: green stays below red/blue on the sphere
    center = img[4:8, 4:8]
    assert center.mean() > 0.01


def test_mip_atlas_and_trilinear():
    """Mip atlas construction + per-lane fractional level selection
    (reference imagetex.cc mipmap_trilinear; SURVEY §2.5)."""
    import numpy as np
    import jax.numpy as jnp
    from libyafaray_tpu.textures.factory import (build_mip_atlas,
                                                 mip_level_meta)
    from libyafaray_tpu.textures.eval import sample_image_trilinear

    rng = np.random.default_rng(0)
    img = rng.random((16, 32, 3)).astype(np.float32)
    levels = mip_level_meta(16, 32)
    atlas = build_mip_atlas(img)
    # level 0 is the image itself
    assert np.array_equal(atlas[:16, :32], img)
    # level 1 equals the 2x2 box filter
    l1 = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                 + img[0::2, 1::2] + img[1::2, 1::2])
    y0, h1, w1 = levels[1]
    assert np.allclose(atlas[y0:y0 + h1, :w1], l1, atol=1e-6)
    # last level is the global mean (box-filter chain)
    yl, hl, wl = levels[-1]
    assert hl == 1
    assert np.allclose(atlas[yl, :wl].mean(axis=0), img.mean(axis=(0, 1)),
                       atol=5e-2)

    # lod=0 reproduces bilinear on level 0; integer lod k samples level k
    n = 64
    u = jnp.asarray(rng.random(n), jnp.float32)
    v = jnp.asarray(rng.random(n), jnp.float32)
    from libyafaray_tpu.textures.eval import sample_image_bilinear
    out0 = sample_image_trilinear(jnp.asarray(atlas), levels, u, v,
                                  jnp.zeros(n))
    ref0 = sample_image_bilinear(jnp.asarray(img), u, v)
    assert np.allclose(np.asarray(out0), np.asarray(ref0), atol=1e-6)
    out1 = sample_image_trilinear(jnp.asarray(atlas), levels, u, v,
                                  jnp.ones(n))
    ref1 = sample_image_bilinear(jnp.asarray(l1), u, v)
    assert np.allclose(np.asarray(out1), np.asarray(ref1), atol=1e-6)
    # fractional lod blends adjacent levels
    outh = sample_image_trilinear(jnp.asarray(atlas), levels, u, v,
                                  jnp.full(n, 0.5))
    assert np.allclose(np.asarray(outh),
                       0.5 * (np.asarray(out0) + np.asarray(out1)),
                       atol=1e-6)
    # beyond-last lod clamps to the coarsest level (1x2 here) whose mean
    # is the global image mean
    outl = sample_image_trilinear(jnp.asarray(atlas), levels, u, v,
                                  jnp.full(n, 99.0))
    assert np.allclose(np.asarray(outl).mean(axis=0),
                       img.mean(axis=(0, 1)), atol=5e-2)


@pytest.mark.slow
def test_mipmap_lod_selection_in_scene():
    """A mipmap-enabled textured floor seen at increasing distance reads
    coarser mip levels: with a checker texture whose global mean is gray,
    far pixels must converge toward gray while near pixels keep contrast."""
    import numpy as np
    from libyafaray_tpu.scene.scene import Scene
    from libyafaray_tpu.scene.params import ParamMap
    from libyafaray_tpu.scene.session import render_scene
    import libyafaray_tpu.textures.factory as tf

    # fine checker: 64x64 with 2-px squares -> aliases hard without mips
    c = (np.indices((64, 64)).sum(axis=0) // 2 % 2).astype(np.float32)
    img = np.stack([c, c, c], axis=-1)

    def scene(interp):
        s = Scene()
        s.create_texture("t", ParamMap({"type": "image",
                                        "interpolate": interp}))
        list(s.textures.values())[0].image = img
        list(s.textures.values())[0].interpolate = interp
        s.create_material("m", ParamMap({
            "type": "shinydiffusemat", "color": (1.0, 1.0, 1.0),
            "diffuse_reflect": 1.0, "diffuse_shader": "map0"}))
        # wire texture slot directly (mapper machinery tested elsewhere)
        s.materials[s.material_names["m"]]["tex_diffuse"] = 0
        # floor quad far along +y; uv tiles 20x over 200 world units so
        # the checker period (~0.6 world units) is sub-pixel beyond
        # t ~ 20 -> genuinely under-sampled without mips
        s.start_tri_mesh(0, has_uv=True)
        uvs = [(0, 0), (20, 0), (20, 20), (0, 20)]
        for (x, y) in [(-100, 1), (100, 1), (100, 201), (-100, 201)]:
            s.add_vertex(float(x), float(y), 0.0)
        for (uu, vv) in uvs:
            s.add_uv(float(uu), float(vv))
        s.add_triangle(0, 1, 2, "m", 0, 1, 2)
        s.add_triangle(0, 2, 3, "m", 0, 2, 3)
        s.end_tri_mesh()
        s.create_background("bg", ParamMap({
            "type": "constant", "color": (1.0, 1.0, 1.0), "ibl": True,
            "ibl_samples": 4}))
        s.create_camera("cam", ParamMap({
            "type": "perspective", "resx": 32, "resy": 32,
            "from": (0.0, 0.0, 2.0), "to": (0.0, 30.0, 0.0),
            "up": (0.0, 0.0, 3.0), "focal": 1.0,
        }))
        s.create_integrator("default", ParamMap({
            "type": "directlighting", "raydepth": 1}))
        s.render_params = ParamMap({
            "width": 32, "height": 32, "AA_minsamples": 8,
            "integrator_name": "default", "camera_name": "cam"})
        return s

    img_tri = render_scene(scene("mipmap_trilinear")).image
    # horizon sits around row 14; rows just below see tiny distant
    # checker squares (high mip level -> near-uniform gray), bottom rows
    # see large squares (low level -> contrast preserved)
    far = img_tri[16:19, :, 0]
    near = img_tri[28:31, :, 0]
    assert far.std() < 0.08, (far.std(), far.mean())
    assert near.std() > 2.0 * far.std(), (near.std(), far.std())


def test_blend_layer_modes_closed_form():
    """Every layernode blend mode vs closed-form numpy (reference
    layernode.cc semantics; SURVEY §2.4)."""
    import numpy as np
    import jax.numpy as jnp
    from libyafaray_tpu.textures.nodes import blend_layer, BLEND_MODES

    rng = np.random.default_rng(1)
    base = rng.random((64, 3)).astype(np.float32)
    tex = rng.random((64, 3)).astype(np.float32)
    fac = rng.random(64).astype(np.float32)
    f = fac[:, None]

    def hsv(c):
        import colorsys
        return np.array([colorsys.rgb_to_hsv(*px) for px in c], np.float32)

    def from_hsv(h):
        import colorsys
        return np.array([colorsys.hsv_to_rgb(*px) for px in h], np.float32)

    expected = {
        "mix": base * (1 - f) + tex * f,
        "add": base + tex * f,
        "sub": base - tex * f,
        "mul": base * ((1 - f) + tex * f),
        "screen": 1 - (1 - base) * (1 - tex * f),
        "difference": base * (1 - f) + np.abs(base - tex) * f,
        "darken": np.minimum(base, tex * f + base * (1 - f)),
        "lighten": np.maximum(base, tex * f),
        "divide": base * (1 - f) + f * base / np.maximum(tex, 1e-4),
        "burn": 1 - (1 - base) / np.maximum(tex * f + (1 - f), 1e-4),
        "dodge": base / np.maximum(1 - tex * f, 1e-4),
    }
    for name, ref in expected.items():
        got = np.asarray(blend_layer(jnp.asarray(base), jnp.asarray(tex),
                                     BLEND_MODES[name], jnp.asarray(fac)))
        ref = np.clip(ref, 0.0, None)
        assert np.allclose(got, ref, atol=1e-5), name

    # hue/saturation/value/color against colorsys
    bh = hsv(base)
    th = hsv(tex)
    for name, mixh in (
        ("hue", np.stack([th[:, 0], bh[:, 1], bh[:, 2]], -1)),
        ("saturation", np.stack([bh[:, 0], th[:, 1], bh[:, 2]], -1)),
        ("value", np.stack([bh[:, 0], bh[:, 1], th[:, 2]], -1)),
        ("color", np.stack([th[:, 0], th[:, 1], bh[:, 2]], -1)),
    ):
        res = from_hsv(mixh)
        if name in ("hue", "color"):
            res = np.where(th[:, 1:2] > 1e-6, res, base)
        if name == "saturation":
            res = np.where(bh[:, 1:2] > 1e-6, res, base)
        ref = np.clip(base * (1 - f) + res * f, 0.0, None)
        got = np.asarray(blend_layer(jnp.asarray(base), jnp.asarray(tex),
                                     BLEND_MODES[name], jnp.asarray(fac)))
        assert np.allclose(got, ref, atol=2e-5), (
            name, np.abs(got - ref).max())


def test_node_dag_texture_on_texture():
    """A two-layer node graph (mapper -> layer(mul) -> layer(add over
    def_col)) drives diffuse_color — arbitrary node-on-node DAG through
    the scene pipeline (reference nodematerial.cc; VERDICT r1 #7)."""
    import numpy as np
    import jax.numpy as jnp
    from libyafaray_tpu.scene.scene import Scene
    from libyafaray_tpu.scene.params import ParamMap
    from libyafaray_tpu.materials.base import gather_rows
    from libyafaray_tpu.textures.eval import apply_textures

    s = Scene()
    s.create_texture("ta", ParamMap({"type": "image"}))
    s.create_texture("tb", ParamMap({"type": "image"}))
    ta = np.full((4, 4, 3), 0.5, np.float32)
    tb = np.zeros((4, 4, 3), np.float32)
    tb[..., 0] = 0.25
    list(s.textures.values())[0].image = ta
    list(s.textures.values())[1].image = tb
    s.create_material("m", ParamMap({
        "type": "shinydiffusemat", "color": (1.0, 1.0, 1.0),
        "diffuse_shader": "top",
        "__list__": [
            {"name": "map_a", "type": "texture_mapper", "texture": "ta"},
            {"name": "map_b", "type": "texture_mapper", "texture": "tb"},
            # bottom layer: a over def_col black -> 0.5 gray
            {"name": "lay_a", "type": "layer", "input": "map_a",
             "mode": "mix", "colfac": 1.0,
             "def_col": (0.0, 0.0, 0.0, 1.0)},
            # top layer: b ADDED over lay_a -> (0.75, 0.5, 0.5)
            {"name": "top", "type": "layer", "input": "map_b",
             "upper_layer": "lay_a", "mode": "add", "colfac": 1.0},
        ]}))
    # dummy geometry so compile has triangles
    s.add_sphere((0, 0, 0), 1.0, "m")
    s.create_camera("cam", ParamMap({
        "type": "perspective", "resx": 8, "resy": 8,
        "from": (0, -4, 0), "to": (0, 0, 0), "up": (0, -4, 1)}))
    cs = s.compile()
    assert len(cs.static.node_programs) == 1

    n = 8
    arrays = {k: jnp.asarray(v) if hasattr(v, "shape") else v
              for k, v in cs.arrays.items()}
    mid = s.material_names["m"]
    row = gather_rows(arrays["materials"], jnp.full(n, mid, jnp.int32))
    sp = dict(p=jnp.zeros((n, 3)), uv=jnp.full((n, 2), 0.4),
              n=jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
              uv_density=jnp.ones(n), fp=None)
    row2 = apply_textures(arrays, cs.static, row, sp)
    got = np.asarray(row2["diffuse_color"])
    assert np.allclose(got, [0.75, 0.5, 0.5], atol=1e-5), got[0]


def test_bicubic_sampling():
    """Catmull-Rom bicubic (reference interpolate="bicubic"): exact at
    texel centers, exact on linear ramps, smoother than bilinear on a
    step edge."""
    import numpy as np
    import jax.numpy as jnp
    from libyafaray_tpu.textures.eval import (sample_image_bicubic,
                                              sample_image_bilinear)

    rng = np.random.default_rng(3)
    img = rng.random((8, 8, 3)).astype(np.float32)
    # texel centers: (i + 0.5)/8
    us = jnp.asarray((np.arange(8) + 0.5) / 8.0, jnp.float32)
    vs = jnp.full(8, (2 + 0.5) / 8.0, jnp.float32)
    got = np.asarray(sample_image_bicubic(jnp.asarray(img), us, vs))
    assert np.allclose(got, img[2, :, :], atol=1e-5)

    # linear ramp reproduced exactly away from the wrap seam
    ramp = np.tile(np.arange(16, dtype=np.float32)[None, :, None],
                   (16, 1, 3))
    uu = jnp.asarray(np.linspace(0.2, 0.8, 33), jnp.float32)
    vv = jnp.full(33, 0.5, jnp.float32)
    got = np.asarray(sample_image_bicubic(jnp.asarray(ramp), uu, vv))
    ref = np.asarray(uu) * 16 - 0.5
    assert np.allclose(got[:, 0], ref, atol=1e-4)


def test_perlin_noise_canonical_invariants():
    """Canonical Improved Perlin (2002): exactly zero at every integer
    lattice point, bounded in [-1, 1], C1-smooth across cell faces, and
    a known closed-form interior value (independent scalar recompute of
    the reference algorithm checks table/gather wiring)."""
    import jax.numpy as jnp
    from libyafaray_tpu.textures.procedural import (
        perlin_noise, noise_basis, _PERLIN_PERM2)

    rng = np.random.default_rng(5)
    lat = rng.integers(-40, 40, (256, 3)).astype(np.float32)
    z = np.asarray(perlin_noise(jnp.asarray(lat)))
    assert np.max(np.abs(z)) == 0.0

    p = rng.uniform(-20, 20, (4096, 3)).astype(np.float32)
    v = np.asarray(perlin_noise(jnp.asarray(p)))
    assert v.min() >= -1.0 and v.max() <= 1.0
    assert v.std() > 0.05  # not degenerate

    # continuity across a cell face
    eps = 1e-4
    a = np.array([[3.0 - eps, 1.3, 0.7]], np.float32)
    b = np.array([[3.0 + eps, 1.3, 0.7]], np.float32)
    va = float(perlin_noise(jnp.asarray(a))[0])
    vb = float(perlin_noise(jnp.asarray(b))[0])
    assert abs(va - vb) < 1e-2

    # independent scalar reference (pure python, same published table)
    perm = _PERLIN_PERM2

    def fade(t):
        return t * t * t * (t * (t * 6 - 15) + 10)

    def grad(h, x, y, z):
        h &= 15
        u = x if h < 8 else y
        w = y if h < 4 else (x if h in (12, 14) else z)
        return (u if (h & 1) == 0 else -u) + (w if (h & 2) == 0 else -w)

    def ref(x, y, z):
        xi, yi, zi = int(np.floor(x)) & 255, int(np.floor(y)) & 255, \
            int(np.floor(z)) & 255
        x -= np.floor(x); y -= np.floor(y); z -= np.floor(z)
        u, v_, w = fade(x), fade(y), fade(z)
        a = perm[xi] + yi
        aa, ab = perm[a] + zi, perm[a + 1] + zi
        b = perm[xi + 1] + yi
        ba, bb = perm[b] + zi, perm[b + 1] + zi

        def lerp(t, lo, hi):
            return lo + t * (hi - lo)

        return lerp(w, lerp(v_, lerp(u, grad(perm[aa], x, y, z),
                                     grad(perm[ba], x - 1, y, z)),
                            lerp(u, grad(perm[ab], x, y - 1, z),
                                 grad(perm[bb], x - 1, y - 1, z))),
                    lerp(v_, lerp(u, grad(perm[aa + 1], x, y, z - 1),
                                  grad(perm[ba + 1], x - 1, y, z - 1)),
                         lerp(u, grad(perm[ab + 1], x, y - 1, z - 1),
                              grad(perm[bb + 1], x - 1, y - 1,
                                   z - 1))))

    pts = rng.uniform(-10, 10, (32, 3)).astype(np.float64)
    got = np.asarray(perlin_noise(jnp.asarray(pts, jnp.float32)))
    want = np.array([ref(*q) for q in pts])
    assert np.allclose(got, want, atol=2e-5)

    # basis dispatch: newperlin == canonical; cellnoise piecewise const
    nb = np.asarray(noise_basis(jnp.asarray(pts, jnp.float32),
                                "newperlin"))
    assert np.allclose(nb, got)
    c1 = np.asarray(noise_basis(jnp.asarray([[4.1, 2.2, 3.3]],
                                            jnp.float32), "cellnoise"))
    c2 = np.asarray(noise_basis(jnp.asarray([[4.9, 2.7, 3.6]],
                                            jnp.float32), "cellnoise"))
    assert np.allclose(c1, c2)  # same cell -> same value


@pytest.mark.slow
def test_noise_basis_threading_through_textures():
    """noise_type reaches clouds/musgrave/distorted evaluation: bases
    give different fields, all bounded."""
    import jax.numpy as jnp
    from libyafaray_tpu.textures.procedural import eval_procedural

    rng = np.random.default_rng(6)
    p = jnp.asarray(rng.uniform(-4, 4, (512, 3)), jnp.float32)
    uv = jnp.zeros((512, 2), jnp.float32)
    outs = {}
    for basis in ("blender", "newperlin", "voronoi_f1", "cellnoise"):
        spec = ("clouds", (("depth", 2), ("noise_type", basis),
                           ("size", 1.0)), None)
        v = np.asarray(eval_procedural(spec, p, uv))
        assert v.min() >= 0.0 and v.max() <= 1.0
        outs[basis] = v
    assert not np.allclose(outs["blender"], outs["newperlin"])
    assert not np.allclose(outs["newperlin"], outs["voronoi_f1"])
    spec = ("distorted_noise", (("distort", 2.0),
                                ("noise_type1", "newperlin"),
                                ("noise_type2", "voronoi_crackle")), None)
    v = np.asarray(eval_procedural(spec, p, uv))
    assert np.isfinite(v).all()


def _floor_scene(materials_fn, floor_mat):
    """32x32 directlighting scene: a UV-mapped floor quad under a white
    constant-IBL background; materials_fn(s) creates the materials."""
    from libyafaray_tpu.scene.session import render_scene

    s = Scene()
    materials_fn(s)
    s.create_background("bg", ParamMap({"type": "constant",
                                        "color": (1.0, 1.0, 1.0),
                                        "ibl": True, "ibl_samples": 4}))
    s.start_tri_mesh(has_uv=True)
    for (x, y), (u, v) in zip(((-2, -2), (2, -2), (2, 2), (-2, 2)),
                              ((0, 0), (1, 0), (1, 1), (0, 1))):
        s.add_vertex(x, y, 0.0)
        s.add_uv(u, v)
    s.add_triangle(0, 1, 2, floor_mat, 0, 1, 2)
    s.add_triangle(0, 2, 3, floor_mat, 0, 2, 3)
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
    return render_scene(s).image


def test_mask_material_texture_switches():
    """mask_mat: the mask texture's value must reach blend_value per
    lane (tex_mask slot; reference maskmat.cc thresholds its mask
    texture) — a u-gradient mask picks the red child on the left half
    and the blue child on the right."""
    def mats(s):
        s.create_texture("gtex", ParamMap({"type": "blend",
                                           "stype": "lin"}))
        node = ParamMap({"name": "m0", "type": "texture_mapper",
                         "texture": "gtex", "texco": "uv"})
        s.create_material("red", ParamMap({
            "type": "shinydiffusemat", "color": (1.0, 0.0, 0.0)}))
        s.create_material("blue", ParamMap({
            "type": "shinydiffusemat", "color": (0.0, 0.0, 1.0)}))
        s.create_material("m", ParamMap({
            "type": "mask_mat", "material1": "red", "material2": "blue",
            "threshold": 0.5, "mask_shader": "m0", "__list__": [node]}))

    img = _floor_scene(mats, "m")
    left = img[12:20, 2:8].mean(axis=(0, 1))
    right = img[12:20, 24:30].mean(axis=(0, 1))
    assert left[0] > 3.0 * max(left[2], 1e-6), (left, right)   # red side
    assert right[2] > 3.0 * max(right[0], 1e-6), (left, right)  # blue side


def test_nested_blend_shader_mapped_factor():
    """Shader-mapped blend factors BELOW nesting level 1 (VERDICT r4
    missing #5): an outer blend delegates (weight 0) to an inner blend
    whose blend_value is texture-mapped — the inner gradient must show,
    not the inner material's static 0.5 mix (reference blendmat.cc
    delegates initBSDF through every nesting level)."""
    def mats(s):
        s.create_texture("gtex", ParamMap({"type": "blend",
                                           "stype": "lin"}))
        node = ParamMap({"name": "m0", "type": "texture_mapper",
                         "texture": "gtex", "texco": "uv"})
        s.create_material("red", ParamMap({
            "type": "shinydiffusemat", "color": (1.0, 0.0, 0.0)}))
        s.create_material("blue", ParamMap({
            "type": "shinydiffusemat", "color": (0.0, 0.0, 1.0)}))
        s.create_material("inner", ParamMap({
            "type": "blend_mat", "material1": "red", "material2": "blue",
            "blend_value": 0.5, "blend_shader": "m0",
            "__list__": [node]}))
        s.create_material("green", ParamMap({
            "type": "shinydiffusemat", "color": (0.0, 1.0, 0.0)}))
        s.create_material("outer", ParamMap({
            "type": "blend_mat", "material1": "inner",
            "material2": "green", "blend_value": 0.0}))

    img = _floor_scene(mats, "outer")
    left = img[12:20, 2:8].mean(axis=(0, 1))
    right = img[12:20, 24:30].mean(axis=(0, 1))
    # inner mapped factor: left mostly red child, right mostly blue
    assert left[0] > 2.0 * max(left[2], 1e-6), (left, right)
    assert right[2] > 2.0 * max(right[0], 1e-6), (left, right)
