"""Surface derivatives (dPdU/dPdV), orco/object/window texcos, and EWA
anisotropic filtering (reference surface.h surfacePoint_t +
basicnodes.cc textureMapper_t + imagetex.cc EWA; VERDICT r2 items #6/#7).
"""
import numpy as np
import jax.numpy as jnp

from libyafaray_tpu.scene.params import ParamMap
from libyafaray_tpu.scene.scene import Scene


def _quad_scene(matrix=None, texco="orco"):
    """One unit quad in z=0 with uv in [0,1]^2, textured with a clouds
    procedural mapped in `texco` space; optionally instanced under a
    transform."""
    sc = Scene()
    mp = ParamMap({"type": "shinydiffusemat",
                   "diffuse_color": (0.8, 0.8, 0.8)})
    sc.create_material("m", mp)
    tp = ParamMap({"type": "clouds", "size": 2.0})
    sc.create_texture("t", tp)
    sc.texture_mappers[0] = (texco, "plain", (1.0, 1.0, 1.0),
                             (0.0, 0.0, 0.0))
    mid = sc.start_tri_mesh(has_uv=True)
    # P = (4u, 2v, 0): dPdU = (4,0,0), dPdV = (0,2,0)
    for (x, y) in ((0, 0), (4, 0), (4, 2), (0, 2)):
        sc.add_vertex(x, y, 0.0)
    for (u, v) in ((0, 0), (1, 0), (1, 1), (0, 1)):
        sc.add_uv(u, v)
    sc.add_triangle(0, 1, 2, 0, 0, 1, 2)
    sc.add_triangle(0, 2, 3, 0, 0, 2, 3)
    sc.end_tri_mesh()
    if matrix is not None:
        sc.add_instance(mid, matrix)
    return sc


def test_dpdu_dpdv_in_shade_pack():
    sc = _quad_scene()
    cs = sc.compile()
    pk = np.asarray(cs.arrays["tri_shade_pack"])
    assert pk.shape[1] == 36
    # base mesh tris are the first two rows (instances append after)
    for t in range(2):
        assert np.allclose(pk[t, 30:33], [4.0, 0.0, 0.0], atol=1e-5)
        assert np.allclose(pk[t, 33:36], [0.0, 2.0, 0.0], atol=1e-5)


def test_dpdu_onb_fallback_without_uv():
    sc = Scene()
    sc.create_material("m", ParamMap({"type": "shinydiffusemat"}))
    sc.start_tri_mesh()
    for (x, y) in ((0, 0), (1, 0), (0, 1)):
        sc.add_vertex(x, y, 0.0)
    sc.add_triangle(0, 1, 2, 0)
    sc.end_tri_mesh()
    cs = sc.compile()
    pk = np.asarray(cs.arrays["tri_shade_pack"])
    du, dv = pk[0, 30:33], pk[0, 33:36]
    gn = pk[0, 24:27]
    # fallback frame: unit, orthogonal, tangent to the face
    assert abs(np.linalg.norm(du) - 1.0) < 1e-5
    assert abs(np.linalg.norm(dv) - 1.0) < 1e-5
    assert abs(du @ dv) < 1e-5
    assert abs(du @ gn) < 1e-5 and abs(dv @ gn) < 1e-5


def test_surface_point_carries_derivs_and_orco():
    from libyafaray_tpu.integrators.engine import (_closest_hit,
                                                   _surface_point)

    sc = _quad_scene()
    cs = sc.compile()
    assert cs.static.need_orco
    assert "tri_orco_pack" in cs.arrays
    n = 8
    org = jnp.asarray(np.stack([np.linspace(0.5, 3.5, n),
                                np.full(n, 1.0), np.full(n, 3.0)],
                               axis=1), jnp.float32)
    d = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    hit = _closest_hit(cs.arrays, cs.static, org, d)
    sp = _surface_point(cs.arrays, hit, org, d)
    assert np.asarray(hit.hit).all()
    assert np.allclose(np.asarray(sp["dpdu"]), [4.0, 0.0, 0.0], atol=1e-4)
    assert np.allclose(np.asarray(sp["dpdv"]), [0.0, 2.0, 0.0], atol=1e-4)
    # orco: bbox-normalized local coords in [-1,1]
    oc = np.asarray(sp["orco"])
    assert np.allclose(oc[:, 0], (np.asarray(org)[:, 0] - 2.0) / 2.0,
                       atol=1e-4)
    assert np.allclose(oc[:, 2], 0.0, atol=1e-3)
    # local = untransformed coords = world here (no instance)
    assert np.allclose(np.asarray(sp["local"])[:, 0],
                       np.asarray(org)[:, 0], atol=1e-4)


def test_orco_texture_invariant_under_instancing():
    """A procedural mapped in orco space must render identically on an
    instance-transformed copy of the mesh (reference orco semantics —
    the r2 fallback to world P broke exactly this)."""
    from libyafaray_tpu.integrators.engine import (_closest_hit,
                                                   _surface_point)
    from libyafaray_tpu.textures.eval import sample_texture

    # identity placement vs translate+rotate placement (rotate 90° about
    # z then translate): the same material point must get the same value
    mtx = np.array([[0, -1, 0, 10],
                    [1, 0, 0, -3],
                    [0, 0, 1, 5],
                    [0, 0, 0, 1]], np.float64).reshape(-1)
    sc_a = _quad_scene()
    sc_b = _quad_scene(matrix=mtx)
    cs_a = sc_a.compile()
    cs_b = sc_b.compile()

    n = 16
    xs = np.linspace(0.2, 3.8, n)
    ys = np.linspace(0.2, 1.8, n)
    org_a = jnp.asarray(np.stack([xs, ys, np.full(n, 3.0)], axis=1),
                        jnp.float32)
    d_a = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    hit_a = _closest_hit(cs_a.arrays, cs_a.static, org_a, d_a)
    sp_a = _surface_point(cs_a.arrays, hit_a, org_a, d_a)
    val_a = np.asarray(sample_texture(cs_a.arrays, cs_a.static, 0, sp_a))

    # the same material points on the INSTANCE: x' = -y + 10, y' = x - 3
    org_b = jnp.asarray(np.stack([-ys + 10.0, xs - 3.0,
                                  np.full(n, 8.0)], axis=1), jnp.float32)
    d_b = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    hit_b = _closest_hit(cs_b.arrays, cs_b.static, org_b, d_b)
    sp_b = _surface_point(cs_b.arrays, hit_b, org_b, d_b)
    # restrict to instance triangles (base mesh tris 0-1 also exist in
    # scene B at the original place; our rays hit the instanced copy)
    assert np.asarray(hit_b.hit).all()
    val_b = np.asarray(sample_texture(cs_b.arrays, cs_b.static, 0, sp_b))
    assert np.allclose(val_a, val_b, atol=1e-4)
    # sanity: a world-P (global) mapping would NOT be invariant
    val_g_a = np.asarray(sample_texture(
        cs_a.arrays, cs_a.static, 0, sp_a,
        mapping_over=("global", "plain", (1.0, 1.0, 1.0), (0, 0, 0))))
    val_g_b = np.asarray(sample_texture(
        cs_b.arrays, cs_b.static, 0, sp_b,
        mapping_over=("global", "plain", (1.0, 1.0, 1.0), (0, 0, 0))))
    assert not np.allclose(val_g_a, val_g_b, atol=1e-3)


def test_window_texco_uses_raster_coords():
    from libyafaray_tpu.textures.eval import _mapped_coords

    class St:
        texture_mappings = (("window", "plain", (1.0, 1.0, 1.0),
                             (0.0, 0.0, 0.0)),)
        textures = (("clouds", ()),)

    win = jnp.asarray([[0.25, 0.75]], jnp.float32)
    sp = {"win": win, "p": jnp.zeros((1, 3), jnp.float32),
          "uv": jnp.zeros((1, 2), jnp.float32)}
    u, v, _ = _mapped_coords(St(), 0, sp)
    assert np.allclose(np.asarray(u), 0.25)
    assert np.allclose(np.asarray(v), 0.75)


def test_ewa_beats_trilinear_on_oblique_footprint():
    """Anisotropic footprint: EWA must differ from trilinear and match a
    brute-force footprint average better (VERDICT r2 'done' criterion)."""
    from libyafaray_tpu.textures.factory import (build_mip_atlas,
                                                 mip_level_meta)
    from libyafaray_tpu.textures.eval import (sample_image_bilinear,
                                              sample_image_ewa,
                                              sample_image_trilinear,
                                              _ewa_uv_axes)

    rng = np.random.default_rng(3)
    # vertical stripes: heavy u-frequency, constant in v
    img = np.zeros((64, 64, 3), np.float32)
    img[:, ::2] = 1.0
    atlas = jnp.asarray(build_mip_atlas(img))
    levels = mip_level_meta(64, 64)

    n = 32
    u = jnp.asarray(rng.random(n), jnp.float32)
    v = jnp.asarray(rng.random(n), jnp.float32)
    # footprint: long along v (stripes stay sharp), narrow along u
    duv_maj = jnp.tile(jnp.asarray([[0.0, 0.25]], jnp.float32), (n, 1))
    duv_min = jnp.tile(jnp.asarray([[0.01, 0.0]], jnp.float32), (n, 1))
    out_ewa = np.asarray(sample_image_ewa(atlas, levels, u, v,
                                          duv_maj, duv_min))
    # trilinear at the ISOTROPIC lod the major axis would force
    lod_maj = float(np.log2(0.25 * 64 * 2.0))
    out_tri = np.asarray(sample_image_trilinear(
        atlas, levels, u, v, jnp.full(n, lod_maj)))
    # ground truth: average bilinear over the ellipse
    ks = 33
    gt = 0.0
    for k in range(ks):
        f = (k + 0.5) / ks - 0.5
        gt = gt + np.asarray(sample_image_bilinear(
            jnp.asarray(img), u + 2 * f * duv_maj[:, 0],
            v + 2 * f * duv_maj[:, 1]))
    gt = gt / ks
    err_ewa = np.abs(out_ewa - gt).mean()
    err_tri = np.abs(out_tri - gt).mean()
    assert not np.allclose(out_ewa, out_tri, atol=5e-2)
    assert err_ewa < err_tri * 0.5, (err_ewa, err_tri)

    # axes builder: grazing view on a floor quad stretches along view dir
    sp = dict(
        ng=jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        view=jnp.asarray([[np.sqrt(1 - 0.01), 0.0, -0.1]], jnp.float32),
        fp=jnp.asarray([0.02], jnp.float32),
        dpdu=jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
        dpdv=jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
    )
    dmaj, dmin = _ewa_uv_axes(sp)
    lmaj = float(jnp.linalg.norm(dmaj, axis=-1)[0])
    lmin = float(jnp.linalg.norm(dmin, axis=-1)[0])
    assert lmaj > 4.0 * lmin  # strong anisotropy at grazing angle
    assert abs(lmin - 0.02) < 1e-3  # minor = cone width
