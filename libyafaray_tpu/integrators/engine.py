"""The wavefront render engine — shared by directlighting & pathtracing.

Reference call stack replaced (SURVEY §3.3): tiledIntegrator_t::render's
thread-per-tile recursion becomes ONE jitted function per (scene-static,
config) pair that advances every pixel by one sample:

    sample_step : (scene arrays, film, flags) -> film'
      generate rays  (camera.shoot_rays over pixel lanes, QMC dims 0..3)
      bounce 0 explicit (full per-light sample counts for NEE),
      bounces 1..N under lax.scan (dynamic QMC dims; 1 NEE sample/light) —
      the scan keeps the compiled graph small: the bounce body is traced
      once, not once per depth.
      splat into film planes (scatter-free, film/imagefilm.py)

Everything is SoA over N = H·W lanes; dead lanes are masked, not compacted.
This is a MEASURED design decision (r4, scripts/probe_occupancy.py on
cornell_path at raydepth 10, v5e): with production RR occupancy falls to
17%/5%/1.7% entering bounces 3/5/6, BUT the marginal cost of a masked
bounce is ~0.25 ms of a 4.8 ms raydepth-10 step (time-sweep bounces
0..10: 2.35 -> 4.81 ms) because dead lanes' corridors collapse to empty
cluster lists in the streaming intersect kernels and the leftover dense
shading math is VPU-cheap.  Zero-cost compaction of everything past
bounce 3 could reclaim <25% of a DEEP config's step (0% at the default
raydepth-5 spacing), which is below the gather/scatter cost of
compacting the ~36-float lane state each way every bounce — the
occupancy question is closed by the marginal-cost bound, not deferred.
(The adaptive-AA COMPACT passes are a different axis — whole-path lane
sets shrink there, and that is implemented: make_sample_step(compact_n).)
The emission double-count guard (reference `includeLights`, SURVEY App. D)
is the `spec_mask`/`prev_pdf` pair: BSDF-sampled emission hits are MIS-
weighted against the light-sample strategy unless the previous bounce was
delta.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..backgrounds.base import eval_background
from ..cameras.base import shoot_rays
from ..core import math as vmath
from ..core import qmc
from ..core.sampling import power_heuristic, sample_cos_hemisphere
from ..film.imagefilm import film_splat
from ..lights import base as lightmod
from ..materials import bsdf
from ..materials import blend as blendmod
from ..materials.base import gather_rows
from ..ops import intersect as isect
from .config import RenderConfig


def _sphere_hits(spheres, org, dirn, tmin, tmax):
    """Exact quadric intersection against the (S,5) analytic sphere pack
    (reference std_primitives.cc sphere_t::intersect).  Returns
    (t (N,), idx (N,), hit (N,))."""
    c = spheres[:, 0:3]
    r = spheres[:, 3]
    oc = org[:, None, :] - c[None]                     # (N,S,3)
    b = jnp.sum(oc * dirn[:, None, :], axis=-1)        # (N,S)
    cq = jnp.sum(oc * oc, axis=-1) - r[None] * r[None]
    disc = b * b - cq
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > tmin[:, None], t0, t1)
    ok = ok & (t > tmin[:, None]) & (t < tmax[:, None])
    t = jnp.where(ok, t, jnp.inf)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    tb = jnp.min(t, axis=1)
    return tb, idx, jnp.isfinite(tb)


def _merge_sphere_hits(scene_arrays, static, hit, org, dirn, tmin, tmax):
    if static.n_spheres == 0 or "spheres" not in scene_arrays:
        return hit
    st, sidx, shit = _sphere_hits(scene_arrays["spheres"], org, dirn,
                                  tmin, tmax)
    better = shit & (st < hit.t)
    # sphere hits are encoded as tri = -2 - sphere_index; _surface_point
    # decodes them into an analytic shading record
    return isect.Hit(
        t=jnp.where(better, st, hit.t),
        tri=jnp.where(better, -2 - sidx, hit.tri),
        u=jnp.where(better, 0.0, hit.u),
        v=jnp.where(better, 0.0, hit.v),
        hit=hit.hit | better,
    )


def _closest_hit(scene_arrays, static, org, dirn, tmin=None, tmax=None,
                 coherent: bool = False):
    n_ = org.shape[0]
    if static.n_spheres:
        if tmin is None:
            tmin = jnp.full((n_,), isect.RAY_EPS, jnp.float32)
        if tmax is None:
            tmax = jnp.full((n_,), jnp.inf, jnp.float32)
        hit = _closest_hit_tris(scene_arrays, static, org, dirn, tmin,
                                tmax, coherent)
        return _merge_sphere_hits(scene_arrays, static, hit, org, dirn,
                                  tmin, tmax)
    return _closest_hit_tris(scene_arrays, static, org, dirn, tmin, tmax,
                             coherent)


def _closest_hit_tris(scene_arrays, static, org, dirn, tmin=None,
                      tmax=None, coherent: bool = False):
    if static.intersector == "bvh":
        from ..ops.bvh_traverse import closest_hit_bvh

        return closest_hit_bvh(scene_arrays["bvh"], scene_arrays["tris"],
                               org, dirn, tmin, tmax)
    from ..ops import pallas_intersect as pli

    if (pli._use_pallas() and static.n_tris_real <= pli.MAX_TRIS
            and "tri_pack10" in scene_arrays):
        n = org.shape[0]
        if tmin is None:
            tmin = jnp.full((n,), isect.RAY_EPS, jnp.float32)
        if tmax is None:
            tmax = jnp.full((n,), jnp.inf, jnp.float32)
        t, tri, u, v, hit = pli.closest_hit_pallas(
            scene_arrays["tri_pack10"], scene_arrays["tri_cluster8"],
            org, dirn, tmin, tmax, n_tris=static.n_tris_real,
            presorted=coherent)
        return isect.Hit(t=t, tri=tri, u=u, v=v, hit=hit)
    return isect.closest_hit_brute(scene_arrays["tris"], org, dirn, tmin,
                                   tmax, chunk=static.chunk,
                                   geom_pack=scene_arrays.get(
                                       "tri_geom_pack"))


def _shadow_transmission(scene_arrays, static, cfg, org, dirn, dist,
                         coherent: bool = False):
    tr_sph = None
    if static.n_spheres and "spheres" in scene_arrays:
        sp = scene_arrays["spheres"]
        sfil = (scene_arrays["sphere_filt"] if cfg.transp_shad
                else scene_arrays["sphere_filt_binary"])
        c = sp[:, 0:3]
        r = sp[:, 3]
        oc = org[:, None, :] - c[None]
        b = jnp.sum(oc * dirn[:, None, :], axis=-1)
        cq = jnp.sum(oc * oc, axis=-1) - r[None] * r[None]
        disc = b * b - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        tmin_s = isect.SHADOW_EPS
        tmax_s = (dist * (1.0 - 1e-4) - isect.SHADOW_EPS)[:, None]
        # a shadow ray through a transparent sphere crosses TWO
        # interfaces — apply the filter once per quadric root inside
        # [tmin, tmax], matching the per-triangle-crossing behavior of
        # an equivalent tessellated sphere (ADVICE r2)
        ok = disc >= 0.0
        ok0 = (ok & (t0 > tmin_s) & (t0 < tmax_s)).astype(jnp.float32)
        ok1 = (ok & (t1 > tmin_s) & (t1 < tmax_s)).astype(jnp.float32)
        opacity = 1.0 - sfil[None]                     # (1,S,3)
        factor = ((1.0 - ok0[..., None] * opacity)
                  * (1.0 - ok1[..., None] * opacity))
        tr_sph = jnp.prod(factor, axis=1)             # (N,3)
    filt = (scene_arrays["shadow_filt"] if cfg.transp_shad
            else scene_arrays["shadow_filt_binary"])
    if static.intersector == "bvh":
        from ..ops.bvh_traverse import shadow_transmission_bvh

        tr = shadow_transmission_bvh(
            scene_arrays["sbvh"], scene_arrays["stris"], filt, org, dirn,
            dist)
        return tr if tr_sph is None else tr * tr_sph
    from ..ops import pallas_intersect as pli

    n_stris = scene_arrays.get("stri_pack10", None)
    if (pli._use_pallas() and n_stris is not None
            and n_stris.shape[1] <= pli.MAX_TRIS):
        filt4 = (scene_arrays["sfilt4"] if cfg.transp_shad
                 else scene_arrays["sfilt4_binary"])
        tr = pli.shadow_transmission_pallas(
            scene_arrays["stri_pack10"], scene_arrays["stri_cluster8"],
            filt4, org, dirn, dist,
            n_tris=getattr(static, "n_stris_real", 0)
            or n_stris.shape[1], presorted=coherent)
        return tr if tr_sph is None else tr * tr_sph
    tr = isect.shadow_transmission_brute(
        scene_arrays["stris"], filt, org, dirn, dist, chunk=static.chunk
    )
    return tr if tr_sph is None else tr * tr_sph


def _surface_point(scene_arrays, hit, org, dirn, fp=None):
    """Hit -> shading record.  All per-triangle attributes come from ONE
    packed gather (tri_shade_pack: pos 0:9, normal 9:18, uv 18:24,
    geo_n 24:27, mat 27, light_id 28, uv_density 29, dPdU 30:33,
    dPdV 33:36) — TPU gathers have a large fixed cost, so one wide
    gather beats eight narrow ones.  When the scene carries
    tri_orco_pack (a texco needs orco/object coords) a second gather
    fills sp["orco"]/sp["local"].
    fp: optional (N,) ray-cone footprint at the hit (world units), used
    for texture mip LOD selection (reference spDifferentials_t role)."""
    tri = jnp.clip(hit.tri, 0, scene_arrays["tri_shade_pack"].shape[0] - 1)
    b1, b2 = hit.u, hit.v
    b0 = 1.0 - b1 - b2
    pk = scene_arrays["tri_shade_pack"][tri]  # (N, 36)
    p0, p1, p2 = pk[:, 0:3], pk[:, 3:6], pk[:, 6:9]
    n0, n1, n2 = pk[:, 9:12], pk[:, 12:15], pk[:, 15:18]
    uv0, uv1, uv2 = pk[:, 18:20], pk[:, 20:22], pk[:, 22:24]
    p = b0[..., None] * p0 + b1[..., None] * p1 + b2[..., None] * p2
    n = vmath.normalize(
        b0[..., None] * n0 + b1[..., None] * n1 + b2[..., None] * n2)
    ng = pk[:, 24:27]
    uv = b0[..., None] * uv0 + b1[..., None] * uv1 + b2[..., None] * uv2
    mat = pk[:, 27].astype(jnp.int32)
    light_id = pk[:, 28].astype(jnp.int32)
    uv_density = pk[:, 29]
    dpdu = pk[:, 30:33]
    dpdv = pk[:, 33:36]
    orco = local = None
    if "tri_orco_pack" in scene_arrays:
        ok = scene_arrays["tri_orco_pack"][tri]  # (N, 18)
        o0, o1, o2 = ok[:, 0:3], ok[:, 3:6], ok[:, 6:9]
        l0, l1, l2 = ok[:, 9:12], ok[:, 12:15], ok[:, 15:18]
        orco = b0[..., None] * o0 + b1[..., None] * o1 + b2[..., None] * o2
        local = b0[..., None] * l0 + b1[..., None] * l1 \
            + b2[..., None] * l2

    if "spheres" in scene_arrays:
        # analytic sphere hits (tri encoded as -2 - sphere_index): exact
        # position/normal + lat-long uv (reference sphere_t::getSurface)
        is_sph = hit.tri < -1
        sp_pk = scene_arrays["spheres"]
        si = jnp.clip(-2 - hit.tri, 0, sp_pk.shape[0] - 1)
        srow = sp_pk[si]
        p_s = org + hit.t[..., None] * dirn
        n_s = vmath.normalize(p_s - srow[:, 0:3])
        uv_s = jnp.stack([
            0.5 + jnp.arctan2(n_s[..., 1], n_s[..., 0]) / (2.0 * jnp.pi),
            0.5 - jnp.arcsin(jnp.clip(n_s[..., 2], -1.0, 1.0)) / jnp.pi,
        ], axis=-1)
        m3 = is_sph[..., None]
        p = jnp.where(m3, p_s, p)
        n = jnp.where(m3, n_s, n)
        ng = jnp.where(m3, n_s, ng)
        uv = jnp.where(m3, uv_s, uv)
        mat = jnp.where(is_sph, srow[:, 4].astype(jnp.int32), mat)
        light_id = jnp.where(is_sph, -1, light_id)
        uv_density = jnp.where(
            is_sph, 1.0 / jnp.maximum(jnp.pi * srow[:, 3], 1e-6),
            uv_density)
        # analytic lat-long derivatives: u = 0.5 + atan2(ny,nx)/2pi,
        # v = 0.5 - asin(nz)/pi on a radius-r sphere =>
        # dPdU = 2*pi*r*(-ny, nx, 0), dPdV = pi*r*(nx,ny,nz->slope)
        r_s = srow[:, 3:4]
        nx, ny, nz = n_s[..., 0:1], n_s[..., 1:2], n_s[..., 2:3]
        dpdu_s = 2.0 * jnp.pi * r_s * jnp.concatenate(
            [-ny, nx, jnp.zeros_like(nx)], axis=-1)
        cos_lat = jnp.sqrt(jnp.maximum(1.0 - nz * nz, 1e-12))
        dpdv_s = jnp.pi * r_s * jnp.concatenate(
            [nx * nz / cos_lat, ny * nz / cos_lat, -cos_lat], axis=-1)
        dpdu = jnp.where(m3, dpdu_s, dpdu)
        dpdv = jnp.where(m3, dpdv_s, dpdv)
        if orco is not None:
            orco = jnp.where(m3, n_s, orco)
            local = jnp.where(m3, p_s - srow[:, 0:3], local)

    out = dict(
        p=p, n=n, ng=ng, uv=uv, mat=mat, light_id=light_id,
        uv_density=uv_density, dpdu=dpdu, dpdv=dpdv, view=dirn,
        t=hit.t, tri=tri, fp=fp,
    )
    if orco is not None:
        out["orco"] = orco
        out["local"] = local
    return out


_LIGHT_SAMPLERS = {
    lightmod.LT_POINT: lightmod.sample_point,
    lightmod.LT_SPOT: lightmod.sample_spot,
    lightmod.LT_DIRECTIONAL: lightmod.sample_directional,
    lightmod.LT_SUN: lightmod.sample_sun,
    lightmod.LT_AREA: lightmod.sample_area,
    lightmod.LT_SPHERE: lightmod.sample_sphere_light,
}


def _sample_one_light(scene_arrays, static, li, ls, lrow, p, u1, u2):
    if ls.ltype == lightmod.LT_PORTAL:
        tri_cdf = scene_arrays[f"mlight_cdf_{li}"]
        tri_pos = lax.slice_in_dim(
            scene_arrays["tri_pos"], ls.tri_start,
            ls.tri_start + ls.tri_count, axis=0)
        smp = lightmod.sample_mesh_light(lrow, p, u1, u2, tri_cdf, tri_pos)
        bg = eval_background(
            static.bg,
            scene_arrays.get("bg_image_ibl", scene_arrays.get("bg_image")),
            smp["wi"])
        smp["li"] = bg * lrow["power"]
        return smp
    if ls.ltype == lightmod.LT_MESH:
        tri_cdf = scene_arrays[f"mlight_cdf_{li}"]
        tri_pos = lax.slice_in_dim(
            scene_arrays["tri_pos"], ls.tri_start,
            ls.tri_start + ls.tri_count, axis=0)
        return lightmod.sample_mesh_light(lrow, p, u1, u2, tri_cdf, tri_pos)
    if ls.ltype == lightmod.LT_BACKGROUND:
        from ..lights.bglight import sample_bg_light

        return sample_bg_light(scene_arrays, static.bg, p, u1, u2)
    if ls.ltype == lightmod.LT_IES:
        from ..lights.ies import apply_ies_profile

        smp = lightmod.sample_point(lrow, p, u1, u2)
        fac = apply_ies_profile(scene_arrays[f"ies_{li}"],
                                lrow["direction"], smp["wi"])
        smp["li"] = smp["li"] * fac[..., None]
        return smp
    return _LIGHT_SAMPLERS[ls.ltype](lrow, p, u1, u2)


def _make_mat_resolve(scene_arrays, static, sp):
    """resolve callback for materials/blend.py child rows: re-applies
    texture/node overrides to gathered composite-child rows per nesting
    level (reference blendmat.cc delegates initBSDF to BOTH children, so
    their shader stacks — incl. a nested blend's mapped blend_value —
    evaluate at every hit).  Returns None when the scene's composites
    have no textured children (SceneStatic.blend_child_textured): the
    common case pays nothing.  Handles ns-tiled lane counts (the NEE
    multi-sample path tiles lanes block-major via broadcast_to)."""
    if not (static.has_blend
            and getattr(static, "blend_child_textured", False)
            and (static.textures
                 or getattr(static, "node_programs", ()))):
        return None
    from ..textures.eval import apply_textures

    base = sp["p"].shape[0]

    def resolve(r):
        n_lanes = r["mtype"].shape[0]
        spr = sp
        if n_lanes != base:
            k = n_lanes // base
            spr = {kk: (jnp.broadcast_to(v[None], (k,) + v.shape)
                        .reshape((k * base,) + v.shape[1:])
                        if hasattr(v, "shape") and v.shape[:1] == (base,)
                        else v)
                   for kk, v in sp.items()}
        return apply_textures(scene_arrays, static, r, spr)

    return resolve


def _direct_lighting(scene_arrays, static, cfg, sp, row, wo, n_f,
                     s_idx, skey, bounce_dim, ns_scale=1,
                     mis_with_bsdf=True, alive=None):
    """NEE with two-strategy MIS over all enabled lights (reference
    estimateAllDirectLight / estimateOneDirect).  Returns (L, n_shadow_rays).
    `bounce_dim` may be a traced dim base (dynamic inside the bounce scan).
    ns_scale=1 uses each light's full `samples` count (primary vertices);
    0 forces 1 sample per light (deep path vertices).
    mis_with_bsdf=False -> single-strategy NEE (weight 1): required when the
    caller never evaluates the BSDF-sample counterpart (directlighting mode
    kills non-specular continuations, so MIS weights would silently drop
    that share of the energy).

    Returns (L, n_shadow_rays, shadow_mean) — shadow_mean is the average
    shadow-ray transmission luminance over all samples (the "shadow"
    render pass, reference renderpasses.cc)."""
    L = jnp.zeros_like(sp["p"])
    sh_sum = jnp.zeros(sp["p"].shape[:1], jnp.float32)
    sh_cnt = 0
    nrays = 0
    mat_resolve = _make_mat_resolve(scene_arrays, static, sp)
    dyn = not isinstance(bounce_dim, int)
    dim_u = bounce_dim + qmc.SLOT_LIGHT_U
    dim_v = bounce_dim + qmc.SLOT_LIGHT_V

    for li, ls in enumerate(static.lights):
        if not ls.enabled or ls.photon_only:
            continue
        lrow = lightmod.light_row(scene_arrays["lights"], li)
        # per-pass sample multipliers (reference
        # AA_light/indirect_sample_multiplier_factor; render() bakes the
        # current pass's factor into cfg.light_ns_mult/indirect_ns_mult)
        if ns_scale:
            ns = max(1, int(round(ls.samples * cfg.light_ns_mult)))
        else:
            ns = max(1, int(round(cfg.indirect_ns_mult)))
        skey_l = qmc.hash_combine(skey, jnp.uint32(0xABCD01 + 131 * li))

        def sample_terms(sub_idx, skey_v, p_, n_, ng_, row_, wo_, nf_,
                         dim_u_=None, dim_v_=None, alive_=None):
            """NEE term(s) for lanes of any flat size (N or ns·N)."""
            from ..core.color import luminance as _lum

            du_ = dim_u if dim_u_ is None else dim_u_
            dv_ = dim_v if dim_v_ is None else dim_v_
            if dyn:
                u1 = qmc.dynamic_sample_dim(sub_idx, du_, skey_v)
                u2 = qmc.dynamic_sample_dim(sub_idx, dv_, skey_v)
            else:
                u1, u2 = qmc.sample_dim_pair(sub_idx, du_, skey_v)
            smp = _sample_one_light(scene_arrays, static, li, ls, lrow,
                                    p_, u1, u2)
            cos_i = vmath.dot(n_, smp["wi"])
            f = blendmod.eval_bsdf(scene_arrays["materials"], row_,
                                   n_, ng_, wo_, smp["wi"],
                                   static.has_blend,
                                   families=static.mat_families,
                                   resolve=mat_resolve)
            contrib_w = jnp.abs(cos_i) / jnp.maximum(smp["pdf"], 1e-9)
            ok = smp["valid"] & (smp["pdf"] > 1e-9)
            if ls.cast_shadows:
                org_s = p_ + nf_ * jnp.sign(cos_i)[..., None] * \
                    static.shadow_bias
                # dead wavefront lanes get a negative dist -> empty
                # corridor: no shadow work (their term is masked anyway)
                d_ = (smp["dist"] if alive_ is None
                      else jnp.where(alive_, smp["dist"], -1.0))
                tr = _shadow_transmission(scene_arrays, static, cfg, org_s,
                                          smp["wi"], d_,
                                          coherent=bool(ns_scale))
            else:
                tr = jnp.ones_like(f)
            term = f * smp["li"] * tr * contrib_w[..., None]
            if mis_with_bsdf and (not ls.is_delta) and ls.intersectable:
                bpdf = blendmod.pdf_bsdf(scene_arrays["materials"],
                                         row_, n_, ng_, wo_,
                                         smp["wi"], static.has_blend,
                                         families=static.mat_families,
                                         resolve=mat_resolve)
                w = power_heuristic(smp["pdf"], bpdf)
                term = term * w[..., None]
            return jnp.where(ok[..., None], term, 0.0), _lum(tr)

        n0 = sp["p"].shape[0]
        if ns == 1:
            accum, sh_acc = sample_terms(s_idx * ns, skey_l, sp["p"],
                                         sp["n"], sp["ng"], row, wo, n_f,
                                         alive_=alive)
        elif ns * n0 <= 5_000_000:  # above: (ns·N, 3) temps OOM'd 16G HBM
            # BATCHED NEE: all ns light samples go through ONE
            # eval/shadow pass over ns·N flat lanes — the r2 scan paid
            # the intersector's per-call fixed cost (ray sort, padding,
            # cluster prelude) ns times per step (ns=16 on the Cornell
            # configs).  Broadcast views fuse; peak memory is gated.
            s = jnp.arange(ns, dtype=jnp.uint32)
            sub_idx = (s_idx[None, :] * ns + s[:, None]).reshape(-1)

            def tile(x):
                return jnp.broadcast_to(
                    x[None], (ns,) + x.shape).reshape(
                        (ns * n0,) + x.shape[1:])

            row_f = {k: tile(v) for k, v in row.items()}
            # dyn dim bases can be PER-LANE arrays (photonmap final
            # gather passes hp_bdim) — tile those alongside the lanes
            du_t = (tile(dim_u) if dyn and getattr(dim_u, "ndim", 0) >= 1
                    else None)
            dv_t = (tile(dim_v) if dyn and getattr(dim_v, "ndim", 0) >= 1
                    else None)
            terms, sh = sample_terms(
                sub_idx, tile(skey_l), tile(sp["p"]), tile(sp["n"]),
                tile(sp["ng"]), row_f, tile(wo), tile(n_f),
                dim_u_=du_t, dim_v_=dv_t,
                alive_=None if alive is None else tile(alive))
            accum = jnp.sum(terms.reshape(ns, n0, 3), axis=0)
            sh_acc = jnp.sum(sh.reshape(ns, n0), axis=0)
        else:
            def body(carry, s):
                ca, cs = carry
                t, sh = sample_terms(s_idx * ns + s, skey_l, sp["p"],
                                     sp["n"], sp["ng"], row, wo, n_f,
                                     alive_=alive)
                return (ca + t, cs + sh), None

            (accum, sh_acc), _ = lax.scan(
                body, (jnp.zeros_like(L), jnp.zeros_like(sh_sum)),
                jnp.arange(ns, dtype=jnp.uint32))
        if ls.cast_shadows:
            nrays += ns
        L = L + accum / ns
        sh_sum = sh_sum + sh_acc / ns
        sh_cnt += 1
    return L, nrays, sh_sum / max(sh_cnt, 1)


def _ambient_occlusion(scene_arrays, static, cfg, sp, row, wo, n_f,
                       s_idx, skey, alive=None):
    """sampleAmbientOcclusion parity (SURVEY §2.10).  All ao_samples
    occlusion rays go through ONE batched shadow pass (same fixed-cost
    argument as the batched NEE in _direct_lighting)."""
    ao_col = jnp.asarray(cfg.ao_color, jnp.float32)
    ns = cfg.ao_samples
    n0 = sp["p"].shape[0]

    def tile(x):
        return jnp.broadcast_to(x[None], (ns,) + x.shape).reshape(
            (ns * n0,) + x.shape[1:])

    s = jnp.arange(ns, dtype=jnp.uint32)
    skey_a = qmc.hash_combine(tile(skey), jnp.repeat(
        jnp.uint32(0xA0A0) + s, n0))
    u1, u2 = qmc.sample_dim_pair(tile(s_idx), qmc.BOUNCE_DIMS_START,
                                 skey_a)
    nf_t = tile(n_f)
    d, _ = sample_cos_hemisphere(nf_t, u1, u2)
    org_s = tile(sp["p"]) + nf_t * static.shadow_bias
    dist = jnp.full((ns * n0,), cfg.ao_distance, jnp.float32)
    if alive is not None:  # dead lanes: empty corridor, no shadow work
        dist = jnp.where(tile(alive), dist, -1.0)
    tr = _shadow_transmission(scene_arrays, static, cfg, org_s, d, dist)
    ao = jnp.sum(tr.reshape(ns, n0, 3), axis=0) * row["diffuse_color"]
    return ao * ao_col / ns


def _clamped_sample(color, clamp_samples: float):
    """The AA_clamp_samples transform film_splat applies to wsum — the
    m2 plane must see the SAME clamped sample or the variance estimate
    diverges from the mean it is paired with."""
    if clamp_samples <= 0.0:
        return color
    m = jnp.max(color, axis=-1, keepdims=True)
    scale = jnp.where(m > clamp_samples,
                      clamp_samples / jnp.maximum(m, 1e-9), 1.0)
    return color * scale


def make_sample_step(static, camera, cfg: RenderConfig,
                     mode: str | None = None, caustic=None,
                     bd_exclude_caustics: bool = False,
                     compact_n: int = 0):
    """Builds the jittable one-sample-per-pixel step function.

    compact_n: when > 0, build the COMPACT adaptive-pass variant
    instead — sample_step(scene_arrays, film, pix_idx) with pix_idx a
    (compact_n,) i32 array of flat pixel ids (-1 = dead lane).  Lanes
    cover only the listed pixels, so the wavefront cost of a resample
    pass scales with the flagged-pixel count rather than H*W (the
    reference imagefilm resamples exactly the flagged pixels —
    SURVEY §2.11; dense masking can't reclaim that on a SIMD wavefront,
    compaction can).  QMC streams stay per-PIXEL (hash and sample index
    are derived from the pixel id and the film's nsamples plane), so a
    compact pass draws the same sample sequence the dense pass would.

    mode: "path" (pathtracing) or "direct" (directlighting: continuation
    only through specular/dispersive chains, depth = raydepth).
    caustic: optional (radius, n_emitted) caustic-map statics — adds the
    reference's caustic_type photon/both term (photonintegr-style density
    estimate at the first diffuse vertex).  The photon pack itself rides
    in scene_arrays["pm_caustic"] (a jit argument — closing over it bakes
    it into the HLO, see ops/photon_flash).
    bd_exclude_caustics: zero the emission adds of the light-traceable
    caustic family ONLY — paths whose first real (non-passthrough)
    vertex from the camera was diffuse and every vertex since was
    specular.  That is exactly the family the bidirectional
    integrator's light-tracing strategy covers (integrators/bidir.py:
    photons stored at a diffuse vertex after >=1 specular bounce,
    camera-connected in one segment).  Indirect or mirror-seen
    caustics stay with the eye strategy.
    """
    mode = mode or ("path" if cfg.integrator == "pathtracing" else "direct")
    h, w = cfg.height, cfg.width
    spb = max(1, cfg.spp_batch)
    n_pix = compact_n if compact_n else h * w
    n = n_pix * spb
    base_bounces = (cfg.bounces if mode == "path" else cfg.raydepth)
    # per-material additionalDepth (reference material.h): the scan is
    # extended by the table's max and lanes are gated per-lane on a
    # depth budget raised at vertices of high-additionalDepth materials.
    # extra == 0 (the common case) compiles to the r2 graph unchanged.
    extra_depth = int(getattr(static, "max_additional_depth", 0))
    n_bounces = base_bounces + extra_depth
    has_bg_light = any(
        ls.ltype == lightmod.LT_BACKGROUND and ls.enabled
        for ls in static.lights
    )
    has_portal = any(
        ls.ltype == lightmod.LT_PORTAL and ls.enabled
        for ls in static.lights
    )
    from ..cameras.base import pixel_cone

    cone0_s, cone0_w = pixel_cone(camera)
    lane_k = (jnp.arange(n, dtype=jnp.int32) // n_pix).astype(jnp.uint32)
    if compact_n:
        # compact mode: pixel ids arrive as a step INPUT; the per-pixel
        # hash/coords become dynamic (sample_step_compact below)
        lane_pix = py = px = pixel_hash = None
    else:
        lane_pix = jnp.arange(n, dtype=jnp.int32) % (h * w)
        py, px = jnp.divmod(lane_pix, w)
        pixel_hash = qmc.hash_u32(px.astype(jnp.uint32)
                                  ^ (py.astype(jnp.uint32) << 16)
                                  ^ jnp.uint32(cfg.qmc_seed))

    def shade_vertex(scene_arrays, state, bounce_dim, bounce_idx, s_idx,
                     first: bool, ph=None):
        if ph is None:
            ph = pixel_hash
        """One path vertex: intersect, add bg/emission (MIS), NEE, sample
        the continuation.  `state` carries the wavefront lanes."""
        (org, dirn, throughput, alive, spec_mask, prev_pdf, medium_sigma,
         wavelength, cone_w, cone_spread, tag, caustic_state, track, transp,
         depth_limit, L_refl, L_refr, L, nrays) = state

        def addL(Lt, Lr1, Lr2, x, mask):
            # tagged accumulation for the reflect/refract render passes:
            # contributions arriving through a bounce-0 specular reflect
            # (tag 1) / transmit (tag 2) chain also land in their plane
            x = jnp.where(mask[..., None], x, 0.0)
            return (Lt + x,
                    Lr1 + jnp.where((tag == 1)[..., None], x, 0.0),
                    Lr2 + jnp.where((tag == 2)[..., None], x, 0.0))
        mats = scene_arrays["materials"]
        dyn = not isinstance(bounce_dim, int)

        hit = _closest_hit(scene_arrays, static, org, dirn,
                           tmin=jnp.full((n,), static.ray_min_dist,
                                         jnp.float32),
                           tmax=jnp.where(alive, jnp.inf, -1.0),
                           coherent=first)
        # ray-cone footprint at the hit (texture LOD; diffRay_t analog)
        fp = cone_w + cone_spread * jnp.where(hit.hit, hit.t, 0.0)
        seg = jnp.where(hit.hit, hit.t, 0.0)
        throughput = throughput * jnp.exp(-medium_sigma * seg[..., None])

        if first and static.volumes and cfg.vol_integrator not in ("none",
                                                                   ""):
            from ..volumes.integrate import integrate_volume

            def _shadow(o, d, dist):
                return _shadow_transmission(scene_arrays, static, cfg, o, d,
                                            dist)

            vdist = jnp.where(hit.hit, hit.t, 1e8)
            l_vol, t_vol = integrate_volume(
                static.volumes, cfg.vol_integrator, scene_arrays, static,
                cfg, _shadow, org, dirn, vdist, s_idx, ph,
            )
            L = L + jnp.where(alive[..., None], throughput * l_vol, 0.0)
            throughput = throughput * t_vol[..., None]

        # escaped rays: background (MIS vs the IBL light's NEE strategy)
        bg = eval_background(static.bg, scene_arrays.get("bg_image"), dirn)
        escape = alive & ~hit.hit
        if has_bg_light:
            from ..lights.bglight import pdf_bg_dir

            pdf_bg = pdf_bg_dir(scene_arrays, static.bg, dirn)
            w_bg = jnp.where(spec_mask, 1.0,
                             power_heuristic(prev_pdf, pdf_bg))
            bg = bg * w_bg[..., None]
        elif has_portal:
            # portal NEE is the sole background strategy at non-specular
            # vertices (see lights/factory.py bgPortalLight note)
            bg = bg * jnp.where(spec_mask, 1.0, 0.0)[..., None]
        L, L_refl, L_refr = addL(L, L_refl, L_refr, throughput * bg,
                                 escape)
        # alpha/coverage: a lane whose camera-visibility chain (primary
        # ray + null passthrough + straight-through transparency +
        # refracted chains when bg_transp_refract) reaches the background
        # ends transparent (reference bg_transp semantics; material
        # getAlpha is realized by the MC sampling of the transparency
        # component — fractional alpha emerges across samples)
        transp = transp | (escape & track)
        alive = alive & hit.hit

        sp = _surface_point(scene_arrays, hit, org, dirn, fp=fp)
        if getattr(static, "need_window", False):
            # texco "window": raster position of the hit through the
            # render camera, normalized to [0,1]² (textures/eval.py)
            from ..cameras.base import project_to_camera

            pxw, pyw, _, _, _ = project_to_camera(camera, sp["p"])
            sp["win"] = jnp.stack([pxw / w, pyw / h], axis=-1)
        wo = -dirn
        row = gather_rows(mats, sp["mat"])
        if extra_depth > 0:
            # reaching a material with additionalDepth raises this lane's
            # depth budget (reference: raydepth + mat->additionalDepth)
            depth_limit = jnp.where(
                alive,
                jnp.maximum(depth_limit,
                            base_bounces + row["additional_depth"]),
                depth_limit)
        if static.textures or getattr(static, "node_programs", ()):
            # initBSDF analog: shader-node/texture overrides + bump
            from ..textures.eval import apply_textures, bump_normal

            row = apply_textures(scene_arrays, static, row, sp)
            sp = dict(sp, n=bump_normal(scene_arrays, static, row, sp))

        # ---- emission with MIS against NEE ----
        mat_resolve = _make_mat_resolve(scene_arrays, static, sp)
        emit = blendmod.emission(mats, row, sp["ng"], wo,
                                 static.has_blend,
                                 resolve=mat_resolve)
        li_id = sp["light_id"]
        is_light_tri = li_id >= 0
        is_sphere_l = jnp.zeros((n,), jnp.bool_)
        if len(static.lights):
            lpk = scene_arrays["lights"]["hit_pack"][jnp.maximum(li_id, 0)]
            area_l = lpk[:, 0]
            dbl = lpk[:, 1] > 0.5
            hr = lpk[:, 2:5]
            is_sphere_l = is_light_tri & (
                lpk[:, 5].astype(jnp.int32) == lightmod.LT_SPHERE)
            sl_c = lpk[:, 6:9]
            sl_r = lpk[:, 9]
            front = (vmath.dot(sp["ng"], wo) > 0.0) | dbl
            emit = emit + jnp.where((is_light_tri & front)[..., None],
                                    hr, 0.0)
        else:
            area_l = jnp.ones((n,), jnp.float32)
        cos_l = jnp.abs(vmath.dot(sp["ng"], wo))
        pdf_light_hit = (hit.t * hit.t) / jnp.maximum(
            area_l * jnp.maximum(cos_l, 1e-6), 1e-9)
        if len(static.lights) and any(
                ls.ltype == lightmod.LT_SPHERE for ls in static.lights):
            # sphere lights are NEE-sampled by visible-cap CONE: the MIS
            # counterpart pdf of a BSDF hit is the cone pdf from the ray
            # origin, not the area form (reference spherelight.cc)
            dvec = sl_c - org
            d_c2 = jnp.maximum(vmath.dot(dvec, dvec), 1e-12)
            sin2 = jnp.clip(sl_r * sl_r / d_c2, 0.0, 1.0)
            cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
            pdf_cone = 1.0 / jnp.maximum(
                2.0 * jnp.pi * (1.0 - cos_max), 1e-9)
            pdf_light_hit = jnp.where(is_sphere_l, pdf_cone,
                                      pdf_light_hit)
        # MIS only against lights that _direct_lighting actually samples:
        # a light with NEE disabled (not enabled / photon_only) has no
        # light-sampling counterpart, so down-weighting its BSDF-strategy
        # emission hit would lose that light's energy
        if len(static.lights):
            nee_flags = jnp.asarray(
                [1.0 if (ls.enabled and not ls.photon_only) else 0.0
                 for ls in static.lights], jnp.float32)
            nee_on = nee_flags[jnp.maximum(li_id, 0)] > 0.5
        else:
            nee_on = jnp.zeros((n,), jnp.bool_)
        mis_w = jnp.where(
            is_light_tri & ~spec_mask & nee_on,
            power_heuristic(prev_pdf, pdf_light_hit),
            1.0,
        )
        if bd_exclude_caustics:
            # Exclude EXACTLY the family the light-tracing strategy covers
            # (bidir.py): first real vertex from the camera was diffuse,
            # every real vertex since was specular, and this specular
            # chain now hits the light.  caustic_state==1 tracks that
            # predicate; the cumulative r2 after_diffuse flag also zeroed
            # indirect/mirror-seen caustics that light tracing never
            # recovers (ADVICE r2 medium).
            mis_w = jnp.where(is_light_tri & spec_mask
                              & (caustic_state == 1), 0.0, mis_w)
        L, L_refl, L_refr = addL(L, L_refl, L_refr,
                                 throughput * emit * mis_w[..., None],
                                 alive)

        # ---- shading frame ----
        backface = vmath.dot(sp["ng"], wo) < 0.0
        n_sh = jnp.where(backface[..., None], -sp["n"], sp["n"])
        ng_sh = jnp.where(backface[..., None], -sp["ng"], sp["ng"])
        sp_sh = dict(sp, n=n_sh, ng=ng_sh)

        if dyn:
            skey_b = qmc.hash_combine(ph,
                                      bounce_idx.astype(jnp.uint32))
        else:
            skey_b = qmc.hash_combine(ph, jnp.uint32(bounce_idx))

        # ---- NEE ----
        Ld, sh_rays, shadow_mean = _direct_lighting(
            scene_arrays, static, cfg, sp_sh, row, wo, ng_sh,
            s_idx, skey_b, bounce_dim, 1 if first else 0,
            mis_with_bsdf=(mode == "path"), alive=alive,
        )
        if cfg.aa_clamp_indirect > 0.0 and not first:
            m = jnp.max(Ld, axis=-1, keepdims=True)
            Ld = Ld * jnp.where(
                m > cfg.aa_clamp_indirect,
                cfg.aa_clamp_indirect / jnp.maximum(m, 1e-9), 1.0)
        L, L_refl, L_refr = addL(L, L_refl, L_refr, throughput * Ld,
                                 alive)
        nrays = nrays + sh_rays * jnp.sum(alive.astype(jnp.float32))

        ao = None
        want_ao_pass = first and any(
            p in cfg.passes for p in ("ao", "ao-clay"))
        if (cfg.do_ao and mode == "direct" and first) or want_ao_pass:
            ao = _ambient_occlusion(scene_arrays, static, cfg, sp_sh,
                                    row, wo, ng_sh, s_idx, skey_b,
                                    alive=alive)
        if cfg.do_ao and mode == "direct" and first:
            L = L + jnp.where(alive[..., None], throughput * ao, 0.0)

        if caustic is not None and first:
            # caustic photon map lookup at the first diffuse hit
            # (reference pathtracer caustic_type photon/both)
            import numpy as _np

            from ..core.sampling import INV_PI as _INV_PI
            from ..materials.base import MT_COATED_GLOSSY as _MTC, \
                MT_GLOSSY as _MTG, MT_SHINYDIFFUSE as _MTS
            from ..ops.photon_flash import density_auto as _dens

            c_radius, c_nem = caustic
            cflux, _ = _dens(scene_arrays["pm_caustic"], sp["p"], n_sh,
                             c_radius)
            lc = cflux / (_np.pi * c_radius * c_radius) / c_nem
            f_c = (row["diffuse_reflect"][..., None]
                   * row["diffuse_color"] * _INV_PI)
            mt_ = row["mtype"]
            is_diff = (mt_ == _MTS) | (mt_ == _MTG) | (mt_ == _MTC)
            L, L_refl, L_refr = addL(L, L_refl, L_refr,
                                     throughput * f_c * lc,
                                     alive & is_diff)

        # ---- continuation ----
        if dyn:
            u1 = qmc.dynamic_sample_dim(s_idx, bounce_dim + qmc.SLOT_BSDF_U,
                                        skey_b)
            u2 = qmc.dynamic_sample_dim(s_idx, bounce_dim + qmc.SLOT_BSDF_V,
                                        skey_b)
            ul = qmc.dynamic_sample_dim(
                s_idx, bounce_dim + qmc.SLOT_LIGHT_PICK, skey_b)
            u_rr = qmc.dynamic_sample_dim(s_idx, bounce_dim + qmc.SLOT_RR,
                                          skey_b)
        else:
            u1, u2 = qmc.sample_dim_pair(s_idx, bounce_dim + qmc.SLOT_BSDF_U,
                                         skey_b)
            ul, u_rr = qmc.sample_dim_pair(
                s_idx, bounce_dim + qmc.SLOT_LIGHT_PICK, skey_b)
        smp = blendmod.sample_bsdf(mats, row, n_sh, ng_sh, wo, u1, u2,
                                   ul, static.has_blend,
                                   wavelength=wavelength,
                                   families=static.mat_families,
                                   resolve=mat_resolve)
        wavelength = smp["new_wavelength"]

        if mode == "direct":
            cont = smp["specular"]
        else:
            cont = jnp.ones_like(smp["specular"])
        alive = alive & smp["valid"] & cont
        throughput = throughput * smp["tp"]

        # Russian roulette (reference: survival = max component)
        if mode == "path":
            q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
            if dyn:
                do_rr = bounce_idx >= cfg.rr_min_bounces
            else:
                do_rr = jnp.asarray(bounce_idx >= cfg.rr_min_bounces)
            kill = do_rr & (u_rr > q)
            alive = alive & ~kill
            throughput = jnp.where(do_rr,
                                   throughput / q[..., None], throughput)

        sig = row["absorption_sigma"]
        medium_sigma = jnp.where(
            smp["entering"][..., None], sig,
            jnp.where((smp["transmit"] & ~smp["entering"])[..., None],
                      0.0, medium_sigma),
        )
        off = jnp.where(smp["transmit"], -1.0, 1.0)[..., None]
        org = sp["p"] + ng_sh * off * static.shadow_bias
        dirn = smp["wi"]
        # null pass-through keeps the MIS state of the last REAL vertex
        pt = smp["passthrough"]
        # camera-visibility tracking for the alpha plane: survives null
        # passthrough and straight-through transparency (wi == -wo, the
        # shinydiffuse transparency component / fake glass); refracted
        # specular chains keep it only under bg_transp_refract
        straight = pt | (smp["specular"] & smp["transmit"]
                         & (vmath.dot(smp["wi"], -wo) > 0.999999))
        if cfg.bg_transp_refract:
            straight = straight | (smp["specular"] & smp["transmit"])
        track = track & straight
        spec_mask = jnp.where(pt, spec_mask, smp["specular"])
        prev_pdf = jnp.where(pt, prev_pdf, smp["pdf"])
        # cone grows at non-specular scatters by the lobe's angular spread
        # (ray-cone approximation; ~2/sqrt(e+2) for a Blinn-e lobe, 0.6
        # cap for diffuse where e=0)
        cone_w = fp
        lobe_spread = jnp.minimum(0.6, 2.0 * jax.lax.rsqrt(
            row["exponent"] + 2.0))
        cone_spread = cone_spread + jnp.where(smp["specular"] | pt, 0.0,
                                              lobe_spread)
        if first:
            # reflect/refract pass routing: tag paths by the bounce-0
            # specular continuation kind
            tag = jnp.where(
                alive & smp["specular"] & ~smp["transmit"], 1,
                jnp.where(alive & smp["specular"] & smp["transmit"], 2, 0),
            ).astype(jnp.int32)
        # caustic_state machine (bidir partition): 0 = no real vertex
        # yet, 1 = first real vertex diffuse + all-specular since
        # (the light-traceable family), 2 = broken (eye strategy keeps
        # it).  Null passthrough vertices leave the state unchanged —
        # the LT camera-connection's shadow walk sees through them too.
        caustic_state = jnp.where(
            pt, caustic_state,
            jnp.where(caustic_state == 0,
                      jnp.where(smp["specular"], 2, 1),
                      jnp.where((caustic_state == 1) & ~smp["specular"],
                                2, caustic_state)))
        if extra_depth > 0:
            # per-lane depth gate: the next vertex index must fit the
            # lane's budget (lanes that never met an additionalDepth
            # material terminate at base_bounces exactly as before)
            nxt = jnp.asarray(bounce_idx, jnp.float32) + 1.0
            alive = alive & (nxt <= depth_limit)
        nrays = nrays + jnp.sum(alive.astype(jnp.float32))
        state = (org, dirn, throughput, alive, spec_mask, prev_pdf,
                 medium_sigma, wavelength, cone_w, cone_spread, tag,
                 caustic_state, track, transp, depth_limit, L_refl, L_refr,
                 L, nrays)
        if first:
            # primary-hit attributes for render passes / AOVs (§2.11).
            # NU/NV = the shading frame orthonormalized from the TRUE
            # surface derivative dPdU (reference surfacePoint_t NU/NV,
            # createCS from dPdU) — r2 used an arbitrary ONB.
            du_proj = sp["dpdu"] - n_sh * vmath.dot(
                n_sh, sp["dpdu"])[..., None]
            du_len = jnp.linalg.norm(du_proj, axis=-1, keepdims=True)
            onb_u, _ = vmath.build_onb(n_sh)
            tu_dbg = jnp.where(du_len > 1e-9, du_proj
                               / jnp.maximum(du_len, 1e-9), onb_u)
            tv_dbg = jnp.cross(n_sh, tu_dbg)
            aux = dict(
                z=jnp.where(hit.hit, hit.t, 0.0),
                normal=jnp.where(hit.hit[..., None], n_sh, 0.0),
                geo_normal=jnp.where(hit.hit[..., None], ng_sh, 0.0),
                uv=jnp.where(hit.hit[..., None], sp["uv"], 0.0),
                mat_index=sp["mat"].astype(jnp.float32) * hit.hit,
                # primary-hit samplingFactor (reference material.h):
                # feeds the adaptive-AA threshold scale (render.py)
                samp_factor=jnp.where(hit.hit, row["sampling_factor"],
                                      1.0),
                obj_index=sp["tri"].astype(jnp.float32) * hit.hit,
                diffuse_color=jnp.where(hit.hit[..., None],
                                        row["diffuse_color"], 0.0),
                emit=jnp.where(alive[..., None], emit, 0.0),
                direct=jnp.where(alive[..., None], Ld, 0.0),
                shadow=jnp.where(alive, shadow_mean, 1.0),
                # NU/NV debug: the shading tangent frame (reference
                # DebugIntegrator dPdU/dPdV role; ONB stand-in)
                nu=jnp.where(hit.hit[..., None], tu_dbg, 0.0),
                nv=jnp.where(hit.hit[..., None], tv_dbg, 0.0),
                # raw uv-parameterization derivatives (reference
                # renderpasses dPdU/dPdV debug passes), display-normalized
                dpdu=jnp.where(hit.hit[..., None],
                               vmath.normalize(sp["dpdu"]), 0.0),
                dpdv=jnp.where(hit.hit[..., None],
                               vmath.normalize(sp["dpdv"]), 0.0),
            )
            if ao is not None:
                aux["ao"] = jnp.where(alive[..., None], ao, 0.0)
            return state, aux
        return state

    def _run_wavefront(scene_arrays, s_idx, ph, org, dirn, wt, active):
        """Bounce 0 + scan shared by the dense and compact steps.
        Returns the final state tuple (and bounce-0 aux)."""
        state = (
            org, dirn,
            jnp.ones((n, 3), jnp.float32),  # throughput
            active & (wt > 0.0),  # alive
            jnp.ones((n,), jnp.bool_),  # spec_mask (primary counts emission)
            jnp.zeros((n,), jnp.float32),  # prev_pdf
            jnp.zeros((n, 3), jnp.float32),  # medium_sigma
            jnp.full((n,), -1.0, jnp.float32),  # wavelength (-1 chromatic)
            jnp.full((n,), cone0_w, jnp.float32),  # ray-cone width
            jnp.full((n,), cone0_s, jnp.float32),  # ray-cone spread
            jnp.zeros((n,), jnp.int32),  # reflect/refract pass tag
            jnp.zeros((n,), jnp.int32),  # caustic_state (bidir partition)
            jnp.ones((n,), jnp.bool_),  # track (alpha camera-visibility)
            jnp.zeros((n,), jnp.bool_),  # transp (ended on background)
            jnp.full((n,), float(base_bounces), jnp.float32),  # depth_limit
            jnp.zeros((n, 3), jnp.float32),  # L via bounce-0 reflect
            jnp.zeros((n, 3), jnp.float32),  # L via bounce-0 refract
            jnp.zeros((n, 3), jnp.float32),  # L
            jnp.sum((active & (wt > 0.0)).astype(jnp.float32)),  # nrays
        )
        state, aux = shade_vertex(scene_arrays, state,
                                  qmc.bounce_dim(0, 0), 0, s_idx,
                                  first=True, ph=ph)
        occ0 = jnp.sum(state[3].astype(jnp.float32))
        if n_bounces >= 1:
            def body(st, b):
                bdim = (jnp.uint32(qmc.BOUNCE_DIMS_START)
                        + b * jnp.uint32(qmc.DIMS_PER_BOUNCE))
                st = shade_vertex(scene_arrays, st, bdim, b, s_idx,
                                  first=False, ph=ph)
                return st, jnp.sum(st[3].astype(jnp.float32))

            state, occ_t = lax.scan(
                body, state,
                jnp.arange(1, n_bounces + 1, dtype=jnp.uint32))
            occ = jnp.concatenate([occ0[None], occ_t])
        else:
            occ = occ0[None]
        # per-bounce live-lane counts (occupancy diagnostics): lanes
        # still alive ENTERING bounce b+1, i.e. after bounce b's shade.
        # Accumulated only when the film carries an "occupancy" plane
        # (scripts/probe_occupancy.py); DCE'd otherwise.
        aux["_occupancy"] = occ
        return state, aux

    if compact_n:
        from ..film.imagefilm import film_splat_compact, splat_plane_compact

        def sample_step_compact(scene_arrays, film, pix_idx):
            lane_pix_d = jnp.tile(pix_idx, spb)          # (n,)
            active = lane_pix_d >= 0
            lanep = jnp.maximum(lane_pix_d, 0)
            py_d, px_d = jnp.divmod(lanep, w)
            ph = qmc.hash_u32(px_d.astype(jnp.uint32)
                              ^ (py_d.astype(jnp.uint32) << 16)
                              ^ jnp.uint32(cfg.qmc_seed))
            base_idx = film["nsamples"].reshape(-1).astype(
                jnp.uint32)[lanep]
            s_idx = base_idx + lane_k
            dx, dy = qmc.sample_dim_pair(s_idx, qmc.DIM_PIXEL_X, ph)
            lu, lv = qmc.sample_dim_pair(s_idx, qmc.DIM_LENS_U, ph)
            org, dirn, wt = shoot_rays(camera,
                                       px_d.astype(jnp.float32) + dx,
                                       py_d.astype(jnp.float32) + dy,
                                       lu, lv)
            state, aux = _run_wavefront(scene_arrays, s_idx, ph, org,
                                        dirn, wt, active)
            L = state[-2] * wt[..., None]
            nrays = state[-1]
            aux["reflect"] = state[-4] * wt[..., None]
            aux["refract"] = state[-3] * wt[..., None]
            actf = active.astype(jnp.float32)
            frag = dict(wsum=jnp.zeros_like(film["wsum"]),
                        w=jnp.zeros_like(film["w"]),
                        nsamples=jnp.zeros_like(film["nsamples"]))
            for k in range(spb):
                sl = slice(k * compact_n, (k + 1) * compact_n)
                frag = film_splat_compact(
                    frag, L[sl], lane_pix_d[sl], dx[sl], dy[sl],
                    actf[sl], cfg.filter_type, cfg.aa_pixelwidth,
                    clamp_samples=cfg.aa_clamp_samples)
            film = dict(film,
                        wsum=film["wsum"] + frag["wsum"],
                        w=film["w"] + frag["w"],
                        nsamples=film["nsamples"] + frag["nsamples"],
                        rays=film.get("rays", 0.0) + nrays)
            if "alpha" in film:
                transp_l = state[13]
                a_val = jnp.where(transp_l | (wt <= 0.0), 0.0,
                                  1.0)[..., None]
                aplane = jnp.zeros_like(film["alpha"])
                for k in range(spb):
                    sl = slice(k * compact_n, (k + 1) * compact_n)
                    aplane = splat_plane_compact(
                        aplane, a_val[sl], lane_pix_d[sl], dx[sl],
                        dy[sl], actf[sl], cfg.filter_type,
                        cfg.aa_pixelwidth)
                film["alpha"] = film["alpha"] + aplane
            if "m2" in film:
                L2 = _clamped_sample(L, cfg.aa_clamp_samples)
                m2p = jnp.zeros_like(film["m2"])
                for k in range(spb):
                    sl = slice(k * compact_n, (k + 1) * compact_n)
                    m2p = splat_plane_compact(
                        m2p, L2[sl] * L2[sl], lane_pix_d[sl], dx[sl],
                        dy[sl], actf[sl], cfg.filter_type,
                        cfg.aa_pixelwidth)
                film["m2"] = film["m2"] + m2p
            # AOV planes (same estimator split as the dense step:
            # filter-weighted for the indirect-decomposition planes,
            # plain per-sample sums otherwise — VERDICT r4 #5 lifts the
            # "no AOVs under compaction" restriction)
            from ..film.passes import FILTER_WEIGHTED_AOVS

            for key in film:
                if not key.startswith("aov_"):
                    continue
                val = aux.get(key[4:])
                if val is None:
                    continue
                if val.ndim == 1:
                    val = val[..., None]
                if key[4:] in FILTER_WEIGHTED_AOVS:
                    plane = jnp.zeros_like(film[key])
                    for k in range(spb):
                        sl = slice(k * compact_n, (k + 1) * compact_n)
                        plane = splat_plane_compact(
                            plane, val[sl], lane_pix_d[sl], dx[sl],
                            dy[sl], actf[sl], cfg.filter_type,
                            cfg.aa_pixelwidth)
                    film[key] = film[key] + plane
                else:
                    flat = film[key].reshape(-1, film[key].shape[-1])
                    flat = flat.at[lanep].add(val * actf[:, None])
                    film[key] = flat.reshape(film[key].shape)
            return film

        return sample_step_compact

    def sample_step(scene_arrays, film, flags):
        base_idx = film["nsamples"].reshape(-1).astype(jnp.uint32)
        s_idx = jnp.tile(base_idx, spb) + lane_k
        active = jnp.tile(flags.reshape(-1), spb)

        dx, dy = qmc.sample_dim_pair(s_idx, qmc.DIM_PIXEL_X, pixel_hash)
        lu, lv = qmc.sample_dim_pair(s_idx, qmc.DIM_LENS_U, pixel_hash)
        org, dirn, wt = shoot_rays(camera, px.astype(jnp.float32) + dx,
                                   py.astype(jnp.float32) + dy, lu, lv)

        state, aux = _run_wavefront(scene_arrays, s_idx, pixel_hash, org,
                                    dirn, wt, active)

        L = state[-2] * wt[..., None]
        nrays = state[-1]
        # reflect/refract pass planes: contributions routed through the
        # bounce-0 specular chains, accumulated across the whole scan
        aux["reflect"] = state[-4] * wt[..., None]
        aux["refract"] = state[-3] * wt[..., None]
        Ls = L.reshape(spb, h, w, 3)
        dxs = dx.reshape(spb, h, w)
        dys = dy.reshape(spb, h, w)
        # two-level accumulation: splat the batch into a FRESH zero
        # fragment, then add ONCE into the film.  Splatting each sample
        # straight into the long-run accumulator stagnates in f32 —
        # at ~10^5-10^6 spp the per-sample adds fall below ulp(wsum)/2
        # and the film stops converging (measured: independent-seed
        # golden renders plateaued at RMSE 2.3e-2 at 786K spp while
        # 16K-spp renders agreed to 6.5e-4; scripts/bench_time_to_rmse)
        frag = dict(wsum=jnp.zeros_like(film["wsum"]),
                    w=jnp.zeros_like(film["w"]),
                    nsamples=jnp.zeros_like(film["nsamples"]))
        for k in range(spb):
            frag = film_splat(
                frag, Ls[k], dxs[k], dys[k],
                flags.astype(jnp.float32), cfg.filter_type,
                cfg.aa_pixelwidth, clamp_samples=cfg.aa_clamp_samples,
            )
        film = dict(film,
                    wsum=film["wsum"] + frag["wsum"],
                    w=film["w"] + frag["w"],
                    nsamples=film["nsamples"] + frag["nsamples"],
                    rays=film.get("rays", 0.0) + nrays)
        if "occupancy" in film:
            film["occupancy"] = film["occupancy"] + aux["_occupancy"]
            film["occupancy0"] = (film.get("occupancy0", 0.0)
                                  + jnp.sum((active & (wt > 0.0))
                                            .astype(jnp.float32)))
        if "alpha" in film:
            from ..film.imagefilm import splat_plane as _splat_plane

            transp_l = state[13]
            a_val = jnp.where(transp_l | (wt <= 0.0), 0.0, 1.0)
            avs = a_val.reshape(spb, h, w, 1)
            aplane = jnp.zeros_like(film["alpha"])
            for k in range(spb):
                aplane = _splat_plane(aplane, avs[k], dxs[k], dys[k],
                                      flags.astype(jnp.float32),
                                      cfg.filter_type, cfg.aa_pixelwidth)
            film["alpha"] = film["alpha"] + aplane
        if "m2" in film:
            from ..film.imagefilm import splat_plane as _splat_plane2

            L2s = _clamped_sample(L, cfg.aa_clamp_samples).reshape(
                spb, h, w, 3)
            m2p = jnp.zeros_like(film["m2"])
            for k in range(spb):
                m2p = _splat_plane2(m2p, L2s[k] * L2s[k], dxs[k], dys[k],
                                    flags.astype(jnp.float32),
                                    cfg.filter_type, cfg.aa_pixelwidth)
            film["m2"] = film["m2"] + m2p
        # AOV planes.  The planes that enter the indirect-pass
        # decomposition (combined - direct - emit - reflect - refract)
        # are accumulated FILTER-WEIGHTED, exactly like wsum, so the
        # flush-time subtraction is between consistent estimators
        # (ADVICE r2); the rest are plain per-sample means normalized
        # by nsamples at flush.
        from ..film.imagefilm import splat_plane
        from ..film.passes import FILTER_WEIGHTED_AOVS

        act = flags.astype(jnp.float32).reshape(-1)
        actf = flags.astype(jnp.float32)
        for key in film:
            if not key.startswith("aov_"):
                continue
            name = key[4:]
            val = aux.get(name)
            if val is None:
                continue
            if val.ndim == 1:
                val = val[..., None]
            if name in FILTER_WEIGHTED_AOVS:
                vs = val.reshape(spb, h, w, val.shape[-1])
                # same two-level scheme as wsum (f32 stagnation)
                plane = jnp.zeros_like(film[key])
                for k in range(spb):
                    plane = splat_plane(plane, vs[k], dxs[k], dys[k],
                                        actf, cfg.filter_type,
                                        cfg.aa_pixelwidth)
                film[key] = film[key] + plane
            else:
                # full per-batch sum — nsamples counts every spb sample,
                # so the flush-time /nsamples needs the undivided sum
                contrib = (val * act[..., None]).reshape(
                    spb, h, w, val.shape[-1]).sum(axis=0)
                film[key] = film[key] + contrib
        return film

    return sample_step
