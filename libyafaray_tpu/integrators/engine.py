"""The wavefront render engine — shared by directlighting & pathtracing.

Reference call stack replaced (SURVEY §3.3): tiledIntegrator_t::render's
thread-per-tile recursion becomes ONE jitted function per (scene-static,
config) pair that advances every pixel by one sample:

    sample_step : (scene arrays, film, flags) -> film'
      generate rays  (camera.shoot_rays over pixel lanes, QMC dims 0..3)
      unrolled bounce loop (static depth):
        closest_hit -> surface point -> emission w/ MIS -> NEE (all lights,
        static loop, shadow kernels) -> sample_bsdf -> Russian roulette
      splat into film planes (scatter-free, film/imagefilm.py)

Everything is SoA over N = H·W lanes; dead lanes are masked, not compacted
(occupancy is high for the target depths; compaction is a later perf layer).
The emission double-count guard (reference `includeLights`, SURVEY App. D)
is the `spec_mask`/`prev_pdf` pair: BSDF-sampled emission hits are MIS-
weighted against the light-sample strategy unless the previous bounce was
delta.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..backgrounds.base import eval_background
from ..cameras.base import shoot_rays
from ..core import math as vmath
from ..core import qmc
from ..core.sampling import power_heuristic, sample_cos_hemisphere
from ..film.imagefilm import film_splat
from ..lights import base as lightmod
from ..materials import bsdf
from ..materials.base import gather_rows
from ..ops import intersect as isect
from .config import RenderConfig


def _closest_hit(scene_arrays, static, org, dirn, tmin=None, tmax=None):
    if static.intersector == "bvh":
        from ..ops.bvh_traverse import closest_hit_bvh

        return closest_hit_bvh(scene_arrays["bvh"], scene_arrays["tris"],
                               org, dirn, tmin, tmax)
    return isect.closest_hit_brute(scene_arrays["tris"], org, dirn, tmin,
                                   tmax, chunk=static.chunk)


def _shadow_transmission(scene_arrays, static, cfg, org, dirn, dist):
    filt = (scene_arrays["shadow_filt"] if cfg.transp_shad
            else scene_arrays["shadow_filt_binary"])
    if static.intersector == "bvh":
        from ..ops.bvh_traverse import shadow_transmission_bvh

        return shadow_transmission_bvh(
            scene_arrays["sbvh"], scene_arrays["stris"], filt, org, dirn, dist
        )
    return isect.shadow_transmission_brute(
        scene_arrays["stris"], filt, org, dirn, dist, chunk=static.chunk
    )


def _surface_point(scene_arrays, hit, org, dirn):
    tri = jnp.clip(hit.tri, 0, scene_arrays["tri_pos"].shape[0] - 1)
    b1, b2 = hit.u, hit.v
    b0 = 1.0 - b1 - b2
    pos = scene_arrays["tri_pos"][tri]  # (N,3,3)
    nrm = scene_arrays["tri_normal"][tri]
    uv = scene_arrays["tri_uv"][tri]
    p = (b0[..., None] * pos[:, 0] + b1[..., None] * pos[:, 1]
         + b2[..., None] * pos[:, 2])
    n = vmath.normalize(
        b0[..., None] * nrm[:, 0] + b1[..., None] * nrm[:, 1]
        + b2[..., None] * nrm[:, 2]
    )
    ng = scene_arrays["tri_geo_n"][tri]
    return dict(
        p=p, n=n, ng=ng,
        uv=(b0[..., None] * uv[:, 0] + b1[..., None] * uv[:, 1]
            + b2[..., None] * uv[:, 2]),
        mat=scene_arrays["tri_mat"][tri],
        light_id=scene_arrays["tri_light_id"][tri],
        t=hit.t, tri=tri,
    )


_LIGHT_SAMPLERS = {
    lightmod.LT_POINT: lightmod.sample_point,
    lightmod.LT_SPOT: lightmod.sample_spot,
    lightmod.LT_DIRECTIONAL: lightmod.sample_directional,
    lightmod.LT_SUN: lightmod.sample_sun,
    lightmod.LT_AREA: lightmod.sample_area,
    lightmod.LT_SPHERE: lightmod.sample_sphere_light,
}


def _direct_lighting(scene_arrays, static, cfg, sp, row, wo, n_f,
                     s_idx, skey, bounce_dim0, ns_scale=1):
    """NEE with two-strategy MIS over all enabled lights (reference
    estimateAllDirectLight / estimateOneDirect).  Returns (L, n_shadow_rays).
    ns_scale=1 uses each light's full `samples` count (primary vertices);
    0 forces 1 sample per light (deep path vertices)."""
    L = jnp.zeros_like(sp["p"])
    nrays = 0
    for li, ls in enumerate(static.lights):
        if not ls.enabled or ls.photon_only:
            continue
        if ls.ltype == lightmod.LT_MESH or ls.ltype == 7:
            continue  # meshlight/bglight NEE wired in their stages
        lrow = lightmod.light_row(scene_arrays["lights"], li)
        sampler = _LIGHT_SAMPLERS[ls.ltype]
        ns = max(1, ls.samples) if ns_scale else 1
        accum = jnp.zeros_like(L)
        for s in range(ns):
            sub_idx = s_idx * ns + s
            skey_l = qmc.hash_combine(skey, jnp.uint32(0xABCD01 + 131 * li))
            u1 = qmc.sample_dim(sub_idx, bounce_dim0 + qmc.SLOT_LIGHT_U,
                                skey_l)
            u2 = qmc.sample_dim(sub_idx, bounce_dim0 + qmc.SLOT_LIGHT_V,
                                skey_l)
            smp = sampler(lrow, sp["p"], u1, u2)
            cos_i = vmath.dot(sp["n"], smp["wi"])
            f = bsdf.eval_bsdf(row, sp["n"], sp["ng"], wo, smp["wi"])
            contrib_w = jnp.abs(cos_i) / jnp.maximum(smp["pdf"], 1e-9)
            ok = smp["valid"] & (smp["pdf"] > 1e-9)
            # shadow test
            if ls.cast_shadows:
                org_s = sp["p"] + n_f * jnp.sign(cos_i)[..., None] * \
                    static.shadow_bias
                tr = _shadow_transmission(scene_arrays, static, cfg, org_s,
                                          smp["wi"], smp["dist"])
                nrays += 1
            else:
                tr = jnp.ones_like(f)
            term = f * smp["li"] * tr * contrib_w[..., None]
            if (not ls.is_delta) and ls.intersectable:
                # strategy 1 MIS weight vs BSDF sampling
                bpdf = bsdf.pdf_bsdf(row, sp["n"], sp["ng"], wo, smp["wi"])
                w = power_heuristic(smp["pdf"], bpdf)
                term = term * w[..., None]
                # strategy 2 (BSDF sample hitting the light) is accounted at
                # emission hits via prev_pdf MIS in the bounce loop
            accum = accum + jnp.where(ok[..., None], term, 0.0)
        L = L + accum / ns
    return L, nrays


def _ambient_occlusion(scene_arrays, static, cfg, sp, row, wo, n_f,
                       s_idx, skey):
    """sampleAmbientOcclusion parity (SURVEY §2.10)."""
    ao = jnp.zeros_like(sp["p"])
    ao_col = jnp.asarray(cfg.ao_color, jnp.float32)
    for s in range(cfg.ao_samples):
        skey_a = qmc.hash_combine(skey, jnp.uint32(0xA0A0 + s))
        u1 = qmc.sample_dim(s_idx, qmc.BOUNCE_DIMS_START, skey_a)
        u2 = qmc.sample_dim(s_idx, qmc.BOUNCE_DIMS_START + 1, skey_a)
        d, pdf = sample_cos_hemisphere(n_f, u1, u2)
        org_s = sp["p"] + n_f * static.shadow_bias
        dist = jnp.full(u1.shape, cfg.ao_distance, jnp.float32)
        tr = _shadow_transmission(scene_arrays, static, cfg, org_s, d, dist)
        ao = ao + tr * row["diffuse_color"]
    return ao * ao_col / cfg.ao_samples


def make_sample_step(static, camera, cfg: RenderConfig,
                     mode: str | None = None):
    """Builds the jittable one-sample-per-pixel step function.

    mode: "path" (pathtracing) or "direct" (directlighting: continuation
    only through specular/dispersive chains, depth = raydepth).
    """
    mode = mode or ("path" if cfg.integrator == "pathtracing" else "direct")
    h, w = cfg.height, cfg.width
    n = h * w
    n_bounces = (cfg.bounces if mode == "path" else cfg.raydepth)
    py, px = jnp.divmod(jnp.arange(n, dtype=jnp.int32), w)
    pixel_hash = qmc.hash_u32(px.astype(jnp.uint32)
                              ^ (py.astype(jnp.uint32) << 16))

    def sample_step(scene_arrays, film, flags):
        s_idx = film["nsamples"].reshape(-1).astype(jnp.uint32)
        active = flags.reshape(-1)

        dx = qmc.sample_dim(s_idx, qmc.DIM_PIXEL_X, pixel_hash)
        dy = qmc.sample_dim(s_idx, qmc.DIM_PIXEL_Y, pixel_hash)
        lu = qmc.sample_dim(s_idx, qmc.DIM_LENS_U, pixel_hash)
        lv = qmc.sample_dim(s_idx, qmc.DIM_LENS_V, pixel_hash)
        org, dirn, wt = shoot_rays(camera, px.astype(jnp.float32) + dx,
                                   py.astype(jnp.float32) + dy, lu, lv)

        L = jnp.zeros((n, 3), jnp.float32)
        throughput = jnp.ones((n, 3), jnp.float32)
        alive = active & (wt > 0.0)
        spec_mask = jnp.ones((n,), jnp.bool_)  # primary hits count emission
        prev_pdf = jnp.zeros((n,), jnp.float32)
        prev_p = org
        medium_sigma = jnp.zeros((n, 3), jnp.float32)
        nrays = jnp.sum(alive.astype(jnp.float32))
        mats = scene_arrays["materials"]

        for bounce in range(n_bounces + 1):
            hit = _closest_hit(scene_arrays, static, org, dirn,
                               tmin=jnp.full((n,), static.ray_min_dist,
                                             jnp.float32))
            # Beer-Lambert through the current medium (glass absorption)
            seg = jnp.where(hit.hit, hit.t, 0.0)
            throughput = throughput * jnp.exp(-medium_sigma * seg[..., None])

            # escaped rays: background
            bg = eval_background(static.bg, scene_arrays.get("bg_image"),
                                 dirn)
            escape = alive & ~hit.hit
            L = L + jnp.where(escape[..., None], throughput * bg, 0.0)
            alive = alive & hit.hit

            sp = _surface_point(scene_arrays, hit, org, dirn)
            wo = -dirn
            row = gather_rows(mats, sp["mat"])

            # ---- emission with MIS against NEE ----
            emit = bsdf.emission(row, sp["ng"], wo)
            li_id = sp["light_id"]
            is_light_tri = li_id >= 0
            area_l = scene_arrays["lights"]["area"][jnp.maximum(li_id, 0)] \
                if len(static.lights) else jnp.ones((n,), jnp.float32)
            cos_l = jnp.abs(vmath.dot(sp["ng"], wo))
            pdf_light_hit = (hit.t * hit.t) / jnp.maximum(
                area_l * jnp.maximum(cos_l, 1e-6), 1e-9)
            mis_w = jnp.where(
                is_light_tri & ~spec_mask,
                power_heuristic(prev_pdf, pdf_light_hit),
                1.0,
            )
            L = L + jnp.where(alive[..., None],
                              throughput * emit * mis_w[..., None], 0.0)

            # ---- shading frame ----
            backface = vmath.dot(sp["ng"], wo) < 0.0
            n_sh = jnp.where(backface[..., None], -sp["n"], sp["n"])
            ng_sh = jnp.where(backface[..., None], -sp["ng"], sp["ng"])
            sp_sh = dict(sp, n=n_sh, ng=ng_sh)
            n_f = ng_sh

            bdim = qmc.bounce_dim(bounce, 0)
            skey_b = qmc.hash_combine(pixel_hash, jnp.uint32(bounce))

            # ---- NEE ----
            ns_scale = 1 if bounce == 0 else 0
            Ld, sh_rays = _direct_lighting(
                scene_arrays, static, cfg, sp_sh, row, wo, n_f,
                s_idx, skey_b, bdim, ns_scale,
            )
            if cfg.aa_clamp_indirect > 0.0 and bounce > 0:
                m = jnp.max(Ld, axis=-1, keepdims=True)
                Ld = Ld * jnp.where(
                    m > cfg.aa_clamp_indirect,
                    cfg.aa_clamp_indirect / jnp.maximum(m, 1e-9), 1.0)
            L = L + jnp.where(alive[..., None], throughput * Ld, 0.0)
            nrays = nrays + sh_rays * jnp.sum(alive.astype(jnp.float32))

            if cfg.do_ao and mode == "direct" and bounce == 0:
                ao = _ambient_occlusion(scene_arrays, static, cfg, sp_sh,
                                        row, wo, n_f, s_idx, skey_b)
                L = L + jnp.where(alive[..., None], throughput * ao, 0.0)

            if bounce == n_bounces:
                break

            # ---- continuation ----
            u1 = qmc.sample_dim(s_idx, bdim + qmc.SLOT_BSDF_U, skey_b)
            u2 = qmc.sample_dim(s_idx, bdim + qmc.SLOT_BSDF_V, skey_b)
            ul = qmc.sample_dim(s_idx, bdim + qmc.SLOT_LIGHT_PICK, skey_b)
            smp = bsdf.sample_bsdf(row, n_sh, ng_sh, wo, u1, u2, ul)

            if mode == "direct":
                # directlighting recurses only through delta chains
                cont = smp["specular"]
            else:
                cont = jnp.ones_like(smp["specular"])
            alive = alive & smp["valid"] & cont
            throughput = throughput * smp["tp"]

            # Russian roulette (reference: survival = max component)
            if mode == "path" and bounce >= cfg.rr_min_bounces:
                u_rr = qmc.sample_dim(s_idx, bdim + qmc.SLOT_RR, skey_b)
                q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
                kill = u_rr > q
                alive = alive & ~kill
                throughput = throughput / q[..., None]

            # medium tracking for glass absorption
            sig = row["absorption_sigma"]
            medium_sigma = jnp.where(
                smp["entering"][..., None], sig,
                jnp.where((smp["transmit"] & ~smp["entering"])[..., None],
                          0.0, medium_sigma),
            )

            off = jnp.where(smp["transmit"], -1.0, 1.0)[..., None]
            prev_p = sp["p"]
            org = sp["p"] + ng_sh * off * static.shadow_bias
            dirn = smp["wi"]
            spec_mask = smp["specular"]
            prev_pdf = smp["pdf"]
            nrays = nrays + jnp.sum(alive.astype(jnp.float32))

        L = L * wt[..., None]
        film = film_splat(
            film, L.reshape(h, w, 3), dx.reshape(h, w), dy.reshape(h, w),
            flags.astype(jnp.float32), cfg.filter_type, cfg.aa_pixelwidth,
            clamp_samples=cfg.aa_clamp_samples,
        )
        film = dict(film, rays=film.get("rays", 0.0) + nrays)
        return film

    return sample_step
