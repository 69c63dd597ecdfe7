"""Wavefront photon shooting (reference photonIntegrator_t::preprocess
photon-emission loops + light_t::emitPhoton — SURVEY §3.4).

All photons advance in lockstep through a static-depth bounce loop.  Each
lane: pick light by the power CDF, emit (per-light-type masked kernels),
then intersect/scatter with Russian roulette by albedo; every qualifying
hit records a photon into a (lanes × bounce) slot — no append, no atomics;
invalid slots carry valid=False and are parked by the grid sort.

Emitted-flux conventions match lights/base.py:
  area/mesh : flux = color·power (by construction L = Φ/(πA))
  point     : flux = 4π·intensity
  spot      : flux = intensity·2π(1-(cos_start+cos_end)/2)  (cone solid
              angle with smoothstep falloff folded into emission sampling)
  sphere    : flux = color·power
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as vmath
from ..core import qmc
from ..core.sampling import PI, sample_cone, sample_cos_hemisphere, \
    sample_sphere
from ..lights import base as lightmod
from ..materials import bsdf
from ..materials.base import MT_GLOSSY, MT_SHINYDIFFUSE, gather_rows
from .engine import _closest_hit, _surface_point


def light_flux(static, arrays) -> np.ndarray:
    """Per-light total emitted flux (scalar luminance) for the power CDF
    (reference light->totalEnergy)."""
    lights = {k: np.asarray(v) for k, v in arrays["lights"].items()}
    flux = []
    for li, ls in enumerate(static.lights):
        if not ls.enabled:
            flux.append(0.0)
            continue
        if ls.ltype in (lightmod.LT_AREA, lightmod.LT_MESH,
                        lightmod.LT_SPHERE):
            rad = lights["radiance"][li]
            area = lights["area"][li]
            f = float(np.mean(rad)) * PI * max(area, 1e-12)
            if ls.ltype == lightmod.LT_SPHERE:
                f = float(np.mean(rad)) * 4 * PI * PI * lights["radius"][li] ** 2
        elif ls.ltype in (lightmod.LT_POINT,):
            f = float(np.mean(lights["intensity"][li])) * 4.0 * PI
        elif ls.ltype == lightmod.LT_SPOT:
            cs, ce = lights["cos_start"][li], lights["cos_end"][li]
            f = float(np.mean(lights["intensity"][li])) * 2.0 * PI * (
                1.0 - 0.5 * (cs + ce)
            )
        else:  # sun/directional/background photons: stage 7+
            f = 0.0
        flux.append(max(f, 0.0))
    return np.asarray(flux, np.float64)


def _emit_one_light(ls, lrow, n, u):
    """Photon origin/dir/flux-color for one (static) light over all lanes.
    u: dict of uniform lanes u1..u4.  Returns (org, dirn, flux_rgb)."""
    if ls.ltype == lightmod.LT_AREA:
        q = (lrow["p0"] + u["u1"][..., None] * lrow["e1"]
             + u["u2"][..., None] * lrow["e2"])
        ln = vmath.normalize(jnp.cross(lrow["e1"], lrow["e2"]))
        ln = jnp.broadcast_to(ln, (n, 3))
        d, _ = sample_cos_hemisphere(ln, u["u3"], u["u4"])
        flux = lrow["radiance"] * PI * lrow["area"]
        return q, d, jnp.broadcast_to(flux, (n, 3))
    if ls.ltype == lightmod.LT_POINT:
        d = sample_sphere(u["u3"], u["u4"])
        org = jnp.broadcast_to(lrow["p0"], (n, 3))
        flux = lrow["intensity"] * (4.0 * PI)
        return org, d, jnp.broadcast_to(flux, (n, 3))
    if ls.ltype == lightmod.LT_SPOT:
        axis = jnp.broadcast_to(lrow["direction"], (n, 3))
        d, _ = sample_cone(axis, lrow["cos_end"], u["u3"], u["u4"])
        cos_a = vmath.dot(d, axis)
        t = jnp.clip((cos_a - lrow["cos_end"])
                     / jnp.maximum(lrow["cos_start"] - lrow["cos_end"], 1e-6),
                     0.0, 1.0)
        fall = t * t * (3.0 - 2.0 * t)
        org = jnp.broadcast_to(lrow["p0"], (n, 3))
        # unbiased estimator for cone pdf 1/Omega: weight = I*Omega*fall;
        # E[weight] = I*2pi(1-(cos_start+cos_end)/2) = the CDF flux
        # (smoothstep integrates to 1/2 over the blend band)
        omega = 2.0 * PI * (1.0 - lrow["cos_end"])
        flux = lrow["intensity"][None, :] * omega * fall[..., None]
        return org, d, flux
    if ls.ltype == lightmod.LT_SPHERE:
        dn = sample_sphere(u["u1"], u["u2"])
        org = lrow["p0"] + dn * lrow["radius"]
        d, _ = sample_cos_hemisphere(dn, u["u3"], u["u4"])
        flux = lrow["radiance"] * (PI * 4.0 * PI * lrow["radius"] ** 2)
        return org, d, jnp.broadcast_to(flux, (n, 3))
    # unsupported emitters contribute nothing
    return (jnp.zeros((n, 3)), jnp.zeros((n, 3)) .at[..., 2].set(1.0),
            jnp.zeros((n, 3)))


def make_photon_pass(static, cfg, n_lanes: int, max_bounces: int,
                     mode: str):
    """Returns jittable fn(arrays, light_cdf, seed) -> photon record dict
    with arrays of shape (n_lanes*(max_bounces+1), ...): pos, dir (incoming,
    toward the surface it came FROM — reference stores -ray.dir), power,
    mat, normal, valid.
    mode: 'diffuse' stores every diffuse hit; 'caustic' stores diffuse hits
    reached through a specular-only chain with >=1 specular bounce;
    'indirect' stores diffuse hits at bounce >= 1 only (excludes photons
    arriving straight from the light — for integrators whose eye pass adds
    NEE direct light at the hitpoint, e.g. SPPM, which would otherwise
    double-count direct illumination)."""
    n = n_lanes
    lane_ids = jnp.arange(n, dtype=jnp.uint32)

    def shoot(arrays, light_cdf, light_flux_total, seed):
        skey = qmc.hash_combine(lane_ids, jnp.uint32(seed))
        s_idx = jnp.zeros((n,), jnp.uint32)
        mats = arrays["materials"]

        u_pick = qmc.sample_dim(s_idx, 0, skey)
        # pick light by CDF (static count)
        nl = len(static.lights)
        li_pick = jnp.zeros((n,), jnp.int32)
        for li in range(nl):
            li_pick = jnp.where(u_pick >= light_cdf[li], li, li_pick)

        u = dict(
            u1=qmc.sample_dim(s_idx, 2, skey),
            u2=qmc.sample_dim(s_idx, 3, skey),
            u3=qmc.sample_dim(s_idx, 4, skey),
            u4=qmc.sample_dim(s_idx, 5, skey),
        )
        org = jnp.zeros((n, 3), jnp.float32)
        dirn = jnp.zeros((n, 3), jnp.float32)
        pcol = jnp.zeros((n, 3), jnp.float32)
        for li, ls in enumerate(static.lights):
            lrow = lightmod.light_row(arrays["lights"], li)
            o_l, d_l, f_l = _emit_one_light(ls, lrow, n, u)
            sel = (li_pick == li)[..., None]
            prob = jnp.maximum(light_cdf[li + 1] - light_cdf[li], 1e-9)
            org = jnp.where(sel, o_l, org)
            dirn = jnp.where(sel, d_l, dirn)
            pcol = jnp.where(sel, f_l / prob, pcol)
        # per-photon flux = flux / n_emitted (caller divides by n_lanes
        # once per map; keep full flux here)

        alive = jnp.max(pcol, axis=-1) > 0.0
        spec_only = jnp.ones((n,), jnp.bool_)
        had_spec = jnp.zeros((n,), jnp.bool_)

        slots = max_bounces + 1
        rec_pos = jnp.zeros((slots, n, 3), jnp.float32)
        rec_dir = jnp.zeros((slots, n, 3), jnp.float32)
        rec_pow = jnp.zeros((slots, n, 3), jnp.float32)
        rec_mat = jnp.zeros((slots, n), jnp.int32)
        rec_nrm = jnp.zeros((slots, n, 3), jnp.float32)
        rec_ok = jnp.zeros((slots, n), jnp.bool_)

        for bounce in range(slots):
            hit = _closest_hit(arrays, static, org, dirn,
                               tmin=jnp.full((n,), static.ray_min_dist,
                                             jnp.float32),
                               tmax=jnp.where(alive, jnp.inf, -1.0))
            alive = alive & hit.hit
            sp = _surface_point(arrays, hit, org, dirn)
            wo = -dirn
            row = gather_rows(mats, sp["mat"])
            backface = vmath.dot(sp["ng"], wo) < 0.0
            n_sh = jnp.where(backface[..., None], -sp["n"], sp["n"])
            ng_sh = jnp.where(backface[..., None], -sp["ng"], sp["ng"])

            mt = row["mtype"]
            # surfaces with a diffuse lobe store photons (BSDF_DIFFUSE)
            from ..materials.base import MT_COATED_GLOSSY

            diffuse_surf = (
                (mt == MT_SHINYDIFFUSE) | (mt == MT_GLOSSY)
                | (mt == MT_COATED_GLOSSY)
            ) & (row["diffuse_reflect"] > 1e-5)
            if mode == "caustic":
                store = alive & diffuse_surf & had_spec & spec_only
            elif mode == "indirect" and bounce == 0:
                store = jnp.zeros_like(alive)
            else:
                store = alive & diffuse_surf
            rec_pos = rec_pos.at[bounce].set(sp["p"])
            rec_dir = rec_dir.at[bounce].set(wo)
            rec_pow = rec_pow.at[bounce].set(pcol)
            rec_mat = rec_mat.at[bounce].set(sp["mat"])
            rec_nrm = rec_nrm.at[bounce].set(n_sh)
            rec_ok = rec_ok.at[bounce].set(store)

            if bounce == max_bounces:
                break

            bd = 8 + bounce * 4
            u1 = qmc.sample_dim(s_idx, bd, skey)
            u2 = qmc.sample_dim(s_idx, bd + 1, skey)
            ul = qmc.sample_dim(s_idx, bd + 2, skey)
            u_rr = qmc.sample_dim(s_idx, bd + 3, skey)
            smp = bsdf.sample_bsdf(row, n_sh, ng_sh, wo, u1, u2, ul)
            scatter_col = pcol * smp["tp"]
            # RR by albedo (reference: survive with p = max component)
            p_surv = jnp.clip(
                jnp.max(smp["tp"], axis=-1), 0.0, 1.0
            )
            survive = u_rr < p_surv
            alive = alive & smp["valid"] & survive
            pcol = scatter_col / jnp.maximum(p_surv, 1e-6)[..., None]
            spec_only = spec_only & smp["specular"]
            had_spec = had_spec | smp["specular"]
            off = jnp.where(smp["transmit"], -1.0, 1.0)[..., None]
            org = sp["p"] + ng_sh * off * static.shadow_bias
            dirn = smp["wi"]

        return dict(
            pos=rec_pos.reshape(-1, 3),
            dir=rec_dir.reshape(-1, 3),
            power=rec_pow.reshape(-1, 3),
            mat=rec_mat.reshape(-1),
            normal=rec_nrm.reshape(-1, 3),
            valid=rec_ok.reshape(-1),
        )

    return shoot
