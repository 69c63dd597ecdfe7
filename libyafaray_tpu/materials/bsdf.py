"""Lane-wise BSDF eval / sample / pdf dispatch over the material table.

This is the wavefront analog of material_t::{eval, sample, pdf, getSpecular,
emit, getTransparency} (reference include/core_api/material.h; SURVEY §2.4).
Each function takes a per-lane gathered parameter `row` (see
base.gather_rows) so texture/shader-node systems can override entries
("initBSDF" analog) before calling in here.

Family coverage in this module:
  shinydiffusemat (mirror/transparency/translucency/Oren-Nayar diffuse,
                   fresnel_effect), glossy + coated_glossy (Ashikhmin-
  Shirley, Blinn/aniso NDF, dielectric coat), glass + rough_glass
  (fresnel dielectric, TIR, Beer absorption handled by the integrator via
  medium tracking, fake_shadows), light_mat, null.
blend_mat / mask_mat are resolved by the shading layer (two-row eval mix) in
materials/blend.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as vmath
from ..core.sampling import INV_PI, PI, sample_cos_hemisphere
from ..core.color import luminance
from .base import (
    MT_NULL, MT_SHINYDIFFUSE, MT_GLOSSY, MT_COATED_GLOSSY, MT_GLASS,
    MT_ROUGH_GLASS, MT_LIGHT,
    glossy_eval_local, glossy_pdf_local, sample_blinn_h,
    oren_nayar_factor, shinydiffuse_weights,
)

_MIN_PDF = 1e-6


def _glossy_pick_prob(row):
    """Probability of picking the diffuse lobe in the glossy family sampler."""
    wd = row["diffuse_reflect"] * luminance(row["diffuse_color"])
    wg = row["glossy_reflect"] * luminance(row["glossy_color"])
    return wd / jnp.maximum(wd + wg, 1e-8)


def _coat_kr(row, cos_o):
    """Dielectric coat reflectance for coated_glossy; 0 for plain glossy."""
    kr = vmath.fresnel_dielectric(jnp.abs(cos_o), jnp.maximum(row["ior"], 1.0 + 1e-5))
    return jnp.where(row["mtype"] == MT_COATED_GLOSSY, kr, 0.0)


def _need(families, codes):
    """Static family gating: SceneStatic.mat_families drives which family
    blocks are traced at all (a Cornell box full of shinydiffuse never
    pays for glossy/glass math)."""
    return families is None or any(c in families for c in codes)


def _rough_glass_terms(row, n, ng, wo, wi):
    """Walter-07 microfacet dielectric terms for an arbitrary (wo, wi)
    pair (reference src/materials/roughglass.cc semantics), using the
    repo's Blinn exponent convention: D = (e+2)/(2π)·cosᵉθh, half-vector
    sampling pdf Ph = (e+1)/(2π)·cosᵉθh (sample_blinn_h), V-cavity G.
    Radiance-transport (asymmetric η²) form so the smooth limit matches
    the delta glass path.  Returns (f (N,3), pdf (N,))."""
    entering = vmath.dot(ng, wo) > 0.0
    ior = jnp.maximum(row["ior"], 1.0 + 1e-6)
    eta = jnp.where(entering, ior, 1.0 / ior)  # n_transmitted / n_incident
    nf = vmath.face_forward(n, wo)
    cos_o = jnp.maximum(vmath.dot(nf, wo), 1e-6)
    cos_i = vmath.dot(nf, wi)
    refl = cos_i > 0.0
    abs_ci = jnp.maximum(jnp.abs(cos_i), 1e-6)

    h_r = wo + wi
    h_t = -(wo + eta[..., None] * wi)
    h = jnp.where(refl[..., None], h_r, h_t)
    h = vmath.normalize(h)
    h = jnp.where(vmath.dot(h, nf)[..., None] < 0.0, -h, h)
    hz = jnp.clip(vmath.dot(h, nf), 1e-6, 1.0)
    oh = vmath.dot(wo, h)
    ih = vmath.dot(wi, h)

    e = row["exponent"]
    cos_pow = jnp.power(hz, e)
    d_ndf = (e + 2.0) / (2.0 * PI) * cos_pow
    p_h = (e + 1.0) / (2.0 * PI) * cos_pow
    abs_oh = jnp.maximum(jnp.abs(oh), 1e-6)
    g = jnp.minimum(
        1.0, jnp.minimum(2.0 * hz * cos_o / abs_oh,
                         2.0 * hz * abs_ci / abs_oh))
    fr = vmath.fresnel_dielectric(abs_oh, eta)

    f_r = (fr * d_ndf * g / (4.0 * cos_o * abs_ci))[..., None] \
        * row["mirror_color"]
    pdf_r = fr * p_h / (4.0 * abs_oh)

    jdenom = oh + eta * ih
    j2 = jnp.maximum(jdenom * jdenom, 1e-8)
    abs_ih = jnp.abs(ih)
    f_t = (abs_oh * abs_ih / (cos_o * abs_ci)
           * eta * eta * (1.0 - fr) * d_ndf * g / j2)[..., None] \
        * row["filter_color"]
    pdf_t = (1.0 - fr) * p_h * eta * eta * abs_ih / j2
    # transmission only valid when wo/wi really straddle the surface and
    # the half-vector geometry is physical (oh > 0 > ih relative to h)
    t_ok = (~refl) & (oh > 0.0) & (ih < 0.0)
    f = jnp.where(refl[..., None], f_r, jnp.where(t_ok[..., None], f_t, 0.0))
    pdf = jnp.where(refl, pdf_r, jnp.where(t_ok, pdf_t, 0.0))
    return f, pdf


def eval_bsdf(row, n, ng, wo, wi, families=None):
    """f(wo, wi) of all non-delta lobes. (N,3)."""
    cos_o = vmath.dot(n, wo)
    cos_i = vmath.dot(n, wi)
    same_side = (cos_i * cos_o) > 0.0
    mtype = row["mtype"]
    f = jnp.zeros_like(row["diffuse_color"])

    if _need(families, (MT_SHINYDIFFUSE,)):
        _, _, w_transl, w_diff = shinydiffuse_weights(row, cos_o)
        on = oren_nayar_factor(row["sigma"], n, wo, wi)
        f_diff = (w_diff * on * INV_PI)[..., None] * row["diffuse_color"]
        f_transl = (w_transl * INV_PI)[..., None] * row["diffuse_color"]
        f_shiny = jnp.where(same_side[..., None], f_diff, f_transl)
        f = jnp.where((mtype == MT_SHINYDIFFUSE)[..., None], f_shiny, f)

    if _need(families, (MT_GLOSSY, MT_COATED_GLOSSY)):
        nf = vmath.face_forward(n, wo)
        u, v = vmath.build_onb(nf)
        wo_l = vmath.to_local(u, v, nf, wo)
        wi_l = vmath.to_local(u, v, nf, wi)
        f_g, f_d = glossy_eval_local(row, wo_l, wi_l)
        coat = _coat_kr(row, cos_o)
        f_glossy = (f_g + f_d) * (1.0 - coat)[..., None]
        f_glossy = jnp.where(same_side[..., None], f_glossy, 0.0)
        f = jnp.where(
            ((mtype == MT_GLOSSY) | (mtype == MT_COATED_GLOSSY))[..., None],
            f_glossy, f,
        )

    if _need(families, (MT_ROUGH_GLASS,)):
        f_rg, _ = _rough_glass_terms(row, n, ng, wo, wi)
        f = jnp.where((mtype == MT_ROUGH_GLASS)[..., None], f_rg, f)
    return f


def pdf_bsdf(row, n, ng, wo, wi, families=None):
    """pdf of sample_bsdf for non-delta directions (solid angle). (N,)."""
    cos_o = vmath.dot(n, wo)
    cos_i = vmath.dot(n, wi)
    same_side = (cos_i * cos_o) > 0.0
    abs_ci = jnp.abs(cos_i)
    mtype = row["mtype"]
    pdf = jnp.zeros_like(cos_i)

    if _need(families, (MT_SHINYDIFFUSE,)):
        w_m, w_t, w_tl, w_d = shinydiffuse_weights(row, cos_o)
        tot = jnp.maximum(w_m + w_t + w_tl + w_d, 1e-8)
        pdf_shiny = jnp.where(
            same_side, (w_d / tot) * abs_ci * INV_PI,
            (w_tl / tot) * abs_ci * INV_PI,
        )
        pdf = jnp.where(mtype == MT_SHINYDIFFUSE, pdf_shiny, pdf)

    if _need(families, (MT_GLOSSY, MT_COATED_GLOSSY)):
        nf = vmath.face_forward(n, wo)
        u, v = vmath.build_onb(nf)
        wo_l = vmath.to_local(u, v, nf, wo)
        wi_l = vmath.to_local(u, v, nf, wi)
        p_diff = _glossy_pick_prob(row)
        coat = _coat_kr(row, cos_o)
        pdf_glossy = glossy_pdf_local(row, wo_l, wi_l, p_diff) * (1.0 - coat)
        pdf_glossy = jnp.where(same_side, pdf_glossy, 0.0)
        pdf = jnp.where(
            (mtype == MT_GLOSSY) | (mtype == MT_COATED_GLOSSY),
            pdf_glossy, pdf,
        )

    if _need(families, (MT_ROUGH_GLASS,)):
        _, pdf_rg = _rough_glass_terms(row, n, ng, wo, wi)
        pdf = jnp.where(mtype == MT_ROUGH_GLASS, pdf_rg, pdf)
    return pdf


def sample_bsdf(row, n, ng, wo, u1, u2, u_lobe, wavelength=None,
                families=None):
    """Sample a continuation direction for every lane.

    wavelength: optional (N,) spectral state for dispersion — <0 means the
    lane is still chromatic (full RGB).  When a dispersive glass
    (dispersion_power>0) transmits a chromatic lane, a wavelength is
    sampled (Cauchy IOR + wl->RGB weight folded into tp — App. B glass
    rules) and returned in `new_wavelength`.

    Returns dict with:
      wi (N,3), tp (N,3) throughput multiplier (= f·|cos|/pdf, delta lobes
      pre-folded), pdf (N,) solid-angle pdf for MIS (0 for delta),
      specular (N,) bool, transmit (N,) bool (crossed the surface),
      entering (N,) bool (transmit into the object), valid (N,) bool,
      new_wavelength (N,) updated spectral state (present iff wavelength
      was given).
    """
    cos_o = vmath.dot(n, wo)
    nf = vmath.face_forward(n, wo)
    u, v = vmath.build_onb(nf)
    wo_l = vmath.to_local(u, v, nf, wo)
    mtype = row["mtype"]
    need_shiny = _need(families, (MT_SHINYDIFFUSE,))
    need_glossy = _need(families, (MT_GLOSSY, MT_COATED_GLOSSY))
    need_glass = _need(families, (MT_GLASS, MT_ROUGH_GLASS, MT_NULL))

    n_lanes = cos_o.shape[0]
    wi = wo  # placeholder; overwritten per present family
    tp = jnp.zeros((n_lanes, 3), jnp.float32)
    pdf = jnp.zeros((n_lanes,), jnp.float32)
    specular = jnp.zeros((n_lanes,), jnp.bool_)
    transmit = jnp.zeros((n_lanes,), jnp.bool_)
    valid = jnp.zeros((n_lanes,), jnp.bool_)
    entering = vmath.dot(ng, wo) > 0.0

    if need_shiny or need_glossy:
        wi_diff, pdf_diff = sample_cos_hemisphere(nf, u1, u2)
        wi_mirror = vmath.reflect(wo, nf)

    is_shiny = mtype == MT_SHINYDIFFUSE
    is_glossy = (mtype == MT_GLOSSY) | (mtype == MT_COATED_GLOSSY)
    is_null = mtype == MT_NULL
    is_glass = (mtype == MT_GLASS) | (mtype == MT_ROUGH_GLASS) | is_null
    new_wl = wavelength
    dispersive = row["dispersion_power"] > 1e-6

    # ===================== shinydiffuse family ==========================
    if need_shiny:
        w_m, w_t, w_tl, w_d = shinydiffuse_weights(row, cos_o)
        tot = jnp.maximum(w_m + w_t + w_tl + w_d, 1e-8)
        p_m, p_t, p_tl = w_m / tot, w_t / tot, w_tl / tot
        c0, c1, c2 = p_m, p_m + p_t, p_m + p_t + p_tl
        pick_m = u_lobe < c0
        pick_t = (~pick_m) & (u_lobe < c1)
        pick_tl = (~pick_m) & (~pick_t) & (u_lobe < c2)
        pick_d = (~pick_m) & (~pick_t) & (~pick_tl)
        wi_transl = -wi_diff
        wi_transp = -wo

        sh_wi = jnp.where(
            pick_m[..., None], wi_mirror,
            jnp.where(pick_t[..., None], wi_transp,
                      jnp.where(pick_tl[..., None], wi_transl, wi_diff)),
        )
        on = oren_nayar_factor(row["sigma"], n, wo, wi_diff)
        # diffuse: f·cos/(pdf·p_d), f = w_d·on·ρ/π, pdf = cos/π ⇒ w_d·on·ρ/p_d
        p_d = jnp.maximum(1.0 - c2, 1e-8)
        tp_diff = (w_d * on / p_d)[..., None] * row["diffuse_color"]
        tp_transl = (w_tl / jnp.maximum(p_tl, 1e-8))[..., None] \
            * row["diffuse_color"]
        tp_mirror = (w_m / jnp.maximum(p_m, 1e-8))[..., None] \
            * row["mirror_color"]
        tp_transp = (w_t / jnp.maximum(p_t, 1e-8))[..., None] \
            * row["filter_color"]
        sh_tp = jnp.where(
            pick_m[..., None], tp_mirror,
            jnp.where(pick_t[..., None], tp_transp,
                      jnp.where(pick_tl[..., None], tp_transl, tp_diff)),
        )
        sh_pdf = jnp.where(
            pick_d, pdf_diff * p_d,
            jnp.where(pick_tl, pdf_diff * jnp.maximum(p_tl, 1e-8), 0.0))
        m = is_shiny
        wi = jnp.where(m[..., None], sh_wi, wi)
        tp = jnp.where(m[..., None], sh_tp, tp)
        pdf = jnp.where(m, sh_pdf, pdf)
        specular = jnp.where(m, pick_m | pick_t, specular)
        transmit = jnp.where(m, pick_t | pick_tl, transmit)
        valid = jnp.where(m, tot > 1e-6, valid)

    # ===================== glossy family ================================
    if need_glossy:
        p_diff = _glossy_pick_prob(row)
        coat = _coat_kr(row, cos_o)
        pick_coat = u_lobe < coat  # dielectric coat (coated_glossy only)
        u_rem = jnp.clip((u_lobe - coat) / jnp.maximum(1.0 - coat, 1e-8),
                         0.0, 1.0)
        pick_gd = u_rem < p_diff  # diffuse under the coat

        h_l = sample_blinn_h(row, u1, u2)
        wo_h = vmath.dot(wo_l, h_l)
        wi_g_l = 2.0 * wo_h[..., None] * h_l - wo_l
        wi_glossy = vmath.from_local(u, v, nf, wi_g_l)
        gl_wi = jnp.where(
            pick_coat[..., None], wi_mirror,
            jnp.where(pick_gd[..., None], wi_diff, wi_glossy),
        )
        wi_l_pick = vmath.to_local(u, v, nf, gl_wi)
        f_g, f_d = glossy_eval_local(row, wo_l, wi_l_pick)
        f_gl = (f_g + f_d) * (1.0 - coat)[..., None]
        pdf_gl = glossy_pdf_local(row, wo_l, wi_l_pick, p_diff) * (1.0 - coat)
        cos_i_gl = jnp.abs(wi_l_pick[..., 2])
        gl_smooth_tp = f_gl * (cos_i_gl
                               / jnp.maximum(pdf_gl, _MIN_PDF))[..., None]
        gl_tp = jnp.where(pick_coat[..., None], row["mirror_color"],
                          gl_smooth_tp)
        m = is_glossy
        wi = jnp.where(m[..., None], gl_wi, wi)
        tp = jnp.where(m[..., None], gl_tp, tp)
        pdf = jnp.where(m, jnp.where(pick_coat, 0.0, pdf_gl), pdf)
        specular = jnp.where(m, pick_coat, specular)
        valid = jnp.where(
            m, jnp.where(pick_coat, True, wi_l_pick[..., 2] > 1e-6), valid)

    # ===================== glass family (glass / rough_glass / null) ====
    if need_glass:
        ior = jnp.maximum(row["ior"], 1.0 + 1e-6)
        wl_weight = jnp.ones_like(row["diffuse_color"])
        if wavelength is not None:
            from ..core.color import cauchy_coefficients, cauchy_ior, \
                wl_to_rgb
            from ..core.qmc import hash_u32

            # sample a wavelength for chromatic lanes on dispersive glass
            u_wl = (hash_u32((u1 * 16777216.0).astype(jnp.uint32)
                             ^ jnp.uint32(0x5157))
                    .astype(jnp.float32) * (1.0 / 4294967296.0))
            need_wl = dispersive & (wavelength < 0.0)
            wl_here = jnp.where(need_wl, u_wl, wavelength)
            a_c, b_c = cauchy_coefficients(ior, row["dispersion_power"])
            ior_wl = cauchy_ior(a_c, b_c, jnp.clip(wl_here, 0.0, 1.0))
            ior = jnp.where(dispersive & (wl_here >= 0.0), ior_wl, ior)
            # spectral weight applied once, when the wavelength is sampled
            wl_weight = jnp.where(need_wl[..., None], wl_to_rgb(wl_here),
                                  1.0)
            new_wl = wl_here
        eta = jnp.where(entering, ior, 1.0 / ior)
        eta = jnp.where(is_null, 1.0, eta)

        # rough glass: perturb around a sampled half-vector, else the normal
        is_rough = mtype == MT_ROUGH_GLASS
        h_l = sample_blinn_h(row, u1, u2)
        h_rough = vmath.from_local(u, v, nf, h_l)
        h_used = jnp.where(is_rough[..., None], h_rough, nf)
        cos_oh = jnp.abs(vmath.dot(h_used, wo))
        kr = vmath.fresnel_dielectric(cos_oh, eta)
        kr = jnp.where(is_null, 0.0, kr)
        wi_refr, refr_ok = vmath.refract(wo, h_used, eta)
        kr = jnp.where(refr_ok, kr, 1.0)  # TIR
        pick_refl = u_lobe < kr
        gs_wi = jnp.where(pick_refl[..., None],
                          vmath.reflect(wo, h_used), wi_refr)
        tp_refl = jnp.where(refr_ok[..., None], row["mirror_color"],
                            jnp.ones_like(row["mirror_color"]))
        gs_tp = jnp.where(pick_refl[..., None], tp_refl, row["filter_color"])
        if wavelength is not None:
            gs_tp = jnp.where((~pick_refl & dispersive)[..., None],
                              gs_tp * wl_weight, gs_tp)
        gs_tp = jnp.where(is_null[..., None], 1.0, gs_tp)

        # rough-glass microfacet weighting (Walter-07 with the Blinn-h
        # sampler; see _rough_glass_terms): tp ×= G·|oh|·(e+2)/((e+1)·
        # cosθo) — Ph = (e+1)/2π·cosᵉθh is already a solid-angle pdf, so
        # D/Ph = (e+2)/(e+1); the F/(1-F) terms cancel against the lobe
        # pick — and a real solid-angle pdf so NEE/MIS sees rough
        # transmission
        e_b = row["exponent"]
        hz_s = jnp.clip(h_l[..., 2], 1e-6, 1.0)
        cos_o_c = jnp.maximum(jnp.abs(cos_o), 1e-6)
        cos_i_s = jnp.maximum(jnp.abs(vmath.dot(nf, gs_wi)), 1e-6)
        k_g = jnp.minimum(
            1.0, jnp.minimum(2.0 * hz_s * cos_o_c / jnp.maximum(cos_oh, 1e-6),
                             2.0 * hz_s * cos_i_s / jnp.maximum(cos_oh, 1e-6)))
        k_rough = (k_g * cos_oh * (e_b + 2.0)
                   / ((e_b + 1.0) * cos_o_c))
        gs_tp = gs_tp * jnp.where(is_rough, k_rough, 1.0)[..., None]
        p_h = (e_b + 1.0) / (2.0 * PI) * jnp.power(hz_s, e_b)
        ih_s = vmath.dot(gs_wi, h_used)
        j_t = cos_oh + eta * ih_s
        pdf_rough = jnp.where(
            pick_refl, kr * p_h / (4.0 * jnp.maximum(cos_oh, 1e-6)),
            (1.0 - kr) * p_h * eta * eta * jnp.abs(ih_s)
            / jnp.maximum(j_t * j_t, 1e-8))

        # sidedness: a wide-NDF half-vector can reflect below / refract
        # above the surface; Walter-07 discards those samples
        side_ok = jnp.where(pick_refl, vmath.dot(nf, gs_wi) > 0.0,
                            vmath.dot(nf, gs_wi) < 0.0)
        rough_ok = ~is_rough | side_ok

        m = is_glass
        wi = jnp.where(m[..., None], gs_wi, wi)
        tp = jnp.where(m[..., None], gs_tp, tp)
        pdf = jnp.where(m, jnp.where(is_rough, pdf_rough, 0.0), pdf)
        specular = jnp.where(m, ~is_rough, specular)
        transmit = jnp.where(m, ~pick_refl, transmit)
        valid = jnp.where(m, rough_ok, valid)

    valid = valid & (luminance(jnp.abs(tp)) > 1e-7)
    out = dict(
        wi=vmath.normalize(wi), tp=tp, pdf=pdf,
        specular=specular, transmit=transmit,
        entering=entering & transmit, valid=valid,
        # null transmission is NOT a scattering event: callers must
        # preserve their MIS state (spec_mask/prev_pdf) across it
        passthrough=is_null & transmit,
        # "chain" continuation: lanes that photon-map/SPPM transport
        # phases should follow before the first storable hit — specular
        # plus rough glass (non-delta for MIS but not diffuse-storable)
        chain=specular | (mtype == MT_ROUGH_GLASS),
    )
    if wavelength is not None:
        became = is_glass & dispersive & transmit & (wavelength < 0.0)
        out["new_wavelength"] = jnp.where(
            became | (wavelength >= 0.0), new_wl, wavelength)
    return out


def emission(row, ng, wo):
    """Surface emission toward wo (light_mat power-folded color; shinydiffuse
    `emit` knob)."""
    front = vmath.dot(ng, wo) > 0.0
    vis = front | row["double_sided"]
    e_light = jnp.where(vis[..., None], row["emit_color"], 0.0)
    e_shiny = row["emit_strength"][..., None] * row["diffuse_color"]
    mtype = row["mtype"]
    return jnp.where(
        (mtype == MT_LIGHT)[..., None], e_light,
        jnp.where((mtype == MT_SHINYDIFFUSE)[..., None], e_shiny, 0.0),
    )


def shadow_filter(row):
    """Per-surface transmission filter for transparent shadow rays
    (material_t::getTransparency).  (N,3); 0 = opaque."""
    mtype = row["mtype"]
    cos_dummy = jnp.ones(mtype.shape, jnp.float32)
    _, w_t, _, _ = shinydiffuse_weights(row, cos_dummy)
    f_shiny = w_t[..., None] * row["filter_color"]
    f_glass = jnp.where(
        row["fake_shadows"][..., None], row["filter_color"], 0.0
    )
    f = jnp.where(
        (mtype == MT_SHINYDIFFUSE)[..., None], f_shiny,
        jnp.where(((mtype == MT_GLASS) | (mtype == MT_ROUGH_GLASS))[..., None],
                  f_glass,
                  jnp.where((mtype == MT_NULL)[..., None], 1.0, 0.0)),
    )
    return jnp.clip(f, 0.0, 1.0)
