"""Photon-mapping integrator (reference src/integrators/photonintegr.cc —
SURVEY §2.10/§3.4): global (diffuse) + caustic photon maps, k-NN-radius
density estimation, optional final gather over a precomputed radiance map.

TPU mapping:
  preprocess  = wavefront photon passes (photon_shoot) + flash photon
                packs (ops/photon_flash) + a radiance-map pass (irradiance
                density at stored diffuse photons, batched)
  render      = the shared wavefront engine for primary/specular transport
                and NEE direct light, plus per-hit batched gathers:
                caustic map density at the first diffuse hit, and either
                fg_samples cosine gather rays -> nearest radiance photon
                (finalGather) or direct global-map density (show-map mode).
"""
from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as vmath
from ..core import qmc
from ..core.sampling import INV_PI, sample_cos_hemisphere
from ..film.imagefilm import film_init, film_splat
from ..materials import bsdf
from ..materials.base import MT_COATED_GLOSSY, MT_GLOSSY, MT_SHINYDIFFUSE, \
    gather_rows
from ..ops.photon_flash import (make_photon_pack, make_photon_pack_auto,
    density_flash, density_auto, nearest_flash)
from .config import RenderConfig
from .engine import _closest_hit, _surface_point, _direct_lighting, \
    make_sample_step
from .photon_shoot import light_flux, make_photon_pass
from .render import RenderResult, device_put_scene
from ..cameras.base import shoot_rays
from ..backgrounds.base import eval_background

log = logging.getLogger("libyafaray_tpu")

MAX_PHOTON_LANES = 1 << 18


def _light_cdf(static, arrays):
    flux = light_flux(static, arrays)
    total = flux.sum()
    if total <= 0:
        return np.zeros(len(flux) + 1, np.float32), 0.0
    cdf = np.concatenate([[0.0], np.cumsum(flux / total)]).astype(np.float32)
    cdf[-1] = 1.0
    return cdf, float(total)


def compact_photons_device(rec, cap: int):
    """Device-side photon compaction (no host round trip — the raw
    record is lanes x bounce-slots ~ 10^6 rows, and shipping it through
    this environment's device tunnel costs seconds PER PASS; SPPM pays
    that every pass).  Scatters valid entries into a fixed cap-sized
    buffer; overflow beyond `cap` is dropped (cap is sized to the
    observed store rate)."""
    valid = rec["valid"]
    pos_idx = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid & (pos_idx < cap), pos_idx, cap)
    total = jnp.minimum(pos_idx[-1] + 1, cap)
    out = {}
    for k, v in rec.items():
        if k == "valid":
            continue
        buf = jnp.zeros((cap + 1,) + v.shape[1:], v.dtype)
        out[k] = buf.at[dest].set(v)[:cap]
    out["valid"] = jnp.arange(cap) < total
    return out


def build_caustic_map(cscene, cfg: RenderConfig, arrays):
    """Caustic-only map for the path tracer's caustic_type=photon/both
    (reference createCausticMap shared by directlight & pathtracer).
    Returns (pack, radius, n_emitted) or None."""
    static = cscene.static
    cdf, total_flux = _light_cdf(static, arrays)
    if total_flux <= 0:
        return None
    scene_diag = float(np.linalg.norm(
        np.asarray(cscene.bound_max) - np.asarray(cscene.bound_min)))
    c_radius = cfg.caustic_radius if cfg.caustic_radius > 0 else \
        scene_diag * 0.005
    lanes = min(MAX_PHOTON_LANES,
                max(4096, -(-cfg.caustic_photons // 4096) * 4096))
    shoot = jax.jit(make_photon_pass(static, cfg, lanes,
                                     cfg.photon_bounces, "caustic"))
    rec = shoot(arrays, jnp.asarray(cdf), total_flux, jnp.uint32(777))
    n_stored = int(jnp.sum(rec["valid"]))
    log.info("caustic map for pathtracer: %d stores / %d emitted",
             n_stored, lanes)
    if n_stored == 0:
        return None
    cap = max(4096, -(-n_stored // 4096) * 4096)
    rec = jax.jit(compact_photons_device, static_argnames=("cap",))(
        rec, cap)
    pack = make_photon_pack_auto(rec["pos"], rec["valid"], rec["dir"],
                            rec["power"])
    return pack, c_radius, lanes


def build_photon_maps(cscene, cfg: RenderConfig, arrays, mesh=None):
    """Shoot diffuse + caustic maps; returns (diffuse_pack, caustic_pack,
    radiance_pack, n_diffuse_emitted, n_caustic_emitted).

    mesh: optional jax.sharding.Mesh — photon shooting is sharded over the
    lane axis (SURVEY §5.8 photon transport): every device computes its
    slice of the SAME logical lane set (per-lane QMC streams are
    lane-id-keyed), so the map is bitwise identical to single-device; the
    host-side compaction gather doubles as the all-gather."""
    static = cscene.static
    cdf, total_flux = _light_cdf(static, arrays)
    cdf_j = jnp.asarray(cdf)
    if total_flux <= 0:
        return None, None, None, 1, 1

    scene_diag = float(np.linalg.norm(
        np.asarray(cscene.bound_max) - np.asarray(cscene.bound_min)))
    d_radius = cfg.diffuse_radius if cfg.diffuse_radius > 0 else \
        scene_diag * 0.01
    c_radius = cfg.caustic_radius if cfg.caustic_radius > 0 else \
        scene_diag * 0.005

    def shoot_map(n_req, mode, seed0):
        # lane counts rounded to the pallas block quantum (4096): ragged
        # counts triggered TPU worker faults in the intersection kernels
        lanes = min(MAX_PHOTON_LANES,
                    max(4096, -(-n_req // 4096) * 4096))
        n_passes = max(1, int(np.ceil(n_req / lanes)))
        shoot_fn = make_photon_pass(
            static, cfg, lanes, cfg.photon_bounces, mode)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            lane_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
            shoot = jax.jit(
                shoot_fn,
                out_shardings=jax.tree.map(lambda _: lane_sh,
                                           jax.eval_shape(
                                               shoot_fn, arrays, cdf_j,
                                               total_flux, jnp.uint32(0))),
            )
        else:
            shoot = jax.jit(shoot_fn)
        recs = []
        for p in range(n_passes):
            recs.append(shoot(arrays, cdf_j, total_flux,
                              jnp.uint32(seed0 + p)))
        rec = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *recs)
        # device-side compaction: the raw record is lanes x bounce-slots
        # rows; only the store COUNT crosses to the host (also logged)
        n_stored = int(jnp.sum(rec["valid"]))
        cap = max(4096, -(-max(n_stored, 1) // 4096) * 4096)
        return (jax.jit(compact_photons_device,
                        static_argnames=("cap",))(rec, cap),
                lanes * n_passes)

    t0 = time.perf_counter()
    rec_d, n_em_d = shoot_map(cfg.photons, "diffuse", 1000)
    rec_c, n_em_c = shoot_map(cfg.caustic_photons, "caustic", 9000)
    log.info("photon shooting: %d diffuse stores / %d emitted, "
             "%d caustic stores / %d emitted [%.2fs]",
             int(jnp.sum(rec_d["valid"])), n_em_d,
             int(jnp.sum(rec_c["valid"])), n_em_c,
             time.perf_counter() - t0)

    diffuse_pack = make_photon_pack_auto(rec_d["pos"], rec_d["valid"],
                                    rec_d["dir"], rec_d["power"])
    caustic_pack = make_photon_pack_auto(rec_c["pos"], rec_c["valid"],
                                    rec_c["dir"], rec_c["power"])

    radiance_pack = None
    if cfg.final_gather:
        # radiance map: outgoing radiance at every stored diffuse photon,
        # assuming Lambertian exitance: Lo = E·ρ/π with E from the density
        # estimate (reference radianceMap precompute, threaded → batched)
        mats = arrays["materials"]
        qp = rec_d["pos"]
        qn = rec_d["normal"]
        # Radiance map on a photon SUBSET (Christensen, "Faster Photon Map
        # Global Illumination", JGT 2000 precomputes radiance at ~1/4 of
        # photons; the reference precomputes at all).  The flash nearest
        # lookup is brute-force over the map, so render-time cost is
        # linear in the subset size.
        stride = max(1, -(-qp.shape[0] // (1 << 16)))
        if stride > 1:
            qp = qp[::stride]
            qn = qn[::stride]
        rad_valid = rec_d["valid"][::stride]
        rad_mat = rec_d["mat"][::stride]
        chunk = 1 << 16
        nq = qp.shape[0]
        dens = jax.jit(lambda pk, a, b: density_auto(
            pk, a, b, d_radius * 2.0))
        parts = []
        for c0 in range(0, nq, chunk):
            f, _ = dens(diffuse_pack, qp[c0:c0 + chunk], qn[c0:c0 + chunk])
            parts.append(f)
        flux = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
        e_irr = flux / (np.pi * (d_radius * 2.0) ** 2) / n_em_d
        rows = gather_rows(mats, rad_mat)
        lo = e_irr * rows["diffuse_color"] * rows["diffuse_reflect"][..., None] * INV_PI
        radiance_pack = make_photon_pack(qp, rad_valid, qn, lo)

    return (diffuse_pack, caustic_pack, radiance_pack, n_em_d, n_em_c)


# r2 worked around a TPU-worker "kernel fault" in the fused fg-scan +
# photon-grid gather above ~16K camera lanes by shading in host-looped
# 16K-lane bands.  The r3 repro (scripts/repro_photon_fault.py: isolated
# kernels, fused scans and the real photonmap step, 16K-262K lanes, 350K
# photons) no longer triggers it on this runtime, so the band loop is
# gone and the step shades all lanes in ONE jitted call.


def make_photon_sample_step(cscene, cfg: RenderConfig, grids, mesh=None):
    """One-sample-per-pixel step: engine-style primary/specular transport,
    then photon-based indirect at the first diffuse hit.

    The photon packs ride inside the `arrays` jit argument (keys
    pm_diffuse/pm_caustic/pm_radiance, installed by render_photonmap) —
    closing over them would bake them into the HLO as literals and blow
    up Mosaic compile time (see ops/photon_flash).

    mesh: optional Mesh — film rows sharded, scene + photon packs
    replicated; the whole film shades in ONE jitted call (no host band
    loop) and XLA partitions the lane-parallel work (SURVEY §5.8)."""
    diffuse_pack, caustic_pack, radiance_pack, n_em_d, n_em_c = grids
    has_diffuse = diffuse_pack is not None
    has_caustic = caustic_pack is not None
    has_radiance = radiance_pack is not None
    static = cscene.static
    cam = cscene.camera
    h, w = cfg.height, cfg.width
    n = h * w
    py, px = jnp.divmod(jnp.arange(n, dtype=jnp.int32), w)
    pixel_hash = qmc.hash_u32(px.astype(jnp.uint32)
                              ^ (py.astype(jnp.uint32) << 16))
    scene_diag = float(np.linalg.norm(
        np.asarray(cscene.bound_max) - np.asarray(cscene.bound_min)))
    d_radius = cfg.diffuse_radius if cfg.diffuse_radius > 0 else \
        scene_diag * 0.01
    c_radius = cfg.caustic_radius if cfg.caustic_radius > 0 else \
        scene_diag * 0.005

    def shade_lanes(arrays, s_idx, px_c, py_c, pixel_hash, active):
        n = px_c.shape[0]
        dx = qmc.sample_dim(s_idx, qmc.DIM_PIXEL_X, pixel_hash)
        dy = qmc.sample_dim(s_idx, qmc.DIM_PIXEL_Y, pixel_hash)
        lu = qmc.sample_dim(s_idx, qmc.DIM_LENS_U, pixel_hash)
        lv = qmc.sample_dim(s_idx, qmc.DIM_LENS_V, pixel_hash)
        org, dirn, wt = shoot_rays(cam, px_c.astype(jnp.float32) + dx,
                                   py_c.astype(jnp.float32) + dy, lu, lv)

        L = jnp.zeros((n, 3), jnp.float32)
        throughput = jnp.ones((n, 3), jnp.float32)
        alive = active & (wt > 0.0)
        done_diffuse = jnp.zeros((n,), jnp.bool_)
        mats = arrays["materials"]
        nrays = jnp.sum(alive.astype(jnp.float32))

        # Phase 1 — transport: follow specular chains up to raydepth and
        # STORE the first diffuse hitpoint per lane.  Shading (NEE +
        # caustic density + final gather) runs ONCE afterwards on the
        # stored hitpoints — the reference likewise gathers once per path,
        # and the photon-grid gathers are the expensive part (running them
        # masked at every bounce cost raydepth x the lookups).
        hp_p = jnp.zeros((n, 3), jnp.float32)
        hp_n = jnp.zeros((n, 3), jnp.float32)
        hp_ng = jnp.zeros((n, 3), jnp.float32)
        hp_wo = jnp.zeros((n, 3), jnp.float32)
        hp_tp = jnp.ones((n, 3), jnp.float32)
        hp_mat = jnp.zeros((n,), jnp.int32)
        hp_bdim = jnp.zeros((n,), jnp.uint32)
        hp_skey = jnp.zeros((n,), jnp.uint32)
        for bounce in range(cfg.raydepth + 1):
            hit = _closest_hit(arrays, static, org, dirn,
                               tmin=jnp.full((n,), static.ray_min_dist,
                                             jnp.float32))
            bg = eval_background(static.bg, arrays.get("bg_image"), dirn)
            escape = alive & ~hit.hit
            L = L + jnp.where(escape[..., None], throughput * bg, 0.0)
            alive = alive & hit.hit

            sp = _surface_point(arrays, hit, org, dirn)
            wo = -dirn
            row = gather_rows(mats, sp["mat"])
            emit = bsdf.emission(row, sp["ng"], wo)
            L = L + jnp.where(alive[..., None], throughput * emit, 0.0)

            backface = vmath.dot(sp["ng"], wo) < 0.0
            n_sh = jnp.where(backface[..., None], -sp["n"], sp["n"])
            ng_sh = jnp.where(backface[..., None], -sp["ng"], sp["ng"])

            mt = row["mtype"]
            is_diffuse = ((mt == MT_SHINYDIFFUSE) | (mt == MT_GLOSSY)
                          | (mt == MT_COATED_GLOSSY))
            shade_here = alive & is_diffuse & ~done_diffuse

            bdim = qmc.bounce_dim(bounce, 0)
            skey_b = qmc.hash_combine(pixel_hash, jnp.uint32(bounce))

            m3 = shade_here[..., None]
            hp_p = jnp.where(m3, sp["p"], hp_p)
            hp_n = jnp.where(m3, n_sh, hp_n)
            hp_ng = jnp.where(m3, ng_sh, hp_ng)
            hp_wo = jnp.where(m3, wo, hp_wo)
            hp_tp = jnp.where(m3, throughput, hp_tp)
            hp_mat = jnp.where(shade_here, sp["mat"], hp_mat)
            hp_bdim = jnp.where(shade_here, jnp.uint32(bdim), hp_bdim)
            hp_skey = jnp.where(shade_here, skey_b, hp_skey)
            done_diffuse = done_diffuse | shade_here

            if bounce == cfg.raydepth:
                break

            # continue only through specular chains
            u1 = qmc.sample_dim(s_idx, bdim + qmc.SLOT_BSDF_U, skey_b)
            u2 = qmc.sample_dim(s_idx, bdim + qmc.SLOT_BSDF_V, skey_b)
            ul = qmc.sample_dim(s_idx, bdim + qmc.SLOT_LIGHT_PICK, skey_b)
            smp = bsdf.sample_bsdf(row, n_sh, ng_sh, wo, u1, u2, ul)
            cont = smp["chain"] & smp["valid"] & ~done_diffuse
            alive = alive & cont
            throughput = throughput * smp["tp"]
            off = jnp.where(smp["transmit"], -1.0, 1.0)[..., None]
            org = sp["p"] + ng_sh * off * static.shadow_bias
            dirn = smp["wi"]
            nrays = nrays + jnp.sum(alive.astype(jnp.float32))

        # Phase 2 — shade the stored hitpoints once
        stored = done_diffuse
        row = gather_rows(mats, hp_mat)
        sp_sh = dict(p=hp_p, n=hp_n, ng=hp_ng)
        m3 = stored[..., None]

        # show-map mode (finalGather off): the diffuse map stores every
        # diffuse hit INCLUDING bounce-0 direct photons, so its density
        # estimate is already the full-transport radiance at the hitpoint
        # (reference show_map debug semantics) — adding NEE or the caustic
        # map on top would double-count direct/caustic light.
        show_map = not has_radiance and has_diffuse

        if not show_map:
            # direct light (NEE, full sample counts; per-lane dim base
            # routes through the traced-dim hash sampler)
            Ld, sh_rays, _ = _direct_lighting(
                arrays, static, cfg, sp_sh, row, hp_wo, hp_ng, s_idx,
                hp_skey, hp_bdim.astype(jnp.int32), 1, mis_with_bsdf=False,
                alive=stored,
            )
            L = L + jnp.where(m3, hp_tp * Ld, 0.0)
            nrays = nrays + sh_rays * jnp.sum(stored.astype(jnp.float32))

        # caustic map density
        if has_caustic and not show_map:
            cflux, _ = density_auto(arrays["pm_caustic"], hp_p, hp_n,
                                     c_radius)
            lc = cflux / (np.pi * c_radius * c_radius) / n_em_c
            f_c = (row["diffuse_reflect"][..., None]
                   * row["diffuse_color"] * INV_PI)
            L = L + jnp.where(m3, hp_tp * f_c * lc, 0.0)

        # indirect: final gather over the radiance map, or direct
        # global-map density estimate
        if has_radiance:
            # final gather under lax.scan: the body (cosine ray ->
            # closest hit -> nearest radiance photon) is traced once,
            # not fg_samples times (keeps the compiled graph small)
            def fg_body(acc, s):
                skey_f = qmc.hash_combine(hp_skey, jnp.uint32(0xF6) + s)
                u1 = qmc.dynamic_sample_dim(
                    s_idx, hp_bdim + qmc.SLOT_BSDF_U, skey_f)
                u2 = qmc.dynamic_sample_dim(
                    s_idx, hp_bdim + qmc.SLOT_BSDF_V, skey_f)
                gd, _ = sample_cos_hemisphere(hp_n, u1, u2)
                gorg = hp_p + hp_ng * static.shadow_bias
                ghit = _closest_hit(arrays, static, gorg, gd,
                                    tmin=jnp.full(
                                        (n,), static.ray_min_dist,
                                        jnp.float32))
                gsp = _surface_point(arrays, ghit, gorg, gd)
                rad, found = nearest_flash(
                    arrays["pm_radiance"], gsp["p"], d_radius * 4.0)
                gbg = eval_background(static.bg,
                                      arrays.get("bg_image"), gd)
                li = jnp.where(ghit.hit[..., None],
                               jnp.where(found[..., None], rad, 0.0),
                               gbg)
                return acc + li, None

            ind, _ = jax.lax.scan(
                fg_body, jnp.zeros((n, 3), jnp.float32),
                jnp.arange(cfg.fg_samples, dtype=jnp.uint32))
            # cosine sampling of a Lambertian: f·cos/pdf = ρ
            ind = ind / cfg.fg_samples * row["diffuse_color"] \
                * row["diffuse_reflect"][..., None]
            L = L + jnp.where(m3, hp_tp * ind, 0.0)
            nrays = nrays + cfg.fg_samples * jnp.sum(
                stored.astype(jnp.float32))
        elif has_diffuse:
            dflux, _ = density_flash(arrays["pm_diffuse"], hp_p, hp_n,
                                     d_radius)
            ld = dflux / (np.pi * d_radius * d_radius) / n_em_d
            f_d = (row["diffuse_reflect"][..., None]
                   * row["diffuse_color"] * INV_PI)
            # L = f · Σflux / (π r²) — same convention as the caustic
            # estimate and the radiance-map precompute
            L = L + jnp.where(m3, hp_tp * f_d * ld, 0.0)

        return L * wt[..., None], dx, dy, nrays

    def splat(film, L, dx, dy, flags, nrays):
        film = film_splat(film, L.reshape(h, w, 3), dx.reshape(h, w),
                          dy.reshape(h, w), flags.astype(jnp.float32),
                          cfg.filter_type, cfg.aa_pixelwidth,
                          clamp_samples=cfg.aa_clamp_samples)
        return dict(film, rays=film.get("rays", 0.0) + nrays)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import film_sharding

        axis = mesh.axis_names[0]
        repl = NamedSharding(mesh, P())
        fs = film_sharding(mesh, axis)

        def sample_step(arrays, film, flags):
            s_idx = film["nsamples"].reshape(-1).astype(jnp.uint32)
            L, dx, dy, nrays = shade_lanes(arrays, s_idx, px, py,
                                           pixel_hash, flags.reshape(-1))
            return splat(film, L, dx, dy, flags, nrays)

        out_sh = {k: fs.get(k, repl) for k in
                  ("wsum", "w", "nsamples", "flags", "rays")}
        return jax.jit(
            sample_step,
            in_shardings=(repl, out_sh, NamedSharding(mesh, P(axis, None))),
            out_shardings=out_sh, donate_argnums=(1,))

    def sample_step(arrays, film, flags):
        s_idx = film["nsamples"].reshape(-1).astype(jnp.uint32)
        L, dx, dy, nrays = shade_lanes(arrays, s_idx, px, py,
                                       pixel_hash, flags.reshape(-1))
        return splat(film, L, dx, dy, flags, nrays)

    return jax.jit(sample_step, donate_argnums=(1,))


def render_photonmap(cscene, cfg: RenderConfig, progress_cb=None,
                     mesh=None, film_path: str | None = None):
    """film_path + cfg.film_save_load/autosave: pass-granular film
    resume (reference imagefilm film save/load, SURVEY §5.4).  The
    photon maps themselves are rebuilt deterministically at preprocess
    (same seeds), so only the film needs to persist."""
    import time as _t

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        arrays = jax.device_put(cscene.arrays, NamedSharding(mesh, P()))
    else:
        arrays = device_put_scene(cscene)
    t0 = _t.perf_counter()
    grids = build_photon_maps(cscene, cfg, arrays, mesh=mesh)
    diffuse_pack, caustic_pack, radiance_pack = grids[:3]
    arrays = dict(arrays)
    if diffuse_pack is not None:
        arrays["pm_diffuse"] = diffuse_pack
    if caustic_pack is not None:
        arrays["pm_caustic"] = caustic_pack
    if radiance_pack is not None:
        arrays["pm_radiance"] = radiance_pack
    # make_photon_sample_step returns an already-jitted step (one
    # sharded call under mesh)
    step_j = make_photon_sample_step(cscene, cfg, grids, mesh=mesh)

    film = film_init(cfg.height, cfg.width)
    film["rays"] = jnp.zeros((), jnp.float32)
    flags = jnp.ones((cfg.height, cfg.width), jnp.bool_)
    if mesh is not None:
        from ..parallel.mesh import film_sharding

        fs = film_sharding(mesh, mesh.axis_names[0])
        film = {k: jax.device_put(v, fs.get(
            k, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())))
            for k, v in film.items()}
        flags = jax.device_put(flags, fs["flags"])
    from ..film.imagefilm import compute_aa_flags, film_load, film_save

    start_pass = 0
    if cfg.film_save_load in ("load", "load-save") and film_path:
        loaded = film_load(film_path, {"cfg": repr(cfg)})
        if loaded is not None:
            lf, start_pass = loaded
            film = {k: lf.get(k, v) for k, v in film.items()}
            log.info("photonmap film resume: %s at pass %d", film_path,
                     start_pass)

    # CPU virtual-device meshes deadlock XLA's collective rendezvous
    # when many sharded steps are enqueued async (integrators/render.py)
    throttle = mesh is not None and jax.devices()[0].platform == "cpu"
    t1 = _t.perf_counter()
    for p in range(start_pass, cfg.aa_passes):
        fl = flags if p == 0 else compute_aa_flags(
            film, cfg.aa_threshold, cfg.aa_dark_detection,
            cfg.aa_dark_factor, cfg.aa_detect_color_noise)
        for s in range(cfg.aa_samples if p == 0 else cfg.aa_inc_samples):
            film = step_j(arrays, film, fl)
            if throttle:
                jax.block_until_ready(film["wsum"])
        if progress_cb:
            jax.block_until_ready(film["wsum"])
            progress_cb(p + 1, cfg.aa_passes)
        if (cfg.autosave_interval_type == "pass"
                or cfg.film_save_load in ("save", "load-save")) and \
                film_path:
            jax.block_until_ready(film["wsum"])
            film_save(film_path, film, {"cfg": repr(cfg)}, p + 1)
    jax.block_until_ready(film["wsum"])
    t2 = _t.perf_counter()
    return RenderResult(film, cfg, dict(
        render_s=t2 - t1, total_s=t2 - t0, preprocess_s=t1 - t0,
        rays=float(film["rays"]),
    ))
