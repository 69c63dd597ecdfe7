"""SPPM — stochastic progressive photon mapping (reference
src/integrators/sppm.cc, Hachisuka; SURVEY §2.10/§3.5).

Per pass:
  eye pass    — wavefront trace through specular chains to the first
                diffuse hit; store one hitpoint per pixel (pos, normal,
                throughput); add unbiased direct light + background to the
                film as ordinary samples.
  photon pass — wavefront photon shoot (shared with photonmapping), then
                flux transfer formulated as a GATHER: each hitpoint pulls
                photons within its CURRENT radius via the flash-blocked
                brute-force density kernel (ops/photon_flash — mathematically
                identical to the reference's hash-grid scatter, but
                contention-free; SURVEY §7.2 #2).
  update      — per-pixel R²/N/τ progressive shrink:
                R²' = R²·(N+αM)/(N+M), τ' = τ·same, N' = N+αM  (α = 0.7).

Film: the density layer holds τ/(πR²·N_emitted_total) per pixel
(reference addDensitySample semantics)."""
from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..backgrounds.base import eval_background
from ..cameras.base import shoot_rays
from ..core import math as vmath
from ..core import qmc
from ..core.sampling import INV_PI
from ..film.imagefilm import film_init, film_splat
from ..materials import bsdf
from ..materials.base import MT_COATED_GLOSSY, MT_GLOSSY, MT_SHINYDIFFUSE, \
    gather_rows
from ..ops.photon_flash import (make_photon_pack_auto, density_auto)
from .config import RenderConfig
from .engine import _closest_hit, _direct_lighting, _surface_point
from .photonmap import _light_cdf, MAX_PHOTON_LANES
from .photon_shoot import make_photon_pass
from .render import RenderResult, device_put_scene

log = logging.getLogger("libyafaray_tpu")


def make_eye_pass(cscene, cfg: RenderConfig):
    static = cscene.static
    cam = cscene.camera
    h, w = cfg.height, cfg.width
    n = h * w
    py, px = jnp.divmod(jnp.arange(n, dtype=jnp.int32), w)
    pixel_hash = qmc.hash_u32(px.astype(jnp.uint32)
                              ^ (py.astype(jnp.uint32) << 16))

    def eye_pass(arrays, film, pass_idx):
        s_idx = film["nsamples"].reshape(-1).astype(jnp.uint32)
        flags = jnp.ones((n,), jnp.float32)
        dx = qmc.sample_dim(s_idx, qmc.DIM_PIXEL_X, pixel_hash)
        dy = qmc.sample_dim(s_idx, qmc.DIM_PIXEL_Y, pixel_hash)
        lu = qmc.sample_dim(s_idx, qmc.DIM_LENS_U, pixel_hash)
        lv = qmc.sample_dim(s_idx, qmc.DIM_LENS_V, pixel_hash)
        org, dirn, wt = shoot_rays(cam, px.astype(jnp.float32) + dx,
                                   py.astype(jnp.float32) + dy, lu, lv)

        L = jnp.zeros((n, 3), jnp.float32)
        throughput = jnp.ones((n, 3), jnp.float32)
        alive = wt > 0.0
        stored = jnp.zeros((n,), jnp.bool_)
        hp_pos = jnp.zeros((n, 3), jnp.float32)
        hp_nrm = jnp.zeros((n, 3), jnp.float32)
        hp_tp = jnp.zeros((n, 3), jnp.float32)
        hp_fd = jnp.zeros((n, 3), jnp.float32)  # diffuse albedo·ρ/π
        mats = arrays["materials"]
        nrays = jnp.sum(alive.astype(jnp.float32))

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
            sp_sh = dict(sp, n=n_sh, ng=ng_sh)

            mt = row["mtype"]
            is_diffuse = ((mt == MT_SHINYDIFFUSE) | (mt == MT_GLOSSY)
                          | (mt == MT_COATED_GLOSSY))
            here = alive & is_diffuse & ~stored

            bdim = qmc.bounce_dim(bounce, 0)
            skey_b = qmc.hash_combine(pixel_hash, jnp.uint32(bounce))
            Ld, sh_rays, _ = _direct_lighting(arrays, static, cfg, sp_sh, row,
                                           wo, ng_sh, s_idx, skey_b, bdim, 1,
                                           mis_with_bsdf=False, alive=here)
            L = L + jnp.where(here[..., None], throughput * Ld, 0.0)
            nrays = nrays + sh_rays * jnp.sum(here.astype(jnp.float32))

            hp_pos = jnp.where(here[..., None], sp["p"], hp_pos)
            hp_nrm = jnp.where(here[..., None], n_sh, hp_nrm)
            hp_tp = jnp.where(here[..., None], throughput, hp_tp)
            f_d = (row["diffuse_reflect"][..., None] * row["diffuse_color"]
                   * INV_PI)
            hp_fd = jnp.where(here[..., None], f_d, hp_fd)
            stored = stored | here

            if bounce == cfg.raydepth:
                break
            u1 = qmc.sample_dim(s_idx, bdim + qmc.SLOT_BSDF_U, skey_b)
            u2 = qmc.sample_dim(s_idx, bdim + qmc.SLOT_BSDF_V, skey_b)
            ul = qmc.sample_dim(s_idx, bdim + qmc.SLOT_LIGHT_PICK, skey_b)
            smp = bsdf.sample_bsdf(row, n_sh, ng_sh, wo, u1, u2, ul)
            cont = smp["chain"] & smp["valid"] & ~stored
            alive = alive & cont
            throughput = throughput * smp["tp"]
            off = jnp.where(smp["transmit"], -1.0, 1.0)[..., None]
            org = sp["p"] + ng_sh * off * static.shadow_bias
            dirn = smp["wi"]
            nrays = nrays + jnp.sum(alive.astype(jnp.float32))

        L = L * wt[..., None]
        film = film_splat(film, L.reshape(h, w, 3), dx.reshape(h, w),
                          dy.reshape(h, w), flags.reshape(h, w),
                          cfg.filter_type, cfg.aa_pixelwidth)
        film = dict(film, rays=film.get("rays", 0.0) + nrays)
        hitpoints = dict(pos=hp_pos, normal=hp_nrm, tp=hp_tp, fd=hp_fd,
                         valid=stored)
        return film, hitpoints

    return eye_pass


def flux_update(hitpoints, pack, r2, n_acc, tau, alpha: float):
    """Gather this pass's photons into hitpoints; progressive update.
    density_flash handles the per-hitpoint radius and the front-side test
    (photon stored incoming direction vs hitpoint normal)."""
    flux, m = density_auto(pack, hitpoints["pos"], hitpoints["normal"],
                            jnp.sqrt(r2))
    m = jnp.where(hitpoints["valid"], m, 0.0)
    # BSDF at hitpoint is Lambertian: f = fd (ρ/π)
    tau_add = flux * hitpoints["fd"] * hitpoints["tp"]
    ratio = jnp.where(n_acc + m > 0,
                      (n_acc + alpha * m) / jnp.maximum(n_acc + m, 1e-6),
                      1.0)
    r2_new = r2 * ratio
    tau_new = (tau + tau_add) * ratio[..., None]
    n_new = n_acc + alpha * m
    return r2_new, n_new, tau_new


def render_sppm(cscene, cfg: RenderConfig, progress_cb=None, mesh=None,
                film_path: str | None = None):
    """mesh: optional Mesh — hitpoints/film sharded by pixel rows, photon
    shooting sharded by lane, photon pack replicated (the all-gather rides
    the host compaction); every jit below inherits the placements via
    GSPMD propagation (SURVEY §5.8).

    film_path + cfg.film_save_load: pass-granular resume — SURVEY §5.4
    names long SPPM runs as THE film-resume use case.  The checkpoint
    carries the film plus the progressive state (R², N, τ, emitted
    count); photon-pass seeds are keyed by the pass index, so a resumed
    run continues the same deterministic photon stream."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        _axis = mesh.axis_names[0]
        _repl = NamedSharding(mesh, P())
        _vec = NamedSharding(mesh, P(_axis))
        arrays = jax.device_put(cscene.arrays, _repl)
    else:
        arrays = device_put_scene(cscene)
    static = cscene.static
    h, w = cfg.height, cfg.width
    n = h * w
    t0 = time.perf_counter()

    cdf, total_flux = _light_cdf(static, arrays)
    cdf_j = jnp.asarray(cdf)
    scene_diag = float(np.linalg.norm(
        np.asarray(cscene.bound_max) - np.asarray(cscene.bound_min)))
    if cfg.sppm_initial_radius > 0:
        r0 = cfg.sppm_initial_radius
    else:
        # pixel-footprint estimate (reference pmIRE-ish)
        r0 = scene_diag / max(h, w) * 2.0

    eye = jax.jit(make_eye_pass(cscene, cfg), donate_argnums=(1,))
    lanes = min(MAX_PHOTON_LANES,
                max(4096, -(-cfg.sppm_photons // 4096) * 4096))
    # 'indirect' mode: the eye pass already adds NEE direct light at every
    # stored hitpoint, so bounce-0 photons (arriving straight from the
    # light) must NOT enter the SPPM map or direct light is counted twice
    shoot_fn = make_photon_pass(static, cfg, lanes,
                                cfg.photon_bounces, "indirect")
    if mesh is not None:
        shoot = jax.jit(
            shoot_fn,
            out_shardings=jax.tree.map(
                lambda _: _vec,
                jax.eval_shape(shoot_fn, arrays, cdf_j, total_flux,
                               jnp.uint32(0))))
    else:
        shoot = jax.jit(shoot_fn)
    # all lanes in one jitted update: the r2-era 16K-lane band loop
    # worked around a TPU-worker fault in the photon-grid gathers that
    # the r3 repro (scripts/repro_photon_fault.py) shows is gone
    update_j = jax.jit(flux_update, static_argnames=("alpha",))

    film = film_init(h, w)
    film["rays"] = jnp.zeros((), jnp.float32)
    r2 = jnp.full((n,), r0 * r0, jnp.float32)
    n_acc = jnp.zeros((n,), jnp.float32)
    tau = jnp.zeros((n, 3), jnp.float32)
    if mesh is not None:
        from ..parallel.mesh import film_sharding

        fs = film_sharding(mesh, _axis)
        film = {k: jax.device_put(v, fs.get(k, _repl))
                for k, v in film.items()}
        r2 = jax.device_put(r2, _vec)
        n_acc = jax.device_put(n_acc, _vec)
        tau = jax.device_put(tau, _vec)
    n_emitted_total = 0
    start_pass = 0
    if cfg.film_save_load in ("load", "load-save") and film_path:
        from ..film.imagefilm import film_load

        loaded = film_load(film_path, {"cfg": repr(cfg)})
        if loaded is not None:
            lf, start_pass = loaded
            r2 = lf.pop("sppm_r2")
            n_acc = lf.pop("sppm_n")
            tau = lf.pop("sppm_tau")
            n_emitted_total = int(np.asarray(lf.pop("sppm_nem")))
            film = {k: lf.get(k, v) for k, v in film.items()}
            log.info("SPPM film resume: %s at pass %d (%d photons "
                     "emitted)", film_path, start_pass, n_emitted_total)

    def _save(p):
        from ..film.imagefilm import film_save

        jax.block_until_ready(tau)
        state = dict(film, sppm_r2=r2, sppm_n=n_acc, sppm_tau=tau,
                     sppm_nem=np.asarray(n_emitted_total))
        film_save(film_path, state, {"cfg": repr(cfg)}, p)

    t1 = time.perf_counter()
    # device-side compaction capacity: padded store-rate estimate from
    # the first pass (host sync ONCE, then every pass stays on device)
    from .photonmap import compact_photons_device

    cap = None
    comp = None
    for p in range(start_pass, cfg.sppm_passes):
        film, hitpoints = eye(arrays, film, p)
        rec = shoot(arrays, cdf_j, total_flux, jnp.uint32(31337 + p))
        if cap is None:
            n_stored = int(jnp.sum(rec["valid"]))
            cap = max(4096, -(-int(n_stored * 1.3) // 4096) * 4096)
            # single traced compaction feeding the pack directly
            def _comp_fn(r):
                c = compact_photons_device(r, cap)
                return make_photon_pack_auto(c["pos"], c["valid"], c["dir"],
                                        c["power"])

            comp = jax.jit(_comp_fn)
        pack = comp(rec)
        r2, n_acc, tau = update_j(hitpoints, pack, r2, n_acc, tau,
                                  alpha=cfg.sppm_alpha)
        if mesh is not None and jax.devices()[0].platform == "cpu":
            # rendezvous throttle (see integrators/render.py)
            jax.block_until_ready(tau)
        n_emitted_total += lanes
        if progress_cb:
            jax.block_until_ready(tau)
            progress_cb(p + 1, cfg.sppm_passes)
        if (cfg.autosave_interval_type == "pass"
                or cfg.film_save_load in ("save", "load-save")) and \
                film_path:
            _save(p + 1)

    # density layer: τ/(πR²·N_emitted); direct part is the film average
    dens = tau / (np.pi * jnp.maximum(r2, 1e-12)[..., None]
                  * max(n_emitted_total, 1))
    film["density"] = dens.reshape(h, w, 3)
    jax.block_until_ready(film["wsum"])
    t2 = time.perf_counter()
    return RenderResult(film, cfg, dict(
        render_s=t2 - t1, total_s=t2 - t0, rays=float(film["rays"]),
        passes=cfg.sppm_passes,
    ))
