"""Time-to-RMSE benchmark — BASELINE.json's second primary metric:
wall-clock until the Cornell-box pathtracing film reaches RMSE <= 1e-3
(linear RGB, mean over pixels/channels, gamma-free) vs a golden.

Protocol (BASELINE.md "Measurement protocol"):
  - golden: the SAME pipeline with an independent sampler stream
    (qmc_seed=0xB0B) at GOLDEN_MULT x the measurement spp budget, so
    golden noise is well below the target threshold;
  - measurement: steady-state step loop (compile excluded, the same
    convention as the Mrays/s metric), RMSE checked every CHECK steps;
  - reported: steady seconds to threshold, spp used, rays traced,
    and the golden self-noise floor.

  python scripts/bench_time_to_rmse.py [--size 128] [--threshold 1e-3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--threshold", type=float, default=1e-3)
    ap.add_argument("--spp-step", type=int, default=64,
                    help="spp added per timing-loop iteration")
    # defaults tuned on-device (BENCH_ALL.md r3): measured sigma_eff is
    # 0.058 on this scene, so RMSE 1e-3 is hit near 3.4K spp and a
    # 98K-spp golden has a 3.5e-4 noise floor — comfortably below
    # threshold without running into the >>400K-spp regime
    ap.add_argument("--max-steps", type=int, default=128,
                    help="cap on timing-loop iterations")
    ap.add_argument("--golden-mult", type=int, default=12,
                    help="golden spp = mult x max measurement spp")
    ap.add_argument("--cpu", action="store_true")
    # adaptive protocol (VERDICT r3 #2): run the renderer's own
    # adaptive-AA machinery — pass-0 uniform budget, then compact
    # resample passes over the flagged pixels — and report wall to the
    # same RMSE target.  Bucket compiles are pre-warmed off the clock
    # (same steady-state convention as the uniform loop).
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--pass0-spp", type=int, default=256)
    ap.add_argument("--aa-threshold", type=float, default=2e-3)
    ap.add_argument("--dark", default="linear",
                    help="AA dark detection type for the adaptive run")
    # estimator for the adaptive run: "contrast" (reference neighbor-
    # delta; measured 32.5 s — at thresholds near the target it re-flags
    # true edges forever and degenerates to uniform-plus-overhead) or
    # "variance" (film m2 stderr — unflags pixels as their ESTIMATED
    # error crosses the target, concentrating samples on noisy ones)
    ap.add_argument("--estimator", default="variance",
                    choices=("contrast", "variance"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig
    from libyafaray_tpu.integrators.render import device_put_scene
    from libyafaray_tpu.integrators.engine import make_sample_step
    from libyafaray_tpu.film.imagefilm import film_init, film_image

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene = parse_xml_file(os.path.join(root, "scenes", "cornell.xml"))
    scene.render_params["width"] = args.size
    scene.render_params["height"] = args.size
    base = build_config(scene)

    def make_cfg(seed):
        # one step call = spp_batch samples/pixel (lanes = H*W*spp_batch)
        return RenderConfig(**{
            **base.__dict__, "integrator": "pathtracing", "bounces": 4,
            "rr_min_bounces": 2, "width": args.size, "height": args.size,
            "aa_samples": args.spp_step, "aa_passes": 1, "qmc_seed": seed,
            "spp_batch": args.spp_step,
        })

    cscene = scene.compile()
    arrays = device_put_scene(cscene)
    flags = jnp.ones((args.size, args.size), jnp.bool_)

    def run(cfg, n_steps, probe=None):
        """probe: optional (every, golden) -> list of (steady_s, spp,
        rays, rmse) checkpoints.  The RMSE probe runs ON DEVICE (one
        scalar pull per check) — the r3 protocol's host image pull cost
        ~0.07 s of its 0.175 s/step."""
        step = jax.jit(make_sample_step(cscene.static, cscene.camera, cfg),
                       donate_argnums=(1,))
        rmse_dev = None
        if probe is not None:
            golden_d = jnp.asarray(probe[1])
            rmse_dev = jax.jit(lambda f: jnp.sqrt(jnp.mean(
                (film_image(f) - golden_d) ** 2)))
        f = film_init(args.size, args.size)
        f["rays"] = jnp.zeros((), jnp.float32)
        f = step(arrays, f, flags)             # warmup/compile
        if rmse_dev is not None:
            rmse_dev(f)
        jax.block_until_ready(f["wsum"])
        f = film_init(args.size, args.size)
        f["rays"] = jnp.zeros((), jnp.float32)
        out = []
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            f = step(arrays, f, flags)
            if probe is not None and i % probe[0] == 0:
                rmse = float(rmse_dev(f))
                dt = time.perf_counter() - t0
                out.append((dt, i * cfg.spp_batch,
                            float(f["rays"]), rmse))
                if rmse <= args.threshold:
                    break
        jax.block_until_ready(f["wsum"])
        return np.asarray(film_image(f)), out, time.perf_counter() - t0

    g_steps = args.max_steps * args.golden_mult
    print(f"golden: seed=0xB0B, {g_steps * args.spp_step} spp ...",
          flush=True)
    tg0 = time.perf_counter()
    golden, _, _ = run(make_cfg(0xB0B), g_steps)
    print(f"golden done in {time.perf_counter() - tg0:.1f}s", flush=True)
    # golden noise floor: an independent half-budget render vs golden
    floor_img, _, _ = run(make_cfg(0xF100), g_steps // 2)
    floor = float(np.sqrt(np.mean((floor_img - golden) ** 2)))
    print(f"golden self-noise floor (half-budget indep): {floor:.2e}",
          flush=True)

    if args.adaptive:
        from libyafaray_tpu.film.imagefilm import (compute_aa_flags,
                                                   compute_stderr_flags)

        cfg = make_cfg(0)
        use_var = args.estimator == "variance"
        step_dense = jax.jit(
            make_sample_step(cscene.static, cscene.camera, cfg),
            donate_argnums=(1,))
        n_px = args.size * args.size
        buckets = [b for b in (512, 1024, 2048, 4096, 8192, 16384)
                   if b <= n_px // 2]
        compact = {}
        for nc in buckets:
            compact[nc] = jax.jit(
                make_sample_step(cscene.static, cscene.camera, cfg,
                                 compact_n=nc), donate_argnums=(1,))

        golden_dev = jnp.asarray(golden)

        @jax.jit
        def probe_dev(f):
            """One fused device probe: global RMSE vs golden + flags —
            replaces the per-pass host image pull (~0.07 s/step)."""
            img = film_image(f)
            rmse = jnp.sqrt(jnp.mean((img - golden_dev) ** 2))
            if use_var:
                fl = compute_stderr_flags(f, args.aa_threshold)
            else:
                fl = compute_aa_flags(f, args.aa_threshold, args.dark, 1.0)
            return rmse, fl, jnp.sum(fl.astype(jnp.int32))

        def fresh():
            f = film_init(args.size, args.size, with_variance=use_var)
            f["rays"] = jnp.zeros((), jnp.float32)
            return f

        # pre-warm every compiled program off the clock
        warm = fresh()
        warm = step_dense(arrays, warm, flags)
        probe_dev(warm)
        for nc in buckets:
            dummy = jnp.full((nc,), -1, jnp.int32).at[0].set(0)
            warm = compact[nc](arrays, warm, dummy)
        jax.block_until_ready(warm["wsum"])

        f = fresh()
        checkpoints = []
        t0 = time.perf_counter()
        p0_steps = -(-args.pass0_spp // args.spp_step)
        for _ in range(p0_steps):
            f = step_dense(arrays, f, flags)
        spp = p0_steps * args.spp_step
        inc_steps = 1  # one spp_step-spp burst per adaptive pass
        for p in range(1, args.max_steps):
            rmse_d, fl, nf_d = probe_dev(f)
            rmse, nf = float(rmse_d), int(nf_d)
            dt = time.perf_counter() - t0
            checkpoints.append((dt, spp, float(f["rays"]), rmse, nf))
            if rmse <= args.threshold or nf == 0:
                break
            nc = 512
            while nc < nf:
                nc *= 2
            if nc <= n_px // 2:
                idx = np.flatnonzero(np.asarray(fl)).astype(np.int32)
                pix = jnp.asarray(np.concatenate(
                    [idx, np.full(nc - idx.size, -1, np.int32)]))
                for _ in range(inc_steps):
                    f = compact[nc](arrays, f, pix)
            else:
                for _ in range(inc_steps):
                    f = step_dense(arrays, f, fl)
            spp += inc_steps * args.spp_step
        hit = [c for c in checkpoints if c[3] <= args.threshold]
        for (dt, spp_c, rays, rmse, nf) in checkpoints[-10:]:
            print(f"  t={dt:7.2f}s spp={spp_c:6d} rays={rays / 1e9:.2f}G "
                  f"rmse={rmse:.2e} flagged={nf}")
        result = {
            "metric": "time_to_rmse_adaptive",
            "threshold": args.threshold,
            "resolution": f"{args.size}x{args.size}",
            "pass0_spp": args.pass0_spp,
            "aa_threshold": args.aa_threshold,
            "estimator": args.estimator,
            "golden_spp": g_steps * args.spp_step,
            "noise_floor": floor,
            "reached": bool(hit),
            "steady_s": round(hit[0][0], 3) if hit else None,
            "spp": hit[0][1] if hit else checkpoints[-1][1],
            "rays": hit[0][2] if hit else checkpoints[-1][2],
            "final_rmse": checkpoints[-1][3],
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(result))
        return

    _, checkpoints, steady = run(make_cfg(0), args.max_steps,
                                 probe=(1, golden))
    hit = [c for c in checkpoints if c[3] <= args.threshold]
    for (dt, spp, rays, rmse) in checkpoints[-8:]:
        print(f"  t={dt:7.2f}s spp={spp:6d} rays={rays / 1e9:.2f}G "
              f"rmse={rmse:.2e}")
    result = {
        "metric": "time_to_rmse",
        "threshold": args.threshold,
        "resolution": f"{args.size}x{args.size}",
        "golden_spp": g_steps * args.spp_step,
        "noise_floor": floor,
        "reached": bool(hit),
        "steady_s": round(hit[0][0], 3) if hit else None,
        "spp": hit[0][1] if hit else checkpoints[-1][1],
        "rays": hit[0][2] if hit else checkpoints[-1][2],
        "final_rmse": checkpoints[-1][3],
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
