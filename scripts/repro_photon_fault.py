"""VERDICT r2 next-step #4: root-cause the >16K-lane photon-gather TPU
worker fault hidden behind photonmap.py's LANE_CHUNK band loop.

Escalating stages, each printed before execution so the crash point is
identifiable from the log:
  1. density_flash alone at 16K/64K/262K queries vs a 350K-photon pack
  2. nearest_flash at the same sizes
  3. a final-gather-like fused lax.scan of K density_flash calls
  4. the REAL photonmap sample step at full lanes (LANE_CHUNK bypassed)

Usage: python scripts/repro_photon_fault.py [--stage N]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0, help="0 = all")
    ap.add_argument("--photons", type=int, default=350_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from libyafaray_tpu.ops.photon_flash import (density_flash,
                                                 make_photon_pack,
                                                 nearest_flash)

    rng = np.random.default_rng(0)
    p = args.photons
    pack = jax.jit(make_photon_pack)(
        jnp.asarray(rng.uniform(-3, 3, (p, 3)), jnp.float32),
        jnp.ones((p,), bool),
        jnp.asarray(rng.normal(0, 1, (p, 3)), jnp.float32),
        jnp.asarray(rng.random((p, 3)), jnp.float32))
    jax.block_until_ready(pack["val"])
    print("pack ready", flush=True)

    def queries(n):
        qp = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
        qn = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
        return qp, qn

    sizes = (16384, 65536, 262144)
    if args.stage in (0, 1):
        for n in sizes:
            qp, qn = queries(n)
            print(f"stage1 density n={n} ...", flush=True)
            t0 = time.perf_counter()
            f, c = jax.jit(density_flash)(pack, qp, qn, 0.05)
            s = float(np.asarray(jnp.sum(c)))
            print(f"  ok sum={s:.0f} {time.perf_counter()-t0:.1f}s",
                  flush=True)
    if args.stage in (0, 2):
        for n in sizes:
            qp, _ = queries(n)
            print(f"stage2 nearest n={n} ...", flush=True)
            v, found = jax.jit(nearest_flash)(pack, qp, 0.1)
            print(f"  ok found={float(jnp.mean(found)):.3f}", flush=True)
    if args.stage in (0, 3):
        for n in sizes:
            qp, qn = queries(n)

            def fg(qp, qn):
                def body(acc, k):
                    f, c = density_flash(pack, qp + 0.01 * k, qn, 0.05)
                    return acc + f, None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((qp.shape[0], 3), jnp.float32),
                    jnp.arange(8, dtype=jnp.float32))
                return acc

            print(f"stage3 fused-scan n={n} ...", flush=True)
            t0 = time.perf_counter()
            out = jax.jit(fg)(qp, qn)
            tot = float(np.asarray(jnp.sum(out)))
            print(f"  ok sum={tot:.0f} {time.perf_counter()-t0:.1f}s",
                  flush=True)
    if args.stage in (0, 4):
        print("stage4 real photonmap step at full lanes ...", flush=True)
        from libyafaray_tpu.integrators import photonmap as pm
        from libyafaray_tpu.scene.xml_parser import parse_xml_file
        from libyafaray_tpu.scene.session import build_config
        from libyafaray_tpu.integrators.config import RenderConfig

        # r3: the band workaround (pm.LANE_CHUNK) is gone — the step
        # always shades all lanes in one jitted call now
        old = getattr(pm, "LANE_CHUNK", None)
        if old is not None:
            pm.LANE_CHUNK = 1 << 30  # bypass the band workaround
        try:
            scene = parse_xml_file(os.path.join(
                os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "scenes",
                "cornell_photon.xml"))
            scene.render_params["width"] = 512
            scene.render_params["height"] = 512
            cfg = build_config(scene)
            cfg = RenderConfig(**{**cfg.__dict__, "width": 512,
                                  "height": 512, "aa_samples": 1,
                                  "aa_passes": 1, "photons": 100000,
                                  "caustic_photons": 100000})
            cs = scene.compile()
            res = pm.render_photonmap(cs, cfg)
            print(f"  ok mean={float(np.asarray(res.image).mean()):.4f} "
                  f"render={res.stats['render_s']:.1f}s", flush=True)
        finally:
            if old is not None:
                pm.LANE_CHUNK = old
    print("ALL STAGES PASSED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
