"""Capture a jax.profiler trace of one ibl_spheres sample step and print
the top device ops by total duration (parse the perfetto trace directly —
tensorboard's proto plugin is broken in this image, per the verify notes).
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scripts.bench_engine import load
    from libyafaray_tpu.film.imagefilm import film_init
    from libyafaray_tpu.integrators.engine import make_sample_step

    cs, cfg = load("ibl_spheres.xml", res=res, spp=4)
    arrays = jax.device_put(cs.arrays)
    step = jax.jit(make_sample_step(cs.static, cs.camera, cfg),
                   donate_argnums=(1,))
    flags = jnp.ones((res, res), jnp.bool_)

    def fresh():
        f = film_init(res, res)
        f["rays"] = jnp.zeros((), jnp.float32)
        return f

    f = step(arrays, fresh(), flags)
    np.asarray(f["rays"])  # compile + warm
    tdir = "/tmp/ibltrace"
    jax.profiler.start_trace(tdir)
    f = fresh()
    for _ in range(2):
        f = step(arrays, f, flags)
    np.asarray(f["rays"])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    print("traces:", paths, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for p in paths:
        with gzip.open(p, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            # keep device lanes only (TensorFlow Op / XLA Ops tracks)
            name = ev.get("name", "")
            dur = ev.get("dur", 0)  # microseconds
            if dur <= 0:
                continue
            agg[name[:100]] += dur
            cnt[name[:100]] += 1
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print(f"{dur/1e3:9.2f} ms  x{cnt[name]:<5d} {name}", flush=True)


if __name__ == "__main__":
    main()
