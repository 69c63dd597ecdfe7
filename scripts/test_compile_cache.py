"""VERDICT r2 next-step #3: does JAX's persistent compilation cache
eliminate the per-process cold-compile tax through this environment's
remote-compile tunnel?

Runs the same tiny TPU render twice in FRESH subprocesses with
jax_compilation_cache_dir enabled, and reports first-step (compile) wall
for each.  If run 2's compile ~= run 1's, the cache does not work over
the tunnel and PARITY.md gets the finding; if run 2 is fast, the CLI
should enable the cache by default.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_compilation_cache_dir", {cache!r})
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from libyafaray_tpu.scene.xml_parser import parse_xml_file
from libyafaray_tpu.scene.session import build_config
from libyafaray_tpu.integrators.config import RenderConfig
from libyafaray_tpu.integrators.engine import make_sample_step
from libyafaray_tpu.film.imagefilm import film_init

scene = parse_xml_file(os.path.join({repo!r}, "scenes", "cornell.xml"))
scene.render_params["width"] = 64
scene.render_params["height"] = 64
cfg = build_config(scene)
cfg = RenderConfig(**{{**cfg.__dict__, "integrator": "pathtracing",
                      "bounces": 2, "width": 64, "height": 64,
                      "aa_samples": 1}})
cs = scene.compile()
step = jax.jit(make_sample_step(cs.static, cs.camera, cfg))
film = film_init(64, 64)
film["rays"] = jnp.zeros((), jnp.float32)
flags = jnp.ones((64, 64), jnp.bool_)
t0 = time.perf_counter()
out = step(jax.device_put(cs.arrays), film, flags)
import numpy as np
np.asarray(out["rays"])
t1 = time.perf_counter()
print(json.dumps({{"first_step_s": t1 - t0}}))
"""


def main():
    cache = os.path.join(tempfile.gettempdir(), "libyaf_xla_cache_probe")
    os.makedirs(cache, exist_ok=True)
    code = CHILD.format(repo=_REPO, cache=cache)
    results = []
    for i in range(2):
        t0 = time.perf_counter()
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=1200)
        wall = time.perf_counter() - t0
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")]
        first = json.loads(line[-1])["first_step_s"] if line else None
        n_entries = len(os.listdir(cache))
        results.append(dict(run=i + 1, wall_s=round(wall, 1),
                            first_step_s=round(first, 1) if first else None,
                            rc=r.returncode, cache_entries=n_entries))
        print(json.dumps(results[-1]), flush=True)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            return 1
    a, b = results[0]["first_step_s"], results[1]["first_step_s"]
    verdict = ("CACHE WORKS: repeat-process compile %.1fs vs cold %.1fs"
               % (b, a)) if b < a * 0.4 else (
        "CACHE INEFFECTIVE over this tunnel: %.1fs vs %.1fs" % (b, a))
    print(verdict)
    return 0


if __name__ == "__main__":
    sys.exit(main())
