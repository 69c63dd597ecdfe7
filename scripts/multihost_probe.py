"""Multi-host render probe — one coordinated JAX process of N.

Run by tests/test_multihost.py as two subprocesses on localhost (4
virtual CPU devices each → an 8-device global mesh across 2 processes),
the closest this single-machine environment gets to a real pod
(SURVEY §5.8: host-per-process jax.distributed + GSPMD mesh).  Each
process renders the SAME sharded program; process 0 writes the
replicate-gathered film for the test to compare against the
single-process 8-device render.

Usage:
  python scripts/multihost_probe.py --coordinator localhost:PORT \
      --nprocs 2 --pid 0 --out /tmp/film0.npz [--local-devices 4]
"""
import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--cache", default="")
    a = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            + str(a.local_devices)).strip()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if a.cache:
        jax.config.update("jax_compilation_cache_dir", a.cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from libyafaray_tpu.parallel.distributed import (
        init_distributed, global_mesh, render_sharded_global)

    ok = init_distributed(a.coordinator, a.nprocs, a.pid)
    assert ok, "jax.distributed.initialize failed"
    assert jax.process_count() == a.nprocs, jax.process_count()
    assert len(jax.devices()) == a.nprocs * a.local_devices, jax.devices()
    assert len(jax.local_devices()) == a.local_devices

    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig

    s = parse_xml_file(os.path.join(root, "scenes", "cornell.xml"))
    s.render_params["width"] = 32
    s.render_params["height"] = 32
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "pathtracing",
                          "bounces": 2, "width": 32, "height": 32,
                          "aa_samples": 2})
    cscene = s.compile()

    mesh = global_mesh()
    film = render_sharded_global(cscene, cfg, mesh, n_steps=2)
    if jax.process_index() == 0:
        np.savez(a.out, **film)
        print("probe: wrote", a.out, "mean",
              float(film["wsum"].mean()), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
