"""Multi-HOST (multi-controller) validation — SURVEY §5.8.

Two coordinated JAX processes on localhost (4 virtual CPU devices each,
jax.distributed over a local coordinator) render the sharded Cornell
program on the resulting 8-device global mesh; the replicate-gathered
film must match the single-process 8-device render of the SAME program
(per-pixel QMC is position-keyed, so the image is mesh-placement
independent).  This is the closest a single machine gets to a pod:
process-spanning GSPMD placement, cross-process collectives (splat
halos, counter psum), and the host-side gather path all execute for
real.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(ROOT, "scripts", "multihost_probe.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "film0.npz")
    cache = os.environ.get(
        "LIBYAF_TEST_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # probe sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, PROBE, "--coordinator", f"localhost:{port}",
             "--nprocs", "2", "--pid", str(pid), "--out", out,
             "--cache", cache],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost probe timed out")
        logs.append(stdout)
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"probe rc={p.returncode}\n{lg[-4000:]}"
    assert os.path.exists(out), logs[0][-4000:]
    got = np.load(out)

    # Single-process reference on the same 8-device (local) mesh.
    from libyafaray_tpu.parallel.mesh import make_device_mesh
    from libyafaray_tpu.parallel.distributed import render_sharded_global
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig

    s = parse_xml_file(os.path.join(ROOT, "scenes", "cornell.xml"))
    s.render_params["width"] = 32
    s.render_params["height"] = 32
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "pathtracing",
                          "bounces": 2, "width": 32, "height": 32,
                          "aa_samples": 2})
    cscene = s.compile()
    ref = render_sharded_global(cscene, cfg, make_device_mesh(8),
                                n_steps=2)

    assert np.isfinite(got["wsum"]).all()
    assert np.allclose(ref["wsum"], got["wsum"], atol=1e-5), np.abs(
        ref["wsum"] - got["wsum"]).max()
    assert np.allclose(ref["w"], got["w"], atol=1e-5)
    # the psum'd ray counter must agree too (float order may differ)
    assert np.allclose(ref["rays"], got["rays"], rtol=1e-6)


@pytest.mark.slow
def test_render_sharded_global_single_process():
    """The multihost-safe path must also run (and match render_sharded)
    in an ordinary single-process session — it is the same program."""
    from libyafaray_tpu.parallel.mesh import make_device_mesh, render_sharded
    from libyafaray_tpu.parallel.distributed import render_sharded_global
    from libyafaray_tpu.scene.xml_parser import parse_xml_file
    from libyafaray_tpu.scene.session import build_config
    from libyafaray_tpu.integrators.config import RenderConfig

    s = parse_xml_file(os.path.join(ROOT, "scenes", "cornell.xml"))
    s.render_params["width"] = 32
    s.render_params["height"] = 32
    cfg = build_config(s)
    cfg = RenderConfig(**{**cfg.__dict__, "integrator": "pathtracing",
                          "bounces": 2, "width": 32, "height": 32,
                          "aa_samples": 2})
    cscene = s.compile()
    mesh = make_device_mesh(8)
    a = render_sharded_global(cscene, cfg, mesh, n_steps=2)
    b = render_sharded(cscene, cfg, mesh, n_steps=2)
    assert np.allclose(a["wsum"], np.asarray(b["wsum"]), atol=1e-5)
    assert len(jax.devices()) >= 8
