"""TPU perf-floor + 512^2 golden gates (VERDICT r3 #6): opt-in tests
that run scripts/tpu_gate.py against the REAL attached TPU and fail on
silent throughput or physics regressions the CPU suite can't see.

The suite's conftest forces the CPU backend, so each gate runs the
probe in a SUBPROCESS with a clean environment.  Enable with

    LIBYAF_TPU_GATES=1 python -m pytest tests/test_tpu_gates.py -q

Floors are 0.7x the BENCH_ALL.md steady-state values (r3/r4 tables) —
loose enough for the tunnel's run-to-run variance (+-20%), tight enough
that a kernel-layout regression (e.g. reverting the rays8 relayout or a
bad LIBYAF_BT) fails.  Reference role: the upstream fork gates nothing;
this is the framework's own protection for its headline numbers.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("LIBYAF_TPU_GATES") != "1",
    reason="TPU gates: set LIBYAF_TPU_GATES=1 with a real TPU attached")

# 0.7x the recorded steady-state numbers (BENCH_ALL.md):
#   headline cornell.xml 512^2x64spp PT: 196-238 Mrays/s across rounds
#   cornell_path.xml (2.6K tris, glass+glossy): 107 Mrays/s
FLOOR_HEADLINE_MRAYS = 140.0
FLOOR_CORNELL_PATH_MRAYS = 70.0
# 64-spp sampling noise vs the 4096-spp golden measured 7.6e-3 on
# device (sigma_eff/sqrt(64) ~ 7.3e-3); 1.5x headroom.  A physics bug
# the size of r1's SPPM +22% double-count overshoots this by >10x.
GOLDEN512_RMSE_MAX = 0.012


def _probe(what: str, extra=()):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "tpu_gate.py"),
         "--what", what, *extra],
        capture_output=True, text=True, timeout=3000, cwd=_REPO, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def test_gate_headline_throughput():
    out = _probe("headline")
    assert out["mrays"] >= FLOOR_HEADLINE_MRAYS, out


def test_gate_cornell_path_throughput():
    out = _probe("cornell_path")
    assert out["mrays"] >= FLOOR_CORNELL_PATH_MRAYS, out


def test_gate_golden512_rmse():
    out = _probe("golden512")
    assert out["rmse"] <= GOLDEN512_RMSE_MAX, out
    # means agree far tighter than the per-pixel noise bound
    assert abs(out["mean"] - out["golden_mean"]) < 2e-3, out
