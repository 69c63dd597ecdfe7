"""Test harness config: CPU backend with 8 virtual devices (SURVEY §4.4 —
the JAX-native fake backend for multi-chip tests).

NOTE: this environment's sitecustomize registers the axon TPU PJRT plugin
at interpreter start and forces jax_platforms=axon, so a plain
JAX_PLATFORMS=cpu env var is NOT enough — we must override the config
after import (backends initialize lazily, so this wins as long as it runs
before the first jax op).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's dominant cost on this box is
# XLA CPU compiles of the big fused render steps (~2 min each), and many
# tests re-trace IDENTICAL programs (fresh jit closures per render call).
# The on-disk cache converts those to cache hits across tests AND across
# suite runs.  LIBYAF_TEST_CACHE='' disables.
_cache = os.environ.get(
    "LIBYAF_TEST_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
if _cache:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got: " + str(jax.devices())
)
assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running golden/regression gates")
