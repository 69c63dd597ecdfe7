"""Multi-host (pod) scaffolding — SURVEY §5.8 distributed backend.

The reference has NO distributed backend (single-process shared memory;
SURVEY §2.14): this module is the TPU-native equivalent's host-side glue.
The render programs themselves are already multi-host ready — they are
GSPMD programs over a `jax.sharding.Mesh` (film rows + photon lanes
sharded, scene replicated; see parallel/mesh.py and the integrators'
`mesh=` arguments) — so the only multi-host-specific work is:

  1. initialize the JAX distributed runtime (one process per host),
  2. build the mesh over ALL devices (local + remote),
  3. parse the scene on every process identically (XML is deterministic,
     so no host-0 broadcast is needed — each host compiles the same
     arrays; `jax.device_put` with a NamedSharding then lays out only the
     local shards).

Collective traffic: the film psum and splat halos ride ICI within a
slice and DCN across slices — XLA picks the topology from the mesh.
Determinism: per-pixel/per-lane QMC streams are position-keyed, so
renders are reproducible across process counts (float reduction order in
psum'd counters is the only documented variance; SURVEY §5.2).

This module cannot be exercised in the single-chip CI environment; the
8-device virtual CPU mesh (tests/test_parallel.py) validates the same
program path, which is the JAX-native "fake backend" for pods
(SURVEY §4.4).
"""
from __future__ import annotations

import logging
import os

import jax
import numpy as np

log = logging.getLogger("libyafaray_tpu")


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host render.

    With no arguments, relies on the cluster environment (TPU pod
    metadata / `JAX_COORDINATOR_ADDRESS` etc. — jax auto-detects on
    Cloud TPU).  Returns True when the distributed runtime is live.
    Call ONCE per process, before any other jax API.
    """
    try:
        kwargs = {}
        if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kwargs["coordinator_address"] = (
                coordinator_address
                or os.environ["JAX_COORDINATOR_ADDRESS"])
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        jax.distributed.initialize(**kwargs)
        log.info("distributed: process %d/%d, %d global devices",
                 jax.process_index(), jax.process_count(),
                 len(jax.devices()))
        return True
    except Exception as e:  # noqa: BLE001 — single-host fallback
        log.warning("distributed init unavailable (%s); single-host", e)
        return False


def global_mesh(axis: str = "film"):
    """1-D mesh over every device of every process (film/lane axis).
    Pass to render_sharded / render_photonmap / render_sppm."""
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))
