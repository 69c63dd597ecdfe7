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


def put_global(host, sharding):
    """Place a host array that every process holds IDENTICALLY onto a
    (possibly multi-process) sharding.  `jax.device_put` only creates
    process-local arrays; in a multi-controller run each process must
    instead contribute its addressable shards of the global value —
    `make_array_from_callback` does exactly that (and degrades to a
    plain placement single-process)."""
    host = np.asarray(host)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx])


def render_sharded_global(cscene, cfg, mesh, n_steps: int | None = None,
                          axis: str = "film"):
    """Multi-controller-safe variant of parallel.mesh.render_sharded:
    same GSPMD program (film rows sharded, scene replicated), but inputs
    are placed with put_global and the finished film is replicate-
    gathered so every process returns the full host-side planes.

    This is the §5.8 multi-host render step: run one process per host
    (init_distributed first), each sees only its local devices, XLA
    rides ICI/DCN for the splat halos and counter psums.  Validated by
    tests/test_multihost.py with two coordinated CPU processes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..film.imagefilm import film_init
    from ..integrators.engine import make_sample_step
    from .mesh import film_sharding

    import jax.numpy as jnp

    step = make_sample_step(cscene.static, cscene.camera, cfg)
    repl = NamedSharding(mesh, P())
    fs = film_sharding(mesh, axis)

    film = film_init(cfg.height, cfg.width)
    film["rays"] = jnp.zeros((), jnp.float32)
    film = {k: put_global(v, fs.get(k, repl)) for k, v in film.items()}
    arrays = jax.tree.map(lambda a: put_global(a, repl), cscene.arrays)
    flags = put_global(np.ones((cfg.height, cfg.width), np.bool_),
                       NamedSharding(mesh, P(axis, None)))

    out_shardings = {k: fs.get(k, repl) for k in film}
    step_j = jax.jit(step,
                     in_shardings=(repl, out_shardings,
                                   NamedSharding(mesh, P(axis, None))),
                     out_shardings=out_shardings,
                     donate_argnums=(1,))
    # Replicate-gather: an identity jit with replicated out_shardings is
    # the all-gather; afterwards every process can read shard 0.
    gather = jax.jit(lambda f: f,
                     out_shardings={k: repl for k in film})

    # AOT-compile BOTH programs, then rendezvous before the first
    # collective executes.  XLA:CPU's Gloo context init has a ~30 s
    # rendezvous window, while per-process compile times can skew by
    # minutes (one process hits the persistent cache, another doesn't)
    # — without this barrier the faster process times out waiting in
    # the first cross-process collective (measured failure mode of
    # tests/test_multihost.py).
    step_c = step_j.lower(arrays, film, flags).compile()
    gather_c = gather.lower(film).compile()
    _compile_barrier("libyaf_render_compiled")

    for _ in range(n_steps or cfg.aa_samples):
        film = step_c(arrays, film, flags)
    film = gather_c(film)
    return {k: np.asarray(v.addressable_data(0)) for k, v in film.items()}


def _compile_barrier(name: str, timeout_ms: int = 1_200_000):
    """Coordination-service barrier (NOT a device collective — device
    collectives are exactly what we cannot run yet).  No-op when
    single-process or when the internal client API is unavailable."""
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed as _dist

        client = _dist.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
    except Exception as e:  # noqa: BLE001 — API drift: log and proceed
        log.warning("compile barrier unavailable (%s); proceeding", e)
