"""Multi-chip rendering over a jax.sharding.Mesh.

Reference parity note (SURVEY §2.14/§5.8): the reference is single-process
shared-memory (std::thread tile workers + film mutex).  The TPU-native
replacement shards the FILM (pixel rows) across devices with GSPMD: the
wavefront sample_step is per-pixel data parallel, scene arrays are
replicated, and XLA inserts the halo collective-permutes for the filter
splat's shifted adds and a psum for the ray counter.  No NCCL/MPI analog is
hand-written — the mesh + shardings ARE the communication backend, riding
ICI intra-slice and DCN across hosts.

Determinism: per-pixel QMC streams are position-keyed (pixel hash), so a
render is bitwise independent of the mesh shape except for float reduction
order in psum'd counters (documented, SURVEY §5.2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..film.imagefilm import film_init
from ..integrators.engine import make_sample_step


def make_device_mesh(n_devices: int | None = None, axis: str = "film"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def film_sharding(mesh: Mesh, axis: str = "film"):
    """Film planes are sharded along image rows."""
    return dict(
        wsum=NamedSharding(mesh, P(axis, None, None)),
        w=NamedSharding(mesh, P(axis, None)),
        nsamples=NamedSharding(mesh, P(axis, None)),
        flags=NamedSharding(mesh, P(axis, None)),
        rays=NamedSharding(mesh, P()),
    )


def film_shardings_for(film: dict, mesh: Mesh, axis: str = "film"):
    """Row-shard every (H, W, ...) plane in an actual film dict (incl.
    AOV planes and the density layer); scalars replicate.  Used by the
    production pass loop when it auto-builds a mesh (render(mesh=...))."""
    out = {}
    for k, v in film.items():
        if getattr(v, "ndim", 0) >= 2:
            out[k] = NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1))))
        else:
            out[k] = NamedSharding(mesh, P())
    return out


def make_sharded_step(cscene, cfg, mesh: Mesh, axis: str = "film"):
    """Jit the sample_step with film sharded across the mesh; scene arrays
    replicated.  Returns (step_fn, sharded_film_init, flags_sharding)."""
    step = make_sample_step(cscene.static, cscene.camera, cfg)
    repl = NamedSharding(mesh, P())
    fs = film_sharding(mesh, axis)

    def film0():
        f = film_init(cfg.height, cfg.width)
        f["rays"] = jnp.zeros((), jnp.float32)
        return {
            k: jax.device_put(v, fs.get(k, repl)) for k, v in f.items()
        }

    arrays = jax.device_put(cscene.arrays, repl)
    out_shardings = {k: fs.get(k, repl) for k in
                     ("wsum", "w", "nsamples", "flags", "rays")}
    step_j = jax.jit(
        step,
        in_shardings=(repl, out_shardings,
                      NamedSharding(mesh, P(axis, None))),
        out_shardings=out_shardings,
        donate_argnums=(1,),
    )
    flags_sh = NamedSharding(mesh, P(axis, None))
    return step_j, arrays, film0, flags_sh


def render_sharded(cscene, cfg, mesh: Mesh, n_steps: int | None = None,
                   axis: str = "film"):
    """Render cfg.aa_samples (or n_steps) samples/pixel across the mesh."""
    step_j, arrays, film0, flags_sh = make_sharded_step(cscene, cfg, mesh,
                                                        axis)
    flags = jax.device_put(
        jnp.ones((cfg.height, cfg.width), jnp.bool_), flags_sh
    )
    film = film0()
    for _ in range(n_steps or cfg.aa_samples):
        film = step_j(arrays, film, flags)
    jax.block_until_ready(film["wsum"])
    return film
