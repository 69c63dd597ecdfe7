"""DebugIntegrator (reference src/integrators/DebugIntegrator.cc):
renders geometry/shading-frame fields as color — N, Ng, dPdU/dPdV (frame
tangents), UV — the reference's de-facto geometry test (SURVEY §4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..cameras.base import shoot_rays
from ..core import math as vmath
from ..integrators.config import RenderConfig
from ..integrators.engine import _closest_hit, _surface_point
from ..integrators.render import RenderResult, device_put_scene


def render_debug(cscene, cfg: RenderConfig, debug_type: str = "N"):
    h, w = cfg.height, cfg.width
    n = h * w
    py, px = jnp.divmod(jnp.arange(n, dtype=jnp.int32), w)
    arrays = device_put_scene(cscene)
    static = cscene.static
    cam = cscene.camera

    @jax.jit
    def run():
        org, dirn, wt = shoot_rays(
            cam, px.astype(jnp.float32) + 0.5, py.astype(jnp.float32) + 0.5,
            jnp.zeros(n), jnp.zeros(n),
        )
        hit = _closest_hit(arrays, static, org, dirn,
                           tmin=jnp.full((n,), static.ray_min_dist,
                                         jnp.float32))
        sp = _surface_point(arrays, hit, org, dirn)
        if debug_type == "N":
            c = sp["n"] * 0.5 + 0.5
        elif debug_type == "Ng":
            c = sp["ng"] * 0.5 + 0.5
        elif debug_type == "dPdU":
            # TRUE uv-parameterization derivative (normalized for display;
            # reference DebugIntegrator shows raw dPdU)
            c = vmath.normalize(sp["dpdu"]) * 0.5 + 0.5
        elif debug_type == "dPdV":
            c = vmath.normalize(sp["dpdv"]) * 0.5 + 0.5
        elif debug_type == "NU":
            # NU = dPdU orthonormalized against N (reference createCS)
            du = sp["dpdu"] - sp["n"] * vmath.dot(sp["n"],
                                                  sp["dpdu"])[..., None]
            dl = jnp.linalg.norm(du, axis=-1, keepdims=True)
            onb_u, _ = vmath.build_onb(sp["n"])
            c = jnp.where(dl > 1e-9, du / jnp.maximum(dl, 1e-9),
                          onb_u) * 0.5 + 0.5
        elif debug_type == "NV":
            du = sp["dpdu"] - sp["n"] * vmath.dot(sp["n"],
                                                  sp["dpdu"])[..., None]
            dl = jnp.linalg.norm(du, axis=-1, keepdims=True)
            onb_u, _ = vmath.build_onb(sp["n"])
            nu = jnp.where(dl > 1e-9, du / jnp.maximum(dl, 1e-9), onb_u)
            c = jnp.cross(sp["n"], nu) * 0.5 + 0.5
        elif debug_type == "UV":
            c = jnp.stack([sp["uv"][..., 0], sp["uv"][..., 1],
                           jnp.zeros(n)], axis=-1)
        else:
            c = jnp.broadcast_to(hit.t[..., None], (n, 3))
        c = jnp.where(hit.hit[..., None], c, 0.0)
        return c.reshape(h, w, 3)

    img = run()
    from ..film.imagefilm import film_init

    film = film_init(h, w)
    film = dict(film, wsum=img, w=jnp.ones((h, w), jnp.float32))
    return RenderResult(film, cfg, dict(render_s=0.0, rays=float(n)))
