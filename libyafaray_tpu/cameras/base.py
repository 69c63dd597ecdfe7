"""Cameras — batched shootRay over pixel lanes.

Reference (SURVEY §2.8): perspective (pinhole + thin-lens DOF with bokeh
shapes), architect, angular (fisheye), orthographic, equirectangular; the
interface is camera_t::shootRay(px, py, lu, lv, &wt).

Here a camera is a host dataclass compiled at scene build into a small dict
of constants; `shoot_rays` maps (px, py, lu, lv) lanes -> (org, dir, weight)
fully vectorized.  Bokeh shapes are implemented as polygon/disk warps of the
lens sample (disk1/disk2/triangle..hexagon/ring + bias as in the reference).
"""
from __future__ import annotations

import math as pymath
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from ..core import math as vmath
from ..core.sampling import sample_disk_concentric

CAM_PERSPECTIVE = 0
CAM_ARCHITECT = 1
CAM_ANGULAR = 2
CAM_ORTHographic = 3
CAM_ORTHO = 3
CAM_EQUIRECT = 4

_BOKEH_SIDES = {
    "triangle": 3, "square": 4, "pentagon": 5, "hexagon": 6,
}


@dataclass
class Camera:
    cam_type: int = CAM_PERSPECTIVE
    resx: int = 512
    resy: int = 512
    origin: tuple = (0.0, 0.0, 0.0)
    # orthonormal camera frame (right, up, forward), row vectors
    right: tuple = (1.0, 0.0, 0.0)
    up: tuple = (0.0, 0.0, 1.0)
    fwd: tuple = (0.0, 1.0, 0.0)
    focal: float = 1.0  # focal length in 35mm-ish units (reference `focal`)
    aperture: float = 0.0
    dof_distance: float = 1.0
    bokeh_type: str = "disk1"
    bokeh_rotation: float = 0.0
    bokeh_bias: str = "uniform"  # uniform|center|edge
    aspect_ratio: float = 1.0
    angle_deg: float = 90.0  # angular camera fov
    circular: bool = True  # angular camera mask
    mirrored: bool = False  # angular: horizontally mirrored projection
    max_angle_deg: float = 0.0  # angular: mask half-angle (0 = angle)
    scale: float = 1.0  # ortho scale
    near_clip: float = 0.0
    far_clip: float = -1.0

    @staticmethod
    def from_lookat(cam_type, resx, resy, from_p, to_p, up_v, **kw):
        f = np.asarray(from_p, np.float64)
        t = np.asarray(to_p, np.float64)
        u = np.asarray(up_v, np.float64)
        fwd = t - f
        n = np.linalg.norm(fwd)
        fwd = fwd / max(n, 1e-12)
        # reference convention: `up` param is a point, up dir = up - from
        upd = u - f
        if np.linalg.norm(upd) < 1e-9:
            upd = u
        right = np.cross(fwd, upd)
        rn = np.linalg.norm(right)
        if rn < 1e-9:
            right = np.cross(fwd, np.array([0.0, 0.0, 1.0]))
            rn = np.linalg.norm(right)
            if rn < 1e-9:
                right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
                rn = np.linalg.norm(right)
        right /= rn
        up2 = np.cross(right, fwd)
        return Camera(
            cam_type=cam_type, resx=int(resx), resy=int(resy),
            origin=tuple(f), right=tuple(right), up=tuple(up2),
            fwd=tuple(fwd), **kw,
        )


def _bokeh_warp(cam: Camera, lu, lv):
    """Map lens uniforms to a point on the aperture shape. Returns (x, y)."""
    bias = cam.bokeh_bias.lower()
    if bias == "center":
        lu = lu * lu
    elif bias == "edge":
        lu = 1.0 - (1.0 - lu) * (1.0 - lu)
    bt = cam.bokeh_type.lower()
    if bt in _BOKEH_SIDES:
        k = _BOKEH_SIDES[bt]
        # uniform polygon sampling: pick wedge, warp triangle
        wedge = jnp.floor(lu * k)
        fu = lu * k - wedge
        a0 = (wedge / k) * 2.0 * jnp.pi + cam.bokeh_rotation * jnp.pi / 180.0
        a1 = ((wedge + 1.0) / k) * 2.0 * jnp.pi + cam.bokeh_rotation * jnp.pi / 180.0
        r = jnp.sqrt(jnp.maximum(lv, 0.0))
        p0x, p0y = jnp.cos(a0), jnp.sin(a0)
        p1x, p1y = jnp.cos(a1), jnp.sin(a1)
        x = r * (p0x + fu * (p1x - p0x))
        y = r * (p0y + fu * (p1y - p0y))
        return x, y
    if bt == "ring":
        theta = 2.0 * jnp.pi * lu
        return jnp.cos(theta), jnp.sin(theta)
    # disk1 / disk2 (concentric disk)
    return sample_disk_concentric(lu, lv)


def shoot_rays(cam: Camera, px, py, lu, lv):
    """(px, py): continuous pixel coords in [0,res); (lu, lv): lens uniforms.
    Returns (org (N,3), dir (N,3), weight (N,)).  Matches reference
    shootRay conventions: image plane spans [-0.5, 0.5] horizontally at
    distance `focal`, y down the image."""
    right = jnp.asarray(cam.right, jnp.float32)
    up = jnp.asarray(cam.up, jnp.float32)
    fwd = jnp.asarray(cam.fwd, jnp.float32)
    org0 = jnp.asarray(cam.origin, jnp.float32)

    # NDC in [-0.5, 0.5]; aspect handled by the reference via resy/resx
    u = px / cam.resx - 0.5
    v = 0.5 - py / cam.resy
    aspect = cam.resy / cam.resx * cam.aspect_ratio
    weight = jnp.ones(px.shape, jnp.float32)

    if cam.cam_type in (CAM_PERSPECTIVE, CAM_ARCHITECT):
        d = (
            u[..., None] * right
            + (v * aspect)[..., None] * (up if cam.cam_type == CAM_PERSPECTIVE
                                         else up)
            + cam.focal * fwd
        )
        if cam.cam_type == CAM_ARCHITECT:
            # vertical-line correction: keep the up axis unsheared (world up)
            wup = jnp.asarray(
                np.asarray(cam.up) - np.dot(np.asarray(cam.up), np.asarray(cam.fwd))
                * np.asarray(cam.fwd), jnp.float32,
            )
            d = u[..., None] * right + (v * aspect)[..., None] * wup + cam.focal * fwd
        d = vmath.normalize(d)
        org = org0 + jnp.zeros_like(d)
        if cam.aperture > 0.0:
            ax, ay = _bokeh_warp(cam, lu, lv)
            lens_off = (ax * cam.aperture)[..., None] * right + (
                ay * cam.aperture
            )[..., None] * up
            # focus plane measured along fwd
            ft = cam.dof_distance / jnp.maximum(vmath.dot(d, fwd), 1e-6)
            focus_p = org + ft[..., None] * d
            org = org + lens_off
            d = vmath.normalize(focus_p - org)
        return org, d, weight

    if cam.cam_type == CAM_ANGULAR:
        half = 0.5 * cam.angle_deg * jnp.pi / 180.0
        ua = -u if cam.mirrored else u  # reference `mirrored` x-flip
        r = jnp.sqrt(ua * ua + (v * aspect) * (v * aspect)) * 2.0
        theta = r * half
        phi = jnp.arctan2(v * aspect, ua)
        d = (
            (jnp.sin(theta) * jnp.cos(phi))[..., None] * right
            + (jnp.sin(theta) * jnp.sin(phi))[..., None] * up
            + jnp.cos(theta)[..., None] * fwd
        )
        if cam.circular:
            # reference `max_angle`: circular mask half-angle, default fov/2
            max_half = (0.5 * cam.max_angle_deg * jnp.pi / 180.0
                        if cam.max_angle_deg > 0.0 else half)
            weight = jnp.where(theta <= max_half + 1e-7, weight, 0.0)
        return org0 + jnp.zeros_like(d), vmath.normalize(d), weight

    if cam.cam_type == CAM_ORTHO:
        org = (
            org0
            + (u * cam.scale)[..., None] * right
            + (v * aspect * cam.scale)[..., None] * up
        )
        d = fwd + jnp.zeros_like(org)
        return org, d, weight

    if cam.cam_type == CAM_EQUIRECT:
        phi = 2.0 * jnp.pi * u
        theta = jnp.pi * v
        d = (
            (jnp.cos(theta) * jnp.sin(phi))[..., None] * right
            + jnp.sin(theta)[..., None] * up
            + (jnp.cos(theta) * jnp.cos(phi))[..., None] * fwd
        )
        return org0 + jnp.zeros_like(d), vmath.normalize(d), weight

    raise ValueError(f"unknown camera type {cam.cam_type}")


def pixel_cone(cam: Camera) -> tuple:
    """Ray-cone initialization for texture mip LOD (the TPU-native stand-in
    for the reference's per-ray differentials, ray_t/diffRay_t SURVEY
    §2.1): returns (spread_per_unit_distance, base_width) — the cone
    width at distance t is base + spread·t, approximating one pixel's
    world-space footprint."""
    if cam.cam_type in (CAM_PERSPECTIVE, CAM_ARCHITECT):
        return 1.0 / (cam.resx * max(cam.focal, 1e-6)), 0.0
    if cam.cam_type == CAM_ORTHO:
        return 0.0, cam.scale / cam.resx
    if cam.cam_type == CAM_ANGULAR:
        return (cam.angle_deg * np.pi / 180.0) / cam.resx, 0.0
    return 2.0 * np.pi / cam.resx, 0.0  # equirectangular


def project_to_camera(cam: Camera, p):
    """Inverse of shoot_rays for light tracing (reference camera
    `project`): world points (N,3) -> (px, py, cos_cam, dist, valid).
    Perspective/architect and orthographic supported (the light-tracing
    strategies the reference uses it for)."""
    right = jnp.asarray(cam.right, jnp.float32)
    up = jnp.asarray(cam.up, jnp.float32)
    fwd = jnp.asarray(cam.fwd, jnp.float32)
    org0 = jnp.asarray(cam.origin, jnp.float32)
    aspect = cam.resy / cam.resx * cam.aspect_ratio

    v = p - org0
    dist = jnp.sqrt(jnp.maximum(vmath.dot(v, v), 1e-12))
    if cam.cam_type == CAM_ORTHO:
        x = vmath.dot(v, right) / cam.scale
        y = vmath.dot(v, up) / (cam.scale * aspect)
        z = vmath.dot(v, fwd)
        px = (x + 0.5) * cam.resx
        py = (0.5 - y) * cam.resy
        valid = (z > 1e-4) & (px >= 0) & (px < cam.resx) \
            & (py >= 0) & (py < cam.resy)
        return px, py, jnp.ones_like(px), dist, valid
    # perspective family: NDC u = focal·x/z, v·aspect = focal·y/z
    z = vmath.dot(v, fwd)
    safe_z = jnp.maximum(z, 1e-6)
    u = cam.focal * vmath.dot(v, right) / safe_z
    w = cam.focal * vmath.dot(v, up) / (safe_z * aspect)
    px = (u + 0.5) * cam.resx
    py = (0.5 - w) * cam.resy
    cos_c = z / dist
    valid = (z > 1e-4) & (px >= 0) & (px < cam.resx) \
        & (py >= 0) & (py < cam.resy)
    return px, py, cos_c, dist, valid


def pixel_plane_area(cam: Camera) -> float:
    """Area of one pixel on the NDC image plane (at distance `focal` for
    perspective) — the light-tracing splat measure."""
    aspect = cam.resy / cam.resx * cam.aspect_ratio
    return (1.0 / cam.resx) * (aspect / cam.resy)
