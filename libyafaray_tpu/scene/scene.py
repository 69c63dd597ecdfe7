"""Scene — host-side scene graph + compile to flat device arrays.

Reference roles merged here (SURVEY §2.2, L8/L9):
  * scene_t          — owns objects/lights/materials, geometry streaming
                       state machine, update() (accel build), render entry
  * renderEnvironment_t — string-keyed factories (create*), param plumbing
  * yafrayInterface_t  — the flat scene-building API surface

TPU-native inversion: instead of pointer-linked objects traversed per ray,
`compile()` lowers everything into a `CompiledScene`:
  - device arrays (pytree dict): triangle SoA (split into a camera-visible
    set and a shadow-caster set, baking per-object visibility flags),
    material table, light table, per-light CDFs, background image
  - `SceneStatic` (hashable): light/type layout, intersector choice,
    background spec — everything tracing specializes on.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass, field

import numpy as np

from ..accel.bvh import build_bvh
from ..backgrounds.base import BackgroundSpec
from ..backgrounds.factory import background_from_params
from ..cameras.base import Camera
from ..cameras.factory import camera_from_params
from ..lights.base import LT_MESH, build_light_table
from ..lights.factory import light_from_params
from ..materials.base import MT_LIGHT, build_material_table, default_row
from ..materials.factory import material_row_from_params
from ..ops.intersect import pad_triangles
from .mesh import TriMesh, finalize_mesh, make_sphere_mesh, transform_baked
from .params import ParamMap

log = logging.getLogger("libyafaray_tpu")


@dataclass(frozen=True)
class LightStatic:
    ltype: int
    samples: int
    is_delta: bool
    intersectable: bool
    cast_shadows: bool
    photon_only: bool
    enabled: bool
    tri_start: int = -1
    tri_count: int = 0


@dataclass(frozen=True)
class SceneStatic:
    n_materials: int
    n_tris: int  # camera-visible set, padded size
    n_tris_real: int
    n_shadow_tris: int  # shadow set, padded size
    lights: tuple  # tuple[LightStatic, ...]
    bg: BackgroundSpec
    intersector: str  # "brute" | "bvh"
    chunk: int
    shadow_bias: float
    ray_min_dist: float
    volumes: tuple = ()  # tuple[VolumeRegion, ...] (frozen dataclasses)
    textures: tuple = ()  # tuple of texture specs (textures/factory.py)
    texture_mappings: tuple = ()  # per-texture (texco, mapping, scale, off)
    has_blend: int = 0  # max blend_mat/mask_mat NESTING depth in the
    # table (0 = none; 2 = a blend whose child is itself a blend).
    # Falsy when no composites exist, so boolean uses keep working.
    blend_child_textured: bool = False  # some composite CHILD carries a
    # texture slot / node program -> blend.py resolves child textures
    # per nesting level (reference blendmat.cc delegates initBSDF)
    mat_families: tuple | None = None  # mtype codes present
    node_programs: tuple = ()  # compiled shader DAGs (textures/nodes.py)
    n_spheres: int = 0  # analytic sphere primitives
    n_stris_real: int = 0  # shadow set, real count (tiny-kernel dispatch)
    need_orco: bool = False   # some texco is orco/object -> gather pack
    need_window: bool = False  # some texco is window -> raster projection
    max_additional_depth: int = 0  # max material additionalDepth in table
    has_sampling_factor: bool = False  # any material samplingFactor != 1


@dataclass
class CompiledScene:
    arrays: dict  # device-ready numpy/jnp arrays (pytree)
    static: SceneStatic
    camera: Camera
    bound_min: tuple = (0.0, 0.0, 0.0)
    bound_max: tuple = (1.0, 1.0, 1.0)


def _blend_depth(materials) -> int:
    """Max blend/mask nesting depth over the material table (reference
    blendmat.cc composes ARBITRARY children, including other blends).
    Cycle-safe: a composite reached twice on one chain counts once and
    the walk stops (matches the reference, where a cycle would be an
    authoring error); capped at 4 levels."""

    def depth(i, seen):
        if i < 0 or i >= len(materials) or i in seen or len(seen) >= 4:
            return 0
        r = materials[i]
        if r["mtype"] not in (6, 7):
            return 0
        s = seen | {i}
        return 1 + max(depth(int(r.get("sub_mat1", 0)), s),
                       depth(int(r.get("sub_mat2", 0)), s))

    return max((depth(i, frozenset()) for i in range(len(materials))),
               default=0)


def _blend_child_textured(materials) -> bool:
    """True when any material reachable as a composite CHILD carries a
    texture slot or node program.  Gates per-level child texture
    resolution in materials/blend.py: the reference blendmat.cc
    delegates initBSDF to both children, so their shader stacks (incl. a
    nested blend's own mapped blend_value) evaluate per hit — here that
    costs extra per-lane texture evals, so scenes without textured
    composite children skip it statically."""
    tex_cols = ("tex_diffuse", "tex_glossy", "tex_mirror",
                "tex_transparency", "tex_translucency", "tex_blend",
                "tex_mask", "tex_sigma_oren", "tex_ior", "node_prog")
    stack = []
    for r in materials:
        if r["mtype"] in (6, 7):
            stack += [int(r.get("sub_mat1", -1)),
                      int(r.get("sub_mat2", -1))]
    seen = set()
    while stack:
        i = stack.pop()
        if i < 0 or i >= len(materials) or i in seen:
            continue
        seen.add(i)
        r = materials[i]
        if any(int(r.get(c, -1)) >= 0 for c in tex_cols):
            return True
        if r["mtype"] in (6, 7):
            stack += [int(r.get("sub_mat1", -1)),
                      int(r.get("sub_mat2", -1))]
    return False


class Scene:
    """Host scene under construction through the flat API."""

    def __init__(self):
        self.meshes: dict[int, TriMesh] = {}
        self.extra_tri_blocks: list[dict] = []  # sphere prims, light panels
        self.materials: list[dict] = [default_row()]  # row 0 = fallback null
        self.material_names: dict[str, int] = {"__default__": 0}
        self.lights: list[dict] = []
        self.light_names: list[str] = []
        self.light_geometry: list = []  # parallel: geometry or None
        self.cameras: dict[str, Camera] = {}
        self.textures: dict[str, object] = {}
        self.background: tuple = (BackgroundSpec(), None)
        self.volumes: list = []
        self.render_params = ParamMap()
        self.integrator_params: dict[str, ParamMap] = {}
        self._cur_mesh: TriMesh | None = None
        self._next_mesh_id = 0
        self.shadow_bias = 5e-4
        self.ray_min_dist = 5e-5
        self.aborted = False
        # raw ParamMaps retained for XML re-export (xml_writer round-trip)
        self.material_params: dict[str, ParamMap] = {}
        self.light_params: list[ParamMap] = []
        self.camera_params: dict[str, ParamMap] = {}
        self.background_params: ParamMap | None = None
        self.volume_params: list[ParamMap] = []
        self.texture_params: dict[str, ParamMap] = {}
        self.texture_mappers: dict[int, tuple] = {}
        self.node_programs: list = []  # compiled shader DAGs (nodes.py)
        self.analytic_spheres: list = []  # (center, radius, mat_id)

    # ------------------------------------------------------------------
    # geometry streaming (yafrayInterface parity)
    # ------------------------------------------------------------------

    def start_tri_mesh(self, mesh_id=None, has_uv=False, has_orco=False,
                       obj_pass_index=0, visibility="normal") -> int:
        if mesh_id is None:
            mesh_id = self._next_mesh_id
        mesh_id = int(mesh_id)
        self._next_mesh_id = max(self._next_mesh_id, mesh_id + 1)
        if visibility not in ("normal", "invisible", "shadow_only",
                              "no_shadows"):
            log.warning("startTriMesh: unknown visibility %r -> normal",
                        visibility)
            visibility = "normal"
        self._cur_mesh = TriMesh(mesh_id=mesh_id, has_uv=bool(has_uv),
                                 has_orco=bool(has_orco),
                                 obj_pass_index=int(obj_pass_index),
                                 visibility=visibility)
        self.meshes[mesh_id] = self._cur_mesh
        return mesh_id

    def add_vertex(self, x, y, z):
        self._cur_mesh.add_vertex(x, y, z)
        return len(self._cur_mesh.vertices) - 1

    def add_normal(self, x, y, z):
        self._cur_mesh.add_normal(x, y, z)

    def add_uv(self, u, v):
        return self._cur_mesh.add_uv(u, v)

    def add_triangle(self, a, b, c, mat_name_or_id=0,
                     uv_a=-1, uv_b=-1, uv_c=-1):
        """a/b/c are vertex INDICES into the current mesh; as a
        convenience (tests/quick scripts) they may instead be (x, y, z)
        point tuples, which stream into an implicit current mesh."""
        mid = (
            self.material_names.get(mat_name_or_id, 0)
            if isinstance(mat_name_or_id, str)
            else int(mat_name_or_id)
        )
        if isinstance(a, (tuple, list, np.ndarray)):
            if self._cur_mesh is None:
                self.start_tri_mesh()
            a = self.add_vertex(*a)
            b = self.add_vertex(*b)
            c = self.add_vertex(*c)
        self._cur_mesh.add_triangle(a, b, c, mid, uv_a, uv_b, uv_c)

    def end_tri_mesh(self):
        self._cur_mesh = None

    def smooth_mesh(self, mesh_id, angle_deg):
        m = self.meshes.get(int(mesh_id)) or self._cur_mesh
        if m is not None:
            m.smooth(angle_deg)

    def add_instance(self, base_mesh_id, matrix16):
        base = self.meshes.get(int(base_mesh_id))
        if base is None:
            log.warning("addInstance: unknown base mesh %s", base_mesh_id)
            return
        arrays = finalize_mesh(base)
        if arrays is None:
            return
        m = np.asarray(matrix16, np.float64).reshape(4, 4)
        self.extra_tri_blocks.append(transform_baked(arrays, m))

    def add_sphere(self, center, radius, mat_name_or_id=0,
                   analytic: bool = True):
        """Sphere primitive (reference std_primitives.cc "sphere").
        analytic=True (default, reference parity): exact quadric
        intersection via the engine's sphere pass — exact silhouettes and
        normals.  analytic=False: subdivided icosphere through the
        triangle intersector."""
        mid = (
            self.material_names.get(mat_name_or_id, 0)
            if isinstance(mat_name_or_id, str)
            else int(mat_name_or_id)
        )
        if analytic:
            self.analytic_spheres.append(
                (tuple(float(x) for x in center), float(radius), mid))
        else:
            self.extra_tri_blocks.append(
                make_sphere_mesh(center, radius, mid))

    # ------------------------------------------------------------------
    # factories (renderEnvironment_t::create*)
    # ------------------------------------------------------------------

    def create_material(self, name: str, params: ParamMap) -> int:
        self.material_params[name] = ParamMap(params)
        row = material_row_from_params(
            params, self.material_names,
            {n: i for i, n in enumerate(self.textures)},
            self.texture_mappers,
            node_programs=self.node_programs,
        )
        if name in self.material_names:
            self.materials[self.material_names[name]] = row
            return self.material_names[name]
        self.materials.append(row)
        self.material_names[name] = len(self.materials) - 1
        return self.material_names[name]

    def create_light(self, name: str, params: ParamMap) -> int:
        self.light_params.append(ParamMap(params))
        row, geometry = light_from_params(params)
        self.lights.append(row)
        self.light_names.append(name)
        self.light_geometry.append(geometry)
        return len(self.lights) - 1

    def create_camera(self, name: str, params: ParamMap) -> Camera:
        self.camera_params[name] = ParamMap(params)
        cam = camera_from_params(params)
        self.cameras[name] = cam
        return cam

    def create_texture(self, name: str, params: ParamMap):
        self.texture_params[name] = ParamMap(params)
        from ..textures.factory import texture_from_params

        self.textures[name] = texture_from_params(params)
        return self.textures[name]

    def create_background(self, name: str, params: ParamMap):
        self.background_params = ParamMap(params)
        self.background = background_from_params(params, self.textures)
        return self.background

    def create_volume_region(self, name: str, params: ParamMap):
        self.volume_params.append(ParamMap(params))
        from ..volumes.factory import volume_from_params

        self.volumes.append(volume_from_params(params))
        return self.volumes[-1]

    def create_integrator(self, name: str, params: ParamMap):
        self.integrator_params[name] = ParamMap(params)

    def set_render_params(self, params: ParamMap):
        self.render_params = ParamMap(params)
        self.shadow_bias = params.get_float("shadow_bias", 5e-4)
        self.ray_min_dist = params.get_float("ray_min_dist", 5e-5)

    def abort(self):
        self.aborted = True

    # ------------------------------------------------------------------
    # compile (scene_t::update analog)
    # ------------------------------------------------------------------

    def compile(self, chunk: int | None = None) -> CompiledScene:
        blocks: list[dict] = []
        block_mesh_ids: list = []
        for mesh_id, mesh in self.meshes.items():
            arr = finalize_mesh(mesh)
            if arr is not None:
                blocks.append(arr)
                block_mesh_ids.append(mesh_id)
        for b in self.extra_tri_blocks:
            blocks.append(b)
            block_mesh_ids.append(None)

        # area-light panels -> synthetic light_mat + triangles
        for li, (row, geom) in enumerate(zip(self.lights,
                                             self.light_geometry)):
            if geom is None:
                continue
            lm = default_row()
            lm["mtype"] = MT_LIGHT
            lm["emit_color"] = geom["radiance"]
            lm["diffuse_reflect"] = 0.0
            self.materials.append(lm)
            mat_id = len(self.materials) - 1
            pos = geom["pos"]
            tcount = pos.shape[0]
            gn = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
            gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-20)
            blocks.append(dict(
                pos=pos.astype(np.float32),
                normal=np.repeat(gn[:, None, :], 3, axis=1).astype(np.float32),
                geo_n=gn.astype(np.float32),
                uv=np.zeros((tcount, 3, 2), np.float32),
                mat=np.full(tcount, mat_id, np.int32),
                light_id=np.full(tcount, li, np.int32),
                visibility="normal",
            ))
            block_mesh_ids.append(None)

        if not blocks:
            blocks.append(dict(
                pos=np.full((1, 3, 3), 1e30, np.float32),
                normal=np.zeros((1, 3, 3), np.float32),
                geo_n=np.zeros((1, 3), np.float32),
                uv=np.zeros((1, 3, 2), np.float32),
                mat=np.zeros(1, np.int32),
                light_id=np.full(1, -1, np.int32),
                visibility="normal",
            ))
            block_mesh_ids.append(None)

        vis_pairs = [(mid, b) for mid, b in zip(block_mesh_ids, blocks)
                     if b.get("visibility", "normal") in ("normal",
                                                          "no_shadows")]
        shadow_blocks = [b for b in blocks
                         if b.get("visibility", "normal") in ("normal",
                                                              "shadow_only")]
        if not vis_pairs:
            vis_pairs = [(block_mesh_ids[0], blocks[0])]
        if not shadow_blocks:
            shadow_blocks = blocks[:1]
        vis_blocks = [b for _, b in vis_pairs]

        # blocks built outside finalize_mesh (light panels, fallback,
        # extra blocks) default to local=pos / bbox-normalized orco
        for b in blocks:
            if "local" not in b:
                b["local"] = b["pos"]
            if "orco" not in b:
                lp = b["local"]
                bmin = lp.reshape(-1, 3).min(axis=0)
                bmax = lp.reshape(-1, 3).max(axis=0)
                ctr = 0.5 * (bmin + bmax)
                ext = np.maximum(0.5 * (bmax - bmin), 1e-12)
                b["orco"] = ((lp - ctr) / ext).astype(np.float32)

        def cat(bs, key):
            return np.concatenate([b[key] for b in bs], axis=0)

        pos = cat(vis_blocks, "pos")  # (T,3,3)
        normal = cat(vis_blocks, "normal")
        geo_n = cat(vis_blocks, "geo_n")
        uv = cat(vis_blocks, "uv")
        mat = cat(vis_blocks, "mat")
        light_id = cat(vis_blocks, "light_id")
        n_real = pos.shape[0]

        # tri range of each mesh id in the visible concat (for meshlights)
        mesh_ranges: dict = {}
        tri_cursor = 0
        for mid, b in vis_pairs:
            cnt = b["pos"].shape[0]
            if mid is not None:
                mesh_ranges[mid] = (tri_cursor, cnt)
            tri_cursor += cnt

        # meshlight resolution (reference src/lights/meshlight.cc):
        # area-weighted triangle CDF + diffuse radiance L = Φ/(π·A_total);
        # emission at BSDF hits is added via lights.hit_radiance keyed by
        # tri light_id (the object keeps its own surface material)
        extra_light_arrays: dict = {}
        for li, row in enumerate(self.lights):
            if "_object" not in row:
                continue
            try:
                obj_key = int(row["_object"])
            except (TypeError, ValueError):
                obj_key = None
            if obj_key not in mesh_ranges:
                log.warning("meshlight %s: object %r not found; disabled",
                            self.light_names[li], row["_object"])
                row["enabled"] = False
                continue
            start, cnt = mesh_ranges[obj_key]
            tri = pos[start:start + cnt]
            areas = 0.5 * np.linalg.norm(
                np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]),
                axis=1,
            )
            total_area = float(max(areas.sum(), 1e-12))
            cdf = np.concatenate([[0.0], np.cumsum(areas / areas.sum())])
            cdf[-1] = 1.0
            extra_light_arrays[f"mlight_cdf_{li}"] = cdf.astype(np.float32)
            row["area"] = total_area
            rad = (np.asarray(row["_color"]) * row["_power"]
                   / (np.pi * total_area))
            row["radiance"] = tuple(rad)
            row["tri_start"] = start
            row["tri_count"] = cnt
            if row["ltype"] == LT_MESH:  # portals don't emit at hits
                light_id[start:start + cnt] = li

        v0 = pos[:, 0]
        e1 = pos[:, 1] - pos[:, 0]
        e2 = pos[:, 2] - pos[:, 0]
        if chunk is None:
            # pad to the VPU lane quantum, not a fixed 512 — for small
            # scenes brute-force cost is linear in the padded size
            chunk = int(min(512, max(8, -(-n_real // 8) * 8)))
        v0p, e1p, e2p, _ = pad_triangles(v0, e1, e2, chunk)
        n_pad = v0p.shape[0]

        # shadow geometry == visible geometry in the common all-"normal"
        # case: reuse the concats/pads/packs instead of rebuilding (at
        # 655K tris the duplicate concat+pack build was ~40% of scene
        # compile)
        same_shadow = (len(shadow_blocks) == len(vis_blocks) and
                       all(a is b for a, b in
                           zip(shadow_blocks, vis_blocks)))
        if same_shadow:
            sv0, se1, se2, smat = v0, e1, e2, mat
            sv0p, se1p, se2p = v0p, e1p, e2p
        else:
            spos = cat(shadow_blocks, "pos")
            sv0 = spos[:, 0]
            se1 = spos[:, 1] - spos[:, 0]
            se2 = spos[:, 2] - spos[:, 0]
            smat = cat(shadow_blocks, "mat")
            sv0p, se1p, se2p, _ = pad_triangles(sv0, se1, se2, chunk)
        ns_pad = sv0p.shape[0]

        mats = build_material_table(self.materials)

        # per-shadow-tri transmission filter from material table (pure
        # numpy: scene compile must not dispatch device ops — over a
        # remote-tunneled TPU each tiny op costs a round trip)
        from ..materials.host import shadow_filter_np

        filt_m = shadow_filter_np(mats)  # (M,3)
        sfilt = filt_m[smat]
        sfilt = np.concatenate(
            [sfilt, np.zeros((ns_pad - sfilt.shape[0], 3), np.float32)]
        )
        # binary variant for transpShad=false renders: only true pass-through
        # (null) materials don't block
        sfilt_bin = np.where(
            np.min(sfilt, axis=-1, keepdims=True) >= 1.0 - 1e-6, 1.0, 0.0
        ).astype(np.float32)

        bg_spec, bg_img = self.background

        # IBL: the background auto-creates a bglight (reference textureback
        # `ibl` flag). Bake non-texture backgrounds to a small lat-long grid
        # so eval/sampling share one path.
        all_lights = list(self.lights)
        if bg_spec.ibl:
            if bg_img is None:
                from ..backgrounds.host import bake_background_np

                bg_img = bake_background_np(bg_spec, 32, 64)
            from ..lights.base import default_light_row

            bgrow = default_light_row()
            bgrow["ltype"] = 7  # LT_BACKGROUND
            bgrow["samples"] = max(1, bg_spec.ibl_samples)
            bgrow["intersectable"] = True
            all_lights = all_lights + [bgrow]

        lights_table = build_light_table(
            [{k: v for k, v in r.items() if not k.startswith("_")}
             for r in all_lights]
        )
        # emission radiance for BSDF hits on light geometry (meshlights;
        # area lights emit through their synthetic light_mat)
        hit_rad = np.zeros((len(all_lights), 3), np.float32)
        for li, r in enumerate(all_lights):
            if ("_object" in r and r.get("enabled", True)
                    and r["ltype"] == LT_MESH):
                hit_rad[li] = np.asarray(r["radiance"], np.float32)
        lights_table["hit_radiance"] = hit_rad
        # packed per-light emission-hit attributes (one gather in the
        # engine's emission step): [area, double_sided, hit_radiance rgb,
        # ltype, center xyz, radius] — ltype/center/radius feed the
        # sphere-light cone-pdf MIS branch (reference spherelight
        # canIntersect)
        lights_table["hit_pack"] = np.concatenate([
            lights_table["area"][:, None].astype(np.float32),
            lights_table["double_sided"][:, None].astype(np.float32),
            hit_rad,
            lights_table["ltype"][:, None].astype(np.float32),
            lights_table["p0"].astype(np.float32),
            lights_table["radius"][:, None].astype(np.float32),
        ], axis=1) if len(all_lights) else np.zeros((0, 10), np.float32)

        light_statics = tuple(
            LightStatic(
                ltype=int(r["ltype"]), samples=int(r["samples"]),
                is_delta=bool(r["is_delta"]),
                intersectable=bool(r["intersectable"]),
                cast_shadows=bool(r["cast_shadows"]),
                photon_only=bool(r["photon_only"]),
                enabled=bool(r["enabled"]),
                tri_start=int(r["tri_start"]),
                tri_count=int(r["tri_count"]),
            )
            for r in all_lights
        )

        # per-triangle uv density sqrt(uv_area / world_area): converts the
        # ray-cone world footprint to uv units for mip LOD selection
        # (reference uses dPdU/dPdV differentials; SURVEY §2.5)
        uv_e1 = uv[:, 1] - uv[:, 0]
        uv_e2 = uv[:, 2] - uv[:, 0]
        uv_area = 0.5 * np.abs(uv_e1[:, 0] * uv_e2[:, 1]
                               - uv_e1[:, 1] * uv_e2[:, 0])
        w_area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
        uv_density = np.sqrt(uv_area / np.maximum(w_area, 1e-12))

        # true surface derivatives dPdU/dPdV (reference surface.h
        # surfacePoint_t, SURVEY §2.2): solve [e1;e2] = [[du1,dv1],
        # [du2,dv2]]·[dPdU;dPdV] per triangle; degenerate UVs (no UV
        # layer, zero uv area) fall back to an ONB of the geometric
        # normal so downstream consumers (EWA footprints, NU/NV debug,
        # aniso tangents) always see a valid frame
        du1 = uv_e1[:, 0]
        dv1 = uv_e1[:, 1]
        du2 = uv_e2[:, 0]
        dv2 = uv_e2[:, 1]
        uv_det = du1 * dv2 - dv1 * du2
        ok_uv = np.abs(uv_det) > 1e-12
        inv_det = 1.0 / np.where(ok_uv, uv_det, 1.0)
        dpdu = (dv2[:, None] * e1 - dv1[:, None] * e2) * inv_det[:, None]
        dpdv = (-du2[:, None] * e1 + du1[:, None] * e2) * inv_det[:, None]
        # ONB fallback (branchless Duff construction, matches core.math)
        gs = np.where(geo_n[:, 2] >= 0.0, 1.0, -1.0)
        ga = -1.0 / (gs + geo_n[:, 2])
        gb = geo_n[:, 0] * geo_n[:, 1] * ga
        onb_u = np.stack([1.0 + gs * geo_n[:, 0] ** 2 * ga, gs * gb,
                          -gs * geo_n[:, 0]], axis=1)
        onb_v = np.stack([gb, gs + geo_n[:, 1] ** 2 * ga,
                          -geo_n[:, 1]], axis=1)
        dpdu = np.where(ok_uv[:, None], dpdu, onb_u).astype(np.float32)
        dpdv = np.where(ok_uv[:, None], dpdv, onb_v).astype(np.float32)

        # packed per-triangle shading attributes: ONE gather per hit instead
        # of eight (pos 9, normal 9, uv 6, geo_n 3, mat 1, light_id 1,
        # uv_density 1, dPdU 3, dPdV 3 = 36)
        # np.asarray(x, f32) is a no-copy cast for the (common) already-
        # f32 inputs; .astype would copy before concatenate copies again
        tri_shade_pack = np.concatenate([
            np.asarray(pos.reshape(n_real, 9), np.float32),
            np.asarray(normal.reshape(n_real, 9), np.float32),
            np.asarray(uv.reshape(n_real, 6), np.float32),
            np.asarray(geo_n, np.float32),
            mat[:, None].astype(np.float32),
            light_id[:, None].astype(np.float32),
            uv_density[:, None].astype(np.float32),
            dpdu, dpdv,
        ], axis=1)
        # packed winner geometry for the intersector's barycentric recompute
        tri_geom_pack = np.concatenate(
            [np.asarray(v0, np.float32), np.asarray(e1, np.float32),
             np.asarray(e2, np.float32)], axis=1)

        # which texture coordinate spaces does this scene's shading
        # actually need?  (texco orco/object need the per-corner
        # object-space pack; window needs the camera raster projection)
        texcos = {m[0] for m in (
            self.texture_mappers.get(i, ("uv",))
            for i in range(len(self.textures)))}
        for prog in self.node_programs:
            for nd in prog:
                if getattr(nd, "mapping", ()):
                    texcos.add(nd.mapping[0])
        need_orco = bool(texcos & {"orco", "object"})
        need_window = "window" in texcos
        tri_orco_pack = None
        if need_orco:
            local = cat(vis_blocks, "local")  # (T,3,3)
            orco = cat(vis_blocks, "orco")
            # (T, 18): orco corners 0:9, local (object-space) corners 9:18
            tri_orco_pack = np.concatenate([
                np.asarray(orco.reshape(n_real, 9), np.float32),
                np.asarray(local.reshape(n_real, 9), np.float32),
            ], axis=1)
        # Clustered packs for the pallas kernels: (10, T) v0|e1|e2|orig_id
        # rows in Morton order + per-cluster AABBs (cluster culling — the
        # dense path's replacement for tree traversal)
        from ..ops.pallas_intersect import build_tri_pack, morton_order

        t_order = morton_order(v0, e1, e2) if n_real > 1024 else None
        tri_pack10, tri_cluster8, t_ord = build_tri_pack(v0, e1, e2,
                                                         t_order)
        ns_real = sv0.shape[0]
        if same_shadow:
            stri_pack10, stri_cluster8, s_ord = (tri_pack10, tri_cluster8,
                                                 t_ord)
        else:
            s_order = (morton_order(sv0, se1, se2)
                       if ns_real > 1024 else None)
            stri_pack10, stri_cluster8, s_ord = build_tri_pack(
                sv0, se1, se2, s_order)
        # shadow filters in PACK order (padded entries alias tri 0 — they
        # are degenerate and never hit)
        sfilt_pk = filt_m[smat][s_ord]
        sfilt_bin_pk = np.where(
            np.min(sfilt_pk, axis=-1, keepdims=True) >= 1.0 - 1e-6,
            1.0, 0.0).astype(np.float32)

        arrays = dict(
            tris=dict(v0=np.asarray(v0p, np.float32),
                      e1=np.asarray(e1p, np.float32),
                      e2=np.asarray(e2p, np.float32)),
            tri_shade_pack=tri_shade_pack,
            **({"tri_orco_pack": tri_orco_pack}
               if tri_orco_pack is not None else {}),
            tri_geom_pack=tri_geom_pack,
            tri_pack10=tri_pack10,
            tri_cluster8=tri_cluster8,
            stri_pack10=stri_pack10,
            stri_cluster8=stri_cluster8,
            sfilt4=np.concatenate(
                [sfilt_pk.T.astype(np.float32),
                 np.zeros((1, sfilt_pk.shape[0]), np.float32)]),
            sfilt4_binary=np.concatenate(
                [np.broadcast_to(sfilt_bin_pk, (sfilt_pk.shape[0], 3))
                 .T.astype(np.float32),
                 np.zeros((1, sfilt_pk.shape[0]), np.float32)]),
            stris=dict(v0=np.asarray(sv0p, np.float32),
                       e1=np.asarray(se1p, np.float32),
                       e2=np.asarray(se2p, np.float32)),
            shadow_filt=sfilt.astype(np.float32),
            shadow_filt_binary=sfilt_bin,
            tri_pos=pos.astype(np.float32),
            tri_normal=normal.astype(np.float32),
            tri_geo_n=geo_n.astype(np.float32),
            tri_uv=uv.astype(np.float32),
            tri_mat=mat.astype(np.int32),
            tri_light_id=light_id.astype(np.int32),
            materials=mats,
            lights=lights_table,
        )
        # image textures as device arrays (procedurals compile from specs)
        for ti, tex in enumerate(self.textures.values()):
            if tex.tex_type == "image" and tex.image is not None:
                arrays[f"tex_{ti}"] = np.ascontiguousarray(
                    tex.image[..., :3], np.float32)
                if tex.interpolate.startswith("mipmap"):
                    from ..textures.factory import build_mip_atlas

                    arrays[f"mip_{ti}"] = build_mip_atlas(
                        tex.image[..., :3])
            elif tex.tex_type == "image":
                arrays[f"tex_{ti}"] = np.zeros((2, 2, 3), np.float32)

        if bg_img is not None:
            arrays["bg_image"] = np.asarray(bg_img, np.float32)
            if getattr(bg_spec, "ibl_blur", 0.0) > 0.0:
                # ibl_blur: lighting lookups (NEE/portal/CDF) read the
                # blurred copy; the visible background stays sharp
                from ..backgrounds.factory import blur_env_map

                arrays["bg_image_ibl"] = blur_env_map(bg_img,
                                                      bg_spec.ibl_blur)
        if bg_spec.ibl and bg_img is not None:
            from ..lights.bglight import build_bg_cdf

            arrays.update(build_bg_cdf(
                arrays.get("bg_image_ibl", bg_img)))
        arrays.update(extra_light_arrays)
        for li, r in enumerate(all_lights):
            if "_ies_profile" in r:
                arrays[f"ies_{li}"] = np.asarray(r["_ies_profile"],
                                                 np.float32)

        from ..ops.pallas_intersect import CPU_DENSE_MAX, \
            MAX_TRIS as _DENSE_MAX_TRIS, _use_pallas

        # backend-aware budget: the TPU streaming kernels carry up to
        # MAX_TRIS; on CPU (pallas interpreted / jnp brute) the threaded
        # BVH walk takes over much earlier
        _budget = _DENSE_MAX_TRIS if _use_pallas() else CPU_DENSE_MAX
        intersector = "brute" if n_real <= _budget else "bvh"
        if intersector == "bvh":
            arrays["bvh"] = build_bvh(v0, e1, e2)
            arrays["sbvh"] = build_bvh(sv0, se1, se2)

        # analytic sphere primitives (reference std_primitives.cc):
        # pack [cx cy cz r mat] + per-sphere shadow filters; the engine
        # runs an exact quadric pass merged with the triangle hit
        if self.analytic_spheres:
            sp_rows = np.asarray(
                [[c[0], c[1], c[2], r, float(m)]
                 for (c, r, m) in self.analytic_spheres], np.float32)
            arrays["spheres"] = sp_rows
            sp_mats = sp_rows[:, 4].astype(np.int32)
            arrays["sphere_filt"] = filt_m[sp_mats].astype(np.float32)
            arrays["sphere_filt_binary"] = np.where(
                np.min(arrays["sphere_filt"], axis=-1, keepdims=True)
                >= 1.0 - 1e-6, 1.0, 0.0
            ).astype(np.float32) * np.ones((1, 3), np.float32)

        finite = pos[np.all(np.isfinite(pos), axis=(1, 2))]
        bmin = finite.min(axis=(0, 1)) if finite.size else np.zeros(3)
        bmax = finite.max(axis=(0, 1)) if finite.size else np.ones(3)
        if self.analytic_spheres:
            sc = np.asarray([c for (c, r, m) in self.analytic_spheres])
            sr = np.asarray([[r] for (c, r, m) in self.analytic_spheres])
            bmin = np.minimum(bmin, (sc - sr).min(axis=0))
            bmax = np.maximum(bmax, (sc + sr).max(axis=0))

        static = SceneStatic(
            n_materials=len(self.materials),
            n_tris=n_pad, n_tris_real=n_real, n_shadow_tris=ns_pad,
            n_stris_real=ns_real,
            lights=light_statics, bg=bg_spec, intersector=intersector,
            chunk=chunk, shadow_bias=self.shadow_bias,
            ray_min_dist=self.ray_min_dist,
            volumes=tuple(self.volumes),
            textures=tuple(t.spec for t in self.textures.values()),
            texture_mappings=tuple(
                self.texture_mappers.get(i, ("uv", "plain",
                                             (1.0, 1.0, 1.0),
                                             (0.0, 0.0, 0.0)))
                for i in range(len(self.textures))),
            node_programs=tuple(self.node_programs),
            has_blend=_blend_depth(self.materials),
            blend_child_textured=_blend_child_textured(self.materials),
            mat_families=tuple(sorted(
                {r["mtype"] for r in self.materials})),
            n_spheres=len(self.analytic_spheres),
            need_orco=need_orco,
            need_window=need_window,
            max_additional_depth=int(max(
                (r.get("additional_depth", 0.0) for r in self.materials),
                default=0)),
            has_sampling_factor=any(
                abs(r.get("sampling_factor", 1.0) - 1.0) > 1e-9
                for r in self.materials),
        )
        cam = next(iter(self.cameras.values())) if self.cameras else Camera()
        cam_name = self.render_params.get_str("camera_name", "")
        if cam_name and cam_name in self.cameras:
            cam = self.cameras[cam_name]
        # <render> width/height override the camera resolution (reference
        # behavior: the render block drives the film and pixel->NDC mapping)
        rw = self.render_params.get_int("width", cam.resx)
        rh = self.render_params.get_int("height", cam.resy)
        if rw != cam.resx or rh != cam.resy:
            from dataclasses import replace

            cam = replace(cam, resx=rw, resy=rh)
        return CompiledScene(
            arrays=arrays, static=static, camera=cam,
            bound_min=tuple(float(x) for x in bmin),
            bound_max=tuple(float(x) for x in bmax),
        )
