"""Material factory: ParamMap -> material table row.

Reference: renderEnvironment_t::createMaterial + each material's
`factory(paraMap, env)` (SURVEY §2.4) — parameter names and defaults follow
the reference's factories so XML scenes map 1:1.
"""
from __future__ import annotations

import logging

from ..scene.params import ParamMap
from .base import MATERIAL_TYPE_NAMES, MT_BLEND, MT_GLASS, MT_LIGHT, \
    MT_MASK, MT_ROUGH_GLASS, default_row

log = logging.getLogger("libyafaray_tpu")

# reference layernode blend modes (SURVEY §2.4: ~18 Blender modes; the
# structurally distinct ones are implemented, the hue/sat family maps to
# mix pending a color-space stage)
_BLEND_MODES = {
    "mix": 0, "add": 1, "sub": 2, "subtract": 2, "mul": 3, "multiply": 3,
    "screen": 4, "difference": 5, "darken": 6, "lighten": 7, "div": 8,
    "divide": 8, "overlay": 9,
    "hue": 0, "saturation": 0, "value": 0, "color": 0, "stencil": 0,
}


def material_row_from_params(params: ParamMap, mat_name_to_id: dict,
                             tex_name_to_id: dict | None = None,
                             texture_mappers: dict | None = None,
                             node_programs: list | None = None) -> dict:
    tex_name_to_id = tex_name_to_id or {}
    texture_mappers = texture_mappers if texture_mappers is not None else {}
    mtype_name = params.get_str("type", "shinydiffusemat")
    if mtype_name not in MATERIAL_TYPE_NAMES:
        log.warning("unknown material type %r; using shinydiffusemat",
                    mtype_name)
        mtype_name = "shinydiffusemat"
    row = default_row()
    row["mtype"] = MATERIAL_TYPE_NAMES[mtype_name]

    # common / shinydiffuse
    row["diffuse_color"] = params.get_rgb("color", params.get_rgb(
        "diffuse_color", (0.8, 0.8, 0.8)))
    row["mirror_color"] = params.get_rgb("mirror_color", (1.0, 1.0, 1.0))
    row["diffuse_reflect"] = params.get_float("diffuse_reflect", 1.0)
    row["specular_reflect"] = params.get_float("specular_reflect", 0.0)
    row["transparency"] = params.get_float("transparency", 0.0)
    row["translucency"] = params.get_float("translucency", 0.0)
    row["emit_strength"] = params.get_float("emit", 0.0)
    row["fresnel_effect"] = params.get_bool("fresnel_effect", False)
    row["ior"] = params.get_float("IOR", 1.0)
    row["sigma"] = params.get_float("sigma", 0.0)
    row["receive_shadows"] = params.get_bool("receive_shadows", True)
    # per-material sampling controls (reference material.h: additionalDepth
    # raises the ray-depth budget for paths through this material;
    # samplingFactor scales adaptive-AA resampling priority)
    row["sampling_factor"] = params.get_float(
        "samplingfactor", params.get_float("sampling_factor", 1.0))
    row["additional_depth"] = float(params.get_int(
        "additionaldepth", params.get_int("additional_depth", 0)))

    # glossy family
    row["glossy_color"] = params.get_rgb("glossy_color", (1.0, 1.0, 1.0))
    row["glossy_reflect"] = params.get_float("glossy_reflect", 1.0)
    row["exponent"] = params.get_float("exponent", 50.0)
    row["anisotropic"] = params.get_bool("anisotropic", False)
    row["exp_u"] = params.get_float("exp_u", 50.0)
    row["exp_v"] = params.get_float("exp_v", 50.0)
    row["as_diffuse"] = params.get_bool("as_diffuse", False)

    # glass family
    if row["mtype"] in (MT_GLASS, MT_ROUGH_GLASS):
        row["ior"] = params.get_float("IOR", 1.5)
        row["filter_color"] = params.get_rgb("filter_color", (1.0, 1.0, 1.0))
        absorp = params.get_rgb("absorption", (1.0, 1.0, 1.0))
        dist = params.get_float("absorption_dist", 1.0)
        # Beer sigma = -ln(color)/dist (App. B); color 1 => no absorption
        import math
        sigma = tuple(
            -math.log(max(min(c, 1.0), 1e-6)) / max(dist, 1e-6)
            if c < 1.0 - 1e-9 else 0.0
            for c in absorp
        )
        row["absorption_sigma"] = sigma
        row["dispersion_power"] = params.get_float("dispersion_power", 0.0)
        row["fake_shadows"] = params.get_bool("fake_shadows", False)
        if row["mtype"] == MT_ROUGH_GLASS:
            # reference exposes `alpha` roughness; map to Blinn-style exponent
            alpha = params.get_float("alpha", params.get_float("exponent", 0.2))
            if alpha <= 0.0:
                alpha = 1e-3
            if "alpha" in params:
                row["exponent"] = max(2.0 / (alpha * alpha) - 2.0, 1.0)
    else:
        row["filter_color"] = params.get_rgb("filter_color", (1.0, 1.0, 1.0))

    # light material
    if row["mtype"] == MT_LIGHT:
        power = params.get_float("power", 1.0)
        col = params.get_rgb("color", (1.0, 1.0, 1.0))
        row["emit_color"] = tuple(c * power for c in col)
        row["double_sided"] = params.get_bool("double_sided", False)
        row["diffuse_reflect"] = 0.0

    # blend / mask
    if row["mtype"] in (MT_BLEND, MT_MASK):
        m1 = params.get_str("material1", "")
        m2 = params.get_str("material2", "")
        row["sub_mat1"] = mat_name_to_id.get(m1, 0)
        row["sub_mat2"] = mat_name_to_id.get(m2, 0)
        row["blend_value"] = params.get_float("blend_value", 0.5)
        row["mask_threshold"] = params.get_float("threshold", 0.5)

    # shader-node resolution (reference nodematerial.cc): the material's
    # shader slots name NODES from its <list_element> block; nodes of type
    # texture_mapper bind a texture (with texco/mapping transform — carried
    # by the texture's mapper registration in textures/eval), layer nodes
    # chain to an input.  We resolve each slot down to its source texture
    # id; full arbitrary-DAG blending is the node-compiler stage (layer
    # chains resolve to their textured input, warn on loss).
    node_to_tex: dict[str, int] = {}
    nodes = params.get_list("__list__", [])
    for _ in range(3):  # resolve chains up to depth 3
        for nd in nodes:
            if not isinstance(nd, ParamMap):
                nd = ParamMap(nd)
            name = nd.get_str("name", "")
            ntype = nd.get_str("type", "")
            if not name or name in node_to_tex:
                continue
            if ntype in ("texture_mapper", "texture"):
                t = nd.get_str("texture", "")
                if t in tex_name_to_id:
                    ti = tex_name_to_id[t]
                    node_to_tex[name] = ti
                    # mapper-level bump strength (reference textureMapper
                    # bump_strength; consumed by eval.bump_normal when
                    # this node feeds the bump slot)
                    bs = nd.get_float("bump_strength", -1.0)
                    if bs >= 0.0 and params.get_str(
                            "bump_shader", "") == name:
                        row["bump_strength"] = bs
                    # record the mapper's coordinate transform (first use
                    # wins; reference allows per-use mappers — noted)
                    if ti not in texture_mappers:
                        texture_mappers[ti] = (
                            nd.get_str("texco", "uv"),
                            nd.get_str("mapping", "plain"),
                            tuple(nd.get_point("scale", (1.0, 1.0, 1.0))),
                            tuple(nd.get_point("offset", (0.0, 0.0, 0.0))),
                        )
            elif ntype in ("layer", "mix"):
                for src_key in ("input", "upper_layer", "layer_input"):
                    src = nd.get_str(src_key, "")
                    if src in node_to_tex:
                        node_to_tex[name] = node_to_tex[src]
                        # record the layer's blend mode / colorfac; applied
                        # when mixing the texture over the material's base
                        # parameter (reference layernode.cc blend modes)
                        row["tex_blend_mode"] = _BLEND_MODES.get(
                            nd.get_str("blend_mode",
                                       nd.get_str("mode", "mix")), 0)
                        row["tex_colorfac"] = nd.get_float("colfac",
                                                           nd.get_float(
                                                               "colorfac",
                                                               1.0))
                        break

    for slot, key in (
        ("tex_diffuse", "diffuse_shader"), ("tex_glossy", "glossy_shader"),
        ("tex_bump", "bump_shader"), ("tex_mirror", "mirror_color_shader"),
        ("tex_transparency", "transparency_shader"),
        ("tex_translucency", "translucency_shader"),
        ("tex_blend", "blend_shader"), ("tex_mask", "mask_shader"),
        ("tex_sigma_oren", "sigma_oren_shader"),
        ("tex_ior", "IOR_shader"),
    ):
        sh = params.get_str(key, "")
        if not sh:
            continue
        if sh in node_to_tex:
            row[slot] = node_to_tex[sh]
        elif sh in tex_name_to_id:  # direct texture reference
            row[slot] = tex_name_to_id[sh]
        else:
            log.warning("material: shader %r for %s not resolvable to a "
                        "texture; ignored", sh, key)

    # full node-DAG compilation (textures/nodes.py): when the scene layer
    # provides a program registry, trace the material's shader graph into
    # a static NodeProgram — arbitrary node-on-node chains with the full
    # blend-mode set (the legacy tex_* slot resolution above remains for
    # bump mapping and as the fallback)
    if node_programs is not None:
        from ..textures.nodes import parse_node_graph

        slot_refs = {k: params.get_str(k, "") for k in (
            "diffuse_shader", "glossy_shader", "mirror_color_shader",
            "transparency_shader", "translucency_shader", "blend_shader",
            "mask_shader", "sigma_oren_shader", "IOR_shader")}
        if any(slot_refs.values()):
            prog = parse_node_graph(params.get_list("__list__", []),
                                    tex_name_to_id, slot_refs)
            if prog is not None:
                row["node_prog"] = len(node_programs)
                node_programs.append(prog)
    return row
