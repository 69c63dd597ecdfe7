"""Shader-node DAG compiler + evaluator.

Reference roles (SURVEY §2.4): src/yafraycore/nodematerial.cc (topo-sorts
the node DAG, evaluates it per hit into per-thread userdata) and
src/textures/layernode.cc (~18 Blender blend modes with colorfac /
negative / no_rgb / stencil knobs, upper/input chaining).

TPU-native design (SURVEY §7.0): the DAG is STATIC per material, so scene
compile freezes it into a hashable `NodeProgram` (topo-ordered node
tuple + slot bindings) that the shading stage interprets with a static
Python loop — the whole program traces into the jaxpr, XLA fuses it, and
per-lane cost is pure VPU arithmetic.  Each node produces an (N, 3)
color and an (N,) alpha/stencil factor.

Node types: texture_mapper (per-node texco/mapping/scale/offset +
texture lookup), layer/mix (full blend-mode set below), value / color
constants.
"""
from __future__ import annotations

import logging
from typing import NamedTuple

import jax.numpy as jnp

from ..core.color import luminance

log = logging.getLogger("libyafaray_tpu")

# layernode.cc mode table (Blender names)
BLEND_MODES = {
    "mix": 0, "add": 1, "sub": 2, "subtract": 2, "mul": 3, "multiply": 3,
    "screen": 4, "difference": 5, "diff": 5, "darken": 6, "dark": 6,
    "lighten": 7, "light": 7, "divide": 8, "div": 8, "overlay": 9,
    "hue": 10, "saturation": 11, "sat": 11, "value": 12, "val": 12,
    "color": 13, "burn": 14, "dodge": 15,
}


class NodeSpec(NamedTuple):
    name: str
    ntype: str          # "texture_mapper" | "layer" | "value" | "color"
    tex_id: int         # texture index (mapper) else -1
    mapping: tuple      # (texco, mapping, scale, offset) for mappers
    inp: int            # node index of the lower/input layer (-1 none)
    upper: int          # node index of the upper layer / mapper (-1 none)
    mode: int           # blend mode (layer)
    colorfac: float
    negative: bool
    no_rgb: bool        # use upper's intensity, not its color
    stencil: bool       # upper's alpha masks what lower layers see
    use_alpha: bool
    const: tuple        # rgb for color/value nodes
    default_val: float


class NodeProgram(NamedTuple):
    nodes: tuple        # topo-ordered tuple[NodeSpec]
    slots: tuple        # tuple[(slot_name, node_index)]


def _rgb_to_hsv(c):
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe = jnp.maximum(d, 1e-12)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    ) / 6.0
    h = jnp.where(d < 1e-12, 0.0, h % 1.0)
    s = jnp.where(mx > 1e-12, d / jnp.maximum(mx, 1e-12), 0.0)
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    h6 = (h % 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def blend_layer(base, tex, mode: int, fac):
    """One blend mode applied STATICALLY (mode is a python int — each
    layer node bakes exactly its own mode into the jaxpr, unlike the
    legacy per-lane `_blend` select chain).  base/tex (N,3), fac (N,)."""
    f = fac[..., None]
    if mode == 0:       # mix
        out = base * (1.0 - f) + tex * f
    elif mode == 1:     # add
        out = base + tex * f
    elif mode == 2:     # sub
        out = base - tex * f
    elif mode == 3:     # mul
        out = base * ((1.0 - f) + tex * f)
    elif mode == 4:     # screen
        out = 1.0 - (1.0 - base) * (1.0 - tex * f)
    elif mode == 5:     # difference
        out = base * (1.0 - f) + jnp.abs(base - tex) * f
    elif mode == 6:     # darken
        out = jnp.minimum(base, tex * f + base * (1.0 - f))
    elif mode == 7:     # lighten
        out = jnp.maximum(base, tex * f)
    elif mode == 8:     # divide
        out = base * (1.0 - f) + f * base / jnp.maximum(tex, 1e-4)
    elif mode == 9:     # overlay
        mixed = tex * f + base * (1.0 - f)
        out = jnp.where(base < 0.5, 2.0 * base * mixed,
                        1.0 - 2.0 * (1.0 - base) * (1.0 - mixed))
    elif mode == 10:    # hue (take tex hue where it has saturation)
        th, ts, _ = _rgb_to_hsv(tex)
        bh, bs, bv = _rgb_to_hsv(base)
        res = _hsv_to_rgb(th, bs, bv)
        res = jnp.where((ts > 1e-6)[..., None], res, base)
        out = base * (1.0 - f) + res * f
    elif mode == 11:    # saturation
        th, ts, tv = _rgb_to_hsv(tex)
        bh, bs, bv = _rgb_to_hsv(base)
        res = _hsv_to_rgb(bh, ts, bv)
        res = jnp.where((bs > 1e-6)[..., None], res, base)
        out = base * (1.0 - f) + res * f
    elif mode == 12:    # value
        _, _, tv = _rgb_to_hsv(tex)
        bh, bs, _ = _rgb_to_hsv(base)
        res = _hsv_to_rgb(bh, bs, tv)
        out = base * (1.0 - f) + res * f
    elif mode == 13:    # color (hue + saturation from tex)
        th, ts, _ = _rgb_to_hsv(tex)
        _, _, bv = _rgb_to_hsv(base)
        res = _hsv_to_rgb(th, ts, bv)
        res = jnp.where((ts > 1e-6)[..., None], res, base)
        out = base * (1.0 - f) + res * f
    elif mode == 14:    # burn
        out = 1.0 - (1.0 - base) / jnp.maximum(tex * f + (1.0 - f), 1e-4)
    elif mode == 15:    # dodge
        out = base / jnp.maximum(1.0 - tex * f, 1e-4)
    else:
        out = base * (1.0 - f) + tex * f
    return jnp.clip(out, 0.0, None)


def parse_node_graph(nodes_params, tex_name_to_id, slots: dict):
    """<list_element> node list + material slot references -> NodeProgram
    (or None when the material has no resolvable nodes).  slots:
    slot_name -> shader node/texture name."""
    from ..scene.params import ParamMap

    raw = {}
    order = []
    for nd in nodes_params:
        nd = ParamMap(nd) if not isinstance(nd, ParamMap) else nd
        name = nd.get_str("name", "")
        if not name:
            continue
        raw[name] = nd
        order.append(name)

    specs: list[NodeSpec] = []
    index: dict[str, int] = {}

    def build(name: str, depth=0):
        if name in index:
            return index[name]
        if depth > 32 or name not in raw:
            return -1
        nd = raw[name]
        ntype = nd.get_str("type", "")
        if ntype in ("texture_mapper", "texture"):
            t = nd.get_str("texture", "")
            ti = tex_name_to_id.get(t, -1)
            if ti < 0:
                log.warning("node %r: unknown texture %r", name, t)
                return -1
            spec = NodeSpec(
                name=name, ntype="texture_mapper", tex_id=ti,
                mapping=(nd.get_str("texco", "uv"),
                         nd.get_str("mapping", "plain"),
                         tuple(nd.get_point("scale", (1.0, 1.0, 1.0))),
                         tuple(nd.get_point("offset", (0.0, 0.0, 0.0)))),
                inp=-1, upper=-1, mode=0, colorfac=1.0, negative=False,
                no_rgb=False, stencil=False, use_alpha=False,
                const=(0.0, 0.0, 0.0), default_val=0.0)
        elif ntype in ("layer", "mix"):
            upper_name = nd.get_str("input", "")
            inp_name = nd.get_str("upper_layer", "")
            # reference layer node: `input` = the mapper/texture feeding
            # this layer, `upper_layer` = the previous layer below it
            upper = build(upper_name, depth + 1)
            inp = build(inp_name, depth + 1) if inp_name else -1
            mode = BLEND_MODES.get(
                nd.get_str("blend_mode", nd.get_str("mode", "mix")), 0)
            def_col = nd.get_color("def_col", (1.0, 1.0, 1.0, 1.0))
            spec = NodeSpec(
                name=name, ntype="layer", tex_id=-1, mapping=(),
                inp=inp, upper=upper, mode=mode,
                colorfac=nd.get_float("colfac",
                                      nd.get_float("colorfac", 1.0)),
                negative=nd.get_bool("negative", False),
                no_rgb=nd.get_bool("noRGB", nd.get_bool("no_rgb", False)),
                stencil=nd.get_bool("stencil", False),
                use_alpha=nd.get_bool("use_alpha", False),
                const=tuple(def_col[:3]),
                default_val=nd.get_float("def_val", 1.0))
            if upper < 0:
                return inp
        elif ntype in ("value", "float"):
            v = nd.get_float("value", nd.get_float("val", 0.0))
            spec = NodeSpec(name=name, ntype="color", tex_id=-1,
                            mapping=(), inp=-1, upper=-1, mode=0,
                            colorfac=1.0, negative=False, no_rgb=False,
                            stencil=False, use_alpha=False,
                            const=(v, v, v), default_val=v)
        elif ntype in ("color", "rgb"):
            c = nd.get_color("color", (0.0, 0.0, 0.0, 1.0))
            spec = NodeSpec(name=name, ntype="color", tex_id=-1,
                            mapping=(), inp=-1, upper=-1, mode=0,
                            colorfac=1.0, negative=False, no_rgb=False,
                            stencil=False, use_alpha=False,
                            const=tuple(c[:3]), default_val=float(c[0]))
        else:
            log.warning("node %r: unknown type %r; skipped", name, ntype)
            return -1
        specs.append(spec)
        index[name] = len(specs) - 1
        return index[name]

    bound = []
    for slot, ref in slots.items():
        if not ref:
            continue
        if ref in raw:
            idx = build(ref)
        elif ref in tex_name_to_id:
            # bare texture reference: synthesize an implicit uv mapper
            nm = f"__tex_{ref}"
            if nm in index:
                idx = index[nm]
            else:
                specs.append(NodeSpec(
                    name=nm, ntype="texture_mapper",
                    tex_id=tex_name_to_id[ref],
                    mapping=("uv", "plain", (1.0, 1.0, 1.0),
                             (0.0, 0.0, 0.0)),
                    inp=-1, upper=-1, mode=0, colorfac=1.0,
                    negative=False, no_rgb=False, stencil=False,
                    use_alpha=False, const=(0.0, 0.0, 0.0),
                    default_val=0.0))
                index[nm] = len(specs) - 1
                idx = index[nm]
        else:
            log.warning("material: shader %r for %s not resolvable; "
                        "ignored", ref, slot)
            continue
        if idx >= 0:
            bound.append((slot, idx))
    if not bound:
        return None
    return NodeProgram(nodes=tuple(specs), slots=tuple(bound))


def eval_node_program(scene_arrays, static, prog: NodeProgram, sp):
    """Interpret the program for all lanes -> {slot: (N,3)}.

    The static loop unrolls into the jaxpr (initBSDF analog): every node
    computes its color once; layers fold upper-over-input with their
    baked blend mode; stencil layers scale the factor seen downstream.
    """
    from .eval import sample_texture_mapped

    colors: list = []
    facs: list = []
    for spec in prog.nodes:
        if spec.ntype == "texture_mapper":
            col = sample_texture_mapped(scene_arrays, static, spec.tex_id,
                                        sp, spec.mapping)
            colors.append(col)
            facs.append(jnp.ones(col.shape[:-1], jnp.float32))
        elif spec.ntype == "color":
            n = sp["p"].shape[0]
            colors.append(jnp.broadcast_to(
                jnp.asarray(spec.const, jnp.float32), (n, 3)))
            facs.append(jnp.full((n,), spec.default_val, jnp.float32))
        else:  # layer
            upper = colors[spec.upper]
            upper_fac = facs[spec.upper]
            if spec.inp >= 0:
                base = colors[spec.inp]
                base_fac = facs[spec.inp]
            else:
                n = upper.shape[0]
                base = jnp.broadcast_to(
                    jnp.asarray(spec.const, jnp.float32), (n, 3))
                base_fac = jnp.ones((n,), jnp.float32)
            if spec.no_rgb:
                upper = jnp.broadcast_to(luminance(upper)[..., None],
                                         upper.shape)
            if spec.negative:
                upper = 1.0 - upper
            fac = spec.colorfac * upper_fac
            out = blend_layer(base, upper, spec.mode, fac)
            out_fac = base_fac
            if spec.stencil:
                # stencil: upper's intensity masks downstream factors
                out_fac = base_fac * jnp.clip(luminance(upper), 0.0, 1.0)
            colors.append(out)
            facs.append(out_fac)
    return {slot: colors[idx] for slot, idx in prog.slots}
