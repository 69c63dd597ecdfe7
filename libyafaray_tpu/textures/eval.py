"""Device-side texture evaluation — the `initBSDF` analog.

Reference flow (SURVEY §2.4): material_t::initBSDF evaluates the shader-
node stack once per hit into per-thread userdata; eval/sample read from it.
TPU flow: after gathering the per-lane material row, `apply_textures`
overrides textured parameters (diffuse/glossy/mirror colors, transparency/
translucency/blend scalars) from the scene's texture arrays, and
`bump_normal` perturbs the shading normal from the bump slot's gradient.
Dispatch is a static loop over the scene's textures with lane masks (few
textures per scene; masked VPU selects beat a gather-scatter sort).

Image sampling: bilinear with repeat wrapping (reference imagetex.cc
interpolation bilinear default; mipmap/EWA are a later stage).  Procedural
textures (clouds/marble/wood/...) evaluate analytically in
textures/procedural.py through the same `sample_texture` entry.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.color import luminance


def _blend(base, tex, mode, fac):
    """Layer-node blend of texture over the material's base parameter
    (reference layernode.cc modes); mode (N,) int, fac (N,)."""
    f = fac[..., None]
    one = 1.0
    outs = [
        base * (one - f) + tex * f,                      # 0 mix
        base + tex * f,                                  # 1 add
        base - tex * f,                                  # 2 sub
        base * ((one - f) + tex * f),                    # 3 mul
        one - (one - base) * (one - tex * f),            # 4 screen
        base * (one - f) + jnp.abs(base - tex) * f,      # 5 difference
        jnp.minimum(base, tex * f + base * (one - f)),   # 6 darken
        jnp.maximum(base, tex * f),                      # 7 lighten
        base * (one - f) + f * base / jnp.maximum(tex, 1e-4),  # 8 divide
        jnp.where(base < 0.5,                            # 9 overlay
                  2.0 * base * (tex * f + base * (one - f)),
                  one - 2.0 * (one - base) * (one - (tex * f
                                                     + base * (one - f)))),
    ]
    out = outs[0]
    for i in range(1, len(outs)):
        out = jnp.where((mode == i)[..., None], outs[i], out)
    return jnp.clip(out, 0.0, None)


def sample_image_bilinear(img, u, v):
    """img (H,W,3); u,v (N,) in repeat-wrapped uv space. -> (N,3)."""
    h, w = img.shape[0], img.shape[1]
    u = u % 1.0
    v = v % 1.0
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = (x0 + 1) % w
    y1 = (y0 + 1) % h
    x0 = x0 % w
    y0 = y0 % h
    c00 = img[y0, x0]
    c10 = img[y0, x1]
    c01 = img[y1, x0]
    c11 = img[y1, x1]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def _catmull_rom_w(f):
    """Catmull-Rom weights for fractional offset f (N,): returns 4 weights
    for taps at -1, 0, +1, +2."""
    f2 = f * f
    f3 = f2 * f
    w0 = -0.5 * f3 + f2 - 0.5 * f
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
    w3 = 0.5 * f3 - 0.5 * f2
    return w0, w1, w2, w3


def sample_image_bicubic(img, u, v):
    """Catmull-Rom bicubic sampling with repeat wrap (reference
    imagetex.cc interpolate="bicubic"); exact at texel centers, linear
    precision on ramps."""
    h, w = img.shape[0], img.shape[1]
    x = (u % 1.0) * w - 0.5
    y = (v % 1.0) * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    wx = _catmull_rom_w(fx)
    wy = _catmull_rom_w(fy)
    out = 0.0
    for j in range(4):
        yj = (y0 + (j - 1)) % h
        rowv = 0.0
        for i in range(4):
            xi = (x0 + (i - 1)) % w
            rowv = rowv + wx[i][..., None] * img[yj, xi]
        out = out + wy[j][..., None] * rowv
    return out


def sample_image_nearest(img, u, v):
    """Nearest-texel sampling (reference interpolate="none")."""
    h, w = img.shape[0], img.shape[1]
    x = (jnp.floor((u % 1.0) * w).astype(jnp.int32)) % w
    y = (jnp.floor((v % 1.0) * h).astype(jnp.int32)) % h
    return img[y, x]


def _bilinear_in_level(atlas, y0, lh, lw, u, v):
    """Bilinear with repeat wrap inside one atlas sub-rectangle; the
    level geometry (y0, lh, lw) is PER-LANE (N,) so adjacent lanes can
    read different mip levels."""
    x = (u % 1.0) * lw - 0.5
    y = (v % 1.0) * lh - 0.5
    x0 = jnp.floor(x)
    yy0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - yy0)[..., None]
    x0 = x0.astype(jnp.int32)
    yy0 = yy0.astype(jnp.int32)
    x1 = (x0 + 1) % lw
    y1 = (yy0 + 1) % lh
    x0 = x0 % lw
    yy0 = yy0 % lh
    c00 = atlas[y0 + yy0, x0]
    c10 = atlas[y0 + yy0, x1]
    c01 = atlas[y0 + y1, x0]
    c11 = atlas[y0 + y1, x1]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def sample_image_trilinear(atlas, levels: tuple, u, v, lod):
    """Mipmap-trilinear sampling from the vertical atlas (reference
    imagetex.cc mipmap_trilinear; SURVEY §2.5).  `levels` is the static
    (y0, h, w) table from factory.mip_level_meta; `lod` (N,) fractional
    mip level (0 = full res)."""
    n_lv = len(levels)
    y0s = jnp.asarray([lv[0] for lv in levels], jnp.int32)
    hs = jnp.asarray([lv[1] for lv in levels], jnp.int32)
    ws = jnp.asarray([lv[2] for lv in levels], jnp.int32)
    lod = jnp.clip(lod, 0.0, float(n_lv - 1))
    k0 = jnp.floor(lod).astype(jnp.int32)
    k1 = jnp.minimum(k0 + 1, n_lv - 1)
    fr = (lod - k0.astype(jnp.float32))[..., None]
    c0 = _bilinear_in_level(atlas, y0s[k0], hs[k0], ws[k0], u, v)
    c1 = _bilinear_in_level(atlas, y0s[k1], hs[k1], ws[k1], u, v)
    return c0 * (1.0 - fr) + c1 * fr


EWA_TAPS = 4        # trilinear probes along the major footprint axis
EWA_MAX_ANISO = 8.0  # cap on the major/minor stretch (cost + stability)


def _ewa_uv_axes(sp):
    """Anisotropic uv footprint of the ray-cone at the hit (the
    cone+slope-Jacobian design from VERDICT r2 next-step #7).

    The cone cross-section is a disk of radius fp; on the surface it
    stretches to an ellipse with minor radius fp (perpendicular to the
    projected view direction) and major radius fp/cosθ along it.  The
    world axes map to uv through the dual basis of (dPdU, dPdV).
    Returns (duv_major (N,2), duv_minor (N,2)) in base uv units.
    """
    ng = sp["ng"]
    d = sp["view"]
    fp = sp["fp"]
    cosi = jnp.abs(jnp.sum(d * ng, axis=-1))
    d_t = d - jnp.sum(d * ng, axis=-1, keepdims=True) * ng
    lt = jnp.linalg.norm(d_t, axis=-1, keepdims=True)
    # at normal incidence the footprint is isotropic; any tangent works
    fallback = sp["dpdu"] - jnp.sum(
        sp["dpdu"] * ng, axis=-1, keepdims=True) * ng
    fallback = fallback / jnp.maximum(
        jnp.linalg.norm(fallback, axis=-1, keepdims=True), 1e-9)
    dir_t = jnp.where(lt > 1e-6, d_t / jnp.maximum(lt, 1e-9), fallback)
    stretch = jnp.minimum(1.0 / jnp.maximum(cosi, 1e-3), EWA_MAX_ANISO)
    a_maj = dir_t * (fp * stretch)[..., None]
    a_min = jnp.cross(ng, dir_t) * fp[..., None]

    # world -> uv via the metric inverse: [du dv] = G^-1 [a.dPdU a.dPdV]
    du_ = sp["dpdu"]
    dv_ = sp["dpdv"]
    g11 = jnp.sum(du_ * du_, axis=-1)
    g12 = jnp.sum(du_ * dv_, axis=-1)
    g22 = jnp.sum(dv_ * dv_, axis=-1)
    det = jnp.maximum(g11 * g22 - g12 * g12, 1e-20)

    def to_uv(a):
        b1 = jnp.sum(a * du_, axis=-1)
        b2 = jnp.sum(a * dv_, axis=-1)
        return jnp.stack([(g22 * b1 - g12 * b2) / det,
                          (g11 * b2 - g12 * b1) / det], axis=-1)

    duv1 = to_uv(a_maj)
    duv2 = to_uv(a_min)
    # the uv mapping can swap which axis is longer
    l1 = jnp.sum(duv1 * duv1, axis=-1)
    l2 = jnp.sum(duv2 * duv2, axis=-1)
    swap = (l2 > l1)[..., None]
    return (jnp.where(swap, duv2, duv1), jnp.where(swap, duv1, duv2))


def sample_image_ewa(atlas, levels: tuple, u, v, duv_major, duv_minor,
                     taps: int = EWA_TAPS):
    """Anisotropic filtering: `taps` trilinear probes spread along the
    major footprint axis, LOD chosen from the MINOR axis (reference
    imagetex.cc EWA role; implemented as the standard multi-probe
    approximation of the EWA ellipse integral — exact EWA's per-texel
    gaussian loop is hostile to lockstep lanes, probes are within a few
    % for aniso <= 8 and vectorize perfectly)."""
    w0 = levels[0][2]
    min_len = jnp.linalg.norm(duv_minor, axis=-1)
    maj_len = jnp.linalg.norm(duv_major, axis=-1)
    lod = jnp.log2(jnp.maximum(min_len * w0 * 2.0, 1.0))
    # probe centers cover the part of the major axis the minor-sized
    # probes don't already cover
    span = jnp.maximum(maj_len - min_len, 0.0) / jnp.maximum(maj_len,
                                                             1e-12)
    out = 0.0
    for k in range(taps):
        f = ((k + 0.5) / taps - 0.5) * 2.0
        off = duv_major * (f * span)[..., None]
        out = out + sample_image_trilinear(
            atlas, levels, u + off[..., 0], v + off[..., 1], lod)
    return out / taps


def _mapped_coords(static, ti: int, sp, mapping_over=None):
    """Apply the texture_mapper transform (reference textureMapper_t):
    texco (uv/global/object/orco), scale/offset, and for 3-D coords the
    projection (plain/sphere/tube) to 2-D uv.  Returns (u, v, p3).
    mapping_over: per-NODE transform (textures/nodes.py) overriding the
    texture's registered default."""
    if mapping_over is not None:
        texco, mapping, scale, offset = mapping_over
    else:
        mappings = getattr(static, "texture_mappings", ())
        texco, mapping, scale, offset = (
            mappings[ti] if ti < len(mappings)
            else ("uv", "plain", (1.0, 1.0, 1.0), (0.0, 0.0, 0.0))
        )
    if texco == "uv":
        u = sp["uv"][..., 0] * scale[0] + offset[0]
        v = sp["uv"][..., 1] * scale[1] + offset[1]
        p3 = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)
        return u, v, p3
    if texco == "window" and sp.get("win") is not None:
        # raster coords of the shading point in [0,1]² (reference
        # textureMapper TXC_WIN; the engine projects every hit through
        # the render camera into sp["win"])
        u = sp["win"][..., 0] * scale[0] + offset[0]
        v = sp["win"][..., 1] * scale[1] + offset[1]
        p3 = jnp.stack([u, v, jnp.zeros_like(u)], axis=-1)
        return u, v, p3
    # 3-D coordinate spaces (reference basicnodes.cc textureMapper_t):
    # orco = original (instance-invariant, bbox-normalized) coords,
    # object = the object's local coords, global = world P.  Contexts
    # without the orco gather (scene doesn't need it) fall back to P.
    if texco == "orco" and sp.get("orco") is not None:
        base = sp["orco"]
    elif texco == "object" and sp.get("local") is not None:
        base = sp["local"]
    else:
        base = sp["p"]
    p3 = base * jnp.asarray(scale, jnp.float32) + jnp.asarray(
        offset, jnp.float32)
    if mapping in ("sphere",):
        d = p3 / jnp.maximum(
            jnp.linalg.norm(p3, axis=-1, keepdims=True), 1e-9)
        u = 0.5 + jnp.arctan2(d[..., 1], d[..., 0]) / (2.0 * jnp.pi)
        v = 0.5 - jnp.arcsin(jnp.clip(d[..., 2], -1, 1)) / jnp.pi
    elif mapping in ("tube",):
        u = 0.5 + jnp.arctan2(p3[..., 1], p3[..., 0]) / (2.0 * jnp.pi)
        v = p3[..., 2] * 0.5 + 0.5
    elif mapping in ("cube",):
        # dominant-axis projection
        ax = jnp.argmax(jnp.abs(p3), axis=-1)
        u = jnp.where(ax == 0, p3[..., 1],
                      jnp.where(ax == 1, p3[..., 0], p3[..., 0]))
        v = jnp.where(ax == 2, p3[..., 1], p3[..., 2])
        u = u * 0.5 + 0.5
        v = v * 0.5 + 0.5
    else:  # plain
        u = p3[..., 0] * 0.5 + 0.5
        v = 0.5 - p3[..., 1] * 0.5
    return u, v, p3


def apply_color_ramp(val, ramp):
    """Map texture intensity through a colorband (reference
    color_ramp.h colorRamp_t::getColorInterpolated): stops are
    (position, r, g, b), STATIC per texture; linear or constant
    interpolation, clamped at the ends."""
    mode, items = ramp
    if len(items) == 1:
        c = jnp.asarray(items[0][1:4], jnp.float32)
        return jnp.broadcast_to(c, val.shape)
    inten = luminance(val)
    pos = jnp.asarray([it[0] for it in items], jnp.float32)
    cols = jnp.asarray([it[1:4] for it in items], jnp.float32)
    idx = jnp.clip(jnp.searchsorted(pos, inten, side="right") - 1,
                   0, len(items) - 2)
    p0 = pos[idx]
    p1 = pos[idx + 1]
    t = jnp.clip((inten - p0) / jnp.maximum(p1 - p0, 1e-9), 0.0, 1.0)
    if mode.startswith("constant"):
        t = jnp.zeros_like(t)
    out = cols[idx] * (1.0 - t[..., None]) + cols[idx + 1] * t[..., None]
    out = jnp.where((inten <= pos[0])[..., None], cols[0], out)
    out = jnp.where((inten >= pos[-1])[..., None], cols[-1], out)
    return out


def _sample_image_windowed(img, u, v, win, sampler=None):
    """Image sampling with the imagetex.cc uv window: rot90,
    xrepeat/yrepeat tiling, clipping mode, crop remap.  Outside-window
    lanes return black for clip/clipcube and for skipped checker tiles.
    `sampler(u, v)` overrides the default bilinear lookup (used by the
    mipmap-trilinear and nearest interpolation modes)."""
    if sampler is None:
        sampler = lambda uu, vv: sample_image_bilinear(img, uu, vv)
    if win is None:
        return sampler(u, v)
    xrep, yrep, crop, clip, rot90, even_tiles, odd_tiles = win
    if rot90:
        u, v = v, u
    u = u * xrep
    v = v * yrep
    inside = None
    if clip in ("clip", "clipcube"):
        inside = ((u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0))
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0)
    elif clip == "extend":
        u = jnp.clip(u, 0.0, 1.0 - 1e-6)
        v = jnp.clip(v, 0.0, 1.0 - 1e-6)
    elif clip == "checker":
        tile_odd = ((jnp.floor(u) + jnp.floor(v)).astype(jnp.int32) & 1) \
            == 1
        show = jnp.where(tile_odd, odd_tiles, even_tiles)
        inside = show
    # repeat (default): wrap handled by sample_image_bilinear
    u = u % 1.0
    v = v % 1.0
    if crop is not None:
        cx0, cy0, cx1, cy1 = crop
        u = cx0 + u * (cx1 - cx0)
        v = cy0 + v * (cy1 - cy0)
    out = sampler(u, v)
    if inside is not None:
        out = out * inside[..., None].astype(jnp.float32)
    return out


def sample_texture_mapped(scene_arrays, static, ti: int, sp, mapping):
    """Texture eval with an explicit per-node mapper transform
    (textures/nodes.py texture_mapper nodes)."""
    return sample_texture(scene_arrays, static, ti, sp,
                          mapping_over=mapping)


def sample_texture(scene_arrays, static, ti: int, sp, mapping_over=None):
    """Evaluate texture `ti` (static) at the surface points. -> (N,3).

    Interpolation (reference imagetex.cc, SURVEY §2.5): bilinear default;
    "none" = nearest; "mipmap_trilinear" uses the ray-cone footprint
    sp["fp"] (world units) × per-triangle uv density for a fractional
    mip level from the precomputed atlas; "mipmap_ewa" builds the full
    anisotropic uv ellipse from dPdU/dPdV + the view slope and averages
    trilinear probes along its major axis (sample_image_ewa).
    """
    spec = static.textures[ti]
    u, v, p3 = _mapped_coords(static, ti, sp, mapping_over)
    ramp = spec[2] if len(spec) > 2 else None
    if spec[0] == "image":
        img = scene_arrays[f"tex_{ti}"]
        win = spec[1] if len(spec) > 1 else None
        interp = spec[3] if len(spec) > 3 else "bilinear"
        mips = spec[4] if len(spec) > 4 else None
        sampler = None
        if interp == "none":
            sampler = lambda uu, vv: sample_image_nearest(img, uu, vv)
        elif interp == "bicubic":
            sampler = lambda uu, vv: sample_image_bicubic(img, uu, vv)
        elif (interp.startswith("mipmap") and mips is not None
                and sp.get("fp") is not None
                and f"mip_{ti}" in scene_arrays):
            # uv footprint: cone width × triangle uv-per-world density ×
            # the mapper's uv scale; window tiling folds in statically
            mappings = getattr(static, "texture_mappings", ())
            mscale = (mappings[ti][2] if ti < len(mappings)
                      else (1.0, 1.0, 1.0))
            if mapping_over is not None:
                mscale = mapping_over[2]
            s_win = 1.0
            if win is not None:
                s_win = float(max(abs(win[0]), abs(win[1]), 1))
            atlas = scene_arrays[f"mip_{ti}"]
            if (interp == "mipmap_ewa" and sp.get("dpdu") is not None
                    and sp.get("view") is not None):
                # anisotropic: per-lane uv ellipse from the true surface
                # derivatives (closes the r2 "EWA silently = trilinear"
                # gap; scaled into final uv space per the mapper/window)
                duv_maj, duv_min = _ewa_uv_axes(sp)
                sc = jnp.asarray([mscale[0] * s_win, mscale[1] * s_win],
                                 jnp.float32)
                duv_maj = duv_maj * sc
                duv_min = duv_min * sc
                sampler = lambda uu, vv: sample_image_ewa(
                    atlas, mips, uu, vv, duv_maj, duv_min)
            else:
                s_map = max(abs(mscale[0]), abs(mscale[1]), 1e-6)
                uv_fp = sp["fp"] * sp["uv_density"] * (s_map * s_win)
                texels = uv_fp * mips[0][2]
                lod = jnp.log2(jnp.maximum(texels, 1.0))
                sampler = lambda uu, vv: sample_image_trilinear(
                    atlas, mips, uu, vv, lod)
        out = _sample_image_windowed(img, u, v, win, sampler)
    else:
        from .procedural import eval_procedural

        out = eval_procedural(spec, p3, jnp.stack([u, v], axis=-1))
    if ramp is not None:
        out = apply_color_ramp(out, ramp)
    return out


def apply_textures(scene_arrays, static, row, sp):
    """Override textured material parameters per lane (initBSDF analog)."""
    if not getattr(static, "textures", ()):
        return row
    row = dict(row)
    slots_color = (("tex_diffuse", "diffuse_color"),
                   ("tex_glossy", "glossy_color"),
                   ("tex_mirror", "mirror_color"))
    slots_scalar = (("tex_transparency", "transparency"),
                    ("tex_translucency", "translucency"),
                    ("tex_blend", "blend_value"),
                    # mask_mat's mask texture: its value IS the per-lane
                    # blend_value that _blend_factor thresholds
                    # (reference maskmat.cc)
                    ("tex_mask", "blend_value"),
                    ("tex_sigma_oren", "sigma"),
                    # IOR_shader (reference shinydiff [M]): the shader's
                    # scalar value IS the per-lane fresnel IOR
                    ("tex_ior", "ior"))
    for ti in range(len(static.textures)):
        tex_val = None  # lazily evaluated per texture

        def val():
            nonlocal tex_val
            if tex_val is None:
                tex_val = sample_texture(scene_arrays, static, ti, sp)
            return tex_val

        for slot, target in slots_color:
            mask = row[slot] == ti
            blended = _blend(row[target], val(), row["tex_blend_mode"],
                             row["tex_colorfac"])
            row[target] = jnp.where(mask[..., None], blended, row[target])
        for slot, target in slots_scalar:
            mask = row[slot] == ti
            row[target] = jnp.where(mask, luminance(val()), row[target])

    # compiled node-DAG programs override the legacy slot resolution for
    # materials that have one (textures/nodes.py; arbitrary node-on-node
    # graphs with the full blend-mode set)
    progs = getattr(static, "node_programs", ())
    if progs:
        from .nodes import eval_node_program

        slot_targets = {
            "diffuse_shader": ("diffuse_color", False),
            "glossy_shader": ("glossy_color", False),
            "mirror_color_shader": ("mirror_color", False),
            "transparency_shader": ("transparency", True),
            "translucency_shader": ("translucency", True),
            "blend_shader": ("blend_value", True),
            "mask_shader": ("blend_value", True),
            "sigma_oren_shader": ("sigma", True),
            "IOR_shader": ("ior", True),
        }
        for pi, prog in enumerate(progs):
            mask = row["node_prog"] == pi
            vals = eval_node_program(scene_arrays, static, prog, sp)
            for slot, col in vals.items():
                tgt = slot_targets.get(slot)
                if tgt is None:
                    continue
                key, scalar = tgt
                if scalar:
                    row[key] = jnp.where(mask, luminance(col), row[key])
                else:
                    row[key] = jnp.where(mask[..., None], col, row[key])
    return row


def bump_normal(scene_arrays, static, row, sp, strength: float = 0.02):
    """Perturb shading normals from the bump slot via central differences
    of the texture (reference nodematerial evalDerivative bump).  The
    per-material row["bump_strength"] (reference textureMapper
    bump_strength) scales the fixed derivative-tap normalization."""
    if not getattr(static, "textures", ()):
        return sp["n"]
    n = sp["n"]
    from ..core import math as vmath

    for ti in range(len(static.textures)):
        mask = row["tex_bump"] == ti
        spec = static.textures[ti]
        if spec[0] != "image":
            continue
        img = scene_arrays[f"tex_{ti}"]
        h, w = img.shape[0], img.shape[1]
        u, v = sp["uv"][..., 0], sp["uv"][..., 1]
        du = 1.0 / w
        dv = 1.0 / h
        f0 = luminance(sample_image_bilinear(img, u, v))
        fu = luminance(sample_image_bilinear(img, u + du, v))
        fv = luminance(sample_image_bilinear(img, u, v + dv))
        # perturb along the TRUE uv tangent directions when the surface
        # carries them (sp["dpdu"]/["dpdv"], scene/scene.py) so bump
        # ridges follow the texture's u/v axes; ONB fallback otherwise
        if sp.get("dpdu") is not None:
            du_p = sp["dpdu"] - n * vmath.dot(n, sp["dpdu"])[..., None]
            dl = jnp.linalg.norm(du_p, axis=-1, keepdims=True)
            onb_u, onb_v = vmath.build_onb(n)
            tu = jnp.where(dl > 1e-9, du_p / jnp.maximum(dl, 1e-9), onb_u)
            tv_c = jnp.cross(n, tu)
            # keep the uv handedness of dPdV
            hand = jnp.sign(vmath.dot(tv_c, sp["dpdv"]))[..., None]
            tv = jnp.where(dl > 1e-9, tv_c * jnp.where(hand == 0.0, 1.0,
                                                       hand), onb_v)
        else:
            tu, tv = vmath.build_onb(n)
        grad_u = (fu - f0) / du
        grad_v = (fv - f0) / dv
        str_l = (strength * row["bump_strength"])[..., None]
        n_b = vmath.normalize(
            n - str_l * (grad_u[..., None] * tu + grad_v[..., None] * tv)
        )
        n = jnp.where(mask[..., None], n_b, n)
    return n
