"""yafaray-xml compatible CLI (reference src/xml_loader/yafaray_xml.cc).

    python -m libyafaray_tpu.cli.yafaray_xml [options] scene.xml

Flags mirror the reference CLI (SURVEY §2.13): output path/format, threads
(accepted; parallelism is the device mesh here), verbosity, z-buffer,
params badge.  Emits Mrays/s telemetry at the end (driver metric).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="yafaray-xml",
        description="TPU-native renderer with libYafaRay scene compatibility",
    )
    ap.add_argument("input", help="scene XML file")
    ap.add_argument("output", nargs="?", default=None,
                    help="output image (default: <input>.png)")
    ap.add_argument("-f", "--format", default=None,
                    help="output format override (png/jpg/tga/tif/exr/hdr)")
    ap.add_argument("-t", "--threads", type=int, default=-1,
                    help="accepted for CLI parity (device count is used)")
    ap.add_argument("-vl", "--verbosity", default="info",
                    help="console verbosity: mute|error|warning|info|debug")
    ap.add_argument("-z", "--z-channel", action="store_true",
                    help="enable z-buffer pass")
    ap.add_argument("--film", default=None,
                    help="film save/load path for resume")
    ap.add_argument("--badge", action="store_true",
                    help="draw the parameter badge into the output image")
    ap.add_argument("--logs", action="store_true",
                    help="export render log as .txt and .html next to "
                         "the output")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the render")
    ap.add_argument("--json-stats", action="store_true",
                    help="print one-line JSON render stats")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--devices", type=int, default=None, metavar="N",
                    help="accelerators to use (default: all visible; "
                         "1 disables the multi-device film mesh)")
    ap.add_argument("--compile-cache", default="~/.cache/libyafaray_tpu_xla",
                    metavar="DIR",
                    help="persistent XLA compilation cache directory "
                         "('' disables).  On directly-attached TPU "
                         "runtimes this converts repeat invocations to "
                         "steady-state + I/O; remote-compile tunnels "
                         "(axon) ignore it — see PARITY.md")
    args = ap.parse_args(argv)

    if args.compile_cache:
        try:
            import jax

            cache_dir = os.path.expanduser(args.compile_cache)
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:  # noqa: BLE001 - cache is best-effort
            pass

    level = dict(mute=logging.CRITICAL, error=logging.ERROR,
                 warning=logging.WARNING, info=logging.INFO,
                 debug=logging.DEBUG).get(args.verbosity, logging.INFO)
    logging.basicConfig(level=level,
                        format="[%(levelname)s] %(message)s")
    log = logging.getLogger("libyafaray_tpu")

    from ..scene.xml_parser import parse_xml_file
    from ..scene.session import render_scene
    from ..io.image import save_image

    t0 = time.perf_counter()
    if not os.path.isfile(args.input):
        print(f"yafaray-xml: error: scene file not found: {args.input}",
              file=sys.stderr)
        return 2
    try:
        scene = parse_xml_file(args.input)
    except Exception as e:  # noqa: BLE001 - CLI boundary
        print(f"yafaray-xml: error: cannot parse {args.input}: {e}",
              file=sys.stderr)
        return 2
    if args.width:
        scene.render_params["width"] = args.width
    if args.height:
        scene.render_params["height"] = args.height
    if args.z_channel:
        scene.render_params["z_channel"] = True

    from ..utils.observability import RenderLog

    rlog = RenderLog(scene_name=os.path.basename(args.input))
    rlog.set_params("render", dict(scene.render_params))
    for iname, ip in scene.integrator_params.items():
        rlog.set_params(f"integrator:{iname}", dict(ip))

    def progress(p, total):
        rlog.event("info", f"pass {p}/{total}")

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)
    result = render_scene(scene, progress_cb=progress, film_path=args.film,
                          n_devices=args.devices)
    if args.profile:
        import jax

        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", args.profile)

    out = args.output or os.path.splitext(args.input)[0] + ".png"
    if args.format:
        out = os.path.splitext(out)[0] + "." + args.format.lstrip(".")
    passes = result.passes if getattr(result.cfg, "passes", ()) else {}
    if passes and out.lower().endswith(".exr"):
        # multilayer EXR: combined + every pass in one file (reference
        # exrHandler multilayer output)
        from ..io.image import save_multilayer_exr

        layers = {"": result.image}
        if result.alpha is not None:
            layers["alpha"] = result.alpha[..., None]
        layers.update(passes)
        save_multilayer_exr(out, layers)
    else:
        img = result.image
        alpha = result.alpha
        if alpha is not None and getattr(result.cfg, "premult_alpha", False):
            img = img * alpha[..., None]
        if args.badge:
            from ..utils.observability import draw_badge
            from .. import __version__

            img = draw_badge(img, [
                f"libyafaray_tpu {__version__} | {os.path.basename(args.input)}"
                f" | {result.cfg.integrator}",
                f"{result.cfg.width}x{result.cfg.height}"
                f" | AA {result.cfg.aa_passes}x{result.cfg.aa_samples}"
                f" | {result.mrays_per_sec:.1f} Mrays/s",
            ])
        save_image(out, img,
                   color_space=result.cfg.color_space, gamma=result.cfg.gamma,
                   alpha=alpha)
        for name, plane in passes.items():
            base, ext = os.path.splitext(out)
            if plane.shape[-1] == 1:
                plane = np.repeat(plane, 3, axis=-1)
            elif plane.shape[-1] == 2:
                plane = np.concatenate(
                    [plane, np.zeros_like(plane[..., :1])], axis=-1)
            save_image(f"{base}.{name}{ext}", plane,
                       color_space="linear")
    wall = time.perf_counter() - t0
    log.info("wrote %s  [%.2fs total, %.1f Mrays/s]", out, wall,
             result.mrays_per_sec)
    if args.logs:
        base = os.path.splitext(out)[0]
        rlog.event("info", f"wrote {out}")
        rlog.set_params("stats", dict(result.stats))
        rlog.export_txt(base + ".log.txt")
        rlog.export_html(base + ".log.html")
    if args.json_stats:
        print(json.dumps(dict(
            output=out, wall_s=wall, render_s=result.stats["render_s"],
            rays=result.stats["rays"], mrays_per_sec=result.mrays_per_sec,
        )))
    return 0


if __name__ == "__main__":
    sys.exit(main())
