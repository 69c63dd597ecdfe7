"""Image I/O handlers (reference src/image_handlers/* — SURVEY §2.12).

Formats: PNG/JPEG/TGA/TIFF via Pillow/imageio; HDR (RGBE) with an in-repo
codec; EXR via imageio when its plugin is available, else an in-repo
minimal float32 scanline writer/reader (io/exr.py).  Loads decode to LINEAR
float32 (sRGB assumed for LDR, linear for HDR/EXR — App. B color rules);
saves apply the film's output transform before encoding.
"""
from __future__ import annotations

import logging
import os

import numpy as np

log = logging.getLogger("libyafaray_tpu")


def _srgb_to_linear(c):
    c = c.astype(np.float32)
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c):
    c = np.clip(c, 0.0, 1.0)
    return np.where(c <= 0.0031308, c * 12.92,
                    1.055 * np.maximum(c, 1e-8) ** (1.0 / 2.4) - 0.055)


def load_image(path: str, color_space: str = "", gamma: float = 1.0):
    """Load any supported image into linear float32 (H,W,3[4])."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        from .rgbe import read_hdr

        return read_hdr(path)
    if ext == ".exr":
        try:
            import imageio.v3 as iio

            img = iio.imread(path).astype(np.float32)
            return img[..., :3] if img.ndim == 3 else img
        except Exception:
            from .exr import read_exr

            return read_exr(path)

    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGBA" if "A" in im.getbands() else "RGB"),
                         np.float32) / 255.0
    cs = (color_space or "sRGB").lower()
    if cs == "srgb":
        arr[..., :3] = _srgb_to_linear(arr[..., :3])
    elif cs in ("raw_manual_gamma", "raw") and gamma != 1.0:
        arr[..., :3] = np.maximum(arr[..., :3], 0.0) ** gamma
    return arr


def save_image(path: str, img: np.ndarray, color_space: str = "sRGB",
               gamma: float = 1.0, alpha: np.ndarray | None = None):
    """img: (H,W,3) LINEAR float32; transform chosen by extension/params."""
    img = np.asarray(img, np.float32)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        from .rgbe import write_hdr

        write_hdr(path, img)
        return
    if ext == ".exr":
        try:
            import imageio.v3 as iio

            iio.imwrite(path, img.astype(np.float32))
            return
        except Exception:
            from .exr import write_exr

            write_exr(path, img)
            return

    cs = (color_space or "sRGB").lower()
    if cs == "srgb":
        out = _linear_to_srgb(img)
    elif cs in ("raw_manual_gamma", "raw") and gamma != 1.0:
        out = np.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    else:
        out = np.clip(img, 0.0, 1.0)
    u8 = (np.clip(out, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if alpha is not None:
        a8 = (np.clip(alpha, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        u8 = np.concatenate([u8, a8[..., None]], axis=-1)

    from PIL import Image

    Image.fromarray(u8).save(path)


def save_multilayer_exr(path: str, layers: dict):
    """Multilayer EXR (reference's all-passes-in-one-file output).
    layers: name -> (H,W,3) float32.  Uses the in-repo EXR writer."""
    from .exr import write_exr_multilayer

    write_exr_multilayer(path, layers)
