"""Minimal OpenEXR 2.0 codec — uncompressed float32 scanlines, single- and
multi-part-free multilayer via channel naming (reference: exrHandler.cc
writes all render passes into one multilayer EXR; SURVEY §2.12).

Only the subset needed for render output + reload is implemented:
  * write: float32, compression NONE, channels named `layer.R/G/B`
  * read:  float32/half, compression NONE
"""
from __future__ import annotations

import struct

import numpy as np

_MAGIC = 20000630
_PIXEL_FLOAT = 2  # OpenEXR FLOAT


def _attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + struct.pack("<i", len(data)) + data


def _channel_list(names):
    out = b""
    for n in sorted(names):
        out += n.encode() + b"\0" + struct.pack("<iiii", _PIXEL_FLOAT, 0, 1, 1)
    return out + b"\0"


def write_exr(path: str, img: np.ndarray):
    write_exr_multilayer(path, {"": np.asarray(img, np.float32)})


def write_exr_multilayer(path: str, layers: dict):
    h, w = next(iter(layers.values())).shape[:2]
    chan_names = []
    chan_data = {}
    for lname, arr in layers.items():
        arr = np.asarray(arr, np.float32)
        comps = ["R", "G", "B", "A"][: arr.shape[-1]] if arr.ndim == 3 else ["Y"]
        for ci, c in enumerate(comps):
            full = f"{lname}.{c}" if lname else c
            chan_names.append(full)
            chan_data[full] = arr[..., ci] if arr.ndim == 3 else arr

    header = b""
    header += _attr(b"channels", b"chlist", _channel_list(chan_names))
    header += _attr(b"compression", b"compression", b"\0")  # NONE
    header += _attr(b"dataWindow", b"box2i",
                    struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr(b"displayWindow", b"box2i",
                    struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr(b"lineOrder", b"lineOrder", b"\0")  # INCREASING_Y
    header += _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f",
                    struct.pack("<ff", 0.0, 0.0))
    header += _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\0"  # end of header

    sorted_names = sorted(chan_names)
    scan_size = 8 + w * 4 * len(sorted_names)
    table_start = 8 + 1 + len(header) - 1  # magic+version + header
    # compute offsets
    with open(path, "wb") as f:
        f.write(struct.pack("<I", _MAGIC))
        f.write(struct.pack("<I", 2))  # version 2, single part scanline
        f.write(header)
        offset_table_pos = f.tell()
        data_start = offset_table_pos + 8 * h
        offsets = [data_start + y * scan_size for y in range(h)]
        f.write(struct.pack(f"<{h}Q", *offsets))
        for y in range(h):
            f.write(struct.pack("<i", y))
            f.write(struct.pack("<i", w * 4 * len(sorted_names)))
            for cn in sorted_names:
                f.write(chan_data[cn][y].astype("<f4").tobytes())


def read_exr(path: str) -> np.ndarray:
    layers = read_exr_multilayer(path)
    if "" in layers:
        return layers[""]
    return next(iter(layers.values()))


def read_exr_multilayer(path: str) -> dict:
    with open(path, "rb") as f:
        data = f.read()
    magic, _version = struct.unpack_from("<II", data, 0)
    if magic != _MAGIC:
        raise ValueError("not an EXR file")
    pos = 8
    channels = []
    h = w = None
    compression = 0
    while data[pos] != 0:
        name_end = data.index(b"\0", pos)
        name = data[pos:name_end].decode()
        pos = name_end + 1
        type_end = data.index(b"\0", pos)
        typ = data[pos:type_end].decode()
        pos = type_end + 1
        (size,) = struct.unpack_from("<i", data, pos)
        pos += 4
        payload = data[pos:pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while payload[cpos] != 0:
                ce = payload.index(b"\0", cpos)
                cname = payload[cpos:ce].decode()
                ptype = struct.unpack_from("<i", payload, ce + 1)[0]
                channels.append((cname, ptype))
                cpos = ce + 1 + 16
        elif name == "dataWindow":
            x0, y0, x1, y1 = struct.unpack("<iiii", payload)
            w, h = x1 - x0 + 1, y1 - y0 + 1
        elif name == "compression":
            compression = payload[0]
    pos += 1  # header terminator
    if compression != 0:
        raise NotImplementedError("only uncompressed EXR supported in-repo")
    offsets = struct.unpack_from(f"<{h}Q", data, pos)
    chans = sorted(c for c, _ in channels)
    ptypes = dict(channels)
    planes = {c: np.zeros((h, w), np.float32) for c in chans}
    for y, off in enumerate(offsets):
        p = off + 8
        for c in chans:
            if ptypes[c] == _PIXEL_FLOAT:
                planes[c][y] = np.frombuffer(data, "<f4", w, p)
                p += 4 * w
            elif ptypes[c] == 1:  # HALF
                planes[c][y] = np.frombuffer(data, "<f2", w, p).astype(np.float32)
                p += 2 * w
            else:  # UINT
                planes[c][y] = np.frombuffer(data, "<u4", w, p).astype(np.float32)
                p += 4 * w
    # group channels into layers
    layers: dict = {}
    groups: dict = {}
    for c in chans:
        if "." in c:
            lname, comp = c.rsplit(".", 1)
        else:
            lname, comp = "", c
        groups.setdefault(lname, {})[comp] = planes[c]
    for lname, comps in groups.items():
        order = [comps[k] for k in ("R", "G", "B", "A") if k in comps]
        if order:
            layers[lname] = np.stack(order, axis=-1)
        else:
            layers[lname] = next(iter(comps.values()))
    return layers
