"""Minimal OpenEXR 2.0 codec — single-part scanline files, multilayer via
channel naming (reference: exrHandler.cc writes all render passes into one
multilayer EXR; SURVEY §2.12).

Subset implemented:
  * write: float32 (half for b44/b44a), compression NONE / ZIPS / PXR24 /
    B44 / B44A / PIZ, channels named `layer.R/G/B`
  * read:  float32/half/uint channels; compression NONE, RLE, ZIPS,
    ZIP, PIZ, PXR24, B44 and B44A (io/exr_codecs.py) — everything the
    scanline format allows except DWAA/DWAB.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 20000630
_PIXEL_FLOAT = 2  # OpenEXR FLOAT


def _attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + struct.pack("<i", len(data)) + data


def _unfilter(buf: bytes) -> bytes:
    """Undo the EXR zip/rle byte filter: delta predictor, then re-interleave
    the two halves (ImfZip.cpp uncompress order)."""
    d = np.frombuffer(buf, np.uint8).astype(np.int64)
    n = d.shape[0]
    rec = ((np.cumsum(d) - 128 * np.arange(n)) % 256).astype(np.uint8)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = rec[:half]
    out[1::2] = rec[half:]
    return out.tobytes()


def _filter(buf: bytes) -> bytes:
    """EXR zip byte filter (compress side): de-interleave, then delta."""
    d = np.frombuffer(buf, np.uint8)
    n = d.shape[0]
    half = (n + 1) // 2
    tmp = np.empty(n, np.uint8)
    tmp[:half] = d[0::2]
    tmp[half:] = d[1::2]
    t = tmp.astype(np.int64)
    out = np.empty(n, np.int64)
    out[0] = t[0]
    out[1:] = t[1:] - t[:-1] + 128
    return (out % 256).astype(np.uint8).tobytes()


def _rle_decode(raw: bytes, expect: int) -> bytes:
    src = np.frombuffer(raw, np.int8)
    out = bytearray()
    i, n = 0, len(raw)
    while i < n and len(out) < expect:
        c = int(src[i])
        i += 1
        if c < 0:  # literal run of -c bytes
            out += raw[i:i - c]
            i -= c
        else:  # replicate next byte c+1 times
            out += raw[i:i + 1] * (c + 1)
            i += 1
    return bytes(out)


def _channel_list(names, ptype=_PIXEL_FLOAT):
    out = b""
    for n in sorted(names):
        out += n.encode() + b"\0" + struct.pack("<iiii", ptype, 0, 1, 1)
    return out + b"\0"


def write_exr(path: str, img: np.ndarray, compression: str = "zips"):
    write_exr_multilayer(path, {"": np.asarray(img, np.float32)},
                         compression)


def write_exr_multilayer(path: str, layers: dict,
                         compression: str = "zips"):
    comp_id = {"none": 0, "zips": 2, "piz": 4, "pxr24": 5,
               "b44": 6, "b44a": 7}[compression]
    # b44 compresses HALF data only — write half channels for it
    half = comp_id in (6, 7)
    ptype = 1 if half else _PIXEL_FLOAT
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
    header += _attr(b"channels", b"chlist", _channel_list(chan_names,
                                                          ptype))
    header += _attr(b"compression", b"compression", bytes([comp_id]))
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
    lines_per_chunk = {0: 1, 2: 1, 4: 32, 5: 16, 6: 32, 7: 32}[comp_id]
    ptypes = {cn: ptype for cn in sorted_names}
    chunks = []
    for y0 in range(0, h, lines_per_chunk):
        nl = min(lines_per_chunk, h - y0)
        if comp_id in (6, 7):  # B44/B44A: per-channel half planes
            from .exr_codecs import b44_compress_chunk

            planes = [(cn, np.asarray(chan_data[cn][y0:y0 + nl],
                                      np.float32).astype("<f2")
                       .view(np.uint16))
                      for cn in sorted_names]
            chunks.append(b44_compress_chunk(planes, ptypes,
                                             flat_ok=(comp_id == 7)))
            continue
        if comp_id == 5:  # PXR24
            from .exr_codecs import pxr24_compress_chunk

            chan_lines = [(cn, np.asarray(chan_data[cn][y], "<f4"))
                          for y in range(y0, y0 + nl)
                          for cn in sorted_names]
            chunks.append(pxr24_compress_chunk(chan_lines, ptypes))
            continue
        if comp_id == 4:  # PIZ
            from .exr_codecs import piz_compress_chunk

            planes = [(cn, np.asarray(chan_data[cn][y0:y0 + nl], "<f4")
                       .view(np.uint32))
                      for cn in sorted_names]
            chunks.append(piz_compress_chunk(planes, ptypes))
            continue
        raw = b"".join(chan_data[cn][y].astype("<f4").tobytes()
                       for y in range(y0, y0 + nl)
                       for cn in sorted_names)
        if comp_id == 2:
            z = zlib.compress(_filter(raw))
            chunks.append(z if len(z) < len(raw) else raw)
        else:
            chunks.append(raw)
    with open(path, "wb") as f:
        f.write(struct.pack("<I", _MAGIC))
        f.write(struct.pack("<I", 2))  # version 2, single part scanline
        f.write(header)
        offset_table_pos = f.tell()
        data_start = offset_table_pos + 8 * len(chunks)
        offsets = []
        off = data_start
        for c in chunks:
            offsets.append(off)
            off += 8 + len(c)
        f.write(struct.pack(f"<{len(chunks)}Q", *offsets))
        for ci, c in enumerate(chunks):
            f.write(struct.pack("<ii", ci * lines_per_chunk, len(c)))
            f.write(c)


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
    lines_per_chunk = {0: 1, 1: 1, 2: 1, 3: 16, 4: 32, 5: 16,
                       6: 32, 7: 32}.get(compression)
    if lines_per_chunk is None:
        raise NotImplementedError(
            f"EXR compression type {compression} (DWAA/DWAB) not "
            "supported by the in-repo codec")
    n_chunks = -(-h // lines_per_chunk)
    offsets = struct.unpack_from(f"<{n_chunks}Q", data, pos)
    chans = sorted(c for c, _ in channels)
    ptypes = dict(channels)
    _size = {0: 4, 1: 2, 2: 4}  # UINT, HALF, FLOAT bytes
    _dt = {0: "<u4", 1: "<f2", 2: "<f4"}
    planes = {c: np.zeros((h, w), np.float32) for c in chans}
    line_bytes = sum(_size[ptypes[c]] * w for c in chans)
    for off in offsets:
        (y0,) = struct.unpack_from("<i", data, off)
        (nbytes,) = struct.unpack_from("<i", data, off + 4)
        raw = data[off + 8:off + 8 + nbytes]
        n_lines = min(lines_per_chunk, h - y0)
        expect = line_bytes * n_lines
        if compression == 0 or nbytes == expect:
            chunk = raw  # NONE, or stored raw (didn't compress smaller)
        elif compression in (2, 3):  # ZIPS / ZIP
            chunk = _unfilter(zlib.decompress(raw))
        elif compression == 1:  # RLE
            chunk = _unfilter(_rle_decode(raw, expect))
        elif compression == 4:  # PIZ
            from .exr_codecs import piz_decompress_chunk

            chunk = piz_decompress_chunk(raw, chans, ptypes, w, n_lines)
        elif compression == 5:  # PXR24
            from .exr_codecs import pxr24_decompress_chunk

            chunk = pxr24_decompress_chunk(raw, chans, ptypes, w, n_lines)
        else:  # B44 / B44A
            from .exr_codecs import b44_decompress_chunk

            chunk = b44_decompress_chunk(raw, chans, ptypes, w, n_lines)
        p = 0
        for ly in range(n_lines):
            for c in chans:
                sz = _size[ptypes[c]]
                planes[c][y0 + ly] = np.frombuffer(
                    chunk, _dt[ptypes[c]], w, p).astype(np.float32)
                p += sz * w
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
