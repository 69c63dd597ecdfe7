"""Image I/O codec tests: EXR compression paths (reference exrHandler.cc
reads/writes zip-compressed scanline EXRs; SURVEY §2.12)."""
import struct
import zlib

import numpy as np

from libyafaray_tpu.io.exr import (_filter, _rle_decode, _unfilter,
                                   read_exr, read_exr_multilayer,
                                   write_exr, write_exr_multilayer)


def _rand_img(h=33, w=47, c=3, seed=3):
    rng = np.random.default_rng(seed)
    return rng.random((h, w, c)).astype(np.float32)


def test_exr_zips_roundtrip(tmp_path):
    img = _rand_img()
    p = str(tmp_path / "a.exr")
    write_exr(p, img, compression="zips")
    back = read_exr(p)
    assert np.array_equal(back, img)
    # compressed output should actually be smaller than raw on smooth data
    smooth = np.tile(np.linspace(0, 1, 47, dtype=np.float32)[None, :, None],
                     (33, 1, 3))
    p2 = str(tmp_path / "s.exr")
    write_exr(p2, smooth, compression="zips")
    import os
    assert os.path.getsize(p2) < 33 * 47 * 3 * 4
    assert np.array_equal(read_exr(p2), smooth)


def test_exr_none_roundtrip(tmp_path):
    img = _rand_img(seed=4)
    p = str(tmp_path / "n.exr")
    write_exr(p, img, compression="none")
    assert np.array_equal(read_exr(p), img)


def test_exr_multilayer_zips(tmp_path):
    layers = {"": _rand_img(seed=5), "normals": _rand_img(seed=6),
              "z": _rand_img(seed=7)[..., :1][..., 0]}
    p = str(tmp_path / "m.exr")
    write_exr_multilayer(p, layers, compression="zips")
    back = read_exr_multilayer(p)
    assert np.array_equal(back[""], layers[""])
    assert np.array_equal(back["normals"], layers["normals"])
    assert np.array_equal(back["z"], layers["z"])


def test_exr_filter_inverse():
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 256, 1001):
        buf = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _unfilter(_filter(buf)) == buf


def test_rle_decode():
    # replicate run: count byte c >= 0 -> next byte repeated c+1 times
    # literal run: c < 0 -> -c literal bytes follow
    enc = bytes([3, 0x41]) + np.int8(-2).tobytes() + b"XY" + bytes([0, 0x5A])
    assert _rle_decode(enc, 7) == b"AAAAXYZ"


def test_exr_zip16_read(tmp_path):
    """Hand-built 16-scanline ZIP (type 3) file — the external-tool
    default — read back exactly."""
    h, w = 37, 23
    img = _rand_img(h, w, 3, seed=8)
    comps = ["B", "G", "R"]  # storage order is sorted: B, G, R
    chan_order = {"B": 2, "G": 1, "R": 0}

    def chlist(names):
        out = b""
        for nm in sorted(names):
            out += nm.encode() + b"\0" + struct.pack("<iiii", 2, 0, 1, 1)
        return out + b"\0"

    def attr(name, typ, data):
        return (name + b"\0" + typ + b"\0"
                + struct.pack("<i", len(data)) + data)

    header = b""
    header += attr(b"channels", b"chlist", chlist(comps))
    header += attr(b"compression", b"compression", b"\x03")  # ZIP
    header += attr(b"dataWindow", b"box2i",
                   struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += attr(b"displayWindow", b"box2i",
                   struct.pack("<iiii", 0, 0, w - 1, h - 1))
    header += attr(b"lineOrder", b"lineOrder", b"\0")
    header += attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += attr(b"screenWindowCenter", b"v2f",
                   struct.pack("<ff", 0.0, 0.0))
    header += attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\0"

    chunks = []
    for y0 in range(0, h, 16):
        n_lines = min(16, h - y0)
        raw = b""
        for ly in range(n_lines):
            for cn in sorted(comps):
                raw += img[y0 + ly, :, chan_order[cn]].astype(
                    "<f4").tobytes()
        z = zlib.compress(_filter(raw))
        chunks.append((y0, z if len(z) < len(raw) else raw))

    p = str(tmp_path / "z16.exr")
    with open(p, "wb") as f:
        f.write(struct.pack("<II", 20000630, 2))
        f.write(header)
        data_start = f.tell() + 8 * len(chunks)
        offs, off = [], data_start
        for _, c in chunks:
            offs.append(off)
            off += 8 + len(c)
        f.write(struct.pack(f"<{len(chunks)}Q", *offs))
        for y0, c in chunks:
            f.write(struct.pack("<ii", y0, len(c)))
            f.write(c)

    back = read_exr_multilayer(p)
    # single unnamed layer with R, G, B stacked in RGB order
    assert np.array_equal(back[""], img)
