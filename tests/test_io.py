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


def test_exr_piz_roundtrip(tmp_path):
    """PIZ (bitmap+LUT, wav2, canonical Huffman): LOSSLESS for float32 —
    the wavelet/Huffman stages are exact on the 16-bit planes."""
    rng = np.random.default_rng(7)
    img = (rng.random((37, 23, 3)) * 4).astype(np.float32)
    p = str(tmp_path / "p.exr")
    write_exr(p, img, compression="piz")
    back = read_exr(p)
    assert (back == img).all()


def test_exr_piz_multilayer(tmp_path):
    rng = np.random.default_rng(8)
    layers = {"": rng.random((33, 15, 3)).astype(np.float32),
              "depth": rng.random((33, 15, 3)).astype(np.float32) * 100}
    p = str(tmp_path / "ml.exr")
    write_exr_multilayer(p, layers, compression="piz")
    back = read_exr_multilayer(p)
    for k, v in layers.items():
        assert (back[k] == v).all(), k


def test_exr_pxr24_roundtrip(tmp_path):
    """PXR24: float rounded to 24 bits (8 mantissa LSBs dropped)."""
    rng = np.random.default_rng(9)
    img = (rng.random((21, 19, 3)) * 4).astype(np.float32)
    p = str(tmp_path / "x.exr")
    write_exr(p, img, compression="pxr24")
    back = read_exr(p)
    assert np.abs(back - img).max() <= img.max() * 2.0 ** -15


def test_exr_b44_roundtrip(tmp_path):
    """B44/B44A are half + lossy block deltas: on smooth data the error
    must hit the pure float16 floor; flat blocks are exact (and B44A
    stores them in 3 bytes — file must shrink)."""
    y, x = np.mgrid[0:37, 0:23].astype(np.float32)
    img = np.stack([0.5 + 0.3 * np.sin(x / 10), 1.5 + y / 40,
                    2.0 + (x + y) / 60], -1).astype(np.float32)
    half_floor = np.abs(img.astype(np.float16).astype(np.float32)
                        - img).max()
    for comp in ("b44", "b44a"):
        p = str(tmp_path / f"{comp}.exr")
        write_exr(p, img, compression=comp)
        back = read_exr(p)
        assert np.abs(back - img).max() <= half_floor + 1e-7, comp
    flat = np.full((16, 16, 3), 1.25, np.float32)
    pa = str(tmp_path / "fa.exr")
    pb = str(tmp_path / "fb.exr")
    write_exr(pa, flat, compression="b44a")
    write_exr(pb, flat, compression="b44")
    assert (read_exr(pa) == flat).all()
    import os
    assert os.path.getsize(pa) < os.path.getsize(pb)


def test_exr_wav2_huf_units():
    """wav2 and the native Huffman coder are exact inverses on odd
    shapes and both bit-width modes (PIZ building blocks)."""
    from libyafaray_tpu.io.exr_codecs import (_huf_compress,
                                              _huf_decompress, wav2_decode,
                                              wav2_encode)

    rng = np.random.default_rng(3)
    for shape in ((31, 17), (1, 9), (9, 1), (5, 5), (4, 8)):
        for mx in (100, 60000):
            a = rng.integers(0, min(mx + 1, 60000),
                             shape).astype(np.uint16)
            b = a.copy()
            wav2_encode(b, mx)
            wav2_decode(b, mx)
            assert (b == a).all(), (shape, mx)
    for n, hi in ((1000, 40), (50000, 5000), (3, 1), (1, 1)):
        d = rng.integers(0, hi, n).astype(np.uint16)
        assert (_huf_decompress(_huf_compress(d), n) == d).all()


# ---- tiled EXR (VERDICT r4 #7; libIlmImf reads tiled transparently) ----

def test_exr_tiled_roundtrip_codecs(tmp_path):
    """Single-level tiled write/read round-trip, edge tiles included
    (70x53 image, 32x32 tiles -> ragged right/bottom tiles)."""
    rng = np.random.default_rng(7)
    img = rng.random((53, 70, 3)).astype(np.float32)
    for comp in ("none", "zips", "pxr24", "piz"):
        p = str(tmp_path / f"t_{comp}.exr")
        write_exr_multilayer(p, {"": img}, compression=comp,
                             tiles=(32, 32))
        back = read_exr(p)
        assert back.shape == img.shape
        if comp == "pxr24":
            assert np.max(np.abs(back - img)) < 2e-5
        else:
            assert np.array_equal(back, img)


def test_exr_tiled_b44_halves(tmp_path):
    """B44 tiles: smooth data must land on the float16 floor (same
    criterion as the scanline B44 test)."""
    y, x = np.mgrid[0:48, 0:64].astype(np.float32)
    img = np.stack([0.5 + 0.3 * np.sin(x / 10), 1.5 + y / 40,
                    2.0 + (x + y) / 60], -1).astype(np.float32)
    half_floor = np.abs(img.astype(np.float16).astype(np.float32)
                        - img).max()
    p = str(tmp_path / "t_b44.exr")
    write_exr_multilayer(p, {"": img}, compression="b44", tiles=(16, 16))
    back = read_exr(p)
    assert np.abs(back - img).max() <= half_floor + 1e-7


def test_exr_tiled_multilayer(tmp_path):
    rng = np.random.default_rng(3)
    layers = {"": rng.random((40, 40, 3)).astype(np.float32),
              "depth": rng.random((40, 40, 3)).astype(np.float32)}
    p = str(tmp_path / "t_ml.exr")
    write_exr_multilayer(p, layers, compression="zips", tiles=(17, 19))
    back = read_exr_multilayer(p)
    for k in layers:
        assert np.array_equal(back[k], layers[k])


def test_exr_tiled_mipmap_reads_level0(tmp_path):
    """Hand-built MIPMAP tiled file (NONE compression): reader must
    return the full-resolution level (0,0) and step past mip chunks."""
    import struct as st

    from libyafaray_tpu.io.exr import _attr, _channel_list

    w = h = 8
    lvl0 = np.arange(w * h, dtype=np.float32).reshape(h, w)
    lvl1 = lvl0[::2, ::2] * 0 + 99.0  # decoy values at level 1
    lvl2 = lvl0[::4, ::4] * 0 + 77.0
    lvl3 = np.array([[55.0]], np.float32)
    header = _attr(b"channels", b"chlist", _channel_list(["G"]))
    header += _attr(b"compression", b"compression", b"\x00")
    header += _attr(b"dataWindow", b"box2i",
                    st.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr(b"displayWindow", b"box2i",
                    st.pack("<iiii", 0, 0, w - 1, h - 1))
    header += _attr(b"lineOrder", b"lineOrder", b"\x00")
    header += _attr(b"pixelAspectRatio", b"float", st.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f",
                    st.pack("<ff", 0.0, 0.0))
    header += _attr(b"screenWindowWidth", b"float", st.pack("<f", 1.0))
    header += _attr(b"tiles", b"tiledesc", st.pack("<IIB", 4, 4, 1))
    header += b"\0"
    chunks = []
    for lev, arr in enumerate((lvl0, lvl1, lvl2, lvl3)):
        lh, lw = arr.shape
        for ty in range(0, lh, 4):
            for tx in range(0, lw, 4):
                body = arr[ty:ty + 4, tx:tx + 4].astype("<f4").tobytes()
                chunks.append(st.pack("<iiiii", tx // 4, ty // 4,
                                      lev, lev, len(body)) + body)
    p = str(tmp_path / "mip.exr")
    with open(p, "wb") as f:
        f.write(st.pack("<I", 20000630))
        f.write(st.pack("<I", 2 | 0x200))
        f.write(header)
        start = f.tell() + 8 * len(chunks)
        offs, o = [], start
        for c in chunks:
            offs.append(o)
            o += len(c)
        f.write(st.pack(f"<{len(chunks)}Q", *offs))
        for c in chunks:
            f.write(c)
    back = read_exr(p)
    assert back.shape == (h, w, 1)
    assert np.array_equal(back[..., 0], lvl0)
