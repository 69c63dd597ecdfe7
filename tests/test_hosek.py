"""Hosek-Wilkie darksky evaluation path (backgrounds/hosek.py —
reference darksky.cc [H], SURVEY §2.7).  The fitted datasets are not
available offline, so these tests validate the evaluation machinery
against synthetic tables with analytically known answers, plus the
C-header converter round-trip."""
import math

import numpy as np
import pytest

from libyafaray_tpu.backgrounds import hosek
from libyafaray_tpu.scene.params import ParamMap


def _synth_dataset(const_rad=2.0):
    """Constant-F dataset: A=D=G=I=0, C=1 makes the distribution
    identically 1, so radiance == the radiance-table value."""
    config = np.zeros((3, 10, 2, 6, 9))
    config[..., 2] = 1.0  # C coefficient
    radiance = np.full((3, 10, 2, 6), const_rad)
    return {"config": config, "radiance": radiance}


def test_constant_dataset_radiance():
    ds = _synth_dataset(2.0)
    coeffs, rad = hosek._interp_tables(ds, 4.3, 0.5, 0.7)
    r = hosek.hw_radiance(coeffs, rad,
                          np.array([1.0, 0.5, 0.0]),
                          np.array([1.0, 0.0, -1.0]))
    assert np.allclose(r, 2.0), r


def test_bezier_endpoints_and_lerps():
    # control points distinguishable along the elevation axis
    config = np.zeros((1, 10, 2, 6, 9))
    config[0, :, :, :, 2] = np.arange(6)[None, None, :]  # C = ctrl index
    radiance = np.ones((1, 10, 2, 6))
    ds = {"config": config, "radiance": radiance}
    c0, _ = hosek._interp_tables(ds, 1.0, 0.0, 0.0)
    c1, _ = hosek._interp_tables(ds, 1.0, 0.0, math.pi / 2)
    assert abs(c0[0, 2] - 0.0) < 1e-12  # x=0 -> first ctrl point
    assert abs(c1[0, 2] - 5.0) < 1e-12  # x=1 -> last ctrl point

    # albedo lerp
    config = np.zeros((1, 10, 2, 6, 9))
    config[0, :, 0, :, 2] = 1.0
    config[0, :, 1, :, 2] = 3.0
    ds = {"config": config, "radiance": radiance}
    cm, _ = hosek._interp_tables(ds, 1.0, 0.25, 0.3)
    assert abs(cm[0, 2] - 1.5) < 1e-12

    # turbidity lerp (t=2.5 -> halfway between tables 2 and 3)
    config = np.zeros((1, 10, 2, 6, 9))
    config[0, 1, :, :, 2] = 2.0
    config[0, 2, :, :, 2] = 4.0
    ds = {"config": config, "radiance": radiance}
    ct, _ = hosek._interp_tables(ds, 2.5, 0.0, 0.3)
    assert abs(ct[0, 2] - 3.0) < 1e-12


def test_hw_grid_shape_and_horizon():
    ds = _synth_dataset(1.5)
    g = hosek.hw_grid(ds, (0.3, 0.2, 0.8), 3.0, 0.2, res_v=32, res_u=64)
    assert g.shape == (32, 64, 3)
    assert np.isfinite(g).all() and (g >= 0).all()
    assert np.allclose(g[:16], 1.5)        # sky hemisphere: constant F
    assert np.allclose(g[17:], 1.5 * 0.2)  # ground fade convention


def test_darksky_uses_dataset_when_given(tmp_path):
    path = tmp_path / "hw.npz"
    ds = _synth_dataset(4.0)
    np.savez(path, **ds)
    from libyafaray_tpu.backgrounds.sky import bake_sky

    p = ParamMap({"type": "darksky", "from": (0.3, 0.2, 0.9),
                  "turbidity": 4.0, "exposure": 0.0,
                  "hw_dataset": str(path)})
    spec, grid = bake_sky("darksky", p)
    assert np.allclose(grid[:60], 4.0)  # HW table value, not Preetham
    # missing file falls back to Preetham (and must not raise)
    p2 = ParamMap({"type": "darksky", "from": (0.3, 0.2, 0.9),
                   "turbidity": 4.0, "exposure": 0.0,
                   "hw_dataset": str(tmp_path / "nope.npz")})
    _, grid2 = bake_sky("darksky", p2)
    assert not np.allclose(grid2[:60], 4.0)


def test_converter_header_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    config = rng.normal(size=(2, 10, 2, 6, 9))
    radiance = rng.random((2, 10, 2, 6))
    parts = []
    for c in range(2):
        body = ", ".join(f"{v:.17g}" for v in config[c].ravel())
        parts.append(f"double datasetRGB{c + 1}[] = {{ {body} }};")
        bodyr = ", ".join(f"{v:.17g}" for v in radiance[c].ravel())
        parts.append(f"double datasetRGBRad{c + 1}[] = {{ {bodyr} }};")
    text = "\n".join(parts)
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from convert_hosek_data import parse_header

    cfg, rad = parse_header(text)
    assert np.allclose(cfg, config) and np.allclose(rad, radiance)


def test_load_dataset_shape_errors(tmp_path):
    path = tmp_path / "bad.npz"
    np.savez(path, config=np.zeros((3, 9, 2, 6, 9)),
             radiance=np.zeros((3, 9, 2, 6)))
    with pytest.raises(ValueError):
        hosek.load_hw_dataset(str(path))
