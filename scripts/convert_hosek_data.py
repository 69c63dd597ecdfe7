"""Convert upstream ArHosekSkyModel RGB data headers to the .npz format
backgrounds/hosek.py loads (see its module docstring for the layout).

The upstream headers (ArHosekSkyModelData_RGB.h, shipped with the
reference renderer's Hosek-Wilkie implementation — SURVEY §2.7
darksky.cc [H]) define, per channel::

    double datasetRGB1[] = { ... 1080 doubles ... };   // config
    double datasetRGBRad1[] = { ... 120 doubles ... }; // radiance

ordered [turbidity(10)][albedo(2)][ctrl_pt(6)][coeff(9)] for config and
[turbidity(10)][albedo(2)][ctrl_pt(6)] for radiance.

Usage:
    python scripts/convert_hosek_data.py ArHosekSkyModelData_RGB.h out.npz
Then render with:
    LIBYAF_HW_DATA=out.npz yafaray-xml scene.xml out.png
or set <background ...><hw_dataset sval="out.npz"/>.
"""
from __future__ import annotations

import re
import sys

import numpy as np


def parse_header(text: str):
    """Extract (config (C,10,2,6,9), radiance (C,10,2,6)) from the C
    header text.  Channels are discovered by the trailing integer in
    datasetRGB<k> / datasetRGBRad<k> (also accepts datasetXYZ names)."""
    arrays = {}
    for m in re.finditer(
            r"double\s+(dataset\w*?)(\d+)\s*\[\s*\]\s*=\s*\{(.*?)\}",
            text, re.S):
        base, idx, body = m.group(1), int(m.group(2)), m.group(3)
        vals = np.array(
            [float(x) for x in re.findall(
                r"[-+]?[\d.]+(?:[eE][-+]?\d+)?", body)], np.float64)
        arrays[(base, idx)] = vals
    bases = {b for (b, _) in arrays}
    rad_base = next((b for b in bases if b.lower().endswith("rad")), None)
    cfg_base = next(
        (b for b in bases if not b.lower().endswith("rad")), None)
    if rad_base is None or cfg_base is None:
        raise ValueError(f"no dataset arrays found (saw {sorted(bases)})")
    chans = sorted(i for (b, i) in arrays if b == cfg_base)
    config = np.stack(
        [arrays[(cfg_base, i)].reshape(10, 2, 6, 9) for i in chans])
    radiance = np.stack(
        [arrays[(rad_base, i)].reshape(10, 2, 6) for i in chans])
    return config, radiance


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 2
    text = open(argv[1]).read()
    config, radiance = parse_header(text)
    np.savez_compressed(argv[2], config=config, radiance=radiance)
    print(f"wrote {argv[2]}: config {config.shape}, "
          f"radiance {radiance.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
