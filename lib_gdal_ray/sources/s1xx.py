"""S-102 (IHO bathymetric surface) reader over the pure-python HDF5
store — the first compound-datatype consumer.

Layout: /BathymetryCoverage/BathymetryCoverage.NN/Group_001/values is
a (rows, cols) compound {depth, uncertainty} float32 grid stored
south-up; the instance group's attributes carry the point-registered
grid (gridOriginLongitude/Latitude, gridSpacing*, numPoints*), so the
GDAL-style transform shifts the origin by half a cell and flips north
-up (AREA_OR_POINT=Point).  Nodata 1e6 per the spec.

Reference: frmts/hdf5/s102dataset.cpp; autotest s102.py pins gt
(1.8, 0.4, 0, 48.75, 0, -0.5), the flipped band values, nodata 1e6 —
mirrored in tests/test_s102.py. Re-derived; no code copied.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

NODATA = 1.0e6


def decode_s102(path: str, instance: Optional[str] = None):
    """S-102 .h5 path -> ((H, W, 2) float32 [depth, uncertainty],
    meta)."""
    from .hdf5 import read_h5_array, read_h5_structure

    s = read_h5_structure(path)
    values = sorted(k for k in s
                    if k.startswith("/BathymetryCoverage/")
                    and k.endswith("/values"))
    if instance is not None:
        values = [k for k in values if f"/{instance}/" in k]
    if not values:
        raise ValueError("S102: no BathymetryCoverage values dataset")
    ds_path = values[0]
    inst = ds_path.rsplit("/", 2)[0]  # .../BathymetryCoverage.NN
    attrs = (s.get(inst + "/@") or {}).get("attrs", {})

    rec = read_h5_array(path, ds_path)
    depth = np.ascontiguousarray(rec["depth"][::-1]).astype(np.float32)
    unc = np.ascontiguousarray(
        rec["uncertainty"][::-1]).astype(np.float32)
    arr = np.stack([depth, unc], axis=-1)

    lon0 = float(attrs.get("gridOriginLongitude", 0.0))
    lat0 = float(attrs.get("gridOriginLatitude", 0.0))
    dlon = float(attrs.get("gridSpacingLongitudinal", 1.0))
    dlat = float(attrs.get("gridSpacingLatitudinal", 1.0))
    nlat = int(attrs.get("numPointsLatitudinal", rec.shape[0]))
    # point-registered: pixel centers sit on the grid nodes
    gt = (lon0 - dlon / 2, dlon, 0.0,
          lat0 + (nlat - 1) * dlat + dlat / 2, 0.0, -dlat)

    root_attrs = (s.get("/@") or {}).get("attrs", {})
    md = {k: v for k, v in root_attrs.items()
          if isinstance(v, (str, int, float))}
    meta = {"width": arr.shape[1], "height": arr.shape[0], "bands": 2,
            "transform": gt, "epsg": 4326, "nodata": NODATA,
            "band_names": ["depth", "uncertainty"],
            "metadata": md, "instance": inst.rsplit("/", 1)[1]}
    return arr, meta
