"""Raster-at-point sampling vs dense bilinear oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.geom import cells
from lib_gdal_ray.pipelines.interpolate import interpolate_at_points
from lib_gdal_ray.pipelines.rasterize import pack_pixel


Z = 2
M = (1 << Z) * 256


def raster_from(fn):
    """Dense 64x64 window raster at global pixels [100,164)²."""
    gy, gx = np.mgrid[100:164, 100:164]
    vals = fn(gx.astype(float), gy.astype(float))
    return ray.data.from_arrow(pa.table({
        "pix_id": pa.array(pack_pixel(Z, gx.ravel(), gy.ravel())),
        "burn": pa.array(vals.ravel())})), fn


def points_at_pixels(fracs):
    """Points whose mercator position lands at given fractional global
    pixels (invert the forward formulas)."""
    fx = np.asarray([f[0] for f in fracs])
    fy = np.asarray([f[1] for f in fracs])
    lon = fx / M * 360.0 - 180.0
    lat = np.degrees(2.0 * np.arctan(np.exp(np.pi * (1 - 2 * fy / M))) - np.pi / 2.0)
    return ray.data.from_arrow(pa.table({
        "point_id": pa.array(np.arange(len(fracs), dtype=np.int64)),
        "lon": pa.array(lon), "lat": pa.array(lat)}))


def test_bilinear_on_linear_surface_is_exact():
    # bilinear interpolation reproduces any affine surface exactly
    ds, fn = raster_from(lambda x, y: 3.0 * x + 2.0 * y + 7.0)
    fracs = [(120.3, 130.7), (111.5, 150.25), (140.0, 140.0)]
    pts = points_at_pixels(fracs)
    out = interpolate_at_points(ds, pts, Z).to_pandas().set_index("point_id")
    for i, (fx, fy) in enumerate(fracs):
        # value at fractional pixel = surface at center coords (fx-0.5, fy-0.5)
        want = 3.0 * (fx - 0.5) + 2.0 * (fy - 0.5) + 7.0
        np.testing.assert_allclose(out.loc[i, "value"], want, rtol=1e-9)
        np.testing.assert_allclose(out.loc[i, "weight_sum"], 1.0)


def test_nearest():
    ds, fn = raster_from(lambda x, y: x * 1000 + y)
    pts = points_at_pixels([(120.9, 130.2)])
    out = interpolate_at_points(ds, pts, Z, method="nearest").to_pandas()
    np.testing.assert_allclose(out["value"].iloc[0], 120 * 1000 + 130)


def test_missing_area_absent():
    ds, _ = raster_from(lambda x, y: x)
    pts = points_at_pixels([(500.5, 500.5)])  # far outside the window
    out = interpolate_at_points(ds, pts, Z).to_pandas()
    assert len(out) == 0


def test_edge_renormalization():
    # point between the raster edge and missing pixels: weights renormalize
    ds, _ = raster_from(lambda x, y: 5.0 + 0 * x)
    pts = points_at_pixels([(100.2, 120.5)])  # x0 = 99 (missing), x1 = 100
    out = interpolate_at_points(ds, pts, Z).to_pandas()
    np.testing.assert_allclose(out["value"].iloc[0], 5.0)
    assert out["weight_sum"].iloc[0] < 1.0
