"""Contour: analytic oracles (ramp → straight line, cone → circle),
topology invariants (endpoint degrees), cross-tile stitching."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.pipelines.contour import contour_lines, contour_segments
from lib_gdal_ray.pipelines.rasterize import pack_pixel


def grid_pixels(values: np.ndarray, z=3):
    ny, nx = values.shape
    gy, gx = np.mgrid[0:ny, 0:nx]
    pix = pack_pixel(z, gx.ravel().astype(np.int64), gy.ravel().astype(np.int64))
    return ray.data.from_arrow(pa.table({
        "pix_id": pa.array(pix),
        "burn": pa.array(values.ravel().astype(np.float64))})).repartition(4)


def test_ramp_vertical_line():
    # dem = x → contour at 10.5 is the vertical line x = 10.5
    ny, nx = 24, 32
    dem = np.tile(np.arange(nx, dtype=float), (ny, 1))
    segs = contour_segments(grid_pixels(dem), [10.5]).to_pandas()
    assert len(segs) == ny - 1  # one segment per cell row
    np.testing.assert_allclose(segs["x1"], 10.5)
    np.testing.assert_allclose(segs["x2"], 10.5)
    lines = contour_lines(grid_pixels(dem), [10.5]).to_pandas()
    assert len(lines) == 1
    np.testing.assert_allclose(lines["length"].iloc[0], ny - 1)


def test_cone_circle():
    # dem = 100 - dist from center → iso at level L is a circle r = 100 - L
    n = 48
    y, x = np.mgrid[0:n, 0:n]
    c = (n - 1) / 2.0
    dem = 100.0 - np.hypot(x - c, y - c)
    level = 100.0 - 15.0  # circle radius 15, well inside the grid
    lines = contour_lines(grid_pixels(dem), [level]).to_pandas()
    assert len(lines) == 1
    r = 15.0
    np.testing.assert_allclose(lines["length"].iloc[0], 2 * np.pi * r, rtol=0.02)
    np.testing.assert_allclose(lines["x_min"].iloc[0], c - r, atol=0.5)
    np.testing.assert_allclose(lines["x_max"].iloc[0], c + r, atol=0.5)


def test_endpoint_degrees_even_or_boundary():
    rng = np.random.default_rng(3)
    dem = rng.random((20, 20)) * 10
    segs = contour_segments(grid_pixels(dem), [5.0]).to_pandas()
    cnt = Counter()
    for _, s in segs.iterrows():
        cnt[(round(s.x1 * 2**20), round(s.y1 * 2**20))] += 1
        cnt[(round(s.x2 * 2**20), round(s.y2 * 2**20))] += 1
    for (qx, qy), deg in cnt.items():
        x, y = qx / 2**20, qy / 2**20
        on_boundary = x <= 0 or y <= 0 or x >= 19 or y >= 19
        assert deg in (1, 2)
        if deg == 1:
            assert on_boundary, f"dangling interior endpoint at {(x, y)}"


def test_multiple_levels():
    n = 32
    y, x = np.mgrid[0:n, 0:n]
    dem = x.astype(float)
    lines = contour_lines(grid_pixels(dem), [5.5, 10.5, 20.5]).to_pandas()
    assert len(lines) == 3
    assert sorted(lines["level"]) == [5.5, 10.5, 20.5]
