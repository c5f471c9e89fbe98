"""IDW gridding vs direct numpy oracle."""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.gridding import (EPS, grid_idw, pixel_centers_lonlat,
                                             pixel_window)


def sites(seed=5, n=60):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-30, 30, n), rng.uniform(-30, 30, n), rng.uniform(0, 100, n))


def oracle_idw(lon, lat, sx, sy, sv, power=2.0):
    out = np.empty(len(lon))
    for i in range(len(lon)):
        d2 = (lon[i] - sx) ** 2 + (lat[i] - sy) ** 2
        w = 1.0 / (d2 + EPS) if power == 2 else 1.0 / (d2 ** (power / 2) + EPS)
        out[i] = (w * sv).sum() / w.sum()
    return out


def test_idw_all_vs_oracle():
    sx, sy, sv = sites()
    z = 3
    px = pixel_window(z, 1000, 1000, 16, 16)
    out = grid_idw(px, sx, sy, sv, z, mode="all").to_pandas()
    lon, lat = pixel_centers_lonlat(out["gpx"].to_numpy(), out["gpy"].to_numpy(), z)
    want = oracle_idw(lon, lat, sx, sy, sv)
    np.testing.assert_allclose(out["burn"].to_numpy(), want, rtol=1e-12)
    assert len(out) == 256


def test_idw_knn_close_to_all():
    # with k = all sites, knn mode must equal all mode exactly
    sx, sy, sv = sites(7, 30)
    z = 3
    px = pixel_window(z, 1000, 1000, 8, 8)
    a = grid_idw(px, sx, sy, sv, z, mode="all").to_pandas().sort_values("pix_id")
    b = grid_idw(pixel_window(z, 1000, 1000, 8, 8), sx, sy, sv, z,
                 mode="knn", k=30).to_pandas().sort_values("pix_id")
    np.testing.assert_allclose(a["burn"].to_numpy(), b["burn"].to_numpy(), rtol=1e-12)


def test_idw_exact_near_site():
    # a pixel essentially on top of a site takes (almost exactly) its value
    z = 3
    m = (1 << z) * 256
    gx, gy = 1024, 1024
    lon, lat = pixel_centers_lonlat(np.asarray([gx]), np.asarray([gy]), z)
    sx = np.asarray([lon[0], 50.0])
    sy = np.asarray([lat[0], 50.0])
    sv = np.asarray([7.0, 99.0])
    out = grid_idw(pixel_window(z, gx, gy, 1, 1), sx, sy, sv, z, mode="all").to_pandas()
    np.testing.assert_allclose(out["burn"].iloc[0], 7.0, atol=1e-6)
