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


class TestGdalGridCli:
    def test_invdist_exact_at_site(self, tmp_path):
        import json as _json
        import os
        import subprocess
        import sys as _sys

        import numpy as np
        import pyarrow as pa

        from lib_gdal_ray.codecs.tiff import decode_geotiff

        # one site exactly at a node center: IDW returns its value there
        src = str(tmp_path / "s.parquet")
        pa.parquet.write_table(pa.table({
            "lon": pa.array([2.5, 7.5]),
            "lat": pa.array([2.5, 7.5]),
            "value": pa.array([10.0, 90.0]),
        }), src)
        dst = str(tmp_path / "g.tif")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "gdal_grid.py"),
             src, dst, "-zfield", "value", "-txe", "0", "10",
             "-tye", "0", "10", "-outsize", "10", "10",
             "-a", "invdist:power=2", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        g, meta = decode_geotiff(open(dst, "rb").read())
        # node (2,7) center = (2.5, 2.5) georef -> row 7 col 2
        assert abs(float(g[7, 2]) - 10.0) < 1e-3
        assert abs(float(g[2, 7]) - 90.0) < 1e-3
        # equidistant nodes (x=4.5,y=5.5) and (x=5.5,y=4.5): d^2=13 to
        # both sites -> exactly the mean value 50
        assert abs(float(g[4, 4]) - 50.0) < 1e-3
        assert abs(float(g[5, 5]) - 50.0) < 1e-3
        assert meta["transform"] == (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
