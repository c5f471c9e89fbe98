"""GCP polynomial / TPS / RPC transformer tests."""

import numpy as np
import pytest

from lib_gdal_ray.geom.gcp import (GCPPolynomialTransformer, RPCTransformer,
                                   TPSTransformer)


def affine_gcps(n=12, seed=0):
    rng = np.random.default_rng(seed)
    px = rng.uniform(0, 1000, n)
    py = rng.uniform(0, 800, n)
    gx = 500.0 + 0.25 * px - 0.05 * py
    gy = -200.0 + 0.03 * px + 0.4 * py
    return px, py, gx, gy


class TestGCPPolynomial:
    def test_order1_recovers_affine_exactly(self):
        px, py, gx, gy = affine_gcps()
        t = GCPPolynomialTransformer(px, py, gx, gy, order=1)
        fx, fy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(fx, gx, atol=1e-9)
        np.testing.assert_allclose(fy, gy, atol=1e-9)
        assert t.rms < 1e-9
        bx, by = t.geo_to_pixel(gx, gy)
        np.testing.assert_allclose(bx, px, atol=1e-8)
        np.testing.assert_allclose(by, py, atol=1e-8)

    def test_order2_recovers_quadratic(self):
        rng = np.random.default_rng(1)
        px = rng.uniform(0, 100, 20)
        py = rng.uniform(0, 100, 20)
        gx = 1.0 + 2 * px + 3 * py + 0.01 * px * px - 0.02 * px * py
        gy = -5.0 + 0.5 * px - 1.5 * py + 0.005 * py * py
        t = GCPPolynomialTransformer(px, py, gx, gy, order=2)
        fx, fy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(fx, gx, rtol=1e-8)
        np.testing.assert_allclose(fy, gy, rtol=1e-8)

    def test_min_gcp_requirements(self):
        px, py, gx, gy = affine_gcps(5)
        with pytest.raises(ValueError):
            GCPPolynomialTransformer(px, py, gx, gy, order=2)  # needs 6
        with pytest.raises(ValueError):
            GCPPolynomialTransformer(px, py, gx, gy, order=3)  # needs 10


class TestTPS:
    def test_exact_at_gcps_and_smooth_between(self):
        rng = np.random.default_rng(2)
        px = rng.uniform(0, 100, 15)
        py = rng.uniform(0, 100, 15)
        # a smooth warp: affine + sinusoidal bump
        gx = 2 * px + 10 * np.sin(py / 30)
        gy = 3 * py + 5 * np.cos(px / 25)
        t = TPSTransformer(px, py, gx, gy)
        fx, fy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(fx, gx, atol=1e-8)  # interpolating spline
        np.testing.assert_allclose(fy, gy, atol=1e-8)
        # roundtrip via the inverse spline is approximate but close
        bx, by = t.geo_to_pixel(*t.pixel_to_geo(px, py))
        np.testing.assert_allclose(bx, px, atol=1e-6)
        np.testing.assert_allclose(by, py, atol=1e-6)

    def test_affine_reproduced_between_points(self):
        px, py, gx, gy = affine_gcps(10, seed=3)
        t = TPSTransformer(px, py, gx, gy)
        qx = np.asarray([500.0, 123.0])
        qy = np.asarray([400.0, 456.0])
        fx, fy = t.pixel_to_geo(qx, qy)
        np.testing.assert_allclose(fx, 500.0 + 0.25 * qx - 0.05 * qy, atol=1e-6)
        np.testing.assert_allclose(fy, -200.0 + 0.03 * qx + 0.4 * qy, atol=1e-6)


class TestRPC:
    def _identityish_rpc(self):
        # RPC encoding an affine-ish mapping: samp = 1000*(L + 0.1*P),
        # line = 800*(P - 0.05*L) with trivial denominators
        num_s = [0.0] * 20
        num_s[1] = 1.0
        num_s[2] = 0.1
        num_l = [0.0] * 20
        num_l[2] = 1.0
        num_l[1] = -0.05
        den = [0.0] * 20
        den[0] = 1.0
        return {
            "LONG_OFF": 10.0, "LONG_SCALE": 2.0,
            "LAT_OFF": 45.0, "LAT_SCALE": 1.5,
            "HEIGHT_OFF": 0.0, "HEIGHT_SCALE": 100.0,
            "SAMP_OFF": 2000.0, "SAMP_SCALE": 1000.0,
            "LINE_OFF": 1500.0, "LINE_SCALE": 800.0,
            "SAMP_NUM_COEFF": num_s, "SAMP_DEN_COEFF": den,
            "LINE_NUM_COEFF": num_l, "LINE_DEN_COEFF": den,
        }

    def test_forward_matches_closed_form(self):
        t = RPCTransformer(self._identityish_rpc())
        lon = np.asarray([10.5, 9.2])
        lat = np.asarray([45.3, 44.8])
        sx, sy = t.geo_to_pixel(lon, lat)
        L = (lon - 10.0) / 2.0
        P = (lat - 45.0) / 1.5
        np.testing.assert_allclose(sx, (L + 0.1 * P) * 1000.0 + 2000.0)
        np.testing.assert_allclose(sy, (P - 0.05 * L) * 800.0 + 1500.0)

    def test_iterative_inverse_roundtrip(self):
        t = RPCTransformer(self._identityish_rpc())
        lon = np.asarray([10.7, 9.5, 10.0])
        lat = np.asarray([45.1, 44.6, 45.9])
        sx, sy = t.geo_to_pixel(lon, lat)
        lo, la = t.pixel_to_geo(sx, sy)
        np.testing.assert_allclose(lo, lon, atol=1e-8)
        np.testing.assert_allclose(la, lat, atol=1e-8)

    def test_rational_denominator(self):
        c = self._identityish_rpc()
        c["SAMP_DEN_COEFF"] = [1.0, 0.1] + [0.0] * 18  # 1 + 0.1 L
        t = RPCTransformer(c)
        lon = np.asarray([10.5])
        lat = np.asarray([45.0])
        sx, _sy = t.geo_to_pixel(lon, lat)
        L = (10.5 - 10.0) / 2.0
        np.testing.assert_allclose(sx, (L / (1 + 0.1 * L)) * 1000.0 + 2000.0)
        lo, la = t.pixel_to_geo(*t.geo_to_pixel(lon, lat))
        np.testing.assert_allclose(lo, lon, atol=1e-8)


def test_reproject_stage_with_gcp_transformer():
    import pyarrow as pa
    import ray.data

    from lib_gdal_ray.stages.reproject import reproject

    px, py, gx, gy = affine_gcps()
    t = GCPPolynomialTransformer(px, py, gx, gy, order=1)
    ds = ray.data.from_arrow(pa.table({
        "lon": pa.array([100.0, 200.0]), "lat": pa.array([50.0, 300.0])}))
    out = reproject(ds, transformer=t, out_x="gx", out_y="gy").to_pandas()
    np.testing.assert_allclose(out["gx"], 500.0 + 0.25 * out["lon"] - 0.05 * out["lat"],
                               atol=1e-8)
    np.testing.assert_allclose(out["gy"], -200.0 + 0.03 * out["lon"] + 0.4 * out["lat"],
                               atol=1e-8)


class TestHomography:
    """alg/gdal_homography.cpp analog: projective DLT fit."""

    def _gt(self):
        # a genuine perspective map (nonzero bottom row)
        H = np.array([[1.2, 0.1, 30.0],
                      [-0.05, 0.9, -12.0],
                      [1e-4, -2e-4, 1.0]])
        return H

    def test_exact_recovery_from_4_points(self):
        from lib_gdal_ray.geom.gcp import HomographyTransformer

        H = self._gt()
        px = np.array([0.0, 100.0, 0.0, 100.0, 37.0, 81.0])
        py = np.array([0.0, 0.0, 80.0, 80.0, 55.0, 13.0])
        w = H[2, 0] * px + H[2, 1] * py + 1.0
        gx = (H[0, 0] * px + H[0, 1] * py + H[0, 2]) / w
        gy = (H[1, 0] * px + H[1, 1] * py + H[1, 2]) / w
        t = HomographyTransformer(px, py, gx, gy)
        assert t.rms < 1e-9
        fx, fy = t.pixel_to_geo(px, py)
        np.testing.assert_allclose(fx, gx, atol=1e-9)
        np.testing.assert_allclose(fy, gy, atol=1e-9)
        bx, by = t.geo_to_pixel(gx, gy)
        np.testing.assert_allclose(bx, px, atol=1e-8)
        np.testing.assert_allclose(by, py, atol=1e-8)

    def test_beats_order1_on_perspective(self):
        from lib_gdal_ray.geom.gcp import (GCPPolynomialTransformer,
                                           HomographyTransformer)

        H = self._gt()
        rng = np.random.default_rng(2)
        px = rng.uniform(0, 200, 40)
        py = rng.uniform(0, 150, 40)
        w = H[2, 0] * px + H[2, 1] * py + 1.0
        gx = (H[0, 0] * px + H[0, 1] * py + H[0, 2]) / w
        gy = (H[1, 0] * px + H[1, 1] * py + H[1, 2]) / w
        hom = HomographyTransformer(px, py, gx, gy)
        poly = GCPPolynomialTransformer(px, py, gx, gy, order=1)
        assert hom.rms < poly.rms / 10

    def test_needs_4(self):
        from lib_gdal_ray.geom.gcp import HomographyTransformer

        with np.testing.assert_raises(ValueError):
            HomographyTransformer([0, 1, 2], [0, 1, 0], [0, 1, 2],
                                  [0, 1, 0])


class TestGeoloc:
    """alg/gdalgeoloc.cpp analog: geolocation-array transformer."""

    def _grid(self, ny=40, nx=60):
        gj, gi = np.meshgrid(np.arange(nx, dtype=float),
                             np.arange(ny, dtype=float))
        # smooth non-affine surface: rotation + gentle sinusoidal warp
        lon = 10.0 + 0.01 * gj + 0.002 * gi + 0.05 * np.sin(gi / 12.0)
        lat = 50.0 - 0.008 * gi + 0.001 * gj + 0.04 * np.cos(gj / 15.0)
        return lon, lat

    def test_forward_matches_grid_nodes(self):
        from lib_gdal_ray.geom.gcp import GeolocTransformer

        lon, lat = self._grid()
        t = GeolocTransformer(lon, lat)
        fx, fy = t.pixel_to_geo(np.array([5.0, 30.0]),
                                np.array([7.0, 20.0]))
        np.testing.assert_allclose(fx, lon[[7, 20], [5, 30]], rtol=0)
        np.testing.assert_allclose(fy, lat[[7, 20], [5, 30]], rtol=0)

    def test_roundtrip_interior(self):
        from lib_gdal_ray.geom.gcp import GeolocTransformer

        lon, lat = self._grid()
        t = GeolocTransformer(lon, lat)
        rng = np.random.default_rng(8)
        px = rng.uniform(2, 57, 500)
        py = rng.uniform(2, 37, 500)
        gx, gy = t.pixel_to_geo(px, py)
        bx, by = t.geo_to_pixel(gx, gy)
        assert np.abs(bx - px).max() < 1e-6
        assert np.abs(by - py).max() < 1e-6

    def test_offsets_and_steps(self):
        from lib_gdal_ray.geom.gcp import GeolocTransformer

        lon, lat = self._grid(20, 30)
        # geoloc arrays subsampled 4x with a 2-pixel origin offset
        t = GeolocTransformer(lon, lat, pixel_offset=2, line_offset=2,
                              pixel_step=4, line_step=4)
        gx, gy = t.pixel_to_geo(np.array([2.0 + 4 * 7]),
                                np.array([2.0 + 4 * 5]))
        np.testing.assert_allclose(gx, lon[5, 7])
        np.testing.assert_allclose(gy, lat[5, 7])
        bx, by = t.geo_to_pixel(gx, gy)
        np.testing.assert_allclose(bx, 2.0 + 4 * 7, atol=1e-6)
        np.testing.assert_allclose(by, 2.0 + 4 * 5, atol=1e-6)
