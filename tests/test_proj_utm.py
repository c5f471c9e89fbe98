"""UTM (ellipsoidal transverse Mercator) transformer tests."""

import numpy as np
import pytest

from lib_gdal_ray.geom import proj


def test_central_meridian_equator_origin():
    x, y = proj.utm_forward(np.array([3.0]), np.array([0.0]), 31)
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)


def test_roundtrip_sub_mm():
    rng = np.random.default_rng(3)
    lon = rng.uniform(0.2, 5.8, 500)
    lat = rng.uniform(-80, 84, 500)
    x, y = proj.utm_forward(lon, lat, 31)
    lo, la = proj.utm_inverse(x, y, 31)
    assert np.abs(lo - lon).max() < 1e-7
    assert np.abs(la - lat).max() < 1e-7


def test_against_independent_kruger_series():
    """Snyder vs Karney/Krüger 3rd-order-in-n: two independent public
    formulations must agree to ~1 mm inside the zone."""
    a, f, k0 = 6378137.0, 1 / 298.257223563, 0.9996
    n = f / (2 - f)
    A = a / (1 + n) * (1 + n ** 2 / 4 + n ** 4 / 64)
    a1 = n / 2 - 2 * n ** 2 / 3 + 5 * n ** 3 / 16
    a2 = 13 * n ** 2 / 48 - 3 * n ** 3 / 5
    a3 = 61 * n ** 3 / 240
    e = np.sqrt(f * (2 - f))
    rng = np.random.default_rng(4)
    lon = rng.uniform(0.5, 5.5, 300)
    lat = rng.uniform(-79, 83, 300)
    lam = np.radians(lon - 3.0)
    phi = np.radians(lat)
    t = np.tan(phi)
    sig = np.sinh(e * np.arctanh(e * t / np.sqrt(1 + t * t)))
    tp = t * np.sqrt(1 + sig ** 2) - sig * np.sqrt(1 + t * t)
    xi_p = np.arctan2(tp, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(tp ** 2 + np.cos(lam) ** 2))
    xi = (xi_p + a1 * np.sin(2 * xi_p) * np.cosh(2 * eta_p)
          + a2 * np.sin(4 * xi_p) * np.cosh(4 * eta_p)
          + a3 * np.sin(6 * xi_p) * np.cosh(6 * eta_p))
    eta = (eta_p + a1 * np.cos(2 * xi_p) * np.sinh(2 * eta_p)
           + a2 * np.cos(4 * xi_p) * np.sinh(4 * eta_p)
           + a3 * np.cos(6 * xi_p) * np.sinh(6 * eta_p))
    kx, ky = k0 * A * eta + 500000, k0 * A * xi
    sx, sy = proj.utm_forward(lon, lat, 31)
    assert np.abs(kx - sx).max() < 2e-3
    assert np.abs(ky - sy).max() < 2e-3


def test_transformer_registry_utm_codes():
    t = proj.Transformer.get(4326, 32631)
    x, y = t.transform(np.array([3.0]), np.array([45.0]))
    back = proj.Transformer.get(32631, 4326).transform(x, y)
    assert back[0][0] == pytest.approx(3.0, abs=1e-7)
    assert back[1][0] == pytest.approx(45.0, abs=1e-7)
    # south zone false northing
    ts = proj.Transformer.get(4326, 32733)
    _, ny = ts.transform(np.array([15.0]), np.array([-30.0]))
    assert ny[0] > 6_000_000
    # cross-CRS composition through 4326: UTM -> web mercator
    tc = proj.Transformer.get(32631, 3857)
    mx, my = tc.transform(*proj.Transformer.get(4326, 32631).transform(
        np.array([3.0]), np.array([45.0])))
    ex, ey = proj.lonlat_to_mercator(np.array([3.0]), np.array([45.0]))
    assert mx[0] == pytest.approx(ex[0], abs=1e-3)
    assert my[0] == pytest.approx(ey[0], abs=1e-3)


def test_unknown_pair_raises():
    with pytest.raises(NotImplementedError):
        proj.Transformer.get(4326, 2154)


def test_zone_for_lon():
    assert proj.utm_zone_for_lon(np.array([3.0]))[0] == 31
    assert proj.utm_zone_for_lon(np.array([-180.0]))[0] == 1
    assert proj.utm_zone_for_lon(np.array([179.9]))[0] == 60
