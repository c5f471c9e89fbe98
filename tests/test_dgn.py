"""MicroStation DGN v7 reader parity (sources/dgn.py) vs
autotest/ogr/ogr_dgn.py on smalltest.dgn."""

import numpy as np
import pytest

from lib_gdal_ray.geom.wkb import parse_wkb, wkb_to_points
from lib_gdal_ray.sources.dgn import identify_dgn, read_dgn

FIX = "/root/reference/autotest/ogr/data/dgn/smalltest.dgn"


def _frame(ray_session):
    return read_dgn(FIX).to_pandas()


def test_identify():
    with open(FIX, "rb") as fh:
        assert identify_dgn(fh.read(16))


def test_text_point(ray_session):
    """ogr_dgn.py:47-64 — Type 17 Level 1, 'Demo Text',
    POINT (0.7365 4.2198)."""
    df = _frame(ray_session)
    f = df.iloc[0]
    assert f["Type"] == 17 and f["Level"] == 1
    assert f["Text"] == "Demo Text"
    lon, lat = wkb_to_points(np.asarray([f["geometry"]], dtype=object))
    assert lon[0] == pytest.approx(0.7365, abs=1e-7)
    assert lat[0] == pytest.approx(4.2198, abs=1e-7)


def test_circle_stroked(ray_session):
    """ogr_dgn.py:71-103 — Type 15 Level 2 circle as a stroked 2D
    LINESTRING with the expected envelope."""
    df = _frame(ray_session)
    f = df.iloc[1]
    assert f["Type"] == 15 and f["Level"] == 2
    kind, pts = parse_wkb(f["geometry"])
    assert kind == "linestring" and len(pts) >= 15
    xs, ys = pts[:, 0], pts[:, 1]
    assert 0.328593 <= xs.min() <= 0.328594
    assert 9.68780 <= xs.max() <= 9.68781
    assert -0.09611 <= ys.min() <= -0.09610
    assert 9.26310 <= ys.max() <= 9.26311


def test_shape_polygon(ray_session):
    """ogr_dgn.py:110-126 — Type 6 Level 2 ColorIndex 83 polygon."""
    df = _frame(ray_session)
    f = df.iloc[2]
    assert f["Type"] == 6 and f["Level"] == 2 and f["ColorIndex"] == 83
    kind, rings = parse_wkb(f["geometry"])
    assert kind == "polygon"
    exp = np.array([[4.5355, 3.317], [4.3832, 2.6517], [4.9441, 2.5235],
                    [4.832, 3.3331], [4.5355, 3.317]])
    np.testing.assert_allclose(rings[0], exp, atol=1e-7)


def test_attribute_selection(ray_session):
    """ogr_dgn.py:137-143 — Type = 15 AND Level = 2 picks exactly the
    circle."""
    df = _frame(ray_session)
    sel = df[(df["Type"] == 15) & (df["Level"] == 2)]
    assert sel["Type"].tolist() == [15]


def test_read_vector_dispatch(ray_session):
    from lib_gdal_ray.sources.vrt_vector import read_vector

    df = read_vector(FIX).to_pandas()
    assert len(df) == 4 and "geometry" in df.columns
