"""GTFS driver parity (sources/gtfs.py) vs
autotest/ogr/ogr_gtfs.py on the reference's gtfs_extract.zip."""

import datetime as dtm

import numpy as np
import pytest

from lib_gdal_ray.geom.wkb import parse_wkb, wkb_to_points
from lib_gdal_ray.sources.gtfs import gtfs_layers, read_gtfs

FEED = "/root/reference/autotest/ogr/data/gtfs/gtfs_extract.zip"


def test_layer_registry():
    """ogr_gtfs.py:26-37 — 9 layers; the comma-less error_warning.txt
    member is not a table."""
    layers = gtfs_layers(FEED)
    assert len(layers) == 9
    assert "shapes_geom" in layers and "error_warning" not in layers


def test_agency_and_calendar(ray_session):
    ag = read_gtfs(FEED, "agency").to_pandas()
    assert len(ag) == 1 and ag.iloc[0]["agency_name"] == "SOLEA"
    cal = read_gtfs(FEED, "calendar").to_pandas()
    assert len(cal) == 1
    assert cal.iloc[0]["start_date"] == dtm.date(2023, 1, 2)
    assert cal.iloc[0]["monday"] == 1 and cal.iloc[0]["saturday"] == 0


def test_routes_typed(ray_session):
    rt = read_gtfs(FEED, "routes").to_pandas()
    assert int((rt["route_type"] == 3).sum()) == 30


def test_stops_geometry_and_time(ray_session):
    stp = read_gtfs(FEED, "stops").to_pandas()
    f = stp.iloc[0]
    assert f["arrival_time"] == "05:37:00"
    lon, lat = wkb_to_points(np.asarray([f["geometry"]], dtype=object))
    assert lon[0] == 7.280823 and lat[0] == 47.763704


def test_trips_linestring(ray_session):
    """ogr_gtfs.py:104-110 — trip geometry stitched from
    stop_times(stop_sequence) → stops."""
    tr = read_gtfs(FEED, "trips").to_pandas()
    kind, pts = parse_wkb(tr.iloc[0]["geometry"])
    assert kind == "linestring" and len(pts) == 35
    np.testing.assert_allclose(pts[0], [7.280823, 47.763704])
    np.testing.assert_allclose(pts[-1], [7.336407, 47.809084])


def test_shapes_geom(ray_session):
    sg = read_gtfs(FEED, "shapes_geom").to_pandas()
    assert len(sg) == 1 and sg.iloc[0]["shape_id"] == "80013"
    kind, pts = parse_wkb(sg.iloc[0]["geometry"])
    assert kind == "linestring"
    np.testing.assert_allclose(pts[0], [7.28084, 47.763684])
    np.testing.assert_allclose(pts[-1], [7.336401, 47.809094])


def test_read_vector_dispatch(ray_session):
    from lib_gdal_ray.sources.vrt_vector import read_vector

    # a GTFS zip identifies by its required members (stops layer is
    # the default geometry-bearing layer)
    df = read_vector(FEED, fmt="gtfs").to_pandas()
    assert "geometry" in df.columns and len(df) > 0
    df2 = read_vector(FEED).to_pandas()  # probe path
    assert len(df2) == len(df)
