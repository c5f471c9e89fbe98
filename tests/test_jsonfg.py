"""JSON-FG driver pinned against `autotest/ogr/ogr_jsonfg.py`
expectations (curve WKTs, prism expansion, CRS axis handling, time
fields)."""

import json

import pytest

from lib_gdal_ray.geom import iso
from lib_gdal_ray.sources.jsonfg import parse_jsonfg, read_jsonfg, \
    write_jsonfg

DATA = "/root/reference/autotest/ogr/data/jsonfg"


def _wkt_of(path_or_text, **kw):
    if path_or_text.startswith("{"):
        t, meta = parse_jsonfg(path_or_text, **kw)
    else:
        t, meta = parse_jsonfg(open(path_or_text).read(), **kw)
    wkb = t["geometry"][0].as_py()
    return iso.wkb_to_iso_wkt(wkb), t, meta


# test_jsonfg_read_write_geoms expected WKTs (ogr_jsonfg.py:1422-1520)
CURVE_WKTS = [
    ("CircularString", "CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5)"),
    ("CircularStringZ",
     "CIRCULARSTRING Z (2.5 49.5 10.5,3.5 50.5 11.5,4.5 49.5 12.5)"),
    ("CircularStringM",
     "CIRCULARSTRING M (2.5 49.5 100.5,3.5 50.5 101.5,4.5 49.5 102.5)"),
    ("CircularStringZM",
     "CIRCULARSTRING ZM (2.5 49.5 10.5 100.5,3.5 50.5 11.5 101.5,"
     "4.5 49.5 12.5 102.5)"),
    ("CompoundCurve",
     "COMPOUNDCURVE (CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5),"
     "(4.5 49.5,5.5 50.5))"),
    ("CompoundCurveZM",
     "COMPOUNDCURVE ZM (CIRCULARSTRING ZM (2.5 49.5 10.5 100.5,"
     "3.5 50.5 11.5 101.5,4.5 49.5 12.5 102.5),(4.5 49.5 12.5 102.5,"
     "5.5 50.5 13.5 103.5))"),
    ("CurvePolygon",
     "CURVEPOLYGON ((10.5 10.5,10.5 20.5,20.5 20.5,20.5 10.5,"
     "10.5 10.5),CIRCULARSTRING (11.5 15.5,15.5 19.5,19.5 15.5,"
     "15.5 11.5,11.5 15.5),COMPOUNDCURVE ((13.5 13.5,13.5 17.5,"
     "17.5 17.5),(17.5 17.5,17.5 13.5,13.5 13.5)))"),
    ("MultiCurve",
     "MULTICURVE (CIRCULARSTRING (2.5 49.5,3.5 50.5,4.5 49.5),"
     "(4.5 49.5,5.5 50.5),COMPOUNDCURVE ((2.5 49.5,3.5 50.5),"
     "(3.5 50.5,4.5 49.5)))"),
    ("MultiSurface",
     "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (10.5 10.5,"
     "10.5 20.5,20.5 20.5,20.5 10.5,10.5 10.5)),((100 100,100 200,"
     "200 200,100 100)))"),
    ("MultiSurfaceZM",
     "MULTISURFACE ZM (CURVEPOLYGON ZM (CIRCULARSTRING ZM "
     "(10.5 10.5 11.5 100.5,10.5 20.5 12.5 101.5,20.5 20.5 13.5 102.5,"
     "20.5 10.5 14.5 103.5,10.5 10.5 11.5 100.5)),((100 100 10.5 -100.5,"
     "100 200 11.5 -101.5,200 200 12.5 -102.5,100 100 10.5 -100.5)))"),
]


@pytest.mark.parametrize("name,wkt", CURVE_WKTS,
                         ids=[c[0] for c in CURVE_WKTS])
def test_jsonfg_curve_geoms(name, wkt):
    got, _t, _m = _wkt_of(f"{DATA}/{name}.json")
    assert got == wkt


def test_jsonfg_prisms():
    # ogr_jsonfg.py:621-662
    got, _t, _m = _wkt_of(f"{DATA}/pylon.json")
    assert got == ("LINESTRING Z (81220.15 455113.71 2.02,"
                   "81220.15 455113.71 8.02)")
    got, _t, _m = _wkt_of(f"{DATA}/fence.json")
    assert got == ("MULTIPOLYGON Z (((81220.15 455113.71 2.02,"
                   "81223.15 455116.71 2.02,81223.15 455116.71 3.22,"
                   "81220.15 455113.71 3.22,81220.15 455113.71 2.02)))")
    got, _t, _m = _wkt_of(f"{DATA}/prism_with_polygon_base.json")
    assert got == (
        "POLYHEDRALSURFACE Z (((0 0 10,1 0 10,0 2 10,0 0 10)),"
        "((0 0 10,1 0 10,1 0 20,0 0 20,0 0 10)),"
        "((1 0 10,0 2 10,0 2 20,1 0 20,1 0 10)),"
        "((0 2 10,0 0 10,0 0 20,0 2 20,0 2 10)),"
        "((0 0 20,1 0 20,0 2 20,0 0 20)))")


# (filename, layer epsg, x, y) from test_jsonfg_read_crs
CRS_CASES = [
    ("crs_32631_fc_only.json", 32631, 500000, 4500000),
    ("crs_32631_feat.json", 32631, 500000, 4500000),
    ("crs_32631_fc_and_feat.json", 32631, 500000, 4500000),
    ("crs_32631_fc_geometry_null.json", 32631, 500000, 4500000),
    ("crs_32631_feat_only.json", 32631, 500000, 4500000),
    ("crs_32631_geom_only.json", 32631, 500000, 4500000),
    ("crs_4326_fc_only.json", 4326, 2, 49),
    ("crs_4326_fc_and_feat.json", 4326, 2, 49),
    ("crs_4326_fc_place_null.json", 4326, 2, 49),
    ("crs_4326_feat_only.json", 4326, 2, 49),
    ("crs_none.json", 4326, 2, 49),
    ("crs_4326_fc_32631_feat.json", 32631, 500000, 0),
]


@pytest.mark.parametrize("fn,epsg,x,y", CRS_CASES,
                         ids=[c[0] for c in CRS_CASES])
def test_jsonfg_crs(fn, epsg, x, y):
    wkt, _t, meta = _wkt_of(f"{DATA}/{fn}")
    assert meta["epsg"] == epsg
    assert wkt == f"POINT ({x} {y})"


def test_jsonfg_mixed_feature_crs():
    # crs_none_fc_mixed_feat: layer crs None, per-feature axis order
    t, meta = parse_jsonfg(
        open(f"{DATA}/crs_none_fc_mixed_feat.json").read())
    assert meta["epsg"] is None
    w0 = iso.wkb_to_iso_wkt(t["geometry"][0].as_py())
    w1 = iso.wkb_to_iso_wkt(t["geometry"][1].as_py())
    assert w0 == "POINT (3 0)"
    assert w1 == "POINT (0 10000000)"


def test_jsonfg_time_fields():
    # ogr_jsonfg.py:561-618 (representative rows)
    def doc(times):
        return json.dumps({
            "type": "FeatureCollection",
            "conformsTo": ["[ogc-json-fg-1-0.1:core]"],
            "features": [{"type": "Feature", "properties": {},
                          "geometry": None, "time": t} for t in times]})

    t, _ = parse_jsonfg(doc([{"date": "2023-06-05"}]))
    assert t["time"][0].as_py() == "2023/06/05"
    t, _ = parse_jsonfg(doc([{"timestamp": "2023-06-05T12:34:56Z"}]))
    assert t["time"][0].as_py() == "2023/06/05 12:34:56+00"
    t, _ = parse_jsonfg(doc([{"interval": ["2023-06-05",
                                           "2023-06-06"]}]))
    assert t["time_start"][0].as_py() == "2023/06/05"
    assert t["time_end"][0].as_py() == "2023/06/06"
    t, _ = parse_jsonfg(doc([{"interval": ["2023-06-05", ".."]}]))
    assert t["time_start"][0].as_py() == "2023/06/05"
    assert t["time_end"][0].as_py() is None
    # mixed date + timestamp promotes to datetime
    t, _ = parse_jsonfg(doc([{"date": "2023-06-05"},
                             {"timestamp": "2023-06-05T12:34:56Z"}]))
    assert t["time"][0].as_py() == "2023/06/05 00:00:00"
    assert t["time"][1].as_py() == "2023/06/05 12:34:56+00"


def test_jsonfg_time_property_collision():
    # ogr_jsonfg.py:594-618: property "time" wins, jsonfg_time added
    t, _ = parse_jsonfg(json.dumps({
        "type": "FeatureCollection",
        "conformsTo": ["[ogc-json-fg-1-0.1:core]"],
        "features": [{"type": "Feature",
                      "properties": {"time": "my_time"},
                      "geometry": None,
                      "time": {"date": "2023-06-05"}}]}))
    assert t["time"][0].as_py() == "my_time"
    assert t["jsonfg_time"][0].as_py() == "2023/06/05"


@pytest.mark.parametrize("wkt", [w for _n, w in CURVE_WKTS] + [
    "POINT (1.5 2.5)", "POINT Z (1.5 2.5 3.5)", "POINT M (1.5 2.5 4.5)",
    "POINT ZM (1.5 2.5 3.5 4.5)",
    "POLYHEDRALSURFACE Z (((0 0 10,0 1 10,1 1 10,0 0 10)))"])
def test_jsonfg_write_read_roundtrip(wkt, tmp_path, ray_session):
    import ray.data

    ds = ray.data.from_items(
        [{"name": "a", "geometry": iso.iso_wkt_to_wkb(wkt)}])
    out = str(tmp_path / "out.json")
    write_jsonfg(ds, out, epsg=4326 if "Z" not in wkt else 4979)
    data = open(out).read()
    # conformsTo markers (ogr_jsonfg.py:1552-1565)
    if wkt.startswith("POINT") or wkt.startswith("POLYHEDRALSURFACE"):
        assert "/conf/circular-arcs" not in data
    else:
        assert "/conf/circular-arcs" in data
    if " M" in wkt or " ZM" in wkt:
        assert "/conf/measures" in data
    else:
        assert "/conf/measures" not in data
    if wkt.startswith("POLYHEDRALSURFACE"):
        assert "/conf/polyhedra" in data
    else:
        assert "/conf/polyhedra" not in data
    back = read_jsonfg(out).take_all()
    assert len(back) == 1
    assert iso.wkb_to_iso_wkt(bytes(back[0]["geometry"])) == wkt
    assert back[0]["name"] == "a"
