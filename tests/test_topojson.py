"""TopoJSON reader parity (sources/topojson.py) vs the reference's
autotest/ogr/ogr_topojson.py — the full 35-row torture matrix of
topojson1 plus the dict-form and no-transform fixtures."""

import numpy as np
import pytest

from lib_gdal_ray.geom.wkb import parse_wkb
from lib_gdal_ray.sources.topojson import read_topojson, topojson_layers

FIX = "/root/reference/autotest/ogr/data/topojson"


def _wkt(b):
    kind, payload = parse_wkb(b)

    def fmt(v):
        return f"{int(v)}" if v == int(v) else f"{v}"

    def seq(a):
        return ",".join(f"{fmt(p[0])} {fmt(p[1])}" for p in a)

    if kind == "point":
        p = np.asarray(payload)[0]
        return "POINT EMPTY" if np.isnan(p[0]) else f"POINT ({seq([p])})"
    if kind == "linestring":
        a = np.asarray(payload)
        return ("LINESTRING EMPTY" if len(a) == 0
                else f"LINESTRING ({seq(a)})")
    if kind == "polygon":
        return ("POLYGON EMPTY" if not payload else
                "POLYGON (" + ",".join(f"({seq(r)})" for r in payload)
                + ")")
    if kind == "multipoint":
        a = np.asarray(payload)
        return ("MULTIPOINT EMPTY" if len(a) == 0
                else f"MULTIPOINT ({seq(a)})")
    if kind == "multilinestring":
        return ("MULTILINESTRING EMPTY" if not payload else
                "MULTILINESTRING ("
                + ",".join(f"({seq(ln)})" for ln in payload) + ")")
    if kind == "multipolygon":
        return ("MULTIPOLYGON EMPTY" if not payload else
                "MULTIPOLYGON (" + ",".join(
                    "(" + ",".join(f"({seq(r)})" for r in rs) + ")"
                    for rs in payload) + ")")
    raise AssertionError(kind)


# ogr_topojson.py:39-95 expected_results, verbatim
EXPECTED = [
    ("foo", None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT EMPTY"),
    (None, None, "POINT (100 1010)"),
] + [(None, None, "LINESTRING EMPTY")] * 8 + [
    (None, "0", "LINESTRING EMPTY"),
    (None, "foo", "LINESTRING EMPTY"),
    ("1", None, "LINESTRING (100 1000,110 1000,110 1100)"),
    ("2", None, "LINESTRING (110 1100,110 1000,100 1000)"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON EMPTY"),
    (None, None, "POLYGON ((100 1000,110 1000,110 1100,100 1100,"
     "100 1000),(101 1010,101 1090,109 1090,109 1010,101 1010))"),
    (None, None, "POLYGON ((110 1100,110 1000,100 1000,100 1100,"
     "110 1100),(101 1010,109 1010,109 1090,101 1090,101 1010))"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT EMPTY"),
    (None, None, "MULTIPOINT (100 1010,101 1020)"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON EMPTY"),
    (None, None, "MULTIPOLYGON (((110 1100,110 1000,100 1000,"
     "100 1100,110 1100)),((101 1010,109 1010,109 1090,101 1090,"
     "101 1010)))"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING EMPTY"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000))"),
    (None, None, "MULTILINESTRING ((100 1000,110 1000,110 1100,"
     "100 1100,100 1000),(101 1010,101 1090,109 1090,109 1010,"
     "101 1010))"),
]


def test_objects_array_full_matrix(ray_session):
    assert topojson_layers(f"{FIX}/topojson1.topojson") == \
        ["a_layer", "TopoJSON"]
    a = read_topojson(f"{FIX}/topojson1.topojson",
                      layer="a_layer").to_pandas()
    assert _wkt(a.iloc[0]["geometry"]) == \
        "LINESTRING (100 1000,110 1000,110 1100)"

    t = read_topojson(f"{FIX}/topojson1.topojson",
                      layer="TopoJSON").to_pandas()
    assert list(t.columns) == ["geometry", "id", "name"]
    assert len(t) == len(EXPECTED)
    for i, (eid, ename, ewkt) in enumerate(EXPECTED):
        gid = t.iloc[i]["id"]
        gname = t.iloc[i]["name"]
        assert (gid if isinstance(gid, str) else None) == eid, i
        assert (gname if isinstance(gname, str) else None) == ename, i
        assert _wkt(t.iloc[i]["geometry"]) == ewkt, i


def test_objects_dict(ray_session):
    """ogr_topojson.py:112-130 — dict-form objects, member key is the
    layer name, properties surface as columns."""
    lyr = read_topojson(f"{FIX}/topojson2.topojson",
                        layer="a_layer").to_pandas()
    assert lyr.iloc[0]["id"] == "foo"
    assert lyr.iloc[0]["name"] == "line"
    assert _wkt(lyr.iloc[0]["geometry"]) == \
        "LINESTRING (100 1000,110 1000,110 1100)"
    cat = read_topojson(f"{FIX}/topojson2.topojson",
                        layer="TopoJSON").to_pandas()
    assert _wkt(cat.iloc[0]["geometry"]) == \
        "LINESTRING (100 1000,110 1000,110 1100)"


def test_no_transform_reversed_arc(ray_session):
    """ogr_topojson.py:133-150 — unquantized absolute arcs; ~i arc
    reversal; shared joint vertex dropped on stitch."""
    for layer in ("a_layer", "TopoJSON"):
        df = read_topojson(f"{FIX}/topojson3.topojson",
                           layer=layer).to_pandas()
        assert _wkt(df.iloc[0]["geometry"]) == \
            "LINESTRING (0 0,10 0,0 10,10 0,0 0)"


def test_read_vector_dispatch(ray_session):
    from lib_gdal_ray.sources.vrt_vector import read_vector

    df = read_vector(f"{FIX}/topojson2.topojson").to_pandas()
    assert len(df) == 1 and "geometry" in df.columns
