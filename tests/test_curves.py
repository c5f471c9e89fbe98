"""Curve-geometry round-trips (VERDICT r4 item 6).

Parity: reference curve classes (`ogr/ogr_geometry.h` OGRCircularString
/ OGRCompoundCurve / OGRCurvePolygon / OGRMultiCurve / OGRMultiSurface)
and the WKT forms of `autotest/ogr/ogr_geom.py` curve cases. Curves
must survive WKT<->WKB cycles, GPKG write->read (byte-exact blobs),
attribute-only spec-op chains, and GML3 Curve/segments serialization —
linearization happens only when an op needs coordinates.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.geom.wkt import wkb_to_wkt, wkt_to_wkb

CASES = [
    "CIRCULARSTRING (0 0,1 1,1 -1)",
    "CIRCULARSTRING (0 0,1 0,0 0)",
    "COMPOUNDCURVE ((0 0,1 1),CIRCULARSTRING (1 1,2 0,3 1))",
    "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))",
    "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,2 0),"
    "(2 0,0 0)))",
    "MULTICURVE ((0 0,1 1),CIRCULARSTRING (1 1,2 0,3 1))",
    "MULTISURFACE (CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0)),"
    "((10 10,11 10,11 11,10 10)))",
    "CIRCULARSTRING EMPTY",
    "COMPOUNDCURVE EMPTY",
    "CURVEPOLYGON EMPTY",
    "MULTICURVE EMPTY",
    "MULTISURFACE EMPTY",
]


class TestWktCycle:
    @pytest.mark.parametrize("wkt", CASES)
    def test_wkt_wkb_wkt_stable(self, wkt):
        wkb = wkt_to_wkb(wkt)
        text = wkb_to_wkt(wkb)
        assert wkt_to_wkb(text) == wkb  # cycle is a fixed point
        # the tag survives (no silent linearization to LINESTRING/...)
        assert text.split(" ")[0].split("(")[0] == \
            wkt.split(" ")[0].split("(")[0]

    def test_curved_parse_structure(self):
        k, p = wkbm.parse_wkb_curved(wkt_to_wkb(CASES[2]))
        assert k == "compoundcurve"
        assert [m[0] for m in p] == ["linestring", "circularstring"]
        k, p = wkbm.parse_wkb_curved(wkt_to_wkb(CASES[3]))
        assert k == "curvepolygon" and p[0][0] == "circularstring"

    def test_linearized_path_unchanged(self):
        # processing ops still see the OGR 4-degree linearization
        k, p = wkbm.parse_wkb(wkt_to_wkb(CASES[0]))
        assert k == "linestring" and len(p) > 3

    def test_geom_type_probe(self):
        assert wkbm.wkb_geom_type(wkt_to_wkb(CASES[0])) == 8
        assert wkbm.wkb_geom_type(wkt_to_wkb(CASES[3])) == 10
        assert wkbm.wkb_geom_type(wkt_to_wkb("POINT (1 2)")) == 1


class TestGpkgCurves:
    def test_blob_roundtrip_byte_exact(self, tmp_path):
        from lib_gdal_ray.sources import gpkg as gpkg_mod

        wkbs = [wkt_to_wkb(c) for c in CASES[:7]]
        ds = rd.from_arrow(pa.table({
            "fid_src": pa.array(np.arange(len(wkbs))),
            "geometry": pa.array(wkbs, type=pa.binary())}))
        out = str(tmp_path / "curves")
        gpkg_mod.write_gpkg(ds, out, layer="c",
                            geometry_type="CURVEPOLYGON")
        back = gpkg_mod.read_gpkg(out, layer="c").to_pandas()
        got = {bytes(b) for b in back.geometry}
        assert got == set(wkbs)  # byte-exact: curves preserved


class TestSpecChainPreservesCurves:
    def test_attribute_filter_keeps_bytes(self):
        from lib_gdal_ray.pipelines.spec import _OPS

        wkbs = [wkt_to_wkb(c) for c in CASES[:6]]
        ds = rd.from_arrow(pa.table({
            "id": pa.array(np.arange(len(wkbs), dtype=np.int64)),
            "geometry": pa.array(wkbs, type=pa.binary())}))
        out = _OPS["filter"](ds, where="id >= 2")
        back = out.to_pandas().sort_values("id")
        assert [bytes(b) for b in back.geometry] == wkbs[2:]


class TestGmlCurves:
    @pytest.mark.parametrize("wkt", [
        "CIRCULARSTRING (0 0,1 1,1 -1)",
        "COMPOUNDCURVE ((0 0,1 1),CIRCULARSTRING (1 1,2 0,3 1))",
        "CURVEPOLYGON (CIRCULARSTRING (0 0,1 0,0 0))",
        "CURVEPOLYGON (COMPOUNDCURVE (CIRCULARSTRING (0 0,1 1,2 0),"
        "(2 0,0 0)))",
    ])
    def test_gml3_cycle(self, wkt):
        import xml.etree.ElementTree as ET

        from lib_gdal_ray.sources.gml import gml_geom_to_wkb, wkb_to_gml

        wkb = wkt_to_wkb(wkt)
        xml = wkb_to_gml(wkb)
        el = ET.fromstring(
            xml.replace("gml:", ""))  # strip ns for the bare parser
        back = gml_geom_to_wkb(el)
        assert wkb_to_wkt(back) == wkb_to_wkt(wkb)

    def test_plain_geoms_unaffected(self):
        from lib_gdal_ray.sources.gml import wkb_to_gml

        xml = wkb_to_gml(wkt_to_wkb("POLYGON ((0 0,1 0,1 1,0 0))"))
        assert "<gml:Polygon>" in xml and "<gml:Ring>" not in xml
