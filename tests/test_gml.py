"""GML driver (ogr/ogrsf_frmts/gml, gml2ogrgeometry.cpp)."""
import numpy as np
import pytest

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.sources import gml as gm

GML_SAMPLE = """<?xml version="1.0" encoding="utf-8" ?>
<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/"
    xmlns:gml="http://www.opengis.net/gml">
  <gml:featureMember>
    <ogr:zone gml:id="zone.0">
      <ogr:geometryProperty><gml:Polygon><gml:outerBoundaryIs>
        <gml:LinearRing><gml:coordinates>0,0 4,0 4,4 0,4 0,0</gml:coordinates></gml:LinearRing>
      </gml:outerBoundaryIs><gml:innerBoundaryIs>
        <gml:LinearRing><gml:coordinates>1,1 2,1 2,2 1,2 1,1</gml:coordinates></gml:LinearRing>
      </gml:innerBoundaryIs></gml:Polygon></ogr:geometryProperty>
      <ogr:name>alpha</ogr:name>
      <ogr:rank>3</ogr:rank>
    </ogr:zone>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:zone gml:id="zone.1">
      <ogr:geometryProperty><gml:Point><gml:pos>10 20</gml:pos></gml:Point></ogr:geometryProperty>
      <ogr:name>beta</ogr:name>
    </ogr:zone>
  </gml:featureMember>
</ogr:FeatureCollection>"""


def test_parse_features_and_geometries():
    feats = gm.parse_gml(GML_SAMPLE)
    assert len(feats) == 2
    assert feats[0]["fid"] == "zone.0" and feats[0]["name"] == "alpha"
    assert feats[0]["rank"] == "3"
    kind, rings = wkbm.parse_wkb(feats[0]["geometry"])
    assert kind == "polygon" and len(rings) == 2
    kind, p = wkbm.parse_wkb(feats[1]["geometry"])
    assert kind == "point" and tuple(p[0]) == (10.0, 20.0)


def test_lenient_coordinate_separators():
    # GDAL layout: ordinates by ",", tuples by " "
    assert gm._parse_coordinates("0,0 1,2 3,4") == [(0, 0), (1, 2), (3, 4)]
    # reversed layout found in GDAL's own test data
    assert gm._parse_coordinates("0 0,1 2,3 4") == [(0, 0), (1, 2), (3, 4)]
    # posList-style plain whitespace
    assert gm._parse_coordinates("0 0 1 2") == [(0, 0), (1, 2)]


def test_poslist_and_exterior():
    text = """<gml:Polygon xmlns:gml="http://www.opengis.net/gml">
      <gml:exterior><gml:LinearRing>
        <gml:posList>0 0 2 0 2 2 0 0</gml:posList>
      </gml:LinearRing></gml:exterior></gml:Polygon>"""
    import xml.etree.ElementTree as ET
    w = gm.gml_geom_to_wkb(ET.fromstring(text))
    kind, rings = wkbm.parse_wkb(w)
    assert kind == "polygon" and len(rings[0]) == 4


def test_multipolygon():
    text = """<gml:MultiPolygon xmlns:gml="http://www.opengis.net/gml">
      <gml:polygonMember><gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
        <gml:coordinates>0,0 1,0 1,1 0,0</gml:coordinates>
      </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon></gml:polygonMember>
      <gml:polygonMember><gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
        <gml:coordinates>5,5 6,5 6,6 5,5</gml:coordinates>
      </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon></gml:polygonMember>
    </gml:MultiPolygon>"""
    import xml.etree.ElementTree as ET
    w = gm.gml_geom_to_wkb(ET.fromstring(text))
    kind, polys = wkbm.parse_wkb(w)
    assert kind == "multipolygon" and len(polys) == 2


def test_ray_read_write_roundtrip(ray_session, tmp_path):
    (tmp_path / "in.gml").write_text(GML_SAMPLE)
    ds = gm.read_gml(str(tmp_path / "in.gml"), properties=["name"])
    df = ds.to_pandas()
    assert sorted(df["name"]) == ["alpha", "beta"]
    n = gm.write_gml(ds.drop_columns(["path", "fid"]),
                     str(tmp_path / "out.gml"), layer="zone")
    assert n == 2
    back = gm.read_gml(str(tmp_path / "out.gml"),
                       properties=["name"]).to_pandas()
    assert sorted(back["name"]) == ["alpha", "beta"]
    # the hole survives
    polys = [g for g in back["geometry"] if wkbm.parse_wkb(g)[0] == "polygon"]
    assert len(wkbm.parse_wkb(polys[0])[1]) == 2
