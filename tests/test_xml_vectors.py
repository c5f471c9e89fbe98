"""GPX + KML drivers (ogr/ogrsf_frmts/gpx, ogr/ogrsf_frmts/kml)."""
import numpy as np
import pytest

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.sources import xml_vectors as xv


GPX_SAMPLE = """<?xml version="1.0"?>
<gpx version="1.1" creator="x" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="48.2" lon="16.37"><ele>151.0</ele><name>Wien</name></wpt>
  <wpt lat="47.07" lon="15.43"><name>Graz</name></wpt>
  <rte><name>r1</name>
    <rtept lat="0.0" lon="0.0"/><rtept lat="1.0" lon="1.0"/>
  </rte>
  <trk><name>t1</name>
    <trkseg><trkpt lat="10.0" lon="20.0"/><trkpt lat="11.0" lon="21.0"/></trkseg>
    <trkseg><trkpt lat="12.0" lon="22.0"/><trkpt lat="13.0" lon="23.0"/></trkseg>
  </trk>
</gpx>"""

KML_SAMPLE = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document>
  <Folder>
    <Placemark><name>p1</name>
      <Point><coordinates>16.37,48.2,151</coordinates></Point>
    </Placemark>
  </Folder>
  <Placemark><name>line</name>
    <LineString><coordinates>0,0 1,1 2,0</coordinates></LineString>
  </Placemark>
  <Placemark><name>poly</name>
    <Polygon><outerBoundaryIs><LinearRing>
      <coordinates>0,0 4,0 4,4 0,4 0,0</coordinates>
    </LinearRing></outerBoundaryIs>
    <innerBoundaryIs><LinearRing>
      <coordinates>1,1 2,1 2,2 1,2 1,1</coordinates>
    </LinearRing></innerBoundaryIs></Polygon>
  </Placemark>
</Document>
</kml>"""


def test_parse_gpx_layers():
    feats = xv._parse_gpx(GPX_SAMPLE)
    by_layer = {}
    for f in feats:
        by_layer.setdefault(f["layer"], []).append(f)
    assert len(by_layer["waypoints"]) == 2
    w = by_layer["waypoints"][0]
    assert (w["lon"], w["lat"], w["ele"], w["name"]) == (16.37, 48.2, 151.0,
                                                         "Wien")
    r = by_layer["routes"][0]
    kind, pts = wkbm.parse_wkb(r["geometry"])
    assert kind == "linestring" and len(pts) == 2
    t = by_layer["tracks"][0]
    kind, segs = wkbm.parse_wkb(t["geometry"])
    assert kind == "multilinestring" and len(segs) == 2
    assert t["n_points"] == 4


def test_parse_kml_placemarks():
    feats = xv._parse_kml(KML_SAMPLE)
    assert [f["name"] for f in feats] == ["p1", "line", "poly"]
    kind, p = wkbm.parse_wkb(feats[0]["geometry"])
    assert kind == "point" and tuple(p[0]) == (16.37, 48.2)
    kind, ls = wkbm.parse_wkb(feats[1]["geometry"])
    assert kind == "linestring" and len(ls) == 3
    kind, rings = wkbm.parse_wkb(feats[2]["geometry"])
    assert kind == "polygon" and len(rings) == 2  # outer + hole


def test_gpx_ray_roundtrip(ray_session, tmp_path):
    import ray.data

    (tmp_path / "in.gpx").write_text(GPX_SAMPLE)
    ds = xv.read_gpx(str(tmp_path / "in.gpx"))
    df = ds.to_pandas()
    assert len(df) == 4
    wpts = xv.read_gpx(str(tmp_path / "in.gpx"), layer="waypoints")
    n = xv.write_gpx(wpts, str(tmp_path / "out.gpx"), name_col="name")
    assert n == 2
    back = xv.read_gpx(str(tmp_path / "out.gpx")).to_pandas()
    assert sorted(back["name"]) == ["Graz", "Wien"]
    assert sorted(back["lon"]) == [15.43, 16.37]


def test_kml_ray_roundtrip(ray_session, tmp_path):
    (tmp_path / "in.kml").write_text(KML_SAMPLE)
    ds = xv.read_kml(str(tmp_path / "in.kml"))
    n = xv.write_kml(ds, str(tmp_path / "out.kml"), name_col="name")
    assert n == 3
    back = xv.read_kml(str(tmp_path / "out.kml")).to_pandas()
    assert sorted(back["name"]) == ["line", "p1", "poly"]
    # polygon hole survives the roundtrip
    poly = back[back["name"] == "poly"]["geometry"].iloc[0]
    kind, rings = wkbm.parse_wkb(poly)
    assert kind == "polygon" and len(rings) == 2


def test_kml_escapes_names(ray_session, tmp_path):
    import ray.data

    pt = wkbm.points_to_wkb(np.array([1.0]), np.array([2.0]))[0]
    ds = ray.data.from_items([{"geometry": pt, "name": "a <b> & c"}])
    xv.write_kml(ds, str(tmp_path / "e.kml"), name_col="name")
    back = xv.read_kml(str(tmp_path / "e.kml")).to_pandas()
    assert back["name"][0] == "a <b> & c"
