"""OGR vector VRT (ogr/ogrsf_frmts/vrt/ogrvrtlayer.cpp)."""
import numpy as np
import pytest

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.sources import vrt_vector as vv


def test_parse_layers():
    text = """<OGRVRTDataSource>
      <OGRVRTLayer name="a">
        <SrcDataSource relativeToVRT="1">pts.csv</SrcDataSource>
        <GeometryType>wkbPoint</GeometryType>
        <GeometryField encoding="PointFromColumns" x="x" y="y"/>
        <LayerSRS>WGS84</LayerSRS>
      </OGRVRTLayer>
      <OGRVRTLayer name="b">
        <SrcDataSource>abs.csv</SrcDataSource>
        <GeometryField encoding="WKT" field="wkt"/>
      </OGRVRTLayer>
    </OGRVRTDataSource>"""
    layers = vv.parse_vrt_vector(text)
    assert [l.name for l in layers] == ["a", "b"]
    a, b = layers
    assert a.relative and a.encoding == "PointFromColumns"
    assert (a.x_field, a.y_field, a.srs) == ("x", "y", "WGS84")
    assert not b.relative and b.encoding == "WKT" and b.wkt_field == "wkt"


def test_point_from_columns(ray_session, tmp_path):
    (tmp_path / "pts.csv").write_text("id,x,y\n1,10.0,20.0\n2,30.0,40.0\n")
    (tmp_path / "l.vrt").write_text("""<OGRVRTDataSource>
      <OGRVRTLayer name="pts">
        <SrcDataSource relativeToVRT="1">pts.csv</SrcDataSource>
        <GeometryField encoding="PointFromColumns" x="x" y="y"/>
      </OGRVRTLayer>
    </OGRVRTDataSource>""")
    df = vv.read_vrt_vector(str(tmp_path / "l.vrt")).to_pandas()
    assert len(df) == 2
    kind, p = wkbm.parse_wkb(df["geometry"][0])
    assert kind == "point" and tuple(p[0]) == (10.0, 20.0)


def test_wkt_field(ray_session, tmp_path):
    (tmp_path / "z.csv").write_text(
        'id,wkt\n7,"POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"\n')
    (tmp_path / "w.vrt").write_text("""<OGRVRTDataSource>
      <OGRVRTLayer name="z">
        <SrcDataSource relativeToVRT="1">z.csv</SrcDataSource>
        <GeometryField encoding="WKT" field="wkt"/>
      </OGRVRTLayer>
    </OGRVRTDataSource>""")
    df = vv.read_vrt_vector(str(tmp_path / "w.vrt")).to_pandas()
    kind, rings = wkbm.parse_wkb(df["geometry"][0])
    assert kind == "polygon" and len(rings[0]) == 5


def test_layer_selection_and_errors(ray_session, tmp_path):
    (tmp_path / "pts.csv").write_text("id,x,y\n1,0,0\n")
    (tmp_path / "m.vrt").write_text("""<OGRVRTDataSource>
      <OGRVRTLayer name="one">
        <SrcDataSource relativeToVRT="1">pts.csv</SrcDataSource>
        <GeometryField encoding="PointFromColumns" x="x" y="y"/>
      </OGRVRTLayer>
      <OGRVRTLayer name="two">
        <SrcDataSource relativeToVRT="1">pts.csv</SrcDataSource>
        <GeometryField encoding="PointFromColumns" x="x" y="y"/>
      </OGRVRTLayer>
    </OGRVRTDataSource>""")
    df = vv.read_vrt_vector(str(tmp_path / "m.vrt"), layer="two").to_pandas()
    assert len(df) == 1
    with pytest.raises(KeyError):
        vv.read_vrt_vector(str(tmp_path / "m.vrt"), layer="three")
    with pytest.raises(ValueError):
        vv.parse_vrt_vector("<VRTDataset/>")


def test_read_vector_dispatch(ray_session, tmp_path):
    """read_vector (OGROpen analog) routes parquet and gpx."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    pq.write_table(pa.table({"a": [1, 2, 3]}), tmp_path / "t.parquet")
    assert vv.read_vector(str(tmp_path / "t.parquet")).count() == 3
    (tmp_path / "g.gpx").write_text(
        '<gpx xmlns="http://www.topografix.com/GPX/1/1">'
        '<wpt lat="1.0" lon="2.0"/></gpx>')
    assert vv.read_vector(str(tmp_path / "g.gpx")).count() == 1
