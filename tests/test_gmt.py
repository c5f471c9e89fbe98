"""GMT ASCII vector driver parity (sources/gmt.py) vs
autotest/ogr/ogr_gmt.py (#3802 multilinestring read; poly.shp
roundtrip with the expected eas_id filter list)."""

import numpy as np

from lib_gdal_ray.geom.wkb import parse_wkb
from lib_gdal_ray.sources.gmt import read_gmt, write_gmt
from lib_gdal_ray.sources.shapefile import read_shapefile


def test_multilinestring_read(ray_session):
    """ogr_gmt.py:102-133 (#3802) — two MULTILINESTRING features with
    typed @D attributes."""
    df = read_gmt(
        "/root/reference/autotest/ogr/data/gmt/test_multi.gmt"
    ).to_pandas()
    assert len(df) == 2
    assert df["id"].tolist() == [1, 2]
    assert df["name"].tolist() == ["feature 1", "feature 2"]
    for i in range(2):
        kind, lines = parse_wkb(df.iloc[i]["geometry"])
        assert kind == "multilinestring"
        assert [len(ln) for ln in lines] == [2, 2]


def test_poly_roundtrip(ray_session, tmp_path):
    """ogr_gmt.py:34-96 — write poly.shp, read back: attributes and
    ring geometry identical; eas_id < 170 yields the expected ids."""
    src = read_shapefile("/root/reference/autotest/ogr/data/poly.shp")
    path = str(tmp_path / "tpoly.gmt")
    assert write_gmt(src, path) == 10
    back = read_gmt(path).to_pandas()
    assert len(back) == 10
    assert back[back["EAS_ID"] < 170]["EAS_ID"].tolist() == \
        [168, 169, 166, 158, 165]
    src_df = src.to_pandas()
    for i in range(10):
        k0, p0 = parse_wkb(src_df.iloc[i]["geometry"])
        k1, p1 = parse_wkb(back.iloc[i]["geometry"])
        assert k0 == k1 == "polygon" and len(p0) == len(p1)
        for a, b in zip(p0, p1):
            np.testing.assert_allclose(a, b, atol=1e-9)
