"""Panorama SXF parity (sources/sxf.py) vs autotest/ogr/ogr_sxf.py —
layer lists are the reference suite's own pinned expectations
(test_ogr_sxf_3 / test_ogr_sxf_4); the classifier is the reference
driver's own embedded default.rsc."""

import numpy as np
import pytest

from lib_gdal_ray.sources.sxf import (decode_sxf_record, open_sxf,
                                      parse_rsc, parse_sxf_passport,
                                      scan_sxf_records, sxf_layer_names)

SXF = "/root/reference/autotest/ogr/data/sxf/100_test.sxf"
RSC = "/root/reference/ogr/ogrsf_frmts/sxf/data/default.rsc"

FULL_NAMES = [  # test_ogr_sxf_4 expectation, exact order
    "СИСТЕМНЫЙ",
    "ВОДНЫЕ ОБЪЕКТЫ",
    "НАСЕЛЕННЫЕ ПУНКТЫ",
    "ИНФРАСТРУКТУРА",
    "ЗЕМЛЕПОЛЬЗОВАНИЕ",
    "РЕЛЬЕФ СУШИ",
    "ГИДРОГРАФИЯ (РЕЛЬЕФ)",
    "МАТЕМАТИЧЕСКАЯ ОСНОВА",
    "Not_Classified",
]


def test_passport():
    with open(SXF, "rb") as f:
        buf = f.read()
    pp = parse_sxf_passport(buf)
    assert pp["version"] == 4
    assert pp["scale"] == 100000
    assert pp["encoding"] == "cp1251"
    assert pp["has_real_coords"]
    assert pp["n_features"] == 78


def test_layers_fullname():  # test_ogr_sxf_4 (SXF_LAYER_FULLNAME=YES)
    _pp, layers, feats = open_sxf(SXF, rsc_path=RSC, layer_fullname=True)
    assert layers == FULL_NAMES
    assert len(feats) == 78


def test_layers_empty_rsc(tmp_path):  # test_ogr_sxf_3 (fake empty rsc)
    fake = tmp_path / "fake.rsc"
    fake.write_bytes(b"")
    names = sxf_layer_names(SXF, rsc_path=str(fake))
    assert names == ["SYSTEM", "Not_Classified"]


def test_feature_values():
    _pp, _layers, feats = open_sxf(SXF, rsc_path=RSC, layer_fullname=True)
    f0 = feats[0]
    assert f0["CLCODE"] == 31120000
    assert f0["full_code"] == "S31120000"
    assert f0["layer"] == "ВОДНЫЕ ОБЪЕКТЫ"
    assert f0["CLNAME"] == "Водные объекты (общее обозн.)"
    assert f0["semantics"]["SC_4"] == 115.0
    assert f0["semantics"]["SC_32809"] == "100_test.rsc"
    # polygon with one hole (OBJECTNUMB = subobject count)
    f1 = feats[1]
    assert f1["OBJECTNUMB"] == 1
    assert f1["geometry"][:5] == b"\x01\x03\x00\x00\x00"  # POLYGON
    assert f1["geometry"][5:9] == b"\x02\x00\x00\x00"  # 2 rings
    assert f1["semantics"]["SC_9"] == "Лента(Lenta)"
    # every geometry decodes and lands inside the sheet's proj corners
    pp = parse_sxf_passport(open(SXF, "rb").read())
    xs = [c for i, c in enumerate(pp["proj_corners"]) if i % 2]
    lo, hi = min(xs) - 1e7, max(xs) + 1e7
    assert all(f["geometry"] for f in feats)
    # polygon WKB: order(1)+type(4)+nrings(4)+npts(4) -> first x at 13
    assert all(lo < np.frombuffer(f["geometry"][13:21], "<f8")[0] < hi
               for f in feats if f["geometry"][1] == 3)


def test_record_scan_consistency():
    with open(SXF, "rb") as f:
        buf = f.read()
    pp = parse_sxf_passport(buf)
    recs = scan_sxf_records(buf, pp)
    assert len(recs) == 78
    # record chain is contiguous: offsets strictly increasing
    offs = [r["offset"] for r in recs]
    assert offs == sorted(offs)
    # header-scan classify codes match the full decode
    for r in recs[:10]:
        feat = decode_sxf_record(buf, r["offset"], pp)
        assert feat["CLCODE"] == r["clcode"]


def test_ray_read(ray_session):
    from lib_gdal_ray.sources.vrt_vector import read_vector

    df = read_vector(SXF).to_pandas()
    assert len(df) == 78
    assert set(df.columns) >= {"fid", "layer", "CLCODE", "CLNAME",
                               "OBJECTNUMB", "ANGLE", "TEXT", "geometry",
                               "semantics"}
    assert df["geometry"].notna().all()
    # without an RSC sibling the default SYSTEM/Not_Classified split rules
    assert set(df["layer"]) == {"Not_Classified"} or "SYSTEM" in set(
        df["layer"])


def test_default_rsc_sibling(tmp_path):
    import shutil

    sxf = tmp_path / "sheet.sxf"
    shutil.copy(SXF, sxf)
    shutil.copy(RSC, tmp_path / "sheet.rsc")
    _pp, layers, _f = open_sxf(str(sxf), layer_fullname=True)
    assert layers == FULL_NAMES
