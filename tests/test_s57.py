"""S-57 / ISO 8211 parity (sources/s57.py, codecs/iso8211.py) vs
autotest/ogr/ogr_s57.py — layer lists, feature counts, attributes and
geometry WKTs are the reference suite's own pinned expectations."""

import os
import re
import struct

import pytest

FIX = "/root/reference/autotest/ogr/data/s57"
CSV = "/root/reference/ogr/ogrsf_frmts/s57/data"
P = f"{FIX}/1B5X02NE.000"

pytestmark = pytest.mark.skipif(not os.path.exists(P),
                                reason="reference S-57 fixtures absent")


def _pts(wkt):
    return [tuple(round(float(v), 8) for v in p.split())
            for p in re.findall(r"(-?[\d.]+ -?[\d.]+)", wkt)]


def _read(path, layer):
    from lib_gdal_ray.sources.s57 import read_s57_table
    return read_s57_table(path, layer=layer, registry_dir=CSV).to_pandas()


# test_ogr_s57_check_layers expectation: (name, count)
LAYERS = [("DSID", 1), ("COALNE", 1), ("DEPARE", 4), ("DEPCNT", 4),
          ("LNDARE", 1), ("LNDELV", 2), ("SBDARE", 2), ("SLCONS", 1),
          ("SLOTOP", 1), ("SOUNDG", 2), ("M_COVR", 1), ("M_NSYS", 1),
          ("M_QUAL", 1)]


def test_layer_list():
    from lib_gdal_ray.sources.s57 import s57_layer_names
    assert set(s57_layer_names(P, registry_dir=CSV)) == \
        {n for n, _ in LAYERS}


@pytest.mark.parametrize("name,count", [x for x in LAYERS if x[0] != "DSID"])
def test_feature_counts(name, count):
    assert len(_read(P, name)) == count


def test_coalne():  # test_ogr_s57_COALNE
    from lib_gdal_ray.geom.wkt import wkb_to_wkt
    df = _read(P, "COALNE")
    r = df.iloc[0]
    assert (r.RCID, r.LNAM, r.OBJL, r.AGEN) == \
        (1, "FFFF7F4F0FB002D3", 30, 65535)
    exp = ("LINESTRING (60.97683400 -32.49442600,60.97718200 -32.49453800,"
           "60.97742400 -32.49477400,60.97774800 -32.49504000,60.97791600 "
           "-32.49547200,60.97793000 -32.49581800,60.97794400 -32.49617800,"
           "60.97804400 -32.49647600,60.97800200 -32.49703800,60.97800200 "
           "-32.49726600,60.97805800 -32.49749400,60.97812800 -32.49773200,"
           "60.97827000 -32.49794800,60.97910200 -32.49848600,60.97942600 "
           "-32.49866600)")
    assert _pts(wkb_to_wkt(r.geometry)) == _pts(exp)


def test_m_qual():  # test_ogr_s57_M_QUAL
    from lib_gdal_ray.geom.wkt import wkb_to_wkt
    df = _read(P, "M_QUAL")
    r = df.iloc[0]
    assert (r.RCID, r.OBJL, r.AGEN) == (15, 308, 65535)
    exp = ("POLYGON ((60.97683400 -32.49534000,60.97683400 -32.49762000,"
           "60.97683400 -32.49866600,60.97869000 -32.49866600,60.97942600 "
           "-32.49866600,60.98215200 -32.49866600,60.98316600 -32.49866600,"
           "60.98316600 -32.49755800,60.98316600 -32.49477000,60.98316600 "
           "-32.49350000,60.98146800 -32.49350000,60.98029800 -32.49350000,"
           "60.97947400 -32.49350000,60.97901600 -32.49350000,60.97683400 "
           "-32.49350000,60.97683400 -32.49442600,60.97683400 -32.49469800,"
           "60.97683400 -32.49534000))")
    assert _pts(wkb_to_wkt(r.geometry)) == _pts(exp)


def test_soundg():  # test_ogr_s57_SOUNDG: MULTIPOINT Z, depth = VE3D/SOMF
    df = _read(P, "SOUNDG")
    r = df.iloc[0]
    assert (r.RCID, r.OBJL, r.AGEN) == (20, 129, 65535)
    assert list(r.QUASOU) == ["1"]
    g = r.geometry
    assert struct.unpack_from("<I", g, 1)[0] == 0x80000004
    n = struct.unpack_from("<I", g, 5)[0]
    got = [struct.unpack_from("<3d", g, 9 + i * 29 + 5) for i in range(n)]
    exp = [(60.981644, -32.49449, 3.4), (60.981344, -32.496424, 1.4),
           (60.978142, -32.494874, -3.2), (60.980712, -32.495196, 1.2)]
    assert [(round(x, 6), round(y, 6), round(z, 6)) for x, y, z in got] == exp


def test_double_byte_attrs():  # test_ogr_s57_double_byte_attrs (#1526)
    df = _read(f"{FIX}/bug1526.000", "FOGSIG")
    assert df.INFORM.iloc[0] == ("During South winds nautophone is not "
                                 "always heard in S direction from "
                                 "lighthouse")
    assert len(df.NINFOM.iloc[0]) >= 1


def test_multilinestring():  # test_ogr_s57_multilinestring (#2147)
    from lib_gdal_ray.geom.wkt import wkb_to_wkt
    df = _read(f"{FIX}/bug2147_3R7D0889.000", "ROADWY")
    w = wkb_to_wkt(df.geometry.iloc[0])
    assert w.startswith("MULTILINESTRING")
    assert _pts(w)[:5] == _pts(
        "22.5659615 44.5541942,22.5652045 44.5531651,22.5654315 44.5517774,"
        "22.5663008 44.5510096,22.5656187 44.5500822")
    assert len(re.split(r"\),\s*\(", w)) == 8  # 8 disconnected parts


def test_update_dsid():  # test_ogr_s57_update_dsid
    df = _read(f"{FIX}/fake_s57_update_dsid.000", "DSID")
    r = df.iloc[0]
    assert (r.DSID_EDTN, r.DSID_UPDN, r.DSID_UADT, r.DSID_ISDT) == \
        ("0", "1", "20190211", "20190212")


def test_leader_variant_c151():
    """fake_s57_variant_C151.000: alternate leader entry-map widths."""
    from lib_gdal_ray.sources.s57 import open_s57
    cell = open_s57(f"{FIX}/fake_s57_variant_C151.000")
    assert cell.dsid  # parses without error


def test_builtin_registry_fallback():
    from lib_gdal_ray.sources.s57 import s57_layer_names
    names = s57_layer_names(P)  # no CSV dir
    assert "COALNE" in names and "SOUNDG" in names


def test_ray_read(ray_session):
    from lib_gdal_ray.sources.s57 import read_s57
    df = read_s57(P, layer="DEPARE", registry_dir=CSV).to_pandas()
    assert len(df) == 4
    assert set(df.columns) >= {"RCID", "OBJL", "LNAM", "geometry"}
