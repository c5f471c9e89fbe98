"""MapInfo TAB binary driver tests — pinned against the reference's
own golden oracle (all_geoms.mif.golden.csv, the same oracle
autotest/ogr/ogr_mitab.py test_ogr_mitab_41 uses for all_geoms.tab),
plus the 32256-byte-block variant, the indexed polygon fixture and
the aspatial table."""

import csv
import struct
import zipfile

import numpy as np
import pytest

from lib_gdal_ray.geom import wkb as wkbm
from lib_gdal_ray.geom import wkt as wktm
from lib_gdal_ray.sources.tab import read_tab

REF = "/root/reference/autotest/ogr/data/mitab"


def _flat(kind, payload):
    if kind in ("point", "linestring", "multipoint"):
        return np.asarray(payload).reshape(-1, 2)
    if kind == "multilinestring":
        return np.concatenate([np.asarray(s) for s in payload])
    if kind == "polygon":
        return np.concatenate([np.asarray(r) for r in payload])
    if kind == "multipolygon":
        return np.concatenate(
            [np.asarray(r) for poly in payload for r in poly])
    if kind == "geometrycollection":
        return np.concatenate([_flat(k, p) for k, p in payload])
    raise AssertionError(kind)


def _compare_all_geoms(df):
    golden = list(csv.DictReader(open(f"{REF}/all_geoms.mif.golden.csv")))
    df = df.sort_values("fid").reset_index(drop=True)
    assert len(df) == len(golden) == 16
    for i, row in enumerate(golden):
        exp_kind, exp_pay = wkbm.parse_wkb(wktm.wkt_to_wkb(row["WKT"]))
        got_kind, got_pay = wkbm.parse_wkb(df["geometry"].iloc[i])
        assert got_kind == exp_kind, f"feature {i}"
        e, g = _flat(exp_kind, exp_pay), _flat(got_kind, got_pay)
        assert e.shape == g.shape, (
            f"feature {i} ({exp_kind}): {e.shape} vs {g.shape}")
        assert np.allclose(e, g, atol=1e-9), f"feature {i}"


def test_all_geoms_golden():
    """ogr_mitab.py test_ogr_mitab_41: every all_geoms.tab feature
    matches the golden WKT — same linearization constants as the
    binary reader (180-pt ellipse, 45-per-corner roundrect, |d|/2+1
    arc points, duplicated arc ends)."""
    _compare_all_geoms(read_tab(f"{REF}/all_geoms.tab").to_pandas())


def test_all_geoms_block_32256(tmp_path):
    """ogr_mitab.py test_ogr_mitab_42: same content, 32256-byte
    .map blocks — exercises blocksize-dependent block/center math."""
    with zipfile.ZipFile(f"{REF}/all_geoms_block_32256.zip") as zf:
        zf.extractall(tmp_path)
    _compare_all_geoms(
        read_tab(str(tmp_path / "all_geoms_block_32256.tab")).to_pandas())


def test_poly_indexed():
    """ogr_mitab.py test_ogr_mitab_47: attribute read + filter."""
    df = read_tab(f"{REF}/poly_indexed.tab").to_pandas()
    assert (df["PRFEDEA"] == "35043413").sum() == 1
    kind, _ = wkbm.parse_wkb(df["geometry"].iloc[0])
    assert kind in ("polygon", "multipolygon")


def test_first_table_types():
    df = read_tab(f"{REF}/first_table.tab").to_pandas()
    assert len(df) >= 1
    assert "fid" in df.columns


def test_aspatial():
    """ogr_mitab.py test_ogr_mitab_49: TAB with no .map/.id."""
    df = read_tab(f"{REF}/aspatial-table.tab").to_pandas()
    assert len(df) == 2
    assert df["geometry"].isna().all()
    assert df["a"].tolist() == [1, 4]


def test_read_vector_dispatch():
    from lib_gdal_ray.sources.vrt_vector import read_vector

    df = read_vector(f"{REF}/all_geoms.tab").to_pandas()
    assert len(df) == 16
