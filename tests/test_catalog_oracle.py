"""Driver-style correctness gate: run every catalog query at sf0.01 and
compare against its DuckDB oracle — row count, column names/types, and
exact (order-insensitive) values."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from lib_gdal_ray.pipelines.catalog import QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


SQL_QUERIES = [name for name, (_f, sql) in QUERIES.items() if sql is not None]
NOSQL_QUERIES = [name for name, (_f, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(name, sf_med):
    fn, sql = QUERIES[name]
    result = fn(sf_med)
    if hasattr(result, "to_pandas"):
        got = result.to_pandas()
    else:
        got = pd.DataFrame(result)
    con = oracle_con(sf_med)
    want = con.execute(sql).df()
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: cols {sorted(got.columns)} != {sorted(want.columns)}")
    g, w = normalize(got), normalize(want)
    for col in g.columns:
        gv, wv = g[col].to_numpy(), w[col].to_numpy()
        if np.issubdtype(np.asarray(gv).dtype, np.floating) or np.issubdtype(np.asarray(wv).dtype, np.floating):
            assert np.array_equal(gv.astype(np.float64), wv.astype(np.float64),
                                  equal_nan=True), (
                f"{name}.{col}: float values differ "
                f"(maxdiff {np.nanmax(np.abs(gv.astype(float) - wv.astype(float)))})")
        else:
            assert list(gv) == list(wv), f"{name}.{col}: values differ"


@pytest.mark.parametrize("name", NOSQL_QUERIES)
def test_nosql_queries_run(name, sf_med):
    fn, _ = QUERIES[name]
    out = fn(sf_med)
    got = out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out)
    assert len(got) >= 0
    assert len(got.columns) >= 2


def test_entry_smoke():
    ds = entrymod.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert len(df) > 0
    assert "doc_id" in df.columns and "spans" in df.columns and "zone_id" in df.columns


def test_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
