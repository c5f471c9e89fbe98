"""OGR SQL ExecuteSQL planner (functions/ogrsql.py) vs hand oracles.

Reference parity surface: ogr/ogr_gensql.cpp OGRGenSQLResultsLayer +
ogr/swq_parser.y (the ``ogrinfo -sql`` executor).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.functions.ogrsql import execute_sql, parse_select


def _layers():
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6]),
        "grp": pa.array(["a", "a", "b", "b", "b", "c"]),
        "val": pa.array([10.0, 20.0, 5.0, 15.0, 25.0, 100.0]),
        "name": pa.array(["x1", "x2", "y1", "y2", "y3", "z1"]),
    })
    dim = pa.table({
        "grp_key": pa.array(["a", "b", "c"]),
        "label": pa.array(["alpha", "beta", "gamma"]),
    })
    return {"t": ray.data.from_arrow(t), "dim": ray.data.from_arrow(dim)}


class TestParse:
    def test_plan_shape(self):
        p = parse_select("SELECT a, COUNT(*) AS n FROM t WHERE a > 1 "
                         "GROUP BY a ORDER BY n DESC LIMIT 3")
        assert p["from"] == "t"
        assert p["group_by"] == ["a"]
        assert p["order_by"] == [("n", True)]
        assert p["limit"] == 3
        assert p["items"][1] == {"kind": "agg", "fn": "COUNT", "node": None,
                                 "distinct": False, "alias": "n"}

    def test_errors(self):
        with pytest.raises(ValueError):
            parse_select("SELECT a FROM t trailing junk")
        with pytest.raises(ValueError):
            parse_select("UPDATE t SET a = 1")


class TestExecute:
    def test_projection_where_order(self):
        out = execute_sql(
            "SELECT id, val * 2 AS dbl FROM t WHERE val >= 15 ORDER BY id",
            _layers()).to_pandas()
        assert list(out["id"]) == [2, 4, 5, 6]
        assert list(out["dbl"]) == [40.0, 30.0, 50.0, 200.0]

    def test_group_agg(self):
        out = (execute_sql(
            "SELECT grp, COUNT(*) AS n, SUM(id) AS s, AVG(val) AS m "
            "FROM t GROUP BY grp ORDER BY grp", _layers()).to_pandas())
        assert list(out["grp"]) == ["a", "b", "c"]
        assert list(out["n"]) == [2, 3, 1]
        assert list(out["s"]) == [3, 12, 6]
        np.testing.assert_allclose(out["m"], [15.0, 15.0, 100.0])

    def test_global_agg_and_count_distinct(self):
        out = execute_sql(
            "SELECT COUNT(*) AS n, COUNT(DISTINCT grp) AS g, MAX(val) AS mx "
            "FROM t", _layers()).to_pandas()
        assert out.iloc[0].to_dict() == {"n": 6, "g": 3, "mx": 100.0}

    def test_grouped_count_distinct_fused(self):
        # GROUP BY + single COUNT(DISTINCT) + decomposable aggregates
        # takes the fused two-level-aggregation path (one base pass);
        # AVG exercises the sum/sum mean fixup.
        out = (execute_sql(
            "SELECT grp, COUNT(*) AS n, COUNT(DISTINCT name) AS d, "
            "SUM(id) AS s, MIN(val) AS lo, MAX(val) AS hi, AVG(val) AS m "
            "FROM t GROUP BY grp ORDER BY grp", _layers()).to_pandas())
        assert list(out["grp"]) == ["a", "b", "c"]
        assert list(out["n"]) == [2, 3, 1]
        assert list(out["d"]) == [2, 3, 1]
        assert list(out["s"]) == [3, 12, 6]
        np.testing.assert_allclose(out["lo"], [10.0, 5.0, 100.0])
        np.testing.assert_allclose(out["hi"], [20.0, 25.0, 100.0])
        np.testing.assert_allclose(out["m"], [15.0, 15.0, 100.0])

    def test_grouped_count_distinct_repeated_values(self):
        # distinct over a column with duplicates per group
        out = (execute_sql(
            "SELECT grp, COUNT(DISTINCT grp) AS g, COUNT(*) AS n "
            "FROM t GROUP BY grp ORDER BY grp", _layers()).to_pandas())
        assert list(out["g"]) == [1, 1, 1]
        assert list(out["n"]) == [2, 3, 1]

    def test_join(self):
        out = (execute_sql(
            "SELECT label, COUNT(*) AS n FROM t "
            "LEFT JOIN dim ON grp = grp_key GROUP BY label ORDER BY label",
            _layers()).to_pandas())
        assert list(out["label"]) == ["alpha", "beta", "gamma"]
        assert list(out["n"]) == [2, 3, 1]

    def test_distinct_and_limit(self):
        out = execute_sql("SELECT DISTINCT grp FROM t ORDER BY grp",
                          _layers()).to_pandas()
        assert list(out["grp"]) == ["a", "b", "c"]
        out = execute_sql("SELECT id FROM t ORDER BY id DESC LIMIT 2",
                          _layers()).to_pandas()
        assert list(out["id"]) == [6, 5]

    def test_having(self):
        out = execute_sql(
            "SELECT grp, COUNT(*) AS n FROM t GROUP BY grp "
            "HAVING n >= 2 ORDER BY grp", _layers()).to_pandas()
        assert list(out["grp"]) == ["a", "b"]

    def test_like_case_insensitive(self):
        # OGR LIKE is case-insensitive
        out = execute_sql("SELECT name FROM t WHERE name LIKE 'X%' ORDER BY name",
                          _layers()).to_pandas()
        assert list(out["name"]) == ["x1", "x2"]

    def test_unknown_layer(self):
        with pytest.raises(KeyError):
            execute_sql("SELECT * FROM nope", _layers())
