"""Attribute-filter (OGR SQL WHERE) parser tests vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.functions.swq import attribute_filter, compile_filter
from lib_gdal_ray.sources import tables


def _table():
    return pa.table({
        "a": pa.array([1, 2, 3, 4, None], type=pa.int64()),
        "b": pa.array([1.5, 2.5, 3.5, 4.5, 5.5]),
        "s": pa.array(["Foo", "bar", "FOOBAR", None, "baz"]),
    })


def _mask(expr):
    import pyarrow.compute as pc

    m = compile_filter(expr)(_table())
    return pc.fill_null(m, False).to_pylist()


class TestExpr:
    def test_comparisons(self):
        assert _mask("a > 2") == [False, False, True, True, False]
        assert _mask("a <> 2") == [True, False, True, True, False]
        assert _mask("b <= 2.5") == [True, True, False, False, False]

    def test_logic_and_parens(self):
        assert _mask("a > 1 AND a < 4") == [False, True, True, False, False]
        assert _mask("(a = 1 OR a = 4) AND b > 1") == [True, False, False, True, False]
        assert _mask("NOT a = 1") == [False, True, True, True, False]

    def test_null_in_between(self):
        assert _mask("a IS NULL") == [False, False, False, False, True]
        assert _mask("a IS NOT NULL") == [True, True, True, True, False]
        assert _mask("a IN (1, 3)") == [True, False, True, False, False]
        assert _mask("a NOT IN (1, 3)") == [False, True, False, True, False]
        assert _mask("a BETWEEN 2 AND 3") == [False, True, True, False, False]

    def test_like(self):
        # OGR LIKE is case-insensitive by default
        assert _mask("s LIKE 'foo%'") == [True, False, True, False, False]
        assert _mask("s LIKE '_ar'") == [False, True, False, False, False]
        assert _mask("s NOT LIKE 'foo%'") == [False, True, False, False, True]

    def test_arithmetic(self):
        assert _mask("a + 1 > 3") == [False, False, True, True, False]
        assert _mask("a * 2 = 4") == [False, True, False, False, False]
        assert _mask("b - 0.5 = 2.0") == [False, True, False, False, False]
        assert _mask("a % 2 = 0") == [False, True, False, True, False]

    def test_string_escape(self):
        t = pa.table({"s": pa.array(["100%", "100x"])})
        import pyarrow.compute as pc

        m = compile_filter("s LIKE '100!%' ESCAPE '!'")(t)
        assert pc.fill_null(m, False).to_pylist() == [True, False]

    def test_errors(self):
        with pytest.raises(ValueError):
            compile_filter("a >")
        with pytest.raises(ValueError):
            compile_filter("a = 1 extra")
        with pytest.raises(KeyError):
            compile_filter("nosuch = 1")(_table())


class TestVsDuckdb:
    @pytest.mark.parametrize("expr", [
        "l_quantity > 45 AND l_returnflag = 'R'",
        "l_quantity BETWEEN 10 AND 20",
        "l_linenumber IN (1, 2) OR l_quantity < 2",
        "l_returnflag <> 'N' AND NOT l_linestatus = 'F'",
        "l_quantity * 2 >= 99.0",
    ])
    def test_filter_count(self, sf_med, expr):
        ds = tables.read_table(sf_med, "lineitem",
                               columns=["l_quantity", "l_returnflag", "l_linestatus",
                                        "l_linenumber"])
        got = attribute_filter(ds, expr).count()
        want = duckdb.sql(
            f"SELECT count(*) n FROM read_parquet('{sf_med}/lineitem.parquet') WHERE {expr}"
        ).df()["n"].iloc[0]
        assert got == want


class TestCast:
    def test_cast_int(self):
        import pyarrow as pa
        import pyarrow.compute as pc

        t = pa.table({"b": pa.array([1.9, -1.9, 2.0])})
        m = compile_filter("CAST(b AS INTEGER) = 1")(t)
        assert pc.fill_null(m, False).to_pylist() == [True, False, False]
        m2 = compile_filter("CAST(b AS INTEGER) = -1")(t)
        assert pc.fill_null(m2, False).to_pylist() == [False, True, False]

    def test_cast_string_and_width(self):
        import pyarrow as pa
        import pyarrow.compute as pc

        t = pa.table({"a": pa.array([1, 22], type=pa.int64())})
        m = compile_filter("CAST(a AS CHARACTER(10)) = '22'")(t)
        assert pc.fill_null(m, False).to_pylist() == [False, True]

    def test_cast_vs_duckdb(self, sf_med):
        ds = tables.read_table(sf_med, "lineitem", columns=["l_quantity"])
        got = attribute_filter(ds, "CAST(l_quantity AS INTEGER) % 2 = 0").count()
        want = duckdb.sql(
            f"SELECT count(*) n FROM read_parquet('{sf_med}/lineitem.parquet') "
            "WHERE CAST(trunc(l_quantity) AS INTEGER) % 2 = 0").df()["n"].iloc[0]
        assert got == want


class TestSpecialFields:
    def test_ogr_geom_area(self):
        import pyarrow as pa
        import pyarrow.compute as pc

        from lib_gdal_ray.geom import wkb as wkb_mod

        bufs = [wkb_mod.box_to_wkb(0, 0, 2, 2), wkb_mod.box_to_wkb(0, 0, 10, 10)]
        t = pa.table({"gid": pa.array([1, 2], type=pa.int64()),
                      "geometry": pa.array(bufs, type=pa.binary())})
        m = compile_filter("OGR_GEOM_AREA > 50")(t)
        assert pc.fill_null(m, False).to_pylist() == [False, True]


class TestFuzzVsDuckdb:
    def _gen_expr(self, rng, depth=0):
        """Random OGR-SQL WHERE expression over lineitem columns (no
        LIKE: OGR LIKE is case-insensitive, DuckDB's is not)."""
        num_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber"]
        str_cols = ["l_returnflag", "l_linestatus"]
        if depth < 2 and rng.random() < 0.5:
            op = rng.choice(["AND", "OR"])
            a = self._gen_expr(rng, depth + 1)
            b = self._gen_expr(rng, depth + 1)
            e = f"({a}) {op} ({b})"
            return f"NOT ({e})" if rng.random() < 0.2 else e
        kind = rng.integers(0, 4)
        if kind == 0:
            c = rng.choice(num_cols)
            cmp = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            v = round(float(rng.uniform(0, 60)), 2)
            return f"{c} {cmp} {v}"
        if kind == 1:
            c = rng.choice(str_cols)
            v = rng.choice(["A", "N", "R", "F", "O"])
            return f"{c} {rng.choice(['=', '<>'])} '{v}'"
        if kind == 2:
            c = rng.choice(num_cols)
            lo = round(float(rng.uniform(0, 30)), 2)
            return f"{c} BETWEEN {lo} AND {round(lo + float(rng.uniform(0, 30)), 2)}"
        c = rng.choice(num_cols)
        vals = ", ".join(str(int(v)) for v in rng.integers(1, 50, 3))
        return f"{c} IN ({vals})"

    def test_30_random_expressions(self, sf_med):
        import numpy as np

        rng = np.random.default_rng(123)
        ds = tables.read_table(sf_med, "lineitem",
                               columns=["l_quantity", "l_extendedprice", "l_discount",
                                        "l_linenumber", "l_returnflag", "l_linestatus"])
        ds = ds.materialize()
        for _ in range(30):
            expr = self._gen_expr(rng)
            got = attribute_filter(ds, expr).count()
            want = duckdb.sql(
                f"SELECT count(*) n FROM read_parquet('{sf_med}/lineitem.parquet') "
                f"WHERE {expr}").df()["n"].iloc[0]
            assert got == want, f"mismatch for {expr!r}: {got} != {want}"


class TestSwqFunctions:
    def _t(self):
        return pa.table({
            "name": pa.array(["alpha", "Beta", "gamma"]),
            "tags": pa.array(['a=>1, b=>two', '"a"=>"x y", c=>3', 'b=>9']),
            "d": pa.array(["2020-01-05", "2021/03/09", "2019-12-31"]),
            "fid": pa.array([10, 11, 12], type=pa.int64()),
        })

    def test_concat_upper_lower_length_substr(self):
        from lib_gdal_ray.functions import swq

        t = self._t()
        fn = swq.compile_filter("UPPER(name) = 'BETA'")
        assert fn(t).to_pylist() == [False, True, False]
        fn = swq.compile_filter("LENGTH(name) = 5")
        assert fn(t).to_pylist() == [True, False, True]
        fn = swq.compile_filter("SUBSTR(name, 1, 3) = 'gam'")
        assert fn(t).to_pylist() == [False, False, True]
        fn = swq.compile_filter("CONCAT(name, '!') = 'alpha!'")
        assert fn(t).to_pylist() == [True, False, False]

    def test_hstore_get_value(self):
        from lib_gdal_ray.functions import swq

        t = self._t()
        fn = swq.compile_filter("HSTORE_GET_VALUE(tags, 'a') = '1'")
        assert fn(t).to_pylist() == [True, False, None]
        fn = swq.compile_filter("HSTORE_GET_VALUE(tags, 'a') = 'x y'")
        assert fn(t).to_pylist() == [False, True, None]
        fn = swq.compile_filter("HSTORE_GET_VALUE(tags, 'b') = '9'")
        assert fn(t).to_pylist() == [False, None, True]

    def test_temporal_cast(self):
        from lib_gdal_ray.functions import swq

        t = self._t()
        fn = swq.compile_filter("CAST(d AS DATE) >= CAST('2020-01-01' AS DATE)")
        assert fn(t).to_pylist() == [True, True, False]
        # slash format accepted like OGR
        fn = swq.compile_filter("CAST(d AS DATE) = CAST('2021-03-09' AS DATE)")
        assert fn(t).to_pylist() == [False, True, False]
        t2 = pa.table({"ts": pa.array(["2020-01-05 10:30:00",
                                       "2020-01-04 09:00:00"])})
        fn = swq.compile_filter(
            "CAST(ts AS TIMESTAMP) > CAST('2020-01-05 00:00:00' AS TIMESTAMP)")
        assert fn(t2).to_pylist() == [True, False]

    def test_fid_special_field(self):
        from lib_gdal_ray.functions import swq

        t = self._t()
        fn = swq.compile_filter("FID >= 11")
        assert fn(t).to_pylist() == [False, True, True]

    def test_unknown_function_raises(self):
        from lib_gdal_ray.functions import swq

        with pytest.raises(ValueError):
            swq.compile_filter("NOSUCHFN(name) = 1")


class TestSpatialFunctions:
    """SQLite-dialect ST_* functions (ogrsqlitesqlfunctions.cpp:627-878)
    registered in the shared swq function table."""

    def _tbl(self):
        import numpy as np
        import pyarrow as pa

        from lib_gdal_ray.geom import wkb as W

        box = W.box_to_wkb(0, 0, 2, 3)
        tri = W.polygon_to_wkb([np.array([[0., 0.], [4., 0.],
                                          [0., 4.], [0., 0.]])])
        pt = W.points_to_wkb(np.array([1.0]), np.array([1.0]))[0]
        return pa.table({"geometry": pa.array([box, tri, pt, None],
                                              type=pa.binary()),
                         "id": pa.array([1, 2, 3, 4])})

    def _eval(self, expr):
        from lib_gdal_ray.functions import swq

        return swq._eval(swq.parse(expr), self._tbl()).to_pylist()

    def test_area_length(self):
        assert self._eval("ST_Area(geometry)") == [6.0, 8.0, 0.0, None]
        out = self._eval("ST_Length(geometry)")
        assert out[0] == 10.0 and out[3] is None
        assert abs(out[1] - (8 + (32 ** 0.5))) < 1e-12

    def test_wkt_roundtrip(self):
        txt = self._eval("ST_AsText(geometry)")
        assert txt[2] == "POINT (1 1)"
        back = self._eval("ST_X(ST_Centroid(ST_GeomFromText("
                          "ST_AsText(geometry))))")
        assert back == self._eval("ST_X(ST_Centroid(geometry))")

    def test_predicates_filter(self):
        from lib_gdal_ray.functions import swq

        f = swq.compile_filter(
            "ST_Contains(geometry, ST_GeomFromText('POINT(0.5 0.5)'))")
        assert f(self._tbl()).to_pylist() == [True, True, False, None]
        f2 = swq.compile_filter(
            "ST_Within(ST_GeomFromText('POINT(3 3)'), geometry)")
        assert f2(self._tbl()).to_pylist() == [False, False, False, None]

    def test_envelope_isvalid(self):
        assert self._eval("ST_Area(ST_Envelope(geometry))") == \
            [6.0, 16.0, 0.0, None]
        assert self._eval("ST_IsValid(geometry)") == \
            [True, True, True, None]

    def test_execute_sql_spatial(self, ray_session):
        import ray.data

        from lib_gdal_ray.functions.ogrsql import execute_sql

        ds = ray.data.from_arrow(self._tbl().drop_null())
        out = execute_sql(
            "SELECT id, ST_Area(geometry) AS a FROM t "
            "WHERE ST_Intersects(geometry, ST_GeomFromText("
            "'POLYGON((1.5 0.5,9 0.5,9 9,1.5 9,1.5 0.5))')) "
            "ORDER BY id", {"t": ds}).to_pandas()
        assert list(out["id"]) == [1, 2] and list(out["a"]) == [6.0, 8.0]
