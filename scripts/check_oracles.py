"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf and compare rows/schema/values vs oracle_sql().

Usage: python scripts/check_oracles.py [sf_dir] [name_substr ...]
(optional name substrings restrict which queries run)
"""
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, only=()):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    qs = entry.queries()
    sqls = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    results = {}
    for name, fn in qs.items():
        if only and not any(s in name for s in only):
            continue
        t0 = time.perf_counter()
        try:
            out = fn(sf_dir)
            mine = out.to_pandas() if hasattr(out, "to_pandas") else pd.DataFrame(out)
        except Exception as e:
            results[name] = {"status": "RAY_ERROR", "error": str(e)[:200]}
            continue
        dt = round(time.perf_counter() - t0, 2)
        if name not in sqls:
            results[name] = {"status": "no_oracle", "rows": len(mine), "sec": dt}
            continue
        try:
            orc = con.execute(sqls[name]).df()
        except Exception as e:
            results[name] = {"status": "SQL_ERROR", "error": str(e)[:200]}
            continue
        rows_match = len(mine) == len(orc)
        schema_match = sorted(mine.columns) == sorted(orc.columns)
        hash_match = None
        dtype_drift = {}
        if rows_match and schema_match:
            sc = sorted(mine.columns)
            a = mine[sc].sort_values(sc).reset_index(drop=True)
            b = orc[sc].sort_values(sc).reset_index(drop=True)
            # dtype-STRICT like the driver's value hash: int-vs-float is
            # a failure even when values agree. Only integer WIDTH drift
            # (int32 vs int64) is tolerated — the driver demonstrably
            # tolerates it (VERDICT r3). Nullable pandas ext ints (from
            # arrow int-with-nulls) count as int kind.
            def kind(dt):
                k = getattr(dt, "kind", None)
                if k is None:  # pandas extension dtype (Int64 etc.)
                    k = "i" if "Int" in str(dt) or "UInt" in str(dt) else "O"
                return "i" if k in "iu" else k
            width_drift = {}
            for c in sc:
                ka, kb = kind(a[c].dtype), kind(b[c].dtype)
                if ka != kb:
                    dtype_drift[c] = f"{a[c].dtype} vs {b[c].dtype}"
                elif str(a[c].dtype) != str(b[c].dtype):
                    width_drift[c] = f"{a[c].dtype} vs {b[c].dtype}"
            if dtype_drift:
                hash_match = False
            else:
                try:
                    b = b.astype({c: a[c].dtype for c in sc})
                    hash_match = a.equals(b)
                except Exception as e:
                    hash_match = f"cast_error: {e}"
        results[name] = {"status": "checked", "rows_match": rows_match,
                         "schema_match": schema_match, "hash_match": hash_match,
                         "rows": len(mine), "sec": dt}
        if dtype_drift:
            results[name]["dtype_drift"] = dtype_drift
        if rows_match and schema_match and width_drift:
            results[name]["width_drift"] = width_drift
    ray.shutdown()
    bad = {k: v for k, v in results.items()
           if v.get("status") in ("RAY_ERROR", "SQL_ERROR")
           or v.get("hash_match") is False
           or v.get("rows_match") is False or v.get("schema_match") is False}
    print(json.dumps({"n": len(results),
                      "checked": sum(1 for v in results.values()
                                     if v["status"] == "checked"),
                      "no_oracle": sum(1 for v in results.values()
                                       if v["status"] == "no_oracle"),
                      "width_drift": {k: v["width_drift"]
                                      for k, v in results.items()
                                      if "width_drift" in v},
                      "bad": bad}, indent=1, default=str))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         tuple(sys.argv[2:]))
