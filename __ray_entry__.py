"""Driver contract for the graft builder (Ray Data target).

The driver calls ``entry()`` as a smoke check (Ray already initialised),
runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares against
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). See lib_gdal_ray/pipelines/catalog.py for the
implementations and the float-parity policy that makes the hashes match
bit-for-bit.

No ray.init()/ray.shutdown() here or in the library (driver owns the
session); bench.py and tests own their own sessions.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize the
    interleaved text+media document table (doc_id, spans, WKB point
    geometry — BASELINE.json input_hint), spatial-join it against the
    derived zone polygons (two-phase cell join, ray-casting PIP), and
    return the joined Dataset (spans carried through untouched)."""
    import pyarrow.parquet as pq

    from lib_gdal_ray.pipelines.catalog import zone_polygon_table
    from lib_gdal_ray.pipelines.spatial_join import broadcast_pip_join
    from lib_gdal_ray.sources.synth import interleaved_docs

    sf_dir = "/root/testdata/sf0.001"
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * 4
    docs = interleaved_docs(n_docs)
    zones = zone_polygon_table(sf_dir)  # 12-gon zones: ray-casting PIP path
    joined = broadcast_pip_join(docs, zones, "geometry", ["zone_id"], res=5.0)
    return joined


def queries() -> dict[str, Callable[[str], Any]]:
    from lib_gdal_ray.pipelines.catalog import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from lib_gdal_ray.pipelines.catalog import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
