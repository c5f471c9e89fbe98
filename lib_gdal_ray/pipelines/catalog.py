"""Query catalog: every operator exposed as `fn(sf_dir) -> Dataset`,
paired (where expressible) with an ANSI/DuckDB oracle SQL string.

Float-parity policy (so the driver's value-hash matches bit-for-bit):

* Sums of doubles go through **integer cents**: both sides compute
  `CAST(floor(x*100 + 0.5) AS BIGINT)` per row and sum exactly
  (associative integer adds — no float summation-order drift).
* Averages divide those exact integers in float64 — identical operands,
  identical IEEE ops ⇒ identical doubles.
* Mercator meters are rounded to 2 decimals on both sides (libm tan/log
  differ by ≤ 1 ulp between numpy and DuckDB; measured in BASELINE.md).
* Tile indices floor-match bit-for-bit (verified over 200k points).

Geometry queries derive coordinates from integer keys
(`functions.derive`) with exact integer arithmetic mirrored in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions import derive
from ..geom import wkb as wkb_mod
from ..sources import tables
from ..stages import geom_ops
from ..stages.cell_assign import with_grid_cell
from ..stages.reproject import reproject
from . import ann as ann_mod
from . import dedup as dd
from . import knn as knn_mod
from . import rasterize as rast
from . import relational as rel
from . import text as text_mod
from . import tiles as tiles_mod
from . import zonal as zonal_mod

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

CENTS = "CAST(floor({x}*100 + 0.5) AS BIGINT)"


def _cents(arr: np.ndarray) -> np.ndarray:
    return np.floor(arr.astype(np.float64) * 100.0 + 0.5).astype(np.int64)


def add_cents(ds, src: str, dst: str):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            dst, pa.array(_cents(batch[src].to_numpy(zero_copy_only=False))))
    return ds.map_batches(fn, batch_format="pyarrow")


def events_points(sf_dir: str, cols=("event_id",)):
    ds = tables.read_table(sf_dir, "events", columns=list(cols))

    def geo(batch: pa.Table) -> pa.Table:
        lon, lat = derive.event_lonlat(batch["event_id"].to_numpy(zero_copy_only=False))
        return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))

    return ds.map_batches(geo, batch_format="pyarrow")


def zone_table(sf_dir: str) -> pa.Table:
    nat = tables.read_table_arrow(sf_dir, "nation", columns=["n_nationkey"])
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
    geoms = [wkb_mod.box_to_wkb(float(a), float(b), float(c), float(d))
             for a, b, c, d in zip(xmin, ymin, xmax, ymax)]
    return pa.table({
        "zone_id": pa.array(nk),
        "geometry": pa.array(geoms, type=pa.binary()),
    })


def zone_polygon_table(sf_dir: str) -> pa.Table:
    nat = tables.read_table_arrow(sf_dir, "nation", columns=["n_nationkey"])
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    geoms = [wkb_mod.polygon_to_wkb(derive.zone_polygon_rings(int(k))) for k in nk]
    return pa.table({"zone_id": pa.array(nk), "geometry": pa.array(geoms, type=pa.binary())})


def sites_table(sf_dir: str) -> pa.Table:
    sup = tables.read_table_arrow(sf_dir, "supplier", columns=["s_suppkey"])
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    lon, lat = derive.site_lonlat(sk)
    return pa.table({"site_id": pa.array(sk), "slon": pa.array(lon), "slat": pa.array(lat)})


_ZONES_SQL = f"""(SELECT CAST(n_nationkey AS BIGINT) AS zone_id,
    CAST({derive.SQL_ZONE_XMIN} AS DOUBLE) AS xmin,
    CAST({derive.SQL_ZONE_XMAX} AS DOUBLE) AS xmax,
    CAST({derive.SQL_ZONE_YMIN} AS DOUBLE) AS ymin,
    CAST({derive.SQL_ZONE_YMAX} AS DOUBLE) AS ymax
  FROM nation)"""

_POINTS_SQL = f"""(SELECT event_id, value, event_type,
    {derive.SQL_EVENT_LON} AS lon, {derive.SQL_EVENT_LAT} AS lat FROM events)"""

_SITES_SQL = f"""(SELECT s_suppkey AS site_id,
    {derive.SQL_SITE_LON} AS slon, {derive.SQL_SITE_LAT} AS slat FROM supplier)"""


def _tile_sql(z: int, lon: str = "lon", lat: str = "lat"):
    n = 1 << z
    tx = f"CAST(floor(({lon}+180.0)/360.0*{n}) AS BIGINT)"
    ty = (f"CAST(floor((1 - ln(tan(radians({lat})) + 1/cos(radians({lat})))/pi())/2*{n}) "
          "AS BIGINT)")
    return tx, ty


def _pixel_sql(z: int, tile_size: int = 256, lon: str = "lon", lat: str = "lat"):
    """Global-pixel floor formulas (bit-identical to cells.tile_pixel;
    verified vs DuckDB over 200k derived points)."""
    return _tile_sql(z + 8, lon, lat) if tile_size == 256 else None


# ---------------------------------------------------------------------------
# relational queries
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir):
    ds = tables.read_table(sf_dir, "lineitem",
                           columns=["l_returnflag", "l_linestatus", "l_quantity",
                                    "l_extendedprice"])
    ds = add_cents(ds, "l_quantity", "qty_c")
    ds = add_cents(ds, "l_extendedprice", "price_c")
    agg = rel.grouped_agg(ds, ["l_returnflag", "l_linestatus"], [
        ("sum", "qty_c", "sum_qty_c"),
        ("sum", "price_c", "sum_price_c"),
        ("count", None, "n"),
    ], shuffle_partitions=8)

    def finalize(batch: pa.Table) -> pa.Table:
        s = batch["sum_price_c"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column("avg_price", pa.array((s / n) / 100.0))

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_PRICING = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum({CENTS.format(x='l_quantity')}) AS BIGINT) AS sum_qty_c,
       CAST(sum({CENTS.format(x='l_extendedprice')}) AS BIGINT) AS sum_price_c,
       count(*) AS n,
       (CAST(CAST(sum({CENTS.format(x='l_extendedprice')}) AS BIGINT) AS DOUBLE)
        / CAST(count(*) AS DOUBLE)) / 100.0 AS avg_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_filter_project(sf_dir):
    ds = tables.read_table(sf_dir, "lineitem",
                           columns=["l_orderkey", "l_linenumber", "l_quantity",
                                    "l_returnflag"])

    def f(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(batch["l_quantity"], 45.0),
                    pc.equal(batch["l_returnflag"], "R"))
        return batch.filter(m).select(["l_orderkey", "l_linenumber", "l_quantity"])

    return ds.map_batches(f, batch_format="pyarrow")


SQL_FILTER = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_quantity > 45.0 AND l_returnflag = 'R'
"""


def q_join_orders_customer(sf_dir):
    orders = tables.read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    orders = add_cents(orders, "o_totalprice", "price_c")
    cust = tables.read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = rel.broadcast_hash_join(orders, cust, "o_custkey", "c_custkey")
    return rel.grouped_agg(joined, "c_mktsegment", [
        ("count", None, "n_orders"),
        ("sum", "price_c", "sum_price_c"),
    ], shuffle_partitions=8)


SQL_JOIN_OC = f"""
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum({CENTS.format(x='o_totalprice')}) AS BIGINT) AS sum_price_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_join3_region_customer(sf_dir):
    cust = tables.read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    cust = add_cents(cust, "c_acctbal", "bal_c")
    nat = tables.read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    reg = tables.read_table_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    dim = nat.join(reg, keys=["n_regionkey"], right_keys=["r_regionkey"])
    joined = rel.broadcast_hash_join(cust, dim, "c_nationkey", "n_nationkey")
    return rel.grouped_agg(joined, "r_name", [
        ("count", None, "n_cust"),
        ("sum", "bal_c", "sum_bal_c"),
    ], shuffle_partitions=8)


SQL_JOIN3 = f"""
SELECT r_name, count(*) AS n_cust,
       CAST(sum({CENTS.format(x='c_acctbal')}) AS BIGINT) AS sum_bal_c
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_topk_orders(sf_dir):
    orders = tables.read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return rel.topk(orders, ["o_totalprice", "o_orderkey"], 10, descending=[True, False])


SQL_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_distinct_segments(sf_dir):
    return rel.distinct(
        tables.read_table(sf_dir, "customer", columns=["c_mktsegment"]), "c_mktsegment")


SQL_DISTINCT = "SELECT DISTINCT c_mktsegment FROM customer"


def q_scalar_funcs(sf_dir):
    ds = tables.read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"])

    def f(batch: pa.Table) -> pa.Table:
        m = pc.match_like(batch["p_name"], "%a%")
        batch = batch.filter(m)
        bt = pc.binary_join_element_wise(batch["p_brand"], batch["p_type"], "-")
        n5 = pc.utf8_slice_codeunits(batch["p_name"], 0, 5)
        return pa.table({
            "p_partkey": batch["p_partkey"],
            "brand_type": bt,
            "name5": n5,
        })

    return ds.map_batches(f, batch_format="pyarrow")


SQL_SCALAR = """
SELECT p_partkey, p_brand || '-' || p_type AS brand_type,
       substr(p_name, 1, 5) AS name5
FROM part WHERE p_name LIKE '%a%'
"""


def q_swq_functions(sf_dir):
    """OGR SQL scalar functions + temporal CAST through the SWQ parser
    (`ogr/swq_op_registrar.cpp:28-61`): UPPER, SUBSTR, IN, and a
    TIMESTAMP literal comparison, all evaluated by
    functions/swq.compile_filter inside map_batches."""
    from ..functions.swq import attribute_filter

    ds = tables.read_table(sf_dir, "orders",
                           columns=["o_orderkey", "o_orderstatus",
                                    "o_orderpriority", "o_orderdate"])
    out = attribute_filter(ds, "UPPER(o_orderstatus) = 'O' AND "
                               "SUBSTR(o_orderpriority, 1, 1) IN ('1', '2') AND "
                               "o_orderdate >= CAST('1996-01-01 00:00:00' AS TIMESTAMP)")
    return out.select_columns(["o_orderkey"])


SQL_SWQ_FUNCS = """
SELECT o_orderkey FROM orders
WHERE upper(o_orderstatus) = 'O' AND substr(o_orderpriority, 1, 1) IN ('1', '2')
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
"""


def q_global_agg(sf_dir):
    li = tables.read_table(sf_dir, "lineitem", columns=["l_quantity"])
    li = add_cents(li, "l_quantity", "qty_c")
    return rel.global_agg(li, [
        ("count", None, "n"),
        ("sum", "qty_c", "sum_qty_c"),
        ("min", "l_quantity", "min_qty"),
        ("max", "l_quantity", "max_qty"),
    ])


SQL_GLOBAL = f"""
SELECT count(*) AS n, CAST(sum({CENTS.format(x='l_quantity')}) AS BIGINT) AS sum_qty_c,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
FROM lineitem
"""


def q_events_by_type(sf_dir):
    ev = tables.read_table(sf_dir, "events", columns=["event_type", "value"])
    ev = add_cents(ev, "value", "value_c")
    return rel.grouped_agg(ev, "event_type", [
        ("count", None, "n"),
        ("sum", "value_c", "sum_value_c"),
    ], shuffle_partitions=8)


SQL_EVENTS_TYPE = f"""
SELECT event_type, count(*) AS n,
       CAST(sum({CENTS.format(x='value')}) AS BIGINT) AS sum_value_c
FROM events GROUP BY event_type
"""


def q_events_hourly_window(sf_dir):
    """Tumbling-window aggregate over the event stream (the 'windowed
    aggregate' custom-operator case — keys, not order: window start is
    a derived column, so it is just a grouped aggregation)."""
    ev = tables.read_table(sf_dir, "events", columns=["ts", "value"])
    ev = add_cents(ev, "value", "value_c")

    def win(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch["ts"], unit="hour")
        return batch.append_column("window_start", w)

    return rel.grouped_agg(ev.map_batches(win, batch_format="pyarrow"),
                           "window_start", [
        ("count", None, "n"),
        ("sum", "value_c", "sum_value_c"),
    ], shuffle_partitions=8)


SQL_EVENTS_HOURLY = f"""
SELECT date_trunc('hour', ts) AS window_start, count(*) AS n,
       CAST(sum({CENTS.format(x='value')}) AS BIGINT) AS sum_value_c
FROM events GROUP BY 1
"""


def q_sliding_window(sf_dir):
    """Sliding 2h/1h window aggregates over the event stream."""
    from .windows import sliding_window_agg

    ev = tables.read_table(sf_dir, "events", columns=["ts", "value"])
    return sliding_window_agg(ev, "ts", "value", size_s=7200, slide_s=3600,
                              shuffle_partitions=8)


SQL_SLIDING = f"""
WITH e AS (SELECT CAST(floor(epoch(ts)/3600) AS BIGINT)*3600 AS base,
                  {CENTS.format(x='value')} AS c FROM events),
x AS (SELECT to_timestamp(base - s*3600) AS window_start, c
      FROM e, (SELECT unnest([0, 1]) AS s) shifts
      WHERE base - s*3600 >= 0)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
       CAST(sum(c) AS BIGINT) AS sum_value_c, count(*) AS n
FROM x GROUP BY 1
"""


def q_sessionize(sf_dir):
    """Sessionization: 30-min-gap sessions per user."""
    from .windows import sessionize

    ev = tables.read_table(sf_dir, "events", columns=["user_id", "ts"])
    return sessionize(ev, "user_id", "ts", gap_s=1800)


SQL_SESSIONIZE = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_count_distinct_users(sf_dir):
    ev = tables.read_table(sf_dir, "events", columns=["event_type", "user_id"])
    d = rel.distinct(ev, ["event_type", "user_id"])
    return rel.grouped_agg(d, "event_type", [("count", None, "n_users")], shuffle_partitions=8)


SQL_COUNT_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


def q_median_quantity(sf_dir):
    """Grouped median (quantile aggregate — beyond the reference's
    aggregate set, rounded 4dp both sides)."""
    from ray.data.aggregate import Quantile

    li = tables.read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    out = li.groupby("l_returnflag").aggregate(
        Quantile("l_quantity", q=0.5, alias_name="median_qty"))

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "median_qty": pc.round(batch["median_qty"], ndigits=4)})

    return out.map_batches(f, batch_format="pyarrow")


SQL_MEDIAN = """
SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
FROM lineitem GROUP BY l_returnflag
"""


def q_union_names(sf_dir):
    r = tables.read_table(sf_dir, "region", columns=["r_name"]).rename_columns(["name"])
    n = tables.read_table(sf_dir, "nation", columns=["n_name"]).rename_columns(["name"])
    return r.union(n)


SQL_UNION = """
SELECT r_name AS name FROM region UNION ALL SELECT n_name AS name FROM nation
"""


def q_orders_by_year(sf_dir):
    ds = tables.read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    ds = add_cents(ds, "o_totalprice", "price_c")

    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column("yr", pc.cast(pc.year(batch["o_orderdate"]), pa.int64()))

    return rel.grouped_agg(ds.map_batches(f, batch_format="pyarrow"), "yr", [
        ("count", None, "n"),
        ("sum", "price_c", "sum_price_c"),
    ], shuffle_partitions=8)


SQL_ORDERS_YEAR = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n,
       CAST(sum({CENTS.format(x='o_totalprice')}) AS BIGINT) AS sum_price_c
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# geospatial queries
# ---------------------------------------------------------------------------


def q_cell_assign(sf_dir):
    pts = events_points(sf_dir)
    from ..stages.cell_assign import with_tile_key

    ds = with_tile_key(pts, 8)

    def f(batch: pa.Table) -> pa.Table:
        from ..geom import cells

        z, tx, ty = cells.unpack_tile(batch["tile_id"].to_numpy(zero_copy_only=False))
        return pa.table({
            "event_id": batch["event_id"],
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def sql_cell_assign():
    tx, ty = _tile_sql(8)
    return f"SELECT event_id, {tx} AS tile_x, {ty} AS tile_y FROM {_POINTS_SQL} p"


def q_bbox_join(sf_dir):
    from .spatial_join import broadcast_pip_join

    pts = events_points(sf_dir)
    zones = zone_table(sf_dir)
    out = broadcast_pip_join(pts, zones, "geometry", ["zone_id"], res=5.0,
                             predicate="envelope")
    return out.select_columns(["event_id", "zone_id"])


SQL_BBOX_JOIN = f"""
SELECT event_id, zone_id FROM {_POINTS_SQL} p JOIN {_ZONES_SQL} z
ON p.lon >= z.xmin AND p.lon <= z.xmax AND p.lat >= z.ymin AND p.lat <= z.ymax
"""


def q_pip_join_polygons(sf_dir):
    """Ray-casting PIP against non-rectangular 12-gons; the oracle
    regenerates the jittered 12-gon vertices in SQL and mirrors the
    crossing-number test edge by edge (sum of crossings mod 2)."""
    from .spatial_join import broadcast_pip_join

    pts = events_points(sf_dir)
    zones = zone_polygon_table(sf_dir)
    out = broadcast_pip_join(pts, zones, "geometry", ["zone_id"], res=5.0)
    return out.select_columns(["event_id", "zone_id"])


def sql_pip_join_polygons():
    return f"""
    WITH zb AS (
      SELECT zone_id, (xmin + xmax)/2.0 AS cx, (ymin + ymax)/2.0 AS cy,
             (xmax - xmin)/2.0 AS rx, (ymax - ymin)/2.0 AS ry
      FROM {_ZONES_SQL} z
    ), vtx AS (
      SELECT zone_id, s.i,
        cx + rx * (0.55 + 0.45*(((zone_id*7919 + s.i*104729) % 1000)/1000.0))
           * cos(2*pi()*s.i/12) AS x,
        cy + ry * (0.55 + 0.45*(((zone_id*7919 + s.i*104729) % 1000)/1000.0))
           * sin(2*pi()*s.i/12) AS y
      FROM zb, (SELECT unnest(generate_series(0, 11)) AS i) s
    ), edges AS (
      SELECT a.zone_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      FROM vtx a JOIN vtx b
        ON a.zone_id = b.zone_id AND b.i = (a.i + 1) % 12
    ), crossings AS (
      SELECT p.event_id, e.zone_id,
        CASE WHEN (e.y1 > p.lat) <> (e.y2 > p.lat)
              AND p.lon < e.x1 + (p.lat - e.y1)/(e.y2 - e.y1)*(e.x2 - e.x1)
             THEN 1 ELSE 0 END AS c
      FROM {_POINTS_SQL} p CROSS JOIN edges e
    )
    SELECT event_id, zone_id FROM crossings
    GROUP BY 1, 2 HAVING sum(c) % 2 = 1
    """


def q_shuffle_join(sf_dir):
    """Same result as q_bbox_join via the shuffle (groupby-cell) path."""
    from .spatial_join import shuffle_pip_join

    pts = events_points(sf_dir)
    zones = ray.data.from_arrow(zone_table(sf_dir))
    out = shuffle_pip_join(pts, zones, "geometry", ["zone_id"], ["event_id"],
                           res=5.0, predicate="envelope")
    return out


def q_knn(sf_dir):
    pts = events_points(sf_dir)
    sites = sites_table(sf_dir)
    out = knn_mod.knn_join(pts, sites, 3, "site_id", "slon", "slat", res=10.0)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "neighbor_id": batch["neighbor_id"],
            "rank": pc.cast(batch["rank"], pa.int64()),
            "dist2": batch["dist2"],
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_KNN = f"""
WITH d AS (
  SELECT event_id, site_id, (lon-slon)*(lon-slon) + (lat-slat)*(lat-slat) AS d2
  FROM {_POINTS_SQL} p, {_SITES_SQL} s
), r AS (
  SELECT event_id, site_id, d2,
         row_number() OVER (PARTITION BY event_id ORDER BY d2, site_id) AS rn
  FROM d
)
SELECT event_id, site_id AS neighbor_id, CAST(rn AS BIGINT) AS "rank", d2 AS dist2
FROM r WHERE rn <= 3
"""


def q_reproject(sf_dir):
    pts = events_points(sf_dir)
    out = reproject(pts, 4326, 3857, x_col="lon", y_col="lat",
                    out_x="merc_x", out_y="merc_y", round_to=2)
    return out.select_columns(["event_id", "merc_x", "merc_y"])


SQL_REPROJECT = f"""
SELECT event_id,
       round(6378137.0 * radians(lon), 2) AS merc_x,
       round(6378137.0 * ln(tan(pi()/4 + radians(lat)/2)), 2) AS merc_y
FROM {_POINTS_SQL} p
"""


def q_buffer_zones(sf_dir):
    """Geometry Buffer end-to-end (OGRGeometry::Buffer analog): each
    zone box buffered by 2.0 deg with 8 quadrant segments; output the
    buffered area in integer cents. Oracle: the closed-form area of a
    buffered rectangle with k-gon corners — w*h + 2*(w+h)*d + the four
    quarter (4*quadsegs)-gons = 0.5*k*d^2*sin(2*pi/k)."""
    # repartition the tiny zone table so the per-feature buffer kernels
    # parallelize across cores (one block would serialize them)
    zones = ray.data.from_arrow(zone_table(sf_dir)).repartition(8)
    buffered = geom_ops.buffer_geometry(zones, 2.0, quadsegs=8)
    with_area = geom_ops.centroid_area(buffered)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "zone_id": batch["zone_id"],
            "buf_area_c": pa.array(_cents(
                batch["area"].to_numpy(zero_copy_only=False))),
        })

    return with_area.map_batches(f, batch_format="pyarrow")


SQL_BUFFER_ZONES = f"""
SELECT zone_id,
  CAST(floor(((xmax - xmin)*(ymax - ymin)
      + 2.0*((xmax - xmin) + (ymax - ymin))*2.0
      + 0.5*32*4.0*sin(2*pi()/32))*100 + 0.5) AS BIGINT) AS buf_area_c
FROM {_ZONES_SQL} z
"""


def q_reproject_utm(sf_dir):
    """General-CRS reprojection: every event to ITS WGS84 UTM zone
    (EPSG:326xx/327xx via geom/proj Snyder series — reference
    delegates to PROJ, `ogr/ogrct.cpp:665`; its own benchmark is
    32631<->4326, `autotest/benchmark/test_ogr2ogr.py:61-66`).
    Latitudes clamped to the UTM validity band [-80, 84] on both sides."""
    pts = events_points(sf_dir)
    from ..geom import proj as proj_mod

    def tx(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = np.clip(batch["lat"].to_numpy(zero_copy_only=False), -80.0, 84.0)
        zone = proj_mod.utm_zone_for_lon(lon)
        south = lat < 0
        e = np.empty(len(lon), dtype=np.float64)
        n = np.empty(len(lon), dtype=np.float64)
        for z in np.unique(zone):
            m = zone == z
            e[m], n[m] = proj_mod.utm_forward(lon[m], lat[m], int(z))
        n = n + np.where(south, 10000000.0, 0.0)
        epsg = np.where(south, 32700, 32600) + zone
        return pa.table({
            "event_id": batch["event_id"],
            "utm_epsg": pa.array(epsg.astype(np.int64)),
            "easting": pa.array(e.round(2)),
            "northing": pa.array(n.round(2)),
        })

    return pts.map_batches(tx, batch_format="pyarrow")


def sql_reproject_utm():
    from ..geom.proj import _E2, _EP2, _K0, _M0, _M2, _M4, _M6, WGS84_A

    phi = "radians(LEAST(GREATEST(lat, -80.0), 84.0))"
    zone = "(LEAST(GREATEST(CAST(floor((lon+180.0)/6.0) AS BIGINT) + 1, 1), 60))"
    lam0 = f"radians(CAST({zone} AS DOUBLE)*6.0 - 183.0)"
    return f"""
    WITH b AS (
      SELECT event_id, lon, {phi} AS phi, {zone} AS zone, {lam0} AS lam0,
             (lat < 0) AS south
      FROM {_POINTS_SQL} p
    ), t AS (
      SELECT event_id, zone, south,
        sin(phi) AS s, cos(phi) AS c, phi,
        {WGS84_A!r} / sqrt(1.0 - {_E2!r}*sin(phi)*sin(phi)) AS n,
        pow(sin(phi)/cos(phi), 2) AS tt,
        {_EP2!r}*cos(phi)*cos(phi) AS cc,
        (radians(lon) - lam0)*cos(phi) AS aa,
        {WGS84_A!r}*({_M0!r}*phi - {_M2!r}*sin(2*phi)
                     + {_M4!r}*sin(4*phi) - {_M6!r}*sin(6*phi)) AS m
      FROM b
    )
    SELECT event_id,
      (CASE WHEN south THEN 32700 ELSE 32600 END) + zone AS utm_epsg,
      round({_K0!r}*n*(aa + (1 - tt + cc)*pow(aa,3)/6.0
            + (5 - 18*tt + tt*tt + 72*cc - 58*{_EP2!r})*pow(aa,5)/120.0)
            + 500000.0, 2) AS easting,
      round({_K0!r}*(m + n*(s/c)*(pow(aa,2)/2.0
            + (5 - tt + 9*cc + 4*cc*cc)*pow(aa,4)/24.0
            + (61 - 58*tt + tt*tt + 600*cc - 330*{_EP2!r})*pow(aa,6)/720.0))
            + (CASE WHEN south THEN 10000000.0 ELSE 0.0 END), 2) AS northing
    FROM t
    """


def q_gcp_affine(sf_dir):
    """GCP transformer chain end-to-end: fit an order-1 polynomial from
    12 deterministic GCPs sampling an exact affine, then transform every
    event through the reproject stage. LSQ on exact-affine GCPs recovers
    the coefficients to ~1e-12, so the SQL closed-form affine matches at
    2-dp rounding."""
    from ..geom.gcp import GCPPolynomialTransformer

    k = np.arange(12, dtype=np.float64)
    gpx = (k * 97) % 1000
    gpy = (k * 211) % 800
    ggx = 500.0 + 0.25 * gpx - 0.05 * gpy
    ggy = -200.0 + 0.03 * gpx + 0.4 * gpy
    t = GCPPolynomialTransformer(gpx, gpy, ggx, ggy, order=1)
    pts = events_points(sf_dir)
    out = reproject(pts, transformer=t, x_col="lon", y_col="lat",
                    out_x="tx", out_y="ty", round_to=2)
    return out.select_columns(["event_id", "tx", "ty"])


SQL_GCP_AFFINE = f"""
SELECT event_id,
  round(500.0 + 0.25*lon - 0.05*lat, 2) AS tx,
  round(-200.0 + 0.03*lon + 0.4*lat, 2) AS ty
FROM {_POINTS_SQL} p
"""


def q_makevalid_bowties(sf_dir):
    """MakeValid end-to-end: one self-intersecting bowtie ring per part
    key; output the repaired even-odd area in cents. Closed form: a
    bowtie over a w x h box has valid area w*h/2 (two mirrored lobes)."""
    from ..stages.geom_ops import centroid_area, make_valid_geometry

    part = tables.read_table_arrow(sf_dir, "part", columns=["p_partkey"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    pk = pk[pk <= 200]
    x0, y0, x1, y1 = derive.part_boxes(pk)
    geoms = [wkb_mod.polygon_to_wkb([np.array(
        [[a, b], [c, d], [c, b], [a, d], [a, b]], dtype=np.float64)])
        for a, b, c, d in zip(x0, y0, x1, y1)]
    ds = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array(pk),
        "geometry": pa.array(geoms, type=pa.binary())})).repartition(8)
    fixed = centroid_area(make_valid_geometry(ds))

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": batch["p_partkey"],
            "valid_area_c": pa.array(_cents(
                batch["area"].to_numpy(zero_copy_only=False))),
        })

    return fixed.map_batches(f, batch_format="pyarrow")


def sql_makevalid_bowties():
    return f"""
    SELECT p_partkey,
      CAST(floor(CAST((({derive.SQL_PART_XMAX}) - ({derive.SQL_PART_XMIN})) AS DOUBLE)
           * (({derive.SQL_PART_YMAX}) - ({derive.SQL_PART_YMIN})) / 2.0 * 100 + 0.5)
           AS BIGINT) AS valid_area_c
    FROM part WHERE p_partkey <= 200
    """


def q_rasterize_tiles(sf_dir):
    pts = events_points(sf_dir)
    t = rast.tile_summary(rast.rasterize_pixels(pts, 8, merge_alg="count", shuffle_partitions=8), shuffle_partitions=8)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": pc.cast(batch["tile_x"], pa.int64()),
            "tile_y": pc.cast(batch["tile_y"], pa.int64()),
            "n_points": pc.cast(pc.round(batch["total"]), pa.int64()),
        })

    return t.map_batches(f, batch_format="pyarrow")


def sql_rasterize():
    tx, ty = _tile_sql(8)
    return f"""
    SELECT {tx} AS tile_x, {ty} AS tile_y, count(*) AS n_points
    FROM {_POINTS_SQL} p GROUP BY 1, 2
    """


_RAST_POLY_Z = 2  # global raster is 1024x1024 px — bounded oracle output


def q_rasterize_polygons(sf_dir):
    """Scanline polygon burn (gdal_rasterize parity): zone boxes ->
    per-pixel coverage counts at zoom 2. Exercises the even-odd
    pixel-center fill of `alg/llrasterize.cpp` GDALdllImageFilledPolygon
    via geom/scanline.py; oracle = the same center-in-box rule in SQL."""
    zones = ray.data.from_arrow(zone_table(sf_dir))
    pix = rast.rasterize_geometries(zones, _RAST_POLY_Z, merge_alg="count",
                                    shuffle_partitions=8)

    def f(batch: pa.Table) -> pa.Table:
        _, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({
            "gpx": pa.array(gpx),
            "gpy": pa.array(gpy),
            "n_zones": pc.cast(pc.round(batch["burn"]), pa.int64()),
        })

    return pix.map_batches(f, batch_format="pyarrow")


def _merc_fy_sql(lat_expr: str, npix: int) -> str:
    clipped = f"LEAST(GREATEST(CAST({lat_expr} AS DOUBLE), -85.05112878), 85.05112878)"
    return (f"(1 - ln(tan(radians({clipped})) + 1/cos(radians({clipped})))/pi())"
            f"/2*{npix}")


def sql_rasterize_polygons():
    npix = (1 << _RAST_POLY_Z) * 256
    fx = "((({e})+180.0)/360.0*{n})"
    return f"""
    WITH rng AS (
      SELECT zone_id,
        CAST(floor({fx.format(e='xmin', n=npix)} + 0.5) AS BIGINT) AS gx0,
        CAST(floor({fx.format(e='xmax', n=npix)} + 0.5) AS BIGINT) - 1 AS gx1,
        CAST(ceil({_merc_fy_sql('ymax', npix)} - 0.5) AS BIGINT) AS gy0,
        CAST(ceil({_merc_fy_sql('ymin', npix)} - 0.5) AS BIGINT) - 1 AS gy1
      FROM {_ZONES_SQL} z
    )
    , xs AS (
      SELECT zone_id, unnest(generate_series(gx0, gx1)) AS gpx, gy0, gy1
      FROM rng
    ), xy AS (
      SELECT zone_id, gpx, unnest(generate_series(gy0, gy1)) AS gpy FROM xs
    )
    SELECT gpx, gpy, count(*) AS n_zones FROM xy GROUP BY 1, 2
    """


def q_rasterize_lines(sf_dir):
    """Bresenham line burn (GDALdllImageLine parity): one vertical
    meridian segment per zone (center lon, ymin..ymax lat). Vertical
    Bresenham = floor-pixel span inclusive of both endpoints — exactly
    expressible in SQL."""
    nat = tables.read_table_arrow(sf_dir, "nation", columns=["n_nationkey"])
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
    cx = (xmin + xmax) / 2.0
    geoms = [wkb_mod.linestring_to_wkb(np.array([[float(c), float(y0)],
                                                 [float(c), float(y1)]]))
             for c, y0, y1 in zip(cx, ymin, ymax)]
    lines = ray.data.from_arrow(pa.table({
        "geometry": pa.array(geoms, type=pa.binary())}))
    pix = rast.rasterize_geometries(lines, _RAST_POLY_Z, merge_alg="count",
                                    shuffle_partitions=8)

    def f(batch: pa.Table) -> pa.Table:
        _, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({
            "gpx": pa.array(gpx),
            "gpy": pa.array(gpy),
            "n_lines": pc.cast(pc.round(batch["burn"]), pa.int64()),
        })

    return pix.map_batches(f, batch_format="pyarrow")


def sql_rasterize_lines():
    npix = (1 << _RAST_POLY_Z) * 256
    return f"""
    WITH rng AS (
      SELECT zone_id,
        CAST(floor(((xmin + xmax)/2.0 + 180.0)/360.0*{npix}) AS BIGINT) AS gx,
        GREATEST(CAST(floor({_merc_fy_sql('ymax', npix)}) AS BIGINT), 0) AS gy0,
        LEAST(CAST(floor({_merc_fy_sql('ymin', npix)}) AS BIGINT), {npix - 1}) AS gy1
      FROM {_ZONES_SQL} z
    )
    , xy AS (
      SELECT zone_id, gx AS gpx, unnest(generate_series(gy0, gy1)) AS gpy
      FROM rng
    )
    SELECT gpx, gpy, count(*) AS n_lines FROM xy GROUP BY 1, 2
    """


def q_tile_overview(sf_dir):
    pts = events_points(sf_dir)
    base = rast.rasterize_pixels(pts, 8, merge_alg="count", shuffle_partitions=8)
    levels = tiles_mod.overview_pyramid(base, 8, 6, how="sum", shuffle_partitions=8)
    t = rast.tile_summary(levels[6], shuffle_partitions=8)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": pc.cast(batch["tile_x"], pa.int64()),
            "tile_y": pc.cast(batch["tile_y"], pa.int64()),
            "n_points": pc.cast(pc.round(batch["total"]), pa.int64()),
        })

    return t.map_batches(f, batch_format="pyarrow")


def sql_tile_overview():
    tx, ty = _tile_sql(6)
    return f"""
    SELECT {tx} AS tile_x, {ty} AS tile_y, count(*) AS n_points
    FROM {_POINTS_SQL} p GROUP BY 1, 2
    """


def _q_overview(sf_dir, how: str):
    """One overview step z7 -> z6 on the events count raster with the
    given reducer; integer-valued doubles keep every sum exact, and the
    final division/sqrt is the same single IEEE op on both sides.
    Reference: `gcore/overview.cpp:3355-4641`."""
    pts = events_points(sf_dir)
    base = rast.rasterize_pixels(pts, 7, merge_alg="count")
    out = tiles_mod.overview_pixels(base, how=how)

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "val": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def q_overview_average(sf_dir):
    return _q_overview(sf_dir, "average")


def q_overview_rms(sf_dir):
    return _q_overview(sf_dir, "rms")


def q_overview_mode(sf_dir):
    return _q_overview(sf_dir, "mode")


def q_overview_gauss(sf_dir):
    return _q_overview(sf_dir, "gauss")


def q_overview_cubicspline(sf_dir):
    return _q_overview(sf_dir, "cubicspline")


def sql_overview_cubicspline():
    # mirror of the engine's 4-tap-per-axis B-spline scatter with the
    # exact integer weights {1,27,121,235} (the /384 cancels in the
    # weighted mean); parity picks the tap offsets
    def taps(c, d):
        return f"""
      SELECT gx, gy, {c} // 2 + CASE WHEN {c} % 2 = 0 THEN -2 ELSE -1 END AS {d},
             CASE WHEN {c} % 2 = 0 THEN 1.0 ELSE 27.0 END AS w{d} FROM c7
      UNION ALL
      SELECT gx, gy, {c} // 2 + CASE WHEN {c} % 2 = 0 THEN -1 ELSE 0 END,
             CASE WHEN {c} % 2 = 0 THEN 121.0 ELSE 235.0 END FROM c7
      UNION ALL
      SELECT gx, gy, {c} // 2 + CASE WHEN {c} % 2 = 0 THEN 0 ELSE 1 END,
             CASE WHEN {c} % 2 = 0 THEN 235.0 ELSE 121.0 END FROM c7
      UNION ALL
      SELECT gx, gy, {c} // 2 + CASE WHEN {c} % 2 = 0 THEN 1 ELSE 2 END,
             CASE WHEN {c} % 2 = 0 THEN 27.0 ELSE 1.0 END FROM c7
        """

    return f"""
    WITH {_sql_c7()}, xo AS (
      SELECT * FROM ({taps('gx', 'dx')}) WHERE dx >= 0
    ), yo AS (
      SELECT * FROM ({taps('gy', 'dy')}) WHERE dy >= 0
    )
    SELECT x.dx AS gpx, y.dy AS gpy,
           sum(x.wdx * y.wdy * c.v) / sum(x.wdx * y.wdy) AS val
    FROM c7 c
    JOIN xo x ON x.gx = c.gx AND x.gy = c.gy
    JOIN yo y ON y.gx = c.gx AND y.gy = c.gy
    GROUP BY 1, 2
    """


def _sql_c7():
    gx, gy = _tile_sql(15)  # z7 global pixels
    return f"""c7 AS (
      SELECT {gx} AS gx, {gy} AS gy, CAST(count(*) AS DOUBLE) AS v
      FROM {_POINTS_SQL} p GROUP BY 1, 2
    )"""


def sql_overview_average():
    return f"""
    WITH {_sql_c7()}
    SELECT gx // 2 AS gpx, gy // 2 AS gpy,
           sum(v) / CAST(count(*) AS DOUBLE) AS val
    FROM c7 GROUP BY 1, 2
    """


def sql_overview_rms():
    return f"""
    WITH {_sql_c7()}
    SELECT gx // 2 AS gpx, gy // 2 AS gpy,
           sqrt(sum(v * v) / CAST(count(*) AS DOUBLE)) AS val
    FROM c7 GROUP BY 1, 2
    """


def sql_overview_mode():
    return f"""
    WITH {_sql_c7()}, cnts AS (
      SELECT gx // 2 AS gpx, gy // 2 AS gpy, v, count(*) AS c
      FROM c7 GROUP BY 1, 2, 3
    )
    SELECT gpx, gpy, v AS val FROM (
      SELECT gpx, gpy, v,
             row_number() OVER (PARTITION BY gpx, gpy
                                ORDER BY c DESC, v ASC) AS rk
      FROM cnts) WHERE rk = 1
    """


def sql_overview_gauss():
    # mirror of the engine's scatter: even source coord -> two dests
    # (offset 0 and 2, weight 1); odd -> one dest (offset 1, weight 2)
    return f"""
    WITH {_sql_c7()}, xo AS (
      SELECT gx, gy, gx // 2 AS dx,
             CASE WHEN gx % 2 = 1 THEN 2.0 ELSE 1.0 END AS wx FROM c7
      UNION ALL
      SELECT gx, gy, gx // 2 - 1, 1.0 FROM c7
      WHERE gx % 2 = 0 AND gx // 2 - 1 >= 0
    ), yo AS (
      SELECT gx, gy, gy // 2 AS dy,
             CASE WHEN gy % 2 = 1 THEN 2.0 ELSE 1.0 END AS wy FROM c7
      UNION ALL
      SELECT gx, gy, gy // 2 - 1, 1.0 FROM c7
      WHERE gy % 2 = 0 AND gy // 2 - 1 >= 0
    )
    SELECT x.dx AS gpx, y.dy AS gpy,
           sum(x.wx * y.wy * c.v) / sum(x.wx * y.wy) AS val
    FROM c7 c
    JOIN xo x ON x.gx = c.gx AND x.gy = c.gy
    JOIN yo y ON y.gx = c.gx AND y.gy = c.gy
    GROUP BY 1, 2
    """


def q_grid_linear(sf_dir):
    """Delaunay-linear gridding (GDAL `GDALGridLinear`,
    `alg/gdalgrid.cpp` linear via `alg/delaunay.c`). Site layout: one
    well-separated triangle of 3 sites per nation key — each small
    triangle's circumcircle is empty, so it is PROVABLY a Delaunay face
    regardless of how the triangulation connects the clusters. The
    query keeps only points ≥0.01 inside a cluster face (margin on
    bit-identical barycentrics), where the oracle reproduces the same
    barycentric interpolation in closed form."""
    from .gridding import grid_linear

    nat = tables.read_table_arrow(sf_dir, "nation", columns=["n_nationkey"])
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    # 3 sites per nation: A=(Cx+1,Cy+1) B=(Cx+6,Cy+2) C=(Cx+2,Cy+6)
    cxs = (nk % 5) * 12.0
    cys = (nk // 5) * 12.0
    sx = np.concatenate([cxs + 1.0, cxs + 6.0, cxs + 2.0])
    sy = np.concatenate([cys + 1.0, cys + 2.0, cys + 6.0])
    sid = np.concatenate([nk * 3, nk * 3 + 1, nk * 3 + 2])
    order = np.argsort(sid)
    sx, sy = sx[order], sy[order]
    sv = ((sid[order] * 37) % 101).astype(np.float64)

    W = 128  # query lattice: x,y = 0.25 + 0.5*i over [0, 64)

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"x": pa.array(0.25 + 0.5 * (idx % W)),
                         "y": pa.array(0.25 + 0.5 * (idx // W))})

    queries = ray.data.range(W * W).map_batches(gen, batch_format="pyarrow")
    out = grid_linear(queries, sx, sy, sv, cell=8.0)

    def f(batch: pa.Table) -> pa.Table:
        i1 = batch["i1"].to_numpy(zero_copy_only=False)
        i2 = batch["i2"].to_numpy(zero_copy_only=False)
        i3 = batch["i3"].to_numpy(zero_copy_only=False)
        l1 = batch["l1"].to_numpy(zero_copy_only=False)
        l2 = batch["l2"].to_numpy(zero_copy_only=False)
        l3 = batch["l3"].to_numpy(zero_copy_only=False)
        keep = ((i1 % 3 == 0) & (i2 == i1 + 1) & (i3 == i1 + 2)
                & (l1 >= 0.01) & (l2 >= 0.01) & (l3 >= 0.01))
        sub = batch.filter(pa.array(keep))
        return pa.table({"x": sub["x"], "y": sub["y"],
                         "nation": pc.cast(pc.divide(sub["i1"], 3), pa.int64()),
                         "v": sub["v"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_grid_linear():
    # mirror the engine's barycentric expressions verbatim (vertex roles
    # = site-id order: A=3k, B=3k+1, C=3k+2)
    l1 = "((y2 - y3) * (q.x - x3) + (x3 - x2) * (q.y - y3)) / den"
    l2 = "((y3 - y1) * (q.x - x3) + (x1 - x3) * (q.y - y3)) / den"
    return f"""
    WITH t AS (
      SELECT n_nationkey AS k,
        (n_nationkey % 5) * 12.0 + 1.0 AS x1, (n_nationkey // 5) * 12.0 + 1.0 AS y1,
        (n_nationkey % 5) * 12.0 + 6.0 AS x2, (n_nationkey // 5) * 12.0 + 2.0 AS y2,
        (n_nationkey % 5) * 12.0 + 2.0 AS x3, (n_nationkey // 5) * 12.0 + 6.0 AS y3,
        CAST((n_nationkey * 3 * 37) % 101 AS DOUBLE) AS v1,
        CAST(((n_nationkey * 3 + 1) * 37) % 101 AS DOUBLE) AS v2,
        CAST(((n_nationkey * 3 + 2) * 37) % 101 AS DOUBLE) AS v3
      FROM nation
    ), tt AS (
      SELECT *, (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3) AS den FROM t
    ), q AS (
      SELECT 0.25 + 0.5 * (i % 128) AS x, 0.25 + 0.5 * (i // 128) AS y
      FROM (SELECT unnest(generate_series(0, 128 * 128 - 1)) AS i)
    ), b AS (
      SELECT q.x, q.y, CAST(tt.k AS BIGINT) AS nation,
             {l1} AS l1, {l2} AS l2,
             1.0 - ({l1}) - ({l2}) AS l3,
             v1, v2, v3
      FROM q, tt
    )
    SELECT x, y, nation, l1 * v1 + l2 * v2 + l3 * v3 AS v
    FROM b WHERE l1 >= 0.01 AND l2 >= 0.01 AND l3 >= 0.01
    """


def q_zonal_stats(sf_dir):
    pts = events_points(sf_dir, cols=("event_id", "value"))
    pts = add_cents(pts, "value", "value_c")
    zones = zone_table(sf_dir)
    from .spatial_join import broadcast_pip_join

    joined = broadcast_pip_join(pts, zones, "geometry", ["zone_id"], res=5.0,
                                predicate="envelope")
    agg = rel.grouped_agg(joined, "zone_id", [
        ("count", None, "n"),
        ("sum", "value_c", "sum_value_c"),
        ("min", "value", "min_val"),
        ("max", "value", "max_val"),
    ], shuffle_partitions=8)
    return agg


SQL_ZONAL = f"""
SELECT zone_id, count(*) AS n,
       CAST(sum({CENTS.format(x='value')}) AS BIGINT) AS sum_value_c,
       min(value) AS min_val, max(value) AS max_val
FROM {_POINTS_SQL} p JOIN {_ZONES_SQL} z
ON p.lon >= z.xmin AND p.lon <= z.xmax AND p.lat >= z.ymin AND p.lat <= z.ymax
GROUP BY zone_id
"""


def q_zonal_weighted(sf_dir):
    """Zonal stats with fractional pixel coverage weights
    (`alg/zonal.cpp` weighted mode) over the z7 count raster; zone
    boxes projected to global-pixel space (exact-arith weights,
    rounded to 4 dp on both sides for the libm lat edges)."""
    from ..geom import cells as cellsm
    from .zonal import zonal_stats_weighted

    pts = events_points(sf_dir)
    counts = rast.rasterize_pixels(pts, 7, merge_alg="count", shuffle_partitions=8)
    nat = tables.read_table_arrow(sf_dir, "nation", columns=["n_nationkey"])
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
    m = (1 << 7) * 256
    zx0 = (xmin.astype(np.float64) + 180.0) / 360.0 * m
    zx1 = (xmax.astype(np.float64) + 180.0) / 360.0 * m
    def lat_to_gy(lat):
        lat = np.clip(lat.astype(np.float64), -cellsm.MAX_MERC_LAT, cellsm.MAX_MERC_LAT)
        rad = np.radians(lat)
        return (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * m
    zy0 = lat_to_gy(ymax)  # north edge -> smaller gy
    zy1 = lat_to_gy(ymin)
    # quantize: integer fixed-point contributions so the grouped sums
    # are order-independent (a round(4) output must not depend on block
    # splits — see gridding._MetricStage note)
    out = zonal_stats_weighted(counts, nk, (zx0, zy0, zx1, zy1), 7,
                               shuffle_partitions=8, quantize=10**8)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "zone_id": batch["zone_id"],
            "weighted_sum": pc.round(batch["weighted_sum"], ndigits=4),
            "weight_sum": pc.round(batch["weight_sum"], ndigits=4),
        })

    return out.map_batches(f, batch_format="pyarrow")


def sql_zonal_weighted():
    gx, gy = _pixel_sql(7)
    m = (1 << 7) * 256
    cl = "least(greatest(CAST({lat} AS DOUBLE), -85.05112878), 85.05112878)"
    lat_gy = ("(1 - ln(tan(radians(" + cl + ")) + 1/cos(radians(" + cl
              + ")))/pi())/2*" + str(m))
    return f"""
    WITH px AS (SELECT {gx} AS gpx, {gy} AS gpy, CAST(count(*) AS DOUBLE) AS c
                FROM {_POINTS_SQL} p GROUP BY 1, 2),
    zb AS (SELECT zone_id,
           (xmin + 180.0)/360.0*{m} AS zx0, (xmax + 180.0)/360.0*{m} AS zx1,
           {lat_gy.format(lat='ymax')} AS zy0, {lat_gy.format(lat='ymin')} AS zy1
           FROM {_ZONES_SQL} z),
    pairs AS (SELECT zone_id, c,
           least(greatest(least(gpx + 1.0, zx1) - greatest(CAST(gpx AS DOUBLE), zx0), 0.0), 1.0)
           * least(greatest(least(gpy + 1.0, zy1) - greatest(CAST(gpy AS DOUBLE), zy0), 0.0), 1.0)
             AS cov
           FROM px, zb)
    SELECT zone_id,
           round(sum(CAST(floor(c * cov * 100000000.0 + 0.5) AS BIGINT))
                 / 100000000.0, 4) AS weighted_sum,
           round(sum(CAST(floor(cov * 100000000.0 + 0.5) AS BIGINT))
                 / 100000000.0, 4) AS weight_sum
    FROM pairs WHERE cov > 0 GROUP BY zone_id
    """


def q_zone_geometry(sf_dir):
    zones = ray.data.from_arrow(zone_table(sf_dir))
    ds = geom_ops.centroid_area(zones, "geometry")
    ds = geom_ops.envelope_buffer(ds, 2.0, "geometry")
    return ds.select_columns(["zone_id", "centroid_x", "centroid_y", "area",
                              "buf_xmin", "buf_ymin", "buf_xmax", "buf_ymax"])


SQL_ZONE_GEOM = f"""
SELECT zone_id,
       (xmin + xmax)/2 AS centroid_x, (ymin + ymax)/2 AS centroid_y,
       (xmax - xmin) * (ymax - ymin) AS area,
       xmin - 2.0 AS buf_xmin, ymin - 2.0 AS buf_ymin,
       xmax + 2.0 AS buf_xmax, ymax + 2.0 AS buf_ymax
FROM {_ZONES_SQL} z
"""


def q_where_filter(sf_dir):
    """OGR SQL attribute filter (SetAttributeFilter parser, functions/swq.py)."""
    from ..functions.swq import attribute_filter

    ds = tables.read_table(sf_dir, "lineitem",
                           columns=["l_orderkey", "l_linenumber", "l_quantity",
                                    "l_returnflag", "l_linestatus"])
    out = attribute_filter(
        ds, "l_quantity BETWEEN 20 AND 30 AND l_returnflag <> 'N' "
            "AND l_linenumber IN (1, 2, 3)")
    return out.select_columns(["l_orderkey", "l_linenumber", "l_quantity"])


SQL_WHERE = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_quantity BETWEEN 20 AND 30 AND l_returnflag <> 'N'
  AND l_linenumber IN (1, 2, 3)
"""


def q_clip_semi(sf_dir):
    """Layer-algebra Clip for points: keep each point inside any zone once."""
    from .spatial_join import broadcast_pip_join

    pts = events_points(sf_dir)
    zones = zone_table(sf_dir)
    out = broadcast_pip_join(pts, zones, "geometry", [], res=5.0,
                             how="semi", predicate="envelope")
    return out.select_columns(["event_id"])


SQL_CLIP = f"""
SELECT event_id FROM {_POINTS_SQL} p
WHERE EXISTS (SELECT 1 FROM {_ZONES_SQL} z
  WHERE p.lon >= z.xmin AND p.lon <= z.xmax AND p.lat >= z.ymin AND p.lat <= z.ymax)
"""


def q_erase_anti(sf_dir):
    """Layer-algebra Erase for points: points outside every zone."""
    from .spatial_join import broadcast_pip_join

    pts = events_points(sf_dir)
    zones = zone_table(sf_dir)
    out = broadcast_pip_join(pts, zones, "geometry", [], res=5.0,
                             how="anti", predicate="envelope")
    return out.select_columns(["event_id"])


SQL_ERASE = f"""
SELECT event_id FROM {_POINTS_SQL} p
WHERE NOT EXISTS (SELECT 1 FROM {_ZONES_SQL} z
  WHERE p.lon >= z.xmin AND p.lon <= z.xmax AND p.lat >= z.ymin AND p.lat <= z.ymax)
"""


def q_identity_left(sf_dir):
    """Layer-algebra Identity for points: left join keeps non-matching
    input rows with null method fields (ogrlayer.cpp:6589)."""
    from .spatial_join import broadcast_pip_join

    pts = events_points(sf_dir)
    zones = zone_table(sf_dir)
    out = broadcast_pip_join(pts, zones, "geometry", ["zone_id"], res=5.0,
                             how="left", predicate="envelope")
    return out.select_columns(["event_id", "zone_id"])


SQL_IDENTITY = f"""
SELECT event_id, zone_id FROM {_POINTS_SQL} p LEFT JOIN {_ZONES_SQL} z
ON p.lon >= z.xmin AND p.lon <= z.xmax AND p.lat >= z.ymin AND p.lat <= z.ymax
"""


def q_raster_calc_ratio(sf_dir):
    """Band math: mean value per pixel = (sum-of-cents raster) /
    (count raster), both bands fused into ONE rasterize pass + ONE
    pixel exchange (rasterize_pixels_multi) — both sides exact ints."""
    from . import raster_calc as rc

    pts = events_points(sf_dir, cols=("event_id", "value"))
    pts = add_cents(pts, "value", "value_c")
    both = rast.rasterize_pixels_multi(
        pts, 7, [("value_c", "add", "s"), (None, "count", "n")],
        shuffle_partitions=8)

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        s = batch["s"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "gpx": pa.array(gpx), "gpy": pa.array(gpy),
            "mean_value_c": pa.array(s / n),
        })

    return both.map_batches(f, batch_format="pyarrow")


def sql_raster_calc_ratio():
    gx, gy = _pixel_sql(7)
    return f"""
    SELECT {gx} AS gpx, {gy} AS gpy,
           CAST(sum({CENTS.format(x='value')}) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS mean_value_c
    FROM {_POINTS_SQL} p GROUP BY 1, 2
    """


def _type_count_band(sf_dir, event_type: str, z: int = 6):
    pts = events_points(sf_dir, cols=("event_id", "event_type"))
    pts = pts.map_batches(
        lambda b, et=event_type: b.filter(pc.equal(b["event_type"], et)),
        batch_format="pyarrow")
    return rast.rasterize_pixels(pts, z, merge_alg="count",
                                 shuffle_partitions=8)


def _click_purchase_bands(sf_dir, z: int = 6):
    """Fused A=click-count, B=purchase-count bands: ONE events pass +
    ONE exchange (`rasterize_pixels_multi`) instead of two rasterize
    passes plus a co-align groupby — the pixel-function inputs arrive
    already co-located per pixel."""
    pts = events_points(sf_dir, cols=("event_id", "event_type"))

    def ind(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pc.is_in(et, value_set=pa.array(["click", "purchase"]))
        batch = batch.filter(keep)
        is_a = pc.equal(batch["event_type"], "click")
        return pa.table({
            "lon": batch["lon"], "lat": batch["lat"],
            "ia": pc.cast(is_a, pa.float64()),
            "ib": pc.cast(pc.invert(is_a), pa.float64()),
        })

    pts = pts.map_batches(ind, batch_format="pyarrow")
    return rast.rasterize_pixels_multi(
        pts, z, [("ia", "add", "A"), ("ib", "add", "B")],
        shuffle_partitions=8)


def q_pixfn_norm_diff(sf_dir):
    """VRT 'norm_diff' pixel function (pixelfunctions.cpp
    NormDiffPixelFunc): (A-B)/(A+B) over two z6 count bands (click vs
    purchase). Union pixels always have A+B >= 1, so no div-by-zero;
    integer counts make the single IEEE division bit-exact vs SQL."""
    from . import raster_calc as rc

    bands = _click_purchase_bands(sf_dir)
    out = rc.pixel_apply(bands, "norm_diff", cols=["A", "B"])

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "nd": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_pixfn_norm_diff():
    gx, gy = _pixel_sql(6)
    return f"""
    WITH px AS (
      SELECT {gx} AS gpx, {gy} AS gpy,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      FROM {_POINTS_SQL} p WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    )
    SELECT gpx, gpy,
           (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
             / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE)) AS nd
    FROM px
    """


def q_pixfn_interpolate(sf_dir):
    """VRT 'interpolate_linear' pixel function (pixelfunctions.cpp
    InterpolateLinear + intervalLeft): band stack (click, view) sampled
    at t=1 with t0=0, dt=2 -> y0 + (t-t0)*(y1-y0)/dt, exact over
    integer counts."""
    from . import raster_calc as rc

    a = _type_count_band(sf_dir, "click")
    b = _type_count_band(sf_dir, "view")
    out = rc.pixel_calc_multi([a, b], "interpolate_linear",
                              {"t0": 0.0, "dt": 2.0, "t": 1.0},
                              keep_empty=True)

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "vt": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_pixfn_interpolate():
    gx, gy = _pixel_sql(6)
    return f"""
    WITH px AS (
      SELECT {gx} AS gpx, {gy} AS gpy,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS b
      FROM {_POINTS_SQL} p WHERE event_type IN ('click', 'view')
      GROUP BY 1, 2
    )
    SELECT gpx, gpy,
           CAST(a AS DOUBLE)
             + (1.0 * (CAST(b AS DOUBLE) - CAST(a AS DOUBLE))) / 2.0
             AS vt
    FROM px
    """


def q_pixfn_expression(sf_dir):
    """muparser-style infix band math (gdal_calc --calc / VRT
    'expression' pixel function, pixelfunctions.cpp:2791): named
    bands through the swq arithmetic evaluator — the same expression
    text runs on the engine and (spelled out) on DuckDB."""
    from . import raster_calc as rc

    bands = _click_purchase_bands(sf_dir)
    out = rc.pixel_expression_cols(bands, "(A - B) / (A + B) + A * 2")

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "v": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_pixfn_expression():
    gx, gy = _pixel_sql(6)
    return f"""
    WITH px AS (
      SELECT {gx} AS gpx, {gy} AS gpy,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      FROM {_POINTS_SQL} p WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    )
    SELECT gpx, gpy,
           (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
             / (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
             + CAST(a AS DOUBLE) * 2 AS v
    FROM px
    """


def q_pixfn_complex_intensity(sf_dir):
    """VRT complex pixel-function family (pixelfunctions.cpp
    Complex/Conj/IntensityPixelFunc): merge two count bands into a
    complex raster, conjugate, then intensity re^2+im^2 — exercises
    the (pix_id, re, im) complex plumbing with integer-exact math."""
    from . import raster_calc as rc

    a = _type_count_band(sf_dir, "click")
    b = _type_count_band(sf_dir, "purchase")
    c = rc.complex_merge(a, b)
    out = rc.complex_op(rc.complex_op(c, "conj"), "intensity")

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "inten": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_pixfn_complex_intensity():
    gx, gy = _pixel_sql(6)
    return f"""
    WITH px AS (
      SELECT {gx} AS gpx, {gy} AS gpy,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      FROM {_POINTS_SQL} p WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2
    )
    SELECT gpx, gpy,
           CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
             + CAST(b AS DOUBLE) * CAST(b AS DOUBLE) AS inten
    FROM px
    """


def q_pixel_histogram(sf_dir):
    """Histogram of per-pixel point counts at z7 (GDALGetHistogram)."""
    from . import raster_calc as rc

    pts = events_points(sf_dir)
    counts = rast.rasterize_pixels(pts, 7, merge_alg="count", shuffle_partitions=8)
    hist = rc.pixel_histogram(counts, 0.0, 8.0, 8)

    def f(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({"bin": batch["bin"], "n": batch["n"]}).filter(pa.array(n > 0))

    return hist.map_batches(f, batch_format="pyarrow")


def sql_pixel_histogram():
    gx, gy = _pixel_sql(7)
    return f"""
    WITH px AS (SELECT {gx} AS gpx, {gy} AS gpy, count(*) AS c
                FROM {_POINTS_SQL} p GROUP BY 1, 2)
    SELECT CAST(least(floor(c/1.0), 7) AS BIGINT) AS bin, count(*) AS n
    FROM px GROUP BY 1
    """


def q_polygonize_regions(sf_dir):
    """Connected components of the z6 count raster. The oracle computes
    the same components with a recursive min-label reachability CTE
    (region_id == the component's minimum packed pixel id on both sides
    — the engine's union-find picks the smaller root at every merge)."""
    pts = events_points(sf_dir)
    # fused count ∘ tile-label path (identity bins): ONE pixel shuffle
    # instead of the count groupby + tile sort
    from .polygonize import label_binned_counts, regions_from_labels

    partials = rast.rasterize_pixels(pts, 6, merge_alg="count",
                                     combine=False)
    labeled = label_binned_counts(partials, None, None)
    out = regions_from_labels(labeled, shuffle_partitions=8)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "region_id": pc.cast(batch["region_id"], pa.int64()),
            "value": batch["value"],
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "gpx_min": pc.cast(batch["gpx_min"], pa.int64()),
            "gpy_min": pc.cast(batch["gpy_min"], pa.int64()),
            "gpx_max": pc.cast(batch["gpx_max"], pa.int64()),
            "gpy_max": pc.cast(batch["gpy_max"], pa.int64()),
        })

    return out.map_batches(f, batch_format="pyarrow")


def sql_polygonize_regions():
    gx, gy = _tile_sql(14)  # z6 global pixels
    # engine labels pack as (gx << 32) | gy (polygonize._label_pixels)
    return f"""
    WITH RECURSIVE pxl AS (
      SELECT gx, gy, cnt,
             (gx * 4294967296) + gy AS pid
      FROM (SELECT {gx} AS gx, {gy} AS gy, count(*) AS cnt
            FROM {_POINTS_SQL} p GROUP BY 1, 2)
    ), edges AS (
      SELECT a.pid AS pa, b.pid AS pb
      FROM pxl a JOIN pxl b ON a.cnt = b.cnt
        AND ((abs(a.gx - b.gx) = 1 AND a.gy = b.gy)
             OR (a.gx = b.gx AND abs(a.gy - b.gy) = 1))
    ), reach(pid, lbl) AS (
      SELECT pid, pid FROM pxl
      UNION
      SELECT e.pa, r.lbl FROM reach r JOIN edges e ON e.pb = r.pid
      WHERE r.lbl < e.pa
    ), lab AS (
      SELECT pid, min(lbl) AS region_id FROM reach GROUP BY 1
    )
    SELECT l.region_id,
           CAST(min(p.cnt) AS DOUBLE) AS value,
           count(*) AS n_pixels,
           min(p.gx) AS gpx_min, min(p.gy) AS gpy_min,
           max(p.gx) AS gpx_max, max(p.gy) AS gpy_max
    FROM lab l JOIN pxl p ON p.pid = l.pid
    GROUP BY 1
    """


_MDIM_SHAPE = (40, 30, 20)
_MDIM_CHUNK = (16, 16, 16)


def _mdim_fv(i, j, k):
    return ((i * 7 + j * 3 + k) % 11).astype(np.float64)


def _mdim_zarr_store() -> str:
    """Build-once on-disk Zarr v2 store holding the deterministic mdim
    array, so the mdim_* queries read REAL chunk files through
    `sources/zarr.py` (GDAL's Zarr driver analog,
    `frmts/zarr/zarr_v2_array.cpp`) instead of a synthesized Dataset.
    Built into a unique temp dir then renamed (atomic vs racers)."""
    import os
    import shutil

    from ..sources import multidim as md
    from ..sources import zarr as zr

    path = "/tmp/lib_gdal_ray_mdim.zarr"
    if not os.path.isfile(os.path.join(path, ".zarray")):
        tmp = f"{path}.build{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        arr = md.from_function(_MDIM_SHAPE, _MDIM_CHUNK, _mdim_fv)
        zr.write_zarr(arr, tmp, _MDIM_SHAPE, _MDIM_CHUNK,
                      compressor={"id": "zlib", "level": 1})
        try:
            os.rename(tmp, path)
        except OSError:  # concurrent builder won the rename
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def _mdim_arr() -> ray.data.Dataset:
    from ..sources import zarr as zr

    ds, _meta = zr.read_zarr(_mdim_zarr_store())
    return ds


def q_mdim_reduce(sf_dir):
    """GDALMDArray analog (§1.3): deterministic 3-D chunked array,
    sum-reduce over axis 2 (per-chunk partial + one groupby over the
    projected chunk key), exploded back to (i, j, total) element rows.
    Values v = (i*7 + j*3 + k) % 11 are integer-exact in float64."""
    from ..sources import multidim as md

    arr = _mdim_arr()  # REAL on-disk Zarr v2 store (sources/zarr.py)
    red = md.reduce_dim(arr, _MDIM_SHAPE, _MDIM_CHUNK, axis=2, op="sum")
    c0, c1 = _MDIM_CHUNK[0], _MDIM_CHUNK[1]
    n0, n1 = _MDIM_SHAPE[0], _MDIM_SHAPE[1]

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = md.unpack_chunks(keys, 2)
        ii, jj, vv = [], [], []
        for r in range(len(keys)):
            a0, a1 = int(idx[r, 0]) * c0, int(idx[r, 1]) * c1
            d0, d1 = min(a0 + c0, n0) - a0, min(a1 + c1, n1) - a1
            arr2 = np.frombuffer(batch["data"][r].as_py(),
                                 dtype="<f8").reshape(d0, d1)
            gi, gj = np.meshgrid(np.arange(a0, a0 + d0),
                                 np.arange(a1, a1 + d1), indexing="ij")
            ii.append(gi.ravel())
            jj.append(gj.ravel())
            vv.append(arr2.ravel())
        return pa.table({
            "i": pa.array(np.concatenate(ii) if ii else np.empty(0, np.int64)),
            "j": pa.array(np.concatenate(jj) if jj else np.empty(0, np.int64)),
            "total": pa.array((np.concatenate(vv) if vv
                               else np.empty(0)).astype(np.int64)),
        })

    return red.map_batches(explode, batch_format="pyarrow")


def sql_mdim_reduce():
    n0, n1, n2 = _MDIM_SHAPE
    return f"""
    WITH g AS (
      SELECT a.i, b.j, c.k
      FROM (SELECT unnest(generate_series(0, {n0 - 1})) AS i) a,
           (SELECT unnest(generate_series(0, {n1 - 1})) AS j) b,
           (SELECT unnest(generate_series(0, {n2 - 1})) AS k) c
    )
    SELECT i, j, CAST(sum((i*7 + j*3 + k) % 11) AS BIGINT) AS total
    FROM g GROUP BY 1, 2
    """


def q_mdim_stats(sf_dir):
    """GDALMDArray::ComputeStatistics analog over the deterministic 3-D
    array: global (n, vmin, vmax, mean, std_pop) via per-batch moment
    partials + one single-key groupby (`sources/multidim.py`
    statistics). All moments are integer-exact in float64, so mean and
    std match the SQL bit-for-bit."""
    from ..sources import multidim as md

    arr = _mdim_arr()  # REAL on-disk Zarr v2 store (sources/zarr.py)
    return md.statistics(arr)


def sql_mdim_stats():
    n0, n1, n2 = _MDIM_SHAPE
    return f"""
    WITH g AS (
      SELECT (i*7 + j*3 + k) % 11 AS v
      FROM (SELECT unnest(generate_series(0, {n0 - 1})) AS i) a,
           (SELECT unnest(generate_series(0, {n1 - 1})) AS j) b,
           (SELECT unnest(generate_series(0, {n2 - 1})) AS k) c
    )
    SELECT count(*) AS n, CAST(min(v) AS DOUBLE) AS vmin,
           CAST(max(v) AS DOUBLE) AS vmax,
           sum(CAST(v AS DOUBLE)) / count(*) AS mean,
           sqrt(sum(CAST(v AS DOUBLE)*CAST(v AS DOUBLE)) / count(*)
                - (sum(CAST(v AS DOUBLE)) / count(*))
                  * (sum(CAST(v AS DOUBLE)) / count(*))) AS std_pop
    FROM g
    """


def q_mdim_classic_tpi(sf_dir):
    """Multidim → raster bridge (GDALMDArray::AsClassicDataset): the
    3-D array mean-reduced over axis 2 becomes a 40×30 2-D slab, viewed
    as sparse z6 pixel rows, then fed to the focal TPI kernel — the
    multidim surface composing with the DEM operator family. Mean and
    TPI are pure arithmetic over integer-exact sums, so the SQL mirror
    is bit-exact (interior full-stencil pixels only)."""
    from ..sources import multidim as md
    from . import raster_calc as rc

    arr = _mdim_arr()  # REAL on-disk Zarr v2 store (sources/zarr.py)
    mean2d = md.reduce_dim(arr, _MDIM_SHAPE, _MDIM_CHUNK, axis=2, op="mean")
    shape2 = (_MDIM_SHAPE[0], _MDIM_SHAPE[1])
    chunk2 = (_MDIM_CHUNK[0], _MDIM_CHUNK[1])
    pixels = md.as_classic(mean2d, shape2, chunk2, z=6)
    out = rc.focal(pixels, "tpi")

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "tpi": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_mdim_classic_tpi():
    n0, n1, n2 = _MDIM_SHAPE
    # v(i, j) = sum_k((i*7+j*3+k)%11) / n2, exactly as reduce_dim(mean)
    # computes it (integer-exact sum, one divide). TPI mirrors focal's
    # tpi expression: center - (s0+s1+s2+s3+s5+s6+s7+s8)/8 with the
    # stencil in row-major (dy, dx) order; gpx=j, gpy=i (as_classic
    # x_dim=1, y_dim=0). Interior pixels only (full 3x3 stencil).
    return f"""
    WITH m AS (
      SELECT i, j, sum(CAST((i*7 + j*3 + k) % 11 AS DOUBLE)) / {n2}.0 AS v
      FROM (SELECT unnest(generate_series(0, {n0 - 1})) AS i) a,
           (SELECT unnest(generate_series(0, {n1 - 1})) AS j) b,
           (SELECT unnest(generate_series(0, {n2 - 1})) AS k) c
      GROUP BY 1, 2
    )
    SELECT c.j AS gpx, c.i AS gpy,
           c.v - ((s0.v + s1.v + s2.v + s3.v + s5.v + s6.v + s7.v + s8.v)
                  / 8.0) AS tpi
    FROM m c
    JOIN m s0 ON s0.i = c.i - 1 AND s0.j = c.j - 1
    JOIN m s1 ON s1.i = c.i - 1 AND s1.j = c.j
    JOIN m s2 ON s2.i = c.i - 1 AND s2.j = c.j + 1
    JOIN m s3 ON s3.i = c.i AND s3.j = c.j - 1
    JOIN m s5 ON s5.i = c.i AND s5.j = c.j + 1
    JOIN m s6 ON s6.i = c.i + 1 AND s6.j = c.j - 1
    JOIN m s7 ON s7.i = c.i + 1 AND s7.j = c.j
    JOIN m s8 ON s8.i = c.i + 1 AND s8.j = c.j + 1
    """


_ZRT_SHAPE = (17, 13, 9)
_ZRT_CHUNK = (8, 8, 8)  # edge chunks on every axis


def q_zarr_roundtrip(sf_dir, zarr_format: int = 2):
    """Zarr v2 round-trip (`frmts/zarr/zarr_v2_array.cpp` analog):
    write the deterministic 3-D array to a real on-disk store (zlib
    chunks, edge chunks padded per spec), read it back through the
    parallel chunk-file decoder, explode to element rows. Exercises
    the full writer→spec-file→reader path, values integer-exact.
    zarr_format=3 runs the same cycle through the v3 layout
    (zarr.json + c-prefixed chunk keys, `zarr_v3_array.cpp` analog)."""
    import os
    import shutil

    from ..sources import multidim as md
    from ..sources import zarr as zr

    path = f"/tmp/lib_gdal_ray_zarr{zarr_format}_rt.zarr"
    shutil.rmtree(path, ignore_errors=True)  # always a FRESH write
    arr = md.from_function(_ZRT_SHAPE, _ZRT_CHUNK, _mdim_fv)
    zr.write_zarr(arr, path, _ZRT_SHAPE, _ZRT_CHUNK,
                  compressor={"id": "zlib", "level": 1},
                  zarr_format=zarr_format)
    ds, _meta = zr.read_zarr(path)

    n0, n1, n2 = _ZRT_SHAPE
    c0, c1, c2 = _ZRT_CHUNK

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = md.unpack_chunks(keys, 3)
        ii, jj, kk, vv = [], [], [], []
        for r in range(len(keys)):
            a0 = int(idx[r, 0]) * c0
            a1 = int(idx[r, 1]) * c1
            a2 = int(idx[r, 2]) * c2
            d0 = min(a0 + c0, n0) - a0
            d1 = min(a1 + c1, n1) - a1
            d2 = min(a2 + c2, n2) - a2
            arr3 = np.frombuffer(batch["data"][r].as_py(),
                                 dtype="<f8").reshape(d0, d1, d2)
            gi, gj, gk = np.meshgrid(np.arange(a0, a0 + d0),
                                     np.arange(a1, a1 + d1),
                                     np.arange(a2, a2 + d2),
                                     indexing="ij")
            ii.append(gi.ravel())
            jj.append(gj.ravel())
            kk.append(gk.ravel())
            vv.append(arr3.ravel())
        cat = (lambda xs, dt: pa.array(
            (np.concatenate(xs) if xs else np.empty(0)).astype(dt)))
        return pa.table({"i": cat(ii, np.int64), "j": cat(jj, np.int64),
                         "k": cat(kk, np.int64), "v": cat(vv, np.int64)})

    return ds.map_batches(explode, batch_format="pyarrow")


def q_zarr_v3_roundtrip(sf_dir):
    """Zarr v3 round-trip (`frmts/zarr/zarr_v3_array.cpp` analog):
    same cycle/oracle as zarr_roundtrip over the v3 on-disk layout."""
    return q_zarr_roundtrip(sf_dir, zarr_format=3)


def q_netcdf_roundtrip(sf_dir):
    """NetCDF classic round-trip (`frmts/netcdf/` analog,
    sources/netcdf.py): the deterministic 3-D array written to a real
    CDF-2 file, read back as parallel chunk rows split on the slowest
    dim, exploded to element rows — same shape/oracle as
    zarr_roundtrip, different on-disk format."""
    import os

    from ..sources import multidim as md
    from ..sources import netcdf as ncdf

    path = f"/tmp/lib_gdal_ray_nc_rt_{os.getpid()}.nc"
    n0, n1, n2 = _ZRT_SHAPE
    i, j, k = np.meshgrid(np.arange(n0), np.arange(n1), np.arange(n2),
                          indexing="ij")
    ncdf.write_netcdf(path, {"v": _mdim_fv(i, j, k)},
                      dim_names={"v": ["i", "j", "k"]})
    ds, meta = ncdf.read_netcdf(path, "v", rows_per_chunk=8)
    c0 = meta["chunk_shape"][0]

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = md.unpack_chunks(keys, 3)
        ii, jj, kk, vv = [], [], [], []
        for r in range(len(keys)):
            a0 = int(idx[r, 0]) * c0
            d0 = min(a0 + c0, n0) - a0
            arr3 = np.frombuffer(batch["data"][r].as_py(),
                                 dtype="<f8").reshape(d0, n1, n2)
            gi, gj, gk = np.meshgrid(np.arange(a0, a0 + d0),
                                     np.arange(n1), np.arange(n2),
                                     indexing="ij")
            ii.append(gi.ravel())
            jj.append(gj.ravel())
            kk.append(gk.ravel())
            vv.append(arr3.ravel())
        cat = (lambda xs, dt: pa.array(
            (np.concatenate(xs) if xs else np.empty(0)).astype(dt)))
        return pa.table({"i": cat(ii, np.int64), "j": cat(jj, np.int64),
                         "k": cat(kk, np.int64), "v": cat(vv, np.int64)})

    return ds.map_batches(explode, batch_format="pyarrow")


def q_hdf5_roundtrip(sf_dir):
    """HDF5 round-trip (`frmts/hdf5/hdf5dataset.cpp` analog,
    sources/hdf5.py — a pure-python parser of the public HDF5 spec,
    values pinned against GDAL's own checksums): the deterministic
    3-D array written as a chunked+deflate HDF5 dataset (B-tree v1
    chunk index), read back one Ray task per stored chunk, exploded
    to element rows — same oracle as zarr_roundtrip, third on-disk
    format."""
    import os

    from ..sources import hdf5 as h5
    from ..sources import multidim as md

    path = f"/tmp/lib_gdal_ray_h5_rt_{os.getpid()}.h5"
    n0, n1, n2 = _ZRT_SHAPE
    c0, c1, c2 = _ZRT_CHUNK
    i, j, k = np.meshgrid(np.arange(n0), np.arange(n1), np.arange(n2),
                          indexing="ij")
    h5.write_hdf5(path, {"v": _mdim_fv(i, j, k)},
                  chunks={"v": _ZRT_CHUNK}, compress=True)
    ds, _meta = h5.read_hdf5(path, "v")

    def explode(batch: pa.Table) -> pa.Table:
        keys = batch["chunk_id"].to_numpy(zero_copy_only=False)
        idx = md.unpack_chunks(keys, 3)
        ii, jj, kk, vv = [], [], [], []
        for r in range(len(keys)):
            a0 = int(idx[r, 0]) * c0
            a1 = int(idx[r, 1]) * c1
            a2 = int(idx[r, 2]) * c2
            d0 = min(a0 + c0, n0) - a0
            d1 = min(a1 + c1, n1) - a1
            d2 = min(a2 + c2, n2) - a2
            arr3 = np.frombuffer(batch["data"][r].as_py(),
                                 dtype="<f8").reshape(d0, d1, d2)
            gi, gj, gk = np.meshgrid(np.arange(a0, a0 + d0),
                                     np.arange(a1, a1 + d1),
                                     np.arange(a2, a2 + d2),
                                     indexing="ij")
            ii.append(gi.ravel())
            jj.append(gj.ravel())
            kk.append(gk.ravel())
            vv.append(arr3.ravel())
        cat = (lambda xs, dt: pa.array(
            (np.concatenate(xs) if xs else np.empty(0)).astype(dt)))
        return pa.table({"i": cat(ii, np.int64), "j": cat(jj, np.int64),
                         "k": cat(kk, np.int64), "v": cat(vv, np.int64)})

    return ds.map_batches(explode, batch_format="pyarrow")


def sql_zarr_roundtrip():
    n0, n1, n2 = _ZRT_SHAPE
    return f"""
    SELECT a.i, b.j, c.k,
           CAST((a.i*7 + b.j*3 + c.k) % 11 AS BIGINT) AS v
    FROM (SELECT unnest(generate_series(0, {n0 - 1})) AS i) a,
         (SELECT unnest(generate_series(0, {n1 - 1})) AS j) b,
         (SELECT unnest(generate_series(0, {n2 - 1})) AS k) c
    """


def q_isobands(sf_dir):
    """gdal_contour -p analog (polygon isobands): bin the z6 count
    raster into fixed levels (reclassify), then polygonize the binned
    raster — filled contour polygons as connected components per level
    (`apps/gdal_contour_bin.cpp` -p / marching isobands expressed as
    the reclassify ∘ polygonize composition)."""
    from .polygonize import label_binned_counts, regions_from_labels

    pts = events_points(sf_dir)
    partials = rast.rasterize_pixels(pts, 6, merge_alg="count",
                                     combine=False)
    labeled = label_binned_counts(partials, [1.0, 2.0, 4.0, 8.0, 1e18],
                                  [1.0, 2.0, 3.0, 4.0])
    out = regions_from_labels(labeled, shuffle_partitions=8)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "region_id": pc.cast(batch["region_id"], pa.int64()),
            "level": pc.cast(batch["value"], pa.int64()),
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "gpx_min": pc.cast(batch["gpx_min"], pa.int64()),
            "gpy_min": pc.cast(batch["gpy_min"], pa.int64()),
            "gpx_max": pc.cast(batch["gpx_max"], pa.int64()),
            "gpy_max": pc.cast(batch["gpy_max"], pa.int64()),
        })

    return out.map_batches(f, batch_format="pyarrow")


def sql_isobands():
    gx, gy = _tile_sql(14)  # z6 global pixels
    return f"""
    WITH RECURSIVE pxl AS (
      SELECT gx, gy, bin,
             (gx * 4294967296) + gy AS pid
      FROM (SELECT gx, gy,
                   CASE WHEN cnt < 2 THEN 1 WHEN cnt < 4 THEN 2
                        WHEN cnt < 8 THEN 3 ELSE 4 END AS bin
            FROM (SELECT {gx} AS gx, {gy} AS gy, count(*) AS cnt
                  FROM {_POINTS_SQL} p GROUP BY 1, 2))
    ), edges AS (
      SELECT a.pid AS pa, b.pid AS pb
      FROM pxl a JOIN pxl b ON a.bin = b.bin
        AND ((abs(a.gx - b.gx) = 1 AND a.gy = b.gy)
             OR (a.gx = b.gx AND abs(a.gy - b.gy) = 1))
    ), reach(pid, lbl) AS (
      SELECT pid, pid FROM pxl
      UNION
      SELECT e.pa, r.lbl FROM reach r JOIN edges e ON e.pb = r.pid
      WHERE r.lbl < e.pa
    ), lab AS (
      SELECT pid, min(lbl) AS region_id FROM reach GROUP BY 1
    )
    SELECT l.region_id,
           CAST(min(p.bin) AS BIGINT) AS level,
           count(*) AS n_pixels,
           min(p.gx) AS gpx_min, min(p.gy) AS gpy_min,
           max(p.gx) AS gpx_max, max(p.gy) AS gpy_max
    FROM lab l JOIN pxl p ON p.pid = l.pid
    GROUP BY 1
    """


def q_hillshade(sf_dir):
    """DEM hillshade over a deterministic 128×128 analytic surface
    (rows-only; the kernel's dense oracle is tests/test_raster_calc.py —
    scattered event points don't form contiguous stencils)."""
    from . import raster_calc as rc

    def dem_batch(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx, gy = idx % 128, idx // 128
        val = 100.0 + 10.0 * np.sin(gx / 7.0) + 8.0 * np.cos(gy / 9.0)
        return pa.table({"pix_id": pa.array(rast.pack_pixel(6, gx, gy)),
                         "burn": pa.array(val)})

    dem = ray.data.range(128 * 128).map_batches(dem_batch, batch_format="pyarrow")
    out = rc.focal(dem, "hillshade")

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "shade": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_hillshade():
    """Exact Horn-hillshade mirror: the analytic DEM regenerates from
    generate_series, gradients and shade computed with the same
    expressions (radians/atan/atan2/cos/sin on identical doubles);
    full-stencil interior only (gx, gy in [1, 126])."""
    v = "(100.0 + 10.0*sin((gx+({dx}))/7.0) + 8.0*cos((gy+({dy}))/9.0))"

    def vv(dx, dy):
        return v.format(dx=dx, dy=dy)

    dzdx = (f"((({vv(1,-1)}) + 2*({vv(1,0)}) + ({vv(1,1)}))"
            f" - (({vv(-1,-1)}) + 2*({vv(-1,0)}) + ({vv(-1,1)}))) / 8.0")
    dzdy = (f"((({vv(-1,1)}) + 2*({vv(0,1)}) + ({vv(1,1)}))"
            f" - (({vv(-1,-1)}) + 2*({vv(0,-1)}) + ({vv(1,-1)}))) / 8.0")
    return f"""
    WITH g AS (
      SELECT a.gx, b.gy
      FROM (SELECT unnest(generate_series(1, 126)) AS gx) a,
           (SELECT unnest(generate_series(1, 126)) AS gy) b
    ), d AS (
      SELECT gx, gy, {dzdx} AS dzdx, {dzdy} AS dzdy FROM g
    )
    SELECT gx AS gpx, gy AS gpy,
      LEAST(GREATEST(round(254.0 * (
          cos(radians(45.0)) * cos(atan(sqrt(dzdx*dzdx + dzdy*dzdy)))
          + sin(radians(45.0)) * sin(atan(sqrt(dzdx*dzdx + dzdy*dzdy)))
            * cos(radians(315.0) - pi()/2.0 - atan2(-dzdy, -dzdx)))) + 1.0,
          1.0), 255.0) AS shade
    FROM d
    """


# ---------------------------------------------------------------------------
# gdaldem color-relief / compositing
# ---------------------------------------------------------------------------

# Integer slopes on every segment → np.interp lands on exact integers
# for integer inputs, so floor(lerp + 0.5) == lerp and the SQL mirror is
# bit-safe (no float rounding at .5 boundaries).
_RELIEF_RAMP = [
    (1, 0, 0, 64),
    (2, 50, 100, 64),
    (4, 200, 40, 0),
    (8, 252, 40, 200),
]


def q_color_relief(sf_dir):
    """gdaldem color-relief over the z7 count raster: piecewise-linear
    RGB ramp lookup with end clamping (apps/gdaldem_lib.cpp
    GDALColorReliefGetRGBA, linear interpolation mode)."""
    from . import raster_calc as rc

    pts = events_points(sf_dir)
    counts = rast.rasterize_pixels(pts, 7, merge_alg="count", shuffle_partitions=8)
    out = rc.color_relief(counts, _RELIEF_RAMP)

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "r": batch["r"], "g": batch["g"], "b": batch["b"]})

    return out.map_batches(f, batch_format="pyarrow")


def _ramp_case_sql(expr: str, chan: int) -> str:
    """CASE mirror of np.interp over _RELIEF_RAMP for channel chan
    (1=r 2=g 3=b): clamp below first / above last stop, slope-form lerp
    between stops, floor(x+0.5) half-up to INTEGER."""
    xs = [s[0] for s in _RELIEF_RAMP]
    ys = [s[chan] for s in _RELIEF_RAMP]
    parts = [f"WHEN ({expr}) <= {xs[0]} THEN {ys[0]}.0"]
    for i in range(len(xs) - 1):
        lerp = (f"(({ys[i + 1]}.0 - {ys[i]}.0) / ({xs[i + 1]}.0 - {xs[i]}.0))"
                f" * (({expr}) - {xs[i]}.0) + {ys[i]}.0")
        parts.append(f"WHEN ({expr}) <= {xs[i + 1]} THEN {lerp}")
    body = " ".join(parts)
    return f"CAST(floor((CASE {body} ELSE {ys[-1]}.0 END) + 0.5) AS INTEGER)"


def sql_color_relief():
    gx, gy = _pixel_sql(7)
    return f"""
    WITH px AS (SELECT {gx} AS gpx, {gy} AS gpy, count(*) AS c
                FROM {_POINTS_SQL} p GROUP BY 1, 2)
    SELECT gpx, gpy,
           {_ramp_case_sql('c', 1)} AS r,
           {_ramp_case_sql('c', 2)} AS g,
           {_ramp_case_sql('c', 3)} AS b
    FROM px
    """


def q_raster_blend(sf_dir):
    """Alpha-composite (alpha=96) of the even-event count raster OVER
    the odd-event count raster at z7 — integer-exact
    (a*96 + b*159 + 127) // 255 with nodata passthrough on either side
    (GDAL warp blend semantics)."""
    from . import raster_calc as rc

    pts = events_points(sf_dir)

    def side(parity: int):
        def fn(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(eid % 2 == parity))
        return fn

    a = rast.rasterize_pixels(pts.map_batches(side(0), batch_format="pyarrow"),
                              7, merge_alg="count", shuffle_partitions=8)
    b = rast.rasterize_pixels(pts.map_batches(side(1), batch_format="pyarrow"),
                              7, merge_alg="count", shuffle_partitions=8)
    out = rc.blend(a, b, 96)

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "burn": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_raster_blend():
    gx, gy = _pixel_sql(7)
    return f"""
    WITH ea AS (SELECT {gx} AS gpx, {gy} AS gpy, count(*) AS c
                FROM {_POINTS_SQL} p WHERE event_id % 2 = 0 GROUP BY 1, 2),
         eb AS (SELECT {gx} AS gpx, {gy} AS gpy, count(*) AS c
                FROM {_POINTS_SQL} p WHERE event_id % 2 = 1 GROUP BY 1, 2)
    SELECT COALESCE(a.gpx, b.gpx) AS gpx, COALESCE(a.gpy, b.gpy) AS gpy,
           CAST(CASE
             WHEN a.c IS NOT NULL AND b.c IS NOT NULL
               THEN (a.c * 96 + b.c * 159 + 127) // 255
             WHEN a.c IS NOT NULL THEN a.c
             ELSE b.c
           END AS DOUBLE) AS burn
    FROM ea a FULL OUTER JOIN eb b ON a.gpx = b.gpx AND a.gpy = b.gpy
    """


def _analytic_dem(n: int = 128, z: int = 6):
    """Deterministic analytic DEM shared by the focal-kernel queries."""
    from . import raster_calc as rc  # noqa: F401

    def dem_batch(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx, gy = idx % n, idx // n
        val = 100.0 + 10.0 * np.sin(gx / 7.0) + 8.0 * np.cos(gy / 9.0)
        return pa.table({"pix_id": pa.array(rast.pack_pixel(z, gx, gy)),
                         "burn": pa.array(val)})

    return ray.data.range(n * n).map_batches(dem_batch, batch_format="pyarrow")


_DEM_V = "(100.0 + 10.0*sin((gx+({dx}))/7.0) + 8.0*cos((gy+({dy}))/9.0))"


def _dem_sql_gradients(alg: str = "horn"):
    """(dzdx, dzdy) SQL closed forms over the analytic DEM, mirroring
    focal()'s Horn / Zevenbergen-Thorne stencils expression-by-expression."""
    def vv(dx, dy):
        return _DEM_V.format(dx=dx, dy=dy)

    if alg == "zevenbergen":
        dzdx = f"((({vv(1,0)}) - ({vv(-1,0)})) / 2.0)"
        dzdy = f"((({vv(0,1)}) - ({vv(0,-1)})) / 2.0)"
    else:
        dzdx = (f"((({vv(1,-1)}) + 2*({vv(1,0)}) + ({vv(1,1)}))"
                f" - (({vv(-1,-1)}) + 2*({vv(-1,0)}) + ({vv(-1,1)}))) / 8.0")
        dzdy = (f"((({vv(-1,1)}) + 2*({vv(0,1)}) + ({vv(1,1)}))"
                f" - (({vv(-1,-1)}) + 2*({vv(0,-1)}) + ({vv(1,-1)}))) / 8.0")
    return dzdx, dzdy


def q_hillshade_md(sf_dir):
    """gdaldem hillshade -multidirectional over the analytic DEM
    (USGS OFR 92-422 4-azimuth weighted shade,
    apps/gdaldem_lib.cpp:1238-1295)."""
    from . import raster_calc as rc

    out = rc.focal(_analytic_dem(), "hillshade_md")

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "shade": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_hillshade_md():
    dzdx, dzdy = _dem_sql_gradients("horn")
    shades = []
    for az in ("225.0", "270.0", "315.0", "360.0"):
        shades.append(
            "GREATEST(0.0, cos(radians(45.0)) * cos(atan(sqrt(dzdx*dzdx + dzdy*dzdy)))"
            " + sin(radians(45.0)) * sin(atan(sqrt(dzdx*dzdx + dzdy*dzdy)))"
            f" * cos(radians({az}) - pi()/2.0 - atan2(-dzdy, -dzdx)))")
    comp = ("0.5 * (((0.5*xxyy - dzdx*dzdy)/xxyy) * s225"
            " + (dzdx*dzdx/xxyy) * s270"
            " + ((0.5*xxyy + dzdx*dzdy)/xxyy) * s315"
            " + (dzdy*dzdy/xxyy) * s360)")
    return f"""
    WITH g AS (
      SELECT a.gx, b.gy
      FROM (SELECT unnest(generate_series(1, 126)) AS gx) a,
           (SELECT unnest(generate_series(1, 126)) AS gy) b
    ), d AS (
      SELECT gx, gy, {dzdx} AS dzdx, {dzdy} AS dzdy FROM g
    ), e AS (
      SELECT gx, gy, dzdx, dzdy, dzdx*dzdx + dzdy*dzdy AS xxyy,
             {shades[0]} AS s225, {shades[1]} AS s270,
             {shades[2]} AS s315, {shades[3]} AS s360
      FROM d
    )
    SELECT gx AS gpx, gy AS gpy,
           LEAST(GREATEST(round(254.0 * ({comp})) + 1.0, 1.0), 255.0) AS shade
    FROM e
    """


def _dem_grid_sql(inner: str) -> str:
    """Wrap a per-(gx,gy) SELECT expression over the interior of the
    analytic DEM grid."""
    return f"""
    WITH g AS (
      SELECT a.gx, b.gy
      FROM (SELECT unnest(generate_series(1, 126)) AS gx) a,
           (SELECT unnest(generate_series(1, 126)) AS gy) b
    )
    SELECT gx AS gpx, gy AS gpy, {inner}
    FROM g
    """


def _dem_stencil_sql():
    """s0..s8 closed forms in focal()'s row-major stencil order."""
    def vv(dx, dy):
        return "(" + _DEM_V.format(dx=dx, dy=dy) + ")"

    return [vv(i % 3 - 1, i // 3 - 1) for i in range(9)]


def _q_dem_kernel(kernel: str, out_col: str, round_to=None):
    from . import raster_calc as rc

    def q(sf_dir):
        out = rc.focal(_analytic_dem(), kernel)

        def f(batch: pa.Table) -> pa.Table:
            z, gpx, gpy = rast.unpack_pixel(
                batch["pix_id"].to_numpy(zero_copy_only=False))
            v = batch["burn"].to_numpy(zero_copy_only=False)
            if round_to is not None:
                v = np.round(v, round_to)
            return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                             out_col: pa.array(v)})

        return out.map_batches(f, batch_format="pyarrow")

    return q


def sql_aspect():
    """gdaldem aspect (azimuth form): degrees(atan2(-dzdy, -dzdx)) then
    the >90 ? 450-a : 90-a azimuth transform (apps/gdaldem_lib.cpp
    GDALAspectAlg with bAngleAsAzimuth); rounded to 4 decimals both
    sides (ULP guard)."""
    dzdx, dzdy = _dem_sql_gradients("horn")
    return f"""
    WITH g AS (
      SELECT a.gx, b.gy
      FROM (SELECT unnest(generate_series(1, 126)) AS gx) a,
           (SELECT unnest(generate_series(1, 126)) AS gy) b
    ), d AS (
      SELECT gx, gy, degrees(atan2(-({dzdy}), -({dzdx}))) AS a FROM g
    )
    SELECT gx AS gpx, gy AS gpy,
           round(CASE WHEN a > 90.0 THEN 450.0 - a ELSE 90.0 - a END, 4)
             AS aspect_deg
    FROM d
    """


def sql_tri():
    s = _dem_stencil_sql()
    acc = " + ".join(f"abs({s[i]} - {s[4]})" for i in range(9) if i != 4)
    return _dem_grid_sql(f"({acc}) / 8.0 AS tri")


def sql_tpi():
    s = _dem_stencil_sql()
    acc = " + ".join(s[i] for i in range(9) if i != 4)
    return _dem_grid_sql(f"{s[4]} - (({acc}) / 8.0) AS tpi")


def sql_roughness():
    s = _dem_stencil_sql()
    return _dem_grid_sql(
        f"GREATEST({', '.join(s)}) - LEAST({', '.join(s)}) AS roughness")


def sql_hillshade_combined():
    dzdx, dzdy = _dem_sql_gradients("horn")
    shade = ("cos(radians(45.0)) * cos(atan(sqrt(dzdx*dzdx + dzdy*dzdy)))"
             " + sin(radians(45.0)) * sin(atan(sqrt(dzdx*dzdx + dzdy*dzdy)))"
             " * cos(radians(315.0) - pi()/2.0 - atan2(-dzdy, -dzdx))")
    comp = ("1.0 - acos(GREATEST(LEAST(" + shade + ", 1.0), -1.0))"
            " * atan(sqrt(dzdx*dzdx + dzdy*dzdy)) * (4.0 / (pi()*pi()))")
    return f"""
    WITH g AS (
      SELECT a.gx, b.gy
      FROM (SELECT unnest(generate_series(1, 126)) AS gx) a,
           (SELECT unnest(generate_series(1, 126)) AS gy) b
    ), d AS (
      SELECT gx, gy, {dzdx} AS dzdx, {dzdy} AS dzdy FROM g
    ), e AS (
      SELECT gx, gy, {comp} AS comp FROM d
    )
    SELECT gx AS gpx, gy AS gpy,
           CASE WHEN comp <= 0.0 THEN 1.0
                ELSE LEAST(GREATEST(round(254.0 * comp) + 1.0, 1.0), 255.0)
           END AS shade
    FROM e
    """


def sql_hillshade_igor():
    """Igor-style shading mirror (az=315): array-space aspect, floored
    2pi normalization, rounded to 4 decimals both sides."""
    dzdx, dzdy = _dem_sql_gradients("horn")
    return f"""
    WITH g AS (
      SELECT a.gx, b.gy
      FROM (SELECT unnest(generate_series(1, 126)) AS gx) a,
           (SELECT unnest(generate_series(1, 126)) AS gy) b
    ), d AS (
      SELECT gx, gy, {dzdx} AS dzdx, {dzdy} AS dzdy FROM g
    ), e AS (
      SELECT gx, gy,
             degrees(atan(sqrt(dzdx*dzdx + dzdy*dzdy))) AS slope_deg,
             atan2(dzdy, -dzdx)
               - 2*pi()*floor(atan2(dzdy, -dzdx) / (2*pi())) AS na,
             (3.0*pi()/2.0 - radians(315.0))
               - 2*pi()*floor((3.0*pi()/2.0 - radians(315.0)) / (2*pi())) AS nb
      FROM d
    ), f AS (
      SELECT gx, gy, slope_deg,
             CASE WHEN abs(na - nb) > pi() THEN 2*pi() - abs(na - nb)
                  ELSE abs(na - nb) END AS diff
      FROM e
    )
    SELECT gx AS gpx, gy AS gpy,
           round(255.0 * (1.0 - (slope_deg / 90.0) * (1.0 - diff / pi())), 4)
             AS shade
    FROM f
    """


def q_slope_zt(sf_dir):
    """gdaldem slope -alg ZevenbergenThorne over the analytic DEM
    (apps/gdaldem_lib.cpp:793-801,1368-1383); degrees, rounded to 4
    decimals on both sides (ULP guard for the raw-float output)."""
    from . import raster_calc as rc

    out = rc.focal(_analytic_dem(), "slope", alg="zevenbergen")

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "slope_deg": pa.array(np.round(
                             batch["burn"].to_numpy(zero_copy_only=False), 4))})

    return out.map_batches(f, batch_format="pyarrow")


def sql_slope_zt():
    dzdx, dzdy = _dem_sql_gradients("zevenbergen")
    return f"""
    WITH g AS (
      SELECT a.gx, b.gy
      FROM (SELECT unnest(generate_series(1, 126)) AS gx) a,
           (SELECT unnest(generate_series(1, 126)) AS gy) b
    ), d AS (
      SELECT gx, gy, {dzdx} AS dzdx, {dzdy} AS dzdy FROM g
    )
    SELECT gx AS gpx, gy AS gpy,
           round(degrees(atan(sqrt(dzdx*dzdx + dzdy*dzdy))), 4) AS slope_deg
    FROM d
    """


# ---------------------------------------------------------------------------
# documents / embeddings queries
# ---------------------------------------------------------------------------


def q_dedup_documents(sf_dir):
    """Exact dedup keyed on md5(text) — the shuffle carries 32-byte
    digests, never document text, and the combine is the plain
    hash-partitioned groupby (100-TB path; no repartition(1))."""
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = dd.exact_dedup(docs, "text", "doc_id", hash_key=True)
    return out.drop_columns(["text_md5"])


SQL_DEDUP = """
SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY text
"""


def q_token_stats(sf_dir):
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = text_mod.token_stats(docs)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars_calc": pc.cast(batch["n_chars_calc"], pa.int64()),
            "n_tokens": batch["n_tokens"],
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_TOKEN = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def q_bpe_tokens(sf_dir):
    """BPE-ish sub-word token counting (RE2-safe pattern mirrored in
    the DuckDB oracle via regexp_extract_all)."""
    from .text import bpe_token_count

    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_token_count(docs).select_columns(["doc_id", "n_bpe_tokens"])


SQL_BPE = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
"""


def q_ann_topk(sf_dir):
    emb = tables.read_table_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    mask = pc.less(emb["vec_id"], 5)
    q = emb.filter(mask)
    qids = q["vec_id"].to_numpy()
    qmat = np.stack([np.asarray(e, dtype=np.float64) for e in q["embedding"].to_pylist()])
    ds = tables.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ann_mod.brute_topk(ds, qids, qmat, 10)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "query_id": batch["query_id"],
            "vec_id": batch["vec_id"],
            "rank": pc.cast(batch["rank"], pa.int64()),
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_ANN = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
s AS (SELECT q.qid AS query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.qe AS DOUBLE[])) AS sim
      FROM embeddings e, q),
r AS (SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
      FROM s)
SELECT query_id, vec_id, CAST(rn AS BIGINT) AS "rank" FROM r WHERE rn <= 10
"""


def q_minhash_near_dup(sf_dir):
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dd.minhash_lsh_pairs(docs, "text", "doc_id", num_perm=64, bands=16,
                                threshold=0.5)


def sql_minhash_near_dup():
    """Exact MinHash-LSH mirror: shingle hashes are the same base-257
    mod-2^31-1 polynomials (5-term direct form), the 64 permutations
    embed as literals, band membership is component equality (the
    engine's splitmix bucket key collides only on equal components;
    bucket truncation is inactive at oracle scale — max bucket 10 vs cap
    64), and est_jaccard = matching-components/64 exactly."""
    from .dedup import _minhash_matrix, _P31

    P = int(_P31)
    a, b = _minhash_matrix(64)
    perm_rows = ",\n      ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(64))
    pows = [pow(257, 4 - j, P) for j in range(5)]
    hterms = " + ".join(
        f"CAST(ord(substr(text, i+{j}, 1)) AS BIGINT) * {pows[j]}"
        for j in range(5))
    return f"""
    WITH pos AS (
      SELECT doc_id, text, unnest(generate_series(1, length(text) - 4)) AS i
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, ({hterms}) % {P} AS h FROM pos
    ), perm(pi, pa_, pb_) AS (VALUES
      {perm_rows}
    ), sig AS (
      SELECT doc_id, pi, min((pa_ * h + pb_) % {P}) AS v
      FROM sh CROSS JOIN perm GROUP BY 1, 2
    ), bandkey AS (
      SELECT doc_id, pi // 4 AS band,
        max(CASE WHEN pi % 4 = 0 THEN v END) AS c0,
        max(CASE WHEN pi % 4 = 1 THEN v END) AS c1,
        max(CASE WHEN pi % 4 = 2 THEN v END) AS c2,
        max(CASE WHEN pi % 4 = 3 THEN v END) AS c3
      FROM sig GROUP BY 1, 2
    ), cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bandkey x JOIN bandkey y
        ON x.band = y.band AND x.c0 = y.c0 AND x.c1 = y.c1
       AND x.c2 = y.c2 AND x.c3 = y.c3 AND x.doc_id < y.doc_id
    )
    SELECT c.id_a, c.id_b,
           sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / 64.0 AS est_jaccard
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.id_a
    JOIN sig sb ON sb.doc_id = c.id_b AND sb.pi = sa.pi
    GROUP BY 1, 2
    HAVING sum(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END) / 64.0 >= 0.5
    """


def sql_simhash():
    """Exact SimHash mirror: the token hash is a base-257 polynomial mod
    2^64 + splitmix64 (chosen in round 2 precisely so it mirrors:
    HUGEINT arithmetic, xor + floor-division shifts), hashed once per
    DISTINCT token and joined back to occurrences; 64 per-bit vote sums
    reproduce the fingerprint, reinterpreted into int64 like the Ray
    output."""
    M64 = 1 << 64
    C1, C2, C3 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    pow_rows = ",\n      ".join(
        f"({k}, CAST({pow(257, k, M64)} AS HUGEINT))" for k in range(32))
    bit_sums = ",\n      ".join(
        f"CASE WHEN sum(CASE WHEN (h // CAST({1 << b} AS HUGEINT)) % 2 = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN CAST({1 << b} AS HUGEINT) "
        f"ELSE CAST(0 AS HUGEINT) END AS bit_{b}"
        for b in range(64))
    total = " + ".join(f"bit_{b}" for b in range(64))

    def mulmod(a_expr: str, const: int) -> str:
        # a*b mod 2^64 without INT128 overflow: split b into 32-bit halves
        b_lo, b_hi = const & 0xFFFFFFFF, const >> 32
        return (f"((({a_expr}) * CAST({b_lo} AS HUGEINT)"
                f" + ((({a_expr}) * CAST({b_hi} AS HUGEINT))"
                f" % CAST(4294967296 AS HUGEINT)) * CAST(4294967296 AS HUGEINT))"
                f" % CAST({M64} AS HUGEINT))")

    mm2 = mulmod(f"xor(x1_, x1_ // CAST({1 << 30} AS HUGEINT))", C2)
    mm3 = mulmod(f"xor(x2_, x2_ // CAST({1 << 27} AS HUGEINT))", C3)
    return f"""
    WITH powt(k, p) AS (VALUES
      {pow_rows}
    ), occ AS (
      SELECT doc_id, substr(unnest(regexp_extract_all(lower(text), '\\w+')), 1, 32) AS t
      FROM documents
    ), vocab AS (
      SELECT DISTINCT t FROM occ
    ), chars AS (
      SELECT t, length(t) AS L, unnest(generate_series(1, length(t))) AS j
      FROM vocab
    ), rawh AS (
      SELECT c.t,
        sum(CAST(ord(substr(c.t, c.j, 1)) AS HUGEINT) * p.p)
          % CAST({M64} AS HUGEINT) AS h0
      FROM chars c JOIN powt p ON p.k = c.L - c.j
      GROUP BY 1
    ), mixed AS (
      SELECT t, {mm3} AS x3_
      FROM (
        SELECT t, {mm2} AS x2_
        FROM (
          SELECT t, (h0 + CAST({C1} AS HUGEINT)) % CAST({M64} AS HUGEINT) AS x1_
          FROM rawh
        )
      )
    ), hashed AS (
      SELECT t, xor(x3_, x3_ // CAST({1 << 31} AS HUGEINT)) AS h FROM mixed
    ), votes AS (
      SELECT o.doc_id,
      {bit_sums}
      FROM occ o JOIN hashed v ON v.t = o.t
      GROUP BY 1
    )
    SELECT d.doc_id,
      CAST(CASE WHEN COALESCE(hv, 0) >= CAST({1 << 63} AS HUGEINT)
                THEN COALESCE(hv, 0) - CAST({M64} AS HUGEINT)
                ELSE COALESCE(hv, 0) END AS BIGINT) AS simhash
    FROM documents d LEFT JOIN (
      SELECT doc_id, ({total}) AS hv FROM votes
    ) x ON x.doc_id = d.doc_id
    """


def q_simhash(sf_dir):
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = dd.simhash64(docs, "text")

    def f(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": pa.array(h.view(np.int64)),  # bit-reinterpret for int64 schema
        })

    return out.map_batches(f, batch_format="pyarrow")


def q_lang_quality(sf_dir):
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = text_mod.quality_score(docs)
    out = text_mod.lang_id(out)
    out = text_mod.lang_id_ngram(out)
    return out.select_columns(["doc_id", "lang", "lang_pred", "lang_ngram",
                               "quality_score"])


def q_minhash_clusters(sf_dir):
    """Near-dup clustering: MinHash-LSH pairs → distributed connected
    components (min-label propagation + pointer jumping) →
    (doc_id, cluster_id = min reachable doc id). Transitive chains
    (a~b, b~c) collapse into one cluster."""
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, "text", "doc_id", num_perm=64,
                                 bands=16, threshold=0.5)
    return dd.near_dup_clusters(pairs)


def sql_minhash_clusters():
    """Recursive-CTE min-reachability over the exact MinHash pair
    mirror: cluster_id = min doc id reachable in the pair graph."""
    return f"""
    WITH RECURSIVE pairs AS ({sql_minhash_near_dup()}),
    nodes AS (SELECT id_a AS x FROM pairs UNION SELECT id_b FROM pairs),
    edges AS (SELECT id_a AS x, id_b AS y FROM pairs
              UNION SELECT id_b AS x, id_a AS y FROM pairs),
    r(x, lab) AS (
      SELECT x, x FROM nodes
      UNION
      SELECT e.x, r.lab FROM edges e JOIN r ON r.x = e.y
    )
    SELECT x AS doc_id, min(lab) AS cluster_id FROM r GROUP BY x
    """


def q_minhash_dedup_keep(sf_dir):
    """Corpus filtered to near-dup canonicals: drop every doc whose
    MinHash cluster has a smaller member id (exact Bloom anti-join
    against the drop set); unpaired docs pass through."""
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = dd.minhash_lsh_pairs(docs, "text", "doc_id", num_perm=64,
                                 bands=16, threshold=0.5)
    kept = dd.near_dup_keep(docs, pairs, "doc_id")
    return kept.select_columns(["doc_id"])


def sql_minhash_dedup_keep():
    return f"""
    WITH RECURSIVE pairs AS ({sql_minhash_near_dup()}),
    nodes AS (SELECT id_a AS x FROM pairs UNION SELECT id_b FROM pairs),
    edges AS (SELECT id_a AS x, id_b AS y FROM pairs
              UNION SELECT id_b AS x, id_a AS y FROM pairs),
    r(x, lab) AS (
      SELECT x, x FROM nodes
      UNION
      SELECT e.x, r.lab FROM edges e JOIN r ON r.x = e.y
    ),
    root AS (SELECT x AS did, min(lab) AS cid FROM r GROUP BY x)
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM root
                      WHERE root.did = d.doc_id AND root.cid < root.did)
    """


def q_ngram_jaccard(sf_dir):
    """Exact n-gram Jaccard near-dup pairs (threshold 0.7): MinHash-LSH
    candidates + distributed hash-join back to texts + exact
    character-shingle verify. Oracle = the full exact pairwise Jaccard
    in SQL; safe to compare because LSH miss probability at the data's
    J>=0.9 near-dup band is < 1e-9 (see dedup.ngram_jaccard_pairs)."""
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = dd.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.7)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "jacc_c": pa.array(_cents(
                batch["jaccard"].to_numpy(zero_copy_only=False))),
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_NGRAM_JACCARD = """
WITH pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, GREATEST(length(text) - 4, 1))) AS i
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, substr(text, i, 5) AS g FROM pos
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  CAST(floor(CAST(ninter AS DOUBLE)
       / (sa.n + sb.n - ninter) * 100 + 0.5) AS BIGINT) AS jacc_c
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(ninter AS DOUBLE) / (sa.n + sb.n - ninter) >= 0.7
"""


def sql_fingerprint():
    """Winnowing fingerprint mirror: each 16-byte window hash expands to
    the direct 16-term polynomial sum with precomputed base powers mod
    2^31-1 (ASCII text: ord(char) == byte; BIGINT terms < 2^43)."""
    from .text import FP_BASE, FP_MOD

    w = 16
    pows = [pow(FP_BASE, w - 1 - j, FP_MOD) for j in range(w)]
    terms = " + ".join(
        f"CAST(ord(substr(text, i+{j}, 1)) AS BIGINT) * {pows[j]}"
        for j in range(w))
    return f"""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text) - {w - 1})) AS i
      FROM documents
    ), h AS (
      SELECT doc_id, ({terms}) % {FP_MOD} AS hv FROM pos
    )
    SELECT doc_id, min(hv) AS fingerprint FROM h GROUP BY doc_id
    """


def q_lang_stopword_quality(sf_dir):
    """SQL-checkable slice of the text-analysis stack: stopword-vote
    language ID + quality ratios (the trigram lang_ngram column stays in
    the rows-only `lang_quality` query — cosine profiles aren't SQL)."""
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = text_mod.quality_score(docs)
    out = text_mod.lang_id(out)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "lang_pred": batch["lang_pred"],
            "alpha_ratio": batch["alpha_ratio"],
            "digit_ratio": batch["digit_ratio"],
            "stopword_ratio": batch["stopword_ratio"],
            "quality_score": batch["quality_score"],
        })

    return out.map_batches(f, batch_format="pyarrow")


def sql_lang_stopword_quality():
    sw = {lang: sorted(text_mod._STOPWORDS[lang]) for lang in ("de", "en", "es", "fr")}

    def sw_list(lang):
        return "[" + ", ".join(f"'{w}'" for w in sw[lang]) + "]"

    hits = {lang: (f"len(list_filter(regexp_extract_all(lower(text), "
                   f"'[a-zà-ÿäöüß]+'), x -> list_contains({sw_list(lang)}, x)))")
            for lang in sw}
    return f"""
    WITH t AS (
      SELECT doc_id, lang, text,
        GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS n,
        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digit,
        regexp_extract_all(lower(text), '[a-z]+') AS toks,
        {hits['de']} AS h_de, {hits['en']} AS h_en,
        {hits['es']} AS h_es, {hits['fr']} AS h_fr
      FROM documents
    ), r AS (
      SELECT doc_id, lang, h_de, h_en, h_es, h_fr,
        n_alpha / n AS alpha_ratio,
        n_digit / n AS digit_ratio,
        CAST(len(list_filter(toks, x -> list_contains({sw_list('en')}, x)))
             AS DOUBLE) / GREATEST(len(toks), 1) AS stopword_ratio
      FROM t
    )
    SELECT doc_id, lang,
      CASE
        WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
        WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
        WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
        WHEN h_es >= h_fr THEN 'es'
        ELSE 'fr'
      END AS lang_pred,
      alpha_ratio, digit_ratio, stopword_ratio,
      0.4 * LEAST(GREATEST(alpha_ratio, 0), 1)
        + 0.3 * LEAST(GREATEST(stopword_ratio, 0), 0.5) * 2
        + 0.3 * (1.0 - LEAST(GREATEST(digit_ratio, 0), 1)) AS quality_score
    FROM r
    """


def sql_lang_quality():
    """Full lang_quality oracle: stopword vote + trigram-cosine language
    ID + quality score. Trigram profiles embed as literal (lang, gram,
    weight) rows computed by the same Python profile builder; doc
    trigrams explode in SQL; cosine = dot/doc_norm with ties resolved in
    the kernel's profile iteration order (en, de, fr, es)."""
    from .text import _SEED_TEXT, _trigram_profile

    rows = []
    langs = list(_SEED_TEXT)  # insertion order == kernel iteration order
    for lang in langs:
        for g, w in _trigram_profile(_SEED_TEXT[lang]).items():
            esc = g.replace("'", "''")
            rows.append(f"('{lang}', '{esc}', {w!r})")
    prof_values = ",\n      ".join(rows)
    sw = {lang: sorted(text_mod._STOPWORDS[lang]) for lang in ("de", "en", "es", "fr")}

    def sw_list(lang):
        return "[" + ", ".join(f"'{w}'" for w in sw[lang]) + "]"

    hits = {lang: (f"len(list_filter(regexp_extract_all(lower(text), "
                   f"'[a-zà-ÿäöüß]+'), x -> list_contains({sw_list(lang)}, x)))")
            for lang in sw}
    # cascade in kernel order en, de, fr, es with strict > over 0.05
    return f"""
    WITH prof(plang, g, w) AS (VALUES
      {prof_values}
    ), base AS (
      SELECT doc_id, lang, text,
        ' ' || regexp_replace(lower(text), '[^a-z ]', '', 'g') || ' ' AS t,
        {hits['de']} AS h_de, {hits['en']} AS h_en,
        {hits['es']} AS h_es, {hits['fr']} AS h_fr,
        GREATEST(CAST(length(text) AS DOUBLE), 1.0) AS n,
        CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS n_digit,
        regexp_extract_all(lower(text), '[a-z]+') AS toks
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(generate_series(1, length(t) - 2)) AS i FROM base
    ), cnt AS (
      SELECT doc_id, substr(t, i, 3) AS g, count(*) AS c
      FROM pos GROUP BY 1, 2
    ), nrm AS (
      SELECT doc_id, sqrt(sum(CAST(c*c AS DOUBLE))) AS nd FROM cnt GROUP BY 1
    ), dots AS (
      SELECT c.doc_id, p.plang, sum(CAST(c.c AS DOUBLE) * p.w) AS dot
      FROM cnt c JOIN prof p ON p.g = c.g GROUP BY 1, 2
    ), sims AS (
      SELECT n.doc_id,
        COALESCE(MAX(CASE WHEN plang = 'en' THEN dot END), 0.0)/n.nd AS s_en,
        COALESCE(MAX(CASE WHEN plang = 'de' THEN dot END), 0.0)/n.nd AS s_de,
        COALESCE(MAX(CASE WHEN plang = 'fr' THEN dot END), 0.0)/n.nd AS s_fr,
        COALESCE(MAX(CASE WHEN plang = 'es' THEN dot END), 0.0)/n.nd AS s_es
      FROM nrm n LEFT JOIN dots d ON d.doc_id = n.doc_id
      GROUP BY 1, n.nd
    )
    SELECT b.doc_id, b.lang,
      CASE
        WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
        WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
        WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
        WHEN h_es >= h_fr THEN 'es'
        ELSE 'fr'
      END AS lang_pred,
      CASE
        WHEN GREATEST(s_en, s_de, s_fr, s_es) <= 0.05 THEN 'und'
        WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        WHEN s_fr >= s_es THEN 'fr'
        ELSE 'es'
      END AS lang_ngram,
      0.4 * LEAST(GREATEST(n_alpha / n, 0), 1)
        + 0.3 * LEAST(GREATEST(
            CAST(len(list_filter(toks, x -> list_contains({sw_list('en')}, x)))
                 AS DOUBLE) / GREATEST(len(toks), 1), 0), 0.5) * 2
        + 0.3 * (1.0 - LEAST(GREATEST(n_digit / n, 0), 1)) AS quality_score
    FROM base b JOIN sims s ON s.doc_id = b.doc_id
    """


def q_fingerprint(sf_dir):
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = text_mod.fingerprint(docs, "text")

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "fingerprint": pc.cast(batch["fingerprint"], pa.int64()),
        })

    return out.map_batches(f, batch_format="pyarrow")


def q_contour(sf_dir):
    """Marching-squares contour segments over the analytic cone DEM.
    The oracle mirrors the full 16-case classification + linear edge
    interpolation in SQL (identical IEEE doubles: the DEM value is
    100 - sqrt(dx*dx+dy*dy) with the exact same op sequence on both
    sides, so every crossing fraction is bit-equal).
    Reference: `alg/contour.cpp:277-384` + `alg/marching_squares/`."""
    from .contour import contour_segments

    def dem_batch(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx, gy = idx % 96, idx // 96
        dx, dy = gx - 47.5, gy - 47.5
        val = 100.0 - np.sqrt(dx * dx + dy * dy)
        return pa.table({"pix_id": pa.array(rast.pack_pixel(6, gx, gy)),
                         "burn": pa.array(val)})

    dem = ray.data.range(96 * 96).map_batches(dem_batch, batch_format="pyarrow")
    return contour_segments(dem, [70.0, 80.0, 90.0])


def _sql_marching_squares(val_expr: str, n_cells: int, levels) -> str:
    """SQL mirror of contour._cell_segments: DEM value `val_expr` (in
    terms of `x`/`y`), full cells cx,cy in [0, n_cells-1], all 16 cases
    incl. the center-average saddle rule. Emits (level,x1,y1,x2,y2) in
    the same endpoint order as the engine's emit() calls."""
    lv = ", ".join(repr(float(l)) for l in levels)

    def v(dx, dy):
        return ("(" + val_expr.replace("{x}", f"(cx+{dx})")
                .replace("{y}", f"(cy+{dy})") + ")")

    frac = ("LEAST(GREATEST(COALESCE((L - {a}) / NULLIF({b} - {a}, 0), 0.5),"
            " 0.0), 1.0)")
    return f"""
    WITH lv AS (SELECT unnest([{lv}]) AS L),
    g AS (
      SELECT a.cx, b.cy
      FROM (SELECT unnest(generate_series(0, {n_cells - 1})) AS cx) a,
           (SELECT unnest(generate_series(0, {n_cells - 1})) AS cy) b
    ), c AS (
      SELECT cx, cy, {v(0, 0)} AS c0, {v(1, 0)} AS c1,
             {v(0, 1)} AS c2, {v(1, 1)} AS c3
      FROM g
    ), x AS (
      SELECT l.L, c.cx, c.cy, c.c0, c.c1, c.c2, c.c3,
        (CASE WHEN c0 >= L THEN 1 ELSE 0 END
         + CASE WHEN c1 >= L THEN 2 ELSE 0 END
         + CASE WHEN c2 >= L THEN 4 ELSE 0 END
         + CASE WHEN c3 >= L THEN 8 ELSE 0 END) AS cs,
        CAST(cx AS DOUBLE) + {frac.format(a='c0', b='c1')} AS top_x,
        CAST(cx AS DOUBLE) + {frac.format(a='c2', b='c3')} AS bot_x,
        CAST(cy AS DOUBLE) + {frac.format(a='c0', b='c2')} AS left_y,
        CAST(cy AS DOUBLE) + {frac.format(a='c1', b='c3')} AS right_y,
        (c0 + c1 + c2 + c3) / 4.0 AS ctr,
        CAST(cx AS DOUBLE) AS fx, CAST(cy AS DOUBLE) AS fy,
        CAST(cx + 1 AS DOUBLE) AS fx1, CAST(cy + 1 AS DOUBLE) AS fy1
      FROM c, lv l
    ), seg AS (
      SELECT L AS level, top_x AS x1, fy AS y1, fx AS x2, left_y AS y2
        FROM x WHERE cs IN (1, 14)
      UNION ALL SELECT L, top_x, fy, fx1, right_y FROM x WHERE cs IN (2, 13)
      UNION ALL SELECT L, fx, left_y, bot_x, fy1 FROM x WHERE cs IN (4, 11)
      UNION ALL SELECT L, fx1, right_y, bot_x, fy1 FROM x WHERE cs IN (8, 7)
      UNION ALL SELECT L, fx, left_y, fx1, right_y FROM x WHERE cs IN (3, 12)
      UNION ALL SELECT L, top_x, fy, bot_x, fy1 FROM x WHERE cs IN (5, 10)
      UNION ALL SELECT L, top_x, fy, fx1, right_y FROM x WHERE cs = 6 AND ctr >= L
      UNION ALL SELECT L, fx, left_y, bot_x, fy1 FROM x WHERE cs = 6 AND ctr >= L
      UNION ALL SELECT L, top_x, fy, fx, left_y FROM x WHERE cs = 6 AND ctr < L
      UNION ALL SELECT L, fx1, right_y, bot_x, fy1 FROM x WHERE cs = 6 AND ctr < L
      UNION ALL SELECT L, top_x, fy, fx, left_y FROM x WHERE cs = 9 AND ctr >= L
      UNION ALL SELECT L, fx1, right_y, bot_x, fy1 FROM x WHERE cs = 9 AND ctr >= L
      UNION ALL SELECT L, top_x, fy, fx1, right_y FROM x WHERE cs = 9 AND ctr < L
      UNION ALL SELECT L, fx, left_y, bot_x, fy1 FROM x WHERE cs = 9 AND ctr < L
    )"""


def sql_contour():
    cone = "100.0 - sqrt(({x} - 47.5) * ({x} - 47.5) + ({y} - 47.5) * ({y} - 47.5))"
    return (_sql_marching_squares(cone, 95, [70.0, 80.0, 90.0])
            + "\n    SELECT level, x1, y1, x2, y2 FROM seg")


def q_contour_lines_ring(sf_dir):
    """Contour POLYLINES (stitched) over a 64x64 pyramid DEM. Crossing
    fractions are exact binary (.25/.5/.75) so endpoint quantization is
    lossless; the oracle stitches the same segments with a recursive
    min-label CTE over shared quantized endpoints and compares the
    per-line aggregates (no internal line ids cross the boundary).
    Reference: `alg/marching_squares/segment_merger.h`."""
    from .contour import contour_lines

    def dem_batch(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx, gy = idx % 64, idx // 64
        val = np.minimum(np.minimum(gx, gy),
                         np.minimum(63 - gx, 63 - gy)).astype(np.float64)
        return pa.table({"pix_id": pa.array(rast.pack_pixel(6, gx, gy)),
                         "burn": pa.array(val)})

    dem = ray.data.range(64 * 64).map_batches(dem_batch, batch_format="pyarrow")
    out = contour_lines(dem, [5.5, 13.25, 21.75])

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "level": batch["level"],
            "n_segments": pc.cast(batch["n_segments"], pa.int64()),
            "x_min": batch["x_min"], "y_min": batch["y_min"],
            "x_max": batch["x_max"], "y_max": batch["y_max"],
        })

    return out.map_batches(f, batch_format="pyarrow")


def sql_contour_lines_ring():
    pyr = "CAST(LEAST({x}, {y}, 63 - {x}, 63 - {y}) AS DOUBLE)"
    ms = _sql_marching_squares(pyr, 63, [5.5, 13.25, 21.75])
    # quantized endpoint key (Q = 1<<20, exact for binary fractions)
    ek = "CAST(round({x} * 1048576) AS BIGINT) * 134217728 + CAST(round({y} * 1048576) AS BIGINT)"
    return f"""
    WITH RECURSIVE {ms.split("WITH", 1)[1]}
    , s AS (
      SELECT row_number() OVER (ORDER BY level, x1, y1, x2, y2) AS sid, *
      FROM seg
    ), eps AS (
      SELECT level, sid, {ek.format(x='x1', y='y1')} AS ep FROM s
      UNION ALL
      SELECT level, sid, {ek.format(x='x2', y='y2')} AS ep FROM s
    ), sedges AS (
      SELECT a.sid AS sa, b.sid AS sb
      FROM eps a JOIN eps b ON a.level = b.level AND a.ep = b.ep
      WHERE a.sid <> b.sid
    ), reach(sid, lbl) AS (
      SELECT sid, sid FROM s
      UNION
      SELECT e.sa, r.lbl FROM reach r JOIN sedges e ON e.sb = r.sid
      WHERE r.lbl < e.sa
    ), lab AS (
      SELECT sid, min(lbl) AS line FROM reach GROUP BY 1
    )
    SELECT min(s.level) AS level, count(*) AS n_segments,
           min(LEAST(x1, x2)) AS x_min, min(LEAST(y1, y2)) AS y_min,
           max(GREATEST(x1, x2)) AS x_max, max(GREATEST(y1, y2)) AS y_max
    FROM lab JOIN s USING (sid)
    GROUP BY lab.line
    """


def q_sieve(sf_dir):
    """Sieve filter over a structured 64x64 raster (threshold 4):
    single-pixel specks, a 2-px bar, a speck-in-a-hole (sole neighbor =
    the 23-px bar) and a speck with two candidate absorbers. The layout
    guarantees single-pass largest-neighbor semantics (no small region
    neighbors another small region whose merge could change a target),
    so GDAL's iterative merge loop (`alg/gdalsievefilter.cpp:129-187`)
    is exactly expressible as one argmax in SQL."""
    from .sieve import sieve

    def dem_batch(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx, gy = idx % 64, idx // 64
        val = np.zeros(len(gx), dtype=np.float64)
        val[(gx % 8 == 3) & (gy % 8 == 5)] = 1.0
        val[(gy >= 1) & (gy <= 3) & (gx >= 8) & (gx <= 15)] = 2.0
        val[(gx == 12) & (gy == 2)] = 5.0
        val[(gx == 16) & (gy == 1)] = 4.0
        val[(gy == 24) & ((gx == 10) | (gx == 11))] = 3.0
        return pa.table({"pix_id": pa.array(rast.pack_pixel(6, gx, gy)),
                         "burn": pa.array(val)})

    raster = ray.data.range(64 * 64).map_batches(dem_batch, batch_format="pyarrow")
    out = sieve(raster, threshold=4)

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "burn": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


SQL_SIEVE_VAL = """CAST(CASE
      WHEN gx = 12 AND gy = 2 THEN 5
      WHEN gy BETWEEN 1 AND 3 AND gx BETWEEN 8 AND 15 THEN 2
      WHEN gx = 16 AND gy = 1 THEN 4
      WHEN gy = 24 AND gx IN (10, 11) THEN 3
      WHEN gx % 8 = 3 AND gy % 8 = 5 THEN 1
      ELSE 0 END AS DOUBLE)"""


def sql_sieve():
    # The recursive min-label CC runs over NONZERO pixels only (~91):
    # the val=0 background is a single connected component by
    # construction (no feature spans a full row/column), so it gets
    # region id 0 directly — a dense-background CTE would accumulate
    # O(|region|^2) reach pairs.
    return f"""
    WITH RECURSIVE g AS (
      SELECT a.gx, b.gy
      FROM (SELECT unnest(generate_series(0, 63)) AS gx) a,
           (SELECT unnest(generate_series(0, 63)) AS gy) b
    ), px AS (
      SELECT gx, gy, {SQL_SIEVE_VAL} AS val,
             gx * 4294967296 + gy AS pid
      FROM g
    ), nz AS (
      SELECT * FROM px WHERE val <> 0
    ), e AS (
      SELECT a.pid AS pa, b.pid AS pb
      FROM nz a JOIN nz b ON a.val = b.val
        AND ((abs(a.gx - b.gx) = 1 AND a.gy = b.gy)
             OR (a.gx = b.gx AND abs(a.gy - b.gy) = 1))
    ), reach(pid, lbl) AS (
      SELECT pid, pid FROM nz
      UNION
      SELECT e.pa, r.lbl FROM reach r JOIN e ON e.pb = r.pid
      WHERE r.lbl < e.pa
    ), lab AS (
      SELECT pid, min(lbl) AS rid FROM reach GROUP BY 1
    ), pxr AS (
      SELECT px.gx, px.gy, px.val,
             CASE WHEN px.val = 0 THEN 0 ELSE lab.rid END AS rid
      FROM px LEFT JOIN lab USING (pid)
    ), reg AS (
      SELECT rid, count(*) AS n, min(val) AS val FROM pxr GROUP BY 1
    ), radj AS (
      SELECT DISTINCT a.rid AS ra, b.rid AS rb
      FROM (SELECT pxr.* FROM pxr WHERE pxr.val <> 0) a
      JOIN pxr b ON a.val <> b.val
        AND ((abs(a.gx - b.gx) = 1 AND a.gy = b.gy)
             OR (a.gx = b.gx AND abs(a.gy - b.gy) = 1))
    ), tgt AS (
      SELECT ra, rb FROM (
        SELECT r.ra, r.rb,
               row_number() OVER (PARTITION BY r.ra
                                  ORDER BY nb.n DESC, r.rb ASC) AS rk
        FROM radj r JOIN reg nb ON nb.rid = r.rb) WHERE rk = 1
    )
    SELECT p.gx AS gpx, p.gy AS gpy,
           CASE WHEN rg.n < 4 AND tv.val IS NOT NULL THEN tv.val
                ELSE p.val END AS burn
    FROM pxr p
    JOIN reg rg ON rg.rid = p.rid
    LEFT JOIN tgt t ON t.ra = p.rid
    LEFT JOIN reg tv ON tv.rid = t.rb
    """


def q_mosaic_warp(sf_dir):
    """Mosaic two event-type rasters (last wins) then warp-resample to
    z5 (mean over present children). Values go through integer cents so
    every float sum is exact (integer-valued doubles < 2^53) and the
    mean is one identical division on both sides — full SQL oracle."""
    from ..functions.swq import attribute_filter
    from .mosaic import mosaic, warp_nearest

    pts = events_points(sf_dir, cols=("event_id", "event_type", "value"))
    pts = add_cents(pts, "value", "value_c")
    clicks = rast.rasterize_pixels(
        attribute_filter(pts, "event_type = 'click'"), 7, value_col="value_c")
    views = rast.rasterize_pixels(
        attribute_filter(pts, "event_type = 'view'"), 7, value_col="value_c")
    over = mosaic([clicks, views])
    out = warp_nearest(over, 5, merge="mean")

    def f(batch: pa.Table) -> pa.Table:
        _z, gpx, gpy = rast.unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx5": pa.array(gpx), "gpy5": pa.array(gpy),
                         "mean_c": batch["burn"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_mosaic_warp():
    gx, gy = _tile_sql(15)  # z7 global pixels at 256px tiles
    return f"""
    WITH c AS (
      SELECT {gx} AS gx7, {gy} AS gy7, sum({CENTS.format(x='value')}) AS v
      FROM {_POINTS_SQL} p WHERE event_type = 'click' GROUP BY 1, 2
    ), vw AS (
      SELECT {gx} AS gx7, {gy} AS gy7, sum({CENTS.format(x='value')}) AS v
      FROM {_POINTS_SQL} p WHERE event_type = 'view' GROUP BY 1, 2
    ), over_ AS (
      SELECT COALESCE(vw.gx7, c.gx7) AS gx7, COALESCE(vw.gy7, c.gy7) AS gy7,
             CAST(COALESCE(vw.v, c.v) AS DOUBLE) AS v
      FROM c FULL OUTER JOIN vw ON c.gx7 = vw.gx7 AND c.gy7 = vw.gy7
    )
    SELECT gx7 // 4 AS gpx5, gy7 // 4 AS gpy5, avg(v) AS mean_c
    FROM over_ GROUP BY 1, 2
    """


def q_proximity(sf_dir):
    """Distance from each click pixel to the nearest error pixel at z6
    (rows-only; brute oracle in tests/test_proximity.py)."""
    from ..functions.swq import attribute_filter
    from .proximity import proximity

    pts = events_points(sf_dir, cols=("event_id", "event_type"))
    # z6 pixel keyspace is bounded (<= touched pixels), so the
    # post-combiner shuffle runs with few partitions (documented
    # bounded-keyspace opt-in, see rasterize_pixels docstring)
    clicks = rast.rasterize_pixels(
        attribute_filter(pts, "event_type = 'click'"), 6, merge_alg="count",
        shuffle_partitions=8)
    # target side: only the pixel point SET matters for distances, so
    # skip the cross-block combine entirely (duplicate target pixels
    # across blocks leave every min-distance unchanged)
    errors = rast.rasterize_pixels(
        attribute_filter(pts, "event_type = 'error'"), 6, merge_alg="count",
        combine=False)
    out = proximity(clicks, errors, maxdist=128.0)

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "dist": pc.round(batch["dist"], ndigits=6)})

    return out.map_batches(f, batch_format="pyarrow")


def sql_proximity():
    gx, gy = _tile_sql(14)  # z6 global pixels at 256px tiles
    return f"""
    WITH clicks AS (
      SELECT DISTINCT {gx} AS gpx, {gy} AS gpy FROM {_POINTS_SQL} p
      WHERE event_type = 'click'
    ), errors AS (
      SELECT DISTINCT {gx} AS gpx, {gy} AS gpy FROM {_POINTS_SQL} p
      WHERE event_type = 'error'
    )
    SELECT c.gpx, c.gpy,
      round(LEAST(min(sqrt(CAST((c.gpx - e.gpx)*(c.gpx - e.gpx)
            + (c.gpy - e.gpy)*(c.gpy - e.gpy) AS DOUBLE))), 128.0), 6) AS dist
    FROM clicks c CROSS JOIN errors e
    GROUP BY c.gpx, c.gpy
    """


def q_proximity_shuffle(sf_dir):
    """Same distances via the cell-partitioned (no-broadcast) path:
    queries keyed to 128px tiles, targets replicated to halo-reachable
    tiles, one groupby(tile). Shares sql_proximity (bit-identical by
    construction)."""
    from ..functions.swq import attribute_filter
    from .proximity import proximity_shuffle

    pts = events_points(sf_dir, cols=("event_id", "event_type"))
    # z6 pixel keyspace is bounded (<= touched pixels), so the
    # post-combiner shuffle runs with few partitions (documented
    # bounded-keyspace opt-in, see rasterize_pixels docstring)
    clicks = rast.rasterize_pixels(
        attribute_filter(pts, "event_type = 'click'"), 6, merge_alg="count",
        shuffle_partitions=8)
    # target side: only the pixel point SET matters for distances, so
    # skip the cross-block combine entirely (duplicate target pixels
    # across blocks leave every min-distance unchanged)
    errors = rast.rasterize_pixels(
        attribute_filter(pts, "event_type = 'error'"), 6, merge_alg="count",
        combine=False)
    out = proximity_shuffle(clicks, errors, maxdist=128.0, tile=128)

    def f(batch: pa.Table) -> pa.Table:
        z, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gpx": pa.array(gpx), "gpy": pa.array(gpy),
                         "dist": pc.round(batch["dist"], ndigits=6)})

    return out.map_batches(f, batch_format="pyarrow")


def q_intersection_overlay(sf_dir):
    """Layer-algebra Intersection with geometry output: part-derived
    boxes × zone boxes, clipped geometry + exact intersection areas."""
    from .spatial_join import broadcast_box_intersection

    parts = tables.read_table(sf_dir, "part", columns=["p_partkey"])

    def geo(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False)
        xmin, ymin, xmax, ymax = derive.part_boxes(k)
        geoms = [wkb_mod.box_to_wkb(float(a), float(b), float(c), float(d))
                 for a, b, c, d in zip(xmin, ymin, xmax, ymax)]
        return batch.append_column("geometry", pa.array(geoms, type=pa.binary()))

    # Ray splits even a single-file read into ~2×CPU blocks (NOTES
    # lesson 11), so the clip kernels parallelize without a repartition
    polys = parts.map_batches(geo, batch_format="pyarrow")
    out = broadcast_box_intersection(polys, zone_table(sf_dir), ["zone_id"], res=10.0)
    return out.select_columns(["p_partkey", "zone_id", "intersection_area"])


SQL_INTERSECTION = f"""
WITH pb AS (SELECT p_partkey,
    CAST({derive.SQL_PART_XMIN} AS DOUBLE) AS xmin,
    CAST({derive.SQL_PART_XMAX} AS DOUBLE) AS xmax,
    CAST({derive.SQL_PART_YMIN} AS DOUBLE) AS ymin,
    CAST({derive.SQL_PART_YMAX} AS DOUBLE) AS ymax FROM part)
SELECT p_partkey, CAST(zone_id AS BIGINT) AS zone_id,
       (least(pb.xmax, z.xmax) - greatest(pb.xmin, z.xmin))
       * (least(pb.ymax, z.ymax) - greatest(pb.ymin, z.ymin)) AS intersection_area
FROM pb, {_ZONES_SQL} z
WHERE least(pb.xmax, z.xmax) > greatest(pb.xmin, z.xmin)
  AND least(pb.ymax, z.ymax) > greatest(pb.ymin, z.ymin)
"""


def q_erase_overlay(sf_dir):
    """Layer-algebra Erase with geometry output: part boxes minus all
    overlapping zone boxes. Oracle: all box edges are integers, so the
    remaining area equals the count of 1x1 integer cells in the part box
    not covered by any zone box (a unit cell is entirely inside or
    outside every integer-aligned zone — no partial coverage)."""
    from .spatial_join import broadcast_polygon_erase

    parts = tables.read_table(sf_dir, "part", columns=["p_partkey"])

    def geo(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False)
        xmin, ymin, xmax, ymax = derive.part_boxes(k)
        geoms = [wkb_mod.box_to_wkb(float(a), float(b), float(c), float(d))
                 for a, b, c, d in zip(xmin, ymin, xmax, ymax)]
        return batch.append_column("geometry", pa.array(geoms, type=pa.binary()))

    polys = parts.map_batches(geo, batch_format="pyarrow")
    out = broadcast_polygon_erase(polys, zone_table(sf_dir), res=10.0)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": batch["p_partkey"],
            "remaining_area": pc.round(batch["remaining_area"], ndigits=6),
        })

    return out.map_batches(f, batch_format="pyarrow")


def sql_erase_overlay():
    return f"""
    WITH pb AS (
      SELECT p_partkey,
        CAST({derive.SQL_PART_XMIN} AS BIGINT) AS x0,
        CAST({derive.SQL_PART_YMIN} AS BIGINT) AS y0,
        CAST({derive.SQL_PART_XMAX} AS BIGINT) AS x1,
        CAST({derive.SQL_PART_YMAX} AS BIGINT) AS y1
      FROM part
    ), cx AS (
      SELECT p_partkey, x0 + unnest(generate_series(0, x1 - x0 - 1)) AS cxv,
             y0, y1
      FROM pb
    ), cell AS (
      SELECT p_partkey, cxv, y0 + unnest(generate_series(0, y1 - y0 - 1)) AS cyv
      FROM cx
    )
    SELECT c.p_partkey, round(CAST(count(*) AS DOUBLE), 6) AS remaining_area
    FROM cell c
    WHERE NOT EXISTS (
      SELECT 1 FROM {_ZONES_SQL} z
      WHERE c.cxv >= z.xmin AND c.cxv + 1 <= z.xmax
        AND c.cyv >= z.ymin AND c.cyv + 1 <= z.ymax)
    GROUP BY 1
    """


def q_union_overlay(sf_dir):
    """Layer-algebra Union (big-both-sides method residual): part boxes
    x zone boxes, all three parts (input_only / intersection /
    method_only). The method-only residual runs cell-partitioned
    (shuffle_polygon_erase — no whole-input broadcast). Oracle: all box
    edges are integers, so every part area is an exact unit-cell count
    (intersections in closed form). Reference: `ogrlayer.cpp:5622`."""
    from ..stages.geom_ops import wkb_centroid_area
    from .spatial_join import layer_union

    parts = tables.read_table(sf_dir, "part", columns=["p_partkey"])

    def geo(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False)
        xmin, ymin, xmax, ymax = derive.part_boxes(k)
        geoms = [wkb_mod.box_to_wkb(float(a), float(b), float(c), float(d))
                 for a, b, c, d in zip(xmin, ymin, xmax, ymax)]
        return batch.append_column("geometry", pa.array(geoms, type=pa.binary()))

    polys = parts.map_batches(geo, batch_format="pyarrow")
    out = layer_union(polys, zone_table(sf_dir), res=10.0)

    def areas(batch: pa.Table) -> pa.Table:
        bufs = batch["geometry"].to_numpy(zero_copy_only=False)
        a = np.asarray([wkb_centroid_area(b)[2] for b in bufs])
        return pa.table({
            "src": batch["src"],
            "p_partkey": pc.cast(batch["p_partkey"], pa.int64())
            if "p_partkey" in batch.column_names
            else pa.nulls(len(batch), pa.int64()),
            "zone_id": pc.cast(batch["zone_id"], pa.int64())
            if "zone_id" in batch.column_names
            else pa.nulls(len(batch), pa.int64()),
            "frag_area": pa.array(a),
        })

    from ray.data.aggregate import Sum

    agg = (out.map_batches(areas, batch_format="pyarrow")
           .groupby(["src", "p_partkey", "zone_id"])
           .aggregate(Sum("frag_area", alias_name="area")))

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": batch["src"],
            "p_partkey": batch["p_partkey"],
            "zone_id": batch["zone_id"],
            "area": pc.round(batch["area"], ndigits=4),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def sql_union_overlay():
    # part boxes and zone boxes are integer-aligned: unit-cell counting
    # for both residuals; closed-form rectangle overlap for intersections
    return f"""
    WITH pb AS (
      SELECT p_partkey,
        CAST({derive.SQL_PART_XMIN} AS BIGINT) AS x0,
        CAST({derive.SQL_PART_YMIN} AS BIGINT) AS y0,
        CAST({derive.SQL_PART_XMAX} AS BIGINT) AS x1,
        CAST({derive.SQL_PART_YMAX} AS BIGINT) AS y1
      FROM part
    ), zb AS (
      SELECT zone_id, CAST(xmin AS BIGINT) AS x0, CAST(ymin AS BIGINT) AS y0,
             CAST(xmax AS BIGINT) AS x1, CAST(ymax AS BIGINT) AS y1
      FROM {_ZONES_SQL}
    ), pcell AS (
      SELECT p_partkey, cxv, y0 + unnest(generate_series(0, y1 - y0 - 1)) AS cyv
      FROM (SELECT p_partkey, x0 + unnest(generate_series(0, x1 - x0 - 1)) AS cxv,
                   y0, y1 FROM pb)
    ), zcell AS (
      SELECT zone_id, cxv, y0 + unnest(generate_series(0, y1 - y0 - 1)) AS cyv
      FROM (SELECT zone_id, x0 + unnest(generate_series(0, x1 - x0 - 1)) AS cxv,
                   y0, y1 FROM zb)
    ), input_only AS (
      SELECT 'input_only' AS src, c.p_partkey,
             CAST(NULL AS BIGINT) AS zone_id,
             round(CAST(count(*) AS DOUBLE), 4) AS area
      FROM pcell c
      WHERE NOT EXISTS (
        SELECT 1 FROM zb z
        WHERE c.cxv >= z.x0 AND c.cxv + 1 <= z.x1
          AND c.cyv >= z.y0 AND c.cyv + 1 <= z.y1)
      GROUP BY 2
    ), inter AS (
      SELECT 'intersection' AS src, p.p_partkey, z.zone_id,
             round(CAST((LEAST(p.x1, z.x1) - GREATEST(p.x0, z.x0))
                   * (LEAST(p.y1, z.y1) - GREATEST(p.y0, z.y0)) AS DOUBLE),
                   4) AS area
      FROM pb p JOIN zb z
        ON LEAST(p.x1, z.x1) > GREATEST(p.x0, z.x0)
       AND LEAST(p.y1, z.y1) > GREATEST(p.y0, z.y0)
    ), method_only AS (
      SELECT 'method_only' AS src, CAST(NULL AS BIGINT) AS p_partkey,
             c.zone_id, round(CAST(count(*) AS DOUBLE), 4) AS area
      FROM zcell c
      WHERE NOT EXISTS (
        SELECT 1 FROM pb p
        WHERE c.cxv >= p.x0 AND c.cxv + 1 <= p.x1
          AND c.cyv >= p.y0 AND c.cyv + 1 <= p.y1)
      GROUP BY 3
    )
    SELECT * FROM input_only
    UNION ALL SELECT * FROM inter
    UNION ALL SELECT * FROM method_only
    """


def q_clip_geometry(sf_dir):
    """ogr2ogr -clipsrc: zone boxes clipped to a fixed window; exact
    clipped areas (rows with empty clip drop)."""
    from ..geom.clip import clip_to_box
    from ..stages.geom_ops import centroid_area

    zones = ray.data.from_arrow(zone_table(sf_dir))
    clipped = clip_to_box(zones, -60.0, -40.0, 80.0, 60.0)
    out = centroid_area(clipped, "geometry")
    return out.select_columns(["zone_id", "area"])


SQL_CLIP_GEOM = f"""
SELECT CAST(zone_id AS BIGINT) AS zone_id,
       (least(z.xmax, 80.0) - greatest(z.xmin, -60.0))
       * (least(z.ymax, 60.0) - greatest(z.ymin, -40.0)) AS area
FROM {_ZONES_SQL} z
WHERE least(z.xmax, 80.0) > greatest(z.xmin, -60.0)
  AND least(z.ymax, 60.0) > greatest(z.ymin, -40.0)
"""


def q_viewshed(sf_dir):
    """Viewshed counts for supplier-derived observers over the analytic
    DEM window (rows-only; LoS oracles in tests/test_viewshed.py)."""
    from .viewshed import viewshed_counts

    y, x = np.mgrid[0:48, 0:48]
    dem = 10.0 * np.sin(x / 6.0) + 8.0 * np.cos(y / 5.0)
    sup = tables.read_table(sf_dir, "supplier", columns=["s_suppkey"])

    def to_obs(batch: pa.Table) -> pa.Table:
        k = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "obs_id": pa.array(k),
            "ox": pa.array((k * 7) % 48),
            "oy": pa.array((k * 11) % 48),
        })

    obs = sup.map_batches(to_obs, batch_format="pyarrow")
    return viewshed_counts(obs, dem).select_columns(
        ["obs_id", "n_visible", "n_total"])


def sql_viewshed():
    """LoS ray-march mirror: DEM regenerates from the closed form, the
    DDA samples round half-to-even (numpy semantics, emulated in SQL),
    and the per-ray max elevation angle uses identical float
    expressions. n_visible = count of targets whose angle clears every
    intermediate sample."""
    dem = "(10.0*sin(({x})/6.0) + 8.0*cos(({y})/5.0))"

    def rhe(x):  # round-half-to-even on a non-negative expression
        return (f"CAST(floor({x}) + (CASE WHEN ({x}) - floor({x}) > 0.5 THEN 1 "
                f"WHEN ({x}) - floor({x}) = 0.5 THEN "
                f"(CASE WHEN CAST(floor({x}) AS BIGINT) % 2 = 1 THEN 1 ELSE 0 END) "
                f"ELSE 0 END) AS BIGINT)")

    sx = rhe("ox + (tx - ox) * frac")
    sy = rhe("oy + (ty - oy) * frac")
    return f"""
    WITH obs AS (
      SELECT s_suppkey AS obs_id,
             (s_suppkey * 7) % 48 AS ox, (s_suppkey * 11) % 48 AS oy
      FROM supplier
    ), tgt AS (
      SELECT a.tx, b.ty
      FROM (SELECT unnest(generate_series(0, 47)) AS tx) a,
           (SELECT unnest(generate_series(0, 47)) AS ty) b
    ), pair AS (
      SELECT obs_id, ox, oy, tx, ty,
        sqrt(CAST((tx-ox)*(tx-ox) + (ty-oy)*(ty-oy) AS DOUBLE)) AS dist,
        GREATEST(1, CAST(ceil(sqrt(CAST((tx-ox)*(tx-ox) + (ty-oy)*(ty-oy)
                                        AS DOUBLE))) AS BIGINT)) AS nsteps,
        ({dem.format(x='ox', y='oy')} + 2.0) AS h0,
        {dem.format(x='tx', y='ty')} AS tdem
      FROM obs, tgt
    ), steps AS (
      SELECT obs_id, ox, oy, tx, ty, dist, nsteps, h0,
             unnest(generate_series(1, nsteps - 1)) AS k
      FROM pair
    ), samp AS (
      SELECT obs_id, tx, ty, h0, dist,
             CAST(k AS DOUBLE) / CAST(nsteps AS DOUBLE) AS frac, ox, oy
      FROM steps
    ), ang AS (
      SELECT obs_id, tx, ty,
        ({dem.format(x=f"LEAST(GREATEST({sx}, 0), 47)",
                     y=f"LEAST(GREATEST({sy}, 0), 47)")} - h0)
          / GREATEST(dist * frac, 1e-12) AS a
      FROM samp
      WHERE NOT (LEAST(GREATEST({sx}, 0), 47) = tx
                 AND LEAST(GREATEST({sy}, 0), 47) = ty)
    ), best AS (
      SELECT obs_id, tx, ty, max(a) AS best FROM ang GROUP BY 1, 2, 3
    ), vis AS (
      SELECT p.obs_id,
        CASE WHEN p.tx = p.ox AND p.ty = p.oy THEN 1
             WHEN (p.tdem - p.h0) / GREATEST(p.dist, 1e-12)
                  >= COALESCE(b.best, -1e308) - 1e-12 THEN 1
             ELSE 0 END AS v
      FROM pair p LEFT JOIN best b
        ON b.obs_id = p.obs_id AND b.tx = p.tx AND b.ty = p.ty
    )
    SELECT obs_id, CAST(sum(v) AS BIGINT) AS n_visible,
           CAST(2304 AS BIGINT) AS n_total
    FROM vis GROUP BY 1
    """


def q_grid_idw(sf_dir):
    """gdal_grid invdist: IDW-interpolate supplier acctbal onto a 64×64
    z3 pixel window (mode='all' — every site, exact; rounded to 3 dp on
    both sides, see BASELINE.md parity notes)."""
    from .gridding import grid_idw, pixel_window

    sup = tables.read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    slon, slat = derive.site_lonlat(sk)
    sv = sup["s_acctbal"].to_numpy().astype(np.float64)
    px = pixel_window(3, 300, 1300, 64, 64)
    out = grid_idw(px, slon, slat, sv, 3, mode="all")

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "gpx": batch["gpx"], "gpy": batch["gpy"],
            "idw": pc.round(batch["burn"], ndigits=3),
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_GRID_IDW = f"""
WITH px AS (SELECT (300 + (i % 64)) AS gpx, (1300 + i // 64) AS gpy
            FROM range(0, 4096) t(i)),
pc2 AS (SELECT gpx, gpy,
        (gpx + 0.5) / 2048 * 360.0 - 180.0 AS lon,
        degrees(2*atan(exp(pi()*(1.0 - 2.0*(gpy + 0.5)/2048))) - pi()/2) AS lat
        FROM px),
s AS (SELECT {derive.SQL_SITE_LON} AS slon, {derive.SQL_SITE_LAT} AS slat,
             s_acctbal AS v FROM supplier)
SELECT gpx, gpy,
       round(sum(v / ((lon-slon)*(lon-slon) + (lat-slat)*(lat-slat) + 1e-12))
             / sum(1.0 / ((lon-slon)*(lon-slon) + (lat-slat)*(lat-slat) + 1e-12)), 3)
         AS idw
FROM pc2, s GROUP BY gpx, gpy
"""


def sql_media_features():
    """The interleaved-doc synthesis is pure modular arithmetic, so the
    media-span explode mirrors in SQL: span count d%6+1, kind from the
    6-slot kind wheel at (d+s)%6, s3 ref from lpad/concat; text spans
    (empty ref) drop, exactly like explode_media_spans."""
    return """
    WITH ids AS (
      SELECT unnest(generate_series(0,
             (SELECT count(*) FROM documents) - 1)) AS d
    ), sp AS (
      SELECT d, unnest(generate_series(0, d % 6)) AS s FROM ids
    ), k AS (
      SELECT d, s,
        ['text','image','audio','text','text','video'][(d + s) % 6 + 1] AS kind
      FROM sp
    )
    SELECT 'doc-' || lpad(CAST(d AS VARCHAR), 9, '0') AS doc_id,
           CAST(s AS INTEGER) AS span_idx, kind,
           's3://media/' || kind || '/' || lpad(CAST(d % 1000 AS VARCHAR), 3, '0')
             || '/' || CAST(d AS VARCHAR) || '_' || CAST(s AS VARCHAR)
             || '.bin' AS media_ref
    FROM k WHERE kind <> 'text'
    """


def q_media_features(sf_dir):
    """Multimodal: explode media spans of the interleaved-doc table,
    fetch + decode (stubbed codecs, real actor-pool plumbing)."""
    import pyarrow.parquet as pq

    from ..sources.synth import interleaved_docs
    from ..stages.media import media_features

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    docs = interleaved_docs(n)
    out = media_features(docs)
    return out.select_columns(["doc_id", "span_idx", "kind", "media_ref"])


def q_pii_scrub(sf_dir):
    """PII redaction (C4/Dolma-style scrub) — emails/IPv4/phones
    replaced by tokens with per-doc match counts, pure Arrow RE2
    kernels. The synthetic corpus has no PII, so both sides inject the
    SAME deterministic patterns first; Arrow and DuckDB share RE2, so
    counts and scrubbed text mirror exactly (`pipelines/text.py
    pii_scrub`)."""
    from .text import pii_scrub

    ds = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"]
        dm = lambda m: pc.cast(pc.subtract(d, pc.multiply(
            pc.divide(d, m), m)), pa.string())  # d % m as string
        txt = pc.binary_join_element_wise(
            batch["text"], " contact user", dm(97), "@mail", dm(7),
            ".com ip 10.", dm(251), ".0.", dm(100),
            " tel 555-123-4567", "")
        return pa.table({"doc_id": d, "text": txt})

    out = pii_scrub(ds.map_batches(augment, batch_format="pyarrow"))

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_email": batch["n_email"], "n_ipv4": batch["n_ipv4"],
            "n_phone": batch["n_phone"],
            "out_len": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            # last 40 codepoints: slice takes scalar offsets only, so
            # reverse → head-slice → reverse
            "tail": pc.utf8_reverse(pc.utf8_slice_codeunits(
                pc.utf8_reverse(batch["text"]), 0, 40)),
        })

    return out.map_batches(f, batch_format="pyarrow")


def _sql_pii_scrub():
    from .text import PII_PATTERNS

    em, ip, ph = (p[1] for p in PII_PATTERNS)
    aug = ("text || ' contact user' || (doc_id % 97) || '@mail' || "
           "(doc_id % 7) || '.com ip 10.' || (doc_id % 251) || '.0.' || "
           "(doc_id % 100) || ' tel 555-123-4567'")
    scrub = (f"regexp_replace(regexp_replace(regexp_replace(a, '{em}', "
             f"'<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), '{ph}', "
             f"'<PHONE>', 'g')")
    return f"""
    WITH b AS (SELECT doc_id, {aug} AS a FROM documents),
    s AS (SELECT doc_id,
        len(regexp_extract_all(a, '{em}')) AS n_email,
        len(regexp_extract_all(regexp_replace(a, '{em}', '<EMAIL>', 'g'),
            '{ip}')) AS n_ipv4,
        len(regexp_extract_all(regexp_replace(regexp_replace(a, '{em}',
            '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), '{ph}')) AS n_phone,
        {scrub} AS out FROM b)
    SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
           CAST(n_ipv4 AS BIGINT) AS n_ipv4,
           CAST(n_phone AS BIGINT) AS n_phone,
           CAST(length(out) AS BIGINT) AS out_len,
           substr(out, length(out) - 39, 40) AS tail
    FROM s
    """


def q_geotiff_roundtrip(sf_dir):
    """Raster driver surface: rasterize events at z4 → ONE GeoTIFF per
    XYZ tile (real TIFF 6.0 + GeoTIFF keys, Deflate, pure-numpy codec
    `codecs/tiff.py`; atomic per-tile commit) → stream the .tif files
    back (`read_geotiff_pixels`) → per-tile pixel count + burn sum.
    Reference parity: frmts/gtiff/geotiff.cpp write→read cycle."""
    import os
    import shutil

    from ..pipelines import relational
    from ..sources.geotiff import read_geotiff_pixels, write_geotiff_tiles

    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 4, merge_alg="count", shuffle_partitions=8)
    out_dir = f"/tmp/lib_gdal_ray_gtiff_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    # the manifest Dataset carries the writes — materialize to commit
    write_geotiff_tiles(pix, out_dir, tile_size=256).materialize()
    back = read_geotiff_pixels(out_dir)

    def tile_cols(batch: pa.Table) -> pa.Table:
        _, gpx, gpy = rast.unpack_pixel(batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({
            "tile_x": pa.array((gpx // 256).astype(np.int64)),
            "tile_y": pa.array((gpy // 256).astype(np.int64)),
            "burn": batch["burn"],
        })

    keyed = back.map_batches(tile_cols, batch_format="pyarrow")
    agg = relational.grouped_agg(
        keyed, ["tile_x", "tile_y"],
        [("count", "burn", "n_pixels"), ("sum", "burn", "burn_sum_f")],
        shuffle_partitions=4)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": batch["tile_x"], "tile_y": batch["tile_y"],
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "burn_sum": pc.cast(pc.round(batch["burn_sum_f"]), pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def _sql_geotiff_roundtrip():
    gx, gy = _tile_sql(4 + 8)  # global pixel index at z=4, 256px tiles
    return f"""
    WITH px AS (SELECT {gx} AS gpx, {gy} AS gpy FROM {_POINTS_SQL} p),
    agg AS (SELECT gpx, gpy, count(*) AS burn FROM px GROUP BY 1, 2)
    SELECT gpx // 256 AS tile_x, gpy // 256 AS tile_y,
           count(*) AS n_pixels, CAST(sum(burn) AS BIGINT) AS burn_sum
    FROM agg GROUP BY 1, 2
    """


def q_vrt_mosaic(sf_dir):
    """VRT virtual-raster surface (`frmts/vrt/vrtdataset.cpp` +
    `apps/gdalbuildvrt_lib.cpp`): rasterize events at z4 → one GeoTIFF
    per XYZ tile → gdalbuildvrt unions the tile headers into a mosaic
    VRT (no pixels read at build time) → `read_vrt_pixels` streams the
    plan back, one Ray decode task per source tile, non-overlapping so
    ZERO shuffle → per-tile count + burn sum in VRT-relative tile
    coords (origin-normalized so the oracle is placement-independent)."""
    import os
    import shutil

    from ..pipelines import relational
    from ..sources.geotiff import write_geotiff_tiles
    from ..sources.vrt import build_vrt, read_vrt_pixels, write_vrt

    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 4, merge_alg="count",
                                shuffle_partitions=8)
    out_dir = (f"/tmp/lib_gdal_ray_vrt_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    manifest = write_geotiff_tiles(pix, out_dir, tile_size=256).materialize()
    paths = sorted(r["path"] for r in manifest.take_all())
    vrt = build_vrt(paths)
    vrt_path = os.path.join(out_dir, "mosaic.vrt")
    write_vrt(vrt, vrt_path)
    rows = read_vrt_pixels(vrt_path, drop_zero=True)

    def tile_cols(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"tile_x": pa.array(x // 256),
                         "tile_y": pa.array(y // 256),
                         "value": batch["value"]})

    keyed = rows.map_batches(tile_cols, batch_format="pyarrow")
    agg = relational.grouped_agg(
        keyed, ["tile_x", "tile_y"],
        [("count", "value", "n_pixels"), ("sum", "value", "burn_sum_f")],
        shuffle_partitions=4)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": pc.cast(batch["tile_x"], pa.int64()),
            "tile_y": pc.cast(batch["tile_y"], pa.int64()),
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "burn_sum": pc.cast(pc.round(batch["burn_sum_f"]), pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def _sql_vrt_mosaic():
    gx, gy = _tile_sql(4 + 8)
    return f"""
    WITH px AS (SELECT {gx} AS gpx, {gy} AS gpy FROM {_POINTS_SQL} p),
    agg AS (SELECT gpx, gpy, count(*) AS burn FROM px GROUP BY 1, 2),
    tl AS (SELECT gpx // 256 AS tx, gpy // 256 AS ty,
                  count(*) AS n_pixels, CAST(sum(burn) AS BIGINT) AS burn_sum
           FROM agg GROUP BY 1, 2)
    SELECT tx - (SELECT min(tx) FROM tl) AS tile_x,
           ty - (SELECT min(ty) FROM tl) AS tile_y,
           n_pixels, burn_sum
    FROM tl
    """


def q_geojson_roundtrip(sf_dir):
    """Vector driver surface: events → WKB point layer → GeoJSONSeq
    write (RFC 8142, one Feature per line, one file per block) → stream
    read back (`read_text` + vectorized parse) → coordinates recovered
    from the parsed WKB. Exercises the full OGR-driver analog
    (`sources/vector_formats.py`; reference ogr/ogrsf_frmts/geojson)."""
    import os

    from ..geom import wkb as wkb_mod
    from ..sources import vector_formats as vf

    ev = tables.read_table(sf_dir, "events", columns=["event_id"])

    def to_layer(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive.event_lonlat(eid)
        geoms = wkb_mod.points_to_wkb(lon, lat)
        return pa.table({"event_id": batch["event_id"],
                         "geometry": pa.array(list(geoms), type=pa.binary())})

    layer = ev.map_batches(to_layer, batch_format="pyarrow")
    out_dir = f"/tmp/lib_gdal_ray_geojson_{os.path.basename(os.path.normpath(sf_dir))}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    vf.write_geojson_seq(layer, out_dir)
    back = vf.read_geojson_seq(out_dir, properties=["event_id"])

    def coords(batch: pa.Table) -> pa.Table:
        import numpy as _np
        lon, lat = wkb_mod.wkb_to_points(
            _np.asarray(batch["geometry"].to_pylist(), dtype=object))
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


SQL_GEOJSON_ROUNDTRIP = f"""
SELECT event_id,
       CAST(floor(({derive.SQL_EVENT_LON}) * 1e6 + 0.5) AS BIGINT) AS lon_c,
       CAST(floor(({derive.SQL_EVENT_LAT}) * 1e6 + 0.5) AS BIGINT) AS lat_c
FROM events
"""


def _points_layer_with_name(sf_dir):
    from ..geom import wkb as wkb_mod

    ev = tables.read_table(sf_dir, "events", columns=["event_id"])

    def to_layer(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive.event_lonlat(eid)
        geoms = wkb_mod.points_to_wkb(lon, lat)
        return pa.table({"geometry": pa.array(list(geoms),
                                              type=pa.binary()),
                         "name": pc.cast(batch["event_id"], pa.string())})

    return ev.map_batches(to_layer, batch_format="pyarrow")


def _points_back_to_coords(back: ray.data.Dataset,
                           name_col: str = "name") -> ray.data.Dataset:
    from ..geom import wkb as wkb_mod

    def coords(batch: pa.Table) -> pa.Table:
        import numpy as _np
        lon, lat = wkb_mod.wkb_to_points(
            _np.asarray(batch["geometry"].to_pylist(), dtype=object))
        eid = np.array([int(s) for s in batch[name_col].to_pylist()],
                       dtype=np.int64)
        return pa.table({
            "event_id": pa.array(eid),
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


def q_kml_roundtrip(sf_dir):
    """KML driver surface (ogr/ogrsf_frmts/kml analog): events → ONE
    KML Document of Placemarks (distributed fragments + streaming
    concat) → Placemark traversal back → coordinates recovered.
    Same oracle as geojson/gpx, third XML format."""
    import os

    from ..sources import xml_vectors as xv

    layer = _points_layer_with_name(sf_dir)
    path = (f"/tmp/lib_gdal_ray_kml_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.kml")
    xv.write_kml(layer, path, name_col="name")
    # fragment read: one parse task per line block, not one ET parse
    # of the whole megabyte document
    return _points_back_to_coords(xv.read_kml_fragments(path))


def q_gml_roundtrip(sf_dir):
    """GML driver surface (ogr/ogrsf_frmts/gml analog): events → ONE
    GML2 FeatureCollection → featureMember traversal back →
    coordinates recovered. Same oracle again, fourth XML format."""
    import os

    from ..sources import gml as gml_mod

    layer = _points_layer_with_name(sf_dir)
    path = (f"/tmp/lib_gdal_ray_gml_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.gml")
    gml_mod.write_gml(layer, path, layer="pt")
    back = gml_mod.read_gml_fragments(path, properties=["name"])
    return _points_back_to_coords(back)


def q_envi_roundtrip(sf_dir):
    """ENVI raw-binary driver surface (frmts/raw/envidataset.cpp
    analog, sources/envi.py): events → z0 count grid (256×256 dense —
    the whole world in one ENVI scene) → .hdr/.img BIL pair → line-
    range-split parallel read back → count + sum per 32-px row band."""
    import os

    from ..pipelines import relational
    from ..sources import envi as envi_mod

    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 0, merge_alg="count",
                                shuffle_partitions=4)
    df = pix.to_pandas()  # z0 grid: ≤65536 sparse rows — driver-small
    _z, gpx, gpy = rast.unpack_pixel(df["pix_id"].to_numpy())
    dense = np.zeros((256, 256), dtype=np.float64)
    dense[gpy, gpx] = df["burn"].to_numpy()
    path = (f"/tmp/lib_gdal_ray_envi_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.hdr")
    envi_mod.encode_envi(dense, path, interleave="bil")
    back = envi_mod.read_envi_rows(path, rows_per_chunk=32)

    def band_cols(batch: pa.Table) -> pa.Table:
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        keep = v != 0
        return pa.table({"row_band": pa.array(y[keep] // 32),
                         "value": pa.array(v[keep])})

    keyed = back.map_batches(band_cols, batch_format="pyarrow")
    agg = relational.grouped_agg(
        keyed, ["row_band"],
        [("count", "value", "n_pixels"), ("sum", "value", "n_events_f")],
        shuffle_partitions=2)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "row_band": pc.cast(batch["row_band"], pa.int64()),
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "n_events": pc.cast(pc.round(batch["n_events_f"]), pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def q_hdf4_roundtrip(sf_dir):
    """HDF4 driver surface (frmts/hdf4 analog, sources/hdf4.py —
    reference fixture checksums pinned in tests/test_hdf4.py): the z0
    world count grid written as a single-SDS .hdf (big-endian NDG
    layout), read back by line-range-split parallel tasks → same
    per-row-band stats as envi_roundtrip."""
    import os

    from ..pipelines import relational
    from ..sources import hdf4 as h4

    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 0, merge_alg="count",
                                shuffle_partitions=4)
    df = pix.to_pandas()  # z0 grid: ≤65536 sparse rows — driver-small
    _z, gpx, gpy = rast.unpack_pixel(df["pix_id"].to_numpy())
    dense = np.zeros((256, 256), dtype=np.int32)
    dense[gpy, gpx] = df["burn"].to_numpy().astype(np.int32)
    path = (f"/tmp/lib_gdal_ray_hdf4_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.hdf")
    with open(path, "wb") as f:
        f.write(h4.encode_hdf4(dense))
    back = h4.read_hdf4_rows(path, rows_per_chunk=32)

    def band_cols(batch: pa.Table) -> pa.Table:
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        keep = v != 0
        return pa.table({"row_band": pa.array(y[keep] // 32),
                         "value": pa.array(v[keep])})

    keyed = back.map_batches(band_cols, batch_format="pyarrow")
    agg = relational.grouped_agg(
        keyed, ["row_band"],
        [("count", "value", "n_pixels"), ("sum", "value", "n_events_f")],
        shuffle_partitions=2)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "row_band": pc.cast(batch["row_band"], pa.int64()),
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "n_events": pc.cast(pc.round(batch["n_events_f"]), pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def q_rasterize_geodetic(sf_dir):
    """OGC TileMatrixSet rasterization (geom/tms.py,
    gcore/tilematrixset.cpp parity): events burned onto the
    WorldCRS84Quad grid at zoom 2 (matrix 16x8, res 180/1024 deg/px)
    — the non-mercator tiling scheme path of gdal raster tile
    --tiling-scheme. Linear pixel math mirrors exactly in SQL."""
    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 2, merge_alg="count",
                                shuffle_partitions=8,
                                tms="WorldCRS84Quad")

    def f(batch: pa.Table) -> pa.Table:
        _z, gpx, gpy = rast.unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False))
        return pa.table({
            "gpx": pa.array(gpx),
            "gpy": pa.array(gpy),
            "n_events": pc.cast(pc.round(batch["burn"]), pa.int64()),
        })

    return pix.map_batches(f, batch_format="pyarrow")


def sql_rasterize_geodetic():
    # WorldCRS84Quad z2: res = 180/256/4 deg/px; gx = floor((lon+180)/res)
    # clipped to [0, 4096), gy = floor((90-lat)/res) clipped to [0, 2048)
    res = "(180.0/1024.0)"
    return f"""
    SELECT LEAST(GREATEST(CAST(floor((lon + 180.0) / {res}) AS BIGINT),
                          0), 4095) AS gpx,
           LEAST(GREATEST(CAST(floor((90.0 - lat) / {res}) AS BIGINT),
                          0), 2047) AS gpy,
           count(*) AS n_events
    FROM {_POINTS_SQL} p GROUP BY 1, 2
    """


def q_jp2_roundtrip(sf_dir):
    """JPEG 2000 driver surface (frmts/openjpeg analog,
    codecs/jp2k.py — reference autotest checksums pinned in
    tests/test_jp2k.py): the z0 world count grid encoded as a
    lossless 5/3 JP2 codestream (MQ + EBCOT + DWT), decoded back in a
    Ray task → same per-row-band stats as envi_roundtrip."""
    import os

    from ..codecs.jp2k import encode_jp2
    from ..pipelines import relational

    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 0, merge_alg="count",
                                shuffle_partitions=4)
    df = pix.to_pandas()  # z0 grid: ≤65536 sparse rows — driver-small
    _z, gpx, gpy = rast.unpack_pixel(df["pix_id"].to_numpy())
    dense = np.zeros((256, 256), dtype=np.uint16)
    dense[gpy, gpx] = df["burn"].to_numpy().astype(np.uint16)
    path = (f"/tmp/lib_gdal_ray_jp2_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.jp2")
    with open(path, "wb") as f:
        f.write(encode_jp2(dense, nlevels=3))

    def decode_rows(batch: pa.Table) -> pa.Table:
        from ..codecs.jp2k import decode_jp2

        arr, _meta = decode_jp2(open(path, "rb").read())
        yy, xx = np.nonzero(arr)
        return pa.table({
            "row_band": pa.array((yy // 32).astype(np.int64)),
            "value": pa.array(arr[yy, xx].astype(np.float64))})

    back = ray.data.from_items([{"i": 0}]).map_batches(
        decode_rows, batch_format="pyarrow")
    agg = relational.grouped_agg(
        back, ["row_band"],
        [("count", "value", "n_pixels"), ("sum", "value", "n_events_f")],
        shuffle_partitions=2)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "row_band": pc.cast(batch["row_band"], pa.int64()),
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "n_events": pc.cast(pc.round(batch["n_events_f"]), pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def q_grib_roundtrip(sf_dir):
    """GRIB2 driver surface (frmts/grib analog, sources/grib.py): the
    z0 world count grid packed as a simple-packing GRIB2 message
    (integer counts < 2^16 make the (R + X·2^E)/10^D path exact) →
    one Ray decode task per message → same per-row-band stats as
    envi_roundtrip."""
    import os

    from ..pipelines import relational
    from ..sources import grib as grib_mod

    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 0, merge_alg="count",
                                shuffle_partitions=4)
    df = pix.to_pandas()
    _z, gpx, gpy = rast.unpack_pixel(df["pix_id"].to_numpy())
    dense = np.zeros((256, 256), dtype=np.float64)
    dense[gpy, gpx] = df["burn"].to_numpy()
    path = (f"/tmp/lib_gdal_ray_grib_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.grb2")
    # 24-bit packing keeps integer counts exact up to 16.7M per pixel
    buf = grib_mod.encode_grib2_simple(dense, lat1=85.0, lon1=0.0,
                                       di=1.40625, dj=0.6640625,
                                       nbits=24)
    with open(path + ".tmp", "wb") as f:
        f.write(buf)
    os.replace(path + ".tmp", path)
    back = grib_mod.read_grib2_rows(path)

    def band_cols(batch: pa.Table) -> pa.Table:
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        keep = v != 0
        return pa.table({"row_band": pa.array(y[keep] // 32),
                         "value": pa.array(v[keep])})

    keyed = back.map_batches(band_cols, batch_format="pyarrow")
    agg = relational.grouped_agg(
        keyed, ["row_band"],
        [("count", "value", "n_pixels"), ("sum", "value", "n_events_f")],
        shuffle_partitions=2)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "row_band": pc.cast(batch["row_band"], pa.int64()),
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "n_events": pc.cast(pc.round(batch["n_events_f"]), pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def q_rraster_roundtrip(sf_dir):
    """RRASTER driver surface (frmts/raw/rrasterdataset.cpp analog,
    sources/rraster.py): events → z0 count grid → .grd/.gri BIL pair
    → line-range-split parallel read back → count + sum per 32-px row
    band. Same oracle as envi_roundtrip."""
    import os

    from ..pipelines import relational
    from ..sources import rraster as rr_mod

    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 0, merge_alg="count",
                                shuffle_partitions=4)
    df = pix.to_pandas()  # ≤65536 sparse rows — driver-small
    _z, gpx, gpy = rast.unpack_pixel(df["pix_id"].to_numpy())
    dense = np.zeros((256, 256), dtype=np.float64)
    dense[gpy, gpx] = df["burn"].to_numpy()
    path = (f"/tmp/lib_gdal_ray_rraster_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.grd")
    rr_mod.encode_rraster(dense, path)
    back = rr_mod.read_rraster_rows(path, rows_per_chunk=32)

    def band_cols(batch: pa.Table) -> pa.Table:
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False)
        keep = v != 0
        return pa.table({"row_band": pa.array(y[keep] // 32),
                         "value": pa.array(v[keep])})

    keyed = back.map_batches(band_cols, batch_format="pyarrow")
    agg = relational.grouped_agg(
        keyed, ["row_band"],
        [("count", "value", "n_pixels"), ("sum", "value", "n_events_f")],
        shuffle_partitions=2)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "row_band": pc.cast(batch["row_band"], pa.int64()),
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "n_events": pc.cast(pc.round(batch["n_events_f"]),
                                pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def q_jml_roundtrip(sf_dir):
    """OpenJUMP JML driver surface (ogr/ogrsf_frmts/jml analog,
    sources/jml.py): events → ONE JML document (distributed
    line-per-feature fragments + streaming concat) → fragment-parallel
    read back → coordinates recovered. Same oracle as geojson."""
    import os

    from ..sources import jml as jml_mod

    layer = _points_layer_with_name(sf_dir)
    path = (f"/tmp/lib_gdal_ray_jml_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.jml")
    jml_mod.write_jml_ds(layer, path)
    return _points_back_to_coords(jml_mod.read_jml_fragments(path))


def q_georss_roundtrip(sf_dir):
    """GeoRSS driver surface (ogr/ogrsf_frmts/georss analog,
    sources/georss.py): events → ONE RSS 2.0 + GeoRSS-simple feed
    (distributed line-per-item fragments, lat-lon order on disk) →
    fragment-parallel read back → coordinates recovered. Same oracle
    as geojson."""
    import os

    from ..sources import georss as georss_mod

    layer = _points_layer_with_name(sf_dir)
    path = (f"/tmp/lib_gdal_ray_georss_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.rss")
    georss_mod.write_georss_ds(layer, path)
    return _points_back_to_coords(
        georss_mod.read_georss_fragments(path))


def _sql_envi_roundtrip():
    gx, gy = _tile_sql(8)  # z0 × 256 px = global 256-grid
    return f"""
    WITH px AS (SELECT {gx} AS gpx, {gy} AS gpy, count(*) AS cnt
                FROM {_POINTS_SQL} p GROUP BY 1, 2)
    SELECT gpy // 32 AS row_band, count(*) AS n_pixels,
           CAST(sum(cnt) AS BIGINT) AS n_events
    FROM px GROUP BY 1
    """


def q_mvt_roundtrip(sf_dir):
    """Mapbox Vector Tile surface (ogr/ogrsf_frmts/mvt analog,
    sources/mvt.py): events → one .pbf per z4 tile (parallel encode,
    per-tile resume) → parallel decode back → per-tile feature count.
    Tile assignment mirrors the shared WebMercatorQuad math; the
    tile-local geometry coords are pinned in tests/test_mvt.py (their
    floor boundary at extent 4096 is libm-ulp-fragile in SQL)."""
    import os
    import shutil

    from ..pipelines import relational
    from ..sources import mvt as mvt_mod

    pts = events_points(sf_dir)
    out_dir = (f"/tmp/lib_gdal_ray_mvt_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    mvt_mod.write_mvt_points(pts, out_dir, z=4).materialize()
    back = mvt_mod.read_mvt_features(out_dir)
    agg = relational.grouped_agg(
        back, ["tile_x", "tile_y"],
        [("count", "n_points", "n_features")], shuffle_partitions=4)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": pc.cast(batch["tile_x"], pa.int64()),
            "tile_y": pc.cast(batch["tile_y"], pa.int64()),
            "n_features": pc.cast(batch["n_features"], pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def q_pmtiles_roundtrip(sf_dir):
    """PMTiles v3 surface (ogr/ogrsf_frmts/pmtiles analog,
    sources/pmtiles.py): the z4 MVT tile tree packed into ONE archive
    (Hilbert-clustered, gzip varint directories) → features read back
    per tile byte-range → same per-tile counts as mvt_roundtrip."""
    import os
    import shutil

    from ..pipelines import relational
    from ..sources import mvt as mvt_mod
    from ..sources import pmtiles as pm

    pts = events_points(sf_dir)
    out_dir = (f"/tmp/lib_gdal_ray_pmt_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    mvt_mod.write_mvt_points(pts, out_dir, z=4).materialize()
    arc = os.path.join(out_dir, "a.pmtiles")
    pm.write_pmtiles(out_dir, arc)
    back = pm.read_pmtiles_features(arc)
    agg = relational.grouped_agg(
        back, ["tile_x", "tile_y"],
        [("count", "n_points", "n_features")], shuffle_partitions=4)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": pc.cast(batch["tile_x"], pa.int64()),
            "tile_y": pc.cast(batch["tile_y"], pa.int64()),
            "n_features": pc.cast(batch["n_features"], pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def q_mbtiles_roundtrip(sf_dir):
    """MBTiles surface (frmts/mbtiles analog, sources/mbtiles.py):
    the z4 MVT tile tree assembled into ONE sqlite archive (TMS row
    flip) → rowid-range-split parallel read back → same per-tile
    counts as mvt_roundtrip."""
    import os
    import shutil

    from ..pipelines import relational
    from ..sources import mbtiles as mb
    from ..sources import mvt as mvt_mod

    pts = events_points(sf_dir)
    out_dir = (f"/tmp/lib_gdal_ray_mbt_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    mvt_mod.write_mvt_points(pts, out_dir, z=4).materialize()
    arc = os.path.join(out_dir, "a.mbtiles")
    mb.write_mbtiles(out_dir, arc)
    back = mb.read_mbtiles_features(arc)
    agg = relational.grouped_agg(
        back, ["tile_x", "tile_y"],
        [("count", "n_points", "n_features")], shuffle_partitions=4)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": pc.cast(batch["tile_x"], pa.int64()),
            "tile_y": pc.cast(batch["tile_y"], pa.int64()),
            "n_features": pc.cast(batch["n_features"], pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def _sql_mvt_roundtrip():
    tx, ty = _tile_sql(4)
    n = 1 << 4
    return f"""
    SELECT least({tx}, {n - 1}) AS tile_x,
           least({ty}, {n - 1}) AS tile_y,
           count(*) AS n_features
    FROM {_POINTS_SQL} p GROUP BY 1, 2
    """


def q_gpkg_raster_roundtrip(sf_dir):
    """GPKG raster tile pyramid (ogr/ogrsf_frmts/gpkg raster side,
    sources/gpkg_tiles.py): events → z4 pixel counts (clamped to Byte,
    GDAL's cast) → per-tile PNG blobs encoded in parallel → ONE raster
    .gpkg with the full gpkg_tile_matrix(_set) registry → rowid-split
    parallel decode back to pixels → per-tile (n_pixels, sum of
    values). Oracle mirrors the z12 global-pixel floor formulas and
    least(cnt, 255)."""
    import os
    import shutil

    from ..pipelines import relational
    from ..sources import gpkg_tiles as gtiles

    pts = events_points(sf_dir)
    pix = rast.rasterize_pixels(pts, 4, merge_alg="count",
                                shuffle_partitions=8)
    tiles = gtiles.render_tile_blobs(pix)  # uint8: clamps at 255
    out_dir = (f"/tmp/lib_gdal_ray_gpkgr_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    arc = os.path.join(out_dir, "r.gpkg")
    gtiles.write_gpkg_raster(tiles, arc)
    back = gtiles.read_gpkg_raster_pixels(arc)

    def tile_key(batch: pa.Table) -> pa.Table:
        _, gpx, gpy = rast.unpack_pixel(
            batch["pix_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table({
            "tile_x": pa.array((gpx // 256).astype(np.int64)),
            "tile_y": pa.array((gpy // 256).astype(np.int64)),
            "burn": batch["burn"],
        })

    agg = relational.grouped_agg(
        back.map_batches(tile_key, batch_format="pyarrow"),
        ["tile_x", "tile_y"],
        [("count", "burn", "n_pixels"), ("sum", "burn", "sum_val")],
        shuffle_partitions=4)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tile_x": pc.cast(batch["tile_x"], pa.int64()),
            "tile_y": pc.cast(batch["tile_y"], pa.int64()),
            "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
            "sum_val": pc.cast(pc.round(batch["sum_val"]), pa.int64()),
        })

    return agg.map_batches(f, batch_format="pyarrow")


def sql_gpkg_raster_roundtrip():
    gx, gy = _tile_sql(12)  # z4 tiles x 256 px = z12 global pixels
    return f"""
    WITH px AS (
      SELECT {gx} AS gpx, {gy} AS gpy, count(*) AS cnt
      FROM {_POINTS_SQL} p GROUP BY 1, 2
    )
    SELECT gpx // 256 AS tile_x, gpy // 256 AS tile_y,
           count(*) AS n_pixels,
           CAST(sum(least(cnt, 255)) AS BIGINT) AS sum_val
    FROM px GROUP BY 1, 2
    """


def q_gpx_roundtrip(sf_dir):
    """GPX driver surface (ogr/ogrsf_frmts/gpx analog,
    sources/xml_vectors.py): events → point WKB → ONE GPX waypoint
    document (distributed fragment serialization + driver-side
    streaming concat) → parse back → coordinates recovered. Same
    oracle as geojson_roundtrip, different on-disk format."""
    import os

    from ..geom import wkb as wkb_mod
    from ..sources import xml_vectors as xv

    ev = tables.read_table(sf_dir, "events", columns=["event_id"])

    def to_layer(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive.event_lonlat(eid)
        geoms = wkb_mod.points_to_wkb(lon, lat)
        return pa.table({"geometry": pa.array(list(geoms),
                                              type=pa.binary()),
                         "name": pc.cast(batch["event_id"], pa.string())})

    layer = ev.map_batches(to_layer, batch_format="pyarrow")
    path = (f"/tmp/lib_gdal_ray_gpx_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.gpx")
    xv.write_gpx(layer, path, name_col="name")
    back = xv.read_gpx_fragments(path)

    def coords(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        eid = np.array([int(s) for s in batch["name"].to_pylist()],
                       dtype=np.int64)
        return pa.table({
            "event_id": pa.array(eid),
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


def q_gpkg_roundtrip(sf_dir):
    """GeoPackage driver surface: events → WKB point layer (+typed
    attrs) → partitioned .gpkg write (one valid GeoPackage per block,
    atomic) → parallel rowid-split read-back → coordinates recovered
    from the GeoPackageBinary blobs. Exercises the sqlite registry
    tables, GP blob codec and SQL-level column pruning
    (`sources/gpkg.py`; reference ogr/ogrsf_frmts/gpkg)."""
    import os
    import shutil

    from ..geom import wkb as wkb_mod
    from ..sources import gpkg as gpkg_mod

    ev = tables.read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def to_layer(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive.event_lonlat(eid)
        geoms = wkb_mod.points_to_wkb(lon, lat)
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "geometry": pa.array(list(geoms), type=pa.binary())})

    layer = ev.map_batches(to_layer, batch_format="pyarrow")
    out_dir = f"/tmp/lib_gdal_ray_gpkg_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    gpkg_mod.write_gpkg(layer, out_dir, layer="events_pts",
                        geometry_type="POINT")
    back = gpkg_mod.read_gpkg(out_dir)

    def coords(batch: pa.Table) -> pa.Table:
        import numpy as _np
        lon, lat = wkb_mod.wkb_to_points(
            _np.asarray(batch["geometry"].to_pylist(), dtype=object))
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "event_type": batch["event_type"],
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


SQL_GPKG_ROUNDTRIP = f"""
SELECT event_id, event_type,
       CAST(floor(({derive.SQL_EVENT_LON}) * 1e6 + 0.5) AS BIGINT) AS lon_c,
       CAST(floor(({derive.SQL_EVENT_LAT}) * 1e6 + 0.5) AS BIGINT) AS lat_c
FROM events
"""


def q_shapefile_roundtrip(sf_dir):
    """Shapefile driver surface: events → point layer w/ integer + text
    attrs → partitioned .shp/.shx/.dbf write → shx-planned record-range
    read-back. Exercises the shape codec, dBASE attribute codec and the
    split planner (`sources/shapefile.py`; reference
    ogr/ogrsf_frmts/shape)."""
    import os
    import shutil

    from ..geom import wkb as wkb_mod
    from ..sources import shapefile as shp_mod

    ev = tables.read_table(sf_dir, "events", columns=["event_id", "event_type"])

    def to_layer(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive.event_lonlat(eid)
        geoms = wkb_mod.points_to_wkb(lon, lat)
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "geometry": pa.array(list(geoms), type=pa.binary())})

    layer = ev.map_batches(to_layer, batch_format="pyarrow")
    out_dir = f"/tmp/lib_gdal_ray_shp_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    shp_mod.write_shapefile(layer, out_dir)
    back = shp_mod.read_shapefile(out_dir)

    def coords(batch: pa.Table) -> pa.Table:
        import numpy as _np
        lon, lat = wkb_mod.wkb_to_points(
            _np.asarray(batch["geometry"].to_pylist(), dtype=object))
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "event_type": batch["event_type"],
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


def q_csv_wkt_roundtrip(sf_dir):
    """CSV-with-WKT driver surface: nation zone polygons → WKT text
    column → CSV write → CSV read + WKT parse → exact integer vertex
    checksum of the parsed rings (OGR CSV GEOM_POSSIBLE_NAMES analog,
    `sources/vector_formats.py` + `geom/wkt.py`)."""
    import os
    import shutil

    from ..geom import wkb as wkb_mod
    from ..sources import vector_formats as vf

    na = tables.read_table(sf_dir, "nation", columns=["n_nationkey"])

    def to_layer(batch: pa.Table) -> pa.Table:
        nk = batch["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
        geoms = [wkb_mod.box_to_wkb(float(a), float(b), float(c), float(d))
                 for a, b, c, d in zip(xmin, ymin, xmax, ymax)]
        return pa.table({"zone_id": pa.array(nk),
                         "geometry": pa.array(geoms, type=pa.binary())})

    layer = na.map_batches(to_layer, batch_format="pyarrow")
    out_dir = f"/tmp/lib_gdal_ray_csvwkt_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out_dir, ignore_errors=True)
    vf.write_csv_wkt(layer, out_dir)
    back = vf.read_csv_wkt(out_dir)

    def checksum(batch: pa.Table) -> pa.Table:
        sums = []
        for g in batch["geometry"].to_pylist():
            rings = wkb_mod.wkb_rings(g)
            s = 0.0
            for ring in rings[0]:
                a = np.asarray(ring, dtype=np.float64)
                s += float(np.abs(a).sum())
            sums.append(int(np.floor(s * 100 + 0.5)))
        return pa.table({"zone_id": pc.cast(batch["zone_id"], pa.int64()),
                         "vertex_sum_c": pa.array(np.asarray(sums, np.int64))})

    return back.map_batches(checksum, batch_format="pyarrow")


SQL_CSV_WKT_ROUNDTRIP = f"""
WITH z AS (
  SELECT n_nationkey AS zone_id,
         {derive.SQL_ZONE_XMIN} AS xmin, {derive.SQL_ZONE_XMAX} AS xmax,
         {derive.SQL_ZONE_YMIN} AS ymin, {derive.SQL_ZONE_YMAX} AS ymax
  FROM nation)
SELECT CAST(zone_id AS BIGINT) AS zone_id,
  CAST(floor((2*abs(xmin) + 2*abs(xmax) + 2*abs(ymin) + 2*abs(ymax)
              + abs(xmin) + abs(ymin)) * 100 + 0.5) AS BIGINT) AS vertex_sum_c
FROM z
"""


_SQL_MEDIA_SPANS = """
    WITH ids AS (
      SELECT unnest(generate_series(0,
             (SELECT count(*) FROM documents) - 1)) AS d
    ), sp AS (
      SELECT d, unnest(generate_series(0, d % 6)) AS s FROM ids
    ), k AS (
      SELECT d, s,
        ['text','image','audio','text','text','video'][(d + s) % 6 + 1] AS kind
      FROM sp
    ), media AS (SELECT d, s, kind FROM k WHERE kind <> 'text')
"""


def sql_media_decode():
    """Mirrors the REAL codec pipeline in closed form: the synthetic
    payloads are PNG/WAV/RWV encodings of modular-arithmetic content
    (stages/media.py synth_image/audio/video_frames), so the decoded
    value statistics are exactly expressible — any encoder/decoder bug
    (filtering, zlib framing, CRC, sample layout) breaks the sums."""
    return _SQL_MEDIA_SPANS + """
    , img AS (
      SELECT d, s, 'image' AS kind, CAST((8 + d % 8) * (8 + (d + s) % 5) AS BIGINT) AS n_values,
             CAST(sum((x + 3*y + d + 7*s) % 256) AS BIGINT) AS val_sum,
             CAST(min((x + 3*y + d + 7*s) % 256) AS INTEGER) AS val_min,
             CAST(max((x + 3*y + d + 7*s) % 256) AS INTEGER) AS val_max
      FROM media,
           LATERAL unnest(generate_series(0, 8 + d % 8 - 1)) tx(x),
           LATERAL unnest(generate_series(0, 8 + (d + s) % 5 - 1)) ty(y)
      WHERE media.kind = 'image' GROUP BY d, s
    ), aud AS (
      SELECT d, s, 'audio' AS kind, CAST(64 + (d % 16) * 8 AS BIGINT) AS n_values,
             CAST(sum((i * (1 + d % 13) + 5*s) % 509 - 254) AS BIGINT) AS val_sum,
             CAST(min((i * (1 + d % 13) + 5*s) % 509 - 254) AS INTEGER) AS val_min,
             CAST(max((i * (1 + d % 13) + 5*s) % 509 - 254) AS INTEGER) AS val_max
      FROM media,
           LATERAL unnest(generate_series(0, 64 + (d % 16) * 8 - 1)) ti(i)
      WHERE media.kind = 'audio' GROUP BY d, s
    ), vid AS (
      SELECT d, s, 'video' AS kind, CAST((2 + d % 4) * 64 AS BIGINT) AS n_values,
             CAST(sum((x + 3*y + d + 7*s + 11*f) % 256) AS BIGINT) AS val_sum,
             CAST(min((x + 3*y + d + 7*s + 11*f) % 256) AS INTEGER) AS val_min,
             CAST(max((x + 3*y + d + 7*s + 11*f) % 256) AS INTEGER) AS val_max
      FROM media,
           LATERAL unnest(generate_series(0, 2 + d % 4 - 1)) tf(f),
           LATERAL unnest(generate_series(0, 7)) tx(x),
           LATERAL unnest(generate_series(0, 7)) ty(y)
      WHERE media.kind = 'video' GROUP BY d, s
    ), allk AS (
      SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid
    )
    SELECT 'doc-' || lpad(CAST(d AS VARCHAR), 9, '0') AS doc_id,
           CAST(s AS INTEGER) AS span_idx, kind, n_values, val_sum,
           val_min, val_max
    FROM allk
    """


def q_media_decode(sf_dir):
    """Multimodal with REAL codecs: fetch generates genuine PNG / WAV /
    RWV(PNG-frame) payloads, decode runs the pure-numpy spec codecs
    (lib_gdal_ray/codecs — GDAL frmts/png,bmp analog), stats computed
    from the decoded pixels/samples."""
    import pyarrow.parquet as pq

    from ..sources.synth import interleaved_docs
    from ..stages.media import media_decode_stats

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = media_decode_stats(interleaved_docs(n))
    return out.select_columns(["doc_id", "span_idx", "kind", "n_values",
                               "val_sum", "val_min", "val_max"])


def sql_media_resize():
    """Nearest-neighbor resize has a closed pixel-center form:
    src = floor((t + 0.5) * src_dim / 4). The Ray side PNG-encodes the
    resized image and decodes it AGAIN, so this oracle pins two full
    encoder round-trips plus the resize indexing."""
    return _SQL_MEDIA_SPANS + """
    , img AS (
      SELECT d, s, 8 + d % 8 AS w, 8 + (d + s) % 5 AS h
      FROM media WHERE kind = 'image'
    ), px AS (
      SELECT d, s,
        (CAST(floor((tx.x + 0.5) * w / 4.0) AS BIGINT)
         + 3 * CAST(floor((ty.y + 0.5) * h / 4.0) AS BIGINT)
         + d + 7*s) % 256 AS v
      FROM img, LATERAL unnest(generate_series(0, 3)) tx(x),
                LATERAL unnest(generate_series(0, 3)) ty(y)
    )
    SELECT 'doc-' || lpad(CAST(d AS VARCHAR), 9, '0') AS doc_id,
           CAST(s AS INTEGER) AS span_idx,
           CAST(16 AS BIGINT) AS n_values,
           CAST(sum(v) AS BIGINT) AS val_sum,
           CAST(min(v) AS INTEGER) AS val_min,
           CAST(max(v) AS INTEGER) AS val_max
    FROM px GROUP BY d, s
    """


def q_media_resize(sf_dir):
    """Image spans through the real resize path: PNG decode → 4×4
    nearest resize → PNG re-encode → second decode → stats."""
    import pyarrow.parquet as pq

    from ..sources.synth import interleaved_docs
    from ..stages.media import media_resize_stats

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = media_resize_stats(interleaved_docs(n), target_w=4, target_h=4)
    return out.select_columns(["doc_id", "span_idx", "n_values",
                               "val_sum", "val_min", "val_max"])


def q_audio_features(sf_dir):
    """Real DSP over really-decoded WAV spans: integer-exact energy
    (sum of squares) and zero-crossing count, both mirrored closed-form
    in SQL over the synthetic wave; the rfft spectral centroid is
    pytest-pinned (tests/test_codecs.py) and excluded here."""
    import pyarrow.parquet as pq

    from ..sources.synth import interleaved_docs
    from ..stages.media import media_dsp_features

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = media_dsp_features(interleaved_docs(n), "audio")
    return out.select_columns(["doc_id", "span_idx", "energy",
                               "zero_crossings"])


def sql_audio_features():
    return _SQL_MEDIA_SPANS + """
    , aud AS (SELECT d, s, 64 + (d % 16) * 8 AS n
              FROM media WHERE kind = 'audio'),
    v AS (SELECT d, s, i.i,
          (i.i * (1 + d % 13) + 5*s) % 509 - 254 AS v
          FROM aud, LATERAL unnest(generate_series(0, n - 1)) i(i)),
    sgn AS (SELECT d, s, i, v,
            CASE WHEN v >= 0 THEN 1 ELSE -1 END AS sg FROM v),
    lagged AS (SELECT d, s, v, sg,
               lag(sg) OVER (PARTITION BY d, s ORDER BY i) AS prev_sg
               FROM sgn)
    SELECT 'doc-' || lpad(CAST(d AS VARCHAR), 9, '0') AS doc_id,
           CAST(s AS INTEGER) AS span_idx,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(sum(CASE WHEN prev_sg IS NOT NULL AND sg <> prev_sg
                THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM lagged GROUP BY d, s
    """


def q_image_features(sf_dir):
    """Image-quality statistics over really-decoded PNG spans:
    integer-exact pixel moments + horizontal edge count (threshold 32),
    SQL-mirrored; the Sobel gradient mean is pytest-pinned."""
    import pyarrow.parquet as pq

    from ..sources.synth import interleaved_docs
    from ..stages.media import media_dsp_features

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = media_dsp_features(interleaved_docs(n), "image")
    return out.select_columns(["doc_id", "span_idx", "pixel_sum",
                               "pixel_sq_sum", "edge_count"])


def sql_image_features():
    return _SQL_MEDIA_SPANS + """
    , img AS (SELECT d, s, 8 + d % 8 AS w, 8 + (d + s) % 5 AS h
              FROM media WHERE kind = 'image'),
    px AS (SELECT d, s, w, x.x, y.y,
           (x.x + 3*y.y + d + 7*s) % 256 AS v
           FROM img, LATERAL unnest(generate_series(0, w - 1)) x(x),
                     LATERAL unnest(generate_series(0, h - 1)) y(y))
    SELECT 'doc-' || lpad(CAST(d AS VARCHAR), 9, '0') AS doc_id,
           CAST(s AS INTEGER) AS span_idx,
           CAST(sum(v) AS BIGINT) AS pixel_sum,
           CAST(sum(v * v) AS BIGINT) AS pixel_sq_sum,
           CAST(sum(CASE WHEN x < w - 1 AND
                abs(((x + 1 + 3*y + d + 7*s) % 256) - v) > 32
                THEN 1 ELSE 0 END) AS BIGINT) AS edge_count
    FROM px GROUP BY d, s
    """


def q_embedding_near_dup(sf_dir):
    """Banded multi-table hyperplane LSH near-dup pairs, emitted with
    integer-cents similarities. SQL-checkable at oracle scale: the
    hyperplanes embed as literals, sign margins (min |projection|
    2.3e-5) and threshold/cents margins (2.9e-5 / 3.2e-6) dwarf float
    drift, and bucket truncation is inactive (max bucket 54 < 128)."""
    ds = tables.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    emb = tables.read_table_arrow(sf_dir, "embeddings", columns=["embedding"])
    dim = len(emb["embedding"][0])
    out = ann_mod.embedding_near_dup_pairs(ds, dim, threshold=0.35, nbits=4,
                                           tables=8, max_bucket=128)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "sim_c": pa.array(_cents(
                batch["cosine_sim"].to_numpy(zero_copy_only=False))),
        })

    return out.map_batches(f, batch_format="pyarrow")


def sql_embedding_near_dup():
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, 64, 4))
    code_exprs = []
    for t in range(8):
        bits = []
        for bbit in range(4):
            vec = "[" + ", ".join(repr(float(v)) for v in planes[t, :, bbit]) + "]"
            bits.append(f"(CASE WHEN list_dot_product(e, {vec}) > 0 "
                        f"THEN {1 << bbit} ELSE 0 END)")
        code_exprs.append(f"{' + '.join(bits)} AS code_{t}")
    codes = ",\n        ".join(code_exprs)
    per_table = " UNION ALL ".join(
        f"SELECT vec_id, e, {t} AS tbl, code_{t} AS code FROM coded"
        for t in range(8))
    return f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), coded AS (
      SELECT vec_id, e,
        {codes}
      FROM base
    ), rows_ AS (
      {per_table}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) AS cos
      FROM rows_ a JOIN rows_ b
        ON a.tbl = b.tbl AND a.code = b.code AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           CAST(floor(cos * 100 + 0.5) AS BIGINT) AS sim_c
    FROM cand WHERE cos >= 0.35
    """


def q_delaunay_mesh(sf_dir):
    """DelaunayTriangulation end-to-end (`ogr/ogrgeometry.cpp:4374`):
    one parabola point set per part key — strictly convex position, so
    ANY valid triangulation has exactly m-2 triangles whose areas sum to
    the hull's shoelace area, closed form (m-2)(m-1)m/6 (integer).
    Emits triangle count + mesh area in cents."""
    part = tables.read_table_arrow(sf_dir, "part", columns=["p_partkey"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    pk = pk[pk <= 400]
    geoms = []
    for p in pk:
        m = 4 + int(p % 13)
        cx = float((p * 37) % 340 - 170)
        cy = float((p * 53) % 160 - 80)
        i = np.arange(m, dtype=np.float64)
        geoms.append(wkb_mod.multipoint_to_wkb(
            np.stack([i + cx, i * i + cy], axis=1)))
    ds = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array(pk),
        "geometry": pa.array(geoms, type=pa.binary())})).repartition(8)
    mesh = geom_ops.delaunay_geometry(ds)

    def f(batch: pa.Table) -> pa.Table:
        from ..geom.triangulate import _signed_area
        nt, ac = [], []
        for b in batch["geometry"].to_numpy(zero_copy_only=False):
            _kind, members = wkb_mod.parse_wkb(b)
            nt.append(len(members))
            ac.append(sum(abs(_signed_area(rings[0]))
                          for _k, rings in members))
        return pa.table({
            "p_partkey": batch["p_partkey"],
            "n_triangles": pa.array(np.asarray(nt, np.int64)),
            "mesh_area_c": pa.array(_cents(np.asarray(ac)))})

    return mesh.map_batches(f, batch_format="pyarrow")


SQL_DELAUNAY_MESH = """
SELECT p_partkey,
       CAST(2 + p_partkey % 13 AS BIGINT) AS n_triangles,
       CAST((2 + p_partkey % 13) * (3 + p_partkey % 13)
            * (4 + p_partkey % 13) * 100 / 6 AS BIGINT) AS mesh_area_c
FROM part WHERE p_partkey <= 400
"""


def q_concave_hull(sf_dir):
    """ConcaveHull end-to-end (OGR_G_ConcaveHull / GEOS
    concaveHullByLengthRatio; chi-shape erosion): a 3-row unit grid with
    the top-middle point removed. Triangulation edge lengths are 1, √2
    and 2 (the notch-spanning hull edge); ratio 0.5 puts the erosion
    threshold at 1.5, so exactly the one notch triangle (area 1) erodes
    and the hull area is 2(m-1)-1. ratio=1 keeps the convex hull,
    area 2(m-1)."""
    part = tables.read_table_arrow(sf_dir, "part", columns=["p_partkey"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    pk = pk[pk <= 300]

    def notched_grid(p: int) -> np.ndarray:
        m = 9 + 2 * int(p % 8)
        mid = (m - 1) // 2
        cx = float((p * 37) % 340 - 170)
        cy = float((p * 53) % 160 - 80)
        return np.asarray([(x + cx, y + cy) for y in range(3)
                           for x in range(m) if not (x == mid and y == 2)],
                          dtype=np.float64)

    geoms = [wkb_mod.multipoint_to_wkb(notched_grid(p)) for p in pk]
    ds = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array(pk),
        "geometry": pa.array(geoms, type=pa.binary())})).repartition(8)
    concave = geom_ops.concave_hull_geometry(ds, ratio=0.5)

    def g(batch: pa.Table) -> pa.Table:
        from ..geom.triangulate import _signed_area
        from ..geom.unary import concave_hull_wkb
        keys = batch["p_partkey"].to_numpy()
        areas, cvx = [], []
        for b, p in zip(batch["geometry"].to_numpy(zero_copy_only=False), keys):
            _k, rings = wkb_mod.parse_wkb(b)
            areas.append(abs(_signed_area(rings[0])))
            # convex-case (ratio=1) column: re-derive the point set from
            # the key (row-aligned zip across repartition isn't
            # guaranteed, so don't carry the raw column through)
            _k2, rings2 = wkb_mod.parse_wkb(concave_hull_wkb(
                wkb_mod.multipoint_to_wkb(notched_grid(int(p))), ratio=1.0))
            cvx.append(abs(_signed_area(rings2[0])))
        return pa.table({
            "p_partkey": batch["p_partkey"],
            "hull_area_c": pa.array(_cents(np.asarray(areas))),
            "convex_area_c": pa.array(_cents(np.asarray(cvx)))})

    return concave.map_batches(g, batch_format="pyarrow")


SQL_CONCAVE_HULL = """
SELECT p_partkey,
       CAST((15 + 4 * (p_partkey % 8)) * 100 AS BIGINT) AS hull_area_c,
       CAST((16 + 4 * (p_partkey % 8)) * 100 AS BIGINT) AS convex_area_c
FROM part WHERE p_partkey <= 300
"""


def q_wrap_dateline(sf_dir):
    """WRAPDATELINE end-to-end (`ogr/ogrgeometryfactory.cpp`
    transformWithOptions): per part key a box either crossing the
    antimeridian (lon in [180-a, 180] ∪ [-180, -180+b], stored as a
    jump-crossing ring) or a plain box [-a, b] — both width a+b. The
    crossing box splits into 2 parts with max lon exactly 180; the
    plain box passes through with max lon b."""
    part = tables.read_table_arrow(sf_dir, "part", columns=["p_partkey"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    pk = pk[pk <= 400]
    geoms = []
    for p in pk:
        a = 1 + int(p % 7)
        b = 1 + int((p * 3) % 5)
        h = 1 + int(p % 4)
        y0 = float((p * 53) % 160 - 80)
        if p % 3 != 0:
            ring = np.asarray([[180.0 - a, y0], [-180.0 + b, y0],
                               [-180.0 + b, y0 + h], [180.0 - a, y0 + h],
                               [180.0 - a, y0]], dtype=np.float64)
        else:
            ring = np.asarray([[-float(a), y0], [float(b), y0],
                               [float(b), y0 + h], [-float(a), y0 + h],
                               [-float(a), y0]], dtype=np.float64)
        geoms.append(wkb_mod.polygon_to_wkb([ring]))
    ds = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array(pk),
        "geometry": pa.array(geoms, type=pa.binary())})).repartition(8)
    wrapped = geom_ops.wrap_dateline_geometry(ds, offset=10.0)

    def f(batch: pa.Table) -> pa.Table:
        from ..geom.triangulate import _signed_area
        nparts, areas, maxlon = [], [], []
        for b in batch["geometry"].to_numpy(zero_copy_only=False):
            kind, payload = wkb_mod.parse_wkb(b)
            polys = [payload] if kind == "polygon" else payload
            nparts.append(len(polys))
            areas.append(sum(abs(_signed_area(rings[0])) for rings in polys))
            maxlon.append(max(float(rings[0][:, 0].max()) for rings in polys))
        return pa.table({
            "p_partkey": batch["p_partkey"],
            "n_parts": pa.array(np.asarray(nparts, np.int64)),
            "total_area_c": pa.array(_cents(np.asarray(areas))),
            "max_lon_c": pa.array(_cents(np.asarray(maxlon)))})

    return wrapped.map_batches(f, batch_format="pyarrow")


SQL_WRAP_DATELINE = """
SELECT p_partkey,
       CAST(CASE WHEN p_partkey % 3 <> 0 THEN 2 ELSE 1 END AS BIGINT) AS n_parts,
       CAST(((1 + p_partkey % 7) + (1 + (p_partkey * 3) % 5))
            * (1 + p_partkey % 4) * 100 AS BIGINT) AS total_area_c,
       CAST(CASE WHEN p_partkey % 3 <> 0 THEN 18000
                 ELSE (1 + (p_partkey * 3) % 5) * 100 END AS BIGINT) AS max_lon_c
FROM part WHERE p_partkey <= 400
"""


def q_check_coverage(sf_dir):
    """check-coverage end-to-end (`apps/gdalalg_vector_check_coverage.cpp:36`):
    a row of boxes per run of 8 part keys where even-position boxes are
    extended 2 units east to overlap their successor — the overlapping
    pairs and exact overlap areas (2 × h, h=2) are closed-form."""
    from .coverage import check_coverage

    part = tables.read_table_arrow(sf_dir, "part", columns=["p_partkey"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    pk = pk[pk <= 400]
    j = pk % 8
    r = pk // 8
    x0 = 10.0 * j
    x1 = x0 + 10.0 + np.where(j % 2 == 0, 2.0, 0.0)
    y0 = -88.0 + r * 3.5
    geoms = [wkb_mod.polygon_to_wkb([np.asarray(
        [[a, b], [c, b], [c, d], [a, d], [a, b]], dtype=np.float64)])
        for a, b, c, d in zip(x0, y0, x1, y0 + 2.0)]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(pk),
        "geometry": pa.array(geoms, type=pa.binary())})).repartition(8)
    pairs = check_coverage(ds, res=50.0)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "overlap_area_c": pa.array(_cents(
                batch["overlap_area"].to_numpy(zero_copy_only=False)))})

    return pairs.map_batches(f, batch_format="pyarrow")


SQL_CHECK_COVERAGE = """
SELECT a.p_partkey AS id_a,
       CAST(a.p_partkey + 1 AS BIGINT) AS id_b,
       CAST(400 AS BIGINT) AS overlap_area_c
FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
WHERE a.p_partkey <= 400 AND b.p_partkey <= 400
  AND (a.p_partkey % 8) % 2 = 0 AND (a.p_partkey % 8) < 7
"""


def q_clean_coverage(sf_dir):
    """clean-coverage end-to-end
    (`apps/gdalalg_vector_clean_coverage.cpp:36-48`, merge-strategy
    min-index): same overlapping box rows as check_coverage; the lower
    key keeps the overlap strip, so cleaned areas are 24 (even
    positions) or 16 (odd positions; part keys are contiguous from 0,
    so every odd position has an even predecessor) — closed form."""
    from ray.data.aggregate import Sum

    from .coverage import clean_coverage

    part = tables.read_table_arrow(sf_dir, "part", columns=["p_partkey"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    pk = pk[pk <= 400]
    j = pk % 8
    r = pk // 8
    x0 = 10.0 * j
    x1 = x0 + 10.0 + np.where(j % 2 == 0, 2.0, 0.0)
    y0 = -88.0 + r * 3.5
    geoms = [wkb_mod.polygon_to_wkb([np.asarray(
        [[a, b], [c, b], [c, d], [a, d], [a, b]], dtype=np.float64)])
        for a, b, c, d in zip(x0, y0, x1, y0 + 2.0)]
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(pk),
        "geometry": pa.array(geoms, type=pa.binary())})).repartition(8)
    frags = clean_coverage(ds, res=50.0)
    tot = frags.groupby("id").aggregate(Sum("fragment_area", alias_name="a"))

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": batch["id"],
            "clean_area_c": pa.array(_cents(
                batch["a"].to_numpy(zero_copy_only=False)))})

    return tot.map_batches(f, batch_format="pyarrow")


SQL_CLEAN_COVERAGE = """
SELECT p_partkey AS id,
       CAST(CASE WHEN (p_partkey % 8) % 2 = 0 THEN 2400
                 ELSE 1600 END AS BIGINT) AS clean_area_c
FROM part WHERE p_partkey <= 400
"""


def q_simplify_coverage(sf_dir):
    """simplify-coverage end-to-end
    (`apps/gdalalg_vector_simplify_coverage.cpp:36`): runs of 8
    rectangles sharing vertical edges that carry a 0.3-amplitude zigzag
    midpoint; midpoints sit ONLY on shared edges (an unshared-edge
    midpoint would be a chain-interior farthest point that DP keeps —
    GEOS ring-edge semantics), so tol=1 removes every midpoint
    identically on both owners, leaving exact 10 × h rectangles
    (h = 8 + (run % 3)), 5-vertex rings — closed form."""
    from .coverage import simplify_coverage

    part = tables.read_table_arrow(sf_dir, "part", columns=["p_partkey"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    pk = pk[pk <= 300]
    pmax = int(pk.max())
    geoms = []
    for p in pk:
        j = int(p % 8)
        r = int(p // 8)
        h = 8.0 + (r % 3)
        xb = (r // 14) * 100.0 - 170.0 + 10.0 * j
        yb = (r % 14) * 12.5 - 87.5
        midy = yb + h / 2.0
        ring = [[xb, yb], [xb + 10.0, yb]]
        if j < 7 and p < pmax:  # zigzag midpoint on the shared right edge
            ring.append([xb + 10.0 + 0.3, midy])
        ring += [[xb + 10.0, yb + h], [xb, yb + h]]
        if j > 0:  # zigzag midpoint on the shared left edge
            ring.append([xb + 0.3, midy])
        ring.append([xb, yb])
        geoms.append(wkb_mod.polygon_to_wkb(
            [np.asarray(ring, dtype=np.float64)]))
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(pk),
        "geometry": pa.array(geoms, type=pa.binary())})).repartition(8)
    simp = simplify_coverage(ds, tol=1.0)

    def f(batch: pa.Table) -> pa.Table:
        from ..geom.triangulate import _signed_area
        areas, nv = [], []
        for b in batch["geometry"].to_numpy(zero_copy_only=False):
            _k, rings = wkb_mod.parse_wkb(b)
            areas.append(abs(_signed_area(rings[0])))
            nv.append(len(rings[0]))
        return pa.table({
            "id": batch["id"],
            "area_c": pa.array(_cents(np.asarray(areas))),
            "n_verts": pa.array(np.asarray(nv, np.int64))})

    return simp.map_batches(f, batch_format="pyarrow")


SQL_SIMPLIFY_COVERAGE = """
SELECT p_partkey AS id,
       CAST((8 + ((p_partkey // 8) % 3)) * 1000 AS BIGINT) AS area_c,
       CAST(5 AS BIGINT) AS n_verts
FROM part WHERE p_partkey <= 300
"""


def q_grid_metrics(sf_dir):
    """gdal_grid data metrics + nearest (`alg/gdalgrid.cpp:879,966-1507`)
    over a 64×64 z3 pixel window: count / min / max / range / average /
    nearest / average-distance / average-pairwise-distance of supplier
    sites within a 40-degree search radius; < 1 site -> nodata (row
    drops). Cents-exact where the value is a 2-dp decimal, round(3)
    where a float divide is involved (same parity technique as
    grid_idw)."""
    from .gridding import grid_metrics, pixel_window

    sup = tables.read_table_arrow(
        sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"])
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    order = np.argsort(sk, kind="stable")
    slon, slat = derive.site_lonlat(sk[order])
    sv = sup["s_acctbal"].to_numpy().astype(np.float64)[order]
    px = pixel_window(3, 300, 1300, 64, 64)
    # value_scale/dist_scale: fixed-point accumulation so every summed
    # metric is order-independent (integer-exact sums) — round(3)
    # outputs must not wobble with batch splits or SQL GROUP BY order.
    out = grid_metrics(
        px, slon, slat, sv, 3, radius=40.0, min_points=1,
        metrics=["count", "minimum", "maximum", "range", "average",
                 "nearest", "average_distance", "average_distance_pts"],
        value_scale=100, dist_scale=10**6)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "gpx": batch["gpx"], "gpy": batch["gpy"],
            "n_sites": batch["count"],
            "min_c": pa.array(_cents(
                batch["minimum"].to_numpy(zero_copy_only=False))),
            "max_c": pa.array(_cents(
                batch["maximum"].to_numpy(zero_copy_only=False))),
            "range_c": pa.array(_cents(
                batch["range"].to_numpy(zero_copy_only=False))),
            "nearest_c": pa.array(_cents(
                batch["nearest"].to_numpy(zero_copy_only=False))),
            "avg_r": pc.round(batch["average"], ndigits=3),
            "avgdist_r": pc.round(batch["average_distance"], ndigits=3),
            "avgpts_r": pc.round(batch["average_distance_pts"], ndigits=3),
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_GRID_METRICS = f"""
WITH px AS (SELECT (300 + (i % 64)) AS gpx, (1300 + i // 64) AS gpy
            FROM range(0, 4096) t(i)),
pc2 AS (SELECT gpx, gpy,
        (gpx + 0.5) / 2048 * 360.0 - 180.0 AS lon,
        degrees(2*atan(exp(pi()*(1.0 - 2.0*(gpy + 0.5)/2048))) - pi()/2) AS lat
        FROM px),
s AS (SELECT s_suppkey AS sk, {derive.SQL_SITE_LON} AS slon,
             {derive.SQL_SITE_LAT} AS slat, s_acctbal AS v FROM supplier),
w AS (SELECT gpx, gpy, sk, slon, slat, v,
             (lon-slon)*(lon-slon) + (lat-slat)*(lat-slat) AS d2,
             row_number() OVER (
               PARTITION BY gpx, gpy
               ORDER BY (lon-slon)*(lon-slon) + (lat-slat)*(lat-slat), sk)
               AS rn
      FROM pc2, s
      WHERE (lon-slon)*(lon-slon) + (lat-slat)*(lat-slat) <= 1600.0),
agg AS (SELECT gpx, gpy, count(*) AS n_sites,
               CAST(floor(min(v)*100.0 + 0.5) AS BIGINT) AS min_c,
               CAST(floor(max(v)*100.0 + 0.5) AS BIGINT) AS max_c,
               CAST(floor((max(v)-min(v))*100.0 + 0.5) AS BIGINT) AS range_c,
               round(sum(CAST(floor(v*100.0 + 0.5) AS BIGINT))
                     / 100.0 / count(*), 3) AS avg_r,
               round(sum(CAST(floor(sqrt(d2)*1000000.0 + 0.5) AS BIGINT))
                     / 1000000.0 / count(*), 3) AS avgdist_r
        FROM w GROUP BY gpx, gpy),
nr AS (SELECT gpx, gpy,
              CAST(floor(v*100.0 + 0.5) AS BIGINT) AS nearest_c
       FROM w WHERE rn = 1),
pr AS (SELECT a.gpx AS gpx, a.gpy AS gpy,
              sum(CAST(floor(sqrt((a.slon-b.slon)*(a.slon-b.slon)
                                  + (a.slat-b.slat)*(a.slat-b.slat))
                             * 1000000.0 + 0.5) AS BIGINT)) AS psum,
              count(*) AS pn
       FROM w a JOIN w b ON a.gpx = b.gpx AND a.gpy = b.gpy
                         AND a.sk <> b.sk
       GROUP BY a.gpx, a.gpy)
SELECT agg.gpx, agg.gpy, n_sites, min_c, max_c, range_c, nearest_c,
       avg_r, avgdist_r,
       round(coalesce(pr.psum / 1000000.0 / pr.pn, 0.0), 3) AS avgpts_r
FROM agg
JOIN nr ON nr.gpx = agg.gpx AND nr.gpy = agg.gpy
LEFT JOIN pr ON pr.gpx = agg.gpx AND pr.gpy = agg.gpy
"""


def q_grid_invdistnn(sf_dir):
    """gdal_grid invdistnn with per-quadrant selection
    (`alg/gdalgrid.cpp:629-753`): power-2 IDW over the ≤3 nearest
    in-radius sites per quadrant around each node; a node with an
    empty quadrant is nodata (row drops). Sites are event points with
    a fast-wrapping lon multiplier and a quadratic lat hash (two
    *linear* congruential streams form a sparse 2-D lattice whose
    voids empty whole quadrants; the supplier site curve is even
    worse, pre-wrap linear at small sf); an 8-degree radius leaves
    some nodes short a quadrant, exercising the nodata path."""
    from .gridding import grid_invdistnn, pixel_window

    ev = tables.read_table_arrow(sf_dir, "events", columns=["event_id"])
    eid = ev["event_id"].to_numpy().astype(np.int64)
    eid = np.sort(eid[eid <= 3000])
    slon = ((eid * 999983) % 36_000_000) / 1e5 - 180.0
    slat = ((eid * eid * 7919 + eid * 104729) % 17_000_000) / 1e5 - 85.0
    sv = (eid % 1000).astype(np.float64)
    px = pixel_window(3, 300, 1300, 64, 64)
    out = grid_invdistnn(px, slon, slat, sv, 3, power=2.0, radius=8.0,
                         max_per_quadrant=3, min_per_quadrant=1)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "gpx": batch["gpx"], "gpy": batch["gpy"],
            "idwnn": pc.round(batch["burn"], ndigits=3),
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_GRID_INVDISTNN = f"""
WITH px AS (SELECT (300 + (i % 64)) AS gpx, (1300 + i // 64) AS gpy
            FROM range(0, 4096) t(i)),
pc2 AS (SELECT gpx, gpy,
        (gpx + 0.5) / 2048 * 360.0 - 180.0 AS lon,
        degrees(2*atan(exp(pi()*(1.0 - 2.0*(gpy + 0.5)/2048))) - pi()/2) AS lat
        FROM px),
s AS (SELECT event_id AS sk,
             ((event_id * 999983) % 36000000) / 100000.0 - 180.0 AS slon,
             ((event_id * event_id * 7919 + event_id * 104729)
              % 17000000) / 100000.0 - 85.0 AS slat,
             CAST(event_id % 1000 AS DOUBLE) AS v
      FROM events WHERE event_id <= 3000),
j AS (SELECT gpx, gpy, sk, v,
             (lon-slon)*(lon-slon) + (lat-slat)*(lat-slat) AS d2,
             (CASE WHEN slon > lon THEN 1 ELSE 0 END
              + CASE WHEN slat > lat THEN 2 ELSE 0 END) AS quad
      FROM pc2, s
      WHERE (lon-slon)*(lon-slon) + (lat-slat)*(lat-slat) <= 64.0),
r AS (SELECT *, row_number() OVER (
        PARTITION BY gpx, gpy, quad ORDER BY d2, sk) AS rn FROM j),
full4 AS (SELECT gpx, gpy FROM j GROUP BY gpx, gpy
          HAVING count(DISTINCT quad) = 4)
SELECT r.gpx, r.gpy,
       round(sum(v / (d2 + 1e-12)) / sum(1.0 / (d2 + 1e-12)), 3) AS idwnn
FROM r JOIN full4 ON full4.gpx = r.gpx AND full4.gpy = r.gpy
WHERE rn <= 3
GROUP BY r.gpx, r.gpy
"""


def q_gopher_repetition(sf_dir):
    """Gopher-style repetition quality filter (Rae et al. 2021 A1.1)
    over the documents table: per-doc word n-gram counts — most-common
    2-/3-gram occurrences, duplicate-5-gram occurrences — plus the
    integer-exact keep flag (top2<=0.20, top3<=0.18, dup5<=0.30).
    All counts are integers, so the oracle is bit-exact."""
    from .repetition import repetition_stats

    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return repetition_stats(docs)


SQL_GOPHER_REPETITION = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
base AS (SELECT doc_id, len(arr) AS n_tok FROM toks),
g2i AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr)-1)) AS i FROM toks),
c2 AS (SELECT doc_id, array_to_string(list_slice(arr, i, i+1), ' ') AS g,
              count(*) AS c
       FROM g2i GROUP BY doc_id, g),
s2 AS (SELECT doc_id, max(c) AS top2_cnt, sum(c) AS n2 FROM c2 GROUP BY doc_id),
g3i AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr)-2)) AS i FROM toks),
c3 AS (SELECT doc_id, array_to_string(list_slice(arr, i, i+2), ' ') AS g,
              count(*) AS c
       FROM g3i GROUP BY doc_id, g),
s3 AS (SELECT doc_id, max(c) AS top3_cnt, sum(c) AS n3 FROM c3 GROUP BY doc_id),
g5i AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr)-4)) AS i FROM toks),
c5 AS (SELECT doc_id, array_to_string(list_slice(arr, i, i+4), ' ') AS g,
              count(*) AS c
       FROM g5i GROUP BY doc_id, g),
s5 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup5_cnt,
              sum(c) AS n5
       FROM c5 GROUP BY doc_id)
SELECT base.doc_id, n_tok,
       CAST(coalesce(n2, 0) AS BIGINT) AS n2,
       CAST(coalesce(top2_cnt, 0) AS BIGINT) AS top2_cnt,
       CAST(coalesce(n3, 0) AS BIGINT) AS n3,
       CAST(coalesce(top3_cnt, 0) AS BIGINT) AS top3_cnt,
       CAST(coalesce(n5, 0) AS BIGINT) AS n5,
       CAST(coalesce(dup5_cnt, 0) AS BIGINT) AS dup5_cnt,
       CASE WHEN coalesce(top2_cnt, 0) * 5 <= coalesce(n2, 0) * 1
             AND coalesce(top3_cnt, 0) * 50 <= coalesce(n3, 0) * 9
             AND coalesce(dup5_cnt, 0) * 10 <= coalesce(n5, 0) * 3
            THEN CAST(1 AS BIGINT) ELSE 0 END AS keep
FROM base
LEFT JOIN s2 USING (doc_id)
LEFT JOIN s3 USING (doc_id)
LEFT JOIN s5 USING (doc_id)
"""


def q_decontaminate(sf_dir):
    """Train/test n-gram decontamination: docs with doc_id % 23 == 0
    form the held-out test split; every other doc is flagged if it
    shares any word 4-gram with the test set. The test gram set is
    broadcast (ray.put once) — the train side streams with no
    shuffle."""
    from .repetition import decontaminate

    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def split(want_test):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 23 == 0) if want_test else (ids % 23 != 0)
            return batch.filter(pa.array(m))
        return f

    test = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    return decontaminate(train, test, n=4)


SQL_DECONTAMINATE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
gi AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr)-3)) AS i FROM toks),
g AS (SELECT doc_id, array_to_string(list_slice(arr, i, i+3), ' ') AS g FROM gi),
test AS (SELECT DISTINCT g FROM g WHERE doc_id % 23 = 0),
hits AS (SELECT t.doc_id, count(te.g) AS n_hit
         FROM (SELECT doc_id, g FROM g WHERE doc_id % 23 <> 0) t
         LEFT JOIN test te USING (g) GROUP BY t.doc_id)
SELECT d.doc_id, coalesce(h.n_hit, 0) AS n_hit,
       CAST(CASE WHEN coalesce(h.n_hit, 0) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 23 <> 0) d
LEFT JOIN hits h USING (doc_id)
"""


def q_pack_sequences(sf_dir):
    """Sequence packing (concatenate-and-chop, GPT-style pre-training
    layout): documents hash into 64 shards (Knuth multiplicative),
    each shard packs its docs in id order into 2048-token sequences;
    per-doc placement (offset, first/last sequence, piece count) is an
    exclusive prefix sum — exactly mirrored by a SQL window frame."""
    from .packing import pack_sequences

    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(docs, seq_len=2048)


SQL_PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id,
         CAST(length(text) - length(replace(text, ' ', '')) + 1
              AS BIGINT) AS n_tokens,
         CAST(((doc_id * 2654435761) % 4294967296) % 64 AS BIGINT) AS shard
  FROM documents),
c AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS start_off
  FROM t)
SELECT doc_id, shard, n_tokens,
       CAST(start_off AS BIGINT) AS start_off,
       CAST(start_off // 2048 AS BIGINT) AS first_seq,
       CAST((start_off + n_tokens - 1) // 2048 AS BIGINT) AS last_seq,
       CAST((start_off + n_tokens - 1) // 2048 - start_off // 2048 + 1
            AS BIGINT) AS n_pieces
FROM c
"""


def q_asof_attribution(sf_dir):
    """As-of join (the classic attribution query): each click event
    joins the SAME user's latest view event at-or-before its timestamp
    (backward inclusive). Bounded key-hash buckets → one union shuffle
    → vectorized merge_asof per bucket (`windows.asof_join`); oracle is
    DuckDB's native ASOF LEFT JOIN. Unmatched clicks keep sentinel
    (-1 / epoch) so the value hash covers the left-join rows too."""
    from .windows import asof_join

    ev = tables.read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    clicks = ev.filter(expr="event_type == 'click'").drop_columns(["event_type"])
    views = ev.filter(expr="event_type == 'view'").drop_columns(["event_type"])
    out = asof_join(clicks, views, "user_id", "ts",
                    right_cols=["event_id"], right_suffix="_view")

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "view_event_id": pc.fill_null(
                pc.cast(batch["event_id_view"], pa.int64()), -1),
            "view_ts": pc.fill_null(
                pc.cast(batch["ts_view"], pa.timestamp("us")),
                pa.scalar(0, pa.timestamp("us"))),
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_ASOF_ATTRIBUTION = """
SELECT l.event_id, l.user_id, l.ts,
       COALESCE(r.event_id, -1) AS view_event_id,
       COALESCE(r.ts, TIMESTAMP '1970-01-01') AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_token_budget_mix(sf_dir):
    """Corpus mixing by token budget: weights {src0: .5, src1: .3,
    src7: .2} over a 2000-token target → per-source caps 1000/600/400;
    docs taken in id order while the running token total fits the cap
    (per-source cumulative window, exactly mirrored in SQL)."""
    from .sampling import token_budget_mix

    docs = tables.read_table(
        sf_dir, "documents", columns=["doc_id", "source", "text"])
    return token_budget_mix(
        docs, {"src0": 0.5, "src1": 0.3, "src7": 0.2}, 2000)


SQL_TOKEN_BUDGET_MIX = """
WITH t AS (
  SELECT doc_id, source,
         CAST(length(text) - length(replace(text, ' ', '')) + 1
              AS BIGINT) AS n_tokens,
         CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 600
                     ELSE 400 END AS cap
  FROM documents WHERE source IN ('src0', 'src1', 'src7')),
c AS (
  SELECT doc_id, source, n_tokens, cap,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM t)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= cap
"""


def q_hash_sample(sf_dir):
    """Deterministic keyed downsampling: keep the ~37% of documents
    whose Knuth-multiplicative key hash lands under the cut. Pure
    row-local integer math (no RNG, no shuffle) — identical selection
    at any cluster shape, exactly mirrored in SQL."""
    from .sampling import hash_sample

    docs = tables.read_table(
        sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])
    return hash_sample(docs, "doc_id", 37)


SQL_HASH_SAMPLE = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) % 100 < 37
"""


def q_source_quota(sf_dir):
    """Per-source quota capping (corpus mixing): keep at most 12 docs
    per source, lowest doc_id first. In-batch prune to local top-12 per
    source before the groupby shuffle, then per-group take — the
    exchange is bounded at k x sources x blocks rows."""
    from .sampling import per_group_quota

    docs = tables.read_table(
        sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return per_group_quota(docs, "source", "doc_id", 12)


SQL_SOURCE_QUOTA = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn <= 12
"""


def q_tfidf_top_terms(sf_dir):
    """Per-doc top-3 TF-IDF keywords: two-pass distributed DF build
    (in-batch partials → one tiny groupby → ray.put broadcast) then
    in-batch scoring + vectorized per-doc top-k."""
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n = docs.count()
    return text_mod.tfidf_top_terms(docs, n_docs=n, k=3)


SQL_TFIDF = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
     tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
     df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
     n AS (SELECT count(*) AS n FROM documents),
     s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  CAST(floor(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * 1e9
                             + 0.5) AS BIGINT) AS score_c
           FROM tf, df, n WHERE tf.term = df.term),
     r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY score_c DESC, term ASC) AS rnk FROM s)
SELECT doc_id, rnk AS rank, term, tf, df, score_c FROM r WHERE rnk <= 3
"""


def _sql_layers(sf_dir):
    return {t: (lambda t=t: tables.read_table(sf_dir, t))
            for t in ("region", "nation", "customer", "supplier", "part",
                      "orders", "lineitem", "events", "documents")}


def q_ogrsql_report(sf_dir):
    """OGR SQL ExecuteSQL surface (`functions/ogrsql.py`): the same
    statement string runs on the engine and (verbatim) on DuckDB —
    parser, planner, grouped aggregation, HAVING and ORDER BY all
    exercised through one SQL text."""
    from ..functions.ogrsql import execute_sql

    return execute_sql(
        "SELECT c_mktsegment, COUNT(*) AS n, "
        "COUNT(DISTINCT c_nationkey) AS nk, MIN(c_acctbal) AS min_bal, "
        "MAX(c_acctbal) AS max_bal FROM customer WHERE c_acctbal > 100 "
        "GROUP BY c_mktsegment HAVING n > 10 ORDER BY c_mktsegment",
        _sql_layers(sf_dir))


SQL_OGRSQL_REPORT = """
SELECT c_mktsegment, COUNT(*) AS n,
       COUNT(DISTINCT c_nationkey) AS nk, MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal FROM customer WHERE c_acctbal > 100
GROUP BY c_mktsegment HAVING COUNT(*) > 10 ORDER BY c_mktsegment
"""


def q_ogrsql_join_topk(sf_dir):
    """ExecuteSQL with a secondary-table LEFT JOIN + ORDER BY/LIMIT
    (ogr_gensql.cpp secondary-table join model → broadcast hash join)."""
    from ..functions.ogrsql import execute_sql

    return execute_sql(
        "SELECT n_name, COUNT(*) AS n FROM customer "
        "LEFT JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name ORDER BY n DESC, n_name ASC LIMIT 5",
        _sql_layers(sf_dir))


def q_homography_roundtrip(sf_dir):
    """Homography transformer (`alg/gdal_homography.cpp` analog,
    geom/gcp.py DLT fit): fit from 4 corners of a perspective map,
    push every event point forward then back through the distributed
    stage. The roundtrip is exact to ~1e-12, so mills-quantized
    coordinates equal the inputs (invertibility + plumbing end-to-end;
    the projective math itself is pinned exactly in test_gcp.py)."""
    from ..geom.gcp import HomographyTransformer

    H = np.array([[1.1, 0.08, 20.0], [-0.04, 0.95, -8.0],
                  [5e-5, -1e-4, 1.0]])
    px = np.array([-180.0, 180.0, -180.0, 180.0])
    py = np.array([-90.0, -90.0, 90.0, 90.0])
    w = H[2, 0] * px + H[2, 1] * py + 1.0
    gx = (H[0, 0] * px + H[0, 1] * py + H[0, 2]) / w
    gy = (H[1, 0] * px + H[1, 1] * py + H[1, 2]) / w
    t = HomographyTransformer(px, py, gx, gy)  # fit ONCE, ships tiny

    pts = events_points(sf_dir)

    def stage(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        fx, fy = t.pixel_to_geo(lon, lat)
        bx, by = t.geo_to_pixel(fx, fy)
        return pa.table({
            "event_id": batch["event_id"],
            "lon_m": pa.array(np.floor(bx * 1000 + 0.3183098861837907)
                              .astype(np.int64)),
            "lat_m": pa.array(np.floor(by * 1000 + 0.3183098861837907)
                              .astype(np.int64)),
        })

    return pts.map_batches(stage, batch_format="pyarrow")


SQL_HOMOGRAPHY_RT = f"""
SELECT event_id,
       CAST(floor(lon * 1000 + 0.3183098861837907) AS BIGINT) AS lon_m,
       CAST(floor(lat * 1000 + 0.3183098861837907) AS BIGINT) AS lat_m
FROM {_POINTS_SQL} p
"""


def q_geoloc_roundtrip(sf_dir):
    """Geolocation-array transformer (`alg/gdalgeoloc.cpp` analog,
    geom/gcp.py GeolocTransformer): smooth synthetic geoloc grid,
    event lon/lat mapped geo->pixel (backmap seed + Gauss-Newton) and
    back; deci-quantized roundtrip equals the input (forward bilinear
    + inverse convergence pinned in test_gcp.py)."""
    from ..geom.gcp import GeolocTransformer

    gj, gi = np.meshgrid(np.arange(80, dtype=float),
                         np.arange(50, dtype=float))
    lon_g = -195.0 + 5.0 * gj + 0.1 * gi + 2.0 * np.sin(gi / 9.0)
    lat_g = 96.0 - 3.9 * gi + 0.05 * gj + 1.5 * np.cos(gj / 11.0)
    t = GeolocTransformer(lon_g, lat_g)

    pts = events_points(sf_dir)

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        tt = get_or_build("geoloc_rt", lambda: t)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        fx, fy = tt.geo_to_pixel(lon, lat)
        bx, by = tt.pixel_to_geo(fx, fy)
        return pa.table({
            "event_id": batch["event_id"],
            "lon_d": pa.array(np.floor(bx * 10 + 0.3183098861837907)
                              .astype(np.int64)),
            "lat_d": pa.array(np.floor(by * 10 + 0.3183098861837907)
                              .astype(np.int64)),
        })

    return pts.map_batches(stage, batch_format="pyarrow")


SQL_GEOLOC_RT = f"""
SELECT event_id,
       CAST(floor(lon * 10 + 0.3183098861837907) AS BIGINT) AS lon_d,
       CAST(floor(lat * 10 + 0.3183098861837907) AS BIGINT) AS lat_d
FROM {_POINTS_SQL} p
"""


def q_fgb_roundtrip(sf_dir):
    """FlatGeobuf round-trip (`ogr/ogrsf_frmts/flatgeobuf/`,
    `packedrtree.h:78-105`): site points + properties written to a
    real .fgb (Hilbert-sorted features, packed R-tree index), read
    back through index-planned parallel splits, geometry parsed back
    to coordinates. f64 coords survive WKB→FGB→WKB losslessly, so the
    mirror is the derive formula itself."""
    import os

    from ..sources import flatgeobuf as FG

    st = sites_table(sf_dir)  # site_id, slon, slat
    sk = st["site_id"].to_numpy()
    lon = st["slon"].to_numpy()
    lat = st["slat"].to_numpy()
    geoms = wkb_mod.points_to_wkb(lon, lat)
    tbl = pa.table({"geometry": pa.array(list(geoms), type=pa.binary()),
                    "site_id": pa.array(sk.astype(np.int64))})
    path = f"/tmp/lib_gdal_ray_fgb_rt_{os.getpid()}.fgb"
    FG.write_flatgeobuf(ray.data.from_arrow(tbl).repartition(4), path,
                        hilbert_sort=True, index=True)
    out = FG.read_flatgeobuf(path)

    def proj(batch: pa.Table) -> pa.Table:
        bufs = batch["geometry"].to_pylist()
        c = np.asarray([wkb_mod.parse_wkb(b)[1].reshape(2)
                        for b in bufs]) if bufs else np.empty((0, 2))
        return pa.table({"site_id": batch["site_id"],
                         "slon": pa.array(c[:, 0]),
                         "slat": pa.array(c[:, 1])})

    return out.map_batches(proj, batch_format="pyarrow")


SQL_FGB_ROUNDTRIP = f"""
SELECT CAST(site_id AS BIGINT) AS site_id, slon, slat
FROM {_SITES_SQL} s
"""


def q_ogrsql_spatial(sf_dir):
    """SQLite-dialect spatial SQL functions
    (`ogrsqlitesqlfunctions.cpp:627-878`) through the ExecuteSQL
    surface: ST_Area / ST_Centroid / ST_X / ST_Y in the projection,
    ST_Intersects against an ST_GeomFromText literal in the WHERE —
    all dispatched via the shared swq function registry over the
    geom/ kernels. Zone boxes have integer coords, so shoelace area
    and weighted centroid are bit-equal to the SQL product/midpoint
    mirrors (same contract as zone_geometry)."""
    from ..functions.ogrsql import execute_sql

    zones = ray.data.from_arrow(zone_table(sf_dir))
    lit = ("POLYGON((-60.3 -35.3,60.3 -35.3,60.3 35.3,"
           "-60.3 35.3,-60.3 -35.3))")
    return execute_sql(
        "SELECT zone_id, ST_Area(geometry) AS area, "
        "ST_X(ST_Centroid(geometry)) AS cx, "
        "ST_Y(ST_Centroid(geometry)) AS cy FROM zones "
        f"WHERE ST_Intersects(geometry, ST_GeomFromText('{lit}')) "
        "ORDER BY zone_id",
        {"zones": zones})


SQL_OGRSQL_SPATIAL = f"""
SELECT CAST(zone_id AS BIGINT) AS zone_id,
       (xmax - xmin) * (ymax - ymin) AS area,
       (xmin + xmax) / 2 AS cx, (ymin + ymax) / 2 AS cy
FROM {_ZONES_SQL} z
WHERE xmin <= 60.3 AND xmax >= -60.3 AND ymin <= 35.3 AND ymax >= -35.3
ORDER BY zone_id
"""


SQL_OGRSQL_JOIN = """
SELECT n_name, COUNT(*) AS n FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n DESC, n_name ASC LIMIT 5
"""


def q_swap_xy(sf_dir):
    """make-point + swap-xy chain (gdalalg_vector_make_point /
    _swap_xy): derive lon/lat fields, build WKB points, swap axes,
    recover coordinates — lat lands in x and lon in y."""
    from ..geom import wkb as wkb_mod
    from ..stages.geom_ops import make_point, swap_xy_geometry

    pts = events_points(sf_dir)
    layer = make_point(pts, "lon", "lat")
    swapped = swap_xy_geometry(layer, "geometry")

    def coords(batch: pa.Table) -> pa.Table:
        x, y = wkb_mod.wkb_to_points(
            np.asarray(batch["geometry"].to_pylist(), dtype=object))
        return pa.table({
            "event_id": batch["event_id"],
            "x_c": pa.array(np.floor(x * 1e6 + 0.5).astype(np.int64)),
            "y_c": pa.array(np.floor(y * 1e6 + 0.5).astype(np.int64)),
        })

    return swapped.map_batches(coords, batch_format="pyarrow")


SQL_SWAP_XY = f"""
SELECT event_id,
       CAST(floor(({derive.SQL_EVENT_LAT}) * 1e6 + 0.5) AS BIGINT) AS x_c,
       CAST(floor(({derive.SQL_EVENT_LON}) * 1e6 + 0.5) AS BIGINT) AS y_c
FROM events
"""


def q_raster_compare(sf_dir):
    """gdal raster compare analog: parity report between the full z7
    count raster and the raster of events with event_id % 97 != 0 —
    pixels containing a %97 event differ or drop."""
    from . import raster_calc as rc

    pts = events_points(sf_dir)
    a = rast.rasterize_pixels(pts, 7, merge_alg="count", shuffle_partitions=8)

    def drop97(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(eid % 97 != 0))

    b = rast.rasterize_pixels(pts.map_batches(drop97, batch_format="pyarrow"),
                              7, merge_alg="count", shuffle_partitions=8)
    out = rc.raster_compare(a, b)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_only_a": batch["n_only_a"], "n_only_b": batch["n_only_b"],
            "n_common": batch["n_common"], "n_differ": batch["n_differ"],
            "max_abs_diff": pc.cast(batch["max_abs_diff"], pa.int64()),
        })

    return out.map_batches(f, batch_format="pyarrow")


def sql_raster_compare():
    gx, gy = _pixel_sql(7)
    return f"""
    WITH pa_ AS (SELECT {gx} AS gpx, {gy} AS gpy, count(*) AS c
                 FROM {_POINTS_SQL} p GROUP BY 1, 2),
         pb_ AS (SELECT {gx} AS gpx, {gy} AS gpy, count(*) AS c
                 FROM {_POINTS_SQL} p WHERE event_id % 97 != 0 GROUP BY 1, 2),
         j AS (SELECT a.c AS ca, b.c AS cb
               FROM pa_ a FULL OUTER JOIN pb_ b
               ON a.gpx = b.gpx AND a.gpy = b.gpy)
    SELECT count(*) FILTER (ca IS NOT NULL AND cb IS NULL) AS n_only_a,
           count(*) FILTER (cb IS NOT NULL AND ca IS NULL) AS n_only_b,
           count(*) FILTER (ca IS NOT NULL AND cb IS NOT NULL) AS n_common,
           count(*) FILTER (ca IS NOT NULL AND cb IS NOT NULL
                            AND ca != cb) AS n_differ,
           COALESCE(max(abs(ca - cb)) FILTER (ca IS NOT NULL
                                              AND cb IS NOT NULL), 0)
             AS max_abs_diff
    FROM j
    """


def q_corpus_stats(sf_dir):
    """Corpus report (per-source × lang rollup): n_docs, total tokens,
    total chars, distinct langs — the one-pass summary every
    training-data pipeline starts from. token_stats (vectorized Arrow)
    → one grouped_agg."""
    docs = tables.read_table(sf_dir, "documents",
                             columns=["doc_id", "text", "lang", "source"])
    stats = text_mod.token_stats(docs)

    out = rel.grouped_agg(stats, ["source", "lang"], [
        ("count", "doc_id", "n_docs"),
        ("sum", "n_tokens", "total_tokens"),
        ("sum", "n_chars_calc", "total_chars"),
    ])

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({
            "source": batch["source"], "lang": batch["lang"],
            "n_docs": pc.cast(batch["n_docs"], pa.int64()),
            "total_tokens": pc.cast(batch["total_tokens"], pa.int64()),
            "total_chars": pc.cast(batch["total_chars"], pa.int64()),
        })

    return out.map_batches(f, batch_format="pyarrow")


SQL_CORPUS_STATS = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2
"""


def q_chunk_documents(sf_dir):
    """Token-window chunking with overlap (W=40 tokens, stride 32) —
    the standard LLM training-data prep step. Embarrassingly parallel:
    each batch chunks independently, no shuffle."""
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return text_mod.chunk_documents(docs, window=40, stride=32)


def sql_chunk_documents(window: int = 40, stride: int = 32) -> str:
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
                      len(string_split(text, ' ')) AS n
               FROM documents),
         g AS (SELECT doc_id, tk, n,
                      unnest(generate_series(0, ((n - 1) // {stride}) * {stride},
                                             {stride})) AS start
               FROM t)
    SELECT doc_id, start // {stride} AS chunk_id,
           least({window}, n - start) AS n_tokens,
           array_to_string(tk[start + 1 : start + least({window}, n - start)],
                           ' ') AS chunk_text
    FROM g
    """


def q_chunk_dedup(sf_dir):
    """Chunk-level exact dedup (Dolma/RefinedWeb paragraph-unit dedup,
    word-soup analog: W=8 non-overlapping token windows). Chunks map
    embarrassingly parallel, then the winner-per-content groupby ships
    only a 128-bit digest + packed (doc_id, chunk_id) id — never text."""
    docs = tables.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    chunks = text_mod.chunk_documents(docs, window=8, stride=8)

    def pack(batch: pa.Table) -> pa.Table:
        gid = (batch["doc_id"].to_numpy(zero_copy_only=False) * 65536
               + batch["chunk_id"].to_numpy(zero_copy_only=False))
        return pa.table({"gid": pa.array(gid), "chunk_text": batch["chunk_text"]})

    chunks = chunks.map_batches(pack, batch_format="pyarrow")
    out = dd.exact_dedup(chunks, "chunk_text", "gid", hash_key=True)

    def f(batch: pa.Table) -> pa.Table:
        return pa.table({"chunk_gid": batch["gid"], "dup_count": batch["dup_count"]})

    return out.map_batches(f, batch_format="pyarrow")


def sql_chunk_dedup() -> str:
    return """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk,
                      len(string_split(text, ' ')) AS n
               FROM documents),
         g AS (SELECT doc_id, tk, n,
                      unnest(generate_series(0, ((n - 1) // 8) * 8, 8)) AS start
               FROM t),
         c AS (SELECT doc_id * 65536 + start // 8 AS gid,
                      array_to_string(tk[start + 1 : start + least(8, n - start)],
                                      ' ') AS ct
               FROM g)
    SELECT min(gid) AS chunk_gid, count(*) AS dup_count FROM c GROUP BY ct
    """


# ---------------------------------------------------------------------------
# window functions / grouped top-k / bloom semi-anti / interval join
# ---------------------------------------------------------------------------


def q_orders_window(sf_dir):
    """SQL window functions: per-customer row_number + running
    totalprice (fixed-point cents so the running sum is order-exact)."""
    from .windows import partitioned_window

    o = tables.read_table(sf_dir, "orders",
                          columns=["o_orderkey", "o_custkey",
                                   "o_orderdate", "o_totalprice"])
    return partitioned_window(
        o, "o_custkey", ["o_orderdate", "o_orderkey"],
        [{"name": "rn", "kind": "row_number"},
         {"name": "cum_price_c", "kind": "cum_sum",
          "col": "o_totalprice", "scale": 100}],
        keep=["o_orderkey", "o_custkey"])


SQL_ORDERS_WINDOW = f"""
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(sum({CENTS.format(x='o_totalprice')}) OVER w AS BIGINT)
           AS cum_price_c
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_event_gaps(sf_dir):
    """LAG(): microseconds since the previous event of the same user
    (-1 sentinel on each user's first event)."""
    from .windows import partitioned_window

    ev = tables.read_table(sf_dir, "events",
                           columns=["event_id", "user_id", "ts"])
    return partitioned_window(
        ev, "user_id", ["ts", "event_id"],
        [{"name": "gap_us", "kind": "lag_diff", "col": "ts", "fill": -1}],
        keep=["event_id", "user_id"])


SQL_EVENT_GAPS = """
SELECT event_id, user_id,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
FROM events
"""


def q_topk_per_customer(sf_dir):
    """Grouped top-k: each customer's 2 priciest orders with rank."""
    from .windows import grouped_topk

    o = tables.read_table(sf_dir, "orders",
                          columns=["o_orderkey", "o_custkey",
                                   "o_totalprice"])
    return grouped_topk(o, "o_custkey", "o_totalprice", 2,
                        descending=True, tiebreak="o_orderkey",
                        keep=["o_custkey", "o_orderkey"])


SQL_TOPK_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 2
"""


def _big_orders(sf_dir):
    o = tables.read_table(sf_dir, "orders",
                          columns=["o_custkey", "o_totalprice"])
    return o.filter(expr="o_totalprice > 300000.0") \
        .select_columns(["o_custkey"])


def q_semi_join_customers(sf_dir):
    """EXISTS (Bloom-prefiltered exact semi join): customers with at
    least one order over 300k."""
    from .joins import bloom_semi_anti_join

    c = tables.read_table(sf_dir, "customer",
                          columns=["c_custkey", "c_name", "c_acctbal"])
    return bloom_semi_anti_join(c, _big_orders(sf_dir), "c_custkey",
                                "o_custkey", anti=False)


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
"""


def q_anti_join_customers(sf_dir):
    """NOT EXISTS (Bloom 'definitely absent' + exact residue verify):
    customers with NO order over 300k."""
    from .joins import bloom_semi_anti_join

    c = tables.read_table(sf_dir, "customer",
                          columns=["c_custkey", "c_name", "c_acctbal"])
    return bloom_semi_anti_join(c, _big_orders(sf_dir), "c_custkey",
                                "o_custkey", anti=True)


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000.0)
"""


def q_interval_click_purchase(sf_dir):
    """Interval join: every (click, purchase) pair of the same user
    with the purchase inside [click_ts, click_ts + 2h)."""
    from .joins import interval_join

    ev = tables.read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts",
                                   "event_type"])

    def mk_clicks(batch: pa.Table) -> pa.Table:
        t0 = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        t1 = t0 + np.timedelta64(2, "h")
        return pa.table({"click_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "t0": pa.array(t0), "t1": pa.array(t1)})

    clicks = ev.filter(expr="event_type == 'click'") \
        .map_batches(mk_clicks, batch_format="pyarrow")
    purchases = ev.filter(expr="event_type == 'purchase'") \
        .map_batches(lambda t: pa.table({"purchase_id": t["event_id"],
                                         "user_id": t["user_id"],
                                         "ts": t["ts"]}),
                     batch_format="pyarrow")
    return interval_join(clicks, purchases, "t0", "t1", "ts",
                         key_col="user_id",
                         interval_cols=["click_id"],
                         point_cols=["purchase_id"])


def q_spatialite_roundtrip(sf_dir):
    """SpatiaLite driver surface (ogr/ogrsf_frmts/sqlite analog,
    sources/spatialite.py): events → WKB point layer (+typed attrs)
    → partitioned .sqlite write (one valid legacy-schema SpatiaLite
    database per block, GAIA blobs) → parallel rowid-split read-back
    → coordinates recovered from the GAIA blobs (incl. the blob
    MBR/marker framing, ogrsqlitelayer.cpp:2654). Same oracle as
    gpkg_roundtrip."""
    import os
    import shutil

    from ..geom import wkb as wkb_mod
    from ..sources import spatialite as sl_mod

    ev = tables.read_table(sf_dir, "events",
                           columns=["event_id", "event_type"])

    def to_layer(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = derive.event_lonlat(eid)
        geoms = wkb_mod.points_to_wkb(lon, lat)
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "geometry": pa.array(list(geoms),
                                              type=pa.binary())})

    layer = ev.map_batches(to_layer, batch_format="pyarrow")
    out_dir = (f"/tmp/lib_gdal_ray_sqlite_"
               f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(out_dir, ignore_errors=True)
    sl_mod.write_spatialite(layer, out_dir, layer="events_pts",
                            geometry_type="POINT")
    back = sl_mod.read_spatialite(out_dir)

    def coords(batch: pa.Table) -> pa.Table:
        lon, lat = wkb_mod.wkb_to_points(
            np.asarray(batch["geometry"].to_pylist(), dtype=object))
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "event_type": batch["event_type"],
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


def q_xlsx_roundtrip(sf_dir):
    """XLSX spreadsheet driver surface (ogr/ogrsf_frmts/xlsx analog,
    sources/spreadsheet.py): events → attribute layer with int /
    string / float / datetime columns → one .xlsx (row fragments
    rendered in parallel, driver stitches the zip; GDAL's own
    numFmt/cellXfs style table so temporal types survive) →
    fragment-parallel read-back with header + type autodetection →
    typed values recovered (serial-days datetime codec,
    ogrxlsxdatasource.cpp:658-672)."""
    import os

    ev = tables.read_table(sf_dir, "events",
                           columns=["event_id", "event_type", "ts",
                                    "value"])

    def to_layer(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "ts": pc.cast(batch["ts"], pa.timestamp("s"), safe=False),
            "value": batch["value"],
        })

    from ..sources import spreadsheet as ss

    layer = ev.map_batches(to_layer, batch_format="pyarrow")
    path = (f"/tmp/lib_gdal_ray_xlsx_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.xlsx")
    ss.write_xlsx(layer, path, sheet="events")
    back = ss.read_xlsx(path)

    def out(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        secs = ts.astype("datetime64[s]").astype(np.int64)
        val = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "event_type": batch["event_type"],
            "ts_s": pa.array(secs),
            "val_c": pa.array(
                np.floor(val * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(out, batch_format="pyarrow")


SQL_XLSX_ROUNDTRIP = """
SELECT event_id, event_type,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
       CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS val_c
FROM events
"""


SQL_INTERVAL_CP = """
SELECT iv.event_id AS click_id, e.event_id AS purchase_id
FROM events iv JOIN events e
  ON e.user_id = iv.user_id
 AND e.ts >= iv.ts AND e.ts < iv.ts + INTERVAL 2 HOUR
WHERE iv.event_type = 'click' AND e.event_type = 'purchase'
"""


def q_mif_roundtrip(sf_dir):
    """MapInfo MIF/MID driver surface (ogr/ogrsf_frmts/mitab analog,
    sources/mitab.py): events → point layer with typed attributes →
    one .mif/.mid pair (parallel fragment shards + streaming concat)
    → fragment-parallel read-back → coordinates recovered exactly
    (repr round-trip). Same oracle as geojson_roundtrip."""
    import os

    from ..sources import mitab as mitab_mod

    layer = _points_layer_with_name(sf_dir)
    path = (f"/tmp/lib_gdal_ray_mif_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.mif")
    mitab_mod.write_mif(layer, path)
    back = mitab_mod.read_mif(path)

    def coords(batch: pa.Table) -> pa.Table:
        from ..geom import wkb as wkb_mod

        lon, lat = wkb_mod.wkb_to_points(
            batch["geometry"].to_numpy(zero_copy_only=False))
        eid = np.array([int(s) for s in batch["name"].to_pylist()],
                       dtype=np.int64)
        return pa.table({
            "event_id": pa.array(eid),
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


def q_dxf_roundtrip(sf_dir):
    """DXF driver surface (ogr/ogrsf_frmts/dxf analog,
    sources/dxf.py): events → TEXT entities (point + Text attr) →
    one .dxf (parallel fragment shards + streaming concat) →
    fragment-parallel entity decode → coordinates recovered exactly
    (repr round-trip). Same oracle as geojson_roundtrip."""
    import os

    from ..sources import dxf as dxf_mod

    layer = _points_layer_with_name(sf_dir)
    path = (f"/tmp/lib_gdal_ray_dxf_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.dxf")
    dxf_mod.write_dxf(layer, path, text_col="name")
    back = dxf_mod.read_dxf(path)

    def coords(batch: pa.Table) -> pa.Table:
        from ..geom import wkb as wkb_mod

        lon, lat = wkb_mod.wkb_to_points(
            batch["geometry"].to_numpy(zero_copy_only=False))
        eid = np.array([int(s) for s in batch["Text"].to_pylist()],
                       dtype=np.int64)
        return pa.table({
            "event_id": pa.array(eid),
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


def q_filegdb_roundtrip(sf_dir):
    """OpenFileGDB driver surface (ogr/ogrsf_frmts/openfilegdb
    analog, sources/filegdb.py): events → typed point rows → one
    .gdbtable/.gdbtablx pair (V3 layout: null bitmaps, varuint
    strings, offset-scaled point shape blobs, offset table) →
    row-range-parallel read-back → coordinates recovered on the
    1e-9-degree FileGDB grid (lon/lat derive as 1e-5 rationals, so
    the 1e-6 oracle quantization is boundary-free)."""
    import os

    from ..sources import filegdb as fg_mod

    layer = _points_layer_with_name(sf_dir)

    def add_id(batch: pa.Table) -> pa.Table:
        eid = np.array([int(s) for s in batch["name"].to_pylist()],
                       dtype=np.int64)
        return batch.append_column("event_id", pa.array(eid))

    layer = layer.map_batches(add_id, batch_format="pyarrow")
    path = (f"/tmp/lib_gdal_ray_fgdb_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.gdbtable")
    fg_mod.write_point_gdbtable(layer, path)
    back = fg_mod.read_gdbtable(path)

    def coords(batch: pa.Table) -> pa.Table:
        from ..geom import wkb as wkb_mod

        lon, lat = wkb_mod.wkb_to_points(
            batch["geometry"].to_numpy(zero_copy_only=False))
        return pa.table({
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "lon_c": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "lat_c": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
        })

    return back.map_batches(coords, batch_format="pyarrow")


def q_osm_roundtrip(sf_dir):
    """OSM PBF driver surface (ogr/ogrsf_frmts/osm analog,
    sources/osm.py): events → dense-node .osm.pbf (parallel blob
    shards, vectorized delta-zigzag varint packing, name tag makes
    each node 'significant') → blob-parallel read of the GDAL
    `points` layer → 1e-7-degree coordinates recovered exactly (the
    PBF fixed-point grid; lon/lat derive as 1e-5-rational values so
    the 1e-7 quantization is boundary-free)."""
    import os

    from ..sources import osm as osm_mod

    ev = events_points(sf_dir)

    def to_nodes(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        names = [str(int(e)) for e in eid]
        offs = np.arange(len(eid) + 1, dtype=np.int32)
        return pa.table({
            "id": pc.cast(batch["event_id"], pa.int64()),
            "lon": batch["lon"], "lat": batch["lat"],
            "tag_k": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(["name"] * len(eid))),
            "tag_v": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(names)),
        })

    nodes = ev.map_batches(to_nodes, batch_format="pyarrow")
    path = (f"/tmp/lib_gdal_ray_osm_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.osm.pbf")
    osm_mod.write_osm_pbf(path, nodes=nodes)
    back = osm_mod.points_layer(path)

    def out(batch: pa.Table) -> pa.Table:
        from ..geom import wkb as wkb_mod

        eid = np.array([int(s) for s in batch["osm_id"].to_pylist()],
                       dtype=np.int64)
        lon, lat = wkb_mod.wkb_to_points(
            batch["geometry"].to_numpy(zero_copy_only=False))
        return pa.table({
            "event_id": pa.array(eid),
            "lon7": pa.array(np.floor(lon * 1e7 + 0.5).astype(np.int64)),
            "lat7": pa.array(np.floor(lat * 1e7 + 0.5).astype(np.int64)),
        })

    return back.map_batches(out, batch_format="pyarrow")


SQL_OSM_ROUNDTRIP = f"""
SELECT event_id,
       CAST(floor(({derive.SQL_EVENT_LON}) * 1e7 + 0.5) AS BIGINT) AS lon7,
       CAST(floor(({derive.SQL_EVENT_LAT}) * 1e7 + 0.5) AS BIGINT) AS lat7
FROM events
"""


def q_osm_ways(sf_dir):
    """OSM way assembly (the node-location join the reference does
    with its custom node index, ogrosmdatasource.cpp): events become
    untagged nodes; ways reference 8 consecutive event-ids (derived
    arithmetically — event_id is dense — so the build side needs NO
    shuffle); the `lines` layer then resolves refs via the broadcast
    searchsorted join and computes z_order (residential → 3)."""
    import os

    from ..sources import osm as osm_mod
    from ..sources import tables as tables_mod

    ev = events_points(sf_dir)

    def to_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({
            "id": pc.cast(batch["event_id"], pa.int64()),
            "lon": batch["lon"], "lat": batch["lat"],
        })

    nodes = ev.map_batches(to_nodes, batch_format="pyarrow")
    n = tables_mod.read_table(sf_dir, "events",
                              columns=["event_id"]).count()
    n_ways = (n + 7) // 8
    gids = ray.data.range(n_ways)

    def to_ways(batch) -> pa.Table:
        g = batch["id"].astype(np.int64)
        rows_refs = [list(range(int(x) * 8, min(int(x) * 8 + 8, n)))
                     for x in g]
        offs = np.concatenate(
            [[0], np.cumsum([len(r) for r in rows_refs])]).astype(np.int32)
        flat = np.concatenate(rows_refs) if rows_refs else []
        tago = np.arange(0, 2 * (len(g) + 1), 2, dtype=np.int32)
        return pa.table({
            "id": pa.array(g),
            "refs": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(flat, pa.int64())),
            "tag_k": pa.ListArray.from_arrays(
                pa.array(tago),
                pa.array(["highway", "name"] * len(g))),
            "tag_v": pa.ListArray.from_arrays(
                pa.array(tago),
                pa.array([v for x in g
                          for v in ("residential", str(int(x)))])),
        })

    ways = gids.map_batches(to_ways, batch_format="numpy")
    path = (f"/tmp/lib_gdal_ray_osmw_"
            f"{os.path.basename(os.path.normpath(sf_dir))}.osm.pbf")
    osm_mod.write_osm_pbf(path, nodes=nodes, ways=ways)
    back = osm_mod.lines_layer(path)

    def out(batch: pa.Table) -> pa.Table:
        from ..geom import wkb as wkb_mod

        gid = np.array([int(s) for s in batch["osm_id"].to_pylist()],
                       dtype=np.int64)
        n_pts, s_lon, s_lat = [], [], []
        for g in batch["geometry"].to_pylist():
            _k, coords = wkb_mod.parse_wkb(g)
            n_pts.append(len(coords))
            s_lon.append(int(np.floor(coords[:, 0] * 1e7 + 0.5)
                             .astype(np.int64).sum()))
            s_lat.append(int(np.floor(coords[:, 1] * 1e7 + 0.5)
                             .astype(np.int64).sum()))
        z = pc.cast(batch["z_order"], pa.int64())
        return pa.table({
            "osm_id": pa.array(gid), "z_order": z,
            "n_pts": pa.array(n_pts, pa.int64()),
            "sum_lon7": pa.array(s_lon, pa.int64()),
            "sum_lat7": pa.array(s_lat, pa.int64()),
        })

    return back.map_batches(out, batch_format="pyarrow")


SQL_OSM_WAYS = f"""
SELECT event_id // 8 AS osm_id,
       CAST(3 AS BIGINT) AS z_order,
       COUNT(*) AS n_pts,
       CAST(SUM(CAST(floor(({derive.SQL_EVENT_LON}) * 1e7 + 0.5)
           AS BIGINT)) AS BIGINT) AS sum_lon7,
       CAST(SUM(CAST(floor(({derive.SQL_EVENT_LAT}) * 1e7 + 0.5)
           AS BIGINT)) AS BIGINT) AS sum_lat7
FROM events
GROUP BY 1
HAVING COUNT(*) >= 2
"""


# ---------------------------------------------------------------------------
# GNM graph analysis (gnm/gnmgraph.cpp — Dijkstra / Yen KSP / BFS trace)
# ---------------------------------------------------------------------------

_GRAPH_VMAX = 200   # cap the supplier-derived DAG (sf-stable oracle cost)


def _supplier_dag_edges(sf_dir):
    """DAG over supplier keys (<= _GRAPH_VMAX): s -> s+st for st in
    1..3, integer-valued costs (exact float parity)."""
    import pyarrow.compute as _pc

    sup = tables.read_table_arrow(sf_dir, "supplier", columns=["s_suppkey"])
    vmax = min(_GRAPH_VMAX,
               int(_pc.max(sup["s_suppkey"]).as_py()))
    ds = tables.read_table(sf_dir, "supplier", columns=["s_suppkey"])

    def expand(batch: pa.Table) -> pa.Table:
        s = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = s[s <= vmax]
        st = np.array([1, 2, 3], dtype=np.int64)
        src = np.repeat(s, 3)
        stv = np.tile(st, len(s))
        tgt = src + stv
        keep = tgt <= vmax
        src, stv, tgt = src[keep], stv[keep], tgt[keep]
        cost = ((src * 7 + stv * 13) % 20 + 1).astype(np.float64)
        return pa.table({
            "edge_id": src * 4 + stv, "src": src, "tgt": tgt,
            "bidir": pa.array(np.zeros(len(src), dtype=bool)),
            "dir_cost": cost, "inv_cost": cost})

    return ds.map_batches(expand, batch_format="pyarrow")


def q_graph_shortest_path(sf_dir):
    """Single-source shortest-path costs over the supplier DAG —
    distributed Bellman-Ford frontier relaxation (GNMGraph Dijkstra
    cost parity, gnm/gnmgraph.cpp:457-541)."""
    from . import graph as graph_mod

    return graph_mod.shortest_path_costs(_supplier_dag_edges(sf_dir),
                                         start=1)


SQL_GRAPH_SSSP = f"""
WITH RECURSIVE verts AS (
  SELECT CAST(s_suppkey AS BIGINT) AS v FROM supplier
  WHERE s_suppkey <= {_GRAPH_VMAX}
),
edges AS (
  SELECT s.v AS src, s.v + t.st AS tgt,
         CAST((s.v * 7 + t.st * 13) % 20 + 1 AS DOUBLE) AS cost
  FROM verts s, (VALUES (1), (2), (3)) AS t(st)
  WHERE s.v + t.st <= (SELECT MAX(v) FROM verts)
),
walk(v, c) AS (
  SELECT CAST(1 AS BIGINT) AS v, CAST(0 AS DOUBLE) AS c
  UNION
  SELECT e.tgt, w.c + e.cost FROM walk w JOIN edges e ON e.src = w.v
)
SELECT v AS vertex, MIN(c) AS cost FROM walk GROUP BY v ORDER BY vertex
"""


def _nation_cyclic_edges(sf_dir):
    """Cyclic directed graph over the 25 nation keys."""
    ds = tables.read_table(sf_dir, "nation", columns=["n_nationkey"])

    def expand(batch: pa.Table) -> pa.Table:
        n = batch["n_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        a = n[n % 3 != 0]
        b = n[n % 4 == 0]
        src = np.concatenate([a, b])
        tgt = np.concatenate([(a + 7) % 25, (b * 2 + 1) % 25])
        eid = np.concatenate([2000 + a, 3000 + b])
        cost = np.ones(len(src), dtype=np.float64)
        return pa.table({
            "edge_id": eid, "src": src, "tgt": tgt,
            "bidir": pa.array(np.zeros(len(src), dtype=bool)),
            "dir_cost": cost, "inv_cost": cost})

    return ds.map_batches(expand, batch_format="pyarrow")


def q_graph_connected(sf_dir):
    """ConnectedComponents reachable-vertex set from emitter {4} over a
    cyclic nation graph — distributed BFS frontier rounds
    (gnm/gnmgraph.cpp:427-450; keys-not-order per SURVEY §2.9)."""
    from . import graph as graph_mod

    return graph_mod.reachable_vertices(_nation_cyclic_edges(sf_dir), [4])


SQL_GRAPH_CONNECTED = """
WITH RECURSIVE e1 AS (
  SELECT CAST(n_nationkey AS BIGINT) AS src,
         CAST((n_nationkey + 7) % 25 AS BIGINT) AS tgt
  FROM nation WHERE n_nationkey % 3 <> 0
  UNION ALL
  SELECT CAST(n_nationkey AS BIGINT),
         CAST((n_nationkey * 2 + 1) % 25 AS BIGINT)
  FROM nation WHERE n_nationkey % 4 = 0
),
reach(v) AS (
  SELECT CAST(4 AS BIGINT) AS v
  UNION
  SELECT e.tgt FROM reach r JOIN e1 e ON e.src = r.v
)
SELECT v AS vertex FROM reach ORDER BY vertex
"""


def q_graph_k_paths(sf_dir):
    """Yen K-shortest-path costs (k=8) 0 -> 24 over a nation-key DAG
    (gnm/gnmgraph.cpp:247-425).  The DAG makes every path loopless, so
    Yen's k costs equal the k smallest of the full path enumeration —
    which IS SQL-expressible."""
    from . import graph as graph_mod

    ds = tables.read_table(sf_dir, "nation", columns=["n_nationkey"])

    def expand(batch: pa.Table) -> pa.Table:
        n = batch["n_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        src = np.repeat(n, 3)
        stv = np.tile(np.array([1, 2, 3], dtype=np.int64), len(n))
        tgt = src + stv
        keep = tgt <= 24
        src, stv, tgt = src[keep], stv[keep], tgt[keep]
        cost = ((src * 5 + stv * 11) % 17 + 1).astype(np.float64)
        return pa.table({
            "edge_id": src * 4 + stv, "src": src, "tgt": tgt,
            "bidir": pa.array(np.zeros(len(src), dtype=bool)),
            "dir_cost": cost, "inv_cost": cost})

    edges = ds.map_batches(expand, batch_format="pyarrow")
    paths = graph_mod.k_shortest_paths(edges, start=0, end=24, k=8)
    # one row per path: (rank_n, path_cost), ranks in ascending cost
    import pyarrow.compute as _pc

    ranks = _pc.unique(paths["path_rank"]).to_numpy(
        zero_copy_only=False).astype(np.int64)
    costs = []
    pr = paths["path_rank"].to_numpy(zero_copy_only=False)
    pcst = paths["path_cost"].to_numpy(zero_copy_only=False)
    for r in np.sort(ranks):
        costs.append(float(pcst[pr == r][0]))
    costs = np.sort(np.asarray(costs, dtype=np.float64))
    return pa.table({"rank_n": np.arange(1, len(costs) + 1,
                                         dtype=np.int64),
                     "path_cost": costs})


SQL_GRAPH_KSP = """
WITH RECURSIVE edges AS (
  SELECT CAST(n_nationkey AS BIGINT) AS src,
         CAST(n_nationkey + t.st AS BIGINT) AS tgt,
         CAST((n_nationkey * 5 + t.st * 11) % 17 + 1 AS DOUBLE) AS cost
  FROM nation, (VALUES (1), (2), (3)) AS t(st)
  WHERE n_nationkey + t.st <= 24
),
paths(v, c) AS (
  SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS DOUBLE) AS c
  UNION ALL
  SELECT e.tgt, p.c + e.cost FROM paths p JOIN edges e ON e.src = p.v
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY c) AS BIGINT) AS rank_n,
       c AS path_cost
FROM paths WHERE v = 24 ORDER BY path_cost LIMIT 8
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    # relational
    "pricing_summary": (q_pricing_summary, SQL_PRICING),
    "filter_project": (q_filter_project, SQL_FILTER),
    "join_orders_customer": (q_join_orders_customer, SQL_JOIN_OC),
    "join3_region_customer": (q_join3_region_customer, SQL_JOIN3),
    "topk_orders": (q_topk_orders, SQL_TOPK),
    "distinct_segments": (q_distinct_segments, SQL_DISTINCT),
    "scalar_funcs": (q_scalar_funcs, SQL_SCALAR),
    "swq_functions": (q_swq_functions, SQL_SWQ_FUNCS),
    "global_agg": (q_global_agg, SQL_GLOBAL),
    "events_by_type": (q_events_by_type, SQL_EVENTS_TYPE),
    "count_distinct_users": (q_count_distinct_users, SQL_COUNT_DISTINCT),
    "events_hourly_window": (q_events_hourly_window, SQL_EVENTS_HOURLY),
    "sliding_window": (q_sliding_window, SQL_SLIDING),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "orders_window": (q_orders_window, SQL_ORDERS_WINDOW),
    "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
    "topk_per_customer": (q_topk_per_customer, SQL_TOPK_PER_CUSTOMER),
    "semi_join_customers": (q_semi_join_customers, SQL_SEMI_JOIN),
    "anti_join_customers": (q_anti_join_customers, SQL_ANTI_JOIN),
    "interval_click_purchase": (q_interval_click_purchase, SQL_INTERVAL_CP),
    "union_names": (q_union_names, SQL_UNION),
    "median_quantity": (q_median_quantity, SQL_MEDIAN),
    "orders_by_year": (q_orders_by_year, SQL_ORDERS_YEAR),
    # geospatial
    "cell_assign": (q_cell_assign, sql_cell_assign()),
    "bbox_join": (q_bbox_join, SQL_BBOX_JOIN),
    "pip_join_polygons": (q_pip_join_polygons, sql_pip_join_polygons()),
    "shuffle_join": (q_shuffle_join, SQL_BBOX_JOIN),
    "knn": (q_knn, SQL_KNN),
    "reproject": (q_reproject, SQL_REPROJECT),
    "reproject_utm": (q_reproject_utm, sql_reproject_utm()),
    "gcp_affine": (q_gcp_affine, SQL_GCP_AFFINE),
    "makevalid_bowties": (q_makevalid_bowties, sql_makevalid_bowties()),
    "delaunay_mesh": (q_delaunay_mesh, SQL_DELAUNAY_MESH),
    "concave_hull": (q_concave_hull, SQL_CONCAVE_HULL),
    "wrap_dateline": (q_wrap_dateline, SQL_WRAP_DATELINE),
    "check_coverage": (q_check_coverage, SQL_CHECK_COVERAGE),
    "clean_coverage": (q_clean_coverage, SQL_CLEAN_COVERAGE),
    "simplify_coverage": (q_simplify_coverage, SQL_SIMPLIFY_COVERAGE),
    "rasterize_tiles": (q_rasterize_tiles, sql_rasterize()),
    "rasterize_polygons": (q_rasterize_polygons, sql_rasterize_polygons()),
    "rasterize_lines": (q_rasterize_lines, sql_rasterize_lines()),
    "tile_overview": (q_tile_overview, sql_tile_overview()),
    "overview_average": (q_overview_average, sql_overview_average()),
    "overview_rms": (q_overview_rms, sql_overview_rms()),
    "overview_mode": (q_overview_mode, sql_overview_mode()),
    "overview_gauss": (q_overview_gauss, sql_overview_gauss()),
    "overview_cubicspline": (q_overview_cubicspline, sql_overview_cubicspline()),
    "zonal_stats": (q_zonal_stats, SQL_ZONAL),
    "zonal_weighted": (q_zonal_weighted, sql_zonal_weighted()),
    "zone_geometry": (q_zone_geometry, SQL_ZONE_GEOM),
    "buffer_zones": (q_buffer_zones, SQL_BUFFER_ZONES),
    "where_filter": (q_where_filter, SQL_WHERE),
    "clip_semi": (q_clip_semi, SQL_CLIP),
    "erase_anti": (q_erase_anti, SQL_ERASE),
    "identity_left": (q_identity_left, SQL_IDENTITY),
    "raster_calc_ratio": (q_raster_calc_ratio, sql_raster_calc_ratio()),
    "pixel_histogram": (q_pixel_histogram, sql_pixel_histogram()),
    "polygonize_regions": (q_polygonize_regions, sql_polygonize_regions()),
    "hillshade": (q_hillshade, sql_hillshade()),
    "hillshade_multidirectional": (q_hillshade_md, sql_hillshade_md()),
    "slope_zevenbergen": (q_slope_zt, sql_slope_zt()),
    "hillshade_combined": (_q_dem_kernel("hillshade_combined", "shade"),
                           sql_hillshade_combined()),
    "hillshade_igor": (_q_dem_kernel("hillshade_igor", "shade", round_to=4),
                       sql_hillshade_igor()),
    "aspect_azimuth": (_q_dem_kernel("aspect", "aspect_deg", round_to=4), sql_aspect()),
    "dem_tri": (_q_dem_kernel("tri", "tri"), sql_tri()),
    "dem_tpi": (_q_dem_kernel("tpi", "tpi"), sql_tpi()),
    "dem_roughness": (_q_dem_kernel("roughness", "roughness"), sql_roughness()),
    "grid_idw": (q_grid_idw, SQL_GRID_IDW),
    "grid_linear": (q_grid_linear, sql_grid_linear()),
    "grid_metrics": (q_grid_metrics, SQL_GRID_METRICS),
    "grid_invdistnn": (q_grid_invdistnn, SQL_GRID_INVDISTNN),
    "gopher_repetition": (q_gopher_repetition, SQL_GOPHER_REPETITION),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "hash_sample": (q_hash_sample, SQL_HASH_SAMPLE),
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "token_budget_mix": (q_token_budget_mix, SQL_TOKEN_BUDGET_MIX),
    "asof_attribution": (q_asof_attribution, SQL_ASOF_ATTRIBUTION),
    "source_quota": (q_source_quota, SQL_SOURCE_QUOTA),
    "contour": (q_contour, sql_contour()),
    "isobands": (q_isobands, sql_isobands()),
    "mdim_reduce": (q_mdim_reduce, sql_mdim_reduce()),
    "mdim_stats": (q_mdim_stats, sql_mdim_stats()),
    "mdim_classic_tpi": (q_mdim_classic_tpi, sql_mdim_classic_tpi()),
    "zarr_roundtrip": (q_zarr_roundtrip, sql_zarr_roundtrip()),
    "zarr_v3_roundtrip": (q_zarr_v3_roundtrip, sql_zarr_roundtrip()),
    "netcdf_roundtrip": (q_netcdf_roundtrip, sql_zarr_roundtrip()),
    "hdf5_roundtrip": (q_hdf5_roundtrip, sql_zarr_roundtrip()),
    "gpx_roundtrip": (q_gpx_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "mvt_roundtrip": (q_mvt_roundtrip, _sql_mvt_roundtrip()),
    "pmtiles_roundtrip": (q_pmtiles_roundtrip, _sql_mvt_roundtrip()),
    "mbtiles_roundtrip": (q_mbtiles_roundtrip, _sql_mvt_roundtrip()),
    "gpkg_raster_roundtrip": (q_gpkg_raster_roundtrip,
                              sql_gpkg_raster_roundtrip()),
    "kml_roundtrip": (q_kml_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "gml_roundtrip": (q_gml_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "envi_roundtrip": (q_envi_roundtrip, _sql_envi_roundtrip()),
    "grib_roundtrip": (q_grib_roundtrip, _sql_envi_roundtrip()),
    "hdf4_roundtrip": (q_hdf4_roundtrip, _sql_envi_roundtrip()),
    "jp2_roundtrip": (q_jp2_roundtrip, _sql_envi_roundtrip()),
    "rasterize_geodetic": (q_rasterize_geodetic,
                           sql_rasterize_geodetic()),
    "rraster_roundtrip": (q_rraster_roundtrip, _sql_envi_roundtrip()),
    "jml_roundtrip": (q_jml_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "georss_roundtrip": (q_georss_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "contour_lines_ring": (q_contour_lines_ring, sql_contour_lines_ring()),
    "sieve_filter": (q_sieve, sql_sieve()),
    "viewshed": (q_viewshed, sql_viewshed()),
    "intersection_overlay": (q_intersection_overlay, SQL_INTERSECTION),
    "clip_geometry": (q_clip_geometry, SQL_CLIP_GEOM),
    "erase_overlay": (q_erase_overlay, sql_erase_overlay()),
    "union_overlay": (q_union_overlay, sql_union_overlay()),
    "mosaic_warp": (q_mosaic_warp, sql_mosaic_warp()),
    "color_relief": (q_color_relief, sql_color_relief()),
    "raster_blend": (q_raster_blend, sql_raster_blend()),
    "proximity_dist": (q_proximity, sql_proximity()),
    "proximity_shuffle": (q_proximity_shuffle, sql_proximity()),
    # documents / embeddings
    "dedup_documents": (q_dedup_documents, SQL_DEDUP),
    "chunk_documents": (q_chunk_documents, sql_chunk_documents()),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF),
    "ogrsql_report": (q_ogrsql_report, SQL_OGRSQL_REPORT),
    "corpus_stats": (q_corpus_stats, SQL_CORPUS_STATS),
    "swap_xy_points": (q_swap_xy, SQL_SWAP_XY),
    "raster_compare": (q_raster_compare, sql_raster_compare()),
    "ogrsql_join_topk": (q_ogrsql_join_topk, SQL_OGRSQL_JOIN),
    "ogrsql_spatial": (q_ogrsql_spatial, SQL_OGRSQL_SPATIAL),
    "fgb_roundtrip": (q_fgb_roundtrip, SQL_FGB_ROUNDTRIP),
    "homography_roundtrip": (q_homography_roundtrip, SQL_HOMOGRAPHY_RT),
    "geoloc_roundtrip": (q_geoloc_roundtrip, SQL_GEOLOC_RT),
    "pixfn_norm_diff": (q_pixfn_norm_diff, sql_pixfn_norm_diff()),
    "pixfn_interpolate": (q_pixfn_interpolate, sql_pixfn_interpolate()),
    "pixfn_complex_intensity": (q_pixfn_complex_intensity,
                                sql_pixfn_complex_intensity()),
    "pixfn_expression": (q_pixfn_expression, sql_pixfn_expression()),
    "chunk_dedup": (q_chunk_dedup, sql_chunk_dedup()),
    "token_stats": (q_token_stats, SQL_TOKEN),
    "bpe_tokens": (q_bpe_tokens, SQL_BPE),
    "ann_topk": (q_ann_topk, SQL_ANN),
    "minhash_near_dup": (q_minhash_near_dup, sql_minhash_near_dup()),
    "minhash_clusters": (q_minhash_clusters, sql_minhash_clusters()),
    "minhash_dedup_keep": (q_minhash_dedup_keep, sql_minhash_dedup_keep()),
    "ngram_jaccard_dup": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "simhash": (q_simhash, sql_simhash()),
    "lang_quality": (q_lang_quality, sql_lang_quality()),
    "lang_stopword_quality": (q_lang_stopword_quality, sql_lang_stopword_quality()),
    "fingerprint": (q_fingerprint, sql_fingerprint()),
    "embedding_near_dup": (q_embedding_near_dup, sql_embedding_near_dup()),
    "media_features": (q_media_features, sql_media_features()),
    "media_decode": (q_media_decode, sql_media_decode()),
    "media_resize": (q_media_resize, sql_media_resize()),
    "geojson_roundtrip": (q_geojson_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "gpkg_roundtrip": (q_gpkg_roundtrip, SQL_GPKG_ROUNDTRIP),
    "spatialite_roundtrip": (q_spatialite_roundtrip, SQL_GPKG_ROUNDTRIP),
    "xlsx_roundtrip": (q_xlsx_roundtrip, SQL_XLSX_ROUNDTRIP),
    "shapefile_roundtrip": (q_shapefile_roundtrip, SQL_GPKG_ROUNDTRIP),
    "csv_wkt_roundtrip": (q_csv_wkt_roundtrip, SQL_CSV_WKT_ROUNDTRIP),
    "geotiff_roundtrip": (q_geotiff_roundtrip, _sql_geotiff_roundtrip()),
    "vrt_mosaic": (q_vrt_mosaic, _sql_vrt_mosaic()),
    "pii_scrub": (q_pii_scrub, _sql_pii_scrub()),
    "audio_features": (q_audio_features, sql_audio_features()),
    "image_features": (q_image_features, sql_image_features()),
    "osm_roundtrip": (q_osm_roundtrip, SQL_OSM_ROUNDTRIP),
    "mif_roundtrip": (q_mif_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "dxf_roundtrip": (q_dxf_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "filegdb_roundtrip": (q_filegdb_roundtrip, SQL_GEOJSON_ROUNDTRIP),
    "osm_ways": (q_osm_ways, SQL_OSM_WAYS),
    # GNM graph analysis (gnm/gnmgraph.cpp)
    "graph_shortest_path": (q_graph_shortest_path, SQL_GRAPH_SSSP),
    "graph_connected": (q_graph_connected, SQL_GRAPH_CONNECTED),
    "graph_k_paths": (q_graph_k_paths, SQL_GRAPH_KSP),
}
