"""Deterministic geometry derivation from the integer keys of the
driver-provided tables.

The sandbox testdata (TESTDATA.md) carries no geometry columns, so geo
operators derive coordinates from integer keys with *exact* integer
arithmetic that a SQL oracle reproduces bit-for-bit (multiply → modulo
→ divide-by-1e5). Every constant here has a matching SQL fragment in
``__ray_entry__.oracle_sql`` — keep them in sync.

Layout: event points spread over lon [-180,180) × lat [-85,85);
supplier/site points likewise; nation zones are axis-aligned boxes with
integer edges (overlapping, 10-30° wide).
"""

from __future__ import annotations

import numpy as np

# (multiplier_lon, multiplier_lat) — primes, chosen to scatter keys.
EVENT_LON_MUL, EVENT_LAT_MUL = 9973, 7919
SITE_LON_MUL, SITE_LAT_MUL = 104729, 99991
LON_MOD, LAT_MOD = 36_000_000, 17_000_000
SCALE = 100_000.0


def key_to_lonlat(key: np.ndarray, lon_mul: int, lat_mul: int):
    key = np.asarray(key, dtype=np.int64)
    lon = ((key * lon_mul) % LON_MOD) / SCALE - 180.0
    lat = ((key * lat_mul) % LAT_MOD) / SCALE - 85.0
    return lon, lat


def event_lonlat(event_id):
    return key_to_lonlat(event_id, EVENT_LON_MUL, EVENT_LAT_MUL)


def site_lonlat(suppkey):
    return key_to_lonlat(suppkey, SITE_LON_MUL, SITE_LAT_MUL)


# SQL fragments for the DuckDB oracle (same math, same constants).
SQL_EVENT_LON = f"((event_id * {EVENT_LON_MUL}) % {LON_MOD}) / {SCALE} - 180.0"
SQL_EVENT_LAT = f"((event_id * {EVENT_LAT_MUL}) % {LAT_MOD}) / {SCALE} - 85.0"
SQL_SITE_LON = f"((s_suppkey * {SITE_LON_MUL}) % {LON_MOD}) / {SCALE} - 180.0"
SQL_SITE_LAT = f"((s_suppkey * {SITE_LAT_MUL}) % {LAT_MOD}) / {SCALE} - 85.0"


def zone_boxes(nationkey: np.ndarray):
    """Nation zone boxes: integer-edge axis-aligned boxes.

    Returns (xmin, ymin, xmax, ymax) int64 arrays; matches SQL_ZONE_*.
    """
    k = np.asarray(nationkey, dtype=np.int64)
    cx = ((k * 131 + 17) % 340) - 170
    cy = ((k * 73 + 11) % 160) - 80
    hw = 5 + (k % 11)
    hh = 4 + (k % 7)
    return cx - hw, cy - hh, cx + hw, cy + hh


SQL_ZONE_XMIN = "(((n_nationkey * 131 + 17) % 340) - 170) - (5 + n_nationkey % 11)"
SQL_ZONE_XMAX = "(((n_nationkey * 131 + 17) % 340) - 170) + (5 + n_nationkey % 11)"
SQL_ZONE_YMIN = "(((n_nationkey * 73 + 11) % 160) - 80) - (4 + n_nationkey % 7)"
SQL_ZONE_YMAX = "(((n_nationkey * 73 + 11) % 160) - 80) + (4 + n_nationkey % 7)"


def part_boxes(partkey: np.ndarray):
    """Input-side boxes for the overlay join (from part keys; exact ints)."""
    k = np.asarray(partkey, dtype=np.int64)
    cx = ((k * 37) % 340) - 170
    cy = ((k * 53) % 160) - 80
    h = 2 + (k % 9)
    return cx - h, cy - h, cx + h, cy + h


SQL_PART_XMIN = "(((p_partkey * 37) % 340) - 170) - (2 + p_partkey % 9)"
SQL_PART_XMAX = "(((p_partkey * 37) % 340) - 170) + (2 + p_partkey % 9)"
SQL_PART_YMIN = "(((p_partkey * 53) % 160) - 80) - (2 + p_partkey % 9)"
SQL_PART_YMAX = "(((p_partkey * 53) % 160) - 80) + (2 + p_partkey % 9)"


def zone_polygon_rings(nationkey: int):
    """A non-rectangular deterministic polygon per zone (for PIP
    ray-casting tests; not SQL-expressible): a 12-gon inscribed in the
    zone box with per-vertex radius jitter from integer hashing."""
    bx = zone_boxes(np.asarray([nationkey]))
    xmin, ymin, xmax, ymax = (int(a[0]) for a in bx)
    cx, cy = (xmin + xmax) / 2.0, (ymin + ymax) / 2.0
    rx, ry = (xmax - xmin) / 2.0, (ymax - ymin) / 2.0
    k = 12
    i = np.arange(k, dtype=np.int64)
    jitter = 0.55 + 0.45 * (((nationkey * 7919 + i * 104729) % 1000) / 1000.0)
    ang = 2.0 * np.pi * i / k
    xs = cx + rx * jitter * np.cos(ang)
    ys = cy + ry * jitter * np.sin(ang)
    ring = np.stack([np.append(xs, xs[0]), np.append(ys, ys[0])], axis=1)
    return [ring]
