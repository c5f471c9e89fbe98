"""Zonal statistics — the canonical raster×vector join+aggregate.

Reference: `alg/zonal.cpp:37,251-616` (GDALZonalStatsImpl): pixels (or
here, point observations) are assigned to vector zones, then per-zone
count/min/max/mean/sum are reduced. Ray shape: broadcast PIP join
(zones are the small side) → partial+final `grouped_agg` on zone_id —
zero shuffle for the join, one narrow shuffle for the aggregate.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import ray.data

from .relational import grouped_agg
from .spatial_join import broadcast_pip_join


def zonal_stats(points: ray.data.Dataset, zones: pa.Table,
                zone_wkb_col: str, zone_id_col: str, value_col: str,
                res: float = 5.0,
                lon_col: str = "lon", lat_col: str = "lat",
                round_to: Optional[int] = 4) -> ray.data.Dataset:
    joined = broadcast_pip_join(points, zones, zone_wkb_col, [zone_id_col],
                                res=res, lon_col=lon_col, lat_col=lat_col)
    return grouped_agg(joined, zone_id_col, [
        ("count", None, "n"),
        ("sum", value_col, "sum_val"),
        ("min", value_col, "min_val"),
        ("max", value_col, "max_val"),
        ("mean", value_col, "avg_val"),
    ], round_to=round_to)
