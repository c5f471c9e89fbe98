"""Sinks: partitioned parquet writes.

Reference: `gdal vector partition` Hive-style layout
(`apps/gdalalg_vector_partition.cpp:87-92` — `field=value/` dirs,
`__HIVE_DEFAULT_PARTITION__` for nulls). Ray Data's `write_parquet`
already writes a directory of part files per block; partition columns
use pyarrow's partitioning with the same null marker.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def write_partitioned(ds: ray.data.Dataset, path: str,
                      partition_cols: Optional[List[str]] = None) -> None:
    if not partition_cols:
        ds.write_parquet(path)
        return

    # encode nulls in partition columns as the Hive marker (string cols)
    def fill(batch: pa.Table) -> pa.Table:
        for c in partition_cols:
            col = batch[c]
            if pa.types.is_string(col.type):
                batch = batch.set_column(
                    batch.column_names.index(c), c, pc.fill_null(col, HIVE_NULL))
        return batch

    ds.map_batches(fill, batch_format="pyarrow").write_parquet(
        path, partition_cols=partition_cols)
