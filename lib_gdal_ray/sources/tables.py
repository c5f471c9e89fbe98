"""Table sources: column-pruned parquet readers.

The v0 storage format is Parquet (Lance is the production target per
the north rule; `read_fn` is the seam — `ray.data.read_parquet` and a
future `read_lance` share the signature). Always pass ``columns`` so
only needed columns leave storage (SURVEY.md "prune at the read").
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import ray.data


def read_table(sf_dir: str, name: str, columns: Optional[Sequence[str]] = None,
               **kwargs) -> ray.data.Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=list(columns) if columns else None, **kwargs)


def read_table_arrow(sf_dir: str, name: str, columns: Optional[Sequence[str]] = None):
    """Driver-side small-table read -> pyarrow.Table (for broadcast sides)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    return pq.read_table(path, columns=list(columns) if columns else None)
