"""Table sources: column-pruned Lance/Parquet readers.

The north rule's production format is Lance; the sandbox test data is
Parquet. ``read_table`` dispatches on what exists on disk: a
``<name>.lance`` dataset directory reads through
``ray.data.read_lance`` (column projection pushed down to the Lance
fragment reader), else ``<name>.parquet`` through
``ray.data.read_parquet``. Both share the (path, columns) signature, so
every pipeline is storage-agnostic. Always pass ``columns`` so only
needed columns leave storage (SURVEY.md "prune at the read").
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import ray.data


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_table(sf_dir: str, name: str, columns: Optional[Sequence[str]] = None,
               **kwargs) -> ray.data.Dataset:
    cols = list(columns) if columns else None
    lance_path = os.path.join(sf_dir, f"{name}.lance")
    if os.path.isdir(lance_path):
        if not lance_available():
            raise ImportError(
                f"{lance_path} is a Lance dataset but the 'lance' package "
                "is not installed in this environment")
        return ray.data.read_lance(lance_path, columns=cols, **kwargs)
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=cols, **kwargs)


def read_table_arrow(sf_dir: str, name: str, columns: Optional[Sequence[str]] = None):
    """Driver-side small-table read -> pyarrow.Table (for broadcast sides)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    return pq.read_table(path, columns=list(columns) if columns else None)
