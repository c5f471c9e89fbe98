"""Pure-numpy geometry kernels: WKB codec, cell grids, PIP, projection.

These are the compute kernels the Ray Data stages call inside
``map_batches``. No GEOS/PROJ/GDAL — semantics are re-derived from the
reference (see per-module docstrings) and pinned by tests.
"""
