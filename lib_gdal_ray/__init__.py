"""lib_gdal_ray — a Ray-Data-native spatial-join + tiling engine.

Built from scratch against the *semantics* of GDAL 3.12 (reference at
/root/reference, surveyed in SURVEY.md): vector spatial joins
(point-in-polygon via ray casting over cell-indexed partitions), kNN
with cell-ring expansion, coordinate reprojection, rasterize /
tile-pyramid generation, plus the relational surface of OGR SQL
(filter / project / aggregate / join / sort / distinct) — all expressed
as ray.data.Dataset pipelines over zero-copy Arrow batches.

No GDAL/GEOS/PROJ code is used or linked; geometry travels as WKB
binary columns (GDAL's own Arrow contract, ogrlayerarrow.cpp:679-706)
and every kernel is numpy-vectorized.
"""

__version__ = "0.1.0"
