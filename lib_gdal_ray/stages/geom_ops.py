"""Geometry unary operators over WKB columns — stateless map_batches.

Re-derivations of the OGR geometry methods the catalog needs
(`ogr/ogrgeometry.cpp` Centroid `:4374`-ish / get_Area, and the
envelope math of `OGREnvelope`):

* `centroid_area` — area-weighted polygon centroid + shoelace area
  (standard surveyor's formula; equals GDAL/GEOS for valid simple
  polygons). For multipolygons: area-weighted combination.
* `envelope` — bbox columns from WKB.
* `envelope_buffer` — grow the envelope by d (the cheap buffer the
  spatial-filter funnel uses; full GEOS-style round-join buffer is out
  of scope without GEOS and documented as such).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import wkb


def _ring_area_centroid(ring: np.ndarray):
    """Signed shoelace area and area-weighted centroid of one ring."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cross = x * y1 - x1 * y
    a = cross.sum() / 2.0
    if a == 0.0:
        return 0.0, ring[:, 0].mean(), ring[:, 1].mean()
    cx = ((x + x1) * cross).sum() / (6.0 * a)
    cy = ((y + y1) * cross).sum() / (6.0 * a)
    return a, cx, cy


def wkb_centroid_area(buf: bytes):
    """-> (centroid_x, centroid_y, area). Holes subtract (their signed
    area is opposite if wound oppositely; we use |outer| - |holes| by
    odd-even convention: every ring's |area| beyond the first subtracts)."""
    kind, payload = wkb.parse_wkb(buf)
    if kind == "point":
        return float(payload[0, 0]), float(payload[0, 1]), 0.0
    if kind == "linestring":
        return float(payload[:, 0].mean()), float(payload[:, 1].mean()), 0.0
    polys = [payload] if kind == "polygon" else payload
    total_a, sx, sy = 0.0, 0.0, 0.0
    for rings in polys:
        for ri, ring in enumerate(rings):
            a, cx, cy = _ring_area_centroid(ring)
            a = abs(a) if ri == 0 else -abs(a)
            total_a += a
            sx += cx * a
            sy += cy * a
    if total_a == 0.0:
        return 0.0, 0.0, 0.0
    return sx / total_a, sy / total_a, total_a


def centroid_area(ds: ray.data.Dataset, wkb_col: str = "geometry") -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        bufs = batch[wkb_col].to_numpy(zero_copy_only=False)
        cx = np.empty(len(bufs))
        cy = np.empty(len(bufs))
        ar = np.empty(len(bufs))
        for i, b in enumerate(bufs):
            cx[i], cy[i], ar[i] = wkb_centroid_area(b)
        batch = batch.append_column("centroid_x", pa.array(cx))
        batch = batch.append_column("centroid_y", pa.array(cy))
        batch = batch.append_column("area", pa.array(ar))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def envelope(ds: ray.data.Dataset, wkb_col: str = "geometry",
             prefix: str = "") -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        bbox = wkb.wkb_bbox(batch[wkb_col].to_numpy(zero_copy_only=False))
        for i, name in enumerate(("xmin", "ymin", "xmax", "ymax")):
            batch = batch.append_column(prefix + name, pa.array(bbox[:, i]))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def envelope_buffer(ds: ray.data.Dataset, dist: float,
                    wkb_col: str = "geometry", prefix: str = "buf_") -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        bbox = wkb.wkb_bbox(batch[wkb_col].to_numpy(zero_copy_only=False))
        grown = bbox + np.asarray([-dist, -dist, dist, dist])
        for i, name in enumerate(("xmin", "ymin", "xmax", "ymax")):
            batch = batch.append_column(prefix + name, pa.array(grown[:, i]))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def dissolve_geometry(ds: ray.data.Dataset, wkb_col: str = "geometry",
                      snap: float = 1e-9) -> ray.data.Dataset:
    """Merge fragmented overlay output (disjoint convex pieces) into
    clean multipolygons per row — the surface-form parity pass for the
    reference's GEOS-backed layer algebra (`ogrlayer.cpp:5384-5448`,
    PROMOTE_TO_MULTI). Stateless map_batches; area/point-set preserved
    (geom/dissolve.py; identities pinned in tests/test_dissolve.py)."""
    from ..geom.dissolve import dissolve_wkb

    def fn(batch: pa.Table) -> pa.Table:
        bufs = batch[wkb_col].to_numpy(zero_copy_only=False)
        out = [dissolve_wkb(b, snap) for b in bufs]
        keep = np.asarray([o is not None for o in out])
        batch = batch.drop_columns([wkb_col]).append_column(
            wkb_col, pa.array(out, type=pa.binary()))
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def _map_wkb_column(ds: ray.data.Dataset, wkb_col: str, fn, drop_none: bool
                    ) -> ray.data.Dataset:
    def stage(batch: pa.Table) -> pa.Table:
        bufs = batch[wkb_col].to_numpy(zero_copy_only=False)
        out = [fn(b) for b in bufs]
        batch = batch.drop_columns([wkb_col]).append_column(
            wkb_col, pa.array(out, type=pa.binary()))
        if drop_none:
            keep = np.asarray([o is not None for o in out])
            batch = batch.filter(pa.array(keep))
        return batch

    return ds.map_batches(stage, batch_format="pyarrow")


def buffer_geometry(ds: ray.data.Dataset, dist: float, quadsegs: int = 8,
                    wkb_col: str = "geometry") -> ray.data.Dataset:
    """OGRGeometry::Buffer analog (`ogr/ogrgeometry.cpp`, pipeline step
    `apps/gdalalg_vector_buffer.cpp`): positive round-join buffer, arcs
    discretized at `quadsegs` segments per quadrant (geom/unary.py)."""
    from ..geom.unary import buffer_wkb

    return _map_wkb_column(ds, wkb_col,
                           lambda b: buffer_wkb(b, dist, quadsegs), True)


def simplify_geometry(ds: ray.data.Dataset, tol: float,
                      wkb_col: str = "geometry") -> ray.data.Dataset:
    """OGRGeometry::Simplify analog (Douglas–Peucker per ring; collapsed
    rows drop, matching GEOS's empty-geometry result)."""
    from ..geom.unary import simplify_wkb

    return _map_wkb_column(ds, wkb_col, lambda b: simplify_wkb(b, tol), True)


def segmentize_geometry(ds: ray.data.Dataset, max_length: float,
                        wkb_col: str = "geometry") -> ray.data.Dataset:
    """OGRGeometry::segmentize analog: bound every segment length."""
    from ..geom.unary import segmentize_wkb

    return _map_wkb_column(ds, wkb_col,
                           lambda b: segmentize_wkb(b, max_length), False)


def transform_geometry(ds: ray.data.Dataset, src_epsg: int, dst_epsg: int,
                       wkb_col: str = "geometry") -> ray.data.Dataset:
    """OGRGeometry::transform analog: reproject every vertex of the WKB
    geometry column between EPSG codes (ogr2ogr -s_srs/-t_srs). The
    transformer is fetched from the per-worker registry (geom/proj.py)
    once per batch — stateless map, no shuffle."""
    from ..geom import proj as projm
    from ..geom import wkb as wkb_mod

    def fn(buf: bytes):
        t = projm.Transformer.get(src_epsg, dst_epsg)
        return wkb_mod.transform_wkb(buf, t.transform)

    return _map_wkb_column(ds, wkb_col, fn, False)


def convex_hull_geometry(ds: ray.data.Dataset, wkb_col: str = "geometry"
                         ) -> ray.data.Dataset:
    """OGRGeometry::ConvexHull analog (Andrew monotone chain)."""
    from ..geom.unary import convex_hull_wkb

    return _map_wkb_column(ds, wkb_col, convex_hull_wkb, False)


def make_valid_geometry(ds: ray.data.Dataset, wkb_col: str = "geometry"
                        ) -> ray.data.Dataset:
    """OGRGeometry::MakeValid analog: planar-arrangement even-odd repair
    of self-intersecting polygons (geom/makevalid.py); empty results
    drop."""
    from ..geom.makevalid import make_valid_wkb

    return _map_wkb_column(ds, wkb_col, make_valid_wkb, True)


def delaunay_geometry(ds: ray.data.Dataset, only_edges: bool = False,
                      wkb_col: str = "geometry") -> ray.data.Dataset:
    """OGRGeometry::DelaunayTriangulation analog
    (`ogr/ogrgeometry.cpp:4374`): geometry -> GeometryCollection of
    triangles (or MultiLineString of edges)."""
    from ..geom.unary import delaunay_triangulation_wkb

    return _map_wkb_column(
        ds, wkb_col, lambda b: delaunay_triangulation_wkb(b, only_edges), False)


def concave_hull_geometry(ds: ray.data.Dataset, ratio: float = 0.5,
                          wkb_col: str = "geometry") -> ray.data.Dataset:
    """OGR_G_ConcaveHull analog (GEOS concaveHullByLengthRatio;
    chi-shape erosion over the Delaunay triangulation)."""
    from ..geom.unary import concave_hull_wkb

    return _map_wkb_column(ds, wkb_col,
                           lambda b: concave_hull_wkb(b, ratio), False)


def wrap_dateline_geometry(ds: ray.data.Dataset, offset: float = 10.0,
                           wkb_col: str = "geometry") -> ray.data.Dataset:
    """OGRGeometryFactory::transformWithOptions(WRAPDATELINE=YES) analog
    (`ogr/ogrgeometryfactory.cpp`): split dateline-crossing geometries
    at lon=180 into multi-part geometries within [-180, 180]."""
    from ..geom.unary import wrap_dateline_wkb

    return _map_wkb_column(ds, wkb_col,
                           lambda b: wrap_dateline_wkb(b, offset), False)


def swap_xy_geometry(ds: ray.data.Dataset, wkb_col: str = "geometry"
                     ) -> ray.data.Dataset:
    """gdal vector swap-xy."""
    from ..geom.unary import swap_xy_wkb

    return _map_wkb_column(ds, wkb_col, swap_xy_wkb, False)


def explode_collections(ds: ray.data.Dataset, wkb_col: str = "geometry"
                        ) -> ray.data.Dataset:
    """gdal vector explode-collections: one output row per single-part
    geometry; other columns replicate (flat_map expressed as a
    vectorized in-batch explode)."""
    import numpy as np
    import pyarrow as pa

    from ..geom.unary import explode_collection_wkb

    def fn(batch: pa.Table) -> pa.Table:
        bufs = batch[wkb_col].to_pylist()
        parts, reps = [], []
        for b in bufs:
            p = explode_collection_wkb(b) if b is not None else [None]
            parts.extend(p)
            reps.append(len(p))
        idx = pa.array(np.repeat(np.arange(len(bufs)), reps))
        out = batch.drop_columns([wkb_col]).take(idx)
        return out.append_column(wkb_col, pa.array(parts, type=pa.binary()))

    return ds.map_batches(fn, batch_format="pyarrow")


def make_point(ds: ray.data.Dataset, x_col: str, y_col: str,
               wkb_col: str = "geometry") -> ray.data.Dataset:
    """gdal vector make-point (`apps/gdalalg_vector_make_point.cpp`):
    two numeric fields -> WKB point geometry column."""
    import pyarrow as pa

    from ..geom import wkb as W

    def fn(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            wkb_col, pa.array(list(W.points_to_wkb(x, y)), type=pa.binary()))

    return ds.map_batches(fn, batch_format="pyarrow")


def _check_one_geometry(buf):
    """-> (is_valid, reason) per OGRGeometry::IsValid checks:
    ring closure, minimum point counts, self-intersection of rings
    (apps/gdalalg_vector_check_geometry.cpp surface)."""
    import numpy as np

    from ..geom import wkb as W

    if buf is None:
        return False, "null geometry"
    kind, payload = W.parse_wkb(buf)
    if kind == "point":
        return True, ""
    if kind in ("linestring", "multilinestring"):
        lines = [payload] if kind == "linestring" else payload
        for ln in lines:
            if len(ln) < 2:
                return False, "linestring with < 2 points"
        return True, ""
    if kind in ("polygon", "multipolygon"):
        polys = [payload] if kind == "polygon" else payload
        for rings in polys:
            for ring in rings:
                r = np.asarray(ring, dtype=np.float64)
                if len(r) < 4:
                    return False, "ring with < 4 points"
                if not np.array_equal(r[0], r[-1]):
                    return False, "unclosed ring"
                # O(k^2) proper self-intersection test per ring
                # (bounded: validity checks run on single features)
                n = len(r) - 1
                for i in range(n):
                    a, b = r[i], r[i + 1]
                    for j in range(i + 2, n):
                        if i == 0 and j == n - 1:
                            continue
                        c, d = r[j], r[j + 1]
                        d1 = np.cross(b - a, c - a)
                        d2 = np.cross(b - a, d - a)
                        d3 = np.cross(d - c, a - c)
                        d4 = np.cross(d - c, b - c)
                        if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                            return False, "ring self-intersection"
        return True, ""
    if kind in ("multipoint", "geometrycollection"):
        return True, ""
    return False, f"unknown type {kind}"


def check_geometry(ds: ray.data.Dataset, wkb_col: str = "geometry"
                   ) -> ray.data.Dataset:
    """gdal vector check-geometry: adds is_valid + invalid_reason."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        res = [_check_one_geometry(b) for b in batch[wkb_col].to_pylist()]
        batch = batch.append_column(
            "is_valid", pa.array([v for v, _ in res], type=pa.bool_()))
        return batch.append_column(
            "invalid_reason", pa.array([r for _, r in res], type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
