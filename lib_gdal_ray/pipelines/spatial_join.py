"""Two-phase distributed spatial join (point-in-polygon).

Reference semantics: OGR layer-algebra Intersection / spatial filter
(`ogr/ogrsf_frmts/generic/ogrlayer.cpp:5204-5448` and `:3700-3960`):
stage 1 envelope/cell pretest, stage 2 exact refinement. Here:

* **broadcast variant** — polygon side is small (dimension-table case,
  matching OGR's lookup-join cost model): decode + cell-index the
  polygons once per actor (`__init__`), then for each point batch look
  up candidate polygons by grid cell and refine with vectorized
  ray-casting PIP (`geom.pip`, parity with `ogrlinearring.cpp:443`).
  Zero shuffle — the 100 TB scale path when the polygon side fits in
  worker memory (ray.put once, read per actor).

* **shuffle variant** — both sides large: points get 1 cell each,
  polygons are replicated to covering cells
  (`stages.cell_assign.explode_covering_cells`), both sides co-partition
  via a single `groupby(cell_id)` shuffle, and a per-group kernel builds
  the polygon index and probes the points. Hot cells are salted
  (`salt` sub-keys; polygon rows replicated to every salt — SURVEY.md
  §7.3). Points land in exactly one cell, so no pair dedup is needed
  (PBSM dedup only matters for area×area joins).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..geom import cells, pip, wkb


# ---------------------------------------------------------------------------
# Polygon-side index (shared by both variants)
# ---------------------------------------------------------------------------


class PolygonCellIndex:
    """cell_id -> candidate polygon indices, plus decoded rings/bboxes.

    The per-actor analog of GDAL's prepared-geometry spatial filter
    (`ogrlayer.cpp:3739-3742`): built once, probed per batch.
    """

    def __init__(self, poly_table: pa.Table, wkb_col: str, res: float):
        self.res = res
        wkbs = poly_table[wkb_col].to_numpy(zero_copy_only=False)
        self.rings: List[list] = []
        for b in wkbs:
            kind, payload = wkb.parse_wkb(b)
            if kind == "polygon":
                self.rings.append([payload])
            elif kind == "multipolygon":
                self.rings.append(payload)
            elif kind == "geometrycollection":
                polys = wkb.collection_polygons(payload)
                if not polys:
                    raise ValueError(
                        "geometrycollection on the polygon side has no areal members")
                self.rings.append(polys)
            else:
                raise ValueError(f"polygon side must be (multi)polygon, got {kind}")
        self.bbox = wkb.wkb_bbox(wkbs)
        offsets, cc = cells.covering_grid(
            self.bbox[:, 0], self.bbox[:, 1], self.bbox[:, 2], self.bbox[:, 3], res
        )
        order = np.argsort(cc, kind="stable")
        cc_sorted = cc[order]
        poly_idx = np.repeat(np.arange(len(wkbs), dtype=np.int64), np.diff(offsets))[order]
        uniq, starts = np.unique(cc_sorted, return_index=True)
        self._cells = uniq
        self._starts = np.append(starts, len(cc_sorted))
        self._poly_idx = poly_idx

    def candidates(self, cell: int) -> np.ndarray:
        i = np.searchsorted(self._cells, cell)
        if i >= len(self._cells) or self._cells[i] != cell:
            return np.empty(0, dtype=np.int64)
        return self._poly_idx[self._starts[i]:self._starts[i + 1]]

    def batch_candidates(self, bbox: np.ndarray) -> List[np.ndarray]:
        """Sorted unique candidate ids per input bbox — ONE vectorized
        covering_grid + cell lookup for the whole batch (a per-row
        covering_grid loop costs ~150 us/row in allocations; measured
        3 s/batch on 20k-geometry overlay batches)."""
        offs, cc = cells.covering_grid(bbox[:, 0], bbox[:, 1],
                                       bbox[:, 2], bbox[:, 3], self.res)
        pos = np.searchsorted(self._cells, cc)
        pos_c = np.clip(pos, 0, max(len(self._cells) - 1, 0))
        valid = (pos < len(self._cells)) & (self._cells[pos_c] == cc)
        out = []
        empty = np.empty(0, dtype=np.int64)
        for i in range(len(bbox)):
            v = np.flatnonzero(valid[offs[i]:offs[i + 1]]) + offs[i]
            if len(v) == 0:
                out.append(empty)
                continue
            parts = [self._poly_idx[self._starts[pos[j]]:self._starts[pos[j] + 1]]
                     for j in v]
            out.append(np.unique(np.concatenate(parts)))
        return out

    def refine(self, px: np.ndarray, py: np.ndarray, poly_i: int,
               predicate: str = "pip") -> np.ndarray:
        """predicate: 'pip' = exact ray-casting containment;
        'envelope' = inclusive bbox test only (the driver-level contract
        of OGR's SetSpatialFilter, ogrlayer.cpp:3286-3292)."""
        xmin, ymin, xmax, ymax = self.bbox[poly_i]
        mask = (px >= xmin) & (px <= xmax) & (py >= ymin) & (py <= ymax)
        if predicate == "envelope" or not mask.any():
            return mask
        sub = np.flatnonzero(mask)
        inside = pip.points_in_multipolygon(px[sub], py[sub], self.rings[poly_i])
        out = np.zeros(len(px), dtype=bool)
        out[sub] = inside
        return out


def _join_points_to_index(index: PolygonCellIndex, batch: pa.Table,
                          lon_col: str, lat_col: str,
                          poly_table: pa.Table, poly_cols: Sequence[str],
                          how: str, predicate: str = "pip") -> pa.Table:
    px = batch[lon_col].to_numpy(zero_copy_only=False)
    py = batch[lat_col].to_numpy(zero_copy_only=False)
    cell = cells.grid_cell(px, py, index.res)
    order = np.argsort(cell, kind="stable")
    out_pt_idx: List[np.ndarray] = []
    out_poly_idx: List[np.ndarray] = []
    uniq, starts = np.unique(cell[order], return_index=True)
    bounds = np.append(starts, len(order))
    for u in range(len(uniq)):
        rows = order[bounds[u]:bounds[u + 1]]
        cand = index.candidates(int(uniq[u]))
        for poly_i in cand:
            hit = index.refine(px[rows], py[rows], int(poly_i), predicate)
            if hit.any():
                sel = rows[hit]
                out_pt_idx.append(sel)
                out_poly_idx.append(np.full(len(sel), poly_i, dtype=np.int64))
    if out_pt_idx:
        pt_idx = np.concatenate(out_pt_idx)
        pl_idx = np.concatenate(out_poly_idx)
    else:
        pt_idx = np.empty(0, dtype=np.int64)
        pl_idx = np.empty(0, dtype=np.int64)

    if how in ("semi", "anti"):
        # layer-algebra Clip / Erase for point inputs
        # (ogrlayer.cpp:7356 Clip = keep matching once; :7665 Erase = anti)
        matched = np.zeros(len(batch), dtype=bool)
        matched[pt_idx] = True
        keep = matched if how == "semi" else ~matched
        return batch.filter(pa.array(keep))

    if how == "left":
        matched = np.zeros(len(batch), dtype=bool)
        matched[pt_idx] = True  # rows with >=1 match
        unmatched = np.flatnonzero(~matched)
        left = batch.take(pa.array(np.concatenate([pt_idx, unmatched])))
        right_parts = []
        for c in poly_cols:
            col = poly_table[c].take(pa.array(pl_idx))
            nulls = pa.nulls(len(unmatched), type=col.type)
            right_parts.append(pa.concat_arrays([col.combine_chunks(), nulls]))
        out = left
        for c, arr in zip(poly_cols, right_parts):
            out = out.append_column(c, arr)
        return out

    out = batch.take(pa.array(pt_idx))
    for c in poly_cols:
        out = out.append_column(c, poly_table[c].take(pa.array(pl_idx)))
    return out


class _BroadcastPIPJoiner:
    def __init__(self, wrapped_ref, wkb_col, res, lon_col, lat_col, poly_cols, how,
                 predicate="pip"):
        self.poly_table = ray.get(wrapped_ref["ref"])
        self.index = PolygonCellIndex(self.poly_table, wkb_col, res)
        self.lon_col, self.lat_col = lon_col, lat_col
        self.poly_cols = poly_cols
        self.how = how
        self.predicate = predicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _join_points_to_index(
            self.index, batch, self.lon_col, self.lat_col,
            self.poly_table, self.poly_cols, self.how, self.predicate,
        )


def broadcast_pip_join(points: ray.data.Dataset, polygons: pa.Table,
                       poly_wkb_col: str, poly_cols: Sequence[str],
                       res: float = 5.0,
                       lon_col: str = "lon", lat_col: str = "lat",
                       how: str = "inner",
                       concurrency: Union[int, Tuple[int, int]] = (1, 16),
                       predicate: str = "pip") -> ray.data.Dataset:
    """Inner/left PIP join of a point Dataset against a broadcast
    polygon table. Emits one row per (point, containing polygon).

    Task-pool stage with a per-worker-process index cache
    (state/worker_cache.py): the cell index builds ONCE per worker from
    the broadcast ref — same prepared-geometry guarantee as an actor
    pool without the pool's cold-start (measured ~1-2 s/query saved at
    small SF; `concurrency` kept for API compat)."""
    ref = ray.put(polygons)
    key = ref.hex()
    pc_list = list(poly_cols)

    def joiner(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        tbl, index = get_or_build(key, lambda: (
            lambda t: (t, PolygonCellIndex(t, poly_wkb_col, res)))(ray.get(ref)))
        return _join_points_to_index(index, batch, lon_col, lat_col,
                                     tbl, pc_list, how, predicate)

    return points.map_batches(joiner, batch_format="pyarrow")


class _BoxIntersectionJoiner:
    """Layer-algebra Intersection with geometry output for a box method
    layer (`ogrlayer.cpp:5204-5448`): candidate boxes by cell index,
    output geometry = input polygon clipped to the box (exact for the
    convex clipper — geom/clip.py), KEEP_LOWER_DIMENSION_GEOMETRIES
    False semantics (degenerate clips drop)."""

    def __init__(self, wrapped_ref, res, poly_cols):
        from ..geom.clip import clip_wkb_to_box

        self._clip = clip_wkb_to_box
        self.table = ray.get(wrapped_ref["ref"])
        self.bbox = wkb.wkb_bbox(self.table["geometry"].to_numpy(zero_copy_only=False))
        self.index = PolygonCellIndex(self.table, "geometry", res)
        self.poly_cols = poly_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.geom_ops import wkb_centroid_area

        bufs = batch["geometry"].to_numpy(zero_copy_only=False)
        in_bbox = wkb.wkb_bbox(bufs)
        cands_all = self.index.batch_candidates(in_bbox)
        out_rows, out_zone, out_geom, out_area = [], [], [], []
        for i, b in enumerate(bufs):
            xmin, ymin, xmax, ymax = in_bbox[i]
            for zi in cands_all[i]:
                zxmin, zymin, zxmax, zymax = self.bbox[zi]
                if xmax < zxmin or xmin > zxmax or ymax < zymin or ymin > zymax:
                    continue
                clipped = self._clip(b, zxmin, zymin, zxmax, zymax)
                if clipped is None:
                    continue
                _cx, _cy, area = wkb_centroid_area(clipped)
                if area <= 0:
                    continue
                out_rows.append(i)
                out_zone.append(zi)
                out_geom.append(clipped)
                out_area.append(area)
        out = batch.take(pa.array(np.asarray(out_rows, dtype=np.int64)))
        out = out.drop_columns(["geometry"])
        out = out.append_column("geometry", pa.array(out_geom, type=pa.binary()))
        out = out.append_column("intersection_area", pa.array(out_area))
        for c in self.poly_cols:
            out = out.append_column(
                c, self.table[c].take(pa.array(np.asarray(out_zone, dtype=np.int64))))
        return out


class _PolyIntersectionJoiner:
    """General simple-polygon × simple-polygon Intersection (hole-free;
    geom/triangulate.py convex-decomposition kernel)."""

    def __init__(self, wrapped_ref, res, poly_cols):
        from ..geom.triangulate import intersect_simple_polygons

        self._isect = intersect_simple_polygons
        self.table = ray.get(wrapped_ref["ref"])
        self.index = PolygonCellIndex(self.table, "geometry", res)
        self.bbox = self.index.bbox
        self.method_bufs = self.table["geometry"].to_numpy(zero_copy_only=False)
        self.poly_cols = poly_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom import cells as cellsm
        from ..stages.geom_ops import wkb_centroid_area

        bufs = batch["geometry"].to_numpy(zero_copy_only=False)
        in_bbox = wkb.wkb_bbox(bufs)
        cands_all = self.index.batch_candidates(in_bbox)
        out_rows, out_m, out_geom, out_area = [], [], [], []
        for i, b in enumerate(bufs):
            xmin, ymin, xmax, ymax = in_bbox[i]
            for mi in cands_all[i]:
                mxmin, mymin, mxmax, mymax = self.bbox[mi]
                if xmax < mxmin or xmin > mxmax or ymax < mymin or ymin > mymax:
                    continue  # envelope pretest (ogrlayer.cpp:5285)
                clipped = self._isect(b, self.method_bufs[mi])
                if clipped is None:
                    continue
                _cx, _cy, area = wkb_centroid_area(clipped)
                if area <= 1e-12:
                    continue
                out_rows.append(i)
                out_m.append(mi)
                out_geom.append(clipped)
                out_area.append(area)
        out = batch.take(pa.array(np.asarray(out_rows, dtype=np.int64)))
        out = out.drop_columns(["geometry"])
        out = out.append_column("geometry", pa.array(out_geom, type=pa.binary()))
        out = out.append_column("intersection_area", pa.array(out_area))
        for c in self.poly_cols:
            out = out.append_column(
                c, self.table[c].take(pa.array(np.asarray(out_m, dtype=np.int64))))
        return out


class _PolyEraseJoiner:
    """Layer-algebra Erase with geometry output (`ogrlayer.cpp:7665`):
    input polygon minus every overlapping method polygon (sequential
    convex-fragment subtraction, geom/boolean.py)."""

    def __init__(self, wrapped_ref, res):
        from ..geom.boolean import polygon_difference

        self._diff = polygon_difference
        self.table = ray.get(wrapped_ref["ref"])
        self.index = PolygonCellIndex(self.table, "geometry", res)
        self.bbox = self.index.bbox
        self.method_bufs = self.table["geometry"].to_numpy(zero_copy_only=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom import cells as cellsm
        from ..stages.geom_ops import wkb_centroid_area

        bufs = batch["geometry"].to_numpy(zero_copy_only=False)
        in_bbox = wkb.wkb_bbox(bufs)
        cands_all = self.index.batch_candidates(in_bbox)
        keep_rows, out_geom, out_area = [], [], []
        for i, b in enumerate(bufs):
            xmin, ymin, xmax, ymax = in_bbox[i]
            cur = b
            for mi in cands_all[i]:
                mxmin, mymin, mxmax, mymax = self.bbox[mi]
                if xmax < mxmin or xmin > mxmax or ymax < mymin or ymin > mymax:
                    continue
                cur = self._diff(cur, self.method_bufs[mi])
                if cur is None:
                    break
            if cur is None:
                continue
            _cx, _cy, a = wkb_centroid_area(cur)
            keep_rows.append(i)
            out_geom.append(cur)
            out_area.append(a)
        out = batch.take(pa.array(np.asarray(keep_rows, dtype=np.int64)))
        out = out.drop_columns(["geometry"])
        out = out.append_column("geometry", pa.array(out_geom, type=pa.binary()))
        return out.append_column("remaining_area", pa.array(out_area))


class _PolyOverlayJoiner:
    """Fused Intersection + Erase in ONE pass over the input (the
    one-partitioning-pass pattern): each input polygon is clipped
    against its candidate method polygons, emitting every intersection
    fragment AND the erase residual from the same candidate walk —
    layer_union's first two parts without a second input scan
    (`ogrlayer.cpp:5622` computes them feature-by-feature the same
    way)."""

    def __init__(self, wrapped_ref, res, poly_cols, emit_intersections=True):
        from ..geom.boolean import polygon_difference
        from ..geom.triangulate import intersect_simple_polygons

        self._isect = intersect_simple_polygons
        self._diff = polygon_difference
        self.table = ray.get(wrapped_ref["ref"])
        self.index = PolygonCellIndex(self.table, "geometry", res)
        self.bbox = self.index.bbox
        self.method_bufs = self.table["geometry"].to_numpy(zero_copy_only=False)
        self.poly_cols = poly_cols
        self.emit_intersections = emit_intersections

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.geom_ops import wkb_centroid_area

        bufs = batch["geometry"].to_numpy(zero_copy_only=False)
        in_bbox = wkb.wkb_bbox(bufs)
        cands_all = self.index.batch_candidates(in_bbox)
        rows, mids, geoms, srcs = [], [], [], []
        for i, b in enumerate(bufs):
            xmin, ymin, xmax, ymax = in_bbox[i]
            cur = b
            for mi in cands_all[i]:
                mxmin, mymin, mxmax, mymax = self.bbox[mi]
                if xmax < mxmin or xmin > mxmax or ymax < mymin or ymin > mymax:
                    continue
                if self.emit_intersections:
                    clipped = self._isect(b, self.method_bufs[mi])
                    if clipped is not None:
                        _cx, _cy, area = wkb_centroid_area(clipped)
                        if area > 1e-12:
                            rows.append(i)
                            mids.append(mi)
                            geoms.append(clipped)
                            srcs.append("intersection")
                if cur is not None:
                    cur = self._diff(cur, self.method_bufs[mi])
            if cur is not None:
                rows.append(i)
                mids.append(None)
                geoms.append(cur)
                srcs.append("input_only")
        out = batch.take(pa.array(np.asarray(rows, dtype=np.int64)))
        out = out.drop_columns(["geometry"])
        out = out.append_column("geometry", pa.array(geoms, type=pa.binary()))
        out = out.append_column("src", pa.array(srcs, type=pa.string()))
        take_m = pa.array(mids, type=pa.int64())   # None -> null on take
        for c in self.poly_cols:
            out = out.append_column(c, self.table[c].take(take_m))
        return out


def broadcast_overlay_pass(polys: ray.data.Dataset, method,
                           method_cols: Sequence[str], res: float = 5.0,
                           emit_intersections: bool = True,
                           ) -> ray.data.Dataset:
    """One fused input pass -> tagged input_only + intersection rows
    (method cols null on input_only rows)."""
    ref = method if isinstance(method, ray.ObjectRef) else ray.put(method)
    key = ref.hex()

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(
            key + f":overlay:{emit_intersections}",
            lambda: _PolyOverlayJoiner({"ref": ref}, res, list(method_cols),
                                       emit_intersections))
        return j(batch)

    return polys.map_batches(stage, batch_format="pyarrow")


def broadcast_polygon_erase(polys: ray.data.Dataset, method,
                            res: float = 5.0,
                            concurrency: Union[int, Tuple[int, int]] = (1, 8),
                            ) -> ray.data.Dataset:
    """Erase with geometry: input polygons minus all overlapping method
    polygons (hole-free simple polygons; fully-erased rows drop).
    `method` may be a pa.Table or an ObjectRef to one (the ref form lets
    callers assemble the broadcast side inside a Ray task so the bytes
    never pass through the driver)."""
    ref = method if isinstance(method, ray.ObjectRef) else ray.put(method)
    key = ref.hex()

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key + ":erase", lambda: _PolyEraseJoiner({"ref": ref}, res))
        return j(batch)

    return polys.map_batches(stage, batch_format="pyarrow")


def layer_update(polys: ray.data.Dataset, method: pa.Table,
                 res: float = 5.0,
                 concurrency: Union[int, Tuple[int, int]] = (1, 8),
                 ) -> ray.data.Dataset:
    """Layer-algebra Update (`ogrlayer.cpp:7007`): method features
    replace the overlapping parts of the input — result = (input ∖
    method union) ⊎ method features. Input rows fully covered by the
    method layer drop; method rows pass through unchanged (their
    non-geometry fields null on the input side, per the reference's
    schema-merge behavior). Output schema: input columns + `geometry`
    + `src` ('input'|'method')."""
    import ray.data as _rd

    erased = broadcast_polygon_erase(polys, method, res=res, concurrency=concurrency)

    def tag_input(batch: pa.Table) -> pa.Table:
        batch = batch.drop_columns(["remaining_area"])
        return batch.append_column(
            "src", pa.array(np.full(len(batch), "input"), type=pa.string()))

    left = erased.map_batches(tag_input, batch_format="pyarrow")
    schema = left.schema()
    m_cols = {}
    for name, typ in zip(schema.names, schema.types):
        if name == "geometry":
            m_cols[name] = method["geometry"]
        elif name == "src":
            m_cols[name] = pa.array(np.full(len(method), "method"), type=pa.string())
        else:
            m_cols[name] = pa.nulls(len(method), type=typ)
    right = _rd.from_arrow(pa.table(m_cols))
    return left.union(right)


def layer_union(polys: ray.data.Dataset, method: pa.Table,
                res: float = 5.0,
                concurrency: Union[int, Tuple[int, int]] = (1, 8),
                include_intersections: bool = True) -> ray.data.Dataset:
    """Layer-algebra Union (`ogrlayer.cpp:5622`): the full overlay —
    input-only parts (input fields), intersections (both sides'
    fields), method-only parts (method fields). With
    include_intersections=False this is SymDifference
    (`ogrlayer.cpp:6159`). Output adds `src` ∈
    {input_only, intersection, method_only} and `geometry`.

    Requires `method` to carry `zone-like` id columns; input keeps its
    own columns (nulls on rows from the other side)."""
    import ray.data as _rd

    method_cols = [c for c in method.column_names if c != "geometry"]
    # ONE fused input pass computes input_only residuals AND
    # intersection fragments from the same candidate walk (two scans
    # before round 3; _PolyOverlayJoiner)
    parts = [broadcast_overlay_pass(polys, method, method_cols, res=res,
                                    emit_intersections=include_intersections)]
    # method-only parts: method minus the union of all input polygons —
    # cell-partitioned (shuffle_polygon_erase): (M ∖ A) ∩ cell ==
    # (M ∩ cell) ∖ (A ∩ cell), so NEITHER side is ever materialized in
    # one object; the input geometries ship only to the cells they
    # cover. Output rows are per-(method feature × cell) fragments
    # (fragments partition M ∖ A exactly; aggregate by the method id
    # columns for per-feature areas).
    m_ds = _rd.from_arrow(method)
    b_only = shuffle_polygon_erase(m_ds, polys.select_columns(["geometry"]),
                                   method_cols, res=res)

    def tag_method(batch: pa.Table) -> pa.Table:
        batch = batch.drop_columns(
            [c for c in ("cell_id", "fragment_area") if c in batch.column_names])
        return batch.append_column(
            "src", pa.array(np.full(len(batch), "method_only"), type=pa.string()))

    parts.append(b_only.map_batches(tag_method, batch_format="pyarrow"))

    from .relational import union_all

    return union_all(parts)


def layer_symmetric_difference(polys: ray.data.Dataset, method: pa.Table,
                               res: float = 5.0,
                               concurrency: Union[int, Tuple[int, int]] = (1, 8),
                               ) -> ray.data.Dataset:
    """Layer-algebra SymDifference (`ogrlayer.cpp:6159`)."""
    return layer_union(polys, method, res=res, concurrency=concurrency,
                       include_intersections=False)


def broadcast_polygon_intersection(polys: ray.data.Dataset, method: pa.Table,
                                   method_cols: Sequence[str], res: float = 5.0,
                                   concurrency: Union[int, Tuple[int, int]] = (1, 8),
                                   ) -> ray.data.Dataset:
    """Layer-algebra Intersection for arbitrary hole-free simple
    polygons on both sides (fragmented multipolygon output; exact
    area/point-set — see geom/triangulate.py). Task pool + per-worker
    index cache (no actor cold-start; `concurrency` kept for API
    compat)."""
    ref = ray.put(method)
    key = ref.hex()
    cols = list(method_cols)

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key + ":pisect",
                         lambda: _PolyIntersectionJoiner({"ref": ref}, res, cols))
        return j(batch)

    return polys.map_batches(stage, batch_format="pyarrow")


def broadcast_box_intersection(polys: ray.data.Dataset, boxes: pa.Table,
                               box_cols: Sequence[str], res: float = 5.0,
                               concurrency: Union[int, Tuple[int, int]] = (1, 8),
                               ) -> ray.data.Dataset:
    """Polygon-input × box-method-layer Intersection: one row per
    overlapping (polygon, box) with the clipped geometry and its area.
    `boxes` must carry box polygons in a `geometry` WKB column.
    Task pool + per-worker index cache (no actor cold-start)."""
    ref = ray.put(boxes)
    key = ref.hex()
    cols = list(box_cols)

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key + ":bisect",
                         lambda: _BoxIntersectionJoiner({"ref": ref}, res, cols))
        return j(batch)

    return polys.map_batches(stage, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Shuffle variant (both sides large)
# ---------------------------------------------------------------------------


def shuffle_pip_join(points: ray.data.Dataset, polygons: ray.data.Dataset,
                     poly_wkb_col: str, poly_cols: Sequence[str],
                     point_cols: Sequence[str],
                     res: float = 5.0,
                     lon_col: str = "lon", lat_col: str = "lat",
                     num_salts: int = 1,
                     hot_cells: Optional[dict] = None,
                     auto_salt: bool = False,
                     hot_threshold: int = 1_000_000,
                     predicate: str = "pip") -> ray.data.Dataset:
    """Co-partition both sides on grid cell via one groupby shuffle.

    hot_cells: optional {cell_id: n_salts} from a pre-count
    (`precount_cells`) — points in a hot cell are split across salts,
    polygon rows replicated to every salt of each covered cell.
    auto_salt=True runs the pre-count itself (one extra cheap pass;
    SURVEY §4 skew row) with `hot_threshold` rows per cell.
    """
    if auto_salt and hot_cells is None:
        hot_cells = precount_cells(points, res, lon_col, lat_col, hot_threshold)
    from ..stages.cell_assign import explode_covering_cells, with_grid_cell

    hot = hot_cells or {}

    def salt_points(batch: pa.Table) -> pa.Table:
        cell = batch["cell_id"].to_numpy(zero_copy_only=False)
        salt = np.zeros(len(cell), dtype=np.uint64)
        if hot:
            for c, k in hot.items():
                m = cell == np.uint64(c)
                if m.any():
                    idx = np.flatnonzero(m)
                    salt[idx] = (np.arange(len(idx)) % k).astype(np.uint64)
        key = (cell << np.uint64(6)) | salt  # 6 salt bits
        return batch.append_column("__jk", pa.array(key))

    def salt_polys(batch: pa.Table) -> pa.Table:
        cell = batch["cell_id"].to_numpy(zero_copy_only=False)
        reps = np.asarray([hot.get(int(c), 1) for c in cell], dtype=np.int64)
        idx = np.repeat(np.arange(len(cell), dtype=np.int64), reps)
        salts = np.concatenate([np.arange(r, dtype=np.uint64) for r in reps]) if len(reps) else np.empty(0, np.uint64)
        out = batch.take(pa.array(idx))
        key = (cell[idx] << np.uint64(6)) | salts
        return out.append_column("__jk", pa.array(key))

    pts = with_grid_cell(points, res, lon_col=lon_col, lat_col=lat_col)
    pts = pts.map_batches(salt_points, batch_format="pyarrow")
    pts = pts.select_columns(list(dict.fromkeys(list(point_cols) + [lon_col, lat_col, "__jk"])))

    pls = explode_covering_cells(polygons, res, wkb_col=poly_wkb_col)
    pls = pls.map_batches(salt_polys, batch_format="pyarrow")
    pls = pls.select_columns(list(dict.fromkeys(list(poly_cols) + [poly_wkb_col, "__jk"])))

    # Align both sides to one unified Arrow schema before the union so the
    # shuffle never mixes block schemas (mixed schemas previously forced a
    # pandas round-trip whose empty groups upcast int64 -> float64 and broke
    # value-hash parity with the broadcast path).
    pts_schema = pts.schema().base_schema
    pls_schema = pls.schema().base_schema
    unified = list(pts_schema)
    have = {f.name for f in unified}
    unified += [f for f in pls_schema if f.name not in have]
    uni_names = [f.name for f in unified]

    def tag_and_pad(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = []
            for f in unified:
                if f.name in batch.column_names:
                    cols.append(batch[f.name])
                else:
                    cols.append(pa.nulls(n, f.type))
            out_tbl = pa.table(dict(zip(uni_names, cols)))
            return out_tbl.append_column(
                "__side", pa.array(np.full(n, side, dtype=np.int8)))
        return fn

    both = pts.map_batches(tag_and_pad(0), batch_format="pyarrow").union(
        pls.map_batches(tag_and_pad(1), batch_format="pyarrow"))

    out_cols = list(point_cols) + list(poly_cols)

    def join_group(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        p = tbl.filter(pa.array(side == 0))
        g = tbl.filter(pa.array(side == 1))
        if len(p) == 0 or len(g) == 0:
            return tbl.select(out_cols).slice(0, 0)
        index = PolygonCellIndex(g, poly_wkb_col, res=360.0)  # single-cell local index
        px = p[lon_col].to_numpy(zero_copy_only=False)
        py = p[lat_col].to_numpy(zero_copy_only=False)
        pt_idx: List[np.ndarray] = []
        gm_idx: List[np.ndarray] = []
        for poly_i in range(len(g)):
            hit = index.refine(px, py, poly_i, predicate)
            if hit.any():
                ii = np.flatnonzero(hit)
                pt_idx.append(ii)
                gm_idx.append(np.full(len(ii), poly_i, dtype=np.int64))
        if not pt_idx:
            return tbl.select(out_cols).slice(0, 0)
        li = pa.array(np.concatenate(pt_idx))
        gi = pa.array(np.concatenate(gm_idx))
        lt = p.select(list(point_cols)).take(li)
        gt = g.select(list(poly_cols)).take(gi)
        return pa.table(
            {c: lt[c] for c in point_cols} | {c: gt[c] for c in poly_cols})

    return both.groupby("__jk").map_groups(join_group, batch_format="pyarrow")


def precount_cells(points: ray.data.Dataset, res: float,
                   lon_col: str = "lon", lat_col: str = "lat",
                   hot_threshold: int = 1_000_000, max_salts: int = 64) -> dict:
    """Cheap pre-count pass → {cell_id: n_salts} for cells above the
    threshold (SURVEY.md §4 skew row). Output is small (#cells)."""
    from ..stages.cell_assign import with_grid_cell

    counts = (
        with_grid_cell(points, res, lon_col=lon_col, lat_col=lat_col)
        .groupby("cell_id")
        .count()
        .to_pandas()
    )
    hot = counts[counts["count()"] > hot_threshold]
    return {
        int(c): int(min(max_salts, max(2, n // hot_threshold + 1)))
        for c, n in zip(hot["cell_id"], hot["count()"])
    }


# ---------------------------------------------------------------------------
# Shuffle polygon erase (both sides large)
# ---------------------------------------------------------------------------


def _cell_box(cell_ids: np.ndarray, res: float):
    ix, iy = cells.unpack_grid(cell_ids)
    x0 = -180.0 + ix * res
    y0 = -90.0 + iy * res
    return x0, y0, x0 + res, y0 + res


def shuffle_polygon_erase(polys: ray.data.Dataset, method: ray.data.Dataset,
                          poly_cols: Sequence[str], res: float = 5.0,
                          wkb_col: str = "geometry") -> ray.data.Dataset:
    """Both-sides-large Erase (layer algebra, `ogrlayer.cpp:7665`) with
    NO broadcast side: the `res`-degree grid partitions the plane, and
    (A ∖ B) ∩ cell == (A ∩ cell) ∖ (B ∩ cell), so each side explodes to
    its covering cells, clips to the cell box (convex clip — exact), and
    one `groupby(cell)` computes per-cell differences independently.

    Output: one row per surviving (input row × cell) fragment with
    `geometry` (fragmented multipolygon within the cell), `cell_id`, and
    `fragment_area`; fragments across cells partition A ∖ B exactly
    (shared cell borders are measure-zero). Aggregate `fragment_area`
    by input id to get per-feature remaining area; run
    `stages.geom_ops.dissolve_geometry` after an id-regroup for clean
    polygons."""
    from ..geom.boolean import polygon_difference
    from ..geom.clip import clip_wkb_to_box
    from ..stages.cell_assign import explode_covering_cells
    from ..stages.geom_ops import wkb_centroid_area

    def clip_side(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            bufs = batch[wkb_col].to_numpy(zero_copy_only=False)
            cell = batch["cell_id"].to_numpy(zero_copy_only=False)
            x0, y0, x1, y1 = _cell_box(cell, res)
            out = []
            keep = np.zeros(len(bufs), dtype=bool)
            for i, b in enumerate(bufs):
                c = clip_wkb_to_box(b, x0[i], y0[i], x1[i], y1[i])
                if c is not None:
                    keep[i] = True
                    out.append(c)
            batch = batch.filter(pa.array(keep))
            batch = batch.drop_columns([wkb_col]).append_column(
                wkb_col, pa.array(out, type=pa.binary()))
            return batch.append_column(
                "__side", pa.array(np.full(len(batch), side, dtype=np.int8)))
        return fn

    a = explode_covering_cells(polys, res, wkb_col=wkb_col)
    a = a.map_batches(clip_side(0), batch_format="pyarrow")
    a = a.select_columns(list(dict.fromkeys(list(poly_cols) + [wkb_col, "cell_id", "__side"])))
    b = explode_covering_cells(method, res, wkb_col=wkb_col)
    b = b.map_batches(clip_side(1), batch_format="pyarrow")
    b = b.select_columns([wkb_col, "cell_id", "__side"])

    # schema-align (method side lacks poly_cols)
    def pad(batch: pa.Table) -> pa.Table:
        for c in poly_cols:
            if c not in batch.column_names:
                batch = batch.append_column(c, pa.nulls(len(batch), pa.int64()))
        return batch.select(list(poly_cols) + [wkb_col, "cell_id", "__side"])

    both = a.map_batches(pad, batch_format="pyarrow").union(
        b.map_batches(pad, batch_format="pyarrow"))

    out_cols = list(poly_cols)

    def erase_group(tbl: pa.Table) -> pa.Table:
        side = tbl["__side"].to_numpy(zero_copy_only=False)
        at = tbl.filter(pa.array(side == 0))
        bt = tbl.filter(pa.array(side == 1))
        empty_cols = {c: at[c].slice(0, 0) for c in out_cols}
        empty = pa.table({**empty_cols,
                          "geometry": pa.array([], type=pa.binary()),
                          "cell_id": pa.array([], type=pa.uint64()),
                          "fragment_area": pa.array([], type=pa.float64())})
        if len(at) == 0:
            return empty
        a_bufs = at[wkb_col].to_numpy(zero_copy_only=False)
        b_bufs = bt[wkb_col].to_numpy(zero_copy_only=False)
        keep_rows, out_geom, out_area = [], [], []
        for i, ab in enumerate(a_bufs):
            cur = ab
            for bb in b_bufs:
                cur = polygon_difference(cur, bb)
                if cur is None:
                    break
            if cur is None:
                continue
            _cx, _cy, area = wkb_centroid_area(cur)
            if area <= 0:
                continue
            keep_rows.append(i)
            out_geom.append(cur)
            out_area.append(area)
        if not keep_rows:
            return empty
        sel = at.take(pa.array(np.asarray(keep_rows, dtype=np.int64)))
        return pa.table({**{c: sel[c] for c in out_cols},
                         "geometry": pa.array(out_geom, type=pa.binary()),
                         "cell_id": sel["cell_id"],
                         "fragment_area": pa.array(out_area)})

    return both.groupby("cell_id").map_groups(erase_group, batch_format="pyarrow")
