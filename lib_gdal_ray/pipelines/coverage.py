"""Polygon-coverage operators: check / clean / simplify.

Reference surface: the `gdal vector {check,clean,simplify}-coverage`
pipeline steps (`apps/gdalalg_vector_check_coverage.cpp:36-41`,
`apps/gdalalg_vector_clean_coverage.cpp:36-48` — snapping-distance +
merge-strategy {longest-border,max-area,min-area,min-index} — and
`apps/gdalalg_vector_simplify_coverage.cpp:36`), which delegate to GEOS
≥3.14 CoverageValidator / CoverageCleaner / CoverageSimplifier. GEOS is
a single-process library; these are Ray-Data-first re-derivations:

* check_coverage — the invalidity GEOS reports first (interior
  overlaps between neighboring polygons) found with the SAME two-phase
  cell shuffle as the layer-algebra joins: explode each polygon to its
  covering cells (`map_batches`), one `groupby(cell)`, exact pairwise
  intersection areas inside each bounded cell group. A pair is emitted
  only by the cell containing the overlap envelope's min corner, so
  output pairs are globally unique with no cross-cell dedup shuffle.

* clean_coverage — phase 1 of GEOS CoverageCleaner (node snapping) as a
  stateless vectorized snap-round of every vertex to the
  `snap`-spaced grid, then overlap resolution with the deterministic
  `min-index` merge strategy (overlap goes to the lower feature id),
  computed cell-wise exactly like `shuffle_polygon_erase`: within each
  cell, fragment i := (poly_i ∩ cell) ∖ ⋃_{j<i, overlapping} poly_j.
  Fragments across cells partition the cleaned coverage (cell borders
  are measure-zero); aggregate `fragment_area` by id for per-feature
  areas, or dissolve per id for clean geometry output.

* simplify_coverage — GEOS CoverageSimplifier semantics (shared edges
  simplified once, identically on both sides, so the result stays a
  gap-free coverage). Two-shuffle distributed shape:
    1. explode every ring into segments keyed by the canonical
       (sorted-endpoint) coordinate bytes; a tiny vectorized
       groupby(seg_key) aggregate computes each segment's owner
       signature (min/max owner id, owner count);
    2. hash-join the signature back to the segment rows and regroup by
       (poly, ring); each ring splits into chains at vertices where the
       owner signature changes, every chain is Douglas–Peucker
       simplified in CANONICAL orientation (lexicographically smaller
       endpoint first, endpoints pinned) — both owners of a shared
       chain therefore compute byte-identical simplified chains — and
       the ring is reassembled.
  Rings with a single uniform signature (no nodes) start the chain at
  the lexicographically smallest vertex, again deterministic across
  owners.

At 100 TB the cell shuffles are bounded by `res` (pick so a cell holds
O(100) polygons) and the segment shuffle is proportional to boundary
vertex count — small next to interior pixel/row data.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import ray.data

from ..geom import cells, wkb as wkb_mod
from ..geom.triangulate import _signed_area, polygon_intersection_area
from ..geom.unary import dp_simplify


# ---------------------------------------------------------------------------
# check-coverage
# ---------------------------------------------------------------------------

def check_coverage(ds: ray.data.Dataset, id_col: str = "id",
                   res: float = 50.0,
                   wkb_col: str = "geometry") -> ray.data.Dataset:
    """-> Dataset[(id_a, id_b, overlap_area)] of interior-overlapping
    polygon pairs (id_a < id_b), each pair exactly once. An empty result
    means the layer is a valid coverage w.r.t. overlaps (gap checking
    needs `maximum-gap-width`, see clean_coverage)."""
    from ..stages.cell_assign import explode_covering_cells

    exploded = explode_covering_cells(
        ds.select_columns([id_col, wkb_col]), res, wkb_col=wkb_col)

    def pairs(group: "pa.Table") -> "pa.Table":
        import pandas as pd

        if isinstance(group, pd.DataFrame):
            ids = group[id_col].to_numpy()
            bufs = list(group[wkb_col])
            cell = int(group["cell_id"].iloc[0])
        else:  # pyarrow table
            ids = group[id_col].to_numpy()
            bufs = group[wkb_col].to_pylist()
            cell = int(group["cell_id"][0].as_py())
        bbox = wkb_mod.wkb_bbox(bufs)
        n = len(ids)
        out_a, out_b, out_ar = [], [], []
        for i in range(n):
            # vectorized bbox pretest against later rows
            j = np.arange(i + 1, n)
            ok = ((bbox[j, 0] < bbox[i, 2]) & (bbox[i, 0] < bbox[j, 2])
                  & (bbox[j, 1] < bbox[i, 3]) & (bbox[i, 1] < bbox[j, 3]))
            for jj in j[ok]:
                if ids[i] == ids[jj]:
                    continue
                area = polygon_intersection_area(bufs[i], bufs[jj])
                if area <= 0.0:
                    continue
                # ownership rule: only the cell containing the overlap
                # envelope's min corner reports this pair
                ox = max(bbox[i, 0], bbox[jj, 0])
                oy = max(bbox[i, 1], bbox[jj, 1])
                if int(cells.grid_cell(np.asarray([ox]),
                                       np.asarray([oy]), res)[0]) != cell:
                    continue
                a, b = sorted((int(ids[i]), int(ids[jj])))
                out_a.append(a)
                out_b.append(b)
                out_ar.append(float(area))
        return pd.DataFrame({"id_a": np.asarray(out_a, np.int64),
                             "id_b": np.asarray(out_b, np.int64),
                             "overlap_area": np.asarray(out_ar, np.float64)})

    return exploded.groupby("cell_id").map_groups(pairs)


# ---------------------------------------------------------------------------
# clean-coverage
# ---------------------------------------------------------------------------

def snap_round_geometry(ds: ray.data.Dataset, snap: float,
                        wkb_col: str = "geometry") -> ray.data.Dataset:
    """Vertex snap-round to the `snap` grid (CoverageCleaner's node
    snapping phase): every coordinate -> nearest multiple of `snap`;
    consecutive duplicate vertices collapse; rings that degenerate
    (<4 points closed) drop the feature."""

    def snap_ring(r: np.ndarray) -> np.ndarray:
        s = np.round(r / snap) * snap
        keep = np.ones(len(s), dtype=bool)
        keep[1:] = (np.abs(np.diff(s, axis=0)) > 0).any(axis=1)
        return s[keep]

    def fn(batch: pa.Table) -> pa.Table:
        bufs = batch[wkb_col].to_numpy(zero_copy_only=False)
        out = []
        for b in bufs:
            kind, payload = wkb_mod.parse_wkb(b)
            polys = [payload] if kind == "polygon" else payload
            new_polys = []
            for rings in polys:
                nr = []
                for i, ring in enumerate(rings):
                    s = snap_ring(np.asarray(ring, dtype=np.float64))
                    if not np.array_equal(s[0], s[-1]):
                        s = np.vstack([s, s[:1]])
                    if len(s) < 4:
                        if i == 0:
                            nr = []
                            break
                        continue
                    nr.append(s)
                if nr:
                    new_polys.append(nr)
            if not new_polys:
                out.append(None)
            elif kind == "polygon":
                out.append(wkb_mod.polygon_to_wkb(new_polys[0]))
            else:
                out.append(wkb_mod.multipolygon_to_wkb(new_polys))
        keep = np.asarray([o is not None for o in out])
        batch = batch.filter(pa.array(keep))
        kept = [o for o in out if o is not None]
        idx = batch.column_names.index(wkb_col)
        return batch.set_column(idx, wkb_col, pa.array(kept, type=pa.binary()))

    return ds.map_batches(fn, batch_format="pyarrow")


def clean_coverage(ds: ray.data.Dataset, snap: float = 0.0,
                   id_col: str = "id", res: float = 50.0,
                   wkb_col: str = "geometry") -> ray.data.Dataset:
    """Snap nodes, then resolve interior overlaps with the `min-index`
    merge strategy. Output: one row per surviving (feature × cell)
    fragment with `id_col`, `cell_id`, `geometry` and `fragment_area`
    (fragments partition the cleaned coverage; aggregate area by id or
    dissolve per id downstream, same contract as
    `shuffle_polygon_erase`)."""
    from ..geom.boolean import polygon_difference
    from ..geom.clip import clip_wkb_to_box
    from ..stages.cell_assign import explode_covering_cells

    if snap > 0.0:
        ds = snap_round_geometry(ds, snap, wkb_col)
    exploded = explode_covering_cells(
        ds.select_columns([id_col, wkb_col]), res, wkb_col=wkb_col)

    def resolve(group):
        import pandas as pd

        ids = group[id_col].to_numpy().astype(np.int64)
        bufs = list(group[wkb_col])
        cell = int(group["cell_id"].iloc[0])
        gx, gy = cells.unpack_grid(np.asarray([cell]))
        # grid_xy offsets lon/lat by +180/+90 before flooring
        x0 = float(gx[0]) * res - 180.0
        y0 = float(gy[0]) * res - 90.0
        order = np.argsort(ids, kind="stable")
        clipped: List = []
        clipped_bbox: List[np.ndarray] = []
        kept_ids: List[int] = []
        out_ids, out_geom, out_area = [], [], []
        for oi in order:
            g = clip_wkb_to_box(bufs[oi], x0, y0, x0 + res, y0 + res)
            if g is None:
                continue
            # min-index: subtract earlier (lower-id) neighbors — bbox
            # pretest keeps this O(n·overlapping), not O(n²) differences
            gb = wkb_mod.wkb_bbox([g])[0]
            for prev, pb in zip(clipped, clipped_bbox):
                if (pb[0] >= gb[2] or gb[0] >= pb[2]
                        or pb[1] >= gb[3] or gb[1] >= pb[3]):
                    continue
                g = polygon_difference(g, prev)
                if g is None:
                    break
            if g is None:
                continue
            clipped.append(g)
            clipped_bbox.append(gb)
            kept_ids.append(int(ids[oi]))
            area = sum(abs(_signed_area(r)) * (1 if i == 0 else -1)
                       for rings in wkb_mod.wkb_rings(g)
                       for i, r in enumerate(rings))
            out_ids.append(int(ids[oi]))
            out_geom.append(g)
            out_area.append(float(area))
        return pd.DataFrame({id_col: np.asarray(out_ids, np.int64),
                             "cell_id": np.full(len(out_ids), cell, np.int64),
                             wkb_col: pd.Series(out_geom, dtype=object),
                             "fragment_area": np.asarray(out_area, np.float64)})

    return exploded.groupby("cell_id").map_groups(resolve)


# ---------------------------------------------------------------------------
# simplify-coverage
# ---------------------------------------------------------------------------

def _segment_rows(batch: pa.Table, id_col: str, wkb_col: str) -> pa.Table:
    """Explode polygons into per-segment rows with canonical seg keys."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    bufs = batch[wkb_col].to_numpy(zero_copy_only=False)
    o_id, o_ring, o_seq, o_x0, o_y0, o_x1, o_y1, o_key = \
        [], [], [], [], [], [], [], []
    for fid, b in zip(ids, bufs):
        kind, payload = wkb_mod.parse_wkb(b)
        polys = [payload] if kind == "polygon" else payload
        for pi, rings in enumerate(polys):
            for ri, ring in enumerate(rings):
                r = np.asarray(ring, dtype=np.float64)
                if np.array_equal(r[0], r[-1]):
                    r = r[:-1]
                n = len(r)
                for s in range(n):
                    a = r[s]
                    c = r[(s + 1) % n]
                    lo, hi = (a, c) if (a[0], a[1]) <= (c[0], c[1]) else (c, a)
                    o_id.append(int(fid))
                    o_ring.append(pi * 1_000_000 + ri)
                    o_seq.append(s)
                    o_x0.append(a[0])
                    o_y0.append(a[1])
                    o_x1.append(c[0])
                    o_y1.append(c[1])
                    o_key.append(np.asarray(
                        [lo[0], lo[1], hi[0], hi[1]]).tobytes().hex())
    return pa.table({
        "fid": pa.array(np.asarray(o_id, np.int64)),
        "ring": pa.array(np.asarray(o_ring, np.int64)),
        "seq": pa.array(np.asarray(o_seq, np.int64)),
        "sx0": pa.array(np.asarray(o_x0)), "sy0": pa.array(np.asarray(o_y0)),
        "sx1": pa.array(np.asarray(o_x1)), "sy1": pa.array(np.asarray(o_y1)),
        "seg_key": pa.array(o_key, type=pa.string())})


def simplify_coverage(ds: ray.data.Dataset, tol: float,
                      id_col: str = "id",
                      wkb_col: str = "geometry") -> ray.data.Dataset:
    """Topology-preserving coverage simplification: shared chains are
    simplified once, identically for every owner. Returns a Dataset of
    (id_col, ring, geometry) rows — one polygon ring per row, rebuilt
    from its simplified chains (single-ring inputs: one row per input
    feature)."""
    from ray.data.aggregate import Count, Max, Min

    from .relational import bucket_lookup_join

    segs = ds.select_columns([id_col, wkb_col]).map_batches(
        lambda b: _segment_rows(b, id_col, wkb_col), batch_format="pyarrow")
    sig = (segs.groupby("seg_key")
           .aggregate(Min("fid", alias_name="own_min"),
                      Max("fid", alias_name="own_max"),
                      Count(alias_name="own_n")))
    # unique-keyed lookup join (bb-bucket groupby; no native join)
    joined = bucket_lookup_join(segs, sig, on="seg_key", how="inner")

    def rebuild(group):
        import pandas as pd

        g = group.sort_values("seq")
        fid = int(g["fid"].iloc[0])
        ring_id = int(g["ring"].iloc[0])
        pts = np.stack([g["sx0"].to_numpy(), g["sy0"].to_numpy()], axis=1)
        sigs = list(zip(g["own_min"].to_numpy(), g["own_max"].to_numpy(),
                        g["own_n"].to_numpy()))
        n = len(pts)
        # nodes: vertex s where segment s-1 and s have different owner sigs
        node = np.asarray([sigs[s - 1] != sigs[s] for s in range(n)])
        if not node.any():
            # uniform ring: canonical start = lexicographically min vertex
            start = int(np.lexsort((pts[:, 1], pts[:, 0]))[0])
            node = np.zeros(n, dtype=bool)
            node[start] = True
        order = np.flatnonzero(node)
        new_pts: List[np.ndarray] = []
        for k, s0 in enumerate(order):
            s1 = order[(k + 1) % len(order)]
            if s1 > s0:
                chain = pts[s0:s1 + 1]
            else:  # wraps
                chain = np.vstack([pts[s0:], pts[:s1 + 1]])
            a, b = chain[0], chain[-1]
            rev = (a[0], a[1]) > (b[0], b[1])
            c = chain[::-1] if rev else chain
            simp = dp_simplify(c, tol)
            if rev:
                simp = simp[::-1]
            new_pts.append(simp[:-1])  # drop duplicated chain endpoint
        ring = np.vstack(new_pts + [new_pts[0][:1]])
        if len(ring) < 4:
            ring = np.vstack([pts, pts[:1]])  # degenerate: keep original
        return pd.DataFrame({
            id_col: [fid], "ring": [ring_id],
            wkb_col: pd.Series([wkb_mod.polygon_to_wkb([ring])], dtype=object)})

    return joined.groupby(["fid", "ring"]).map_groups(rebuild)
