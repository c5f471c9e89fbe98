"""Contour (iso-lines from a raster) — distributed marching squares.

Reference: `alg/contour.cpp:277-384` + `alg/marching_squares/` (incl.
`segment_merger.h` which merges segments across tile borders). Sparse
re-expression:

1. corner gather — each pixel value scatters to the 4 marching-squares
   cells it corners (hot-one columns, one `groupby(cell)`), mirroring
   the focal-stencil trick;
2. per-cell segment extraction — fully vectorized 16-case classification
   with linear interpolation along crossed edges (saddles resolved by
   the center-average rule, as GDAL's marching_squares does);
3. stitching — segment endpoints are quantized to exact grid-edge
   rationals and `groupby(endpoint)` yields segment-adjacency pairs;
   a driver-side union-find assigns polyline ids (same 2-round pattern
   and scale caveat as polygonize: the endpoint-graph of *junction*
   segments is tiny relative to pixels).

Output: per-polyline rows (line_id, level, n_segments, length, bbox).
`contour_segments` exposes the raw segments for tests/rendering.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .polygonize import UnionFind
from .rasterize import pack_pixel, unpack_pixel

_Q = 1 << 20  # endpoint quantization (exact for edge fractions)


def _mix_u64(*cols: np.ndarray) -> np.ndarray:
    """Vectorized deterministic 62-bit id from uint64 column tuples
    (splitmix64 chain, replaces per-row Python hash() loops)."""
    from .dedup import _splitmix64

    with np.errstate(over="ignore"):
        h = np.zeros(len(cols[0]), dtype=np.uint64)
        for i, c in enumerate(cols):
            h = _splitmix64(h ^ c ^ np.uint64(0xA5A5A5A5 * (i + 1)))
    return h & np.uint64((1 << 62) - 1)


def _gather_corners(pixels: ray.data.Dataset) -> ray.data.Dataset:
    """-> rows (cell_id, c0..c3, n_present): c0=TL (x,y), c1=TR (x+1,y),
    c2=BL (x,y+1), c3=BR (x+1,y+1) of marching-squares cell (x,y)."""

    def scatter(batch: pa.Table) -> pa.Table:
        pix = batch["pix_id"].to_numpy(zero_copy_only=False)
        burn = batch["burn"].to_numpy(zero_copy_only=False).astype(np.float64)
        z, gpx, gpy = unpack_pixel(pix)
        n = len(pix)
        zval = int(z[0]) if n else 0
        # pixel (x,y) is corner ci of cell (x - dx_i, y - dy_i)
        offs = [(0, 0), (1, 0), (0, 1), (1, 1)]
        tgt, keep = [], []
        for dx, dy in offs:
            cx, cy = gpx - dx, gpy - dy
            keep.append((cx >= 0) & (cy >= 0))
            tgt.append(pack_pixel(zval, np.maximum(cx, 0), np.maximum(cy, 0)))
        cols = {}
        for ci in range(4):
            c = np.zeros(n * 4, dtype=np.float64)
            c[ci * n:(ci + 1) * n] = burn
            cols[f"c{ci}"] = pa.array(c)
        present = np.zeros(n * 4, dtype=np.float64)
        for ci in range(4):
            present[ci * n:(ci + 1) * n] = 1.0
        t = pa.table({"cell_id": pa.array(np.concatenate(tgt) if n else
                                          np.empty(0, np.uint64)),
                      **cols, "np_": pa.array(present)})
        return t.filter(pa.array(np.concatenate(keep) if n else np.empty(0, bool)))

    scattered = pixels.map_batches(scatter, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    aggs = [Sum(f"c{i}", alias_name=f"c{i}") for i in range(4)]
    aggs.append(Sum("np_", alias_name="n_present"))
    return scattered.groupby("cell_id").aggregate(*aggs)


def _cell_segments(cx, cy, c0, c1, c2, c3, level):
    """Vectorized marching squares for one level over full cells.

    Corner layout:  c0 (x,y) ---- c1 (x+1,y)
                     |              |
                    c2 (x,y+1) -- c3 (x+1,y+1)
    Returns (x1, y1, x2, y2) arrays of segments in pixel coords.
    """
    b0 = c0 >= level
    b1 = c1 >= level
    b2 = c2 >= level
    b3 = c3 >= level
    case = (b0.astype(np.int64) | (b1.astype(np.int64) << 1)
            | (b2.astype(np.int64) << 2) | (b3.astype(np.int64) << 3))

    def frac(a, b):
        with np.errstate(divide="ignore", invalid="ignore"):
            f = (level - a) / (b - a)
        return np.clip(np.nan_to_num(f, nan=0.5), 0.0, 1.0)

    # edge crossing points (parameterized along each cell edge)
    top_x = cx + frac(c0, c1)      # on edge c0-c1, y = cy
    bot_x = cx + frac(c2, c3)      # on edge c2-c3, y = cy+1
    left_y = cy + frac(c0, c2)     # on edge c0-c2, x = cx
    right_y = cy + frac(c1, c3)    # on edge c1-c3, x = cx+1

    segs: List[np.ndarray] = []

    def emit(mask, ax, ay, bx, by):
        idx = np.flatnonzero(mask)
        if len(idx):
            segs.append(np.stack([ax[idx], ay[idx], bx[idx], by[idx]], axis=1))

    ONE = np.ones_like(top_x)
    # single-corner / three-corner cases
    emit(np.isin(case, (1, 14)), top_x, cy * ONE, cx * ONE, left_y)       # c0 isolated
    emit(np.isin(case, (2, 13)), top_x, cy * ONE, (cx + 1) * ONE, right_y)  # c1
    emit(np.isin(case, (4, 11)), cx * ONE, left_y, bot_x, (cy + 1) * ONE)   # c2
    emit(np.isin(case, (8, 7)), (cx + 1) * ONE, right_y, bot_x, (cy + 1) * ONE)  # c3
    # split cases
    emit(np.isin(case, (3, 12)), cx * ONE, left_y, (cx + 1) * ONE, right_y)  # top-row pair
    emit(np.isin(case, (5, 10)), top_x, cy * ONE, bot_x, (cy + 1) * ONE)     # left-col pair
    sad = np.isin(case, (6, 9))
    if sad.any():
        center = (c0 + c1 + c2 + c3) / 4.0
        hi = center >= level
        # case 6 (c1,c2 above): connect (top,right)+(left,bottom) when the
        # center is above; else (top,left)+(right,bottom). case 9 mirrored.
        c6 = sad & (case == 6)
        c9 = sad & (case == 9)
        emit(c6 & hi, top_x, cy * ONE, (cx + 1) * ONE, right_y)
        emit(c6 & hi, cx * ONE, left_y, bot_x, (cy + 1) * ONE)
        emit(c6 & ~hi, top_x, cy * ONE, cx * ONE, left_y)
        emit(c6 & ~hi, (cx + 1) * ONE, right_y, bot_x, (cy + 1) * ONE)
        emit(c9 & hi, top_x, cy * ONE, cx * ONE, left_y)
        emit(c9 & hi, (cx + 1) * ONE, right_y, bot_x, (cy + 1) * ONE)
        emit(c9 & ~hi, top_x, cy * ONE, (cx + 1) * ONE, right_y)
        emit(c9 & ~hi, cx * ONE, left_y, bot_x, (cy + 1) * ONE)
    if not segs:
        return np.empty((0, 4))
    return np.concatenate(segs)


def contour_segments(pixels: ray.data.Dataset, levels: Sequence[float]
                     ) -> ray.data.Dataset:
    """-> segment rows (level, x1, y1, x2, y2) in global pixel coords."""
    corners = _gather_corners(pixels)
    levels = list(levels)

    def extract(batch: pa.Table) -> pa.Table:
        full = batch["n_present"].to_numpy(zero_copy_only=False) >= 4.0
        sub = batch.filter(pa.array(full))
        if len(sub) == 0:
            return pa.table({"level": pa.array([], pa.float64()),
                             "x1": pa.array([], pa.float64()),
                             "y1": pa.array([], pa.float64()),
                             "x2": pa.array([], pa.float64()),
                             "y2": pa.array([], pa.float64())})
        z, cx, cy = unpack_pixel(sub["cell_id"].to_numpy(zero_copy_only=False))
        cs = [sub[f"c{i}"].to_numpy(zero_copy_only=False) for i in range(4)]
        out = []
        for lv in levels:
            segs = _cell_segments(cx.astype(np.float64), cy.astype(np.float64),
                                  cs[0], cs[1], cs[2], cs[3], lv)
            if len(segs):
                out.append(pa.table({
                    "level": pa.array(np.full(len(segs), lv)),
                    "x1": pa.array(segs[:, 0]), "y1": pa.array(segs[:, 1]),
                    "x2": pa.array(segs[:, 2]), "y2": pa.array(segs[:, 3]),
                }))
        if not out:
            return pa.table({"level": pa.array([], pa.float64()),
                             "x1": pa.array([], pa.float64()),
                             "y1": pa.array([], pa.float64()),
                             "x2": pa.array([], pa.float64()),
                             "y2": pa.array([], pa.float64())})
        return pa.concat_tables(out)

    return corners.map_batches(extract, batch_format="pyarrow")


def contour_lines(pixels: ray.data.Dataset, levels: Sequence[float]
                  ) -> ray.data.Dataset:
    """Stitch segments into polylines; -> (line_id, level, n_segments,
    length, x_min, y_min, x_max, y_max)."""
    segs = contour_segments(pixels, levels)

    def with_ids(batch: pa.Table) -> pa.Table:
        x1 = batch["x1"].to_numpy(zero_copy_only=False)
        y1 = batch["y1"].to_numpy(zero_copy_only=False)
        x2 = batch["x2"].to_numpy(zero_copy_only=False)
        y2 = batch["y2"].to_numpy(zero_copy_only=False)
        lv = batch["level"].to_numpy(zero_copy_only=False)
        # deterministic segment id = splitmix64 chain over (level bits,
        # quantized endpoints) — vectorized, no per-row Python hash()
        sid = _mix_u64(lv.astype(np.float64).view(np.uint64),
                       np.round(x1 * _Q).astype(np.int64).view(np.uint64),
                       np.round(y1 * _Q).astype(np.int64).view(np.uint64),
                       np.round(x2 * _Q).astype(np.int64).view(np.uint64),
                       np.round(y2 * _Q).astype(np.int64).view(np.uint64))
        return batch.append_column("seg_id", pa.array(sid))

    segs = segs.map_batches(with_ids, batch_format="pyarrow")

    def endpoints(batch: pa.Table) -> pa.Table:
        lv = batch["level"].to_numpy(zero_copy_only=False)
        sid = batch["seg_id"].to_numpy(zero_copy_only=False)
        xs = [batch["x1"].to_numpy(zero_copy_only=False),
              batch["x2"].to_numpy(zero_copy_only=False)]
        ys = [batch["y1"].to_numpy(zero_copy_only=False),
              batch["y2"].to_numpy(zero_copy_only=False)]
        tables = []
        for e in range(2):
            key = _mix_u64(
                lv.astype(np.float64).view(np.uint64),
                np.round(xs[e] * _Q).astype(np.int64).view(np.uint64),
                np.round(ys[e] * _Q).astype(np.int64).view(np.uint64))
            tables.append(pa.table({"ep": pa.array(key), "seg_id": pa.array(sid)}))
        return pa.concat_tables(tables)

    eps = segs.map_batches(endpoints, batch_format="pyarrow")

    def ep_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["seg_id"].drop_duplicates().to_numpy(dtype=np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.uint64),
                                 "b": pd.Series(dtype=np.uint64)})
        return pd.DataFrame({"a": np.full(len(ids) - 1, ids[0], dtype=np.uint64),
                             "b": ids[1:]})

    # endpoint-graph union-find runs in ONE Ray task from block refs
    # (bounded by segment count, never on the driver)
    pair_blocks = (eps.groupby("ep")
                   .map_groups(ep_pairs, batch_format="pandas")
                   .to_arrow_refs())

    @ray.remote
    def _uf_task(*blocks):
        uf = UnionFind()
        for b in blocks:
            if len(b) == 0 or "a" not in b.column_names:
                continue
            for a, bb in zip(b["a"].to_numpy(zero_copy_only=False),
                             b["b"].to_numpy(zero_copy_only=False)):
                uf.union(int(a), int(bb))
        return {x: uf.find(x) for x in uf.parent}

    ref = _uf_task.remote(*pair_blocks)

    class Assign:
        def __init__(self, wrapped):
            m = ray.get(wrapped["ref"])
            # sorted key/value arrays: per-batch lookup is a vectorized
            # searchsorted gather, not a per-row dict .get
            self.keys = np.fromiter(m.keys(), dtype=np.uint64, count=len(m))
            vals = np.fromiter(m.values(), dtype=np.uint64, count=len(m))
            order = np.argsort(self.keys)
            self.keys = self.keys[order]
            self.vals = vals[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            sid = batch["seg_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            lid = sid.copy()
            if len(self.keys):
                pos = np.searchsorted(self.keys, sid)
                pos = np.minimum(pos, len(self.keys) - 1)
                hit = self.keys[pos] == sid
                lid[hit] = self.vals[pos[hit]]
            x1 = batch["x1"].to_numpy(zero_copy_only=False)
            y1 = batch["y1"].to_numpy(zero_copy_only=False)
            x2 = batch["x2"].to_numpy(zero_copy_only=False)
            y2 = batch["y2"].to_numpy(zero_copy_only=False)
            ln = np.hypot(x2 - x1, y2 - y1)
            return pa.table({
                "line_id": pa.array(lid), "level": batch["level"],
                "seg_len": pa.array(ln),
                "xmin": pa.array(np.minimum(x1, x2)),
                "ymin": pa.array(np.minimum(y1, y2)),
                "xmax": pa.array(np.maximum(x1, x2)),
                "ymax": pa.array(np.maximum(y1, y2)),
            })

    key = ref.hex() + ":contour_assign"

    def assign_stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        return get_or_build(key, lambda: Assign({"ref": ref}))(batch)

    labeled = segs.map_batches(assign_stage, batch_format="pyarrow")

    from ray.data.aggregate import Count, Max, Min, Sum

    return labeled.groupby("line_id").aggregate(
        Min("level", alias_name="level"),
        Count(alias_name="n_segments"),
        Sum("seg_len", alias_name="length"),
        Min("xmin", alias_name="x_min"),
        Min("ymin", alias_name="y_min"),
        Max("xmax", alias_name="x_max"),
        Max("ymax", alias_name="y_max"),
    )
