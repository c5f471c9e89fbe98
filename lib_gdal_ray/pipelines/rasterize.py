"""Rasterize (vector→raster) as a two-phase sparse tile pipeline.

Reference: `alg/gdalrasterize.cpp` (`gv_rasterize_one_shape` `:569`,
options `:774-817` — MERGE_ALG=REPLACE/ADD, burn value fixed or from a
field) and the tile job layout of `apps/gdalalg_raster_tile.cpp`.

Scale design (SURVEY.md §4): tiles stay **sparse** end-to-end —

* Phase 1 (`map_batches`, stateless): assign each point to
  (tile_id, pixel) at zoom z and pre-aggregate within the batch
  (pyarrow group_by partials) — the combiner that keeps the shuffle
  narrow (≤ one row per distinct touched pixel per block).
* Phase 2: one hash `groupby(tile_id, pxy).aggregate(...)` finalizes
  pixel values — fully vectorized, no per-group Python.
* Tile summaries (count/total/GDAL-checksum) are a second vectorized
  `groupby(tile_id)` aggregation: GDAL's checksum is a *sum over
  pixels* of `(int)v % primes[(y*W+x) % 11]` (bit-exact re-derivation
  of `alg/gdalchecksum.cpp:48-260`), and zero pixels contribute 0 —
  so the checksum of the dense tile is computable from sparse pixels.

Dense payloads (`densify`, `rasterize_points_dense`) exist for golden
pixel tests and for sinks that need raw rasters; never materialized in
the 100 TB hot path.

MERGE_ALG semantics: "add"/"count" sum (associative → safe to
pre-aggregate); "max"/"min" keep the extreme. GDAL's order-sensitive
REPLACE is deliberately not offered distributed — use "max" with a
priority field.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..geom import cells

_PRIMES = np.asarray([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def gdal_checksum(arr: np.ndarray) -> int:
    """GDALChecksumImage for a full 2-D window at offset (0,0).

    Bit-exact per `alg/gdalchecksum.cpp:48-260`: per pixel
    `(int)value % primes[(y*W + x) % 11]` with C truncated modulo
    (sign of dividend), summed, masked to 16 bits. Float inputs go
    through GDALCopyWords' float→Int32: add 0.5, floor, clamp to
    ±2147483647 (NaN/inf → INT_MIN).
    """
    if np.iscomplexobj(arr):
        # complex bands checksum the interleaved (re, im) stream with
        # the prime index advancing per VALUE (gdalchecksum.cpp:278,
        # nValsPerIter == 2) — for a full window that is exactly the
        # scalar formula over the (h, 2w) interleaved view
        h, w = arr.shape
        inter = np.empty((h, 2 * w), np.float64)
        inter[:, 0::2] = arr.real
        inter[:, 1::2] = arr.imag
        arr = inter
    h, w = arr.shape
    iv = _to_int32_gdal(arr)
    idx = np.arange(h * w, dtype=np.int64).reshape(h, w)
    primes = _PRIMES[idx % 11]
    contrib = np.fmod(iv, primes)  # truncated modulo, C semantics
    return int(contrib.sum() & 0xFFFF)


def _to_int32_gdal(arr: np.ndarray) -> np.ndarray:
    """GDALCopyWords float→Int32 conversion (round half up, clamp)."""
    if np.issubdtype(arr.dtype, np.floating):
        v = arr.astype(np.float64) + 0.5
        nonfinite = ~np.isfinite(v)
        v = np.floor(np.clip(v, -2147483647.0, 2147483647.0))
        iv = v.astype(np.int64)
        iv[nonfinite] = np.iinfo(np.int32).min
        return iv
    return arr.astype(np.int64)


def checksum_contrib(pxy: np.ndarray, burn: np.ndarray, tile_size: int) -> np.ndarray:
    """Per-pixel checksum contribution (zero pixels contribute 0)."""
    iv = _to_int32_gdal(burn)
    primes = _PRIMES[pxy.astype(np.int64) % 11]
    return np.fmod(iv, primes)


_PA_AGG = {"add": "sum", "count": "sum", "max": "max", "min": "min"}


def pack_pixel(z: int, gpx: np.ndarray, gpy: np.ndarray) -> np.ndarray:
    """Global pixel key: (z << 58) | (gpx << 29) | gpy — a single uint64
    shuffle key (valid for z + log2(tile_size) <= 29, i.e. z <= 21 at
    256px tiles; one-key groupbys measurably beat two-key)."""
    return ((np.full(len(gpx), z, dtype=np.uint64) << np.uint64(58))
            | (gpx.astype(np.uint64) << np.uint64(29))
            | gpy.astype(np.uint64))


def unpack_pixel(pix: np.ndarray):
    pix = pix.astype(np.uint64)
    z = (pix >> np.uint64(58)).astype(np.int64)
    gpx = ((pix >> np.uint64(29)) & np.uint64((1 << 29) - 1)).astype(np.int64)
    gpy = (pix & np.uint64((1 << 29) - 1)).astype(np.int64)
    return z, gpx, gpy


def pixel_tile_cols(pix: np.ndarray, tile_size: int = 256):
    """pix_id → (tile_id, pxy) columns."""
    z, gpx, gpy = unpack_pixel(pix)
    tile = cells.pack_tile(z, gpx // tile_size, gpy // tile_size)
    pxy = ((gpy % tile_size) * tile_size + (gpx % tile_size)).astype(np.int32)
    return tile, pxy


def rasterize_pixels(points: ray.data.Dataset, z: int,
                     lon_col: str = "lon", lat_col: str = "lat",
                     value_col: Optional[str] = None,
                     merge_alg: str = "add",
                     tile_size: int = 256,
                     shuffle_partitions: Optional[int] = None,
                     combine: bool = True,
                     tms=None) -> ray.data.Dataset:
    """Points → finalized sparse pixel rows (pix_id, burn) at zoom z.

    tms: None (WebMercatorQuad — the default, bit-identical to the SQL
    oracles) or any `geom.tms.get_tms` scheme name/instance — pixel
    assignment then follows that OGC TileMatrixSet's origin/resolution
    (gdal raster tile --tiling-scheme parity).

    One narrow single-key hash shuffle after in-batch combining.
    shuffle_partitions: coalesce the (small, pre-combined) partials and
    bound the reduce fan-out — Ray's sort shuffle costs
    O(blocks × partitions) block slices, so small post-combiner shuffles
    should run with few of both; leave None for large outputs.
    combine=False skips the cross-block merge entirely and returns the
    per-block partials (a pixel may appear once per input block):
    correct whenever the consumer only needs the pixel point SET, not
    exact per-pixel values — e.g. a proximity target side — and saves
    the whole shuffle."""
    if merge_alg not in _PA_AGG:
        raise ValueError(f"merge_alg must be one of {sorted(_PA_AGG)}")
    if z > 29 - int(np.log2(tile_size)):
        raise ValueError(f"zoom {z} exceeds single-key pixel packing range")
    pa_agg = _PA_AGG[merge_alg]
    scheme = None
    if tms is not None:
        from ..geom.tms import get_tms

        scheme = get_tms(tms)
        if scheme.identifier == "WebMercatorQuad":
            scheme = None  # default path IS WebMercatorQuad

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[lon_col].to_numpy(zero_copy_only=False)
        y = batch[lat_col].to_numpy(zero_copy_only=False)
        if scheme is None:
            tx, ty, px, py = cells.tile_pixel(x, y, z, tile_size)
            gx, gy = tx * tile_size + px, ty * tile_size + py
        else:
            gx, gy = scheme.lonlat_to_pixel(x, y, z)
        pix = pack_pixel(z, gx, gy)
        if merge_alg == "count" or value_col is None:
            burn = np.ones(len(gx), dtype=np.float64)
        else:
            burn = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({"pix_id": pa.array(pix), "burn": pa.array(burn)})
        out = t.group_by(["pix_id"]).aggregate([("burn", pa_agg)])
        return out.rename_columns(["pix_id", "burn"])

    partials = points.map_batches(partial, batch_format="pyarrow")
    if not combine:
        return partials
    return combine_pixel_partials(partials, pa_agg, shuffle_partitions)


def rasterize_pixels_multi(points: ray.data.Dataset, z: int,
                           specs, lon_col: str = "lon", lat_col: str = "lat",
                           tile_size: int = 256,
                           shuffle_partitions: Optional[int] = None
                           ) -> ray.data.Dataset:
    """Fused multi-band rasterize: ONE input pass + ONE pixel shuffle
    for several (value_col, merge_alg, out_name) bands over the same
    points — e.g. a (sum, count) pair for a per-pixel mean needs one
    exchange instead of two rasterize passes plus a co-align.

    specs: iterable of (value_col | None, merge_alg, out_name);
    merge_alg per `_PA_AGG` (count partials combine with sum)."""
    specs = [(vc, alg, out) for vc, alg, out in specs]
    for _, alg, _ in specs:
        if alg not in _PA_AGG:
            raise ValueError(f"merge_alg must be one of {sorted(_PA_AGG)}")
    if z > 29 - int(np.log2(tile_size)):
        raise ValueError(f"zoom {z} exceeds single-key pixel packing range")
    aggs = [(out, _PA_AGG[alg]) for _, alg, out in specs]

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[lon_col].to_numpy(zero_copy_only=False)
        y = batch[lat_col].to_numpy(zero_copy_only=False)
        tx, ty, px, py = cells.tile_pixel(x, y, z, tile_size)
        pix = pack_pixel(z, tx * tile_size + px, ty * tile_size + py)
        cols = {"pix_id": pa.array(pix)}
        for vc, alg, out in specs:
            if alg == "count" or vc is None:
                cols[out] = pa.array(np.ones(len(tx), dtype=np.float64))
            else:
                cols[out] = pa.array(
                    batch[vc].to_numpy(zero_copy_only=False).astype(np.float64))
        t = pa.table(cols)
        g = t.group_by(["pix_id"]).aggregate([(o, a) for o, a in aggs])
        return g.rename_columns(["pix_id"] + [o for o, _ in aggs])

    partials = points.map_batches(partial, batch_format="pyarrow")
    if shuffle_partitions:
        def combine(batch: pa.Table) -> pa.Table:
            g = batch.group_by(["pix_id"]).aggregate([(o, a) for o, a in aggs])
            return g.rename_columns(["pix_id"] + [o for o, _ in aggs])

        return partials.repartition(1).map_batches(combine, batch_format="pyarrow",
                                                   batch_size=None)
    from ray.data.aggregate import Max, Min, Sum

    ray_aggs = [{"sum": Sum, "max": Max, "min": Min}[a](o, alias_name=o)
                for o, a in aggs]
    return partials.groupby("pix_id").aggregate(*ray_aggs)


def combine_pixel_partials(partials: ray.data.Dataset, pa_agg: str,
                           shuffle_partitions: Optional[int] = None
                           ) -> ray.data.Dataset:
    """Merge per-block pixel partials to final per-pixel values.

    shuffle_partitions=None → Ray groupby (scales to any pixel count);
    an int → LOCAL tree combine: coalesce to one block and merge with a
    single in-memory pyarrow group_by. Valid when the combined pixel
    table fits one block (the post-combiner regime: ≤ a few M touched
    pixels) — measured ~100× faster than the sort shuffle there, since
    Ray's sort shuffle pays O(blocks × partitions) slice overhead."""
    if shuffle_partitions:
        def combine(batch: pa.Table) -> pa.Table:
            out = batch.group_by(["pix_id"]).aggregate([("burn", pa_agg)])
            return out.rename_columns(["pix_id", "burn"])

        return partials.repartition(1).map_batches(combine, batch_format="pyarrow",
                                                   batch_size=None)

    from ray.data.aggregate import Max, Min, Sum

    agg = {"sum": Sum, "max": Max, "min": Min}[pa_agg]
    return partials.groupby("pix_id").aggregate(agg("burn", alias_name="burn"))


def tile_summary(pixels: ray.data.Dataset, tile_size: int = 256,
                 shuffle_partitions: Optional[int] = None) -> ray.data.Dataset:
    """Finalized pixel rows → per-tile summary rows
    (tile_id, z, tile_x, tile_y, nonzero, total, checksum) — all
    vectorized aggregations, checksum bit-exact vs the dense
    GDALChecksumImage (zero pixels contribute 0 to the sum)."""

    def contrib(batch: pa.Table) -> pa.Table:
        tile, pxy = pixel_tile_cols(batch["pix_id"].to_numpy(zero_copy_only=False),
                                    tile_size)
        burn = batch["burn"].to_numpy(zero_copy_only=False)
        cs = checksum_contrib(pxy, burn, tile_size)
        return pa.table({
            "tile_id": pa.array(tile),
            "burn": batch["burn"],
            "cs": pa.array(cs),
            "nz": pa.array((burn != 0).astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    contribs = pixels.map_batches(contrib, batch_format="pyarrow")
    if shuffle_partitions:
        def combine(batch: pa.Table) -> pa.Table:
            out = batch.group_by(["tile_id"]).aggregate(
                [("burn", "sum"), ("cs", "sum"), ("nz", "sum")])
            return out.rename_columns(["tile_id", "total", "cs_raw", "nonzero"])

        agg = contribs.repartition(1).map_batches(combine, batch_format="pyarrow",
                                                  batch_size=None)
    else:
        agg = contribs.groupby("tile_id").aggregate(
            Sum("burn", alias_name="total"),
            Sum("cs", alias_name="cs_raw"),
            Sum("nz", alias_name="nonzero"))

    def finalize(batch: pa.Table) -> pa.Table:
        tile_id = batch["tile_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        z, tx, ty = cells.unpack_tile(tile_id)
        cs = batch["cs_raw"].to_numpy(zero_copy_only=False).astype(np.int64) & 0xFFFF
        return pa.table({
            "tile_id": batch["tile_id"],
            "z": pa.array(z),
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
            "nonzero": batch["nonzero"],
            "total": batch["total"],
            "checksum": pa.array(cs),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def densify(pixel_df: pd.DataFrame, tile_size: int = 256) -> np.ndarray:
    """Pixel rows of ONE tile → dense array (tests / sinks)."""
    arr = np.zeros((tile_size, tile_size), dtype=np.float64)
    pxy = pixel_df["pxy"].to_numpy()
    arr[pxy // tile_size, pxy % tile_size] = pixel_df["burn"].to_numpy()
    return arr


def with_tile_cols(pixels: ray.data.Dataset, tile_size: int = 256) -> ray.data.Dataset:
    """Attach (tile_id, pxy) columns to (pix_id, burn) pixel rows."""

    def fn(batch: pa.Table) -> pa.Table:
        tile, pxy = pixel_tile_cols(batch["pix_id"].to_numpy(zero_copy_only=False),
                                    tile_size)
        return (batch.append_column("tile_id", pa.array(tile))
                     .append_column("pxy", pa.array(pxy)))

    return pixels.map_batches(fn, batch_format="pyarrow")


def rasterize_points_dense(points: ray.data.Dataset, z: int,
                           lon_col: str = "lon", lat_col: str = "lat",
                           value_col: Optional[str] = None,
                           merge_alg: str = "add",
                           tile_size: int = 256) -> ray.data.Dataset:
    """Dense tile rows (tile_id, z, tile_x, tile_y, data bytes, nonzero,
    total, checksum) — for sinks/goldens; sparse path above for scale."""
    pixels = with_tile_cols(
        rasterize_pixels(points, z, lon_col, lat_col, value_col, merge_alg, tile_size),
        tile_size)

    def to_dense(df: pd.DataFrame) -> pd.DataFrame:
        tile_id = np.uint64(df["tile_id"].iloc[0])
        arr = densify(df, tile_size)
        zz, tx, ty = cells.unpack_tile(np.asarray([tile_id]))
        return pd.DataFrame({
            "tile_id": [tile_id],
            "z": [int(zz[0])],
            "tile_x": [int(tx[0])],
            "tile_y": [int(ty[0])],
            "data": [arr.astype("<f8").tobytes()],
            "nonzero": [int((arr != 0).sum())],
            "total": [float(arr.sum())],
            "checksum": [gdal_checksum(arr)],
        })

    return pixels.groupby("tile_id").map_groups(to_dense, batch_format="pandas")


def decode_tile(data: bytes, tile_size: int = 256) -> np.ndarray:
    return np.frombuffer(data, dtype="<f8").reshape(tile_size, tile_size)


# ---------------------------------------------------------------------------
# Geometry rasterization (polygons / lines) — gdal_rasterize parity
# ---------------------------------------------------------------------------

def _merc_pixel_xy(lon: np.ndarray, lat: np.ndarray, z: int,
                   tile_size: int = 256):
    """Continuous global-pixel coordinates at zoom z (the vertex
    transform gv_rasterize_one_shape applies before scanline fill,
    `alg/gdalrasterize.cpp:640-672`)."""
    n = 1 << z
    lat = np.clip(np.asarray(lat, dtype=np.float64), -cells.MAX_MERC_LAT,
                  cells.MAX_MERC_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    rad = np.radians(lat)
    fx = (lon + 180.0) / 360.0 * n * tile_size
    fy = (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0 * n * tile_size
    return fx, fy


def _pack_parts(parts) -> tuple:
    coords = np.concatenate(parts).astype("<f8").tobytes()
    lens = np.asarray([len(p) for p in parts], dtype="<i4").tobytes()
    return coords, lens


def _unpack_parts(coords: bytes, lens: bytes):
    ls = np.frombuffer(lens, dtype="<i4")
    flat = np.frombuffer(coords, dtype="<f8").reshape(-1, 2)
    out = []
    o = 0
    for k in ls:
        out.append(flat[o:o + k])
        o += k
    return out


def rasterize_geometries(geoms: ray.data.Dataset, z: int,
                         wkb_col: str = "geometry",
                         burn: float = 1.0,
                         value_col: Optional[str] = None,
                         merge_alg: str = "add",
                         all_touched: bool = False,
                         tile_size: int = 256,
                         chunk_rows: int = 1024,
                         shuffle_partitions: Optional[int] = None,
                         to_pixel=None,
                         grid_w: Optional[int] = None,
                         grid_h: Optional[int] = None
                         ) -> ray.data.Dataset:
    """Polygon/line rasterization -> sparse pixel rows (pix_id, burn).

    gdal_rasterize semantics (`alg/gdalrasterize.cpp:569`
    gv_rasterize_one_shape + `alg/llrasterize.cpp` scanline/Bresenham
    kernels, re-derived in geom/scanline.py): pixel-center even-odd
    fill for polygons, Bresenham for lines, ALL_TOUCHED boundary
    burn, burn value fixed or from an attribute column
    (gdal_rasterize -a), MERGE_ALG add/count/max/min. Each shape burns
    a pixel at most once (ADD-mode visited-set parity).

    Scale design: phase A splits every geometry into independent
    scanline-range chunks of <= chunk_rows rows (a continent-sized
    polygon becomes many bounded work items — no task ever holds more
    than chunk_rows x width-of-bbox pixels); phase B rasterizes chunks
    and pre-combines in-batch; the final merge is the same narrow
    single-key pixel shuffle the point path uses.
    """
    if merge_alg not in _PA_AGG:
        raise ValueError(f"merge_alg must be one of {sorted(_PA_AGG)}")
    if z > 29 - int(np.log2(tile_size)):
        raise ValueError(f"zoom {z} exceeds single-key pixel packing range")
    pa_agg = _PA_AGG[merge_alg]
    n_global = (1 << z) * tile_size
    # to_pixel: optional (x_arr, y_arr) -> (fx, fy) fractional-pixel
    # mapper for arbitrary target grids (gdal_rasterize -te/-ts);
    # default is the WebMercator zoom-z pixel grid. grid_w/grid_h clip
    # the burn window (default: the full zoom-z global grid).
    gw = n_global if grid_w is None else int(grid_w)
    gh = n_global if grid_h is None else int(grid_h)
    if max(gw, gh) > n_global:
        raise ValueError("grid exceeds the zoom-z pixel packing range")
    from ..geom import scanline, wkb as wkb_mod

    def split(batch: pa.Table) -> pa.Table:
        wkbs = batch[wkb_col].to_numpy(zero_copy_only=False)
        if merge_alg == "count" or value_col is None:
            burns = np.full(len(wkbs), burn, dtype=np.float64)
        else:
            burns = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rows = {"coords": [], "lens": [], "kind": [], "burn": [],
                "y0": [], "y1": []}
        for i, b in enumerate(wkbs):
            kind, payload = wkb_mod.parse_wkb(b)
            if kind == "polygon":
                parts, gk = list(payload), "polygon"
            elif kind == "multipolygon":
                parts, gk = [r for rings in payload for r in rings], "polygon"
            elif kind == "linestring":
                parts, gk = [payload], "line"
            elif kind == "multilinestring":
                parts, gk = list(payload), "line"
            elif kind in ("point", "multipoint"):
                parts, gk = [payload], "point"
            else:
                raise ValueError(f"rasterize_geometries: unsupported {kind}")
            px_parts = []
            for p in parts:
                if to_pixel is not None:
                    fx, fy = to_pixel(p[:, 0], p[:, 1])
                else:
                    fx, fy = _merc_pixel_xy(p[:, 0], p[:, 1], z, tile_size)
                px_parts.append(np.stack([fx, fy], axis=1))
            ally = np.concatenate([p[:, 1] for p in px_parts])
            ymin = max(0, int(max(0.0, float(ally.min()))))
            ymax = min(gh - 1, int(float(ally.max())))
            coords, lens = _pack_parts(px_parts)
            for y0 in range(ymin, ymax + 1, chunk_rows):
                rows["coords"].append(coords)
                rows["lens"].append(lens)
                rows["kind"].append(gk)
                rows["burn"].append(burns[i])
                rows["y0"].append(y0)
                rows["y1"].append(min(y0 + chunk_rows - 1, ymax))
        return pa.table({
            "coords": pa.array(rows["coords"], type=pa.binary()),
            "lens": pa.array(rows["lens"], type=pa.binary()),
            "kind": pa.array(rows["kind"]),
            "burn": pa.array(rows["burn"], type=pa.float64()),
            "y0": pa.array(rows["y0"], type=pa.int64()),
            "y1": pa.array(rows["y1"], type=pa.int64()),
        })

    def fill(batch: pa.Table) -> pa.Table:
        pix_parts, burn_parts = [], []
        kinds = batch["kind"].to_pylist()
        burns = batch["burn"].to_numpy(zero_copy_only=False)
        y0s = batch["y0"].to_numpy(zero_copy_only=False)
        y1s = batch["y1"].to_numpy(zero_copy_only=False)
        coords = batch["coords"].to_pylist()
        lens = batch["lens"].to_pylist()
        for i in range(len(batch)):
            parts = _unpack_parts(coords[i], lens[i])
            ix, iy = scanline.rasterize_shape(
                kinds[i], parts, gw, gh,
                all_touched=all_touched, y_lo=int(y0s[i]), y_hi=int(y1s[i]))
            if len(ix) == 0:
                continue
            pix_parts.append(pack_pixel(z, ix, iy))
            burn_parts.append(np.full(len(ix), 1.0 if merge_alg == "count"
                                      else burns[i]))
        if not pix_parts:
            return pa.table({"pix_id": pa.array([], type=pa.uint64()),
                             "burn": pa.array([], type=pa.float64())})
        t = pa.table({"pix_id": pa.array(np.concatenate(pix_parts)),
                      "burn": pa.array(np.concatenate(burn_parts))})
        out = t.group_by(["pix_id"]).aggregate([("burn", pa_agg)])
        return out.rename_columns(["pix_id", "burn"])

    chunks = geoms.map_batches(split, batch_format="pyarrow")
    partials = chunks.map_batches(fill, batch_format="pyarrow")
    return combine_pixel_partials(partials, pa_agg, shuffle_partitions)
