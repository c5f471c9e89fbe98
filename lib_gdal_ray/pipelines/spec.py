"""Config-driven pipeline spec — the `.gdalg` analog.

Reference: GDAL's unified CLI serializes any pipeline to a JSON
`.gdalg` file (`apps/gdalalg_abstract_pipeline.h:357,461`) replayable
via `gdal pipeline`. Here: a JSON-able list of steps, each
`{"op": <name>, ...args}`, compiled to a chained Dataset. The step
registry is the user-extension surface (SURVEY.md §2.10): register a
custom op with `register_op`.

Example:
    spec = {"steps": [
        {"op": "read_parquet", "path": ".../events.parquet",
         "columns": ["event_id", "value"]},
        {"op": "derive_points", "key": "event_id"},
        {"op": "filter", "where": "value > 5"},
        {"op": "reproject", "src": 4326, "dst": 3857},
        {"op": "cell_assign", "res": 5.0},
        {"op": "select_columns", "columns": ["event_id", "x", "y", "cell_id"]},
        {"op": "write_parquet", "path": "/tmp/out"},
    ]}
    run_pipeline(spec)
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, Optional

import ray.data

_OPS: Dict[str, Callable] = {}


def register_op(name: str):
    def deco(fn):
        _OPS[name] = fn
        return fn
    return deco


@register_op("read_parquet")
def _read_parquet(ds, *, path, columns=None):
    return ray.data.read_parquet(path, columns=columns)


@register_op("filter")
def _filter(ds, *, where):
    from ..functions.swq import attribute_filter

    return attribute_filter(ds, where)


@register_op("select_columns")
def _select(ds, *, columns):
    return ds.select_columns(columns)


@register_op("rename_columns")
def _rename(ds, *, names):
    return ds.rename_columns(names)


@register_op("reproject")
def _reproject(ds, *, src, dst, x_col="lon", y_col="lat", out_x="x", out_y="y",
               round_to=None, wkb_in=None, wkb_out=None):
    from ..stages.reproject import reproject

    return reproject(ds, src, dst, x_col=x_col, y_col=y_col,
                     out_x=out_x, out_y=out_y, round_to=round_to,
                     wkb_in=wkb_in, wkb_out=wkb_out)


@register_op("cell_assign")
def _cell_assign(ds, *, res, lon_col="lon", lat_col="lat", out="cell_id"):
    from ..stages.cell_assign import with_grid_cell

    return with_grid_cell(ds, res, lon_col=lon_col, lat_col=lat_col, out=out)


@register_op("derive_points")
def _derive_points(ds, *, key):
    import pyarrow as pa

    from ..functions import derive

    def fn(batch):
        lon, lat = derive.event_lonlat(batch[key].to_numpy(zero_copy_only=False))
        return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))

    return ds.map_batches(fn, batch_format="pyarrow")


@register_op("limit")
def _limit(ds, *, n):
    return ds.limit(n)


@register_op("sample")
def _sample(ds, *, fraction, seed=42):
    return ds.random_sample(fraction, seed=seed)


@register_op("sort")
def _sort(ds, *, keys, descending=False):
    return ds.sort(keys, descending=descending)


@register_op("rasterize")
def _rasterize(ds, *, z, value_col=None, merge_alg="add",
               lon_col="lon", lat_col="lat"):
    from .rasterize import rasterize_pixels

    return rasterize_pixels(ds, z, lon_col=lon_col, lat_col=lat_col,
                            value_col=value_col, merge_alg=merge_alg)


@register_op("tile_summary")
def _tile_summary(ds):
    from .rasterize import tile_summary

    return tile_summary(ds)


@register_op("write_parquet")
def _write_parquet(ds, *, path, partition_cols=None):
    from ..sources.sinks import write_partitioned

    write_partitioned(ds, path, partition_cols)
    return ds


@register_op("pii_scrub")
def _pii_scrub(ds, *, text_col="text"):
    from .text import pii_scrub

    return pii_scrub(ds, text_col=text_col)


@register_op("token_budget_mix")
def _token_budget_mix(ds, *, weights, total_tokens, source_col="source",
                      id_col="doc_id", text_col="text", tokens_col=None):
    from .sampling import token_budget_mix

    return token_budget_mix(ds, weights, total_tokens,
                            source_col=source_col, id_col=id_col,
                            text_col=text_col, tokens_col=tokens_col)


@register_op("pack_sequences")
def _pack_sequences(ds, *, seq_len, id_col="doc_id", text_col="text",
                    tokens_col=None, n_shards=64):
    from .packing import pack_sequences

    return pack_sequences(ds, seq_len, id_col=id_col, text_col=text_col,
                          tokens_col=tokens_col, n_shards=n_shards)


@register_op("near_dup_keep")
def _near_dup_keep(ds, *, id_col="doc_id", text_col="text", num_perm=64,
                   bands=16, threshold=0.5, shingle_k=5):
    from .dedup import minhash_lsh_pairs, near_dup_keep

    pairs = minhash_lsh_pairs(ds, text_col, id_col, num_perm=num_perm,
                              shingle_k=shingle_k, bands=bands,
                              threshold=threshold)
    return near_dup_keep(ds, pairs, id_col)


@register_op("read_geojson_seq")
def _read_geojson_seq(ds, *, path, properties=None):
    from ..sources.vector_formats import read_geojson_seq

    return read_geojson_seq(path, properties=properties)


@register_op("write_geojson_seq")
def _write_geojson_seq(ds, *, path, geometry_col="geometry"):
    from ..sources.vector_formats import write_geojson_seq

    write_geojson_seq(ds, path, geometry_col=geometry_col)
    return ds


@register_op("read_raster")
def _read_raster(ds, *, path, drop_zero=False):
    from ..sources.rasters import read_raster_pixels

    return read_raster_pixels(path, drop_zero=drop_zero)


@register_op("write_geotiff_tiles")
def _write_geotiff_tiles(ds, *, path, tile_size=256, dtype="float64",
                         compression="deflate"):
    import numpy as _np

    from ..sources.geotiff import write_geotiff_tiles

    return write_geotiff_tiles(ds, path, tile_size=tile_size,
                               dtype=_np.dtype(dtype),
                               compression=compression)


@register_op("media_decode")
def _media_decode(ds, *, batch_size=256):
    from ..stages.media import MediaDecodeStage

    return ds.map_batches(MediaDecodeStage(real=True),
                          batch_format="pyarrow", batch_size=batch_size)


@register_op("overview")
def _overview(ds, *, how="sum"):
    from .tiles import overview_pixels

    return overview_pixels(ds, how=how)


@register_op("check_geometry")
def _check_geometry(ds, *, wkb_col="geometry"):
    from ..stages.geom_ops import check_geometry

    return check_geometry(ds, wkb_col)


@register_op("reproject_geometry")
def _reproject_geometry(ds, *, src, dst, wkb_col="geometry"):
    from ..stages.geom_ops import transform_geometry

    return transform_geometry(ds, src, dst, wkb_col=wkb_col)


@register_op("simplify")
def _simplify(ds, *, tol, wkb_col="geometry"):
    from ..stages.geom_ops import simplify_geometry

    return simplify_geometry(ds, tol, wkb_col=wkb_col)


@register_op("makevalid")
def _makevalid(ds, *, wkb_col="geometry"):
    from ..stages.geom_ops import make_valid_geometry

    return make_valid_geometry(ds, wkb_col=wkb_col)


@register_op("buffer")
def _buffer(ds, *, dist, quadsegs=8, wkb_col="geometry"):
    from ..stages.geom_ops import buffer_geometry

    return buffer_geometry(ds, dist, quadsegs=quadsegs, wkb_col=wkb_col)


@register_op("segmentize")
def _segmentize(ds, *, max_length, wkb_col="geometry"):
    from ..stages.geom_ops import segmentize_geometry

    return segmentize_geometry(ds, max_length, wkb_col=wkb_col)


@register_op("spat_filter")
def _spat_filter(ds, *, xmin, ymin, xmax, ymax, wkb_col="geometry"):
    """ogr2ogr -spat analog: keep rows whose geometry envelope
    intersects the box (OGRLayer::SetSpatialFilterRect's cheap
    envelope stage; exact refinement composes via spatial_join)."""
    import numpy as _np
    import pyarrow as _pa

    from ..geom import wkb as _wkb

    def fn(batch: _pa.Table) -> _pa.Table:
        bufs = batch[wkb_col].to_numpy(zero_copy_only=False)
        bb = _wkb.wkb_bbox(bufs)
        keep = ((bb[:, 0] <= xmax) & (bb[:, 2] >= xmin)
                & (bb[:, 1] <= ymax) & (bb[:, 3] >= ymin))
        return batch.filter(_pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


@register_op("swap_xy")
def _swap_xy(ds, *, wkb_col="geometry"):
    from ..stages.geom_ops import swap_xy_geometry

    return swap_xy_geometry(ds, wkb_col)


@register_op("explode_collections")
def _explode_collections(ds, *, wkb_col="geometry"):
    from ..stages.geom_ops import explode_collections

    return explode_collections(ds, wkb_col)


@register_op("make_point")
def _make_point(ds, *, x_col, y_col, wkb_col="geometry"):
    from ..stages.geom_ops import make_point

    return make_point(ds, x_col, y_col, wkb_col)


@register_op("sql")
def _sql(ds, *, statement, layers=None, layer_name="input"):
    """OGR SQL over the pipeline stream (`ogrinfo -sql` analog): the
    incoming dataset is visible as `layer_name`; extra parquet layers
    may be declared as {name: path}."""
    from ..functions.ogrsql import execute_sql

    lyrs = {}
    if ds is not None:
        lyrs[layer_name] = ds
    for name, path in (layers or {}).items():
        lyrs[name] = (lambda p=path: ray.data.read_parquet(p))
    return execute_sql(statement, lyrs)


@register_op("read_gpkg")
def _read_gpkg(ds, *, path, layer=None, columns=None):
    from ..sources.gpkg import read_gpkg

    return read_gpkg(path, layer=layer, columns=columns)


@register_op("write_gpkg")
def _write_gpkg(ds, *, path, layer="layer", geometry_type="GEOMETRY"):
    from ..sources.gpkg import write_gpkg

    write_gpkg(ds, path, layer=layer, geometry_type=geometry_type)
    return None


@register_op("read_shapefile")
def _read_shapefile(ds, *, path, columns=None):
    from ..sources.shapefile import read_shapefile

    return read_shapefile(path, columns=columns)


@register_op("write_shapefile")
def _write_shapefile(ds, *, path):
    from ..sources.shapefile import write_shapefile

    write_shapefile(ds, path)
    return None


@register_op("chunk")
def _chunk(ds, *, window, stride, text_col="text", id_col="doc_id"):
    from .text import chunk_documents

    return chunk_documents(ds, window=window, stride=stride,
                           text_col=text_col, id_col=id_col)


@register_op("color_relief")
def _color_relief(ds, *, ramp, value_col="burn"):
    from .raster_calc import color_relief

    return color_relief(ds, [tuple(r) for r in ramp], value_col=value_col)


def run_pipeline(spec: Any) -> Optional[ray.data.Dataset]:
    """Run a spec (dict, JSON string, or path to a .json file)."""
    if isinstance(spec, str):
        if spec.lstrip().startswith("{"):
            spec = json.loads(spec)
        else:
            with open(spec) as f:
                spec = json.load(f)
    ds = None
    for i, step in enumerate(spec["steps"]):
        step = dict(step)
        op = step.pop("op")
        if op not in _OPS:
            raise ValueError(f"unknown op {op!r} at step {i}; "
                             f"known: {sorted(_OPS)}")
        ds = _OPS[op](ds, **step)
    return ds


@register_op("raster_index")
def _raster_index(ds, *, path):
    from ..sources.rasters import raster_index

    return raster_index(path)


@register_op("concat")
def _concat(ds, *, paths, columns=None):
    """Multi-source union (gdalalg_vector_concat analog)."""
    import ray.data as _rd

    parts = [_rd.read_parquet(p, columns=columns) for p in paths]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out if ds is None else ds.union(out)


@register_op("materialize")
def _materialize(ds):
    """Checkpoint the intermediate (gdalalg_materialize.cpp:34)."""
    return ds.materialize()


@register_op("tee")
def _tee(ds, *, path, partition_cols=None):
    """Fork the pipeline: write a side copy, keep streaming the main
    branch (generic `tee` step)."""
    from ..sources.sinks import write_partitioned

    side = ds.materialize()  # one upstream execution feeds both branches
    write_partitioned(side, path, partition_cols)
    return side


@register_op("cast_column")
def _cast_column(ds, *, column, to):
    """set-field-type / astype analog."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    def cast(batch):
        idx = batch.column_names.index(column)
        return batch.set_column(idx, column,
                                _pc.cast(batch[column], _pa.type_for_alias(to)))

    return ds.map_batches(cast, batch_format="pyarrow")


@register_op("info")
def _info(ds, *, geometry_col=None):
    """Schema/stats report (vector `info` analog): one summary row —
    row count, column list, and the layer extent when a WKB geometry
    column is named. Streaming: per-batch partial bbox + count, one
    tiny aggregate."""
    import pyarrow as _pa

    from ..geom import wkb as _wkb

    def partial(batch: _pa.Table) -> _pa.Table:
        import numpy as _np
        cols = {"n": _pa.array([len(batch)], _pa.int64()),
                "schema": _pa.array([",".join(batch.column_names)])}
        if geometry_col is not None:
            bb = _wkb.wkb_bbox(_np.asarray(
                batch[geometry_col].to_pylist(), dtype=object))
            cols.update({
                "xmin": _pa.array([float(bb[:, 0].min())] if len(bb) else [float("inf")]),
                "ymin": _pa.array([float(bb[:, 1].min())] if len(bb) else [float("inf")]),
                "xmax": _pa.array([float(bb[:, 2].max())] if len(bb) else [float("-inf")]),
                "ymax": _pa.array([float(bb[:, 3].max())] if len(bb) else [float("-inf")]),
            })
        return _pa.table(cols)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = {"n_rows": int(parts["n"].sum()),
           "schema": parts["schema"].iloc[0] if len(parts) else ""}
    if geometry_col is not None and len(parts):
        out.update({"xmin": float(parts["xmin"].min()),
                    "ymin": float(parts["ymin"].min()),
                    "xmax": float(parts["xmax"].max()),
                    "ymax": float(parts["ymax"].max())})
    import pandas as _pd

    return _pd.DataFrame([out])


@register_op("window")
def _window(ds, *, part_col, order_cols, specs, keep=None, n_buckets=256):
    from .windows import partitioned_window

    return partitioned_window(ds, part_col, order_cols, specs, keep=keep,
                              n_buckets=n_buckets)


@register_op("grouped_topk")
def _grouped_topk(ds, *, part_col, order_col, k, descending=True,
                  tiebreak=None, keep=None, n_buckets=256):
    from .windows import grouped_topk

    return grouped_topk(ds, part_col, order_col, k, descending=descending,
                        tiebreak=tiebreak, keep=keep, n_buckets=n_buckets)
