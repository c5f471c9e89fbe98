"""Pipeline spec (.gdalg analog), schema-merge union, partitioned sink."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.pipelines.relational import union_all
from lib_gdal_ray.pipelines.spec import register_op, run_pipeline
from lib_gdal_ray.sources.sinks import HIVE_NULL, write_partitioned


def test_pipeline_spec_end_to_end(sf_med, tmp_path):
    out_dir = str(tmp_path / "out")
    spec = {"steps": [
        {"op": "read_parquet", "path": f"{sf_med}/events.parquet",
         "columns": ["event_id", "value"]},
        {"op": "derive_points", "key": "event_id"},
        {"op": "filter", "where": "value > 5"},
        {"op": "reproject", "src": 4326, "dst": 3857},
        {"op": "cell_assign", "res": 5.0},
        {"op": "select_columns", "columns": ["event_id", "x", "y", "cell_id"]},
        {"op": "write_parquet", "path": out_dir},
    ]}
    run_pipeline(spec)
    back = ray.data.read_parquet(out_dir)
    assert back.count() > 0
    assert set(back.schema().names) == {"event_id", "x", "y", "cell_id"}


def test_spec_from_json_file(sf_med, tmp_path):
    import json

    p = tmp_path / "p.json"
    p.write_text(json.dumps({"steps": [
        {"op": "read_parquet", "path": f"{sf_med}/region.parquet"},
        {"op": "limit", "n": 3},
    ]}))
    out = run_pipeline(str(p))
    assert out.count() == 3


def test_spec_unknown_op():
    with pytest.raises(ValueError, match="unknown op"):
        run_pipeline({"steps": [{"op": "nope"}]})


def test_custom_op_registration(sf_med):
    @register_op("double_value")
    def _double(ds, *, col):
        import pyarrow.compute as pc

        return ds.map_batches(
            lambda b: b.set_column(b.column_names.index(col), col,
                                   pc.multiply(b[col], 2.0)),
            batch_format="pyarrow")

    out = run_pipeline({"steps": [
        {"op": "read_parquet", "path": f"{sf_med}/region.parquet"},
        {"op": "double_value", "col": "r_regionkey"},
    ]})
    assert out.count() == 5


def test_union_all_schema_merge():
    a = ray.data.from_arrow(pa.table({"x": pa.array([1, 2], type=pa.int64()),
                                      "y": pa.array(["a", "b"])}))
    b = ray.data.from_arrow(pa.table({"x": pa.array([3], type=pa.int64()),
                                      "z": pa.array([9.5])}))
    out = union_all([a, b]).to_pandas().sort_values("x").reset_index(drop=True)
    assert list(out.columns) == ["x", "y", "z"]
    assert out["y"].iloc[2] is None or (isinstance(out["y"].iloc[2], float) and np.isnan(out["y"].iloc[2]))
    assert out["z"].iloc[2] == 9.5


def test_partitioned_sink_hive_nulls(tmp_path):
    out = str(tmp_path / "hive")
    t = pa.table({"k": pa.array(["a", None, "b"]), "v": pa.array([1, 2, 3])})
    write_partitioned(ray.data.from_arrow(t), out, ["k"])
    dirs = set(os.listdir(out))
    assert f"k={HIVE_NULL}" in dirs and "k=a" in dirs and "k=b" in dirs
    back = ray.data.read_parquet(out).to_pandas()
    assert back["v"].sum() == 6


def test_spec_raster_and_scrub_ops(ray_session, tmp_path):
    """New registry ops compose end-to-end from a JSON spec: rasterize
    -> GeoTIFF tile write, then a raster read + overview; and a text
    scrub step."""
    import json as _json

    import numpy as np

    from lib_gdal_ray.pipelines.spec import run_pipeline

    out = str(tmp_path / "tiles")
    spec = {"steps": [
        {"op": "read_parquet", "path": "/root/testdata/sf0.001/events.parquet",
         "columns": ["event_id"]},
        {"op": "derive_points", "key": "event_id"},
        {"op": "rasterize", "z": 3, "merge_alg": "count"},
        {"op": "write_geotiff_tiles", "path": out},
    ]}
    manifest = run_pipeline(_json.dumps(spec)).to_pandas()
    assert manifest["n_pixels"].sum() > 0
    assert all(p.endswith(".tif") for p in manifest["path"])

    back = run_pipeline({"steps": [
        {"op": "read_raster", "path": out, "drop_zero": True},
    ]}).to_pandas()
    assert len(back) == manifest["n_pixels"].sum()

    scrub = run_pipeline({"steps": [
        {"op": "read_parquet",
         "path": "/root/testdata/sf0.001/documents.parquet",
         "columns": ["doc_id", "text"]},
        {"op": "pii_scrub"},
        {"op": "limit", "n": 5},
    ]}).to_pandas()
    assert {"n_email", "n_ipv4", "n_phone"} <= set(scrub.columns)


def test_spec_generic_steps(ray_session, tmp_path):
    """tee / materialize / concat / cast_column / info / raster_index."""
    import json as _json

    import numpy as np

    from lib_gdal_ray.pipelines.spec import run_pipeline
    from lib_gdal_ray.sources.rasters import write_raster

    side = str(tmp_path / "side")
    out = run_pipeline({"steps": [
        {"op": "read_parquet", "path": "/root/testdata/sf0.001/events.parquet",
         "columns": ["event_id", "value"]},
        {"op": "filter", "where": "value > 5"},
        {"op": "tee", "path": side},
        {"op": "cast_column", "column": "event_id", "to": "int32"},
        {"op": "materialize"},
        {"op": "limit", "n": 10},
    ]}).to_pandas()
    assert len(out) == 10 and str(out["event_id"].dtype) == "int32"
    import ray.data as rd
    assert rd.read_parquet(side).count() > 0  # side branch written

    # concat of two sources doubles the rows
    both = run_pipeline({"steps": [{
        "op": "concat",
        "paths": ["/root/testdata/sf0.001/events.parquet",
                  "/root/testdata/sf0.001/events.parquet"],
        "columns": ["event_id"]}]})
    assert both.count() == 2 * rd.read_parquet(
        "/root/testdata/sf0.001/events.parquet").count()

    # info over a geometry layer
    from lib_gdal_ray.geom import wkb as W
    import pyarrow as pa
    geoms = [W.box_to_wkb(0, 0, 2, 3), W.box_to_wkb(-1, -5, 1, 1)]
    layer = str(tmp_path / "layer")
    rd.from_arrow(pa.table({"geometry": pa.array(geoms, type=pa.binary())})
                  ).write_parquet(layer)
    info = run_pipeline({"steps": [
        {"op": "read_parquet", "path": layer},
        {"op": "info", "geometry_col": "geometry"}]})
    r = info.iloc[0]
    assert r["n_rows"] == 2 and (r["xmin"], r["ymin"], r["xmax"], r["ymax"]) \
        == (-1.0, -5.0, 2.0, 3.0)

    # raster_index over header-only GeoTIFF metadata
    tifs = tmp_path / "tifs"
    tifs.mkdir()
    (tifs / "a.tif").write_bytes(write_raster(
        np.ones((16, 20), np.uint8), "GTiff",
        transform=(-180, 0.5, 0, 85, 0, -0.5), epsg=4326, compression="lzw"))
    idx = run_pipeline({"steps": [
        {"op": "raster_index", "path": str(tifs)}]}).to_pandas()
    assert list(idx["driver"]) == ["GTiff"]
    assert idx["xmax"].iloc[0] == -170.0 and idx["ymin"].iloc[0] == 77.0
