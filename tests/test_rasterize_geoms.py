"""Distributed geometry rasterization (rasterize_geometries) tests."""

import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.geom import scanline, wkb as wkb_mod
from lib_gdal_ray.pipelines import rasterize as rast


def _pix_set(ds):
    df = ds.to_pandas()
    _, gx, gy = rast.unpack_pixel(df["pix_id"].to_numpy())
    return dict(zip(zip(gx.tolist(), gy.tolist()), df["burn"].tolist()))


def _kernel_pixels(wkb_bytes, z, all_touched=False, tile_size=256):
    kind, payload = wkb_mod.parse_wkb(wkb_bytes)
    if kind == "polygon":
        parts, gk = list(payload), "polygon"
    elif kind == "multipolygon":
        parts, gk = [r for rings in payload for r in rings], "polygon"
    else:
        parts, gk = [payload], "line"
    n_global = (1 << z) * tile_size
    px_parts = []
    for p in parts:
        fx, fy = rast._merc_pixel_xy(p[:, 0], p[:, 1], z, tile_size)
        px_parts.append(np.stack([fx, fy], axis=1))
    ix, iy = scanline.rasterize_shape(gk, px_parts, n_global, n_global,
                                      all_touched=all_touched)
    return set(zip(ix.tolist(), iy.tolist()))


def test_polygon_pipeline_matches_kernel():
    b = wkb_mod.box_to_wkb(-10.0, -5.0, 15.0, 8.0)
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([b], type=pa.binary())}))
    out = _pix_set(rast.rasterize_geometries(ds, 3, merge_alg="count",
                                             shuffle_partitions=4))
    assert set(out) == _kernel_pixels(b, 3)
    assert all(v == 1.0 for v in out.values())


def test_polygon_chunked_split_no_dup_or_gap():
    # chunk_rows smaller than the polygon's pixel height forces splits
    b = wkb_mod.box_to_wkb(-60.0, -40.0, 60.0, 40.0)
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([b], type=pa.binary())}))
    out = _pix_set(rast.rasterize_geometries(ds, 3, merge_alg="count",
                                             chunk_rows=37,
                                             shuffle_partitions=4))
    assert set(out) == _kernel_pixels(b, 3)
    assert all(v == 1.0 for v in out.values())  # no double-burn across chunks


def test_overlapping_polygons_merge_add():
    b1 = wkb_mod.box_to_wkb(0.0, 0.0, 30.0, 20.0)
    b2 = wkb_mod.box_to_wkb(10.0, 5.0, 40.0, 25.0)
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([b1, b2], type=pa.binary())}))
    out = _pix_set(rast.rasterize_geometries(ds, 3, merge_alg="count",
                                             shuffle_partitions=4))
    s1, s2 = _kernel_pixels(b1, 3), _kernel_pixels(b2, 3)
    assert set(out) == s1 | s2
    for p, v in out.items():
        assert v == (1.0 if p not in (s1 & s2) else 2.0)


def test_polygon_with_hole():
    outer = np.array([[0.0, 0.0], [40.0, 0.0], [40.0, 30.0], [0.0, 30.0], [0.0, 0.0]])
    hole = np.array([[10.0, 8.0], [30.0, 8.0], [30.0, 22.0], [10.0, 22.0], [10.0, 8.0]])
    b = wkb_mod.polygon_to_wkb([outer, hole])
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([b], type=pa.binary())}))
    got = set(_pix_set(rast.rasterize_geometries(ds, 3, shuffle_partitions=4)))
    assert got == _kernel_pixels(b, 3)
    # hole interior pixel absent, ring interior present
    fx, fy = rast._merc_pixel_xy(np.array([20.0]), np.array([15.0]), 3)
    assert (int(fx[0]), int(fy[0])) not in got
    fx, fy = rast._merc_pixel_xy(np.array([5.0]), np.array([2.0]), 3)
    assert (int(fx[0]), int(fy[0])) in got


def test_all_touched_superset_and_burn_from_field():
    b1 = wkb_mod.box_to_wkb(0.0, 0.0, 20.0, 15.0)
    b2 = wkb_mod.box_to_wkb(-50.0, -30.0, -30.0, -10.0)
    tbl = pa.table({"geometry": pa.array([b1, b2], type=pa.binary()),
                    "val": pa.array([3.0, 7.0])})
    ds = ray.data.from_arrow(tbl)
    plain = _pix_set(rast.rasterize_geometries(ds, 3, value_col="val",
                                               merge_alg="max",
                                               shuffle_partitions=4))
    at = _pix_set(rast.rasterize_geometries(ds, 3, value_col="val",
                                            merge_alg="max", all_touched=True,
                                            shuffle_partitions=4))
    assert set(plain) <= set(at)
    assert set(v for v in plain.values()) <= {3.0, 7.0}
    assert at == {**{p: v for p, v in at.items()},
                  **plain}  # plain values preserved under all_touched


def test_line_pipeline_matches_kernel():
    seg = np.array([[-20.0, -10.0], [35.0, 25.0], [40.0, -5.0]])
    b = wkb_mod.linestring_to_wkb(seg)
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([b], type=pa.binary())}))
    out = _pix_set(rast.rasterize_geometries(ds, 4, merge_alg="count",
                                             chunk_rows=64,
                                             shuffle_partitions=4))
    assert set(out) == _kernel_pixels(b, 4)
    assert all(v == 1.0 for v in out.values())


def test_multipolygon_roundtrip():
    rings1 = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 8.0], [0.0, 8.0], [0.0, 0.0]])]
    rings2 = [np.array([[30.0, 30.0], [45.0, 30.0], [45.0, 42.0], [30.0, 42.0], [30.0, 30.0]])]
    mp = wkb_mod.multipolygon_to_wkb([rings1, rings2]) if hasattr(wkb_mod, "multipolygon_to_wkb") else None
    if mp is None:
        import pytest
        pytest.skip("no multipolygon writer")
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([mp], type=pa.binary())}))
    got = set(_pix_set(rast.rasterize_geometries(ds, 3, shuffle_partitions=4)))
    assert got == _kernel_pixels(mp, 3)


class TestGdalRasterizeCli:
    def test_burn_box(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        from lib_gdal_ray.codecs.tiff import decode_geotiff
        from lib_gdal_ray.geom import wkb as W2

        src = str(tmp_path / "boxes.parquet")
        # one box covering exactly the grid cells [2,8) x [2,8) of a
        # 10x10 unit grid over (0,0)-(10,10)
        pa.parquet.write_table(pa.table({
            "gid": pa.array([1], type=pa.int64()),
            "geometry": pa.array([W2.box_to_wkb(2.0, 2.0, 8.0, 8.0)],
                                 type=pa.binary()),
        }), src)
        dst = str(tmp_path / "burn.tif")
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "gdal_rasterize.py")
        out = subprocess.run(
            [_sys.executable, cli, src, dst, "-te", "0", "0", "10", "10",
             "-ts", "10", "10", "-burn", "3", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        rep = _json.loads(out.stdout.strip().splitlines()[-1])
        assert rep["size"] == [10, 10]
        arr, meta = decode_geotiff(open(dst, "rb").read())
        # pixel centers x+0.5 in (2,8): columns/rows 2..7 inclusive
        want = np.zeros((10, 10), dtype=np.float32)
        want[2:8, 2:8] = 3.0
        np.testing.assert_array_equal(arr, want)
        assert meta["transform"] == (0.0, 1.0, 0.0, 10.0, 0.0, -1.0)
