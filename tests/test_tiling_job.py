"""Resumable tiling job: crash, resume, verify identical output."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.pipelines.rasterize import rasterize_pixels, with_tile_cols
from lib_gdal_ray.pipelines.tiling_job import read_tiling_output, run_tiling_job


def source():
    rng = np.random.default_rng(77)
    n = 5000
    return ray.data.from_arrow(pa.table({
        "lon": pa.array(rng.uniform(-179, 179, n)),
        "lat": pa.array(rng.uniform(-80, 80, n)),
        "v": pa.array(rng.uniform(0, 10, n)),
    })).repartition(8)


def pixel_frame(ds):
    df = ds.to_pandas()[["pix_id", "burn"]]
    return df.sort_values("pix_id").reset_index(drop=True)


def test_crash_resume_identical(tmp_path):
    out = str(tmp_path / "tiles")
    with pytest.raises(RuntimeError):
        run_tiling_job(source, out, z=5, lineage="L1", n_bands=6,
                       value_col="v", fail_on_band=3)
    # resume completes only the missing bands
    res = run_tiling_job(source, out, z=5, lineage="L1", n_bands=6, value_col="v")
    assert sorted(res["skipped"]) == [0, 1, 2]
    assert sorted(res["ran"]) == [3, 4, 5]

    # output identical to a single uninterrupted run
    got = pixel_frame(read_tiling_output(out))
    want = pixel_frame(with_tile_cols(rasterize_pixels(source(), 5, value_col="v")))
    pd.testing.assert_frame_equal(got, want)

    # counters aggregated across all bands
    assert res["counters"]["pixels"] == len(want)

    # a second resume is a no-op
    res2 = run_tiling_job(source, out, z=5, lineage="L1", n_bands=6, value_col="v")
    assert res2["ran"] == [] and len(res2["skipped"]) == 6


def test_lineage_change_recomputes(tmp_path):
    out = str(tmp_path / "tiles2")
    run_tiling_job(source, out, z=4, lineage="A", n_bands=2, value_col="v")
    res = run_tiling_job(source, out, z=4, lineage="B", n_bands=2, value_col="v")
    assert sorted(res["ran"]) == [0, 1]


def test_gpkg_output_crash_resume(tmp_path):
    import os

    from lib_gdal_ray.sources.gpkg_tiles import (merge_gpkg_tiles,
                                                 read_gpkg_raster_pixels)

    out = str(tmp_path / "gp")
    with pytest.raises(RuntimeError):
        run_tiling_job(source, out, z=5, lineage="P1", n_bands=4,
                       fail_on_band=2, output_format="gpkg")
    res = run_tiling_job(source, out, z=5, lineage="P1",
                         output_format="gpkg", n_bands=4)
    assert set(res["ran"]) | set(res["skipped"]) == set(range(4))
    assert res["skipped"]  # some bands survived the crash
    # per-band valid GeoPackages -> union of pixels == direct rasterize
    # (counts: byte-range safe at this density)
    shards = sorted(
        os.path.join(out, p, "tiles.gpkg")
        for p in os.listdir(out)
        if p.startswith("part=")
        and os.path.exists(os.path.join(out, p, "tiles.gpkg")))
    assert shards
    merged = str(tmp_path / "all.gpkg")
    merge_gpkg_tiles(shards, merged)
    back = pixel_frame(read_gpkg_raster_pixels(merged))
    back["pix_id"] = back["pix_id"].astype(np.uint64)
    want = pixel_frame(rasterize_pixels(source(), 5))
    want["pix_id"] = want["pix_id"].astype(np.uint64)
    pd.testing.assert_frame_equal(back, want)
    assert res["counters"]["pixels"] == len(want)


def test_geotiff_output_crash_resume(tmp_path):
    from lib_gdal_ray.sources.geotiff import read_geotiff_pixels

    out = str(tmp_path / "gt")
    with pytest.raises(RuntimeError):
        run_tiling_job(source, out, z=5, lineage="G1", n_bands=4,
                       value_col="v", fail_on_band=2,
                       output_format="geotiff")
    res = run_tiling_job(source, out, z=5, lineage="G1", n_bands=4,
                         value_col="v", output_format="geotiff")
    assert set(res["ran"]) | set(res["skipped"]) == set(range(4))
    assert res["skipped"]  # some bands survived the crash
    # read the real .tif tiles back; parity vs a direct rasterize
    back = pixel_frame(read_geotiff_pixels(out))
    want = pixel_frame(rasterize_pixels(source(), 5, value_col="v"))
    pd.testing.assert_frame_equal(back, want)
