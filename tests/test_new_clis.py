"""Subprocess drives for the round-4 session-3 CLI additions
(gdaladdo, ogrmerge, gdal_pansharpen) and the ogr2ogr format
extensions (mif/dxf in and out, fid-column collision fix)."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIF = "/root/reference/autotest/ogr/data/mitab/all_geoms.mif"


def _run(args, timeout=300):
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, timeout=timeout)
    assert out.returncode == 0, out.stderr[-800:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_ogr2ogr_mif_to_gpkg_and_dxf(tmp_path):
    cli = os.path.join(REPO, "scripts", "ogr2ogr.py")
    gpkg = str(tmp_path / "geoms.gpkg")
    rep = _run([cli, gpkg, MIF, "--num-cpus", "2"])
    assert rep["rows"] == 16 and rep["src_format"] == "mif"
    dxf = str(tmp_path / "geoms.dxf")
    rep2 = _run([cli, dxf, MIF, "--num-cpus", "2"])
    assert rep2["dst_format"] == "dxf"
    assert os.path.getsize(dxf) > 1000


def test_ogr2ogr_parquet_to_mif(tmp_path):
    from lib_gdal_ray.geom import wkb as W

    src = str(tmp_path / "pts.parquet")
    x = np.linspace(-10, 10, 25)
    pa.parquet.write_table(pa.table({
        "pid": pa.array(np.arange(25, dtype=np.int64)),
        "geometry": pa.array(
            [bytes(g) for g in W.points_to_wkb(x, x * 0.5)], pa.binary()),
    }), src)
    cli = os.path.join(REPO, "scripts", "ogr2ogr.py")
    mif = str(tmp_path / "pts.mif")
    rep = _run([cli, mif, src, "--num-cpus", "2"])
    assert rep["rows"] == 25
    assert os.path.exists(str(tmp_path / "pts.mid"))
    from lib_gdal_ray.sources.mitab import read_mif

    back = read_mif(mif).to_pandas()
    assert len(back) == 25 and "pid" in back.columns


def test_gdaladdo(tmp_path):
    from lib_gdal_ray.codecs.tiff import encode_geotiff

    tif = str(tmp_path / "base.tif")
    arr = (np.arange(512 * 512).reshape(512, 512) % 251).astype(np.float32)
    open(tif, "wb").write(encode_geotiff(
        arr, transform=(0, 0.1, 0, 0, 0, -0.1), epsg=4326))
    cli = os.path.join(REPO, "scripts", "gdaladdo.py")
    rep = _run([cli, tif, "--num-cpus", "2"])
    assert rep["n_overview_ifds"] >= 1
    from lib_gdal_ray.codecs.tiff import decode_geotiff_meta

    meta = decode_geotiff_meta(open(tif, "rb").read())
    assert len(meta["overviews"]) >= 1


def test_ogrmerge(tmp_path):
    cli = os.path.join(REPO, "scripts", "ogrmerge.py")
    dst = str(tmp_path / "merged.parquet")
    rep = _run([cli, "-o", dst, MIF, MIF,
                "--src-layer-field-name", "src_layer",
                "--num-cpus", "2"])
    assert rep["n_sources"] == 2
    tab = pa.parquet.read_table(dst)
    assert tab.num_rows == 32
    assert set(tab["src_layer"].to_pylist()) == {"all_geoms"}


def test_gdal_pansharpen(tmp_path):
    from lib_gdal_ray.codecs.tiff import encode_geotiff
    from lib_gdal_ray.sources.rasters import open_raster

    rng = np.random.default_rng(2)
    pan = rng.uniform(50, 200, (32, 32)).astype(np.float32)
    ms = np.stack([rng.uniform(10, 100, (32, 32)) for _ in range(3)],
                  axis=2).astype(np.float32)
    ppath, mpath = str(tmp_path / "p.tif"), str(tmp_path / "m.tif")
    dpath = str(tmp_path / "s.tif")
    open(ppath, "wb").write(encode_geotiff(
        pan, transform=(0, 1, 0, 0, 0, -1), epsg=4326))
    open(mpath, "wb").write(encode_geotiff(
        ms, transform=(0, 1, 0, 0, 0, -1), epsg=4326))
    cli = os.path.join(REPO, "scripts", "gdal_pansharpen.py")
    rep = _run([cli, ppath, mpath, dpath, "--num-cpus", "2"])
    assert rep["n_bands"] == 3
    _f, sharp, _m = open_raster(open(dpath, "rb").read())
    exp = ms * (pan / ms.mean(axis=2))[:, :, None]
    assert np.abs(sharp - exp).max() < 1e-3


def test_rgb2pct(tmp_path):
    import numpy as np

    from lib_gdal_ray.codecs.png import decode_png
    from lib_gdal_ray.codecs.tiff import encode_geotiff

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, (64, 80, 3)).astype(np.uint8)
    src = str(tmp_path / "rgb.tif")
    open(src, "wb").write(encode_geotiff(
        arr, transform=(0, 0.1, 0, 0, 0, -0.1), epsg=4326))
    cli = os.path.join(REPO, "scripts", "rgb2pct.py")
    dst = str(tmp_path / "pct.png")
    rep = _run([cli, src, dst, "-n", "8", "--num-cpus", "2"])
    assert rep["n_colors"] == 8
    out = decode_png(open(dst, "rb").read())
    # quantized output uses at most 8 distinct colors
    colors = {tuple(px) for px in out.reshape(-1, 3)}
    assert len(colors) <= 8
