"""Subprocess drives for the round-4 session-6 CLI additions:
pct2rgb / gdalattachpct (paletted PNG, color type 3), gdal_edit,
gdalmove, gdal_retile, gdalcompare, ogr_layer_algebra.

Reference surfaces: swig/python/gdal-utils/osgeo_utils/{pct2rgb,
gdalattachpct,gdal_edit,gdalmove,gdal_retile,gdalcompare}.py and
ogr_layer_algebra.py (all re-expressed as Ray front-ends over the
library kernels; no reference code)."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAL_PNG = "/root/reference/autotest/gdrivers/data/png/test.png"


def _cli(name):
    return os.path.join(REPO, "scripts", name)


def _run(args, timeout=300, expect_rc=0):
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, timeout=timeout)
    if expect_rc is not None:
        assert out.returncode == expect_rc, (out.returncode,
                                             out.stderr[-800:])
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    rep["_rc"] = out.returncode
    return rep


def _write_tif(path, arr, **kw):
    from lib_gdal_ray.codecs.tiff import encode_geotiff

    with open(path, "wb") as f:
        f.write(encode_geotiff(arr, **kw))


def test_pct2rgb_reference_fixture(tmp_path):
    from lib_gdal_ray.codecs.png import decode_png, decode_png_indexed

    dst = str(tmp_path / "rgb.png")
    rep = _run([_cli("pct2rgb.py"), PAL_PNG, dst, "-rgba",
                "--num-cpus", "2"])
    assert rep["size"] == [400, 400] and rep["bands"] == 4

    with open(PAL_PNG, "rb") as f:
        idx, pal, trns = decode_png_indexed(f.read())
    with open(dst, "rb") as f:
        out = decode_png(f.read())
    np.testing.assert_array_equal(out[:, :, :3], pal[idx])
    alpha = np.full(len(pal), 255, np.uint8)
    alpha[:len(trns)] = trns
    np.testing.assert_array_equal(out[:, :, 3], alpha[idx])


def test_gdalattachpct_roundtrip(tmp_path):
    from lib_gdal_ray.codecs.png import decode_png_indexed

    rng = np.random.RandomState(7)
    idx = rng.randint(0, 6, size=(40, 30)).astype(np.uint8)
    src = str(tmp_path / "index.tif")
    _write_tif(src, idx)

    pal_file = tmp_path / "palette.txt"
    lines = ["# test palette"]
    colors = rng.randint(0, 256, size=(6, 3))
    for v, (r, g, b) in enumerate(colors):
        lines.append(f"{v} {r} {g} {b}")
    pal_file.write_text("\n".join(lines))

    dst = str(tmp_path / "paletted.png")
    rep = _run([_cli("gdalattachpct.py"), str(pal_file), src, dst,
                "--num-cpus", "2"])
    assert rep["n_colors"] == 6 and rep["size"] == [30, 40]
    with open(dst, "rb") as f:
        i2, p2, t2 = decode_png_indexed(f.read())
    np.testing.assert_array_equal(i2, idx)
    np.testing.assert_array_equal(p2, colors.astype(np.uint8))
    assert t2 is None  # no alpha column -> no tRNS


def test_gdal_edit(tmp_path):
    from lib_gdal_ray.codecs.tiff import decode_geotiff

    arr = (np.arange(20 * 13).reshape(20, 13) % 200).astype(np.uint8)
    tif = str(tmp_path / "edit.tif")
    _write_tif(tif, arr, transform=(0, 1, 0, 0, 0, -1), epsg=4326)

    rep = _run([_cli("gdal_edit.py"), tif,
                "-a_srs", "EPSG:32633",
                "-a_ullr", "100", "200", "126", "160",
                "-a_nodata", "7", "--num-cpus", "2"])
    assert rep["epsg"] == 32633 and rep["nodata"] == 7

    with open(tif, "rb") as f:
        back, meta = decode_geotiff(f.read())
    np.testing.assert_array_equal(back, arr)  # pixels untouched
    assert meta["epsg"] == 32633 and meta["nodata"] == 7.0
    np.testing.assert_allclose(
        meta["transform"], (100.0, 2.0, 0.0, 200.0, 0.0, -2.0))


def test_gdalmove(tmp_path):
    from lib_gdal_ray.codecs.tiff import decode_geotiff
    from lib_gdal_ray.geom.proj import Transformer

    arr = (np.arange(16 * 16).reshape(16, 16) % 251).astype(np.uint8)
    tif = str(tmp_path / "move.tif")
    # small extent near the equator: web-mercator is near-affine, so
    # the LSQ fit error stays in single-digit meters
    _write_tif(tif, arr, transform=(10.0, 0.01, 0, 1.0, 0, -0.01),
               epsg=4326)

    rep = _run([_cli("gdalmove.py"), tif, "-t_srs", "EPSG:3857",
                "--num-cpus", "2"])
    assert rep["src_epsg"] == 4326 and rep["dst_epsg"] == 3857
    assert rep["max_fit_error"] < 10.0

    with open(tif, "rb") as f:
        back, meta = decode_geotiff(f.read())
    np.testing.assert_array_equal(back, arr)  # pixels untouched
    assert meta["epsg"] == 3857
    tx, ty = Transformer.get(4326, 3857).transform(
        np.array([10.0 + 0.08]), np.array([1.0 - 0.08]))
    # fitted affine agrees with the true transform at the center
    g0, g1, g2, g3, g4, g5 = meta["transform"]
    cx = g0 + 8 * g1 + 8 * g2
    cy = g3 + 8 * g4 + 8 * g5
    assert abs(cx - tx[0]) < 10 and abs(cy - ty[0]) < 10


def test_gdal_retile(tmp_path):
    from lib_gdal_ray.codecs.tiff import decode_geotiff

    arr = (np.arange(50 * 70).reshape(50, 70) % 251).astype(np.uint8)
    src = str(tmp_path / "big.tif")
    _write_tif(src, arr, transform=(100.0, 0.5, 0, 50.0, 0, -0.5),
               epsg=32610)
    tdir = str(tmp_path / "tiles")

    rep = _run([_cli("gdal_retile.py"), "-targetDir", tdir,
                "-ps", "32", "32", "--index", src, "--num-cpus", "4"])
    assert rep["n_tiles"] == 6  # ceil(70/32)=3 cols x ceil(50/32)=2 rows

    # edge tile keeps its partial size + windowed georeferencing
    with open(os.path.join(tdir, "big_2_3.tif"), "rb") as f:
        t23, m23 = decode_geotiff(f.read())
    np.testing.assert_array_equal(t23, arr[32:, 64:])
    np.testing.assert_allclose(
        m23["transform"], (100 + 64 * 0.5, 0.5, 0, 50 - 32 * 0.5, 0, -0.5))
    assert m23["epsg"] == 32610

    idx = pq.read_table(os.path.join(tdir, "tileindex.parquet"))
    assert idx.num_rows == 6
    assert set(idx.column_names) >= {"location", "xmin", "ymin",
                                     "xmax", "ymax"}

    # resume: everything already on disk -> all skipped
    rep2 = _run([_cli("gdal_retile.py"), "-targetDir", tdir,
                 "-ps", "32", "32", "--resume", src, "--num-cpus", "2"])
    assert rep2["n_tiles"] == 0 and rep2["skipped"] == 6


def test_gdalcompare(tmp_path):
    arr = (np.arange(30 * 30).reshape(30, 30) % 251).astype(np.uint8)
    golden = str(tmp_path / "golden.tif")
    same = str(tmp_path / "same.tif")
    diff = str(tmp_path / "diff.tif")
    gt = (0.0, 1.0, 0, 30.0, 0, -1.0)
    _write_tif(golden, arr, transform=gt, epsg=4326)
    _write_tif(same, arr, transform=gt, epsg=4326)
    arr2 = arr.copy()
    arr2[5, 5] += 1
    _write_tif(diff, arr2, transform=(5.0, 1.0, 0, 30.0, 0, -1.0),
               epsg=32633)

    rep = _run([_cli("gdalcompare.py"), golden, same, "--num-cpus", "2"])
    assert rep["differences"] == 0
    assert rep["bands"][0]["checksum_golden"] == \
        rep["bands"][0]["checksum_new"]

    rep2 = _run([_cli("gdalcompare.py"), golden, diff,
                 "--num-cpus", "2"], expect_rc=None)
    assert rep2["_rc"] == rep2["differences"] == 3  # cs + gt + srs
    assert rep2["bands"][0]["max_abs_diff"] == 1.0


def _square(x0, y0, size):
    from lib_gdal_ray.geom.wkb import box_to_wkb

    return box_to_wkb(x0, y0, x0 + size, y0 + size)


def test_ogr_layer_algebra(tmp_path):
    inp = str(tmp_path / "input.parquet")
    mth = str(tmp_path / "method.parquet")
    # two 10x10 input squares; one 10x10 method square straddling both
    pq.write_table(pa.table({
        "iid": pa.array([1, 2], pa.int64()),
        "geometry": pa.array([_square(0, 0, 10), _square(10, 0, 10)],
                             pa.binary())}), inp)
    pq.write_table(pa.table({
        "mid": pa.array([9], pa.int64()),
        "geometry": pa.array([_square(5, 0, 10)], pa.binary())}), mth)

    out = str(tmp_path / "inter.parquet")
    rep = _run([_cli("ogr_layer_algebra.py"), "Intersection",
                "-input_ds", inp, "-method_ds", mth,
                "-output_ds", out, "--num-cpus", "2"])
    assert rep["rows"] == 2
    tab = pq.read_table(out)
    assert {"iid", "mid"} <= set(tab.column_names)
    from lib_gdal_ray.stages.geom_ops import wkb_centroid_area

    areas = sorted(wkb_centroid_area(g)[2]
                   for g in tab.column("geometry").to_pylist())
    np.testing.assert_allclose(areas, [50.0, 50.0])

    out2 = str(tmp_path / "erase.parquet")
    rep2 = _run([_cli("ogr_layer_algebra.py"), "Erase",
                 "-input_ds", inp, "-method_ds", mth,
                 "-output_ds", out2, "--num-cpus", "2"])
    tab2 = pq.read_table(out2)
    assert rep2["rows"] == tab2.num_rows >= 2
    total = sum(wkb_centroid_area(g)[2]
                for g in tab2.column("geometry").to_pylist())
    np.testing.assert_allclose(total, 100.0)  # 200 input - 100 covered
