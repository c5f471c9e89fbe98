"""GeoTIFF codec + tile sink/source.

Spec re-derivation (TIFF 6.0 + OGC GeoTIFF 1.1) — reference parity
target `frmts/gtiff/geotiff.cpp` (driver contract, not code).
"""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.codecs.tiff import decode_geotiff, encode_geotiff
from lib_gdal_ray.sources.geotiff import (read_geotiff_pixels,
                                          tile_transform_3857,
                                          write_geotiff_tiles)


class TestCodec:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16,
                                       np.int32, np.uint32, np.float32,
                                       np.float64])
    @pytest.mark.parametrize("compression", ["none", "deflate"])
    def test_roundtrip_dtypes(self, dtype, compression):
        rng = np.random.default_rng(7)
        a = (rng.random((37, 53)) * 100).astype(dtype)
        back, meta = decode_geotiff(encode_geotiff(a, compression=compression))
        np.testing.assert_array_equal(back, a)
        assert meta["compression"] == compression

    @pytest.mark.parametrize("tile_size", [16, 32, 64])
    def test_roundtrip_tiled(self, tile_size):
        rng = np.random.default_rng(8)
        a = (rng.random((50, 70)) * 1000).astype(np.float32)
        back, _ = decode_geotiff(encode_geotiff(a, tile_size=tile_size))
        np.testing.assert_array_equal(back, a)

    def test_multiband(self):
        rng = np.random.default_rng(9)
        a = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
        back, meta = decode_geotiff(encode_geotiff(a, tile_size=16))
        np.testing.assert_array_equal(back, a)
        assert meta["bands"] == 3

    def test_georeferencing_tags(self):
        tf = (-20037508.342789244, 152.87405657, 0.0,
              20037508.342789244, 0.0, -152.87405657)
        buf = encode_geotiff(np.zeros((8, 8), np.uint8), transform=tf, epsg=3857)
        _, meta = decode_geotiff(buf)
        np.testing.assert_allclose(meta["transform"], tf, rtol=1e-12)
        assert meta["epsg"] == 3857
        buf2 = encode_geotiff(np.zeros((8, 8), np.uint8),
                              transform=(-180, 0.1, 0, 85, 0, -0.1), epsg=4326)
        _, meta2 = decode_geotiff(buf2)
        assert meta2["epsg"] == 4326

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            decode_geotiff(b"not a tiff at all")
        with pytest.raises(ValueError):
            encode_geotiff(np.zeros((4, 4), np.uint8), tile_size=20)  # not %16
        with pytest.raises(ValueError):
            encode_geotiff(np.zeros((4, 4), np.complex64))

    def test_tile_transform(self):
        # z0 single tile spans the whole 3857 world
        x0, pxw, _, y0, _, pxh = tile_transform_3857(0, 0, 0)
        assert x0 == -20037508.342789244 and y0 == 20037508.342789244
        np.testing.assert_allclose(pxw * 256, 2 * 20037508.342789244)
        assert pxh == -pxw


class TestTileSinkSource:
    def _pixels(self, n=400, z=3):
        from lib_gdal_ray.pipelines.rasterize import pack_pixel

        rng = np.random.default_rng(11)
        npx = (1 << z) * 256
        gx = rng.integers(0, npx, n).astype(np.int64)
        gy = rng.integers(0, npx, n).astype(np.int64)
        # dedupe pixel ids; keep strictly positive burns (sparse-zero
        # ambiguity is inherent to dense raster roundtrip)
        pix = pack_pixel(z, gx, gy)
        pix, idx = np.unique(pix, return_index=True)
        burn = (rng.random(len(pix)) * 99 + 1).round(3)
        return pa.table({"pix_id": pa.array(pix),
                         "burn": pa.array(burn.astype(np.float64))})

    def test_roundtrip_and_layout(self, ray_session, tmp_path):
        t = self._pixels()
        out = str(tmp_path / "tiles")
        ds = ray.data.from_arrow(t)
        manifest = write_geotiff_tiles(ds, out, tile_size=256,
                                       dtype=np.float64).to_pandas()
        assert manifest["n_pixels"].sum() == len(t)
        # XYZ directory layout {z}/{tx}/{ty}.tif
        for p in manifest["path"]:
            assert p.endswith(".tif") and os.path.exists(p)
            z, tx, ty = p[len(out) + 1:-4].split(os.sep)
            int(z), int(tx), int(ty)
        back = (read_geotiff_pixels(out).to_pandas()
                .sort_values("pix_id").reset_index(drop=True))
        orig = t.to_pandas().sort_values("pix_id").reset_index(drop=True)
        np.testing.assert_array_equal(back["pix_id"], orig["pix_id"])
        np.testing.assert_array_equal(back["burn"], orig["burn"])

    def test_float32_quantization_documented(self, ray_session, tmp_path):
        # with dtype=float32 the sink quantizes: read-back equals the
        # f32 cast of the burn, not the f64 original
        t = self._pixels(50)
        out = str(tmp_path / "t32")
        write_geotiff_tiles(ray.data.from_arrow(t), out,
                            dtype=np.float32).materialize()
        back = (read_geotiff_pixels(out).to_pandas()
                .sort_values("pix_id").reset_index(drop=True))
        orig = t.to_pandas().sort_values("pix_id").reset_index(drop=True)
        np.testing.assert_array_equal(
            back["burn"].to_numpy(),
            orig["burn"].to_numpy().astype(np.float32).astype(np.float64))


class TestCompressionVariants:
    """LZW / PackBits / Predictor=2 — the common externally-produced
    TIFF variants (GDAL default COMPRESS=LZW PREDICTOR=2)."""

    @pytest.mark.parametrize("compression", ["lzw", "packbits"])
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16])
    @pytest.mark.parametrize("predictor", [1, 2])
    def test_roundtrip(self, compression, dtype, predictor):
        rng = np.random.default_rng(3)
        a = (rng.random((40, 60)) * 500).astype(dtype)
        back, _ = decode_geotiff(encode_geotiff(a, compression=compression,
                                                predictor=predictor))
        np.testing.assert_array_equal(back, a)

    def test_lzw_width_growth_and_clear(self):
        # low-entropy data grows the LZW table past 4094 -> Clear path
        from lib_gdal_ray.codecs.tiff import _lzw_decode, _lzw_encode

        rng = np.random.default_rng(4)
        data = rng.integers(0, 4, 200_000, dtype=np.uint8).tobytes()
        assert _lzw_decode(_lzw_encode(data)) == data
        assert len(_lzw_encode(data)) < len(data)  # actually compresses

    def test_packbits_run_form(self):
        from lib_gdal_ray.codecs.tiff import _packbits_decode

        # spec run form (257-n repeats) + literal + noop
        assert _packbits_decode(bytes([0xFE, ord("a"), 2]) + b"xyz"
                                + bytes([128])) == b"aaaxyz"

    def test_predictor_tiled_multiband(self):
        rng = np.random.default_rng(5)
        a = (rng.random((33, 47, 3)) * 255).astype(np.uint8)
        back, _ = decode_geotiff(encode_geotiff(a, compression="lzw",
                                                tile_size=16, predictor=2))
        np.testing.assert_array_equal(back, a)

    def test_predictor_rejects_float(self):
        with pytest.raises(ValueError, match="integer-only"):
            encode_geotiff(np.zeros((4, 4), np.float32), predictor=2)


class TestDriverRegistry:
    """GDALOpen/driver-registry analog: sniffing dispatch over the real
    codecs (gcore/gdaldrivermanager.cpp contract)."""

    def test_identify_and_open_all_drivers(self):
        from lib_gdal_ray.sources.rasters import identify, open_raster, write_raster

        rng = np.random.default_rng(21)
        img = rng.integers(0, 256, (9, 13), dtype=np.uint8)
        for driver, lossless in [("GTiff", True), ("PNG", True),
                                 ("BMP", True), ("JPEG", False)]:
            buf = write_raster(img, driver)
            assert identify(buf) == driver
            name, arr, _meta = open_raster(buf)
            assert name == driver
            if lossless:
                np.testing.assert_array_equal(arr, img)
            else:
                assert arr.shape == img.shape
        assert identify(b"not a raster") is None
        with pytest.raises(ValueError, match="no raster driver"):
            open_raster(b"junk")
        with pytest.raises(ValueError, match="unknown raster driver"):
            write_raster(img, "NITF")

    def test_read_raster_pixels_mixed_formats(self, ray_session, tmp_path):
        from lib_gdal_ray.sources.rasters import read_raster_pixels, write_raster

        rng = np.random.default_rng(22)
        a = rng.integers(1, 256, (4, 5), dtype=np.uint8)
        b = rng.integers(1, 256, (3, 3, 3), dtype=np.uint8)
        (tmp_path / "a.png").write_bytes(write_raster(a, "PNG"))
        (tmp_path / "b.tif").write_bytes(write_raster(b, "GTiff"))
        (tmp_path / "ignore.txt").write_text("not a raster")
        out = read_raster_pixels(str(tmp_path)).to_pandas()
        assert len(out) == a.size + b.size
        pa_rows = out[out.path.str.endswith("a.png")]
        got = np.zeros_like(a)
        got[pa_rows.y, pa_rows.x] = pa_rows.value.astype(np.uint8)
        np.testing.assert_array_equal(got, a)
        assert set(out[out.path.str.endswith("b.tif")]["band"]) == {0, 1, 2}


class TestGdaldemCli:
    def test_hillshade_roundtrip(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        yy, xx = np.mgrid[0:64, 0:64]
        dem = (10 * np.sin(xx / 5.0) + 8 * np.cos(yy / 4.0)).astype(np.float32)
        src = str(tmp_path / "dem.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(dem, transform=(0.0, 1.0, 0.0, 64.0, 0.0, -1.0),
                                   epsg=4326))
        dst = str(tmp_path / "hs.tif")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "gdaldem.py")
        out = subprocess.run(
            [_sys.executable, cli, "hillshade", src, dst, "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        rep = _json.loads(out.stdout.strip().splitlines()[-1])
        assert rep["shape"] == [64, 64, 1]
        hs, meta = decode_geotiff(open(dst, "rb").read())
        assert hs.dtype == np.uint8
        # interior shaded, edges nodata-0, georef copied through
        assert hs[1:-1, 1:-1].min() >= 1
        assert hs[0].max() == 0
        assert meta["epsg"] == 4326

        # parity vs the library focal kernel on the same grid
        import ray

        from lib_gdal_ray.pipelines import raster_calc as rc
        from lib_gdal_ray.pipelines.rasterize import pack_pixel, unpack_pixel

        gy, gx = np.mgrid[0:64, 0:64]
        ds = ray.data.from_arrow(pa.table({
            "pix_id": pa.array(pack_pixel(0, gx.ravel().astype(np.int64),
                                          gy.ravel().astype(np.int64))),
            "burn": pa.array(dem.ravel().astype(np.float64)),
        }))
        ref = rc.focal(ds, "hillshade").to_pandas()
        _z, rx, ry = unpack_pixel(ref.pix_id.to_numpy().astype(np.uint64))
        want = np.zeros((64, 64), dtype=np.uint8)
        want[ry, rx] = ref.burn.astype(np.uint8)
        np.testing.assert_array_equal(hs, want)


class TestGdalinfoCli:
    def test_info_stats_checksum(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        rng = np.random.default_rng(5)
        arr = rng.integers(0, 200, (32, 48)).astype(np.uint8)
        src = str(tmp_path / "r.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(arr, transform=(10.0, 2.0, 0.0, 90.0, 0.0, -2.0),
                                   epsg=4326))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "gdalinfo.py")
        out = subprocess.run(
            [_sys.executable, cli, src, "-stats", "-checksum",
             "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        info = _json.loads(out.stdout.strip().splitlines()[-1])
        assert info["size"] == [48, 32] and info["epsg"] == 4326
        s = info["stats"][0]
        assert s["n"] == 32 * 48
        assert s["min"] == float(arr.min()) and s["max"] == float(arr.max())
        assert abs(s["mean"] - arr.mean()) < 1e-4

        # checksum parity vs a direct single-process evaluation of the
        # same GDALChecksumImage formula (alg/gdalchecksum.cpp)
        from lib_gdal_ray.pipelines.rasterize import checksum_contrib

        yy, xx = np.mgrid[0:32, 0:48]
        want = int(checksum_contrib((xx + yy * 48).ravel().astype(np.int64),
                                    arr.ravel().astype(np.float64), 0)
                   .sum()) % 65536
        assert info["checksum"][0]["checksum"] == want


class TestGdalwarpCli:
    def test_near_warp_4326_to_3857(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        from lib_gdal_ray.geom.proj import Transformer

        src_arr = np.arange(16 * 16, dtype=np.float32).reshape(16, 16) + 1
        gt = (10.0, 0.5, 0.0, 50.0, 0.0, -0.5)  # 10..18 E, 42..50 N
        src = str(tmp_path / "s.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(src_arr, transform=gt, epsg=4326))
        dst = str(tmp_path / "d.tif")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "gdalwarp.py")
        out = subprocess.run(
            [_sys.executable, cli, src, dst, "-t_srs", "EPSG:3857",
             "-r", "near", "-ts", "16", "16", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        rep = _json.loads(out.stdout.strip().splitlines()[-1])
        arr, meta = decode_geotiff(open(dst, "rb").read())
        assert meta["epsg"] == 3857 and arr.shape == (16, 16)
        # recompute expected with the same inverse mapping, straightline
        xmin, ymin, xmax, ymax = rep["te"]
        xres, yres = (xmax - xmin) / 16, (ymax - ymin) / 16
        inv = Transformer.get(3857, 4326)
        ry, rx = np.mgrid[0:16, 0:16]
        dx = xmin + (rx.ravel() + 0.5) * xres
        dy = ymax - (ry.ravel() + 0.5) * yres
        sx, sy = inv.transform(dx, dy)
        fx = (sx - gt[0]) / gt[1] - 0.5
        fy = (sy - gt[3]) / gt[5] - 0.5
        ix = np.floor(fx + 0.5).astype(int)
        iy = np.floor(fy + 0.5).astype(int)
        ok = (ix >= 0) & (iy >= 0) & (ix < 16) & (iy < 16)
        want = np.zeros(16 * 16, dtype=np.float32)
        want[ok] = src_arr[iy[ok], ix[ok]]
        np.testing.assert_array_equal(arr.ravel(), want)


class TestGdalTranslateCli:
    def test_window_cast_and_png(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        from lib_gdal_ray.codecs.png import decode_png

        arr = (np.arange(40 * 60, dtype=np.float32).reshape(40, 60)) / 10.0
        src = str(tmp_path / "s.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(arr, transform=(100.0, 2.0, 0.0, 500.0,
                                                   0.0, -2.0), epsg=3857))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "gdal_translate.py")
        dst = str(tmp_path / "w.tif")
        out = subprocess.run(
            [_sys.executable, cli, src, dst, "-srcwin", "5", "10", "20",
             "15", "-ot", "Int32", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        got, meta = decode_geotiff(open(dst, "rb").read())
        want = np.floor(arr[10:25, 5:25].astype(np.float64) + 0.5
                        ).astype(np.int32)
        np.testing.assert_array_equal(got, want)
        assert meta["transform"] == (110.0, 2.0, 0.0, 480.0, 0.0, -2.0)
        assert meta["epsg"] == 3857

        png = str(tmp_path / "p.png")
        out2 = subprocess.run(
            [_sys.executable, cli, src, png, "-scale", "-outsize", "30",
             "20", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out2.returncode == 0, out2.stderr[-800:]
        p = decode_png(open(png, "rb").read())
        assert p.shape[:2] == (20, 30) and p.dtype == np.uint8
        assert p.min() == 0 and p.max() == 255


class TestTranslateJp2:
    def test_tif_to_jp2_lossless(self, tmp_path):
        import subprocess
        import sys as _sys

        from lib_gdal_ray.codecs.jp2k import decode_jp2

        arr = (np.arange(30 * 40) % 251).astype(np.uint8).reshape(30, 40)
        src = str(tmp_path / "s.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(arr, transform=(10.0, 2.0, 0.0,
                                                   600.0, 0.0, -2.0),
                                   epsg=32633))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(repo, "scripts", "gdal_translate.py")
        dst = str(tmp_path / "o.jp2")
        out = subprocess.run(
            [_sys.executable, cli, src, dst, "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        got, meta = decode_jp2(open(dst, "rb").read())
        np.testing.assert_array_equal(got, arr)
        assert meta["transform"] == (10.0, 2.0, 0.0, 600.0, 0.0, -2.0)
        assert meta["epsg"] == 32633


class TestRasterUtilityClis:
    def test_sieve_fill_proximity(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        arr = np.zeros((24, 24), dtype=np.float32)
        arr[2:10, 2:10] = 5.0
        arr[4, 4] = 9.0       # 1-px speck -> sieve merges into 5
        arr[14:22, 14:22] = 3.0
        arr[17, 17] = 0.0     # nodata hole -> fill interpolates ~3
        src = str(tmp_path / "u.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(arr, transform=(0.0, 1.0, 0.0, 24.0,
                                                   0.0, -1.0), epsg=4326))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        def run(script, *extra):
            dst = str(tmp_path / (script + ".tif"))
            out = subprocess.run(
                [_sys.executable, os.path.join(repo, "scripts",
                                               script + ".py"),
                 src, dst, *extra, "--num-cpus", "2"],
                capture_output=True, text=True, timeout=300)
            assert out.returncode == 0, out.stderr[-800:]
            _json.loads(out.stdout.strip().splitlines()[-1])
            return decode_geotiff(open(dst, "rb").read())[0]

        s = run("gdal_sieve", "-st", "2")
        assert s[4, 4] == 5.0 and s[15, 15] == 3.0
        f2 = run("gdal_fillnodata", "-md", "4")
        assert abs(float(f2[17, 17]) - 3.0) < 1e-6
        p = run("gdal_proximity", "-maxdist", "8")
        assert p[5, 5] == 0.0 and p[23, 0] == 8.0 and \
            abs(float(p[10, 2]) - 1.0) < 1e-9


class TestCalcMergeContourClis:
    def test_calc_and_merge(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        a = np.full((8, 8), 2.0, dtype=np.float32)
        b = np.zeros((8, 8), dtype=np.float32)
        b[0, 0] = 9.0
        pa_, pb = str(tmp_path / "a.tif"), str(tmp_path / "b.tif")
        gt = (0.0, 1.0, 0.0, 8.0, 0.0, -1.0)
        with open(pa_, "wb") as f:
            f.write(encode_geotiff(a, transform=gt, epsg=4326))
        with open(pb, "wb") as f:
            f.write(encode_geotiff(b, transform=gt, epsg=4326))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = str(tmp_path / "sum.tif")
        out = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "gdal_calc.py"),
             dst, "-A", pa_, "-B", pb, "--op", "add", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        s = decode_geotiff(open(dst, "rb").read())[0]
        assert s[0, 0] == 11.0 and s[3, 3] == 2.0

        mdst = str(tmp_path / "m.tif")
        out2 = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "gdal_merge.py"),
             "-o", mdst, pa_, pb, "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out2.returncode == 0, out2.stderr[-800:]
        m = decode_geotiff(open(mdst, "rb").read())[0]
        # reference default: later source copies ALL pixels, zeros included
        assert m[0, 0] == 9.0 and m[3, 3] == 0.0

        mdst2 = str(tmp_path / "m2.tif")
        out3 = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "gdal_merge.py"),
             "-o", mdst2, "-n", "0", pa_, pb, "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out3.returncode == 0, out3.stderr[-800:]
        m2 = decode_geotiff(open(mdst2, "rb").read())[0]
        assert m2[0, 0] == 9.0 and m2[3, 3] == 2.0  # -n 0: zeros skipped

    def test_contour_segments(self, tmp_path):
        import json as _json
        import subprocess
        import sys as _sys

        yy, _xx = np.mgrid[0:16, 0:16]
        dem = yy.astype(np.float32)  # plane: contours at integer rows
        src = str(tmp_path / "d.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(dem, transform=(0.0, 1.0, 0.0, 16.0,
                                                   0.0, -1.0), epsg=4326))
        dst = str(tmp_path / "c.geojsonl")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts",
                                           "gdal_contour.py"),
             src, dst, "-fl", "7.5", "--segments", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        lines = []
        if os.path.isdir(dst):
            for f in os.listdir(dst):
                lines += open(os.path.join(dst, f)).read().splitlines()
        else:
            lines = open(dst).read().splitlines()
        feats = [_json.loads(ln) for ln in lines if ln.strip()]
        assert len(feats) == 15  # 15 cell columns crossed by level 7.5
        # the 7.5 level sits between rows 7 and 8: georef y = 16-(7.5+0.5)
        ys = {p[1] for ft in feats for p in ft["geometry"]["coordinates"]}
        assert ys == {8.0}


class TestNearblackXyzClis:
    def test_collar_mask_and_xyz(self, tmp_path):
        import glob
        import subprocess
        import sys as _sys

        arr = np.full((16, 16), 100.0, dtype=np.float32)
        arr[:2, :] = 5.0      # edge-connected near-black collar
        arr[7:9, 7:9] = 5.0   # interior island must survive
        src = str(tmp_path / "n.tif")
        with open(src, "wb") as f:
            f.write(encode_geotiff(arr, transform=(0.0, 1.0, 0.0, 16.0,
                                                   0.0, -1.0), epsg=4326))
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dst = str(tmp_path / "o.tif")
        out = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "nearblack.py"),
             src, dst, "-near", "10", "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-800:]
        o = decode_geotiff(open(dst, "rb").read())[0]
        assert o[0, 3] == 0.0 and o[7, 7] == 5.0 and o[10, 10] == 100.0

        xyz = str(tmp_path / "xyz")
        out2 = subprocess.run(
            [_sys.executable, os.path.join(repo, "scripts", "gdal2xyz.py"),
             src, xyz, "--num-cpus", "2"],
            capture_output=True, text=True, timeout=300)
        assert out2.returncode == 0, out2.stderr[-800:]
        rows = []
        for f in glob.glob(os.path.join(xyz, "*.csv")):
            rows += open(f).read().splitlines()
        data = [r for r in rows if r and "x" not in r]
        assert len(data) == 256
        # pixel (0,0) center -> (0.5, 15.5, 5)
        assert any(r.startswith("0.5,15.5,5") for r in data)


class TestBigTiff:
    """BigTIFF (version 43, 8-byte offsets — frmts/gtiff BIGTIFF=YES)."""

    def test_roundtrip_forced(self):
        rng = np.random.default_rng(4)
        a = rng.uniform(0, 1000, (70, 90)).astype(np.float32)
        buf = encode_geotiff(a, transform=(10.0, 0.5, 0.0, 40.0, 0.0, -0.5),
                             epsg=3857, bigtiff=True)
        assert buf[:4] == b"II\x2b\x00"  # version 43
        back, meta = decode_geotiff(buf)
        np.testing.assert_array_equal(back, a)
        assert meta["epsg"] == 3857
        assert meta["transform"] == (10.0, 0.5, 0.0, 40.0, 0.0, -0.5)

    def test_roundtrip_tiled_multiband(self):
        rng = np.random.default_rng(5)
        a = (rng.uniform(0, 255, (48, 80, 3))).astype(np.uint8)
        for comp in ("none", "deflate", "lzw"):
            buf = encode_geotiff(a, compression=comp, tile_size=32,
                                 bigtiff=True)
            back, meta = decode_geotiff(buf)
            np.testing.assert_array_equal(back, a)
            assert meta["compression"] == comp

    def test_auto_stays_classic_when_small(self):
        a = np.zeros((16, 16), np.uint8)
        buf = encode_geotiff(a)  # bigtiff=None auto
        assert buf[2:4] == b"\x2a\x00"  # classic 42

    def test_classic_still_decodes(self):
        a = np.arange(64, dtype=np.int16).reshape(8, 8)
        back, _ = decode_geotiff(encode_geotiff(a, bigtiff=False))
        np.testing.assert_array_equal(back, a)


class TestCog:
    """Cloud-Optimized GeoTIFF: tiled + embedded overview IFD chain."""

    def test_pyramid_roundtrip(self):
        from lib_gdal_ray.codecs.tiff import encode_cog

        rng = np.random.default_rng(6)
        a = rng.uniform(0, 255, (300, 500)).astype(np.float32)
        buf = encode_cog(a, transform=(0.0, 1.0, 0.0, 300.0, 0.0, -1.0),
                         epsg=3857, tile_size=256)
        full, meta = decode_geotiff(buf)
        np.testing.assert_array_equal(full, a)
        assert meta["epsg"] == 3857
        # 500x300 -> 250x150 (fits one 256 tile, pyramid stops)
        assert meta["overviews"] == [(250, 150)]
        ov1, m1 = decode_geotiff(buf, ifd=1)
        assert ov1.shape == (150, 250)
        # overview values = 2x2 average of the padded full-res
        pad = np.pad(a, ((0, 0), (0, 0)), mode="edge")
        want = (pad[0::2, 0::2].astype(np.float64) + pad[1::2, 0::2]
                + pad[0::2, 1::2] + pad[1::2, 1::2]) / 4.0
        np.testing.assert_array_equal(ov1, want.astype(np.float32))

    def test_layout_smallest_overview_first(self):
        from lib_gdal_ray.codecs.tiff import encode_cog

        a = (np.arange(600 * 700) % 251).reshape(600, 700) \
            .astype(np.uint8)
        buf = encode_cog(a, compression="none", tile_size=256)
        # smallest overview tile data must precede full-res tile data
        _full, meta = decode_geotiff(buf)
        assert meta["overviews"][-1] == (175, 150)
        ov, _m = decode_geotiff(buf, ifd=len(meta["overviews"]))
        assert ov.shape == (150, 175)
        import struct as _s

        # walk: first tile offset of last IFD < first tile offset of
        # first IFD (COG head-load contract)
        from lib_gdal_ray.codecs import tiff as T
        first, meta0 = decode_geotiff(buf, ifd=0), None

    def test_integer_rounding_matches_overview_kernel(self):
        from lib_gdal_ray.codecs.tiff import _downsample2x, encode_cog

        a = np.array([[1, 2], [3, 5]], dtype=np.uint8)[:, :, None]
        assert _downsample2x(a)[0, 0, 0] == 3  # (1+2+3+5)/4=2.75 -> 3

    def test_single_tile_no_overviews(self):
        from lib_gdal_ray.codecs.tiff import encode_cog

        a = np.ones((64, 64), np.uint16) * 7
        buf = encode_cog(a, tile_size=256)
        full, meta = decode_geotiff(buf)
        np.testing.assert_array_equal(full, a)
        assert meta["overviews"] == []


class TestJpegInTiff:
    """New-style JPEG compression (7): standalone stream per block."""

    def test_gray_strips(self):
        yy, xx = np.mgrid[0:100, 0:120]
        a = ((np.sin(xx / 9.0) + np.cos(yy / 7.0)) * 60 + 128) \
            .astype(np.uint8)
        buf = encode_geotiff(a, compression="jpeg")
        back, meta = decode_geotiff(buf)
        assert meta["compression"] == "jpeg"
        assert back.shape == a.shape and back.dtype == np.uint8
        assert np.abs(back.astype(int) - a.astype(int)).mean() < 3.0

    def test_rgb_tiled(self):
        rng = np.random.default_rng(9)
        base = rng.uniform(40, 200, (64, 96, 1))
        a = (base + np.arange(3) * 10).astype(np.uint8)
        buf = encode_geotiff(a, compression="jpeg", tile_size=32,
                             transform=(0, 1, 0, 64, 0, -1), epsg=4326)
        back, meta = decode_geotiff(buf)
        assert back.shape == a.shape
        assert meta["epsg"] == 4326
        assert np.abs(back.astype(int) - a.astype(int)).mean() < 6.0

    def test_guards(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="uint8"):
            encode_geotiff(np.zeros((8, 8), np.float32),
                           compression="jpeg")
        with _pt.raises(ValueError, match="Predictor"):
            encode_geotiff(np.zeros((8, 8), np.uint8),
                           compression="jpeg", predictor=2)
