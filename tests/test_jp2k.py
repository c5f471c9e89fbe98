"""JPEG 2000 Part 1 decoder (codecs/jp2k.py).

Parity: the reference JP2OpenJPEG driver's own autotest checksums
(`autotest/gdrivers/jp2openjpeg.py`) on its fixture corpus — every
pinned value the reference asserts, we assert:
byte.jp2 50054 (:76), byte_tile_2048 4610 (:3059), origin-not-zero
4672 (:3676), tile_size_16 44216 + overview semantics (:3688),
3_13bit_and_1bit [64570,57277,56048,61292] (:233-237),
stefan alpha-1bit band4 promoted 8527 (:296).
"""

import glob
import os

import numpy as np
import pytest

from lib_gdal_ray.codecs.jp2k import decode_j2k, decode_jp2
from lib_gdal_ray.pipelines.rasterize import gdal_checksum

D = "/root/reference/autotest/gdrivers/data/jpeg2000"


def _bands(arr, meta):
    if "components" in meta:
        return meta["components"]
    if arr.ndim == 2:
        return [arr]
    return [arr[:, :, k] for k in range(arr.shape[2])]


def _cs(path):
    arr, meta = decode_jp2(open(path, "rb").read())
    return [gdal_checksum(b.astype(np.float64))
            for b in _bands(arr, meta)]


class TestReferencePins:
    @pytest.mark.parametrize("name,want", [
        # (file, [per-band checksums]) — values from jp2openjpeg.py
        ("byte.jp2", [50054]),
        ("byte_tile_2048.jp2", [4610]),
        ("byte_image_origin_not_zero.jp2", [4672]),
        ("tile_size_16.jp2", [44216]),
        ("3_13bit_and_1bit.jp2", [64570, 57277, 56048, 61292]),
        ("byte_tlm_plt.jp2", [4672]),        # 2 tiles + 2 layers RLCP
        ("byte_one_poc.j2k", [4672]),
        ("int16_lossless.jp2", [4672]),      # same data as byte.tif
        ("byte_lossless_openjp2_golden.jp2", [4672]),
    ])
    def test_checksums(self, name, want):
        assert _cs(os.path.join(D, name)) == want

    def test_lossless_equals_source_exactly(self):
        from lib_gdal_ray.codecs.tiff import decode_geotiff

        arr, _ = decode_jp2(
            open(f"{D}/byte_lossless_openjp2_golden.jp2", "rb").read())
        ref, _ = decode_geotiff(
            open("/root/reference/autotest/gcore/data/byte.tif",
                 "rb").read())
        assert np.array_equal(arr, ref)

    def test_1bit_alpha_band(self):
        # jp2openjpeg.py:296 — the promoted (1 -> 255) 4th band
        # checksums to 8527
        arr, meta = decode_jp2(
            open(f"{D}/stefan_full_rgba_alpha_1bit.jp2", "rb").read())
        b4 = _bands(arr, meta)[3].astype(np.int64)
        assert set(np.unique(b4)) <= {0, 1}
        assert gdal_checksum((b4 * 255).astype(np.float64)) == 8527

    def test_geojp2_georeferencing(self):
        # byte.jp2 carries the canonical byte.tif GeoJP2 uuid box
        _arr, meta = decode_jp2(open(f"{D}/byte.jp2", "rb").read())
        assert meta["transform"] == (440720.0, 60.0, 0.0,
                                     3751320.0, 0.0, -60.0)
        assert meta["epsg"] == 26711

    def test_registry_probe(self):
        from lib_gdal_ray.sources.rasters import identify, open_raster

        buf = open(f"{D}/byte.jp2", "rb").read()
        assert identify(buf) == "JP2OpenJPEG"
        name, arr, meta = open_raster(buf)
        assert name == "JP2OpenJPEG"
        assert gdal_checksum(arr.astype(np.float64)) == 50054


class TestBreadth:
    """Every small fixture decodes without error and with plausible
    shape/dtype (unpinned checksums recorded as regression values)."""

    @pytest.mark.parametrize("name,shape,cs", [
        ("int16.jp2", (20, 20), 4587),               # 9/7 lossy
        ("513x513.jp2", (513, 513), 41418),          # 9 tiles, 9/7
        ("ll.jp2", (128, 128), 62836),
        ("erdas_foo.jp2", (512, 512), 48356),
        ("gtsmall_10_uint16.jp2", (100, 500), 63343),
        ("gtsmall_11_int16.jp2", (100, 500), 63455),
        ("uint32_2x2_lossless_nbits_20.j2k", (2, 2), 15),
        ("fake_sent2_preview.jp2", (343, 343), 2046),  # 43x43 tiles
        ("byte_point.jp2", (20, 20), 4659),
        ("gmljp2_dtedsm_epsg_4326_axes.jp2", (121, 121), 39999),
    ])
    def test_decode(self, name, shape, cs):
        arr, meta = decode_jp2(open(os.path.join(D, name), "rb").read())
        b1 = _bands(arr, meta)[0]
        assert b1.shape == shape
        assert gdal_checksum(b1.astype(np.float64)) == cs

    def test_multicomponent(self):
        # kakadu-encoded 3-band RCT with max-size precincts
        cs = _cs(f"{D}/rgbwcmyk01_YeGeo_kakadu.jp2")
        assert cs == [32136, 32141, 32126]
        # ecw-sdk-encoded 16-bit RGB with RPCL + EPH
        cs = _cs(f"{D}/rgb16_ecwsdk.jp2")
        assert cs == [48984, 48130, 49180]
        # 9/7 + ICT RGBA
        cs = _cs(f"{D}/stefan_full_rgba.jp2")
        assert cs == [13644, 59519, 40758, 21712]

    def test_signed_16bit(self):
        arr, meta = decode_jp2(
            open(f"{D}/gmljp2_dtedsm_epsg_4326_axes.jp2", "rb").read())
        assert arr.dtype == np.int16

    def test_raw_codestream(self):
        # .j2k = raw codestream, no JP2 boxes
        arr, _ = decode_jp2(open(f"{D}/byte_one_poc.j2k", "rb").read())
        assert gdal_checksum(arr.astype(np.float64)) == 4672

    def test_truncated_rejected(self):
        with pytest.raises(Exception):
            decode_jp2(open(f"{D}/truncated.jp2", "rb").read())


class TestEncoder:
    """Lossless 5/3 encoder (encode_jp2) — bit-exact round-trips
    through the reference-pinned decoder, which makes the streams
    spec-conformant by construction."""

    @pytest.mark.parametrize("shape,dtype,nlevels", [
        ((20, 20), np.uint8, 5),
        ((37, 53), np.uint8, 3),
        ((21, 19), np.int16, 2),
        ((32, 32), np.uint16, 2),
        ((30, 44, 3), np.uint8, 2),
        ((16, 16, 4), np.uint8, 1),
    ])
    def test_roundtrip(self, shape, dtype, nlevels):
        rng = np.random.default_rng(11)
        a = (rng.random(shape) * 250).astype(dtype)
        from lib_gdal_ray.codecs.jp2k import encode_jp2

        buf = encode_jp2(a, nlevels=nlevels)
        arr, meta = decode_jp2(buf)
        got = np.stack(meta["components"], axis=-1) \
            if "components" in meta else arr
        assert np.array_equal(got, a)

    def test_byte_tif_cycle_with_georef(self):
        from lib_gdal_ray.codecs.jp2k import encode_jp2
        from lib_gdal_ray.codecs.tiff import decode_geotiff

        ref, _ = decode_geotiff(
            open("/root/reference/autotest/gcore/data/byte.tif",
                 "rb").read())
        gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
        buf = encode_jp2(ref, transform=gt, epsg=26711)
        arr, meta = decode_jp2(buf)
        assert np.array_equal(arr, ref)
        assert gdal_checksum(arr.astype(np.float64)) == 4672
        assert meta["transform"] == gt and meta["epsg"] == 26711

    def test_mq_coder_pair(self):
        from lib_gdal_ray.codecs.jp2k import MQDecoder, MQEncoder

        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, 800)
        ctxs = rng.integers(0, 19, 800)
        enc = MQEncoder()
        for c, b in zip(ctxs, bits):
            enc.encode(int(c), int(b))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == list(bits)

    def test_t1_pair_stress(self):
        from lib_gdal_ray.codecs.jp2k import decode_cblk, encode_cblk

        rng = np.random.default_rng(4)
        for ori in range(4):
            v = rng.normal(0, 3000, (33, 29)).astype(np.int64)
            v[rng.random(v.shape) < 0.6] = 0
            data, numbps, npasses = encode_cblk(v, ori)
            out = np.fix(decode_cblk(data, 29, 33, numbps, npasses,
                                     ori) / 2).astype(np.int64)
            assert np.array_equal(out, v)


class TestReducedResolution:
    def test_overview_checksum_pinned(self):
        # jp2openjpeg.py:3688-3689 — tile_size_16 full 44216 AND
        # GetOverview(0) (reduce=1 decode) 61711
        buf = open(f"{D}/tile_size_16.jp2", "rb").read()
        full, _ = decode_jp2(buf)
        assert gdal_checksum(full.astype(np.float64)) == 44216
        ov, _ = decode_jp2(buf, reduce=1)
        assert ov.shape == (128, 128)
        assert gdal_checksum(ov.astype(np.float64)) == 61711

    def test_reduce_on_lossless(self):
        buf = open(f"{D}/byte.jp2", "rb").read()
        ov, _ = decode_jp2(buf, reduce=2)
        assert ov.shape == (25, 25)
        full, _ = decode_jp2(buf)
        assert full.shape == (100, 100)

    def test_dimensions_above_31bit_rejected(self):
        # jp2openjpeg.py:1465-1469 — the reference refuses to open it
        with pytest.raises(ValueError, match="31 bit"):
            decode_jp2(open(f"{D}/dimensions_above_31bit.jp2",
                            "rb").read())

    def test_gmljp2_georeferencing(self):
        # jp2kak.py:304-315 expected geotransform for BOTH axis-order
        # variants of the GMLJP2 dtedsm fixture (urn srsName ->
        # lat/lon swap; center-of-pixel origin -> corner anchor)
        gte = (42.999583333333369, 0.008271349862259, 0,
               34.000416666666631, 0, -0.008271349862259)
        for name in ("gmljp2_dtedsm_epsg_4326_axes.jp2",
                     "gmljp2_dtedsm_epsg_4326_axes_alt_offsetVector"
                     ".jp2"):
            _a, meta = decode_jp2(open(f"{D}/{name}", "rb").read())
            assert meta["epsg"] == 4326
            for got, want in zip(meta["transform"], gte):
                assert abs(got - want) < 1e-7

    def test_capture_resolution_box(self):
        # jp2kak.py:281 — small_200ppcm carries a 200.012 pixels/cm
        # capture resolution (resd 6554/32768 * 10^5 px/m)
        _a, meta = decode_jp2(
            open(f"{D}/small_200ppcm.jp2", "rb").read())
        assert meta["resolution_ppcm"] == (200.012, 200.012)


class TestRaySource:
    """Tile-parallel Ray reader (sources/jp2.py) — per-task memory is
    one tile; union of tile decodes equals the whole-file decode."""

    def test_tile_parallel_equals_full(self):
        from lib_gdal_ray.sources.jp2 import read_jp2_pixels

        full, _ = decode_jp2(open(f"{D}/513x513.jp2", "rb").read())
        df = read_jp2_pixels(f"{D}/513x513.jp2").to_pandas()
        assert len(df) == 513 * 513
        dense = np.zeros_like(full, dtype=np.float64)
        dense[df.y.values, df.x.values] = df.value.values
        assert np.array_equal(dense, full.astype(np.float64))

    def test_many_tiny_tiles(self):
        from lib_gdal_ray.sources.jp2 import read_jp2_pixels

        # 43x43 tile grid (8x8 tiles over 343x343)
        full, _ = decode_jp2(
            open(f"{D}/fake_sent2_preview.jp2", "rb").read())
        df = read_jp2_pixels(f"{D}/fake_sent2_preview.jp2").to_pandas()
        dense = np.zeros_like(full, dtype=np.float64)
        dense[df.y.values, df.x.values] = df.value.values
        assert np.array_equal(dense, full.astype(np.float64))


class TestLossyEncoder:
    def test_quality_ladder(self):
        from lib_gdal_ray.codecs.jp2k import encode_jp2
        from lib_gdal_ray.codecs.tiff import decode_geotiff

        ref, _ = decode_geotiff(
            open("/root/reference/autotest/gcore/data/byte.tif",
                 "rb").read())
        prev_bytes = None
        prev_rmse = -1.0
        for q in (100, 80, 50):
            buf = encode_jp2(ref, nlevels=3, reversible=False,
                             quality=q)
            arr, _ = decode_jp2(buf)
            d = arr.astype(int) - ref.astype(int)
            rmse = float(np.sqrt((d ** 2).mean()))
            if q == 100:
                assert rmse == 0.0   # delta < 1 on 8-bit data
            assert rmse >= prev_rmse
            if prev_bytes is not None:
                assert len(buf) <= prev_bytes  # smaller as q drops
            prev_bytes = len(buf)
            prev_rmse = rmse
        assert rmse > 1.0            # q=50 is genuinely lossy

    def test_lossy_multiband(self):
        from lib_gdal_ray.codecs.jp2k import encode_jp2

        rng = np.random.default_rng(8)
        a = (rng.random((33, 47, 3)) * 255).astype(np.uint8)
        buf = encode_jp2(a, nlevels=2, reversible=False, quality=90)
        arr, meta = decode_jp2(buf)
        got = np.stack(meta["components"], axis=-1) \
            if "components" in meta else arr
        d = got.astype(int) - a.astype(int)
        assert np.abs(d).max() <= 4
