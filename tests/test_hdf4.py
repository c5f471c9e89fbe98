"""HDF4 read driver (sources/hdf4.py).

Parity: reference HDF4 driver (`frmts/hdf4/hdf4imagedataset.cpp`) on
its own autotest fixtures — `gcore/hdf4_read.py:38-53` GDALTest
checksums (4672 / 50054) for every *_2.hdf / *_3.hdf sample, the GR
expectations (`hdf4_read.py:72-92`: General_RImages 2 bands 361/400,
Image_with_Palette has a color table) — plus writer round-trips and
the line-range-split Ray reader.
"""

import glob
import os

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources import hdf4 as h4

DATA = "/root/reference/autotest/gcore/data"

SDS_FIXTURES = sorted(
    os.path.basename(p)
    for p in glob.glob(os.path.join(DATA, "*_2.hdf"))
    + glob.glob(os.path.join(DATA, "*_3.hdf")))


class TestReferenceFixtures:
    @pytest.mark.parametrize("name", SDS_FIXTURES)
    def test_sds_checksums(self, name):
        want = 50054 if "utmsmall" in name else 4672
        buf = open(os.path.join(DATA, name), "rb").read()
        arr, meta = h4.decode_hdf4(buf)
        assert meta["kind"] == "sds"
        b1 = arr if arr.ndim == 2 else arr[:, :, 0]
        assert b1.shape == ((100, 100) if "utmsmall" in name
                            else (20, 20))
        assert gdal_checksum(b1.astype(np.float64)) == want

    def test_gr_two_components(self):
        # hdf4_read.py:72-80: RasterCount 2, checksums 361 / 400
        buf = open(os.path.join(DATA, "General_RImages.hdf"),
                   "rb").read()
        arr, meta = h4.decode_hdf4(buf)
        assert meta["kind"] == "gr"
        assert arr.ndim == 3 and arr.shape[2] == 2
        assert gdal_checksum(arr[:, :, 0].astype(np.float64)) == 361
        assert gdal_checksum(arr[:, :, 1].astype(np.float64)) == 400

    def test_gr_palette(self):
        # hdf4_read.py:86-92: band 1 has a color table
        buf = open(os.path.join(DATA, "Image_with_Palette.hdf"),
                   "rb").read()
        arr, meta = h4.decode_hdf4(buf)
        assert arr.shape == (5, 5)
        assert meta["palette"].shape == (256, 3)

    def test_linked_block_sds(self):
        # SDSUNLIMITED.hdf stores its SD through a SPECIAL_LINKED
        # extended tag (unlimited dimension appends)
        buf = open(os.path.join(DATA, "SDSUNLIMITED.hdf"), "rb").read()
        arr, _ = h4.decode_hdf4(buf)
        assert arr.shape == (10, 10) and arr.dtype == np.dtype(">i4")

    def test_template_sds_reads_fill(self):
        # SDS.hdf's SDStemplate has a dim record but no written data
        buf = open(os.path.join(DATA, "SDS.hdf"), "rb").read()
        arr, _ = h4.decode_hdf4(buf)
        assert arr.shape == (16, 5) and (arr == 0).all()

    def test_registry_probe(self):
        from lib_gdal_ray.sources.rasters import identify, open_raster

        buf = open(os.path.join(DATA, "byte_2.hdf"), "rb").read()
        assert identify(buf) == "HDF4"
        name, arr, _ = open_raster(buf)
        assert name == "HDF4"
        assert gdal_checksum(arr.astype(np.float64)) == 4672


class TestWriterAndRayReader:
    @pytest.mark.parametrize("dt", ["u1", "i2", "u2", "i4", "f4", "f8"])
    def test_encode_decode_cycle(self, dt):
        rng = np.random.default_rng(4)
        a = (rng.random((17, 11)) * 120).astype(dt)
        arr, _ = h4.decode_hdf4(h4.encode_hdf4(a))
        np.testing.assert_array_equal(arr.astype(a.dtype), a)

    def test_ray_rows_line_split(self, tmp_path):
        rng = np.random.default_rng(6)
        a = (rng.random((70, 23)) * 250).astype(np.uint8)
        p = str(tmp_path / "r.hdf")
        open(p, "wb").write(h4.encode_hdf4(a))
        df = h4.read_hdf4_rows(p, rows_per_chunk=16).to_pandas()
        assert len(df) == 70 * 23
        dense = np.zeros_like(a, dtype=np.float64)
        dense[df.y.values, df.x.values] = df.value.values
        np.testing.assert_array_equal(dense, a.astype(np.float64))

    def test_ray_rows_reference_fixture(self):
        df = h4.read_hdf4_rows(
            os.path.join(DATA, "utmsmall_2.hdf"),
            rows_per_chunk=32).to_pandas()
        dense = np.zeros((100, 100))
        dense[df.y.values, df.x.values] = df.value.values
        assert gdal_checksum(dense) == 50054
