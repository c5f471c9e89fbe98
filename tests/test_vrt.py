"""VRT XML dataset: parse/serialize, composite semantics, Ray read,
gdalbuildvrt. Reference parity: frmts/vrt/vrtdataset.cpp,
vrtsources.cpp, apps/gdalbuildvrt_lib.cpp."""
import os
import subprocess
import sys

import numpy as np
import pytest

from lib_gdal_ray.codecs.tiff import encode_geotiff
from lib_gdal_ray.sources import vrt as V

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tif(path, arr, transform=None, epsg=4326):
    with open(path, "wb") as f:
        f.write(encode_geotiff(arr, transform=transform, epsg=epsg))


def test_parse_serialize_roundtrip(tmp_path):
    ds = V.VRTDataset(xsize=10, ysize=8,
                      geotransform=(0.0, 1.0, 0.0, 8.0, 0.0, -1.0),
                      srs="EPSG:4326", metadata={"k": "v"})
    b = V.VRTBand(band=1, dtype="Int16", nodata=-9999.0,
                  color_interp="Gray")
    b.sources.append(V.VRTSource(
        filename="a.tif", band=2, src_rect=(0, 0, 5, 4),
        dst_rect=(1, 1, 5, 4), kind="complex",
        scale_ratio=2.0, scale_offset=1.5, nodata=0.0, relative=True))
    ds.bands.append(b)
    text = V.serialize_vrt(ds)
    back = V.parse_vrt(text, base_dir="/x")
    assert (back.xsize, back.ysize) == (10, 8)
    assert back.geotransform == ds.geotransform
    assert back.srs == "EPSG:4326"
    assert back.metadata == {"k": "v"}
    b2 = back.bands[0]
    assert (b2.dtype, b2.nodata, b2.color_interp) == ("Int16", -9999.0, "Gray")
    s2 = b2.sources[0]
    assert s2.filename == "a.tif" and s2.band == 2 and s2.relative
    assert s2.src_rect == (0, 0, 5, 4) and s2.dst_rect == (1, 1, 5, 4)
    assert (s2.scale_ratio, s2.scale_offset, s2.nodata) == (2.0, 1.5, 0.0)


def test_mosaic_two_tiles(tmp_path):
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = (np.arange(12, dtype=np.uint8) + 100).reshape(3, 4)
    _tif(tmp_path / "a.tif", a, transform=(0, 1, 0, 3, 0, -1))
    _tif(tmp_path / "b.tif", b, transform=(4, 1, 0, 3, 0, -1))
    ds = V.build_vrt([str(tmp_path / "a.tif"), str(tmp_path / "b.tif")])
    assert (ds.xsize, ds.ysize) == (8, 3)
    V.write_vrt(ds, str(tmp_path / "m.vrt"))
    # sources inside the vrt dir become relative
    text = open(tmp_path / "m.vrt").read()
    assert 'relativeToVRT="1"' in text and str(tmp_path) not in text
    arr, meta = V.open_vrt(str(tmp_path / "m.vrt"))
    assert arr.shape == (3, 8)
    np.testing.assert_array_equal(arr[:, :4], a)
    np.testing.assert_array_equal(arr[:, 4:], b)
    assert meta["transform"] == (0.0, 1.0, 0.0, 3.0, 0.0, -1.0)


def test_window_and_upscale(tmp_path):
    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    _tif(tmp_path / "s.tif", src)
    ds = V.VRTDataset(xsize=4, ysize=4)
    b = V.VRTBand(band=1, dtype="Byte")
    # 2x2 source window doubled to fill the 4x4 output (nearest)
    b.sources.append(V.VRTSource(filename=str(tmp_path / "s.tif"),
                                 src_rect=(1, 1, 2, 2),
                                 dst_rect=(0, 0, 4, 4)))
    ds.bands.append(b)
    arr, _ = V.materialize_vrt(ds)
    exp = np.repeat(np.repeat(src[1:3, 1:3], 2, axis=0), 2, axis=1)
    np.testing.assert_array_equal(arr, exp)


def test_complex_scale_nodata(tmp_path):
    src = np.array([[0, 10], [20, 0]], dtype=np.uint8)
    _tif(tmp_path / "s.tif", src)
    ds = V.VRTDataset(xsize=2, ysize=2)
    b = V.VRTBand(band=1, dtype="Float64", nodata=-1.0)
    b.sources.append(V.VRTSource(filename=str(tmp_path / "s.tif"),
                                 kind="complex", scale_ratio=0.5,
                                 scale_offset=3.0, nodata=0.0))
    ds.bands.append(b)
    arr, _ = V.materialize_vrt(ds)
    # nodata(0) pixels keep the band fill (-1); others v*0.5+3
    np.testing.assert_array_equal(
        arr, np.array([[-1.0, 8.0], [13.0, -1.0]]))


def test_derived_band_norm_diff(tmp_path):
    a = np.array([[4.0, 6.0]], dtype=np.float64)
    b = np.array([[2.0, 2.0]], dtype=np.float64)
    _tif(tmp_path / "a.tif", a)
    _tif(tmp_path / "b.tif", b)
    ds = V.VRTDataset(xsize=2, ysize=1)
    band = V.VRTBand(band=1, dtype="Float64",
                     subclass="VRTDerivedRasterBand",
                     pixel_function="norm_diff")
    band.sources.append(V.VRTSource(filename=str(tmp_path / "a.tif")))
    band.sources.append(V.VRTSource(filename=str(tmp_path / "b.tif")))
    ds.bands.append(band)
    arr, _ = V.materialize_vrt(ds)
    np.testing.assert_allclose(arr, [[(4 - 2) / 6, (6 - 2) / 8]])


def test_last_source_wins(tmp_path):
    a = np.full((2, 2), 1, dtype=np.uint8)
    b = np.full((2, 2), 7, dtype=np.uint8)
    _tif(tmp_path / "a.tif", a)
    _tif(tmp_path / "b.tif", b)
    ds = V.VRTDataset(xsize=3, ysize=2)
    band = V.VRTBand(band=1, dtype="Byte")
    band.sources.append(V.VRTSource(filename=str(tmp_path / "a.tif"),
                                    dst_rect=(0, 0, 2, 2)))
    band.sources.append(V.VRTSource(filename=str(tmp_path / "b.tif"),
                                    dst_rect=(1, 0, 2, 2)))
    ds.bands.append(band)
    arr, _ = V.materialize_vrt(ds)
    np.testing.assert_array_equal(arr, [[1, 7, 7], [1, 7, 7]])


def test_nested_vrt(tmp_path):
    src = np.arange(4, dtype=np.uint8).reshape(2, 2)
    _tif(tmp_path / "s.tif", src, transform=(0, 1, 0, 2, 0, -1))
    inner = V.build_vrt([str(tmp_path / "s.tif")])
    V.write_vrt(inner, str(tmp_path / "inner.vrt"))
    outer = V.VRTDataset(xsize=2, ysize=2)
    band = V.VRTBand(band=1, dtype="Byte")
    band.sources.append(V.VRTSource(filename=str(tmp_path / "inner.vrt")))
    outer.bands.append(band)
    arr, _ = V.materialize_vrt(outer)
    np.testing.assert_array_equal(arr, src)


def test_ray_read_matches_materialize(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    a = rng.integers(1, 255, (5, 6), dtype=np.uint8)
    b = rng.integers(1, 255, (5, 6), dtype=np.uint8)
    _tif(tmp_path / "a.tif", a, transform=(0, 1, 0, 5, 0, -1))
    _tif(tmp_path / "b.tif", b, transform=(6, 1, 0, 5, 0, -1))
    ds = V.build_vrt([str(tmp_path / "a.tif"), str(tmp_path / "b.tif")])
    V.write_vrt(ds, str(tmp_path / "m.vrt"))
    arr, _ = V.open_vrt(str(tmp_path / "m.vrt"))
    rows = V.read_vrt_pixels(str(tmp_path / "m.vrt")).to_pandas()
    got = np.zeros_like(arr, dtype=np.float64)
    got[rows["y"], rows["x"]] = rows["value"]
    np.testing.assert_array_equal(got, arr.astype(np.float64))


def test_ray_read_overlap_last_wins(ray_session, tmp_path):
    a = np.full((2, 2), 3, dtype=np.uint8)
    b = np.full((2, 2), 9, dtype=np.uint8)
    _tif(tmp_path / "a.tif", a)
    _tif(tmp_path / "b.tif", b)
    ds = V.VRTDataset(xsize=3, ysize=2)
    band = V.VRTBand(band=1, dtype="Byte")
    band.sources.append(V.VRTSource(filename=str(tmp_path / "a.tif"),
                                    dst_rect=(0, 0, 2, 2)))
    band.sources.append(V.VRTSource(filename=str(tmp_path / "b.tif"),
                                    dst_rect=(1, 0, 2, 2)))
    ds.bands.append(band)
    V.write_vrt(ds, str(tmp_path / "o.vrt"))
    rows = V.read_vrt_pixels(str(tmp_path / "o.vrt")).to_pandas()
    got = np.zeros((2, 3))
    got[rows["y"], rows["x"]] = rows["value"]
    np.testing.assert_array_equal(got, [[3, 9, 9], [3, 9, 9]])


def test_ray_read_derived(ray_session, tmp_path):
    a = np.array([[4.0, 6.0]], dtype=np.float64)
    b = np.array([[2.0, 2.0]], dtype=np.float64)
    _tif(tmp_path / "a.tif", a)
    _tif(tmp_path / "b.tif", b)
    ds = V.VRTDataset(xsize=2, ysize=1)
    band = V.VRTBand(band=1, dtype="Float64",
                     subclass="VRTDerivedRasterBand",
                     pixel_function="sum")
    band.sources.append(V.VRTSource(filename=str(tmp_path / "a.tif")))
    band.sources.append(V.VRTSource(filename=str(tmp_path / "b.tif")))
    ds.bands.append(band)
    V.write_vrt(ds, str(tmp_path / "d.vrt"))
    rows = V.read_vrt_pixels(str(tmp_path / "d.vrt")).to_pandas()
    got = np.zeros((1, 2))
    got[rows["y"], rows["x"]] = rows["value"]
    np.testing.assert_array_equal(got, [[6.0, 8.0]])


def test_gdalbuildvrt_cli(tmp_path):
    a = np.arange(6, dtype=np.uint8).reshape(2, 3)
    b = np.arange(6, dtype=np.uint8).reshape(2, 3) + 50
    _tif(tmp_path / "a.tif", a, transform=(0, 1, 0, 2, 0, -1))
    _tif(tmp_path / "b.tif", b, transform=(3, 1, 0, 2, 0, -1))
    out = str(tmp_path / "m.vrt")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gdalbuildvrt.py"),
         out, str(tmp_path / "a.tif"), str(tmp_path / "b.tif")],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    arr, _ = V.open_vrt(out)
    np.testing.assert_array_equal(arr[:, :3], a)
    np.testing.assert_array_equal(arr[:, 3:], b)


def test_parse_reference_shaped_vrt(tmp_path):
    """A VRT in the reference's byte.vrt shape (SRS as WKT, Metadata,
    NodataValue, SourceProperties ignored gracefully) parses."""
    src = np.arange(9, dtype=np.uint8).reshape(3, 3)
    _tif(tmp_path / "byte.tif", src)
    text = f"""<VRTDataset rasterXSize="3" rasterYSize="3">
  <SRS>GEOGCS["WGS 84"]</SRS>
  <GeoTransform>  4.4e+05,  60.0,  0.0,  3.75e+06,  0.0, -60.0</GeoTransform>
  <Metadata><MDI key="test">testvalue</MDI></Metadata>
  <VRTRasterBand dataType="Byte" band="1">
    <ColorInterp>Gray</ColorInterp>
    <NodataValue>107</NodataValue>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">byte.tif</SourceFilename>
      <SourceBand>1</SourceBand>
      <SourceProperties RasterXSize="3" RasterYSize="3" DataType="Byte"/>
      <SrcRect xOff="0" yOff="0" xSize="3" ySize="3"/>
      <DstRect xOff="0" yOff="0" xSize="3" ySize="3"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>"""
    p = tmp_path / "ref.vrt"
    p.write_text(text)
    ds = V.parse_vrt(text, str(tmp_path))
    assert ds.metadata["test"] == "testvalue"
    assert ds.bands[0].nodata == 107.0
    arr, _ = V.open_vrt(str(p))
    np.testing.assert_array_equal(arr, src)
