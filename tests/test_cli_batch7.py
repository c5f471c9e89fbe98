"""Subprocess drives for the apps/ CLI batch: gdal_footprint,
gdal_viewshed, gdaltransform, gdalenhance, gdalmanage, gdalsrsinfo,
sozip.

Reference surfaces: apps/gdal_footprint.cpp, apps/gdal_viewshed.cpp,
apps/gdaltransform.cpp, apps/gdalenhance.cpp, apps/gdalmanage.cpp,
apps/gdalsrsinfo.cpp, apps/sozip.cpp — re-expressed as Ray front-ends
over the library kernels."""

import json
import os
import struct
import subprocess
import sys
import zipfile
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(name):
    return os.path.join(REPO, "scripts", name)


def _run(args, timeout=300, stdin=None):
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, timeout=timeout, input=stdin)
    assert out.returncode == 0, out.stderr[-1000:]
    return out


def _json(out):
    return json.loads(out.stdout.strip().splitlines()[-1])


def _write_tif(path, arr, **kw):
    from lib_gdal_ray.codecs.tiff import encode_geotiff

    with open(path, "wb") as f:
        f.write(encode_geotiff(arr, **kw))


def test_gdal_footprint(tmp_path):
    # valid data = two disjoint rectangles in a sea of nodata
    arr = np.zeros((40, 60), dtype=np.uint8)
    arr[5:15, 5:25] = 7
    arr[25:35, 40:55] = 9
    src = str(tmp_path / "masked.tif")
    _write_tif(src, arr, transform=(100.0, 2.0, 0, 80.0, 0, -2.0),
               epsg=32633, nodata=0)
    dst = str(tmp_path / "footprint.csv")
    rep = _json(_run([_cli("gdal_footprint.py"), src, dst,
                      "--num-cpus", "2"]))
    assert rep["nodata"] == 0.0
    # write_csv_wkt emits a shard directory (one csv per block)
    lines = []
    for f in sorted(os.listdir(dst)):
        shard = open(os.path.join(dst, f)).read().strip().splitlines()
        lines.extend(ln for ln in shard[1:] if ln)
    lines.insert(0, "header")
    assert len(lines) == 3  # header + 2 footprint polygons
    # each polygon's pixel count matches its rectangle
    n_pix = sorted(int(ln.split(",")[1]) for ln in lines[1:])
    assert n_pix == [150, 200]
    # georeferenced: the WKT coordinates are in the 32633 frame
    assert "POLYGON" in lines[1]
    for ln in lines[1:]:
        wkt = ln.split('"')[1] if '"' in ln else ln.split(",")[-1]
        assert "110" in wkt or "180" in wkt  # geo coords, not pixels


def test_gdal_viewshed(tmp_path):
    from lib_gdal_ray.codecs.tiff import decode_geotiff

    # flat plain with one wall: pixels behind the wall are hidden
    dem = np.zeros((30, 30), dtype=np.float32)
    dem[:, 15] = 100.0
    src = str(tmp_path / "dem.tif")
    _write_tif(src, dem, transform=(0.0, 1.0, 0, 30.0, 0, -1.0),
               epsg=32633)
    dst = str(tmp_path / "vis.tif")
    # observer at pixel (5, 15) -> geo x=5.5-ish; use pixel centers
    rep = _json(_run([_cli("gdal_viewshed.py"), "-ox", "5", "-oy", "15",
                      "-oz", "2", src, dst, "--num-cpus", "4"]))
    assert rep["observer_pixel"] == [5, 15]
    with open(dst, "rb") as f:
        vis, meta = decode_geotiff(f.read())
    assert meta["epsg"] == 32633
    assert vis[15, 5] == 255          # observer sees itself
    assert vis[15, 10] == 255         # open plain toward the wall
    assert vis[15, 15] == 255         # wall top visible
    assert vis[15, 25] == 0           # behind the wall
    assert (vis[:, 25:] == 0).all()   # the whole far side is shadowed
    assert (vis[:, :15] == 255).all()  # near side all visible

    # -md: distance cap marks far pixels invisible
    dst2 = str(tmp_path / "vis_md.tif")
    _run([_cli("gdal_viewshed.py"), "-ox", "5", "-oy", "15",
          "-md", "3", src, dst2, "--num-cpus", "2"])
    with open(dst2, "rb") as f:
        vis2, _ = decode_geotiff(f.read())
    assert vis2[15, 5] == 255 and vis2[15, 9] == 0


def test_gdaltransform_crs_and_gcp(tmp_path):
    from lib_gdal_ray.geom.proj import Transformer

    out = _run([_cli("gdaltransform.py"), "-s_srs", "EPSG:4326",
                "-t_srs", "EPSG:3857", "--num-cpus", "2"],
               stdin="10 45\n-120 -33.5\n")
    rows = [list(map(float, ln.split()))
            for ln in out.stdout.strip().splitlines()]
    tx, ty = Transformer.get(4326, 3857).transform(
        np.array([10.0, -120.0]), np.array([45.0, -33.5]))
    np.testing.assert_allclose([r[0] for r in rows], tx, rtol=1e-9)
    np.testing.assert_allclose([r[1] for r in rows], ty, rtol=1e-9)

    # -i inverts
    out2 = _run([_cli("gdaltransform.py"), "-s_srs", "EPSG:4326",
                 "-t_srs", "EPSG:3857", "-i", "--num-cpus", "2"],
                stdin=f"{tx[0]} {ty[0]}\n")
    x, y, _ = map(float, out2.stdout.split())
    assert abs(x - 10) < 1e-6 and abs(y - 45) < 1e-6

    # affine GCP transform: pixel (2, 3) under x=100+2px, y=200-py
    gcps = ["-gcp", "0", "0", "100", "200",
            "-gcp", "10", "0", "120", "200",
            "-gcp", "0", "10", "100", "190",
            "-gcp", "10", "10", "120", "190"]
    out3 = _run([_cli("gdaltransform.py")] + gcps + ["--num-cpus", "2"],
                stdin="2 3\n")
    x, y, _ = map(float, out3.stdout.split())
    np.testing.assert_allclose([x, y], [104.0, 197.0], atol=1e-9)


def test_gdalenhance(tmp_path):
    from lib_gdal_ray.codecs.tiff import decode_geotiff

    # skewed distribution: equalization must flatten the CDF
    rng = np.random.RandomState(3)
    arr = (rng.rand(64, 64) ** 3 * 1000).astype(np.uint16)
    src = str(tmp_path / "raw.tif")
    _write_tif(src, arr, transform=(0, 1, 0, 64, 0, -1), epsg=4326)
    dst = str(tmp_path / "eq.tif")
    rep = _json(_run([_cli("gdalenhance.py"), src, dst,
                      "--num-cpus", "4"]))
    assert rep["bands"] == 1
    with open(dst, "rb") as f:
        eq, meta = decode_geotiff(f.read())
    assert eq.dtype == np.uint8 and meta["epsg"] == 4326
    # rank order preserved
    assert eq[arr.argmax() // 64, arr.argmax() % 64] == eq.max()
    # equalized histogram is far flatter; the residual clump is the
    # largest single input bin (equalization can't split one bin)
    h = np.bincount(eq.ravel(), minlength=256) / eq.size
    in_h = np.histogram(arr, bins=256)[0] / arr.size
    assert h.max() <= in_h.max() + 1e-9
    assert h.max() < 0.2
    assert len(np.unique(eq)) > 100  # spread across the byte range
    assert eq.max() == 255


def test_gdalmanage(tmp_path):
    arr = np.zeros((8, 8), dtype=np.uint8)
    tif = str(tmp_path / "a.tif")
    _write_tif(tif, arr)
    png = str(tmp_path / "b.png")
    from lib_gdal_ray.codecs.png import encode_png

    with open(png, "wb") as f:
        f.write(encode_png(arr))
    junk = str(tmp_path / "c.bin")
    with open(junk, "wb") as f:
        f.write(b"\x00" * 100)

    rep = _json(_run([_cli("gdalmanage.py"), "identify", tif, png,
                      junk, "--num-cpus", "2"]))
    assert rep["drivers"][tif] == "GTiff"
    assert rep["drivers"][png] == "PNG"
    assert rep["drivers"][junk] is None

    # copy + rename + delete carry sibling files (.tfw world file)
    with open(str(tmp_path / "a.tfw"), "w") as f:
        f.write("1\n0\n0\n-1\n0\n8\n")
    dst = str(tmp_path / "copied.tif")
    _run([_cli("gdalmanage.py"), "copy", tif, dst])
    assert os.path.exists(dst)
    assert os.path.exists(str(tmp_path / "copied.tfw"))
    ren = str(tmp_path / "renamed.tif")
    _run([_cli("gdalmanage.py"), "rename", dst, ren])
    assert os.path.exists(ren) and not os.path.exists(dst)
    assert os.path.exists(str(tmp_path / "renamed.tfw"))
    _run([_cli("gdalmanage.py"), "delete", ren])
    assert not os.path.exists(ren)
    assert not os.path.exists(str(tmp_path / "renamed.tfw"))


def test_gdalsrsinfo(tmp_path):
    rep = _json(_run([_cli("gdalsrsinfo.py"), "EPSG:32733"]))
    assert rep["supported"] and "+south" in rep["proj4"]
    assert rep["name"].endswith("33S")

    arr = np.zeros((4, 4), dtype=np.uint8)
    tif = str(tmp_path / "t.tif")
    _write_tif(tif, arr, transform=(0, 1, 0, 4, 0, -1), epsg=3857)
    rep2 = _json(_run([_cli("gdalsrsinfo.py"), tif]))
    assert rep2["epsg"] == 3857 and "+proj=merc" in rep2["proj4"]


def test_sozip(tmp_path):
    rng = np.random.RandomState(11)
    # compressible payload big enough for several chunks
    payload = (b"the quick brown fox %d " * 3000) % tuple(
        rng.randint(0, 10, 3000))
    small = b"tiny"
    f1 = tmp_path / "big.txt"
    f1.write_bytes(payload)
    f2 = tmp_path / "small.txt"
    f2.write_bytes(small)
    archive = str(tmp_path / "out.zip")

    rep = _json(_run([_cli("sozip.py"), archive, str(f1), str(f2),
                      "--chunk-size", "8192", "--num-cpus", "4"]))
    assert rep["n_members"] == 2 and rep["n_sozip"] == 1

    # 1) a fully standard zip: stdlib reads both members byte-identical
    with zipfile.ZipFile(archive) as z:
        names = z.namelist()
        assert "big.txt" in names and "small.txt" in names
        assert ".big.txt.sozip.idx" in names
        assert z.read("big.txt") == payload
        assert z.read("small.txt") == small
        idx = z.read(".big.txt.sozip.idx")
        # raw compressed stream of the big member
        info = z.getinfo("big.txt")
        with open(archive, "rb") as f:
            f.seek(info.header_offset)
            hdr = f.read(30)
            nlen, elen = struct.unpack("<HH", hdr[26:30])
            f.seek(info.header_offset + 30 + nlen + elen)
            cdata = f.read(info.compress_size)

    # 2) the seek property: every index offset starts an independently
    # decompressible chunk at a chunk_size boundary of the original
    ver, cs, usize, csize, n_off, _pad = struct.unpack_from("<IIQQII",
                                                            idx, 0)
    assert ver == 1 and cs == 8192 and usize == len(payload)
    assert csize == len(cdata)
    offsets = struct.unpack_from(f"<{n_off}Q", idx, 32)
    assert n_off == (len(payload) + cs - 1) // cs - 1
    for i, off in enumerate(offsets):
        d = zlib.decompressobj(-15)
        chunk = d.decompress(cdata[off:], cs)
        start = (i + 1) * cs
        assert chunk == payload[start:start + cs]
