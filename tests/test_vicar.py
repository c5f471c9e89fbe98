"""VICAR reader parity (sources/vicar.py) vs
autotest/gdrivers/vicar.py — the full 13-variant dtype matrix incl.
VAX F/D floats and interleaved-complex checksums."""

import numpy as np
import pytest

from lib_gdal_ray.pipelines.rasterize import gdal_checksum
from lib_gdal_ray.sources.vicar import (decode_vicar, identify_vicar,
                                        parse_vicar_label)

D = "/root/reference/autotest/gdrivers/data/vicar"

MATRIX = [
    ("vicar_byte", np.uint8, 129),
    ("vicar_int16", np.int16, 129),
    ("vicar_bigendian_int16", np.int16, 129),
    ("vicar_int32", np.int32, 129),
    ("vicar_float32_bsq", np.float32, 123),
    ("vicar_float32_bil", np.float32, 123),
    ("vicar_float32_bip", np.float32, 123),
    ("vicar_bigendian_float32", np.float32, 129),
    ("vicar_float64", np.float64, 129),
    ("vicar_cfloat32", np.complex64, 148),
    ("vicar_vax_float32", np.float32, 129),
    ("vicar_vax_float64", np.float64, 129),
    ("vicar_vax_cfloat32", np.complex64, 226),
]


@pytest.mark.parametrize("name,dt,cs", MATRIX,
                         ids=[m[0] for m in MATRIX])
def test_dtype_matrix(name, dt, cs):
    arr, _ = decode_vicar(open(f"{D}/{name}.vic", "rb").read())
    band = arr if arr.ndim == 2 else arr[:, :, 0]
    assert band.dtype == dt
    assert gdal_checksum(band) == cs


def test_label_and_identify():
    buf = open(f"{D}/test_vicar_truncated.bin", "rb").read()
    assert identify_vicar(buf)
    lbl = parse_vicar_label(buf)
    assert lbl["FORMAT"] == "BYTE" and lbl["NL"] == "1000"
    assert lbl["BLTYPE"] == "M94_HRSC"


def test_binary_prefix_skipped():
    arr, _ = decode_vicar(
        open(f"{D}/vicar_binary_prefix.vic", "rb").read())
    assert arr.ndim == 2  # prefix bytes stripped, clean raster
