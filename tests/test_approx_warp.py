"""Approx transformer (GDALApproxTransformer analog) + gdalwarp -et."""

import json
import os
import subprocess
import sys

import numpy as np

from lib_gdal_ray.codecs.tiff import decode_geotiff, encode_geotiff
from lib_gdal_ray.geom.approx import ApproxTransformer
from lib_gdal_ray.geom.proj import Transformer

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _Counting:
    def __init__(self, base):
        self.base = base
        self.n = 0

    def transform(self, x, y):
        self.n += np.asarray(x).size
        return self.base.transform(x, y)


def test_scanline_accuracy_and_eval_reduction():
    # UTM inverse is genuinely curved along a scanline — the hard case
    base = _Counting(Transformer.get(32633, 4326))
    xs = 400000.0 + np.arange(2048) * 30.0
    y = 5_500_000.0
    ex_x, ex_y = base.transform(xs, np.full(len(xs), y))
    exact_evals = base.n

    base.n = 0
    at = ApproxTransformer(base, threshold=1e-6)  # ~0.1 mm in degrees
    ax, ay = at.transform_scanline(xs, y)
    assert np.abs(ax - ex_x).max() <= 1e-6
    assert np.abs(ay - ex_y).max() <= 1e-6
    # the verdict bar: >= 2x fewer exact evaluations (typically ~50x)
    assert base.n * 2 <= exact_evals, (base.n, exact_evals)


def test_threshold_zero_is_exact():
    base = _Counting(Transformer.get(3857, 4326))
    xs = -2_000_000.0 + np.arange(777) * 1000.0
    at = ApproxTransformer(base, threshold=0.0)
    ax, ay = at.transform_scanline(xs, 40000.0)
    ex, ey = base.transform(xs, np.full(len(xs), 40000.0))
    np.testing.assert_array_equal(ax, ex)
    np.testing.assert_array_equal(ay, ey)


def test_mercator_scanline_is_linear_one_split():
    # 3857->4326: lon is exactly affine in x, lat constant per row ->
    # the first midpoint check succeeds and evals stay O(1)
    base = _Counting(Transformer.get(3857, 4326))
    at = ApproxTransformer(base, threshold=1e-9)
    xs = np.arange(4096) * 100.0
    at.transform_scanline(xs, 123456.0)
    assert base.n <= 8, base.n


def _run_warp(src, dst, et):
    cli = os.path.join(_REPO, "scripts", "gdalwarp.py")
    out = subprocess.run(
        [sys.executable, cli, src, dst, "-t_srs", "EPSG:4326",
         "-r", "near", "-et", str(et), "--num-cpus", "2"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-800:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_gdalwarp_et_output_bit_identical(tmp_path):
    rng = np.random.default_rng(17)
    dem = rng.uniform(0, 100, (96, 128)).astype(np.float32)
    # 3857 source, ~1km pixels, offset to avoid half-pixel coincidences
    gt = (1_234_567.89, 1013.7, 0.0, 6_543_210.12, 0.0, -1013.7)
    src = str(tmp_path / "src.tif")
    with open(src, "wb") as f:
        f.write(encode_geotiff(dem, transform=gt, epsg=3857))

    d_exact = str(tmp_path / "exact.tif")
    d_approx = str(tmp_path / "approx.tif")
    _run_warp(src, d_exact, et=0)
    _run_warp(src, d_approx, et=0.125)

    a, ma = decode_geotiff(open(d_exact, "rb").read())
    b, mb = decode_geotiff(open(d_approx, "rb").read())
    np.testing.assert_array_equal(a, b)  # bit-identical samples
    assert ma["transform"] == mb["transform"]
