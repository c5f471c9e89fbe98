"""Sieve filter: small regions merge into largest neighbor."""

import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.pipelines.polygonize import polygonize
from lib_gdal_ray.pipelines.rasterize import pack_pixel, unpack_pixel
from lib_gdal_ray.pipelines.sieve import sieve


def grid_ds(values: np.ndarray, z=2):
    ny, nx = values.shape
    gy, gx = np.nonzero(values)
    pix = pack_pixel(z, gx.astype(np.int64), gy.astype(np.int64))
    return ray.data.from_arrow(pa.table({
        "pix_id": pa.array(pix),
        "burn": pa.array(values[gy, gx].astype(np.float64))})).repartition(3)


def to_grid(ds, shape):
    df = ds.to_pandas()
    arr = np.zeros(shape)
    z, gx, gy = unpack_pixel(df["pix_id"].to_numpy().astype(np.uint64))
    arr[gy, gx] = df["burn"].to_numpy()
    return arr


def test_small_island_absorbed():
    g = np.ones((10, 10))
    g[4:6, 4:6] = 2.0  # 4-pixel island of value 2 inside value-1 sea
    out = to_grid(sieve(grid_ds(g), threshold=5), (10, 10))
    assert (out == 1.0).all()


def test_large_region_survives():
    g = np.ones((10, 10))
    g[2:8, 2:8] = 2.0  # 36-pixel block survives threshold 5
    out = to_grid(sieve(grid_ds(g), threshold=5), (10, 10))
    np.testing.assert_array_equal(out, g)


def test_cascade_merge():
    # a 1-px region adjacent only to a 3-px region adjacent to the sea:
    # both below threshold 5 -> everything ends up value 1
    g = np.ones((12, 12))
    g[5, 5] = 3.0
    g[5, 6] = 2.0
    g[5, 7] = 2.0
    g[6, 6] = 2.0
    out = to_grid(sieve(grid_ds(g), threshold=5), (12, 12))
    assert (out == 1.0).all()


def test_region_count_after_sieve():
    rng = np.random.default_rng(11)
    g = rng.integers(1, 3, (30, 30)).astype(float)
    sieved = sieve(grid_ds(g), threshold=4)
    regions = polygonize(sieved).to_pandas()
    assert (regions["n_pixels"] >= 4).all()


def test_labelprop_matches_task_on_speckle():
    # speckle raster: isolated 1-px islands scattered in a sea — the
    # adversarial regions≈pixels case the distributed path exists for.
    g = np.ones((24, 24))
    rng = np.random.default_rng(7)
    ys, xs = rng.integers(1, 23, 40), rng.integers(1, 23, 40)
    # keep speckles non-adjacent so the outcome is order-independent
    taken = np.zeros((24, 24), dtype=bool)
    for y, x in zip(ys, xs):
        if not taken[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2].any():
            g[y, x] = 5.0
            taken[y, x] = True
    a = to_grid(sieve(grid_ds(g), threshold=2, cc_mode="task"), (24, 24))
    b = to_grid(sieve(grid_ds(g), threshold=2, cc_mode="labelprop"),
                (24, 24))
    np.testing.assert_array_equal(a, b)
    assert (a == 1.0).all()


def test_labelprop_largest_neighbor_preference():
    # small region touching two large regions of different sizes must
    # take the LARGER one's value in both modes
    g = np.zeros((8, 20))
    g[:, :8] = 2.0          # 64 px
    g[:, 8:10] = 9.0        # 16 px small strip (threshold 20)
    g[:, 10:] = 3.0         # 80 px  <- largest neighbor
    a = to_grid(sieve(grid_ds(g), threshold=20, cc_mode="task"), (8, 20))
    b = to_grid(sieve(grid_ds(g), threshold=20, cc_mode="labelprop"),
                (8, 20))
    np.testing.assert_array_equal(a, b)
    assert (a[:, 8:10] == 3.0).all()


def test_labelprop_cascade():
    g = np.ones((12, 12))
    g[5, 5] = 3.0
    g[5, 6] = 2.0
    g[5, 7] = 2.0
    g[6, 6] = 2.0
    out = to_grid(sieve(grid_ds(g), threshold=5, cc_mode="labelprop"),
                  (12, 12))
    assert (out == 1.0).all()


def test_labelprop_large_survives():
    g = np.ones((10, 10))
    g[2:8, 2:8] = 2.0
    out = to_grid(sieve(grid_ds(g), threshold=5, cc_mode="labelprop"),
                  (10, 10))
    np.testing.assert_array_equal(out, g)
