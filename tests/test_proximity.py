import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.pipelines.proximity import proximity
from lib_gdal_ray.pipelines.rasterize import pack_pixel, unpack_pixel


def ds_from(coords, z=3):
    gx = np.asarray([c[0] for c in coords], dtype=np.int64)
    gy = np.asarray([c[1] for c in coords], dtype=np.int64)
    return ray.data.from_arrow(pa.table({
        "pix_id": pa.array(pack_pixel(z, gx, gy)),
        "burn": pa.array(np.ones(len(gx)))}))


def test_vs_brute():
    rng = np.random.default_rng(5)
    targets = [(int(x), int(y)) for x, y in rng.integers(0, 100, (20, 2))]
    queries = [(int(x), int(y)) for x, y in rng.integers(0, 100, (300, 2))]
    out = proximity(ds_from(queries), ds_from(targets), maxdist=1000.0).to_pandas()
    z, qx, qy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
    tx = np.asarray([t[0] for t in targets])
    ty = np.asarray([t[1] for t in targets])
    for x, y, d in zip(qx, qy, out["dist"]):
        want = np.sqrt(((tx - x) ** 2 + (ty - y) ** 2).min())
        np.testing.assert_allclose(d, want)


def test_maxdist_cap():
    out = proximity(ds_from([(0, 0)]), ds_from([(50, 0)]), maxdist=10.0).to_pandas()
    assert out["dist"].iloc[0] == 10.0
