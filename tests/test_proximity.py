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


def test_shuffle_matches_broadcast_dense():
    """Cell-partitioned path vs broadcast on a DENSE target raster
    (every pixel of a 40x40 block is a target) + sparse far queries
    that exercise the empty-tile -> maxdist cap."""
    from lib_gdal_ray.pipelines.proximity import proximity_shuffle

    rng = np.random.default_rng(7)
    targets = [(int(x), int(y)) for x in range(40) for y in range(40)]
    queries = [(int(x), int(y)) for x, y in rng.integers(0, 300, (200, 2))]
    bro = proximity(ds_from(queries), ds_from(targets), maxdist=64.0).to_pandas()
    shf = proximity_shuffle(ds_from(queries), ds_from(targets),
                            maxdist=64.0, tile=64).to_pandas()
    b = bro.sort_values("pix_id").reset_index(drop=True)
    s = shf.sort_values("pix_id").reset_index(drop=True)
    assert len(b) == len(s) == len(set(map(tuple, queries)))
    np.testing.assert_array_equal(b["pix_id"].to_numpy(), s["pix_id"].to_numpy())
    np.testing.assert_allclose(b["dist"].to_numpy(), s["dist"].to_numpy())


def test_shuffle_halo_replication_exact():
    """A target one pixel outside a tile border must still serve the
    neighboring tile's queries (halo shipment)."""
    from lib_gdal_ray.pipelines.proximity import proximity_shuffle

    out = proximity_shuffle(ds_from([(64, 10)]), ds_from([(63, 10)]),
                            maxdist=32.0, tile=64).to_pandas()
    assert out["dist"].iloc[0] == 1.0
