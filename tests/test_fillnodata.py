import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.pipelines.fillnodata import fillnodata
from lib_gdal_ray.pipelines.rasterize import pack_pixel, unpack_pixel


def ds_px(coords_vals, z=3):
    gx = np.asarray([c[0] for c in coords_vals], dtype=np.int64)
    gy = np.asarray([c[1] for c in coords_vals], dtype=np.int64)
    v = np.asarray([c[2] if len(c) > 2 else 0.0 for c in coords_vals], dtype=np.float64)
    return ray.data.from_arrow(pa.table({
        "pix_id": pa.array(pack_pixel(z, gx, gy)), "burn": pa.array(v)}))


def test_fill_between_two_values():
    valid = ds_px([(0, 0, 10.0), (4, 0, 20.0)])
    queries = ds_px([(2, 0), (1, 0)])
    out = fillnodata(valid, queries, max_search=10.0, k=2).to_pandas()
    z, gx, gy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
    vals = dict(zip(gx, out["burn"]))
    np.testing.assert_allclose(vals[2], 15.0)  # equidistant -> mean
    assert 10.0 < vals[1] < 15.0  # closer to the 10 side


def test_out_of_reach_dropped():
    valid = ds_px([(0, 0, 5.0)])
    queries = ds_px([(50, 50)])
    out = fillnodata(valid, queries, max_search=4.0).to_pandas()
    assert len(out) == 0


def test_vs_brute_idw():
    rng = np.random.default_rng(2)
    valid_pts = [(int(x), int(y), float(v))
                 for x, y, v in zip(rng.integers(0, 40, 30), rng.integers(0, 40, 30),
                                    rng.uniform(0, 100, 30))]
    # dedup coords
    seen = {}
    for x, y, v in valid_pts:
        seen[(x, y)] = v
    valid_pts = [(x, y, v) for (x, y), v in seen.items()]
    queries = [(7, 7), (20, 20), (33, 5)]
    out = fillnodata(ds_px(valid_pts), ds_px(queries), max_search=100.0, k=5).to_pandas()
    z, gx, gy = unpack_pixel(out["pix_id"].to_numpy().astype(np.uint64))
    got = {(int(x), int(y)): v for x, y, v in zip(gx, gy, out["burn"])}
    vx = np.asarray([p[0] for p in valid_pts], dtype=float)
    vy = np.asarray([p[1] for p in valid_pts], dtype=float)
    vv = np.asarray([p[2] for p in valid_pts])
    for qx, qy in queries:
        d2 = (vx - qx) ** 2 + (vy - qy) ** 2
        top = np.argsort(d2)[:5]
        w = 1.0 / (d2[top] + 1e-12)
        want = (w * vv[top]).sum() / w.sum()
        np.testing.assert_allclose(got[(qx, qy)], want)
