import numpy as np
import pyarrow as pa
import ray.data

from lib_gdal_ray.pipelines.viewshed import line_of_sight, viewshed_counts


def test_flat_dem_all_visible():
    dem = np.zeros((20, 20))
    obs = ray.data.from_arrow(pa.table({"obs_id": pa.array([0]),
                                        "ox": pa.array([10]), "oy": pa.array([10])}))
    out = viewshed_counts(obs, dem, observer_height=2.0).to_pandas()
    assert out["n_visible"].iloc[0] == 400


def test_wall_casts_shadow():
    dem = np.zeros((1, 30))
    dem[0, 10] = 100.0  # wall at x=10
    tx = np.arange(30, dtype=np.int64)
    ty = np.zeros(30, dtype=np.int64)
    vis = line_of_sight(dem, 0, 0, 2.0, tx, ty)
    assert vis[5]          # before the wall
    assert vis[10]         # the wall top itself
    assert not vis[11:].any()  # everything behind is shadowed


def test_hill_observer_sees_over():
    dem = np.zeros((1, 30))
    dem[0, 10] = 3.0
    # observer high enough sees beyond the bump
    vis_high = line_of_sight(dem, 0, 0, 50.0,
                             np.arange(30, dtype=np.int64), np.zeros(30, dtype=np.int64))
    assert vis_high.all()
    vis_low = line_of_sight(dem, 0, 0, 0.5,
                            np.arange(30, dtype=np.int64), np.zeros(30, dtype=np.int64))
    assert not vis_low[20]


def test_multiple_observers_parallel():
    rng = np.random.default_rng(4)
    dem = rng.random((16, 16)) * 2
    obs = ray.data.from_arrow(pa.table({
        "obs_id": pa.array(np.arange(6, dtype=np.int64)),
        "ox": pa.array(np.asarray([2, 5, 8, 11, 14, 7])),
        "oy": pa.array(np.asarray([2, 5, 8, 11, 14, 3])),
    })).repartition(3)
    out = viewshed_counts(obs, dem).to_pandas()
    assert len(out) == 6
    assert (out["n_total"] == 256).all()
    assert (out["n_visible"] > 0).all()
