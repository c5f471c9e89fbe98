"""Pipeline tests: Ray Data operators vs brute-force numpy / DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.functions import derive
from lib_gdal_ray.geom import cells, pip, wkb
from lib_gdal_ray.pipelines import knn as knn_mod
from lib_gdal_ray.pipelines import rasterize as rast
from lib_gdal_ray.pipelines import relational as rel
from lib_gdal_ray.pipelines import spatial_join as sj
from lib_gdal_ray.pipelines import tiles as tiles_mod
from lib_gdal_ray.sources import tables
from lib_gdal_ray.stages.cell_assign import with_grid_cell


def make_points(n=2000, seed=1):
    rng = np.random.default_rng(seed)
    return pa.table({
        "pid": pa.array(np.arange(n, dtype=np.int64)),
        "lon": pa.array(rng.uniform(-179, 179, n)),
        "lat": pa.array(rng.uniform(-84, 84, n)),
    })


def make_zones():
    nk = np.arange(25, dtype=np.int64)
    xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
    wkbs = [wkb.box_to_wkb(float(a), float(b), float(c), float(d))
            for a, b, c, d in zip(xmin, ymin, xmax, ymax)]
    return pa.table({
        "zone_id": pa.array(nk),
        "geometry": pa.array(wkbs, type=pa.binary()),
    }), (xmin, ymin, xmax, ymax)


def brute_pip_pairs(pts: pa.Table, zones_tbl: pa.Table):
    px = pts["lon"].to_numpy()
    py = pts["lat"].to_numpy()
    pid = pts["pid"].to_numpy()
    pairs = set()
    for i in range(len(zones_tbl)):
        polys = wkb.wkb_rings(zones_tbl["geometry"][i].as_py())
        inside = pip.points_in_multipolygon(px, py, polys)
        for p in pid[inside]:
            pairs.add((int(p), int(zones_tbl["zone_id"][i].as_py())))
    return pairs


class TestSpatialJoin:
    def test_broadcast_vs_brute(self):
        pts = make_points()
        zones, _ = make_zones()
        ds = ray.data.from_arrow(pts)
        out = sj.broadcast_pip_join(
            ds, zones, "geometry", ["zone_id"], res=5.0, concurrency=2
        ).to_pandas()
        got = set(zip(out["pid"].astype(int), out["zone_id"].astype(int)))
        want = brute_pip_pairs(pts, zones)
        assert got == want and len(want) > 100

    def test_broadcast_left_join(self):
        pts = make_points(500, seed=3)
        zones, _ = make_zones()
        ds = ray.data.from_arrow(pts)
        out = sj.broadcast_pip_join(
            ds, zones, "geometry", ["zone_id"], res=5.0, how="left", concurrency=2
        ).to_pandas()
        # every point appears at least once
        assert set(out["pid"]) == set(range(500))
        matched = out[out["zone_id"].notna()]
        want = brute_pip_pairs(pts, zones)
        got = set(zip(matched["pid"].astype(int), matched["zone_id"].astype(int)))
        assert got == want

    def test_shuffle_vs_brute(self):
        pts = make_points(800, seed=5)
        zones, _ = make_zones()
        ds = ray.data.from_arrow(pts)
        zds = ray.data.from_arrow(zones)
        out = sj.shuffle_pip_join(
            ds, zds, "geometry", ["zone_id"], ["pid"], res=5.0,
        ).to_pandas()
        got = set(zip(out["pid"].astype(int), out["zone_id"].astype(int)))
        want = brute_pip_pairs(pts, zones)
        assert got == want

    def test_shuffle_with_salting(self):
        pts = make_points(800, seed=6)
        zones, _ = make_zones()
        ds = ray.data.from_arrow(pts)
        zds = ray.data.from_arrow(zones)
        # force-salt a few cells to prove replication correctness
        cell = cells.grid_cell(pts["lon"].to_numpy(), pts["lat"].to_numpy(), 5.0)
        hot = {int(c): 4 for c in np.unique(cell)[:10]}
        out = sj.shuffle_pip_join(
            ds, zds, "geometry", ["zone_id"], ["pid"], res=5.0, hot_cells=hot,
        ).to_pandas()
        got = set(zip(out["pid"].astype(int), out["zone_id"].astype(int)))
        assert got == brute_pip_pairs(pts, zones)

    def test_polygon_zones_nonrect(self):
        pts = make_points(1000, seed=7)
        wkbs = [wkb.polygon_to_wkb(derive.zone_polygon_rings(int(nk))) for nk in range(25)]
        zones = pa.table({"zone_id": pa.array(np.arange(25, dtype=np.int64)),
                          "geometry": pa.array(wkbs, type=pa.binary())})
        ds = ray.data.from_arrow(pts)
        out = sj.broadcast_pip_join(ds, zones, "geometry", ["zone_id"], res=5.0).to_pandas()
        got = set(zip(out["pid"].astype(int), out["zone_id"].astype(int)))
        want = brute_pip_pairs(pts, zones)
        assert got == want


class TestKnn:
    def test_vs_brute(self):
        pts = make_points(300, seed=11)
        rng = np.random.default_rng(12)
        ns = 40
        sites = pa.table({
            "site_id": pa.array(np.arange(ns, dtype=np.int64)),
            "slon": pa.array(rng.uniform(-179, 179, ns)),
            "slat": pa.array(rng.uniform(-84, 84, ns)),
        })
        ds = ray.data.from_arrow(pts)
        k = 3
        out = knn_mod.knn_join(ds, sites, k, "site_id", "slon", "slat",
                               res=10.0, concurrency=2).to_pandas()
        # brute force
        px, py = pts["lon"].to_numpy(), pts["lat"].to_numpy()
        sx, sy = sites["slon"].to_numpy(), sites["slat"].to_numpy()
        for i in range(len(pts)):
            d2 = (sx - px[i]) ** 2 + (sy - py[i]) ** 2
            order = np.lexsort((np.arange(ns), d2))[:k]
            sub = out[out["pid"] == i].sort_values("rank")
            assert list(sub["neighbor_id"]) == list(order)
            np.testing.assert_allclose(sub["dist2"].to_numpy(), d2[order])


class TestRasterize:
    def test_counts_vs_pandas(self):
        pts = make_points(5000, seed=21)
        ds = ray.data.from_arrow(pts)
        z = 4
        tiles = rast.rasterize_points_dense(ds, z, merge_alg="count").to_pandas()
        # oracle: pandas pixel counts
        tx, ty, px, py = cells.tile_pixel(pts["lon"].to_numpy(), pts["lat"].to_numpy(), z)
        df = pd.DataFrame({"tx": tx, "ty": ty, "px": px, "py": py})
        want_total = df.groupby(["tx", "ty"]).size()
        got_total = tiles.set_index(["tile_x", "tile_y"])["total"]
        assert len(tiles) == len(want_total)
        for (x, y), n in want_total.items():
            assert got_total.loc[(x, y)] == n
        # verify one dense tile pixel-by-pixel
        x0, y0 = want_total.idxmax()
        arr = rast.decode_tile(tiles.set_index(["tile_x", "tile_y"]).loc[(x0, y0), "data"])
        sub = df[(df.tx == x0) & (df.ty == y0)]
        want_arr = np.zeros((256, 256))
        np.add.at(want_arr, (sub.py.to_numpy(), sub.px.to_numpy()), 1.0)
        np.testing.assert_array_equal(arr, want_arr)

    def test_checksum_reference_semantics(self):
        # independent slow-path implementation of gdalchecksum.cpp
        rng = np.random.default_rng(33)
        arr = rng.integers(-5, 300, (16, 16)).astype(np.int32)
        primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
        want = 0
        for yy in range(16):
            ip = (yy * 16) % 11
            for xx in range(16):
                v = int(arr[yy, xx])
                want += int(np.fmod(v, primes[ip]))
                ip = (ip + 1) % 11
            want &= 0xFFFF
        assert rast.gdal_checksum(arr) == want

    def test_checksum_float_conversion(self):
        arr = np.asarray([[0.4, 0.6], [-1.5, 2.5]])
        # +0.5 then floor: 0.9->0, 1.1->1, -1.0->-1, 3.0->3
        primes7_11_13_17 = [7, 11, 13, 17]
        vals = [0, 1, -1, 3]
        want = sum(int(np.fmod(v, p)) for v, p in zip(vals, primes7_11_13_17)) & 0xFFFF
        assert rast.gdal_checksum(arr) == want

    def test_merge_max(self):
        pts = pa.table({
            "lon": pa.array([10.0, 10.0]), "lat": pa.array([10.0, 10.0]),
            "v": pa.array([3.0, 9.0]),
        })
        tiles = rast.tile_summary(
            rast.rasterize_pixels(ray.data.from_arrow(pts), 2,
                                  value_col="v", merge_alg="max")).to_pandas()
        assert tiles["total"].iloc[0] == 9.0

    def test_sparse_checksum_matches_dense(self):
        pts = make_points(4000, seed=23)
        ds = ray.data.from_arrow(pts)
        sparse = rast.tile_summary(rast.rasterize_pixels(ds, 3, merge_alg="count")).to_pandas()
        dense = rast.rasterize_points_dense(ds, 3, merge_alg="count").to_pandas()
        a = sparse.set_index(["tile_x", "tile_y"]).sort_index()
        b = dense.set_index(["tile_x", "tile_y"]).sort_index()
        np.testing.assert_array_equal(a["checksum"].to_numpy(), b["checksum"].to_numpy())
        np.testing.assert_array_equal(a["total"].to_numpy(), b["total"].to_numpy())
        np.testing.assert_array_equal(a["nonzero"].to_numpy(), b["nonzero"].to_numpy())


class TestOverview:
    def test_pyramid_sums(self):
        pts = make_points(3000, seed=41)
        ds = ray.data.from_arrow(pts)
        base = rast.rasterize_pixels(ds, 4, merge_alg="count")
        levels = tiles_mod.overview_pyramid(base, 4, 2, how="sum")
        t2 = rast.tile_summary(levels[2]).to_pandas()
        # total burn is conserved through sum-reduction
        assert t2["total"].sum() == 3000
        # direct rasterize at z=2 must equal the overview chain per-tile totals
        direct = rast.tile_summary(rast.rasterize_pixels(ds, 2, merge_alg="count")).to_pandas()
        a = t2.set_index(["tile_x", "tile_y"])["total"].sort_index()
        b = direct.set_index(["tile_x", "tile_y"])["total"].sort_index()
        pd.testing.assert_series_equal(a, b, check_names=False)
        # pixel-exactness of the parent pixels: each z3 pixel = sum of its 2x2
        # children at z4 (checked via global pixel coords)
        p4 = levels[4].to_pandas()
        p3 = levels[3].to_pandas()

        def global_pixels(df):
            from lib_gdal_ray.pipelines.rasterize import unpack_pixel

            z, gx, gy = unpack_pixel(df["pix_id"].to_numpy().astype(np.uint64))
            return pd.DataFrame({"gx": gx, "gy": gy, "burn": df["burn"].to_numpy()})

        g4 = global_pixels(p4)
        g4["gx"] //= 2
        g4["gy"] //= 2
        want = g4.groupby(["gx", "gy"])["burn"].sum().sort_index()
        got = global_pixels(p3).groupby(["gx", "gy"])["burn"].sum().sort_index()
        pd.testing.assert_series_equal(got, want)


class TestRelational:
    def test_grouped_agg_vs_duckdb(self, sf_med):
        ds = tables.read_table(sf_med, "lineitem",
                               columns=["l_returnflag", "l_linestatus", "l_quantity",
                                        "l_extendedprice"])
        out = rel.grouped_agg(ds, ["l_returnflag", "l_linestatus"], [
            ("sum", "l_quantity", "sum_qty"),
            ("count", None, "n"),
            ("mean", "l_extendedprice", "avg_price"),
            ("min", "l_quantity", "min_qty"),
            ("max", "l_quantity", "max_qty"),
            ("std_samp", "l_extendedprice", "sd_price"),
        ], round_to=4).to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
        want = duckdb.sql(f"""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) sum_qty,
                   count(*) n,
                   round(avg(l_extendedprice), 4) avg_price,
                   min(l_quantity) min_qty,
                   max(l_quantity) max_qty,
                   round(stddev_samp(l_extendedprice), 4) sd_price
            FROM read_parquet('{sf_med}/lineitem.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2
        """).df()
        pd.testing.assert_frame_equal(out, want, check_dtype=False, atol=1e-3)

    def test_broadcast_join_vs_duckdb(self, sf_med):
        orders = tables.read_table(sf_med, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
        cust = tables.read_table_arrow(sf_med, "customer", columns=["c_custkey", "c_mktsegment"])
        out = rel.broadcast_hash_join(orders, cust, "o_custkey", "c_custkey").to_pandas()
        want = duckdb.sql(f"""
            SELECT count(*) n FROM read_parquet('{sf_med}/orders.parquet') o
            JOIN read_parquet('{sf_med}/customer.parquet') c ON o.o_custkey = c.c_custkey
        """).df()
        assert len(out) == want["n"].iloc[0]
        assert "c_mktsegment" in out.columns

    def test_distinct_and_topk(self, sf_med):
        cust = tables.read_table(sf_med, "customer", columns=["c_mktsegment"])
        d = rel.distinct(cust, "c_mktsegment").to_pandas()
        want = duckdb.sql(f"SELECT DISTINCT c_mktsegment FROM read_parquet('{sf_med}/customer.parquet')").df()
        assert set(d["c_mktsegment"]) == set(want["c_mktsegment"])
        orders = tables.read_table(sf_med, "orders", columns=["o_orderkey", "o_totalprice"])
        top = rel.topk(orders, "o_totalprice", 10).to_pandas()
        wtop = duckdb.sql(f"""SELECT o_orderkey, o_totalprice FROM read_parquet('{sf_med}/orders.parquet')
                              ORDER BY o_totalprice DESC LIMIT 10""").df()
        np.testing.assert_array_equal(np.sort(top["o_orderkey"].to_numpy()),
                                      np.sort(wtop["o_orderkey"].to_numpy()))

    def test_global_agg(self, sf_med):
        li = tables.read_table(sf_med, "lineitem", columns=["l_quantity"])
        out = rel.global_agg(li, [("sum", "l_quantity", "s"), ("count", None, "n"),
                                  ("std_pop", "l_quantity", "sd")], round_to=4).to_pandas()
        want = duckdb.sql(f"""SELECT round(sum(l_quantity),4) s, count(*) n,
                              round(stddev_pop(l_quantity),4) sd
                              FROM read_parquet('{sf_med}/lineitem.parquet')""").df()
        assert out["n"].iloc[0] == want["n"].iloc[0]
        assert abs(out["s"].iloc[0] - want["s"].iloc[0]) < 1e-2
        assert abs(out["sd"].iloc[0] - want["sd"].iloc[0]) < 1e-2


class TestShuffleKnn:
    def test_vs_brute(self):
        pts = make_points(400, seed=31)
        pts = pts.append_column("pid2", pts["pid"])  # unused extra col ok
        rng = np.random.default_rng(32)
        ns = 300
        sites_tbl = pa.table({
            "site_id": pa.array(np.arange(ns, dtype=np.int64)),
            "slon": pa.array(rng.uniform(-179, 179, ns)),
            "slat": pa.array(rng.uniform(-84, 84, ns)),
        })
        from lib_gdal_ray.pipelines.knn import shuffle_knn_join

        out = shuffle_knn_join(
            ray.data.from_arrow(pts), ray.data.from_arrow(sites_tbl), 3,
            "site_id", "slon", "slat", res=20.0, max_ring=16,
            point_id_col="pid").to_pandas()
        px, py = pts["lon"].to_numpy(), pts["lat"].to_numpy()
        sx, sy = sites_tbl["slon"].to_numpy(), sites_tbl["slat"].to_numpy()
        assert set(out["pid"]) == set(range(400))
        for i in range(0, 400, 7):
            d2 = (sx - px[i]) ** 2 + (sy - py[i]) ** 2
            want = np.lexsort((np.arange(ns), d2))[:3]
            sub = out[out["pid"] == i].sort_values("rank")
            assert list(sub["neighbor_id"]) == list(want), f"pid {i}"
            assert sub["exact"].all()


class TestShuffleKnnSalted:
    def test_skewed_cell_salted_exact(self):
        """One cell holds ~50% of sites AND points; salting splits it
        into bounded groups without changing results (vs brute)."""
        rng = np.random.default_rng(33)
        n_hot = 200
        # hot cluster inside one 20-degree cell, plus scattered rest
        plon = np.concatenate([rng.uniform(1, 19, n_hot), rng.uniform(-179, 179, 200)])
        plat = np.concatenate([rng.uniform(1, 19, n_hot), rng.uniform(-84, 84, 200)])
        pts = pa.table({"pid": pa.array(np.arange(len(plon), dtype=np.int64)),
                        "lon": pa.array(plon), "lat": pa.array(plat)})
        slon = np.concatenate([rng.uniform(1, 19, n_hot), rng.uniform(-179, 179, 200)])
        slat = np.concatenate([rng.uniform(1, 19, n_hot), rng.uniform(-84, 84, 200)])
        sites_tbl = pa.table({
            "site_id": pa.array(np.arange(len(slon), dtype=np.int64)),
            "slon": pa.array(slon), "slat": pa.array(slat)})
        from lib_gdal_ray.pipelines.knn import shuffle_knn_join

        out = shuffle_knn_join(
            ray.data.from_arrow(pts), ray.data.from_arrow(sites_tbl), 3,
            "site_id", "slon", "slat", res=20.0, max_ring=16,
            point_id_col="pid", auto_salt=True, hot_threshold=50,
        ).to_pandas()
        ns = len(slon)
        for i in range(0, len(plon), 13):
            d2 = (slon - plon[i]) ** 2 + (slat - plat[i]) ** 2
            want = np.lexsort((np.arange(ns), d2))[:3]
            sub = out[out["pid"] == i].sort_values("rank")
            assert list(sub["neighbor_id"]) == list(want), f"pid {i}"
            assert sub["exact"].all()


class TestAutoSalt:
    def test_auto_salt_correct(self):
        pts = make_points(600, seed=41)
        zones, _ = make_zones()
        out = sj.shuffle_pip_join(
            ray.data.from_arrow(pts), ray.data.from_arrow(zones),
            "geometry", ["zone_id"], ["pid"], res=5.0,
            auto_salt=True, hot_threshold=5,  # force many salted cells
        ).to_pandas()
        got = set(zip(out["pid"].astype(int), out["zone_id"].astype(int)))
        assert got == brute_pip_pairs(pts, zones)


class TestHashJoin:
    def test_big_big_inner_vs_duckdb(self, sf_med):
        li = tables.read_table(sf_med, "lineitem", columns=["l_orderkey", "l_quantity"])
        orders = tables.read_table(sf_med, "orders", columns=["o_orderkey", "o_totalprice"])
        out = rel.hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                            how="inner", num_partitions=16)
        got = out.count()
        want = duckdb.sql(f"""
            SELECT count(*) n FROM read_parquet('{sf_med}/lineitem.parquet') l
            JOIN read_parquet('{sf_med}/orders.parquet') o ON l.l_orderkey = o.o_orderkey
        """).df()["n"].iloc[0]
        assert got == want

    def test_columns_present(self, sf_med):
        li = tables.read_table(sf_med, "lineitem", columns=["l_orderkey", "l_quantity"]).limit(100)
        orders = tables.read_table(sf_med, "orders", columns=["o_orderkey", "o_totalprice"])
        out = rel.hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                            num_partitions=4).to_pandas()
        assert {"l_orderkey", "l_quantity", "o_totalprice"} <= set(out.columns)


class TestBucketLookupJoin:
    def test_left_and_inner_int_keys(self):
        left = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 2], type=pa.int64()),
            "v": pa.array(["a", "b", "c", "d"]),
        }))
        right = ray.data.from_arrow(pa.table({
            "k": pa.array([2, 3], type=pa.int64()),
            "w": pa.array([20.0, 30.0]),
        }))
        lj = rel.bucket_lookup_join(left, right, on="k", how="left"
                                    ).to_pandas().sort_values(["k", "v"])
        assert list(lj["w"].fillna(-1)) == [-1.0, 20.0, 20.0, 30.0]
        ij = rel.bucket_lookup_join(left, right, on="k", how="inner"
                                    ).to_pandas()
        assert sorted(ij["k"]) == [2, 2, 3]

    def test_string_keys_and_sort_derived_right(self):
        # right side derived from groupby().map_groups (Sort-derived
        # empty blocks — the exact shape that breaks native Dataset.join)
        left = ray.data.from_arrow(pa.table({
            "k": pa.array(["x", "y", "z"]),
            "n": pa.array([1, 2, 3], type=pa.int64()),
        }))
        src = ray.data.from_arrow(pa.table({
            "g": pa.array([0, 0, 1], type=pa.int64()),
            "k2": pa.array(["x", "y", "q"]),
        }))

        def grp(t: pa.Table) -> pa.Table:
            return pa.table({"k2": t["k2"],
                             "m": pa.array([7.0] * len(t))})

        right = src.groupby("g").map_groups(grp, batch_format="pyarrow")
        out = rel.bucket_lookup_join(left, right, on="k", right_on="k2",
                                     how="left").to_pandas().sort_values("k")
        assert list(out["m"].fillna(-1)) == [7.0, 7.0, -1.0]


class TestQuantile:
    def test_grouped_quantile_vs_numpy(self, sf_med):
        from ray.data.aggregate import Quantile

        li = tables.read_table(sf_med, "lineitem", columns=["l_returnflag", "l_quantity"])
        out = (li.groupby("l_returnflag")
               .aggregate(Quantile("l_quantity", q=0.5, alias_name="median_qty"))
               .to_pandas().set_index("l_returnflag"))
        want = duckdb.sql(f"""
            SELECT l_returnflag, quantile_cont(l_quantity, 0.5) m
            FROM read_parquet('{sf_med}/lineitem.parquet') GROUP BY 1""").df().set_index("l_returnflag")
        for k in want.index:
            np.testing.assert_allclose(out.loc[k, "median_qty"], want.loc[k, "m"], rtol=1e-9)


class TestTileGoldens:
    """Autotest-style frozen expectations (the checksum-golden pattern of
    test_gdalalg_raster_tile.py): exact tile assignments + GDAL checksums
    for a fixed derived input, pinned as literals."""

    GOLDEN = [(0, 15, 6, 6.0), (1, 5, 6, 6.0), (2, 5, 5, 5.0), (3, 7, 5, 5.0),
              (4, 10, 9, 9.0), (5, 15, 4, 4.0), (6, 5, 4, 4.0), (6, 15, 3, 3.0),
              (7, 5, 3, 3.0), (8, 7, 5, 5.0), (9, 10, 2, 2.0), (10, 15, 2, 2.0),
              (11, 15, 1, 1.0), (12, 5, 1, 1.0), (13, 7, 1, 1.0), (14, 7, 0, 0.0),
              (15, 9, 6, 6.0), (15, 10, 0, 0.0)]

    def test_frozen_tile_assignments_and_checksums(self):
        ids = np.arange(1, 21, dtype=np.int64) * 12345
        lon, lat = derive.event_lonlat(ids)
        pts = ray.data.from_arrow(pa.table({
            "lon": pa.array(lon), "lat": pa.array(lat),
            "v": pa.array((ids % 7).astype(np.float64))})).repartition(3)
        t = rast.tile_summary(rast.rasterize_pixels(pts, 4, value_col="v",
                                                    merge_alg="add")).to_pandas()
        got = sorted((int(r.tile_x), int(r.tile_y), int(r.checksum), float(r.total))
                     for r in t.itertuples())
        assert got == self.GOLDEN


class TestCubicsplineOverview:
    def test_constant_raster_interior_preserved(self, ray_session):
        """B-spline weights form a partition of unity: a constant
        dense raster must reduce to the same constant everywhere
        (renormalization handles the dropped negative-edge taps)."""
        import pyarrow as pa

        from lib_gdal_ray.pipelines import tiles as tiles_mod
        from lib_gdal_ray.pipelines.rasterize import pack_pixel

        n = 16
        gy, gx = np.mgrid[0:n, 0:n]
        t = pa.table({
            "pix_id": pa.array(pack_pixel(5, gx.ravel().astype(np.int64),
                                          gy.ravel().astype(np.int64))
                               .astype(np.int64)),
            "burn": pa.array(np.full(n * n, 7.0)),
        })
        out = tiles_mod.overview_pixels(
            ray.data.from_arrow(t), how="cubicspline").to_pandas()
        np.testing.assert_allclose(out["burn"], 7.0, rtol=1e-12)

    def test_weights_sum_to_384_per_axis(self):
        # the exact dyadic-rational identity the implementation relies on
        assert 1 + 121 + 235 + 27 == 384

    def test_single_pixel_spreads_bspline(self, ray_session):
        import pyarrow as pa

        from lib_gdal_ray.pipelines import tiles as tiles_mod
        from lib_gdal_ray.pipelines.rasterize import pack_pixel, unpack_pixel

        t = pa.table({"pix_id": pa.array(pack_pixel(
            5, np.array([10]), np.array([11])).astype(np.int64)),
            "burn": pa.array([384.0])})
        out = tiles_mod.overview_pixels(
            ray.data.from_arrow(t), how="cubicspline").to_pandas()
        # even x=10 -> parents {3,4,5,6}; odd y=11 -> parents {4,5,6,7}
        _z, px, py = unpack_pixel(out["pix_id"].to_numpy())
        assert set(px) == {3, 4, 5, 6} and set(py) == {4, 5, 6, 7}
        # weighted mean of a single source is the source value
        np.testing.assert_allclose(out["burn"], 384.0)


class TestOverviewToLevel:
    @pytest.mark.parametrize("how", ["sum", "max", "mean4"])
    def test_equals_chained(self, how):
        import numpy as np
        import pyarrow as pa
        import ray.data
        from lib_gdal_ray.pipelines import tiles as tiles_mod
        from lib_gdal_ray.pipelines.rasterize import pack_pixel

        rng = np.random.default_rng(4)
        n = 3000
        gx = rng.integers(0, 1 << 10, n)
        gy = rng.integers(0, 1 << 10, n)
        v = rng.uniform(1, 9, n)
        t = pa.table({"pix_id": pa.array(pack_pixel(8, gx, gy)),
                      "burn": pa.array(v)})
        # dedupe pixel keys (rasterize output has unique pixels)
        t = t.group_by(["pix_id"]).aggregate([("burn", "sum")]) \
             .rename_columns(["pix_id", "burn"])
        base1 = ray.data.from_arrow(t)
        base2 = ray.data.from_arrow(t)
        chained = tiles_mod.overview_pyramid(base1, 8, 5, how=how)[5].to_pandas()
        direct = tiles_mod.overview_to_level(base2, 8, 5, how=how).to_pandas()
        a = chained.sort_values("pix_id").reset_index(drop=True)
        b = direct.sort_values("pix_id").reset_index(drop=True)
        assert len(a) == len(b)
        np.testing.assert_array_equal(a["pix_id"].to_numpy(), b["pix_id"].to_numpy())
        np.testing.assert_allclose(a["burn"].to_numpy(), b["burn"].to_numpy(),
                                   rtol=1e-12)

    def test_rejects_nondistributive(self):
        from lib_gdal_ray.pipelines import tiles as tiles_mod

        with pytest.raises(ValueError):
            tiles_mod.overview_to_level(None, 8, 5, how="gauss")
