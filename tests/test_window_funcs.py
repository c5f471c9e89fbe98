"""Window functions, grouped top-k, Bloom semi/anti join, interval
join — brute-force pandas oracles plus skew/edge cases."""

import numpy as np
import pandas as pd
import ray.data as rd

from lib_gdal_ray.pipelines.joins import (bloom_semi_anti_join, build_bloom,
                                          interval_join)
from lib_gdal_ray.pipelines.windows import grouped_topk, partitioned_window


def _df(n=4000, n_keys=61, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, n_keys, n),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.normal(50, 20, n).round(2),
        "ts": (pd.to_datetime("2024-01-01")
               + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s")),
    })


class TestPartitionedWindow:
    def test_row_number_cumsum_lag(self):
        df = _df()
        out = partitioned_window(
            rd.from_pandas(df).repartition(5), "k", ["ts", "id"],
            [{"name": "rn", "kind": "row_number"},
             {"name": "cum_c", "kind": "cum_sum", "col": "v", "scale": 100},
             {"name": "gap_us", "kind": "lag_diff", "col": "ts"}],
        ).to_pandas().sort_values("id").reset_index(drop=True)
        exp = df.sort_values(["k", "ts", "id"]).copy()
        exp["rn"] = exp.groupby("k").cumcount() + 1
        q = np.floor(exp.v * 100 + 0.5).astype(np.int64)
        exp["cum_c"] = q.groupby(exp.k.values).cumsum()
        exp["gap_us"] = (exp.groupby("k")["ts"].diff()
                         .dt.total_seconds() * 1e6)
        exp = exp.sort_values("id").reset_index(drop=True)
        assert (out.rn.values == exp.rn.values).all()
        assert (out.cum_c.values == exp.cum_c.values).all()
        g1 = out.gap_us.astype("float64")
        assert (g1.isna() == exp.gap_us.isna()).all()
        assert np.allclose(g1.dropna(), exp.gap_us.dropna())

    def test_lag_fill_sentinel(self):
        df = _df(500, 7)
        out = partitioned_window(
            rd.from_pandas(df), "k", ["ts", "id"],
            [{"name": "gap", "kind": "lag_diff", "col": "ts", "fill": -1}],
        ).to_pandas()
        assert out.gap.dtype == np.int64
        assert (out.gap == -1).sum() == df.k.nunique()

    def test_string_partition_keys(self):
        df = _df(800, 9)
        df["k"] = "s" + df.k.astype(str)
        out = partitioned_window(
            rd.from_pandas(df).repartition(3), "k", ["id"],
            [{"name": "rn", "kind": "row_number"}],
        ).to_pandas().sort_values("id").reset_index(drop=True)
        exp = df.sort_values(["k", "id"]).copy()
        exp["rn"] = exp.groupby("k").cumcount() + 1
        exp = exp.sort_values("id").reset_index(drop=True)
        assert (out.rn.values == exp.rn.values).all()

    def test_single_hot_key(self):
        # one partition holding 100% of rows: bounded by its bucket,
        # kernel still one lexsort pass
        df = _df(3000, 1)
        out = partitioned_window(
            rd.from_pandas(df).repartition(6), "k", ["id"],
            [{"name": "rn", "kind": "row_number"}], keep=["id"],
        ).to_pandas().sort_values("id")
        assert (out.rn.values == np.arange(1, 3001)).all()


class TestGroupedTopk:
    def test_vs_pandas(self):
        df = _df()
        out = grouped_topk(rd.from_pandas(df).repartition(7), "k", "v", 3,
                           descending=True, tiebreak="id",
                           keep=["k", "id", "v"]).to_pandas()
        exp = (df.sort_values(["v", "id"], ascending=[False, True])
               .groupby("k").head(3))
        assert len(out) == len(exp)
        assert set(out.id) == set(exp.id)
        assert out.rn.max() <= 3
        # rank 1 rows are each key's max
        r1 = out[out.rn == 1].set_index("k").v.sort_index()
        assert (r1.values == df.groupby("k").v.max().sort_index().values).all()

    def test_ascending_and_k_exceeds_group(self):
        df = _df(50, 40)  # most keys have 1-2 rows < k
        out = grouped_topk(rd.from_pandas(df), "k", "v", 5,
                           descending=False, tiebreak="id").to_pandas()
        assert len(out) == len(df)  # nothing pruned
        exp = df.sort_values(["k", "v", "id"]).copy()
        exp["rn"] = exp.groupby("k").cumcount() + 1
        got = out.sort_values(["k", "v", "id"]).rn.values
        assert (got == exp.rn.values).all()


class TestBloomSemiAnti:
    def test_exactness_with_small_bloom(self):
        # tiny bitmap => high false-positive rate => the exact-verify
        # stage is doing real work
        df = _df(2000, 301)
        rng = np.random.default_rng(11)
        rkeys = rng.choice(np.arange(0, 301, 2), 700)
        left = rd.from_pandas(df).repartition(4)
        right = rd.from_pandas(pd.DataFrame({"rk": rkeys})).repartition(3)
        rset = set(rkeys.tolist())
        semi = bloom_semi_anti_join(left, right, "k", "rk", anti=False,
                                    log2_bits=9).to_pandas()
        anti = bloom_semi_anti_join(left, right, "k", "rk", anti=True,
                                    log2_bits=9).to_pandas()
        assert set(semi.id) == set(df[df.k.isin(rset)].id)
        assert set(anti.id) == set(df[~df.k.isin(rset)].id)
        assert len(semi) + len(anti) == len(df)
        assert sorted(semi.columns) == sorted(df.columns)

    def test_bloom_no_false_negatives(self):
        df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
        bm = build_bloom(rd.from_pandas(df), "k", log2_bits=14)
        from lib_gdal_ray.pipelines.joins import (_bloom_positions,
                                                  _key_hash64)
        pos = _bloom_positions(_key_hash64(df.k.values), 4, 14)
        bits = (bm[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
        assert bits.all()

    def test_string_keys(self):
        left = rd.from_pandas(pd.DataFrame(
            {"name": [f"u{i % 37}" for i in range(500)],
             "id": np.arange(500)}))
        right = rd.from_pandas(pd.DataFrame(
            {"name": [f"u{i}" for i in range(0, 37, 3)]}))
        semi = bloom_semi_anti_join(left, right, "name").to_pandas()
        keep = {f"u{i}" for i in range(0, 37, 3)}
        assert set(semi.name.unique()) == keep & set(
            f"u{i % 37}" for i in range(500))

    def test_verify_buckets_size_derived(self, monkeypatch):
        # The exact-verify stage must size its bucket count from the
        # inputs (VERDICT r4 item 1): a high-match-rate semi join sends
        # ~the whole left side through verify, so a fixed 64 puts
        # ~N/64 rows per task. Assert _auto_buckets is consulted and
        # that a larger derived count leaves the answer unchanged.
        from lib_gdal_ray.pipelines import windows as _w

        calls = []
        real = _w._auto_buckets

        def spy(*a, **kw):
            kw.setdefault("target_rows", 40)  # force many buckets
            n = real(*a, **kw)
            calls.append(n)
            return n

        monkeypatch.setattr(_w, "_auto_buckets", spy)
        # 64x skew: 90% of left rows share one key, and that key matches
        df = _df(4000, 64)
        df.loc[df.index[: 3600], "k"] = 0
        left = rd.from_pandas(df).repartition(4)
        right = rd.from_pandas(
            pd.DataFrame({"rk": np.arange(0, 64, 2)})).repartition(2)
        semi = bloom_semi_anti_join(left, right, "k", "rk").to_pandas()
        assert calls and calls[-1] > 64  # size-derived, not literal 64
        rset = set(range(0, 64, 2))
        assert set(semi.id) == set(df[df.k.isin(rset)].id)


class TestIntervalJoin:
    def _fixtures(self):
        df = _df(1500, 23, seed=9)
        iv = df.head(200).rename(columns={"ts": "t0"}).copy()
        iv["t1"] = iv.t0 + pd.to_timedelta(3, unit="h")
        iv["iv_id"] = np.arange(len(iv), dtype=np.int64)
        return df, iv

    def _expected(self, df, iv, on_key):
        if on_key:
            m = iv.merge(df, on="k", suffixes=("_i", ""))
        else:
            m = iv.assign(j=1).merge(df.assign(j=1), on="j",
                                     suffixes=("_i", ""))
        m = m[(m.ts >= m.t0) & (m.ts < m.t1)]
        return set(zip(m.iv_id, m.id))

    def test_key_path(self):
        df, iv = self._fixtures()
        out = interval_join(
            rd.from_pandas(iv[["k", "t0", "t1", "iv_id"]]).repartition(3),
            rd.from_pandas(df).repartition(4),
            "t0", "t1", "ts", key_col="k",
            interval_cols=["iv_id"], point_cols=["id"]).to_pandas()
        assert set(zip(out.iv_id.astype(int), out.id.astype(int))) == \
            self._expected(df, iv, True)

    def test_binned_path_no_key(self):
        df, iv = self._fixtures()
        out = interval_join(
            rd.from_pandas(iv[["t0", "t1", "iv_id"]]).repartition(3),
            rd.from_pandas(df[["ts", "id"]]).repartition(4),
            "t0", "t1", "ts", key_col=None, bin_s=1800,
            interval_cols=["iv_id"], point_cols=["id"]).to_pandas()
        assert set(zip(out.iv_id.astype(int), out.id.astype(int))) == \
            self._expected(df, iv, False)

    def test_closed_variants(self):
        iv = pd.DataFrame({"t0": [10], "t1": [20], "iv_id": [0]})
        pt = pd.DataFrame({"ts": [9, 10, 15, 20, 21],
                           "id": np.arange(5, dtype=np.int64)})
        for closed, exp in [("left", {1, 2}), ("open", {2}),
                            ("both", {1, 2, 3})]:
            out = interval_join(rd.from_pandas(iv), rd.from_pandas(pt),
                                "t0", "t1", "ts", key_col=None, bin_s=1,
                                closed=closed, interval_cols=["iv_id"],
                                point_cols=["id"]).to_pandas()
            assert set(out.id.astype(int)) == exp, closed


class TestAutoBuckets:
    def test_scales_with_metadata_count(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lib_gdal_ray.pipelines.windows import _auto_buckets

        # small parquet read: floor
        p = str(tmp_path / "small.parquet")
        pq.write_table(pa.table({"x": np.arange(100)}), p)
        small = rd.read_parquet(p)
        assert _auto_buckets(small) == 256
        # metadata says 10M rows -> buckets grow ~rows/target, capped
        big = rd.read_parquet(p)

        class FakeMeta:
            def _meta_count(self):
                return 10_000_000

        assert _auto_buckets(FakeMeta(), floor=1) == 5  # 10M / 2M
        assert _auto_buckets(FakeMeta(), floor=1, target_rows=1000) == 10_000
        assert _auto_buckets(FakeMeta(), floor=1, target_rows=1,
                             cap=4096) == 4096
        # unknowable plan (lambda-transformed): falls back to floor,
        # WITHOUT triggering execution
        lazy = big.map_batches(lambda t: t)
        assert _auto_buckets(lazy, floor=64) == 64

    def test_results_identical_across_bucket_counts(self):
        # 64x-skewed keys: one hot key holds most rows; the output must
        # be bucket-count-invariant (bucketing is pure partitioning)
        rng = np.random.default_rng(11)
        n = 6000
        k = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 64, n))
        df = pd.DataFrame({"k": k, "id": np.arange(n, dtype=np.int64),
                           "v": rng.normal(0, 1, n).round(3)})
        outs = []
        for nb in (7, 256, None):
            o = grouped_topk(rd.from_pandas(df).repartition(4), "k", "v", 5,
                             tiebreak="id", n_buckets=nb).to_pandas()
            outs.append(o.sort_values(["k", "rn"]).reset_index(drop=True)
                        [["k", "id", "v", "rn"]])
        assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
