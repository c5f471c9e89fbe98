"""Tests for training-data ops (dedup, text, ANN), zonal stats, synth
docs, and the resume manifest."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lib_gdal_ray.pipelines import ann as ann_mod
from lib_gdal_ray.pipelines import dedup as dd
from lib_gdal_ray.pipelines import text as text_mod
from lib_gdal_ray.pipelines import zonal as zonal_mod
from lib_gdal_ray.sources import synth, tables
from lib_gdal_ray.state.manifest import Manifest, run_partitioned


class TestExactDedup:
    def test_min_id_winner(self):
        t = pa.table({
            "k": pa.array(["a", "b", "a", "c", "b", "a"]),
            "id": pa.array([5, 2, 1, 9, 8, 3], type=pa.int64()),
        })
        out = dd.exact_dedup(ray.data.from_arrow(t), "k", "id").to_pandas()
        got = dict(zip(out["k"], out["id"]))
        assert got == {"a": 1, "b": 2, "c": 9}
        counts = dict(zip(out["k"], out["dup_count"]))
        assert counts == {"a": 3, "b": 2, "c": 1}


class TestMinHash:
    def test_near_dups_found(self):
        base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
        docs = []
        for i in range(20):
            docs.append(base + f" unique tail {i}")
        # two exact near-dup clusters
        docs.append(base + " unique tail 0!")     # ~dup of doc 0
        docs.append("completely different text about rasters and tiles " * 6)
        t = pa.table({"id": pa.array(np.arange(len(docs), dtype=np.int64)),
                      "text": pa.array(docs)})
        pairs = dd.minhash_lsh_pairs(ray.data.from_arrow(t), "text", "id",
                                     num_perm=64, bands=16, threshold=0.5,
                                     concurrency=2).to_pandas()
        got = set(zip(pairs["id_a"], pairs["id_b"]))
        assert (0, 20) in got  # the engineered near-dup
        # verify every reported pair really has high exact jaccard
        for a, b in got:
            assert dd.jaccard_shingles(docs[a], docs[b]) > 0.35

    def test_near_dup_clusters_transitive(self):
        # chain a~b, b~c with NO a~c pair: one cluster rooted at min id
        pairs = ray.data.from_arrow(pa.table({
            "id_a": pa.array([7, 3, 10], type=pa.int64()),
            "id_b": pa.array([3, 9, 12], type=pa.int64()),
        }))
        cl = dd.near_dup_clusters(pairs).to_pandas()
        got = dict(zip(cl["doc_id"], cl["cluster_id"]))
        assert got == {3: 3, 7: 3, 9: 3, 10: 10, 12: 10}

    def test_near_dup_clusters_labelprop_path(self):
        # force the distributed min-label-propagation path on the same
        # chain graph; must match the task union-find output exactly
        pairs = ray.data.from_arrow(pa.table({
            "id_a": pa.array([7, 3, 10], type=pa.int64()),
            "id_b": pa.array([3, 9, 12], type=pa.int64()),
        }))
        cl = dd.near_dup_clusters(pairs, cc_mode="labelprop").to_pandas()
        got = dict(zip(cl["doc_id"], cl["cluster_id"]))
        assert got == {3: 3, 7: 3, 9: 3, 10: 10, 12: 10}

    def test_near_dup_keep_canonicals(self):
        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 3, 7, 9, 10, 12, 50], type=pa.int64()),
        }))
        pairs = ray.data.from_arrow(pa.table({
            "id_a": pa.array([7, 3, 10], type=pa.int64()),
            "id_b": pa.array([3, 9, 12], type=pa.int64()),
        }))
        kept = sorted(dd.near_dup_keep(docs, pairs, "doc_id")
                      .to_pandas()["doc_id"])
        # cluster {3,7,9} keeps 3; cluster {10,12} keeps 10; 1, 50 unpaired
        assert kept == [1, 3, 10, 50]

    def test_signature_estimates_jaccard(self):
        a = "the quick brown fox jumps over the lazy dog " * 8
        b = a.replace("lazy", "sleepy")
        am, bm = dd._minhash_matrix(128)
        sa = dd.minhash_signature(a, 128, 5, am, bm)
        sb = dd.minhash_signature(b, 128, 5, am, bm)
        est = (sa == sb).mean()
        true = dd.jaccard_shingles(a, b, 5)
        assert abs(est - true) < 0.15


class TestSimHash:
    def test_similar_docs_close(self):
        t = pa.table({"text": pa.array([
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy cat again and again",
            "rasterize polygon tiles with mercator projection kernels",
        ])})
        out = dd.simhash64(ray.data.from_arrow(t), "text", concurrency=1).to_pandas()
        h = out["simhash"].to_numpy(dtype=np.uint64)
        d01 = dd.hamming64(h[0:1], h[1:2])[0]
        d02 = dd.hamming64(h[0:1], h[2:3])[0]
        assert d01 < d02
        assert d01 <= 12

    def test_deterministic(self):
        t = pa.table({"text": pa.array(["hello world foo bar"])})
        a = dd.simhash64(ray.data.from_arrow(t), "text", concurrency=1).to_pandas()["simhash"][0]
        b = dd.simhash64(ray.data.from_arrow(t), "text", concurrency=1).to_pandas()["simhash"][0]
        assert a == b


class TestText:
    def test_token_stats_match_split_semantics(self, sf_small):
        ds = tables.read_table(sf_small, "documents", columns=["doc_id", "text", "n_chars"])
        out = text_mod.token_stats(ds).to_pandas()
        for _, row in out.head(50).iterrows():
            assert row["n_tokens"] == len(row["text"].split(" "))
            assert row["n_chars_calc"] == len(row["text"])

    def test_pack_sequences_brute_force(self):
        from lib_gdal_ray.pipelines.packing import KNUTH, pack_sequences

        texts = ["a b c", "one", "x " * 9 + "x", "t1 t2 t3 t4", "q"]
        ids = [3, 11, 7, 20, 5]
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts)})
        out = (pack_sequences(ray.data.from_arrow(t), seq_len=4, n_shards=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # brute-force oracle: per shard, id order, chop at 4 tokens
        rows = {}
        docs = sorted(zip(ids, texts))
        fills = {}
        for did, txt in docs:
            shard = ((did * KNUTH) % (1 << 32)) % 2
            n = len(txt.split(" "))
            start = fills.get(shard, 0)
            fills[shard] = start + n
            rows[did] = (shard, n, start, start // 4, (start + n - 1) // 4)
        for _, r in out.iterrows():
            shard, n, start, first, last = rows[r["doc_id"]]
            assert (r["shard"], r["n_tokens"], r["start_off"]) == (shard, n, start)
            assert (r["first_seq"], r["last_seq"]) == (first, last)
            assert r["n_pieces"] == last - first + 1

    def test_pack_sequences_precomputed_tokens(self):
        from lib_gdal_ray.pipelines.packing import pack_sequences

        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "n_tok": pa.array([5, 5, 5], pa.int64())})
        out = (pack_sequences(ray.data.from_arrow(t), seq_len=10,
                              tokens_col="n_tok", n_shards=1)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out["start_off"]) == [0, 5, 10]
        assert list(out["first_seq"]) == [0, 0, 1]
        assert list(out["last_seq"]) == [0, 0, 1]
        # doc 2 straddles seqs 0 and 1? no: tokens 5..9 stay in seq 0
        assert list(out["n_pieces"]) == [1, 1, 1]

    def test_asof_join_backward_and_forward(self):
        from lib_gdal_ray.pipelines.windows import asof_join

        left = pa.table({"k": pa.array([1, 1, 2, 3], pa.int64()),
                         "ts": pa.array([10, 20, 15, 5], pa.int64()),
                         "lv": pa.array(["a", "b", "c", "d"])})
        right = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                          "ts": pa.array([8, 18, 15], pa.int64()),
                          "rv": pa.array([100.0, 200.0, 300.0])})
        out = (asof_join(ray.data.from_arrow(left),
                         ray.data.from_arrow(right), "k", "ts")
               .to_pandas().sort_values("ts").set_index("lv"))
        # backward inclusive: a->8, b->18, c->15 (exact), d unmatched
        assert out.loc["a", "rv"] == 100.0 and out.loc["a", "ts_r"] == 8
        assert out.loc["b", "rv"] == 200.0
        assert out.loc["c", "rv"] == 300.0
        assert pd.isna(out.loc["d", "rv"])
        fwd = (asof_join(ray.data.from_arrow(left),
                         ray.data.from_arrow(right), "k", "ts",
                         direction="forward")
               .to_pandas().set_index("lv"))
        # forward: a(10)->18, b(20) unmatched, c(15)->15, d unmatched
        assert fwd.loc["a", "rv"] == 200.0
        assert pd.isna(fwd.loc["b", "rv"])
        assert fwd.loc["c", "rv"] == 300.0

    def test_asof_join_string_keys(self):
        from lib_gdal_ray.pipelines.windows import asof_join

        left = pa.table({"k": pa.array(["x", "y"]),
                         "ts": pa.array([5, 5], pa.int64())})
        right = pa.table({"k": pa.array(["x", "x", "y"]),
                          "ts": pa.array([1, 4, 9], pa.int64()),
                          "rv": pa.array([1.0, 2.0, 3.0])})
        out = (asof_join(ray.data.from_arrow(left),
                         ray.data.from_arrow(right), "k", "ts")
               .to_pandas().set_index("k"))
        assert out.loc["x", "rv"] == 2.0
        assert pd.isna(out.loc["y", "rv"])

    def test_token_budget_mix(self):
        from lib_gdal_ray.pipelines.sampling import token_budget_mix

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "source": pa.array(["a", "a", "a", "b", "b", "c"]),
            "text": pa.array(["x x x", "y y", "z z z z", "p", "q q q",
                              "r r"]),
        })
        out = (token_budget_mix(ray.data.from_arrow(t),
                                {"a": 0.5, "b": 0.5}, 10)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # caps: a=5, b=5. a: docs 1(3)+2(2)=5 kept, doc3(4) crosses ->
        # dropped. b: 4(1)+5(3)=4 kept. c: no weight -> dropped.
        assert list(out["doc_id"]) == [1, 2, 4, 5]
        assert list(out["cum_tokens"]) == [3, 5, 1, 4]

    def test_quality_and_langid(self):
        t = pa.table({"text": pa.array([
            "the cat and the dog sat in the garden of the house",
            "der hund und die katze ist nicht in das haus",
            "12345 67890 !!!",
        ])})
        q = text_mod.quality_score(ray.data.from_arrow(t), concurrency=1).to_pandas()
        assert q["quality_score"].iloc[0] > q["quality_score"].iloc[2]
        l = text_mod.lang_id(ray.data.from_arrow(t), concurrency=1).to_pandas()
        assert l["lang_pred"].iloc[0] == "en"
        assert l["lang_pred"].iloc[1] == "de"
        assert l["lang_pred"].iloc[2] == "und"

    def test_fingerprint_deterministic_and_sensitive(self):
        t = pa.table({"text": pa.array(["abcdefghijklmnopqrstuvwxyz" * 3,
                                        "abcdefghijklmnopqrstuvwxyz" * 3,
                                        "zyxwvutsrqponmlkjihgfedcba" * 3])})
        out = text_mod.fingerprint(ray.data.from_arrow(t), "text").to_pandas()
        assert out["fingerprint"].iloc[0] == out["fingerprint"].iloc[1]
        assert out["fingerprint"].iloc[0] != out["fingerprint"].iloc[2]


class TestAnn:
    def _data(self, n=500, d=16, seed=5):
        rng = np.random.default_rng(seed)
        mat = rng.standard_normal((n, d)).astype(np.float32)
        t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                      "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32()))})
        return t, mat

    def test_brute_topk_exact(self):
        t, mat = self._data()
        qmat = mat[:5].astype(np.float64)
        out = ann_mod.brute_topk(ray.data.from_arrow(t), np.arange(5), qmat, 10,
                                 concurrency=2).to_pandas()
        m = mat.astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        sims = mn @ qn.T
        for q in range(5):
            want = np.lexsort((np.arange(len(m)), -sims[:, q]))[:10]
            sub = out[out["query_id"] == q].sort_values("rank")
            np.testing.assert_array_equal(sub["vec_id"].to_numpy(), want)

    def test_lsh_near_dup_recall(self):
        t, mat = self._data(300, 16, seed=9)
        # plant 20 near-dups
        planted = mat[:20] + np.float32(0.01) * np.random.default_rng(1).standard_normal((20, 16)).astype(np.float32)
        full = np.vstack([mat, planted])
        ids = np.arange(len(full), dtype=np.int64)
        t = pa.table({"vec_id": pa.array(ids),
                      "embedding": pa.array(full.tolist(), type=pa.list_(pa.float32()))})
        pairs = ann_mod.embedding_near_dup_pairs(
            ray.data.from_arrow(t), 16, 0.99, nbits=6).to_pandas()
        got = set(zip(pairs["id_a"], pairs["id_b"]))
        planted_pairs = {(i, 300 + i) for i in range(20)}
        recall = len(got & planted_pairs) / 20
        assert recall >= 0.5  # bucketed ANN: partial recall by design
        # precision: every returned pair is truly similar
        fn = full / np.linalg.norm(full, axis=1, keepdims=True)
        for a, b in got:
            assert fn[a] @ fn[b] >= 0.99 - 1e-9


class TestZonal:
    def test_vs_duckdb_range_join(self, sf_med):
        import duckdb

        from lib_gdal_ray.functions import derive
        from lib_gdal_ray.geom import wkb as wkb_mod

        ev = tables.read_table(sf_med, "events", columns=["event_id", "value"])

        def add_geo(batch: pa.Table) -> pa.Table:
            lon, lat = derive.event_lonlat(batch["event_id"].to_numpy(zero_copy_only=False))
            return batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))

        ev = ev.map_batches(add_geo, batch_format="pyarrow")
        nk = np.arange(25, dtype=np.int64)
        xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
        zones = pa.table({
            "zone_id": pa.array(nk),
            "geometry": pa.array([wkb_mod.box_to_wkb(float(a), float(b), float(c), float(d))
                                  for a, b, c, d in zip(xmin, ymin, xmax, ymax)], type=pa.binary()),
        })
        out = zonal_mod.zonal_stats(ev, zones, "geometry", "zone_id", "value").to_pandas()
        out = out.sort_values("zone_id").reset_index(drop=True)
        want = duckdb.sql(f"""
            WITH pts AS (SELECT event_id, value,
                   {derive.SQL_EVENT_LON} lon, {derive.SQL_EVENT_LAT} lat
                   FROM read_parquet('{sf_med}/events.parquet')),
            zones AS (SELECT n_nationkey zone_id,
                   {derive.SQL_ZONE_XMIN} xmin, {derive.SQL_ZONE_XMAX} xmax,
                   {derive.SQL_ZONE_YMIN} ymin, {derive.SQL_ZONE_YMAX} ymax
                   FROM read_parquet('{sf_med}/nation.parquet'))
            SELECT zone_id, count(*) n, round(sum(value),4) sum_val,
                   min(value) min_val, max(value) max_val, round(avg(value),4) avg_val
            FROM pts JOIN zones ON lon >= xmin AND lon <= xmax AND lat >= ymin AND lat <= ymax
            GROUP BY zone_id ORDER BY zone_id
        """).df()
        pd.testing.assert_frame_equal(out, want, check_dtype=False, atol=1e-3)


class TestSynth:
    def test_deterministic_and_spans_preserved(self):
        d1 = synth.interleaved_docs(200).to_pandas().sort_values("doc_id").reset_index(drop=True)
        d2 = synth.interleaved_docs(200, override_num_blocks=7).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert synth.span_signature(d1["spans"]) == synth.span_signature(d2["spans"])
        assert (d1["doc_id"] == d2["doc_id"]).all()
        # kinds interleave text and media
        kinds = {s[0] for sig in synth.span_signature(d1["spans"]) for s in sig}
        assert "text" in kinds and "image" in kinds

    def test_span_passthrough_spatial_join(self):
        from lib_gdal_ray.functions import derive
        from lib_gdal_ray.geom import wkb as wkb_mod
        from lib_gdal_ray.pipelines import spatial_join as sj

        docs = synth.interleaved_docs(500)
        nk = np.arange(25, dtype=np.int64)
        xmin, ymin, xmax, ymax = derive.zone_boxes(nk)
        zones = pa.table({
            "zone_id": pa.array(nk),
            "geometry": pa.array([wkb_mod.box_to_wkb(float(a), float(b), float(c), float(d))
                                  for a, b, c, d in zip(xmin, ymin, xmax, ymax)], type=pa.binary()),
        })
        joined = sj.broadcast_pip_join(docs, zones, "geometry", ["zone_id"], res=5.0).to_pandas()
        assert len(joined) > 0
        # span-sequence equality vs regeneration
        orig = synth.interleaved_docs(500).to_pandas().set_index("doc_id")
        for _, row in joined.head(100).iterrows():
            a = synth.span_signature([row["spans"]])
            b = synth.span_signature([orig.loc[row["doc_id"], "spans"]])
            assert a == b


class TestManifest:
    def test_resume_skips_completed(self, tmp_path):
        out = str(tmp_path / "run")
        done = []

        def work(key, out_path):
            done.append(key)
            with open(out_path, "w") as f:
                f.write(key)
            return {"rows": 1}

        keys = [f"k{i}" for i in range(10)]
        with pytest.raises(RuntimeError):
            run_partitioned(out, keys, "lineage-A", work, fail_on=lambda k: k == "k5")
        assert done == [f"k{i}" for i in range(5)]
        res = run_partitioned(out, keys, "lineage-A", work)
        assert sorted(res["skipped"]) == sorted([f"k{i}" for i in range(5)])
        assert sorted(res["ran"]) == sorted([f"k{i}" for i in range(5, 10)])
        man = Manifest(out)
        assert man.counters_total() == {"rows": 10}

    def test_lineage_change_recomputes(self, tmp_path):
        out = str(tmp_path / "run2")

        def work(key, out_path):
            return {"rows": 1}

        run_partitioned(out, ["a", "b"], "L1", work)
        res = run_partitioned(out, ["a", "b"], "L2", work)
        assert sorted(res["ran"]) == ["a", "b"]


class TestNgramLangId:
    def test_four_languages(self):
        t = pa.table({"text": pa.array([
            "the government announced that the new policy would take effect next year",
            "die regierung hat angekündigt dass die neue richtlinie nächstes jahr",
            "le gouvernement a annoncé que la nouvelle politique entrerait en vigueur",
            "el gobierno anunció que la nueva política entraría en vigor el próximo",
            "0192 3848 !!!",
        ])})
        out = text_mod.lang_id_ngram(ray.data.from_arrow(t), concurrency=1).to_pandas()
        assert list(out["lang_ngram"])[:4] == ["en", "de", "fr", "es"]
        assert out["lang_ngram"].iloc[4] == "und"


class TestStatsMetrics:
    def test_summarize(self, sf_small):
        from lib_gdal_ray.state.metrics import summarize_stats

        ds = tables.read_table(sf_small, "lineitem", columns=["l_quantity"])
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow").materialize()
        out = summarize_stats(ds)
        assert len(out["operators"]) >= 1
        names = " ".join(o["name"] for o in out["operators"])
        assert "MapBatches" in names or "ReadParquet" in names
        assert any("rows" in o for o in out["operators"])
        assert isinstance(out["raw"], str) and len(out["raw"]) > 100


class TestLanceSeam:
    def test_parquet_fallback(self, sf_small):
        ds = tables.read_table(sf_small, "nation", columns=["n_nationkey"])
        assert ds.count() == 25

    def test_lance_dir_without_package_raises(self, tmp_path):
        import os

        if tables.lance_available():
            pytest.skip("lance installed; dispatch covered by read path")
        os.makedirs(tmp_path / "t.lance")
        with pytest.raises(ImportError):
            tables.read_table(str(tmp_path), "t")

    @pytest.mark.skipif(not tables.lance_available(), reason="lance not installed")
    def test_lance_roundtrip(self, sf_small, tmp_path):
        import lance
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_small}/nation.parquet")
        lance.write_dataset(t, str(tmp_path / "nation.lance"))
        ds = tables.read_table(str(tmp_path), "nation", columns=["n_nationkey"])
        assert ds.count() == len(t)


class TestNgramJaccard:
    def test_exact_pairs_with_planted_dups(self):
        from lib_gdal_ray.pipelines.dedup import jaccard_shingles, ngram_jaccard_pairs

        base = "the quick brown fox jumps over the lazy dog and runs away " * 6
        docs = [base + f"tail {i} " * 3 for i in range(15)]
        docs.append(base + "tail 0 tail 0 tail 0 !")   # near-dup of doc 0
        docs.append("completely unrelated text about warp kernels " * 8)
        t = pa.table({"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
                      "text": pa.array(docs)})
        out = ngram_jaccard_pairs(ray.data.from_arrow(t), "text", "doc_id",
                                  threshold=0.7).to_pandas()
        got = {(a, b): j for a, b, j in
               zip(out["id_a"], out["id_b"], out["jaccard"])}
        assert (0, 15) in got
        # every reported value is the EXACT jaccard
        for (a, b), j in got.items():
            np.testing.assert_allclose(j, jaccard_shingles(docs[a], docs[b], 5))
        # unrelated doc pairs never appear
        assert not any(16 in p for p in got)


class TestIvf:
    def _clustered(self, n_per=80, k=4, d=16, seed=3):
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((k, d)) * 4
        mat = np.vstack([c + 0.3 * rng.standard_normal((n_per, d))
                         for c in centers]).astype(np.float32)
        ids = np.arange(len(mat), dtype=np.int64)
        t = pa.table({"vec_id": pa.array(ids),
                      "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32()))})
        return t, mat

    def test_kmeans_separates_clusters(self):
        t, mat = self._clustered()
        cents = ann_mod.kmeans_fit(ray.data.from_arrow(t), 16, 4, iters=4)
        assert cents.shape == (4, 16)
        assigned = ann_mod.ivf_assign(ray.data.from_arrow(t), cents).to_pandas()
        # each true cluster maps to (mostly) one list
        for c in range(4):
            lists = assigned["ivf_list"].to_numpy()[c * 80:(c + 1) * 80]
            dominant = np.bincount(lists).max()
            assert dominant >= 70

    def test_ivf_topk_recall_vs_brute(self):
        t, mat = self._clustered()
        ds = ray.data.from_arrow(t)
        cents = ann_mod.kmeans_fit(ds, 16, 4, iters=4)
        indexed = ann_mod.ivf_assign(ds, cents).materialize()
        qmat = mat[:6].astype(np.float64)
        qids = np.arange(6)
        ivf = ann_mod.ivf_topk(indexed, cents, qids, qmat, 10, nprobe=1).to_pandas()
        brute = ann_mod.brute_topk(ds, qids, qmat, 10).to_pandas()
        hits = 0
        for q in range(6):
            a = set(ivf[ivf.query_id == q]["vec_id"])
            b = set(brute[brute.query_id == q]["vec_id"])
            hits += len(a & b)
        recall = hits / (6 * 10)
        assert recall >= 0.9  # nprobe=1 on well-separated clusters

    def test_ivf_nprobe_all_is_exact(self):
        t, mat = self._clustered(n_per=50)
        ds = ray.data.from_arrow(t)
        cents = ann_mod.kmeans_fit(ds, 16, 4, iters=3)
        indexed = ann_mod.ivf_assign(ds, cents).materialize()
        qmat = mat[:3].astype(np.float64)
        qids = np.arange(3)
        ivf = ann_mod.ivf_topk(indexed, cents, qids, qmat, 8, nprobe=4).to_pandas()
        brute = ann_mod.brute_topk(ds, qids, qmat, 8).to_pandas()
        for q in range(3):
            a = list(ivf[ivf.query_id == q].sort_values("rank")["vec_id"])
            b = list(brute[brute.query_id == q].sort_values("rank")["vec_id"])
            assert a == b  # probing every list == exact


class TestChunking:
    def _chunks(self, texts, window, stride):
        ds = ray.data.from_arrow(pa.table({
            "doc_id": list(range(len(texts))), "text": texts}))
        return (text_mod.chunk_documents(ds, window=window, stride=stride)
                .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))

    def test_vs_python_reference(self):
        texts = ["a b c d e f g h i", "one two", "", "x " * 500 + "end"]
        window, stride = 4, 3
        out = self._chunks(texts, window, stride)
        want = []
        for d, t in enumerate(texts):
            toks = t.split(" ")
            for ci, start in enumerate(range(0, len(toks), stride)):
                sel = toks[start:start + window]
                want.append((d, ci, len(sel), " ".join(sel)))
        got = list(out.itertuples(index=False, name=None))
        assert got == want

    def test_non_overlapping_partition_reassembles(self):
        # stride == window: chunks partition the token stream exactly
        texts = ["alpha beta gamma delta epsilon zeta eta"]
        out = self._chunks(texts, 3, 3)
        assert " ".join(out["chunk_text"]) == texts[0]
        assert out["n_tokens"].sum() == 7

    def test_window_one(self):
        out = self._chunks(["p q r"], 1, 1)
        assert list(out["chunk_text"]) == ["p", "q", "r"]
        assert list(out["n_tokens"]) == [1, 1, 1]

    def test_bad_params(self):
        with pytest.raises(ValueError):
            text_mod.chunk_documents(ray.data.range(1), window=0, stride=1)
        with pytest.raises(ValueError):
            text_mod.chunk_documents(ray.data.range(1), window=4, stride=0)


class TestTfidf:
    def test_vs_hand_computed(self):
        texts = ["cat dog cat", "dog fish", "cat cat cat bird"]
        ds = ray.data.from_arrow(pa.table({
            "doc_id": [0, 1, 2], "text": texts}))
        out = (text_mod.tfidf_top_terms(ds, n_docs=3, k=2)
               .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True))
        import math
        def score(tf, df):
            return math.floor(tf * math.log(3.0 / df) * 1e9 + 0.5)
        # doc0: cat tf2 df2, dog tf1 df2 -> top: cat, dog
        r0 = out[out.doc_id == 0]
        assert list(r0["term"]) == ["cat", "dog"]
        assert r0["score_c"].iloc[0] == score(2, 2)
        # doc1: dog tf1 df2, fish tf1 df1 -> fish scores higher (rarer)
        r1 = out[out.doc_id == 1]
        assert list(r1["term"]) == ["fish", "dog"]
        # doc2: cat tf3 df2 vs bird tf1 df1: 3*ln(1.5) > 1*ln(3)
        r2 = out[out.doc_id == 2]
        assert list(r2["term"]) == ["cat", "bird"]
        assert list(r2["rank"]) == [1, 2]

    def test_tie_break_by_term(self):
        # two terms with identical (tf, df) -> alphabetical order
        ds = ray.data.from_arrow(pa.table({
            "doc_id": [0, 1], "text": ["zebra apple", "zebra apple"]}))
        out = (text_mod.tfidf_top_terms(ds, n_docs=2, k=2)
               .to_pandas().sort_values(["doc_id", "rank"]))
        assert list(out[out.doc_id == 0]["term"]) == ["apple", "zebra"]

    def test_join_path_equals_broadcast_path(self):
        texts = ["cat dog cat", "dog fish", "cat cat cat bird", "fish fish zz"]
        ds = ray.data.from_arrow(pa.table({"doc_id": list(range(4)), "text": texts}))
        a = (text_mod.tfidf_top_terms(ds, n_docs=4, k=2)
             .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True))
        ds2 = ray.data.from_arrow(pa.table({"doc_id": list(range(4)), "text": texts}))
        b = (text_mod.tfidf_top_terms_join(ds2, n_docs=4, k=2)
             .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True))
        sc = sorted(a.columns)
        assert a[sc].equals(b[sc].astype(a[sc].dtypes.to_dict()))
