"""Similarity search over an embedding column (`list<float>`).

* `brute_topk` — exact cosine top-k: the query matrix is broadcast
  (ray.put once, pulled per actor), each batch does one numpy matmul.
  The baseline the north rule asks for; scales linearly in corpus size
  with zero shuffle.
* `lsh_bucket_topk` — scale path: random-hyperplane LSH (Charikar
  2002) buckets the corpus; probes only matching buckets (recall <1,
  measured in tests).
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _stack_embeddings(col) -> np.ndarray:
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
    else:
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        dim = offsets[1] - offsets[0]
    return flat.reshape(len(arr), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteTopK:
    def __init__(self, wrapped_ref, emb_col, id_col, k):
        q = ray.get(wrapped_ref["ref"])  # dict: query_ids (Q,), query_mat (Q,D)
        self.qids = q["query_ids"]
        self.qmat = _normalize(q["query_mat"].astype(np.float64))
        self.emb_col, self.id_col, self.k = emb_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_stack_embeddings(batch[self.emb_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = mat @ self.qmat.T  # (N, Q)
        n, q = sims.shape
        k = min(self.k, n)
        # per-query local top-k (partial); merged by a tiny final top-k
        out_q, out_id, out_sim = [], [], []
        for j in range(q):
            s = sims[:, j]
            part = np.argpartition(-s, k - 1)[:k]
            order = part[np.lexsort((ids[part], -s[part]))]
            out_q.append(np.full(k, self.qids[j], dtype=np.int64))
            out_id.append(ids[order])
            out_sim.append(s[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.id_col: pa.array(np.concatenate(out_id)),
            "cosine_sim": pa.array(np.concatenate(out_sim)),
        })


def brute_topk(ds: ray.data.Dataset, query_ids: np.ndarray, query_mat: np.ndarray,
               k: int, emb_col: str = "embedding", id_col: str = "vec_id",
               concurrency: Union[int, Tuple[int, int]] = (1, 8)) -> ray.data.Dataset:
    """Exact cosine top-k per query. Per-batch partial top-k (map_batches
    matmul) then one tiny per-query merge via map_groups."""
    ref = ray.put({"query_ids": np.asarray(query_ids, dtype=np.int64),
                   "query_mat": np.asarray(query_mat)})
    key = ref.hex()

    def scorer(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _BruteTopK({"ref": ref}, emb_col,
                                                 id_col, k))
        return j(batch)

    partials = ds.map_batches(scorer, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cosine_sim", id_col], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int32)
        return df

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


class _LshBucketer:
    def __init__(self, emb_col, nbits, dim, seed):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits))
        self.emb_col = emb_col
        self.bits = np.arange(nbits, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _stack_embeddings(batch[self.emb_col])
        signs = (mat @ self.planes) > 0
        bucket = (signs.astype(np.uint64) << self.bits[None, :]).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket))


def lsh_bucket(ds: ray.data.Dataset, dim: int, emb_col: str = "embedding",
               nbits: int = 8, seed: int = 42,
               concurrency: Union[int, Tuple[int, int]] = (1, 8)) -> ray.data.Dataset:
    """Attach a random-hyperplane LSH bucket id (for bucketed ANN /
    embedding near-dup: co-partition by bucket, compare within)."""
    return ds.map_batches(_LshBucketer(emb_col, nbits, dim, seed),
                          batch_format="pyarrow")


class _MultiTableBucketer:
    """Banded multi-table random-hyperplane LSH (the MinHash-LSH band
    structure applied to SimHash bits, per Charikar 2002 + MMDS ch.3):
    `tables` independent hyperplane sets of `nbits` each; a pair
    collides if ANY table agrees on all its bits — recall rises with
    table count instead of by shrinking nbits (which blows bucket
    sizes up). Emits one row per (vector, table) with a packed bucket
    key and a 256-way bounded group key (`bb_mod`), exactly like the
    MinHash band explode."""

    def __init__(self, emb_col, id_col, dim, nbits, tables, seed):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((tables, dim, nbits))
        self.emb_col, self.id_col = emb_col, id_col
        self.bits = np.arange(nbits, dtype=np.uint64)
        self.tables = tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _stack_embeddings(batch[self.emb_col])
        mat = _normalize(mat)
        n = len(mat)
        buckets = np.empty((n, self.tables), dtype=np.uint64)
        for t in range(self.tables):
            signs = (mat @ self.planes[t]) > 0
            code = (signs.astype(np.uint64) << self.bits[None, :]).sum(axis=1)
            buckets[:, t] = (np.uint64(t) << np.uint64(58)) | code
        rep = np.repeat(np.arange(n), self.tables)
        flat = buckets.ravel()
        return pa.table({
            self.id_col: pa.array(
                batch[self.id_col].to_numpy(zero_copy_only=False)[rep]),
            "bb": pa.array(flat),
            "bb_mod": pa.array(
                ((flat * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56))
                .astype(np.int32)),
            "emb": pa.FixedSizeListArray.from_arrays(
                pa.array(mat[rep].ravel()), mat.shape[1]),
        })


def embedding_near_dup_pairs(ds: ray.data.Dataset, dim: int, threshold: float,
                             emb_col: str = "embedding", id_col: str = "vec_id",
                             nbits: int = 8, seed: int = 42,
                             tables: int = 8, max_bucket: int = 128,
                             concurrency=(1, 8)) -> ray.data.Dataset:
    """Near-dup pairs by cosine >= threshold via banded multi-table LSH.

    Scale shape (fixes the single-table all-pairs blow-up): `tables`
    independent bucketings explode to (vector, table) rows; one
    `groupby` over 256 bounded `bb_mod` groups; inside a group the
    kernel compares only vectors sharing a full bucket key, each bucket
    capped at `max_bucket` rows (beyond the cap = mass near-identical
    dupes; truncation is documented and deterministic by id order).
    Per-group work is O(sum bucket^2) with bucket <= max_bucket, never
    O((N/buckets)^2). A final (id_a, id_b) groupby dedups pairs found
    by several tables."""
    exploded = ds.map_batches(
        _MultiTableBucketer(emb_col, id_col, dim, nbits, tables, seed),
        batch_format="pyarrow")

    def pairs(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "cosine_sim": pa.array([], type=pa.float64())})
        if len(tbl) < 2:
            return empty
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        bb = tbl["bb"].to_numpy(zero_copy_only=False)
        emb = _stack_embeddings(tbl["emb"])
        order = np.lexsort((ids, bb))
        ids, bb, emb = ids[order], bb[order], emb[order]
        # bucket boundaries + per-bucket cap
        newb = np.flatnonzero(np.diff(bb)) + 1
        starts = np.concatenate([[0], newb, [len(bb)]])
        out_a, out_b, out_s = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = min(e - s, max_bucket)
            if m < 2:
                continue
            sub = emb[s:s + m]
            sid = ids[s:s + m]
            sims = sub @ sub.T
            iu, ju = np.triu_indices(m, k=1)
            hit = sims[iu, ju] >= threshold
            if not hit.any():
                continue
            a, b = sid[iu[hit]], sid[ju[hit]]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_s.append(sims[iu[hit], ju[hit]])
        if not out_a:
            return empty
        t = pa.table({"id_a": pa.array(np.concatenate(out_a)),
                      "id_b": pa.array(np.concatenate(out_b)),
                      "cosine_sim": pa.array(np.concatenate(out_s))})
        return (t.group_by(["id_a", "id_b"])
                 .aggregate([("cosine_sim", "max")])
                 .rename_columns(["id_a", "id_b", "cosine_sim"]))

    grouped = exploded.groupby("bb_mod").map_groups(pairs, batch_format="pyarrow")
    from ray.data.aggregate import Max

    return grouped.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine_sim", alias_name="cosine_sim"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: distributed k-means coarse quantizer + lists
# ---------------------------------------------------------------------------


def kmeans_fit(ds: ray.data.Dataset, dim: int, k: int,
               emb_col: str = "embedding", iters: int = 5,
               seed: int = 42) -> np.ndarray:
    """Distributed Lloyd k-means on normalized embeddings (the IVF
    coarse quantizer; spherical k-means since vectors are unit-norm).

    Each iteration is one map_batches pass emitting ONE packed partial
    per batch — the whole (k, dim+1) count+sum matrix as a binary blob —
    tree-reduced by a matrix-add AggregateFn (no per-dimension column
    explosion: dim=1024 costs the same shuffle row count as dim=8; a
    few hundred blob rows of k·(dim+1)·8 bytes). Only the (k, dim)
    centroid matrix ever lands on the driver (legitimate small-side
    state, re-broadcast per iteration). Deterministic: seeded init from
    the first k rows."""
    from ray.data.aggregate import AggregateFn

    first = ds.limit(k).to_pandas()
    init = _normalize(np.stack(
        [np.asarray(e, dtype=np.float64) for e in first[emb_col]]))
    rng = np.random.default_rng(seed)
    if len(init) < k:  # degenerate tiny input: pad with random directions
        pad = rng.standard_normal((k - len(init), dim))
        init = np.vstack([init, _normalize(pad)])
    centroids = init

    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            cents = ray.get(_ref)
            mat = _normalize(_stack_embeddings(batch[emb_col]))
            assign = np.argmax(mat @ cents.T, axis=1)
            m = np.zeros((len(cents), mat.shape[1] + 1))
            m[:, 0] = np.bincount(assign, minlength=len(cents))
            np.add.at(m[:, 1:], assign, mat)
            return pa.table({"m": pa.array([m.tobytes()], type=pa.binary())})

        msum = AggregateFn(
            init=lambda _k: np.zeros((k, dim + 1)),
            merge=lambda a, b: a + b,
            accumulate_row=lambda acc, row: acc + np.frombuffer(
                row["m"], dtype=np.float64).reshape(k, dim + 1),
            name="msum")
        tot = ds.map_batches(partial, batch_format="pyarrow").aggregate(msum)["msum"]
        new = centroids.copy()
        for c in range(k):
            if tot[c, 0] > 0:
                nv = np.linalg.norm(tot[c, 1:])
                if nv > 0:
                    new[c] = tot[c, 1:] / nv
        centroids = new
    return centroids


def ivf_assign(ds: ray.data.Dataset, centroids: np.ndarray,
               emb_col: str = "embedding") -> ray.data.Dataset:
    """Attach the nearest-centroid list id (`ivf_list`)."""
    ref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        mat = _normalize(_stack_embeddings(batch[emb_col]))
        a = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(a))

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_topk(indexed: ray.data.Dataset, centroids: np.ndarray,
             query_ids: np.ndarray, query_mat: np.ndarray, k: int,
             nprobe: int = 4, emb_col: str = "embedding",
             id_col: str = "vec_id") -> ray.data.Dataset:
    """IVF approximate top-k: each query probes its `nprobe` nearest
    lists; per batch only rows in probed lists are compared (the scan
    shrinks by ~nprobe/n_lists vs brute force). Same partial-top-k +
    per-query merge shape as brute_topk."""
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    probes = np.argsort(-(qmat @ centroids.T), axis=1)[:, :nprobe]
    ref = ray.put({"query_ids": np.asarray(query_ids, dtype=np.int64),
                   "qmat": qmat, "probes": probes})

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        mat = _normalize(_stack_embeddings(batch[emb_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
        out_q, out_id, out_sim = [], [], []
        for j in range(len(q["query_ids"])):
            m = np.isin(lists, q["probes"][j])
            if not m.any():
                continue
            s = mat[m] @ q["qmat"][j]
            sub_ids = ids[m]
            kk = min(k, len(s))
            part = np.argpartition(-s, kk - 1)[:kk]
            order = part[np.lexsort((sub_ids[part], -s[part]))]
            out_q.append(np.full(kk, q["query_ids"][j], dtype=np.int64))
            out_id.append(sub_ids[order])
            out_sim.append(s[order])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine_sim": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "cosine_sim": pa.array(np.concatenate(out_sim)),
        })

    partials = indexed.map_batches(partial, batch_format="pyarrow")

    def merge(tbl: pa.Table) -> pa.Table:
        sims = tbl["cosine_sim"].to_numpy(zero_copy_only=False)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]
        out = tbl.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int32)))

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")
