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
    partials = ds.map_batches(
        _BruteTopK, batch_format="pyarrow",
        fn_constructor_args=({"ref": ref}, emb_col, id_col, k),
        concurrency=concurrency,
    )

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
    return ds.map_batches(_LshBucketer, batch_format="pyarrow",
                          fn_constructor_args=(emb_col, nbits, dim, seed),
                          concurrency=concurrency)


def embedding_near_dup_pairs(ds: ray.data.Dataset, dim: int, threshold: float,
                             emb_col: str = "embedding", id_col: str = "vec_id",
                             nbits: int = 8, seed: int = 42) -> ray.data.Dataset:
    """Near-dup pairs by cosine ≥ threshold within LSH buckets
    (approximate: pairs split across buckets are missed; recall is
    measured in tests and raised by lowering nbits)."""
    bucketed = lsh_bucket(ds, dim, emb_col, nbits, seed)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "cosine_sim": pd.Series(dtype=np.float64)})
        ids = df[id_col].to_numpy()
        mat = _normalize(np.stack([np.asarray(e, dtype=np.float64) for e in df[emb_col]]))
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold
        a, b = ids[iu[hit]], ids[ju[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine_sim": sims[iu[hit], ju[hit]]})

    return bucketed.groupby("lsh_bucket").map_groups(pairs, batch_format="pandas")
