"""Deduplication operators for large-scale document corpora.

The reference only has exact DISTINCT (`ogr_gensql.cpp:1972-1995`);
near-dup operators follow the standard public literature (Broder 1997
MinHash / shingling; Charikar 2002 SimHash; Leskovec-Rajaraman-Ullman
MMDS ch.3 LSH banding) expressed Ray-Data-first:

* exact_dedup — hash-partition `groupby(key)` + per-group min-id winner
  (one narrow shuffle of (key, id) after in-batch pre-dedup).
* minhash_lsh_pairs — shingle → minhash signature (vectorized numpy,
  one pass per doc over a (num_perm,) permutation matrix) → band
  buckets via `flat_map`-style explode → `groupby(bucket)` → candidate
  pairs → exact-Jaccard verify inside the group kernel. Emits verified
  near-dup pairs (a < b) deduped across bands.
* simhash64 — 64-bit fingerprint per doc (token hashing, vectorized).

All hashing is deterministic (fixed seeds) so retries/resumes are safe.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_M61 = np.uint64((1 << 61) - 1)


def _stable_hash64(strings: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per string (blake2b-8; stable across
    processes, unlike Python's randomized hash())."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = np.frombuffer(
            hashlib.blake2b(s.encode("utf-8", "ignore"), digest_size=8).digest(),
            dtype=np.uint64)[0]
    return out


def exact_dedup(ds: ray.data.Dataset, key_col: str, id_col: str,
                keep_cols: Optional[List[str]] = None,
                shuffle_partitions: Optional[int] = None) -> ray.data.Dataset:
    """Keep the min-id row per duplicate key. Returns (key, winner id,
    dup count) plus keep_cols of the winner. shuffle_partitions: local
    tree combine for modest key cardinality (see relational.grouped_agg)."""
    keep_cols = keep_cols or []

    def local(batch: pa.Table) -> pa.Table:
        cols = [key_col, id_col] + keep_cols
        t = pa.table({c: batch[c] for c in cols})
        aggs = [(id_col, "min"), (id_col, "count")] + [(c, "min") for c in keep_cols]
        out = t.group_by([key_col]).aggregate(aggs)
        return out.rename_columns([key_col, "__id", "__n"] + [f"__k_{c}" for c in keep_cols])

    from ray.data.aggregate import Min, Sum

    local_ds = ds.map_batches(local, batch_format="pyarrow")
    if shuffle_partitions:
        names = [key_col, id_col, "dup_count"] + keep_cols

        def combine(batch: pa.Table) -> pa.Table:
            aggs = [("__id", "min"), ("__n", "sum")] + \
                [(f"__k_{c}", "min") for c in keep_cols]
            out = batch.group_by([key_col]).aggregate(aggs)
            return out.rename_columns(names)

        return local_ds.repartition(1).map_batches(combine, batch_format="pyarrow",
                                                   batch_size=None)
    aggs = [Min("__id", alias_name=id_col), Sum("__n", alias_name="dup_count")]
    for c in keep_cols:
        aggs.append(Min(f"__k_{c}", alias_name=c))
    return local_ds.groupby(key_col).aggregate(*aggs)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


_P31 = np.uint64(2147483647)  # Mersenne prime 2^31-1: products of two
_B = np.uint64(257)           # sub-31-bit values fit in uint64


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-shingle (character) hashes — vectorized rolling
    polynomial hash over utf-8 bytes (no per-shingle Python)."""
    raw = text.encode("utf-8", "ignore")
    if len(raw) < k:
        raw = raw + b" " * (k - len(raw))
    b = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    n = len(b) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = (h * _B + b[j:j + n]) % _P31
    return np.unique(h)


def _minhash_matrix(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_P31), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_P31), num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int, k: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    h = _shingle_hashes(text, k)
    # (num_perm, n_shingles) permutation under mod-(2^31-1)
    vals = (a[:, None] * h[None, :] + b[:, None]) % _P31
    return vals.min(axis=1)


class _MinHashStage:
    """Actor stage: permutation matrix built once per actor. Emits one
    row per (doc, band): (id, packed band-bucket key, bb_mod group,
    signature). The signature rides along so verification happens inside
    the bucket-merge group — no second pass over the corpus. (Cost:
    num_perm×8 bytes × bands per doc in the shuffle; drop to a
    candidate-recompute pass if that ever dominates.)"""

    def __init__(self, text_col, id_col, num_perm, shingle_k, bands):
        self.a, self.b = _minhash_matrix(num_perm)
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.k, self.bands = num_perm, shingle_k, bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        buckets = np.empty(n * self.bands, dtype=np.uint64)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i in range(n):
            sig = minhash_signature(texts[i], self.num_perm, self.k, self.a, self.b)
            sigs[i] = sig
            for bb in range(self.bands):
                chunk = sig[bb * self.rows_per_band:(bb + 1) * self.rows_per_band]
                digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                buckets[i * self.bands + bb] = (
                    (np.uint64(bb) << np.uint64(58))
                    | (np.frombuffer(digest, dtype=np.uint64)[0] >> np.uint64(6)))
        rep = np.repeat(np.arange(n), self.bands)
        return pa.table({
            self.id_col: pa.array(ids[rep]),
            "bb": pa.array(buckets),
            "bb_mod": pa.array((buckets & np.uint64(255)).astype(np.int32)),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs[rep].ravel()), self.num_perm),
        })


def minhash_lsh_pairs(ds: ray.data.Dataset, text_col: str, id_col: str,
                      num_perm: int = 64, shingle_k: int = 5, bands: int = 16,
                      threshold: float = 0.5,
                      max_bucket: int = 64,
                      concurrency=(1, 8)) -> ray.data.Dataset:
    """Near-dup pairs (id_a < id_b, est_jaccard >= threshold).

    One pipeline, two shuffles: (1) banded rows (with signatures) hash
    to 256 `bb_mod` groups; inside each group a vectorized self-merge
    on the full bucket key generates candidate pairs AND verifies them
    with the est-Jaccard (fraction of matching minhash components) from
    the in-group signatures; (2) a tiny groupby dedups pairs found in
    multiple bands. Buckets larger than `max_bucket` are truncated
    (mass near-identical dupes; documented drop).
    """
    banded = ds.map_batches(
        _MinHashStage, batch_format="pyarrow",
        fn_constructor_args=(text_col, id_col, num_perm, shingle_k, bands),
        concurrency=concurrency,
    )

    def merge_verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                              "id_b": pd.Series(dtype=np.int64),
                              "est_jaccard": pd.Series(dtype=np.float64)})
        if len(df) < 2:
            return empty
        df = df.drop_duplicates(subset=[id_col, "bb"])
        df = df.groupby("bb", sort=False).head(max_bucket)
        df = df.reset_index(drop=True)
        df["__row"] = np.arange(len(df))
        m = df[[id_col, "bb", "__row"]].merge(
            df[[id_col, "bb", "__row"]], on="bb", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        if len(m) == 0:
            return empty
        m = m.drop_duplicates(subset=[f"{id_col}_a", f"{id_col}_b"])
        sigs = np.stack([np.asarray(s, dtype=np.uint64) for s in df["sig"]])
        est = (sigs[m["__row_a"].to_numpy()] == sigs[m["__row_b"].to_numpy()]).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame({
            "id_a": m[f"{id_col}_a"].to_numpy(dtype=np.int64)[keep],
            "id_b": m[f"{id_col}_b"].to_numpy(dtype=np.int64)[keep],
            "est_jaccard": est[keep],
        })

    pairs = banded.groupby("bb_mod").map_groups(merge_verify, batch_format="pandas")
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


def jaccard_shingles(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard (test oracle)."""
    sa = {a[i:i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i:i + k] for i in range(max(1, len(b) - k + 1))}
    return len(sa & sb) / max(1, len(sa | sb))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class _SimHashStage:
    def __init__(self, text_col):
        import re

        self.text_col = text_col
        self.tok = re.compile(r"\w+", re.UNICODE)
        self.bits = np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = self.tok.findall(t.lower())
            if not toks:
                continue
            hs = _stable_hash64(np.asarray(toks, dtype=object))
            bitmat = ((hs[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bitmat - 1).sum(axis=0)
            out[i] = np.sum((votes > 0).astype(np.uint64) << self.bits)
        return batch.append_column("simhash", pa.array(out))


def simhash64(ds: ray.data.Dataset, text_col: str, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(_SimHashStage, batch_format="pyarrow",
                          fn_constructor_args=(text_col,), concurrency=concurrency)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
