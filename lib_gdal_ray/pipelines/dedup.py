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

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_M61 = np.uint64((1 << 61) - 1)


def _hash128_hex(texts) -> pa.Array:
    """Vectorized deterministic 128-bit content key per string: each doc
    is zero-padded to 8-byte words; two independent lanes accumulate
    `splitmix64(word ^ splitmix64(word_index + salt))` mod 2^64 (position
    salt keeps the sum order-sensitive); the exact byte length rides in
    the key. No per-row Python in the hot path — one concatenated
    buffer, two mixer passes, `np.add.reduceat` per doc, and one
    whole-batch hexlify sliced into an Arrow string array."""
    import binascii

    n = len(texts)
    if n == 0:
        return pa.array([], type=pa.string())
    enc = [t.encode("utf-8", "ignore") for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n)
    pad = (-lens) % 8
    buf = b"".join(e + b"\0" * int(p) for e, p in zip(enc, pad))
    words = (np.frombuffer(buf, dtype="<u8") if buf
             else np.empty(0, np.uint64))
    nw = (lens + pad) // 8
    starts = np.zeros(n, np.int64)
    np.cumsum(nw[:-1], out=starts[1:])
    j = (np.arange(len(words), dtype=np.int64)
         - np.repeat(starts, nw)).astype(np.uint64)
    key = np.zeros((n, 3), dtype=">u8")
    nz = np.flatnonzero(nw > 0)
    for lane, salt in enumerate((np.uint64(0xA24BAED4963EE407),
                                 np.uint64(0x9FB21C651E98DF25))):
        hw = _splitmix64(words ^ _splitmix64(j + salt))
        if len(nz):
            key[nz, lane] = np.add.reduceat(hw, starts[nz])
    key[:, 2] = lens.astype(np.uint64)
    big = binascii.hexlify(key.tobytes())
    offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * 48).tobytes())
    return pa.Array.from_buffers(pa.utf8(), n, [None, offsets, pa.py_buffer(big)])


def exact_dedup(ds: ray.data.Dataset, key_col: str, id_col: str,
                keep_cols: Optional[List[str]] = None,
                shuffle_partitions: Optional[int] = None,
                hash_key: bool = False) -> ray.data.Dataset:
    """Keep the min-id row per duplicate key. Returns (key, winner id,
    dup count) plus keep_cols of the winner.

    hash_key=True replaces the key with a 128-bit content digest + exact
    length (hex, `_hash128_hex`) BEFORE the shuffle — mandatory for
    unbounded keys like full document text (the shuffle then moves 48
    bytes per row, never the corpus; collisions at 128 bits are
    negligible vs 10^12 docs). Fully vectorized, no per-row Python. The
    output key column is renamed ``{key_col}_md5`` (historical name).

    shuffle_partitions (local tree combine) is ONLY valid when the
    distinct-key table fits one block (bounded keyspaces: zone ids,
    enum fields); leave None for document-scale keys — the plain
    ``groupby`` path hash-partitions the combine across the cluster.
    """
    keep_cols = keep_cols or []
    out_key = f"{key_col}_md5" if hash_key else key_col

    def local(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in [key_col, id_col] + keep_cols}
        if hash_key:
            cols[key_col] = _hash128_hex(batch[key_col].to_pylist())
        t = pa.table(cols)
        aggs = [(id_col, "min"), (id_col, "count")] + [(c, "min") for c in keep_cols]
        out = t.group_by([key_col]).aggregate(aggs)
        out = out.rename_columns([key_col, "__id", "__n"] + [f"__k_{c}" for c in keep_cols])
        return out.rename_columns([out_key] + out.column_names[1:])

    from ray.data.aggregate import Min, Sum

    local_ds = ds.map_batches(local, batch_format="pyarrow")
    if shuffle_partitions:
        names = [out_key, id_col, "dup_count"] + keep_cols

        def combine(batch: pa.Table) -> pa.Table:
            aggs = [("__id", "min"), ("__n", "sum")] + \
                [(f"__k_{c}", "min") for c in keep_cols]
            out = batch.group_by([out_key]).aggregate(aggs)
            return out.rename_columns(names)

        return local_ds.repartition(1).map_batches(combine, batch_format="pyarrow",
                                                   batch_size=None)
    aggs = [Min("__id", alias_name=id_col), Sum("__n", alias_name="dup_count")]
    for c in keep_cols:
        aggs.append(Min(f"__k_{c}", alias_name=c))
    return local_ds.groupby(out_key).aggregate(*aggs)


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


def _mod_p31_inplace(x: np.ndarray) -> np.ndarray:
    """Exact in-place x % (2^31-1) (Mersenne fold: x = hi*2^31 + lo
    => x ≡ hi + lo). Bit-identical to %, no temporaries beyond one
    shift buffer."""
    hi = x >> np.uint64(31)
    x &= _P31
    x += hi
    hi = x >> np.uint64(31)
    x &= _P31
    x += hi
    np.subtract(x, _P31, out=x, where=x >= _P31)
    return x


def minhash_signatures_batch(texts, num_perm: int, k: int,
                             a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signatures for a whole batch with NO per-doc Python loop in the
    hot path: one concatenated byte buffer, one k-pass rolling hash over
    it, and per-doc minima via ``np.minimum.reduceat`` on bounded
    segments of the (num_perm, shingles) matrix.

    Identical output to per-doc ``minhash_signature`` modulo duplicate
    shingles (min over duplicates == min over uniques)."""
    n = len(texts)
    enc = [t.encode("utf-8", "ignore") for t in texts]
    enc = [e if len(e) >= k else e + b" " * (k - len(e)) for e in enc]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n)
    concat = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    ends = np.cumsum(lens)
    starts = ends - lens
    n_sh = lens - k + 1
    total = len(concat) - k + 1
    h = np.zeros(total, dtype=np.uint64)
    for j in range(k):
        h = (h * _B + concat[j:j + total]) % _P31
    # valid (non-boundary-crossing) shingle positions, in doc order
    sh_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(n_sh[:-1], out=sh_starts[1:])
    pos = np.arange(int(n_sh.sum()), dtype=np.int64)
    pos += np.repeat(starts - sh_starts, n_sh)
    hv = h[pos]
    # one permutation at a time with in-place arithmetic: peak memory
    # is ONE shingle-length row (vs the (num_perm, shingles) broadcast
    # matrix — 64x smaller and ~4x faster from cache locality), and
    # results are bit-identical (the SQL oracles mirror the modulo
    # arithmetic; only the evaluation strategy changes)
    sig = np.empty((n, len(a)), dtype=np.uint64)
    row = np.empty_like(hv)
    for p in range(len(a)):
        np.multiply(hv, a[p], out=row)
        row += b[p]
        _mod_p31_inplace(row)
        sig[:, p] = np.minimum.reduceat(row, sh_starts)
    return sig


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized uint64 (public-domain constant
    mix; replaces per-band hashlib calls)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hash_object_u64(arr: np.ndarray) -> np.ndarray:
    """uint64 hash of an object-dtype key array — C-level siphash via
    pandas (deterministic: pandas' fixed default hash key, so build and
    probe sides agree across workers), with a per-row crc32 fallback
    for exotic non-hashable objects. For bucket / broadcast-filter
    hashing only: needs intra-run consistency, not cross-version
    stability."""
    import pandas as pd

    try:
        return pd.util.hash_array(arr, categorize=False)
    except TypeError:
        from zlib import crc32

        return np.fromiter((crc32(str(x).encode()) for x in arr),
                           dtype=np.uint64, count=len(arr))


def band_buckets(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) signatures -> (n, bands) packed band-bucket keys
    (band index in the top 6 bits so different bands never collide)."""
    n, num_perm = sig.shape
    rpb = num_perm // bands
    chunks = sig[:, :bands * rpb].reshape(n, bands, rpb)
    mix = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rpb):
        mix = _splitmix64(mix ^ chunks[:, :, r])
    bb = np.broadcast_to(np.arange(bands, dtype=np.uint64)[None, :], (n, bands))
    return (bb << np.uint64(58)) | (mix >> np.uint64(6))


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
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = minhash_signatures_batch(texts, self.num_perm, self.k,
                                        self.a, self.b)
        buckets = band_buckets(sigs, self.bands).ravel()
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
    # the permutation matrix is tiny — ship it inside the callable and
    # run as a plain task pool (no actor cold-start; NOTES lesson 5)
    banded = ds.map_batches(
        _MinHashStage(text_col, id_col, num_perm, shingle_k, bands),
        batch_format="pyarrow",
    )

    def merge_verify(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64()),
                          "est_jaccard": pa.array([], type=pa.float64())})
        if len(tbl) < 2:
            return empty
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = tbl["bb"].to_numpy(zero_copy_only=False)
        sig_col = tbl["sig"].combine_chunks()
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sigs = (sig_col.flatten().to_numpy(zero_copy_only=False)
                .astype(np.uint64).reshape(len(tbl), -1))
        order = np.lexsort((ids, bb))
        ids, bb, sigs = ids[order], bb[order], sigs[order]
        # drop duplicate (bb, id) rows (same doc banded twice into a bucket)
        first = np.ones(len(ids), dtype=bool)
        first[1:] = (np.diff(bb) != 0) | (np.diff(ids) != 0)
        ids, bb, sigs = ids[first], bb[first], sigs[first]
        newb = np.flatnonzero(np.diff(bb)) + 1
        starts = np.concatenate([[0], newb, [len(bb)]])
        out_a, out_b, out_e = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            m = min(e - s, max_bucket)
            if m < 2:
                continue
            iu, ju = np.triu_indices(m, k=1)
            est = (sigs[s + iu] == sigs[s + ju]).mean(axis=1)
            hit = est >= threshold
            if not hit.any():
                continue
            out_a.append(ids[s + iu[hit]])
            out_b.append(ids[s + ju[hit]])
            out_e.append(est[hit])
        if not out_a:
            return empty
        t = pa.table({"id_a": pa.array(np.concatenate(out_a)),
                      "id_b": pa.array(np.concatenate(out_b)),
                      "est_jaccard": pa.array(np.concatenate(out_e))})
        return (t.group_by(["id_a", "id_b"])
                 .aggregate([("est_jaccard", "max")])
                 .rename_columns(["id_a", "id_b", "est_jaccard"]))

    pairs = banded.groupby("bb_mod").map_groups(merge_verify, batch_format="pyarrow")
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


_M64 = (1 << 64) - 1
_SM_C1 = 0x9E3779B97F4A7C15
_SM_C2 = 0xBF58476D1CE4E5B9
_SM_C3 = 0x94D049BB133111EB
_SIMHASH_TOKEN_CAP = 32  # hash at most 32 token bytes (SQL mirror bound)


def token_hash64(token: str) -> int:
    """Deterministic 64-bit token hash: base-257 polynomial mod 2^64
    over the first 32 utf-8 bytes, finalized with splitmix64 (full
    avalanche). Exact-int Python arithmetic — process-stable AND
    SQL-mirrorable (HUGEINT mod-2^64 in DuckDB), unlike blake2b."""
    h = 0
    for ch in token.encode("utf-8", "ignore")[:_SIMHASH_TOKEN_CAP]:
        h = (h * 257 + ch) & _M64
    h = (h + _SM_C1) & _M64
    h = ((h ^ (h >> 30)) * _SM_C2) & _M64
    h = ((h ^ (h >> 27)) * _SM_C3) & _M64
    return h ^ (h >> 31)


class _SimHashStage:
    """Per-worker token-hash cache (held via worker_cache):
    natural-language batches re-use a small vocabulary, so each distinct
    token hashes at most once per worker lifetime; the per-doc work is
    then pure numpy."""

    def __init__(self, text_col):
        import re

        self.text_col = text_col
        self.tok = re.compile(r"\w+", re.UNICODE)
        self.bits = np.arange(64, dtype=np.uint64)
        self._cache: dict = {}

    def _token_hashes(self, toks) -> np.ndarray:
        cache = self._cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = np.uint64(token_hash64(t))
                cache[t] = h
            out[i] = h
        if len(cache) > 1_000_000:  # bound actor memory
            cache.clear()
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = self.tok.findall(t.lower())
            if not toks:
                continue
            hs = self._token_hashes(toks)
            bitmat = ((hs[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bitmat - 1).sum(axis=0)
            out[i] = np.sum((votes > 0).astype(np.uint64) << self.bits)
        return batch.append_column("simhash", pa.array(out))


def simhash64(ds: ray.data.Dataset, text_col: str, concurrency=(1, 8)) -> ray.data.Dataset:
    key = f"simhash64:{text_col}"

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        return get_or_build(key, lambda: _SimHashStage(text_col))(batch)

    return ds.map_batches(stage, batch_format="pyarrow")


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def ngram_jaccard_pairs(ds: ray.data.Dataset, text_col: str, id_col: str,
                        shingle_k: int = 5, threshold: float = 0.7,
                        num_perm: int = 64, bands: int = 16,
                        est_margin: float = 0.2,
                        max_bucket: int = 64,
                        concurrency=(1, 8)) -> ray.data.Dataset:
    """EXACT n-gram (character k-shingle) Jaccard near-dup pairs.

    Two stages, both distributed:
    1. candidate generation — MinHash-LSH banding at a LOWERED estimate
       threshold (threshold - est_margin), so true pairs at the exact
       threshold survive estimator noise;
    2. exact verify — candidates hash-join back to the document texts
       (Ray native hash-partitioned join, both sides distributed), and
       the kernel computes the true character-shingle Jaccard per
       candidate pair (pairs are output-bounded, so the per-pair set
       intersection is cheap relative to the corpus scan).

    Output: (id_a, id_b, jaccard) with jaccard >= threshold, jaccard
    EXACT (inter/union of distinct k-substr sets — SQL-mirrorable)."""
    cands = minhash_lsh_pairs(ds, text_col, id_col, num_perm=num_perm,
                              shingle_k=shingle_k, bands=bands,
                              threshold=max(0.0, threshold - est_margin),
                              max_bucket=max_bucket, concurrency=concurrency)
    docs = ds.select_columns([id_col, text_col])

    def ren(suffix):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([f"id_{suffix}", f"text_{suffix}"])
        return fn

    docs_a = docs.map_batches(ren("a"), batch_format="pyarrow")
    docs_b = docs.map_batches(ren("b"), batch_format="pyarrow")
    # bucket lookup joins instead of native Dataset.join: the candidate
    # side ends in Sort-derived map_groups blocks that break the native
    # join's partition aggregators at some input shapes, and the bucket
    # path needs no aggregator-actor CPU clamp (NOTES lessons 6, W)
    from .relational import bucket_lookup_join

    j = bucket_lookup_join(cands.select_columns(["id_a", "id_b"]),
                           docs_a, on="id_a", how="inner")
    j = bucket_lookup_join(j, docs_b, on="id_b", how="inner")

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        jac = np.empty(len(ta), dtype=np.float64)
        for i in range(len(ta)):
            jac[i] = jaccard_shingles(ta[i], tb[i], shingle_k)
        out = pa.table({
            "id_a": batch["id_a"], "id_b": batch["id_b"],
            "jaccard": pa.array(jac),
        })
        return out.filter(pa.array(jac >= threshold))

    return j.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Near-dup clustering + canonical selection
# ---------------------------------------------------------------------------

def near_dup_clusters(pairs: ray.data.Dataset, id_a: str = "id_a",
                      id_b: str = "id_b", cc_mode: str = "auto",
                      labelprop_threshold: int = 5_000_000
                      ) -> ray.data.Dataset:
    """Near-dup pair edges -> (doc_id, cluster_id) for every doc that
    appears in a pair; cluster_id = MIN doc id reachable in the pair
    graph (deterministic canonical representative) — chains (a~b, b~c)
    collapse even when (a,c) was never emitted as a pair.

    cc_mode (same contract as polygonize): the CONTRACTED pair graph is
    usually tiny relative to the corpus, so below
    `labelprop_threshold` edges the components come from ONE Ray task's
    union-find over the edge block refs (never the driver); above it,
    the distributed min-label-propagation + pointer-jumping rounds
    (polygonize._cc_root_map) take over — each round is bounded-bucket
    groupbys, no single-node graph."""
    import ray as _ray

    def edges(batch: pa.Table) -> pa.Table:
        return pa.table({"la": batch[id_a], "lb": batch[id_b]})

    e = pairs.map_batches(edges, batch_format="pyarrow").materialize()
    if cc_mode == "labelprop" or (cc_mode == "auto"
                                  and e.count() > labelprop_threshold):
        from .polygonize import _cc_root_map

        m = _cc_root_map(e)

        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_id": batch["label"],
                             "cluster_id": batch["root"]})

        return m.map_batches(rename, batch_format="pyarrow")

    @_ray.remote
    def _uf_task(*blocks) -> pa.Table:
        parent: dict = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        nodes = set()
        for b in blocks:
            if len(b) == 0:
                continue
            la = b["la"].to_numpy(zero_copy_only=False)
            lb = b["lb"].to_numpy(zero_copy_only=False)
            for x, y in zip(la.tolist(), lb.tolist()):
                nodes.add(x)
                nodes.add(y)
                rx, ry = find(x), find(y)
                if rx != ry:
                    parent[max(rx, ry)] = min(rx, ry)
        ns = sorted(nodes)
        return pa.table({
            "doc_id": pa.array(ns, type=pa.int64()),
            "cluster_id": pa.array([find(n) for n in ns], type=pa.int64()),
        })

    ref = _uf_task.remote(*e.to_arrow_refs())
    return ray.data.from_arrow_refs([ref])


def near_dup_keep(ds: ray.data.Dataset, pairs: ray.data.Dataset,
                  id_col: str, id_a: str = "id_a",
                  id_b: str = "id_b") -> ray.data.Dataset:
    """Filter a corpus to near-dup cluster canonicals: drop every doc
    whose cluster has a smaller member id; docs in no pair pass through.

    The drop set (cluster members with cluster_id < doc_id) is usually a
    small fraction of the corpus, so the filter runs as the EXACT
    Bloom anti-join (bloom prefilter + verify) — the corpus side streams,
    only maybe-duplicate rows enter the verify join."""
    from .joins import bloom_semi_anti_join

    clusters = near_dup_clusters(pairs, id_a, id_b)

    def drops(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        c = batch["cluster_id"].to_numpy(zero_copy_only=False)
        return pa.table({"__drop_id": pa.array(d[c < d])})

    drop_ids = clusters.map_batches(drops, batch_format="pyarrow")
    return bloom_semi_anti_join(ds, drop_ids, id_col, "__drop_id", anti=True)
