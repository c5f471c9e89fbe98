"""Semi/anti joins with a Bloom prefilter, and interval (range) joins.

The reference expresses "rows with(out) a match" as nested OGR SQL /
attribute filters evaluated per feature (`ogr/swq_expr_node.cpp` IN /
EXISTS lowering is driver-side); at 100-TB scale the Ray-native shape
is a broadcast Bloom bitmap + exact verification of only the
maybe-matching residue:

* right side -> per-block partial Bloom bitmaps (vectorized splitmix64
  lanes), OR-reduced in two levels (bounded groups, then the <=32
  surviving bitmaps on the driver), broadcast once via ``ray.put``;
* left side -> one ``map_batches`` membership test. Bloom "no" is
  EXACT (no false negatives): anti-join keeps those rows immediately
  and semi-join drops them; only the maybe-rows (true matches + the
  ~0.1% false positives) go through an exact distributed hash join.
  The expensive all-to-all join therefore runs on a sliver of the
  input instead of the whole left table.

Interval join: each left "interval" row [t0, t1) matches right rows
with t0 <= ts < t1 (optionally also equal on a key). With an equi key
the two sides co-locate in bounded key-hash buckets (one narrow
shuffle) and the per-bucket kernel is one pandas merge + range filter;
without a key, intervals replicate to the fixed time bins they cover
and points land in exactly one bin, so every (interval, point) pair is
tested exactly once — no dedup pass needed.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dedup import _splitmix64


def _key_hash64(arr: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of a key column (int fast path;
    strings via vectorized siphash, then splitmix-finalized)."""
    if arr.dtype == object:
        from .dedup import hash_object_u64

        h = hash_object_u64(arr)
    else:
        h = arr.astype(np.uint64)
    return _splitmix64(h)


def _bloom_positions(h: np.ndarray, n_hashes: int, log2_bits: int):
    """(n, n_hashes) bit positions from one base hash per key
    (double hashing: pos_i = h1 + i*h2, the standard Kirsch-Mitzenmacher
    construction)."""
    h2 = _splitmix64(h ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    mask = np.uint64((1 << log2_bits) - 1)
    return (h[:, None] + i * h2[:, None]) & mask


def build_bloom(ds: ray.data.Dataset, key_col: str,
                log2_bits: int = 23, n_hashes: int = 4,
                reduce_groups: int = 32) -> np.ndarray:
    """Bloom bitmap (uint64 words) of every value in ds[key_col].

    Per-block partial bitmaps -> bounded-group OR -> driver OR of
    <= reduce_groups bitmaps. 2^23 bits = 1 MiB; at n keys the false-
    positive rate is (1-exp(-kn/m))^k (~0.2% at n=1M, m=8M, k=4) —
    size log2_bits to the expected distinct-key count.
    """
    words = 1 << (log2_bits - 6)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        bm = np.zeros(words, dtype=np.uint64)
        if len(keys):
            pos = _bloom_positions(_key_hash64(keys), n_hashes, log2_bits)
            flat = pos.ravel()
            np.bitwise_or.at(bm, flat >> np.uint64(6),
                             np.uint64(1) << (flat & np.uint64(63)))
        g = int(bm[0] % np.uint64(reduce_groups)) if len(keys) else 0
        return pa.table({"__g": pa.array([g], type=pa.int32()),
                         "bm": pa.array([bm.tobytes()], type=pa.binary())})

    def or_group(tbl: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for buf in tbl["bm"].to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint64)
        return pa.table({"bm": pa.array([acc.tobytes()], type=pa.binary())})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("__g").map_groups(or_group, batch_format="pyarrow"))
    acc = np.zeros(words, dtype=np.uint64)
    for row in parts.take_all():
        acc |= np.frombuffer(row["bm"], dtype=np.uint64)
    return acc


def _bloom_filter_fn(ref_wrap, key_col, n_hashes, log2_bits, keep_pass):
    """Task-pool membership test against the broadcast Bloom bitmap
    (fetched once per worker PROCESS via the worker cache — no actor
    cold-start, NOTES lesson 21). keep_pass=True keeps rows the filter
    says MAYBE match; False keeps rows it says definitely DON'T."""
    from ..state import worker_cache

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        bm = worker_cache.get_or_build(
            "bloom:" + ref_wrap["ref"].hex(),
            lambda: ray.get(ref_wrap["ref"]))
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        pos = _bloom_positions(_key_hash64(keys), n_hashes, log2_bits)
        bits = (bm[pos >> np.uint64(6)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        hit = bits.all(axis=1)
        return batch.filter(pa.array(hit if keep_pass else ~hit))

    return fn


def bloom_semi_anti_join(left: ray.data.Dataset, right: ray.data.Dataset,
                         left_on: str, right_on: Optional[str] = None,
                         anti: bool = False,
                         log2_bits: int = 23,
                         n_hashes: int = 4) -> ray.data.Dataset:
    """EXISTS / NOT EXISTS on an equi key, Bloom-accelerated but EXACT.

    semi (anti=False): left rows with >= 1 right match, left columns
    only, input multiplicity preserved. anti=True: rows with none.
    """
    right_on = right_on or left_on
    bm = build_bloom(right.select_columns([right_on]), right_on,
                     log2_bits=log2_bits, n_hashes=n_hashes)
    ref = {"ref": ray.put(bm)}

    maybe = left.map_batches(
        _bloom_filter_fn(ref, left_on, n_hashes, log2_bits, True),
        batch_format="pyarrow")

    # exact verify of the maybe-rows: co-partition maybe rows and
    # DISTINCT right keys into bounded key-hash buckets (one groupby;
    # per-bucket vectorized isin). Ray's native Dataset.join is avoided
    # on purpose: in 2.49.x it mis-schematizes empty Sort-derived
    # blocks ("No match for FieldRef" / missing columns at tiny inputs)
    # and its per-partition aggregator actors each pin a CPU.
    def _pa_type(t):
        # Ray Schema.types yields Python types for object-dtype columns
        if isinstance(t, pa.DataType):
            return t
        if t is str:
            return pa.string()
        if t is bytes:
            return pa.binary()
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()

    lschema = left.schema()
    left_names = list(lschema.names)
    ltypes = {n: _pa_type(t) for n, t in zip(lschema.names, lschema.types)}
    # The "maybe" residue entering the exact verify is all true matches
    # plus Bloom FPs — in a high-match-rate semi join that is nearly the
    # whole left side, so the bucket count must grow with the input
    # (a fixed 64 puts ~N/64 rows in each verify task).
    from .windows import _auto_buckets

    n_buckets = _auto_buckets(left, right, floor=64)

    def tag_left(batch: pa.Table) -> pa.Table:
        keys = batch[left_on].to_numpy(zero_copy_only=False)
        bb = (_key_hash64(keys) % np.uint64(n_buckets)).astype(np.int64)
        return (batch.append_column("__bb", pa.array(bb))
                     .append_column("__vside",
                                    pa.array(np.zeros(len(batch), np.int8))))

    def tag_right(batch: pa.Table) -> pa.Table:
        keys_arr = batch[right_on]
        keys = keys_arr.to_numpy(zero_copy_only=False)
        bb = (_key_hash64(keys) % np.uint64(n_buckets)).astype(np.int64)
        cols = {}
        for name in left_names:
            if name == left_on:
                cols[name] = keys_arr.cast(ltypes[left_on])
            else:
                cols[name] = pa.nulls(len(batch), ltypes[name])
        t = pa.table(cols)
        return (t.append_column("__bb", pa.array(bb))
                 .append_column("__vside",
                                pa.array(np.ones(len(batch), np.int8))))

    from .relational import distinct

    rkeys = distinct(right.select_columns([right_on]), right_on)
    both = maybe.map_batches(tag_left, batch_format="pyarrow").union(
        rkeys.map_batches(tag_right, batch_format="pyarrow"))

    def resolve(tbl: pa.Table) -> pa.Table:
        side = tbl["__vside"].to_numpy(zero_copy_only=False)
        lrows = tbl.filter(pa.array(side == 0))
        rk = tbl.filter(pa.array(side == 1))[left_on].to_numpy(
            zero_copy_only=False)
        lk = lrows[left_on].to_numpy(zero_copy_only=False)
        hit = np.isin(lk, rk)
        out = lrows.filter(pa.array(~hit if anti else hit))
        return out.select(left_names)

    verified = both.groupby("__bb").map_groups(resolve,
                                               batch_format="pyarrow")
    if anti:
        definite_no = left.map_batches(
            _bloom_filter_fn(ref, left_on, n_hashes, log2_bits, False),
            batch_format="pyarrow")
        return definite_no.union(verified)
    return verified


# ---------------------------------------------------------------------------
# Interval (range) join
# ---------------------------------------------------------------------------

def _to_us(arr: np.ndarray) -> np.ndarray:
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def interval_join(intervals: ray.data.Dataset, points: ray.data.Dataset,
                  t0_col: str, t1_col: str, ts_col: str,
                  key_col: Optional[str] = None,
                  interval_cols: Sequence[str] = (),
                  point_cols: Sequence[str] = (),
                  closed: str = "left",
                  n_buckets: Optional[int] = None,
                  bin_s: int = 3600) -> ray.data.Dataset:
    """Inner interval join: one output row per (interval, point) pair
    with t0 <= ts < t1 (closed='left'; 'open' = strict both ends,
    'both' = inclusive both ends) and, if key_col is given, equal keys.

    Output columns: interval_cols + point_cols (pre-renamed by the
    caller; names must not collide).

    Shapes: with key_col, both sides hash into bounded key buckets (one
    narrow shuffle; a per-key skew blows up only its own bucket's
    pandas merge — pre-aggregate or salt upstream if a single key's
    pair count is genuinely huge). Without key_col, each interval
    replicates to the ceil((t1-t0)/bin_s) time bins it covers and each
    point lands in exactly one bin, so pairs are tested exactly once;
    pick bin_s ~ the typical interval length to bound replication.
    """
    if closed not in ("left", "open", "both"):
        raise ValueError("closed must be left|open|both")
    if n_buckets is None:
        from .windows import _auto_buckets

        n_buckets = _auto_buckets(intervals, points)
    icols = list(interval_cols)
    pcols = list(point_cols)

    iv_carry = [t0_col, t1_col] + ([key_col] if key_col else []) + icols
    pt_carry = [ts_col] + ([key_col] if key_col else []) + pcols

    isch, psch = intervals.schema(), points.schema()

    def t_of(sch, name):
        return sch.types[sch.names.index(name)]

    comb = ([("__iv_" + c, t_of(isch, c)) for c in iv_carry]
            + [("__pt_" + c, t_of(psch, c)) for c in pt_carry])

    def widen(tbl: pa.Table, prefix, carry, side) -> pa.Table:
        n = len(tbl)
        cols = {}
        for name, typ in comb:
            src = name[len(prefix):] if name.startswith(prefix) else None
            if src is not None and src in carry:
                cols[name] = tbl[src]
            else:
                cols[name] = pa.nulls(n, type=typ)
        out = pa.table(cols)
        return out.append_column("__side",
                                 pa.array(np.full(n, side, np.int8)))

    def bucket_by_key(tbl: pa.Table, col: str) -> pa.Table:
        from .windows import _key_bucket

        t = tbl.append_column("__k", tbl[col])
        t = _key_bucket(t, "__k", n_buckets)
        return t.drop_columns(["__k"])

    if key_col is not None:
        ivw = intervals.map_batches(
            lambda t: bucket_by_key(widen(t, "__iv_", iv_carry, 0),
                                    "__iv_" + key_col),
            batch_format="pyarrow")
        ptw = points.map_batches(
            lambda t: bucket_by_key(widen(t, "__pt_", pt_carry, 1),
                                    "__pt_" + key_col),
            batch_format="pyarrow")
    else:
        bin_us = np.int64(bin_s) * 1_000_000

        def explode_iv(tbl: pa.Table) -> pa.Table:
            w = widen(tbl, "__iv_", iv_carry, 0)
            t0 = _to_us(tbl[t0_col].to_numpy(zero_copy_only=False))
            t1 = _to_us(tbl[t1_col].to_numpy(zero_copy_only=False))
            b0 = t0 // bin_us
            # last bin containing any point with ts < t1 (ts <= t1 for
            # 'both'): bins are [b*bin, (b+1)*bin)
            bend = (t1 if closed == "both" else t1 - 1) // bin_us
            nrep = np.maximum(bend - b0 + 1, 0).astype(np.int64)
            idx = np.repeat(np.arange(len(tbl), dtype=np.int64), nrep)
            offs = (np.arange(int(nrep.sum()), dtype=np.int64)
                    - np.repeat(np.cumsum(nrep) - nrep, nrep))
            bins = b0[idx] + offs
            out = w.take(pa.array(idx))
            return out.append_column(
                "__g", pa.array((bins % n_buckets).astype(np.int32))) \
                .append_column("__bin", pa.array(bins))

        def bin_pt(tbl: pa.Table) -> pa.Table:
            w = widen(tbl, "__pt_", pt_carry, 1)
            ts = _to_us(tbl[ts_col].to_numpy(zero_copy_only=False))
            bins = ts // bin_us
            return w.append_column(
                "__g", pa.array((bins % n_buckets).astype(np.int32))) \
                .append_column("__bin", pa.array(bins))

        ivw = intervals.map_batches(explode_iv, batch_format="pyarrow")
        ptw = points.map_batches(bin_pt, batch_format="pyarrow")

    both = ivw.union(ptw)
    out_names = icols + pcols
    # the null-filled union slots make pandas upcast int carry columns
    # to float64; restore the original input dtypes on the way out
    out_dtypes = {}
    for c in icols:
        out_dtypes[c] = np.dtype(t_of(isch, c).to_pandas_dtype())
    for c in pcols:
        out_dtypes[c] = np.dtype(t_of(psch, c).to_pandas_dtype())

    def _restore(df: pd.DataFrame) -> pd.DataFrame:
        for c, dt in out_dtypes.items():
            if df[c].dtype != dt:
                df[c] = df[c].astype(dt)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        iv = df[df["__side"] == 0]
        pt = df[df["__side"] == 1]
        if len(iv) == 0 or len(pt) == 0:
            return _restore(pd.DataFrame(
                {c: pd.Series(dtype=df["__iv_" + c].dtype
                              if c in icols else df["__pt_" + c].dtype)
                 for c in out_names}))
        if key_col is not None:
            iv = iv.copy()
            pt = pt.copy()
            iv["__j"] = iv["__iv_" + key_col]
            pt["__j"] = pt["__pt_" + key_col].astype(iv["__j"].dtype)
            m = iv.merge(pt, on="__j", suffixes=("", "_p"))
        else:
            m = iv.merge(pt, on="__bin", suffixes=("", "_p"))
        t0 = _to_us(m["__iv_" + t0_col].to_numpy())
        t1 = _to_us(m["__iv_" + t1_col].to_numpy())
        # widened-union slots may have upcast the point ts to float
        ts = m["__pt_" + ts_col + ("_p" if "__pt_" + ts_col + "_p"
                                   in m.columns else "")]
        ts = _to_us(ts.to_numpy())
        if closed == "left":
            keep = (ts >= t0) & (ts < t1)
        elif closed == "open":
            keep = (ts > t0) & (ts < t1)
        else:
            keep = (ts >= t0) & (ts <= t1)
        m = m[keep]
        out = {}
        for c in icols:
            out[c] = m["__iv_" + c].values
        for c in pcols:
            col = "__pt_" + c
            if col + "_p" in m.columns:
                col = col + "_p"
            out[c] = m[col].values
        return _restore(pd.DataFrame(out))

    return both.groupby("__g").map_groups(per_bucket, batch_format="pandas")
