"""Relational surface: grouped aggregation (partial+final), broadcast
hash join, distinct, top-k.

Semantics follow OGR SQL (`ogr/ogr_swq.h:357-385` summary state —
COUNT/SUM/MIN/MAX/AVG/STDDEV_POP/STDDEV_SAMP with float64 accumulators;
OGR keeps a Kahan-compensated sum, we keep float64 partials whose
per-batch tree reduction has equal-or-better error) and the OGR SQL
LEFT JOIN lookup-join cost model (`ogr_gensql.cpp:1325,1459` — the
secondary table is small/indexed, so a broadcast join matches it).

Scale notes: `grouped_agg` pre-aggregates **inside each map_batches
task** (pyarrow group_by partials), so the all-to-all `groupby` only
shuffles one row per (block × key) — the combiner pattern SURVEY.md §4
requires at 100 TB. The broadcast join ships the small side once via
``ray.put`` and joins per batch with pyarrow's hash join (zero shuffle).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

AggSpec = Tuple[str, Optional[str], str]  # (op, column|None, alias)

_PARTIAL_OPS = {"sum", "count", "min", "max", "mean", "std_pop", "std_samp"}


def grouped_agg(ds: ray.data.Dataset, keys: Union[str, Sequence[str]],
                specs: Sequence[AggSpec],
                round_to: Optional[int] = None,
                shuffle_partitions: Optional[int] = None) -> ray.data.Dataset:
    """Grouped aggregation with per-batch partials then one small shuffle.

    specs: (op, column, alias) with op in
    sum|count|min|max|mean|std_pop|std_samp. count ignores the column.
    shuffle_partitions: post-combiner shuffles are small — Ray's sort
    shuffle costs O(blocks × partitions) slices, so coalesce + bound
    the reduce fan-out when the key cardinality is modest.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for op, _, _ in specs:
        if op not in _PARTIAL_OPS:
            raise ValueError(f"unsupported agg op {op}")

    need_count = any(op in ("count", "mean", "std_pop", "std_samp") for op, _, _ in specs)
    sum_cols = sorted({c for op, c, _ in specs if op in ("sum", "mean", "std_pop", "std_samp")})
    ss_cols = sorted({c for op, c, _ in specs if op in ("std_pop", "std_samp")})
    min_cols = sorted({c for op, c, _ in specs if op == "min"})
    max_cols = sorted({c for op, c, _ in specs if op == "max"})

    def partial(batch: pa.Table) -> pa.Table:
        cols, aggs = {}, []
        for c in sum_cols:
            cols[f"__v_{c}"] = batch[c]
            aggs.append((f"__v_{c}", "sum"))
        for c in ss_cols:
            v = pc.cast(batch[c], pa.float64())
            cols[f"__q_{c}"] = pc.multiply(v, v)
            aggs.append((f"__q_{c}", "sum"))
        for c in min_cols:
            cols[f"__n_{c}"] = batch[c]
            aggs.append((f"__n_{c}", "min"))
        for c in max_cols:
            cols[f"__x_{c}"] = batch[c]
            aggs.append((f"__x_{c}", "max"))
        if need_count:
            cols["__c"] = pa.array(np.ones(len(batch), dtype=np.int64))
            aggs.append(("__c", "sum"))
        t = pa.table({**{k: batch[k] for k in keys}, **cols})
        out = t.group_by(keys).aggregate(aggs)
        return out

    partials = ds.map_batches(partial, batch_format="pyarrow")

    final_aggs = []
    for c in sum_cols:
        final_aggs.append(Sum(f"__v_{c}_sum", alias_name=f"__v_{c}"))
    for c in ss_cols:
        final_aggs.append(Sum(f"__q_{c}_sum", alias_name=f"__q_{c}"))
    for c in min_cols:
        final_aggs.append(Min(f"__n_{c}_min", alias_name=f"__n_{c}"))
    for c in max_cols:
        final_aggs.append(Max(f"__x_{c}_max", alias_name=f"__x_{c}"))
    if need_count:
        final_aggs.append(Sum("__c_sum", alias_name="__c"))

    if shuffle_partitions:
        # local tree combine: post-combiner partials are small — one
        # in-memory group_by beats the sort shuffle's O(blocks×parts)
        pa_aggs, out_names = [], list(keys)
        for c in sum_cols:
            pa_aggs.append((f"__v_{c}_sum", "sum")); out_names.append(f"__v_{c}")
        for c in ss_cols:
            pa_aggs.append((f"__q_{c}_sum", "sum")); out_names.append(f"__q_{c}")
        for c in min_cols:
            pa_aggs.append((f"__n_{c}_min", "min")); out_names.append(f"__n_{c}")
        for c in max_cols:
            pa_aggs.append((f"__x_{c}_max", "max")); out_names.append(f"__x_{c}")
        if need_count:
            pa_aggs.append(("__c_sum", "sum")); out_names.append("__c")

        def combine(batch: pa.Table) -> pa.Table:
            out = batch.group_by(keys).aggregate(pa_aggs)
            return out.rename_columns(out_names)

        merged = partials.repartition(1).map_batches(combine, batch_format="pyarrow",
                                                     batch_size=None)
    else:
        merged = partials.groupby(keys).aggregate(*final_aggs)

    def finalize(batch: pa.Table) -> pa.Table:
        out = {k: batch[k] for k in keys}
        n = batch["__c"].to_numpy(zero_copy_only=False).astype(np.float64) if need_count else None
        for op, c, alias in specs:
            if op == "sum":
                val = batch[f"__v_{c}"]
            elif op == "count":
                val = batch["__c"]
            elif op == "min":
                val = batch[f"__n_{c}"]
            elif op == "max":
                val = batch[f"__x_{c}"]
            else:
                s = batch[f"__v_{c}"].to_numpy(zero_copy_only=False).astype(np.float64)
                if op == "mean":
                    val = pa.array(s / n)
                else:
                    q = batch[f"__q_{c}"].to_numpy(zero_copy_only=False).astype(np.float64)
                    var = np.maximum(q / n - (s / n) ** 2, 0.0)
                    if op == "std_samp":
                        var = var * (n / np.maximum(n - 1.0, 1.0))
                    val = pa.array(np.sqrt(var))
            if round_to is not None and pa.types.is_floating(val.type):
                val = pc.round(val, ndigits=round_to)
            out[alias] = val
        return pa.table(out)

    return merged.map_batches(finalize, batch_format="pyarrow")


def global_agg(ds: ray.data.Dataset, specs: Sequence[AggSpec],
               round_to: Optional[int] = None) -> ray.data.Dataset:
    """Ungrouped aggregates (OGR SQL has no GROUP BY — this is its
    PrepareSummary, `ogr_gensql.cpp:852-1163`). Adds a constant key then
    drops it."""

    def add_key(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", pa.array(np.zeros(len(batch), dtype=np.int8)))

    out = grouped_agg(ds.map_batches(add_key, batch_format="pyarrow"), "__g", specs, round_to)
    return out.drop_columns(["__g"])


class _BroadcastJoiner:
    """Per-worker stage state: deserialize the broadcast right side once
    per worker process (via worker_cache), hash-join each batch against
    it (`__call__`)."""

    def __init__(self, wrapped_ref, left_on, right_on, how, drop_right):
        table = ray.get(wrapped_ref["ref"])
        self.right = table
        self.left_on = left_on
        self.right_on = right_on
        self.how = how
        self.drop_right = drop_right

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch.join(
            self.right,
            keys=self.left_on,
            right_keys=self.right_on,
            join_type=self.how,
        )
        if self.drop_right:
            out = out.drop_columns([c for c in self.drop_right if c in out.column_names])
        return out


def broadcast_hash_join(ds: ray.data.Dataset, right: pa.Table,
                        left_on: Union[str, List[str]],
                        right_on: Union[str, List[str], None] = None,
                        how: str = "inner",
                        concurrency: Union[int, Tuple[int, int]] = (1, 8),
                        drop_right: Optional[List[str]] = None) -> ray.data.Dataset:
    """Join a Dataset against a small in-memory table (dimension side).

    `right` is ray.put once; each worker process pulls it once (task
    pool + worker cache — no actor cold-start). No shuffle.
    """
    left_on = [left_on] if isinstance(left_on, str) else list(left_on)
    right_on = left_on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    ref = ray.put(right)
    key = ref.hex() + f":bjoin:{left_on}:{right_on}:{how}:{drop_right}"
    dr = drop_right or []

    def stage(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        j = get_or_build(key, lambda: _BroadcastJoiner(
            {"ref": ref}, left_on, right_on, how, dr))
        return j(batch)

    return ds.map_batches(stage, batch_format="pyarrow")


def union_all(datasets: Sequence[ray.data.Dataset],
              merge_schema: bool = True) -> ray.data.Dataset:
    """Multi-layer concat with schema merge — OGRUnionLayer semantics
    (`ogr/ogrsf_frmts/generic/ogrunionlayer.cpp`): the result schema is
    the field-order union; rows lacking a field carry null."""
    if not datasets:
        raise ValueError("union_all needs at least one dataset")
    if not merge_schema:
        out = datasets[0]
        for d in datasets[1:]:
            out = out.union(d)
        return out
    fields: List[Tuple[str, pa.DataType]] = []
    seen = {}
    for d in datasets:
        sch = d.schema()
        for name, typ in zip(sch.names, sch.types):
            if name not in seen:
                seen[name] = typ
                fields.append((name, typ))

    def conform(batch: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in fields:
            if name in batch.column_names:
                cols[name] = batch[name]
            else:
                cols[name] = pa.nulls(len(batch), type=typ)
        return pa.table(cols)

    out = datasets[0].map_batches(conform, batch_format="pyarrow")
    for d in datasets[1:]:
        out = out.union(d.map_batches(conform, batch_format="pyarrow"))
    return out


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: Union[str, Sequence[str]],
              right_on: Union[str, Sequence[str], None] = None,
              how: str = "inner",
              num_partitions: Optional[int] = None) -> ray.data.Dataset:
    """Big-big attribute equi-join (both sides distributed).

    Uses Ray's native hash-partitioned `Dataset.join` when available
    (2.46+); otherwise falls back to the portable explicit bucketed
    join (hash both sides to `num_partitions` buckets, tagged union,
    one `groupby(bucket)`, pandas merge per bucket). Broadcast the
    small side with `broadcast_hash_join` instead when it fits memory.
    """
    on = (on,) if isinstance(on, str) else tuple(on)
    r_on = on if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))
    if num_partitions is None:
        # Ray's hash join holds one CPU per partition-aggregator actor;
        # partitions >= cluster CPUs deadlocks against upstream maps
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(32, cpus // 2))
    if hasattr(left, "join"):
        return left.join(right, join_type=how, num_partitions=num_partitions,
                         on=on, right_on=r_on)

    # portable fallback: explicit partitioned hash join
    import pandas as pd

    def bucketed(side, keys):
        def fn(batch: pa.Table) -> pa.Table:
            h = np.zeros(len(batch), dtype=np.uint64)
            for k in keys:
                h ^= pc.cast(pc.if_else(pc.is_null(batch[k]), 0, batch[k]),
                             pa.uint64(), safe=False).to_numpy(zero_copy_only=False)
            b = (h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 8)
            batch = batch.append_column("__bkt", pa.array((b % num_partitions).astype(np.int32)))
            return batch.append_column("__side", pa.array(np.full(len(batch), side, np.int8)))
        return fn

    both = left.map_batches(bucketed(0, on), batch_format="pyarrow").union(
        right.map_batches(bucketed(1, r_on), batch_format="pyarrow"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0].drop(columns=["__bkt", "__side"])
        r = df[df["__side"] == 1].drop(columns=["__bkt", "__side"])
        return l.merge(r, left_on=list(on), right_on=list(r_on), how=how)

    return both.groupby("__bkt").map_groups(merge, batch_format="pandas")


def bucket_lookup_join(left: ray.data.Dataset, right: ray.data.Dataset,
                       on: str, right_on: Optional[str] = None,
                       how: str = "left",
                       n_buckets: int = 64) -> ray.data.Dataset:
    """Distributed left/inner equi-join against a UNIQUE-keyed right
    side, as ONE bounded-bucket groupby (tagged union + per-bucket
    vectorized searchsorted gather) — no native Dataset.join (Ray 2.49
    mis-schematizes empty Sort-derived blocks, and its per-partition
    aggregator actors each pin a CPU; NOTES lesson W). Right value
    columns append to the left schema; `how='left'` nulls them on miss,
    `'inner'` drops missing rows. Right keys MUST be unique (lookup
    semantics — duplicate right keys keep an arbitrary one)."""
    right_on = right_on or on
    lschema, rschema = left.schema(), right.schema()
    lnames = list(lschema.names)
    rval_names = [n for n in rschema.names if n != right_on]
    if set(rval_names) & set(lnames):
        raise ValueError("right value columns collide with left schema")

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

    ltypes = {n: _pa_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(rschema.names, rschema.types)}
    C = np.uint64(0x9E3779B97F4A7C15)

    def _bb(keys: np.ndarray) -> pa.Array:
        if keys.dtype == object:
            from .dedup import hash_object_u64

            h = hash_object_u64(keys)
        else:
            h = keys.astype(np.uint64)
        return pa.array((((h * C) >> np.uint64(40))
                         % np.uint64(n_buckets)).astype(np.int64))

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[on].to_numpy(zero_copy_only=False)
        cols = {name: batch[name] for name in lnames}
        for c in rval_names:
            cols[c] = pa.nulls(len(batch), rtypes[c])
        cols["__bb"] = _bb(k)
        cols["__ljside"] = pa.array(np.zeros(len(batch), np.int8))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[right_on].to_numpy(zero_copy_only=False)
        cols = {}
        for name in lnames:
            if name == on:
                cols[name] = batch[right_on].cast(ltypes[on])
            else:
                cols[name] = pa.nulls(len(batch), ltypes[name])
        for c in rval_names:
            cols[c] = batch[c]
        cols["__bb"] = _bb(k)
        cols["__ljside"] = pa.array(np.ones(len(batch), np.int8))
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def resolve(tbl: pa.Table) -> pa.Table:
        side = tbl["__ljside"].to_numpy(zero_copy_only=False)
        lrows = tbl.filter(pa.array(side == 0))
        rrows = tbl.filter(pa.array(side == 1))
        lk = lrows[on].to_numpy(zero_copy_only=False)
        rk = rrows[on].to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rk = rk[order]
        if len(rk):
            idx = np.clip(np.searchsorted(rk, lk), 0, len(rk) - 1)
            hit = rk[idx] == lk
            gather = order[idx]
        else:
            hit = np.zeros(len(lk), dtype=bool)
            gather = np.zeros(len(lk), dtype=np.int64)
        out = lrows.select(lnames)
        take_idx = pa.array(gather, mask=~hit)
        for c in rval_names:
            if len(rk):
                col = rrows[c].combine_chunks().take(take_idx)
            else:
                col = pa.nulls(len(lk), rtypes[c])
            out = out.append_column(c, col)
        if how == "inner":
            out = out.filter(pa.array(hit))
        return out

    return both.groupby("__bb").map_groups(resolve, batch_format="pyarrow")


def distinct(ds: ray.data.Dataset, cols: Union[str, Sequence[str]]) -> ray.data.Dataset:
    """SELECT DISTINCT — per-batch dedup partial, then hash-partition
    groupby (reference: ordered std::set distinct,
    `ogr_gensql.cpp:1972-1995`; ours is the scalable hash flavor)."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def local(batch: pa.Table) -> pa.Table:
        return pa.table({c: batch[c] for c in cols}).group_by(cols).aggregate([])

    from ray.data.aggregate import Count

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )


def select(ds: ray.data.Dataset, columns: Optional[List[str]] = None,
           where: Optional[str] = None,
           order_by: Optional[List[Tuple[str, bool]]] = None,
           limit: Optional[int] = None) -> ray.data.Dataset:
    """ExecuteSQL-lite: WHERE (OGR SQL expression, functions/swq.py) →
    projection → ORDER BY [(col, descending)] → LIMIT. The pull-based
    OGRGenSQLResultsLayer plan (`ogr/ogrsf_frmts/generic/ogr_gensql.cpp`)
    re-expressed as a Dataset chain."""
    if where:
        from ..functions.swq import attribute_filter

        ds = attribute_filter(ds, where)
    if columns:
        ds = ds.select_columns(columns)
    if order_by:
        keys = [c for c, _ in order_by]
        desc = [d for _, d in order_by]
        if limit is not None:
            return topk(ds, keys, limit, descending=desc)
        ds = ds.sort(keys, descending=desc)
    if limit is not None:
        ds = ds.limit(limit)
    return ds


def topk(ds: ray.data.Dataset, key: Union[str, List[str]], k: int,
         descending: Union[bool, List[bool]] = True) -> ray.data.Dataset:
    """ORDER BY … LIMIT k (`ogr_gensql.cpp:2193-2436` materializes the
    whole sort index; ours per-block prunes to k before the range sort).

    key/descending may be lists for multi-key ordering (tie-breaks)."""
    keys = [key] if isinstance(key, str) else list(key)
    desc = [descending] * len(keys) if isinstance(descending, bool) else list(descending)

    def local_prune(batch: pa.Table) -> pa.Table:
        order = [(c, "descending" if d else "ascending") for c, d in zip(keys, desc)]
        idx = pc.sort_indices(batch, sort_keys=order)
        return batch.take(idx[:k])

    pruned = ds.map_batches(local_prune, batch_format="pyarrow")
    return pruned.sort(keys, descending=desc).limit(k)
