"""Event-stream windowing: tumbling/sliding windows and sessionization.

The reference is one-shot batch with no window/watermark concepts
(SURVEY §2.9); these are the "streaming window" custom operators the
north rule's training-pipeline scope asks for, expressed keys-not-order:

* tumbling window = derived window-start column + grouped agg
  (`catalog.q_events_hourly_window`);
* sliding window = each event replicated to the size/slide windows
  containing it (`map_batches` explode, vectorized) + grouped agg —
  one narrow shuffle;
* sessionization = per-user gap splitting: `groupby(user)` then a
  vectorized sort/diff/cumsum inside the group (the classic 30-minute
  session rule).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def sliding_window_agg(events: ray.data.Dataset, ts_col: str, value_col: str,
                       size_s: int, slide_s: int,
                       shuffle_partitions: Optional[int] = None) -> ray.data.Dataset:
    """-> (window_start [timestamp us], n, sum_value_c) — every event
    contributes to ceil(size/slide) windows; value summed as exact
    integer cents."""
    if size_s % slide_s != 0:
        raise ValueError("size must be a multiple of slide")
    k = size_s // slide_s

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        tsec = ts.astype(np.int64) // 1_000_000
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        # latest window start containing t: floor(t/slide)*slide; then k-1 earlier
        base = (tsec // slide_s) * slide_s
        starts = np.concatenate([base - i * slide_s for i in range(k)])
        rep_cents = np.tile(cents, k)
        keep = starts >= 0
        t = pa.table({
            "window_start": pa.array((starts * 1_000_000).astype("datetime64[us]")),
            "c": pa.array(rep_cents),
            "one": pa.array(np.ones(len(starts), dtype=np.int64)),
        }).filter(pa.array(keep))
        out = t.group_by(["window_start"]).aggregate([("c", "sum"), ("one", "sum")])
        return out.rename_columns(["window_start", "c", "one"])

    partials = events.map_batches(explode, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    if shuffle_partitions:
        def combine(batch: pa.Table) -> pa.Table:
            out = batch.group_by(["window_start"]).aggregate([("c", "sum"), ("one", "sum")])
            return out.rename_columns(["window_start", "sum_value_c", "n"])

        return partials.repartition(1).map_batches(combine, batch_format="pyarrow",
                                                   batch_size=None)
    return partials.groupby("window_start").aggregate(
        Sum("c", alias_name="sum_value_c"), Sum("one", alias_name="n"))


def sessionize(events: ray.data.Dataset, user_col: str, ts_col: str,
               gap_s: int = 1800) -> ray.data.Dataset:
    """-> one row per session: (user, session_start, session_end,
    n_events). A new session starts when the gap since the previous
    event of the same user exceeds gap_s."""

    # 256 bounded groups (user-hash buckets), NOT one group per user —
    # a per-user map_groups costs ~1 ms/group and dies at millions of
    # users (NOTES lesson 2). All sessions of a user land in one bucket,
    # and the kernel sessionizes every user in the bucket in one
    # lexsort + run-length pass.
    def bucket(batch: pa.Table) -> pa.Table:
        u = batch[user_col].to_numpy(zero_copy_only=False)
        if u.dtype == object:
            # vectorized siphash (PYTHONHASHSEED-free, same in every worker)
            from .dedup import hash_object_u64

            h = (hash_object_u64(u) & np.uint64(0xFF)).astype(np.int32)
        else:
            h = ((u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                 >> np.uint64(56)).astype(np.int32)
        return batch.append_column("__g", pa.array(h))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = tbl[user_col].to_numpy(zero_copy_only=False)
        ts = tbl[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            new[1:] = (u[1:] != u[:-1]) | (np.diff(ts) > gap_s * 1_000_000)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u)) - 1
        return pa.table({
            user_col: pa.array(u[starts]),
            "session_start": pa.array(ts[starts].astype("datetime64[us]")),
            "session_end": pa.array(ts[ends].astype("datetime64[us]")),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
        })

    return (events.map_batches(bucket, batch_format="pyarrow")
            .groupby("__g").map_groups(per_bucket, batch_format="pyarrow"))


def _key_bucket(batch: pa.Table, key_col: str, n_buckets: int) -> pa.Table:
    u = batch[key_col].to_numpy(zero_copy_only=False)
    if u.dtype == object:
        from .dedup import hash_object_u64

        h = (hash_object_u64(u) % np.uint64(n_buckets)).astype(np.int32)
    else:
        h = ((u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             % np.uint64(n_buckets)).astype(np.int32)
    return batch.append_column("__g", pa.array(h))


def _auto_buckets(*dss: ray.data.Dataset, floor: int = 256,
                  target_rows: int = 2_000_000, cap: int = 1 << 16) -> int:
    """Bucket count sized to the INPUT, not the core count: the per-
    bucket kernels materialize one bucket per task, so a fixed 256-way
    hash bounds group COUNT but lets group SIZE grow with the data
    (~rows/256 per task = OOM at 100 TB). Derive n_buckets from the
    plan's metadata row count (free for parquet reads and materialized
    datasets; no execution is triggered) so per-task rows stay ~flat at
    ``target_rows``; fall back to ``floor`` when the plan can't say."""
    total, known = 0, False
    for d in dss:
        try:
            c = d._meta_count()
        except Exception:
            c = None
        if c is not None:
            total += int(c)
            known = True
    if not known:
        # No silent caps (SCALE.md): a post-shuffle upstream has no
        # metadata count, and a fixed floor re-acquires the
        # rows-grow-with-data problem at 100x scale. Say so.
        import logging

        logging.getLogger(__name__).warning(
            "_auto_buckets: no row-count metadata on any input; "
            "falling back to %d buckets — per-bucket rows grow with "
            "the data. Pass n_buckets= sized to rows/%d explicitly.",
            floor, target_rows)
        return floor
    return int(min(cap, max(floor, -(-total // target_rows))))


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key_col: str, ts_col: str,
              right_cols: Optional[list] = None,
              right_suffix: str = "_r",
              direction: str = "backward",
              n_buckets: Optional[int] = None) -> ray.data.Dataset:
    """As-of join: for each left row, attach the right row with the
    same key and the greatest right ts ≤ left ts (backward; "forward"
    = smallest right ts ≥ left ts). Unmatched left rows keep nulls in
    the right columns (LEFT ASOF JOIN semantics — DuckDB/Arrow's
    `ASOF LEFT JOIN`, pandas `merge_asof`).

    Distributed shape: both sides hash into ``n_buckets`` bounded
    key-hash buckets (all rows of a key co-locate; bounded group count,
    NOT per-key groups — NOTES lesson 2), one ``groupby(__g)`` shuffle
    over the union, and the per-bucket kernel is one vectorized
    ``pd.merge_asof(by=key)``. Only the named right columns ride the
    shuffle. Skewed keys: a single hot key is bounded by its bucket;
    salt on the ts range if one key outgrows a worker."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    if n_buckets is None:
        n_buckets = _auto_buckets(left, right)
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.schema().names if c not in (key_col, ts_col)]

    left_names = left.schema().names
    out_rnames = [(c + right_suffix if (c in left_names or c == ts_col)
                   else c) for c in [ts_col] + rcols]

    # union needs one schema: null-fill each side's missing columns
    rnames_in = [key_col, ts_col] + rcols

    def widen(batch: pa.Table, names, types) -> pa.Table:
        cols = {}
        n = len(batch)
        for name, typ in zip(names, types):
            if name in batch.column_names:
                cols[name] = batch[name]
            else:
                cols[name] = pa.nulls(n, type=typ)
        return pa.table(cols)

    lsch, rsch = left.schema(), right.schema()

    def t_of(name):
        if name in lsch.names:
            return lsch.types[lsch.names.index(name)]
        return rsch.types[rsch.names.index(name)]

    # combined schema: left columns, then right payload under __r_ tags
    comb_names = list(left_names) + ["__r_" + c for c in rnames_in]
    comb_types = ([t_of(c) for c in left_names]
                  + [rsch.types[rsch.names.index(c)] for c in rnames_in])

    def widen_left(batch: pa.Table) -> pa.Table:
        w = widen(batch, comb_names, comb_types)
        return _key_bucket(w, key_col, n_buckets).append_column(
            "__side", pa.array(np.ones(len(w), dtype=np.int8)))

    def widen_right(batch: pa.Table) -> pa.Table:
        t = batch.select(rnames_in)
        t = t.rename_columns(["__r_" + c for c in rnames_in])
        # key/ts must also sit in the shared key/ts slots for bucketing
        t = t.append_column(key_col, batch[key_col]).append_column(
            ts_col, batch[ts_col])
        w = widen(t, comb_names, comb_types)
        return _key_bucket(w, key_col, n_buckets).append_column(
            "__side", pa.array(np.zeros(len(w), dtype=np.int8)))

    lw = left.map_batches(widen_left, batch_format="pyarrow")
    rw = right.map_batches(widen_right, batch_format="pyarrow")
    both = lw.union(rw)

    # output schema with the TRUE input dtypes: left columns keep the
    # left schema (the widened union upcast ints to float64 — restore),
    # right payloads keep the right schema but nullable (LEFT join)
    out_schema = pa.schema(
        [(c, t_of(c)) for c in left_names]
        + [(o, rsch.types[rsch.names.index(c)])
           for c, o in zip([ts_col] + rcols, out_rnames)])

    def per_bucket(df: pd.DataFrame):
        lhs = df[df["__side"] == 1]
        rhs = df[df["__side"] == 0]
        lhs = lhs[list(left_names)].sort_values(ts_col, kind="stable")
        rcols_tagged = ["__r_" + c for c in rnames_in]
        rhs = rhs[rcols_tagged].rename(
            columns={"__r_" + key_col: key_col})
        if len(lhs) == 0:
            return out_schema.empty_table()
        # null-filled union slots widen ints to float in pandas; the
        # rhs rows themselves are dense, so cast join keys back to the
        # lhs dtypes for merge_asof
        rhs = rhs.astype({key_col: lhs[key_col].dtype,
                          "__r_" + ts_col: lhs[ts_col].dtype})
        rhs = rhs.sort_values("__r_" + ts_col, kind="stable")
        merged = pd.merge_asof(
            lhs, rhs, left_on=ts_col, right_on="__r_" + ts_col,
            by=key_col, direction=direction)
        ren = {"__r_" + c: o for c, o in zip([ts_col] + rcols,
                                             out_rnames)}
        merged = merged.rename(columns=ren)
        # emit Arrow with the input dtypes restored; unmatched right
        # payloads become real nulls (nullable int64, not float64 NaN)
        return pa.table(
            {f.name: pa.array(merged[f.name], type=f.type,
                              from_pandas=True)
             for f in out_schema})

    return both.groupby("__g").map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Partitioned window functions (row_number / cumulative sum / lag diff)
# ---------------------------------------------------------------------------

def _sorted_partitions(tbl: pa.Table, part_col: str, order_cols):
    """Sort a bucket's rows by (partition, order_cols...) and return
    (order_idx, starts, grp): the take-order, the sorted-row index where
    each partition begins, and each sorted row's partition ordinal."""
    part = tbl[part_col].to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(part)  # grouping only; partition order is free
    okeys = [tbl[c].to_numpy(zero_copy_only=False) for c in order_cols]
    # np.lexsort: LAST key is primary -> (order_n, ..., order_1, part)
    order = np.lexsort(tuple(reversed(okeys)) + (codes,))
    cs = codes[order]
    new = np.ones(len(cs), dtype=bool)
    if len(cs) > 1:
        new[1:] = cs[1:] != cs[:-1]
    starts = np.flatnonzero(new)
    grp = np.cumsum(new) - 1
    return order, starts, grp


def partitioned_window(ds: ray.data.Dataset, part_col: str, order_cols,
                       specs, keep=None,
                       n_buckets: Optional[int] = None) -> ray.data.Dataset:
    """SQL window functions over PARTITION BY part_col ORDER BY
    order_cols, keys-not-order (reference has no window functions;
    this is the training-pipeline surface the north rule asks for —
    per-document / per-user ordered derivations at corpus scale).

    ``specs`` is a list of dicts, each producing one int64 output column:
      {"name": n, "kind": "row_number"}
      {"name": n, "kind": "cum_sum", "col": c, "scale": 100}
          running fixed-point sum (floor(x*scale+0.5), summed as int64 —
          exact in any order; mirror the same floor in the SQL oracle)
      {"name": n, "kind": "lag_diff", "col": c, "fill": None}
          value - previous value within the partition (int64; timestamps
          diff in microseconds); NULL on each partition's first row, or
          ``fill`` if given (an int sentinel keeps the output column
          non-nullable — simpler to hash-compare).

    ``order_cols`` must be a total order within each partition (include a
    unique tiebreak column) or row_number/lag are nondeterministic.

    Distributed shape: one narrow shuffle into ``n_buckets`` bounded
    partition-hash buckets (all rows of a partition co-locate; bounded
    group count, NOT per-key groups — NOTES lesson 2); the per-bucket
    kernel is one lexsort + vectorized segment arithmetic for every
    partition in the bucket at once.
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    keep_cols = list(keep) if keep is not None else None
    if n_buckets is None:
        n_buckets = _auto_buckets(ds)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        kc = keep_cols if keep_cols is not None else [
            c for c in tbl.column_names if c != "__g"]
        if len(tbl) == 0:
            cols = {c: tbl[c] for c in kc}
            for s in specs:
                cols[s["name"]] = pa.array([], type=pa.int64())
            return pa.table(cols)
        order, starts, grp = _sorted_partitions(tbl, part_col, order_cols)
        idx = pa.array(order)
        out = {c: tbl[c].take(idx) for c in kc}
        n = len(order)
        pos_in_part = np.arange(n, dtype=np.int64) - starts[grp]
        for s in specs:
            kind = s["kind"]
            if kind == "row_number":
                out[s["name"]] = pa.array(pos_in_part + 1)
            elif kind == "cum_sum":
                v = tbl[s["col"]].to_numpy(zero_copy_only=False)[order]
                scale = s.get("scale")
                q = (np.floor(v * scale + 0.5).astype(np.int64) if scale
                     else v.astype(np.int64))
                cs = np.cumsum(q)
                base = cs[starts] - q[starts]
                out[s["name"]] = pa.array(cs - base[grp])
            elif kind == "lag_diff":
                v = tbl[s["col"]].to_numpy(zero_copy_only=False)
                if v.dtype.kind == "M":
                    v = v.astype("datetime64[us]").astype(np.int64)
                v = v.astype(np.int64)[order]
                d = np.zeros(n, dtype=np.int64)
                if n > 1:
                    d[1:] = v[1:] - v[:-1]
                first = np.zeros(n, dtype=bool)
                first[starts] = True
                fill = s.get("fill")
                if fill is not None:
                    d[first] = fill
                    out[s["name"]] = pa.array(d)
                else:
                    out[s["name"]] = pa.array(d, mask=first)
            else:
                raise ValueError(f"unknown window spec kind: {kind}")
        return pa.table(out)

    def bucket(batch: pa.Table) -> pa.Table:
        return _key_bucket(batch, part_col, n_buckets)

    return (ds.map_batches(bucket, batch_format="pyarrow")
            .groupby("__g").map_groups(per_bucket, batch_format="pyarrow"))


def grouped_topk(ds: ray.data.Dataset, part_col: str, order_col: str, k: int,
                 descending: bool = True, tiebreak: Optional[str] = None,
                 keep=None, n_buckets: Optional[int] = None) -> ray.data.Dataset:
    """Top-k rows PER KEY (SQL `QUALIFY row_number() OVER (PARTITION BY
    part ORDER BY order) <= k`), with the rank as an int64 ``rn`` column.

    Two stages, both vectorized:
    1. per-batch LOCAL prune — inside every input batch keep at most k
       rows per key (a batch can never contribute more than k survivors
       per key), so only ~k × keys_per_batch rows ride the shuffle;
    2. one bounded key-hash-bucket shuffle + the same kernel per bucket,
       now emitting the exact global rank.

    ``order_col`` must be numeric/temporal; ties break on ``tiebreak``
    ascending (include one unless (part, order) is already unique).
    """
    keep_cols = list(keep) if keep is not None else None
    # the shuffle must carry the sort columns even if the caller's
    # projection drops them; project down only in the final stage
    carry = None
    if keep_cols is not None:
        carry = list(dict.fromkeys(
            keep_cols + [part_col, order_col]
            + ([tiebreak] if tiebreak else [])))

    def prune(tbl: pa.Table, final: bool) -> pa.Table:
        kc = ((keep_cols if final else carry)
              if keep_cols is not None
              else [c for c in tbl.column_names if c != "__g"])
        if len(tbl) == 0:
            cols = {c: tbl[c] for c in kc}
            if final:
                cols["rn"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        v = tbl[order_col].to_numpy(zero_copy_only=False)
        if v.dtype.kind == "M":
            v = v.astype("datetime64[us]").astype(np.int64)
        key = -v if descending else v
        ocols = [key] if tiebreak is None else [
            key, tbl[tiebreak].to_numpy(zero_copy_only=False)]
        part = tbl[part_col].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(part)
        order = np.lexsort(tuple(reversed(ocols)) + (codes,))
        cs = codes[order]
        new = np.ones(len(cs), dtype=bool)
        if len(cs) > 1:
            new[1:] = cs[1:] != cs[:-1]
        starts = np.flatnonzero(new)
        grp = np.cumsum(new) - 1
        pos = np.arange(len(cs), dtype=np.int64) - starts[grp]
        sel = order[pos < k]
        out = {c: tbl[c].take(pa.array(sel)) for c in kc}
        if final:
            out["rn"] = pa.array(pos[pos < k] + 1)
        return pa.table(out)

    if n_buckets is None:
        n_buckets = _auto_buckets(ds)
    local = ds.map_batches(lambda t: prune(t, False), batch_format="pyarrow")
    bucketed = local.map_batches(
        lambda t: _key_bucket(t, part_col, n_buckets), batch_format="pyarrow")
    return bucketed.groupby("__g").map_groups(
        lambda t: prune(t, True), batch_format="pyarrow")
