"""Deterministic corpus-sampling ops for training-data pipelines.

Two operators the reference has no direct analog for (its OGR SQL layer
stops at LIMIT / attribute filters; sampling at corpus scale is a
training-data concern):

- ``hash_sample`` — stable keyed downsampling: keep a row iff a
  multiplicative hash of its integer key lands under the cut. The same
  row set is selected on every run, on any cluster shape, with no
  shuffle and no RNG state — the standard way to cut a reproducible
  p%% slice of a 100-TB corpus (each task decides row-locally).
- ``per_group_quota`` — cap rows per group (e.g. max K docs per source
  domain): per-batch combiner prunes every batch to its local top-K
  per group *before* the groupby shuffle (same prune-then-shuffle shape
  as ``relational.topk``), so the exchange carries at most
  K x groups x blocks rows, not the corpus.

Both are exactly mirrorable in SQL (integer hash arithmetic /
row_number() windows), so they sit in the driver correctness gate.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# Knuth's 2^32 golden-ratio multiplier; the hash is (key * A) mod 2^32,
# uniform over residues for any key distribution without small-modulus
# structure (SQL mirror: (key * 2654435761) % 4294967296).
_HASH_A = np.uint64(2654435761)
_HASH_M = np.uint64(1) << np.uint64(32)


def hash_sample(ds: ray.data.Dataset, key_col: str,
                pct: int) -> ray.data.Dataset:
    """Keep rows whose hashed key falls in the lowest ``pct`` percent.

    Deterministic, shuffle-free, cluster-shape-independent: the keep
    decision is a pure function of the key, evaluated row-locally in a
    stateless ``map_batches`` stage."""
    if not 0 <= pct <= 100:
        raise ValueError("pct must be in [0, 100]")

    def stage(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (keys * _HASH_A) % _HASH_M
        return batch.filter(pa.array((h % np.uint64(100)) < pct))

    return ds.map_batches(stage, batch_format="pyarrow")


def _local_quota(batch: pa.Table, group_col: str, order_col: str,
                 k: int) -> pa.Table:
    """Per-batch top-k-per-group prune (ascending order_col)."""
    idx = pc.sort_indices(batch, sort_keys=[(group_col, "ascending"),
                                            (order_col, "ascending")])
    t = batch.take(idx)
    g = t[group_col].to_numpy(zero_copy_only=False)
    # rank within group over the sorted table: position - group start
    new = np.r_[True, g[1:] != g[:-1]]
    starts = np.flatnonzero(new)
    pos = np.arange(len(g), dtype=np.int64)
    rank = pos - np.repeat(starts, np.diff(np.append(starts, len(g))))
    return t.filter(pa.array(rank < k))


def per_group_quota(ds: ray.data.Dataset, group_col: str, order_col: str,
                    k: int) -> ray.data.Dataset:
    """Keep the ``k`` rows with the smallest ``order_col`` per group.

    Two-phase: a stateless in-batch combiner prunes each block to its
    local k-per-group before the hash-partitioned groupby, then a
    per-group kernel takes the global k. The shuffle therefore moves at
    most k rows per (group, block) — bounded regardless of corpus
    size. Groups themselves are assumed numerous-or-bounded either way;
    a single giant group still only ships k x blocks rows."""
    pruned = ds.map_batches(
        lambda b: _local_quota(b, group_col, order_col, k),
        batch_format="pyarrow")

    def take_k(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(order_col, "ascending")])
        return group.take(idx[:k])

    return pruned.groupby(group_col).map_groups(take_k,
                                                batch_format="pyarrow")


def token_budget_mix(ds: ray.data.Dataset, weights: dict,
                     total_tokens: int,
                     source_col: str = "source", id_col: str = "doc_id",
                     text_col: str = "text",
                     tokens_col: Optional[str] = None) -> ray.data.Dataset:
    """Corpus mixing by TOKEN budget: each source gets a cap of
    ``floor(weights[source] * total_tokens)`` tokens; its documents are
    taken in id order while the running token total stays within the
    cap (the doc that would cross it, and everything after, is
    dropped). Sources absent from ``weights`` are dropped entirely.

    → rows (id, source, n_tokens, cum_tokens) for the kept docs — the
    narrow placement table; join back by id for payloads. Shape: only
    (id, source, n_tokens) ride the ``groupby(source)`` shuffle (never
    text); the per-source kernel is a vectorized cumsum. A giant
    source gathers its narrow rows into one group — at 100 TB
    pre-prune with `hash_sample` or cap the id range when a single
    source's (id, count) pairs outgrow a worker."""
    caps = {s: int(np.floor(w * total_tokens)) for s, w in weights.items()}

    def count_tokens(batch: pa.Table) -> pa.Table:
        if tokens_col is not None:
            n_tok = pc.cast(batch[tokens_col], pa.int64())
        else:
            n_tok = pc.cast(pc.add(
                pc.count_substring(batch[text_col], " "), 1), pa.int64())
        t = pa.table({id_col: batch[id_col], source_col: batch[source_col],
                      "n_tokens": n_tok})
        return t.filter(pc.is_in(t[source_col],
                                 value_set=pa.array(list(caps))))

    narrow = ds.map_batches(count_tokens, batch_format="pyarrow")
    import pandas as pd

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable").reset_index(drop=True)
        cum = df["n_tokens"].to_numpy(dtype=np.int64).cumsum()
        cap = caps[df[source_col].iloc[0]]
        keep = cum <= cap
        out = df[keep].copy()
        out["cum_tokens"] = cum[keep]
        return out

    return narrow.groupby(source_col).map_groups(fill,
                                                 batch_format="pandas")
