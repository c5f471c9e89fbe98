"""Sequence packing: documents → fixed-token-budget training sequences.

The standard LLM pre-training layout (GPT-style "concatenate and
chop"): documents are concatenated in a deterministic order and the
token stream is chopped into sequences of exactly ``seq_len`` tokens; a
document that straddles a boundary is split across consecutive
sequences. The operator emits, per document, its placement — shard,
global token offset, first/last sequence index and piece count — which
is everything a loader needs to assemble the actual sequences.

Distributed shape: packing is an ordered prefix-sum, so global greedy
packing is inherently serial. The scalable semantics (and what real
pipelines do) is per-shard packing: documents hash to ``n_shards``
independent streams (Knuth multiplicative hash on the id — identical
selection at any cluster shape), each shard packs its own documents in
id order, and sequence ids are shard-local. One ``groupby(shard)``
shuffle; the per-shard kernel is a vectorized cumsum. At 100 TB pick
``n_shards`` ≈ a few × cluster cores so a shard's (id, n_tokens) pairs
— NOT the text — fit a worker; the text column never rides the
shuffle.

No reference analog (beyond-GDAL training-data surface); token count
matches `text.token_stats` (whitespace split) so the two compose.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

KNUTH = 2654435761


def pack_sequences(docs: ray.data.Dataset, seq_len: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   tokens_col: Optional[str] = None,
                   n_shards: int = 64) -> ray.data.Dataset:
    """→ rows (id, shard, n_tokens, start_off, first_seq, last_seq,
    n_pieces). ``tokens_col`` skips the whitespace count when the token
    counts are precomputed."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")

    def count_and_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if tokens_col is not None:
            n_tok = batch[tokens_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            # len(text.split(' ')) == count(' ') + 1, the token_stats rule
            n_tok = pc.add(
                pc.count_substring(batch[text_col], " "), 1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
        shard = ((ids.astype(np.uint64) * np.uint64(KNUTH))
                 % np.uint64(1 << 32)) % np.uint64(n_shards)
        return pa.table({id_col: pa.array(ids),
                         "shard": pa.array(shard.astype(np.int64)),
                         "n_tokens": pa.array(n_tok)})

    narrow = docs.map_batches(count_and_shard, batch_format="pyarrow")

    def pack_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable").reset_index(drop=True)
        n_tok = df["n_tokens"].to_numpy(dtype=np.int64)
        end = np.cumsum(n_tok)
        start = end - n_tok
        first = start // seq_len
        last = (end - 1) // seq_len
        return pd.DataFrame({
            id_col: df[id_col], "shard": df["shard"],
            "n_tokens": n_tok, "start_off": start,
            "first_seq": first, "last_seq": last,
            "n_pieces": last - first + 1,
        })

    return narrow.groupby("shard").map_groups(pack_shard,
                                              batch_format="pandas")
