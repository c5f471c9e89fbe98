"""Training-data quality ops: Gopher-style n-gram repetition statistics
and train/test n-gram decontamination.

Part of the LLM-data surface beyond the reference's operator set
(SURVEY §2 extension): the repetition filter follows the published
Gopher repetition rules (Rae et al. 2021, appendix A1.1 — fraction of
(duplicate | most-common) word n-grams) re-expressed as *integer-exact*
counts so a SQL oracle matches bit-for-bit; the decontamination pass is
the standard train-vs-test n-gram overlap check used before training.

Scale shape
-----------
Both ops are stateless ``map_batches`` over zero-copy Arrow batches.
All per-token work is vectorized: one concatenated byte buffer per
batch, a k-pass numpy polynomial hash over token bytes (k = longest
token), an (n-1)-pass combine for word n-grams, and per-doc reductions
via ``np.lexsort`` + ``np.{maximum,add}.reduceat`` — no per-row Python
in the hot path. The decontamination test-side n-gram set is collected
once (test sets are small by definition), deduplicated, sorted and
``ray.put`` — every worker binary-searches the broadcast array inside
``map_batches``; the train side never shuffles.

Tokens are split on single ASCII spaces (the documents-table contract;
mirrors SQL ``string_split(text, ' ')``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# Two independent 31-bit polynomial-hash lanes packed into one uint64
# (62-bit keys): within-doc collision odds ~(grams^2)/2^62, cross-set
# false-positive odds |test|*|train|/2^62 — negligible at any corpus
# size that fits a cluster.
_P1 = np.uint64(2147483647)   # 2^31-1 (Mersenne)
_P2 = np.uint64(2147483629)
_B1 = np.uint64(257)
_B2 = np.uint64(263)
_SP = np.uint64(31)


def _token_hashes(texts):
    """Two-lane token hashes for a batch of single-space-tokenized
    texts. Returns (h1, h2, tok_doc_counts): per-token uint64 lane
    hashes in document order and the per-doc token counts."""
    n_docs = len(texts)
    enc = [t.encode("utf-8", "ignore") + b" " for t in texts]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n_docs)
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    is_sp = buf == 32
    # token starts: non-space whose predecessor is a space (or buffer
    # start); every doc ends with the appended sentinel space, so every
    # token has a terminating space inside its own doc.
    prev_sp = np.empty(len(buf), dtype=bool)
    prev_sp[0] = True
    prev_sp[1:] = is_sp[:-1]
    starts = np.flatnonzero(~is_sp & prev_sp)
    sp_pos = np.flatnonzero(is_sp)
    ends = sp_pos[np.searchsorted(sp_pos, starts)]
    tlens = ends - starts
    doc_ends = np.cumsum(lens)
    tok_doc = np.searchsorted(doc_ends, starts, side="right")
    tok_doc_counts = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)
    b64 = buf.astype(np.uint64)
    h1 = np.zeros(len(starts), dtype=np.uint64)
    h2 = np.zeros(len(starts), dtype=np.uint64)
    for j in range(int(tlens.max()) if len(tlens) else 0):
        act = tlens > j
        ch = b64[starts[act] + j]
        h1[act] = (h1[act] * _B1 + ch) % _P1
        h2[act] = (h2[act] * _B2 + ch) % _P2
    return h1, h2, tok_doc_counts


def _gram_hashes(h1, h2, tok_doc_counts, n):
    """Packed 62-bit word n-gram hashes from token lane hashes.

    Returns (gram uint64, gram_doc_counts int64); grams stay in
    document order."""
    n_docs = len(tok_doc_counts)
    g_counts = np.maximum(tok_doc_counts - n + 1, 0)
    tok_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(tok_doc_counts[:-1], out=tok_starts[1:])
    g_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(g_counts[:-1], out=g_starts[1:])
    total = int(g_counts.sum())
    pos = np.arange(total, dtype=np.int64)
    pos += np.repeat(tok_starts - g_starts, g_counts)
    g1 = np.zeros(total, dtype=np.uint64)
    g2 = np.zeros(total, dtype=np.uint64)
    for j in range(n):
        # token-level hashes re-enter as "characters" of the gram; the
        # space separator keeps ("ab","c") != ("a","bc") distinct.
        g1 = (g1 * _B1 + _SP + h1[pos + j]) % _P1
        g2 = (g2 * _B2 + _SP + h2[pos + j]) % _P2
    return (g1 << np.uint64(31)) | g2, g_counts


def _per_doc_run_stats(gram, gram_doc_counts):
    """Per-doc (top_count, dup_count) over gram multiplicities.

    top_count = occurrences of the most frequent gram; dup_count =
    total occurrences of grams appearing more than once."""
    n_docs = len(gram_doc_counts)
    top = np.zeros(n_docs, dtype=np.int64)
    dup = np.zeros(n_docs, dtype=np.int64)
    if not len(gram):
        return top, dup
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), gram_doc_counts)
    order = np.lexsort((gram, doc_idx))
    gs, ds_ = gram[order], doc_idx[order]
    new = np.empty(len(gs), dtype=bool)
    new[0] = True
    new[1:] = (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])
    run_starts = np.flatnonzero(new)
    counts = np.diff(np.append(run_starts, len(gs)))
    run_doc = ds_[run_starts]
    doc_run_start = np.flatnonzero(
        np.r_[True, run_doc[1:] != run_doc[:-1]])
    present = run_doc[doc_run_start]
    top[present] = np.maximum.reduceat(counts, doc_run_start)
    dup[present] = np.add.reduceat(
        np.where(counts > 1, counts, 0), doc_run_start)
    return top, dup


class _RepetitionStage:
    """Per-batch Gopher repetition counts (integer-exact)."""

    def __init__(self, text_col, id_col, top_ns, dup_ns):
        self.text_col, self.id_col = text_col, id_col
        self.top_ns, self.dup_ns = top_ns, dup_ns

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        h1, h2, tok_counts = _token_hashes(texts)
        out = {self.id_col: batch[self.id_col],
               "n_tok": pa.array(tok_counts)}
        for n in sorted(set(self.top_ns) | set(self.dup_ns)):
            gram, gcounts = _gram_hashes(h1, h2, tok_counts, n)
            top, dup = _per_doc_run_stats(gram, gcounts)
            out[f"n{n}"] = pa.array(gcounts)
            if n in self.top_ns:
                out[f"top{n}_cnt"] = pa.array(top)
            if n in self.dup_ns:
                out[f"dup{n}_cnt"] = pa.array(dup)
        return pa.table(out)


def repetition_stats(ds: ray.data.Dataset, text_col: str = "text",
                     id_col: str = "doc_id",
                     top_ns=(2, 3), dup_ns=(5,)) -> ray.data.Dataset:
    """Gopher-style repetition statistics per document.

    Emits integer columns ``n_tok``, and per n: ``n{n}`` (total word
    n-grams), ``top{n}_cnt`` (occurrences of the most frequent n-gram,
    for n in ``top_ns``), ``dup{n}_cnt`` (occurrences of n-grams seen
    more than once, for n in ``dup_ns``), plus ``keep`` — 1 iff the doc
    passes the thresholds top2/n2 <= 0.20, top3/n3 <= 0.18,
    dup5/n5 <= 0.30 (Rae et al. 2021 A1.1), evaluated as exact integer
    cross-multiplications."""
    stage = _RepetitionStage(text_col, id_col, tuple(top_ns), tuple(dup_ns))

    def with_keep(batch: pa.Table) -> pa.Table:
        t = stage(batch)
        keep = np.ones(len(t), dtype=np.int64)
        checks = [("top2_cnt", "n2", 1, 5),    # 0.20
                  ("top3_cnt", "n3", 9, 50),   # 0.18
                  ("dup5_cnt", "n5", 3, 10)]   # 0.30
        for num, den, p, q in checks:
            if num in t.column_names:
                a = t[num].to_numpy(zero_copy_only=False)
                b = t[den].to_numpy(zero_copy_only=False)
                keep &= (a * q <= b * p).astype(np.int64)
        return t.append_column("keep", pa.array(keep))

    return ds.map_batches(with_keep, batch_format="pyarrow")


class _DecontaminateStage:
    """Membership of train-doc n-grams in the broadcast test-gram set
    (sorted uint64 array, binary search per batch)."""

    def __init__(self, wrapped, text_col, id_col, n):
        self.test = ray.get(wrapped["ref"])
        self.text_col, self.id_col, self.n = text_col, id_col, n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        h1, h2, tok_counts = _token_hashes(texts)
        gram, gcounts = _gram_hashes(h1, h2, tok_counts, self.n)
        if len(self.test):
            idx = np.searchsorted(self.test, gram)
            idx[idx >= len(self.test)] = 0
            hits = self.test[idx] == gram
        else:
            hits = np.zeros(len(gram), dtype=bool)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), gcounts)
        n_hit = np.bincount(doc_idx[hits], minlength=len(texts)
                            ).astype(np.int64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_hit": pa.array(n_hit),
            "contaminated": pa.array((n_hit > 0).astype(np.int64)),
        })


def _collect_test_grams(test_ds: ray.data.Dataset, text_col: str,
                        n: int) -> np.ndarray:
    """Distinct 62-bit n-gram hashes of the (small) test set: per-block
    dedup in parallel, tiny driver-side union."""

    def block_grams(batch: pa.Table) -> pa.Table:
        h1, h2, tok_counts = _token_hashes(batch[text_col].to_pylist())
        gram, _ = _gram_hashes(h1, h2, tok_counts, n)
        return pa.table({"g": pa.array(np.unique(gram))})

    rows = test_ds.map_batches(block_grams, batch_format="pyarrow"
                               ).take_all()
    if not rows:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.fromiter((r["g"] for r in rows), dtype=np.uint64,
                                 count=len(rows)))


def decontaminate(train_ds: ray.data.Dataset, test_ds: ray.data.Dataset,
                  n: int = 4, text_col: str = "text",
                  id_col: str = "doc_id",
                  concurrency: Optional[tuple] = None) -> ray.data.Dataset:
    """Flag training docs sharing any word ``n``-gram with the test set.

    The test side (small by definition) reduces to a sorted distinct
    62-bit gram-hash array broadcast once via ``ray.put``; train docs
    stream through a stateless vectorized membership stage — output is
    one row per train doc: ``(id_col, n_hit, contaminated)`` where
    ``n_hit`` counts contaminated gram *occurrences*."""
    from ..state.worker_cache import get_or_build

    test = _collect_test_grams(test_ds, text_col, n)
    ref = ray.put(test)
    key = ref.hex() + f":decon:{n}"

    def stage(batch: pa.Table) -> pa.Table:
        j = get_or_build(key, lambda: _DecontaminateStage(
            {"ref": ref}, text_col, id_col, n))
        return j(batch)

    kwargs = {}
    if concurrency:
        kwargs["concurrency"] = concurrency
    return train_ds.map_batches(stage, batch_format="pyarrow", **kwargs)
