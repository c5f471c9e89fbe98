"""Text-analysis stages for training-data pipelines: token counting,
quality scoring, language-ID heuristic, rolling-hash fingerprints.

All per-batch, vectorized where pandas/pyarrow kernels exist; regex
compiled once per actor (actor-pool stages). SQL-mirrorable metrics
(char/token counts) are exact; heuristics (langid, quality) are pinned
by pytest goldens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# language -> top stopwords (tiny deterministic n-gram-ish heuristic)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "una", "es"},
}


def token_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Add n_chars_calc, n_tokens (split-on-single-space semantics —
    exactly len(string_split(text, ' ')) in the SQL oracle)."""

    def stats(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        batch = batch.append_column("n_chars_calc", pc.utf8_length(txt))
        ntok = pc.list_value_length(pc.split_pattern(txt, " "))
        batch = batch.append_column("n_tokens", pc.cast(ntok, pa.int64()))
        return batch

    return ds.map_batches(stats, batch_format="pyarrow")


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


class _BpeIshTokenizer:
    """BPE-ish sub-word-run tokenizer: alphabetic runs, digit runs, and
    punctuation runs (the pre-tokenization split GPT-2-style BPE applies
    before merges, minus contractions/lookahead so the same pattern runs
    in RE2-based SQL engines). Fully vectorized: Arrow's RE2
    count_substring_regex counts the same non-overlapping matches as
    re.findall for this alternation-of-classes pattern (parity pinned in
    the SQL oracle)."""

    def __init__(self, text_col):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = pc.cast(pc.count_substring_regex(
            batch[self.text_col], BPE_ISH_PATTERN), pa.int64())
        return batch.append_column("n_bpe_tokens", counts)


def bpe_token_count(ds: ray.data.Dataset, text_col: str = "text",
                    concurrency=None) -> ray.data.Dataset:
    fn = _BpeIshTokenizer(text_col)
    return ds.map_batches(fn, batch_format="pyarrow")


_ACCENT_TOK = "[a-zà-ÿäöüß]+"


def _token_sep(lower_col, token_class: str):
    """Lowercased text -> ' tok1  tok2 ' with DOUBLE separators, so a
    plain substring count of ' word ' counts exact-token hits without
    the overlapping-match problem (Arrow RE2 has no lookarounds).
    Token equality semantics identical to findall(token_class)."""
    body = pc.replace_substring_regex(
        lower_col, pattern=_negate_class(token_class), replacement="  ")
    return pc.binary_join_element_wise(
        pa.array(np.full(len(body), " "), type=pa.string()), body,
        pa.array(np.full(len(body), " "), type=pa.string()), "")


def _negate_class(token_class: str) -> str:
    # "[abc]+" -> "[^abc]+"
    assert token_class.startswith("[") and token_class.endswith("]+")
    return "[^" + token_class[1:-2] + "]+"


def _count_token(sep_col, word: str):
    return pc.count_substring(sep_col, f" {word} ")


class _QualityScorer:
    """Quality heuristics: alpha ratio, digit ratio, mean token length,
    stopword ratio (en). Fully vectorized Arrow kernels — token hits via
    double-space normalization + substring counts (no per-row Python)."""

    def __init__(self, text_col):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch[self.text_col]
        n = pc.max_element_wise(pc.cast(pc.utf8_length(txt), pa.float64()),
                                pa.scalar(1.0))
        alpha = pc.cast(pc.count_substring_regex(txt, "[A-Za-z]"), pa.float64())
        digit = pc.cast(pc.count_substring_regex(txt, "[0-9]"), pa.float64())
        space = pc.cast(pc.count_substring(txt, " "), pa.float64())
        lower = pc.utf8_lower(txt)
        ntok = pc.cast(pc.count_substring_regex(lower, "[a-z]+"), pa.float64())
        ntok1 = pc.max_element_wise(ntok, pa.scalar(1.0))
        toklen = pc.cast(pc.count_substring_regex(lower, "[a-z]"), pa.float64())
        sep = _token_sep(lower, "[a-z]+")
        hits = None
        for w in _STOPWORDS["en"]:
            c = pc.cast(_count_token(sep, w), pa.float64())
            hits = c if hits is None else pc.add(hits, c)
        alpha_ratio = pc.divide(alpha, n)
        digit_ratio = pc.divide(digit, n)
        stop_ratio = pc.divide(hits, ntok1)
        mean_tok = pc.if_else(pc.greater(ntok, 0.0),
                              pc.divide(toklen, ntok1), pa.scalar(0.0))
        clip01 = lambda v: pc.min_element_wise(  # noqa: E731
            pc.max_element_wise(v, pa.scalar(0.0)), pa.scalar(1.0))
        quality = pc.add(
            pc.add(pc.multiply(pa.scalar(0.4), clip01(alpha_ratio)),
                   pc.multiply(pc.multiply(
                       pa.scalar(0.3), pc.min_element_wise(
                           pc.max_element_wise(stop_ratio, pa.scalar(0.0)),
                           pa.scalar(0.5))), pa.scalar(2.0))),
            pc.multiply(pa.scalar(0.3),
                        pc.subtract(pa.scalar(1.0), clip01(digit_ratio))))
        for name, col in (("alpha_ratio", alpha_ratio),
                          ("digit_ratio", digit_ratio),
                          ("space_ratio", pc.divide(space, n)),
                          ("mean_tok_len", mean_tok),
                          ("stopword_ratio", stop_ratio),
                          ("quality_score", quality)):
            batch = batch.append_column(name, col)
        return batch


def quality_score(ds: ray.data.Dataset, text_col: str = "text",
                  concurrency=None) -> ray.data.Dataset:
    """Stateless Arrow kernel -> plain task pool (actor pools only pay
    off when __init__ is expensive — NOTES perf lesson 5); concurrency
    kept for API compat, ignored."""
    fn = _QualityScorer(text_col)
    return ds.map_batches(fn, batch_format="pyarrow")


class _LangId:
    """Stopword-vote language ID over the 4 built-in profiles;
    'und' when no stopword hits. Vectorized: per-language hit counts via
    the same double-space token normalization, then an argmax cascade
    with first-in-sorted-order tie semantics (matching the original
    strict-> loop)."""

    def __init__(self, text_col):
        self.text_col = text_col
        self.langs = sorted(_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[self.text_col])
        sep = _token_sep(lower, _ACCENT_TOK)
        counts = {}
        for lang in self.langs:
            h = None
            for w in _STOPWORDS[lang]:
                c = _count_token(sep, w)
                h = c if h is None else pc.add(h, c)
            counts[lang] = pc.cast(h, pa.int64()).to_numpy(zero_copy_only=False)
        n = len(batch)
        pred = np.full(n, "und", dtype=object)
        best = np.zeros(n, dtype=np.int64)
        for lang in self.langs:
            m = counts[lang] > best
            pred[m] = lang
            best = np.maximum(best, counts[lang])
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def lang_id(ds: ray.data.Dataset, text_col: str = "text",
            concurrency=None) -> ray.data.Dataset:
    """Stateless Arrow kernel -> plain task pool (see quality_score)."""
    fn = _LangId(text_col)
    return ds.map_batches(fn, batch_format="pyarrow")


# seed corpora for character-trigram language profiles (public pangram /
# common-phrase snippets; enough signal for a 4-way vote)
_SEED_TEXT = {
    "en": "the quick brown fox jumps over the lazy dog and then it was the "
          "best of times it was the worst of times in the beginning there was",
    "de": "der schnelle braune fuchs springt über den faulen hund und es war "
          "einmal in einem land vor unserer zeit die wahrheit ist nicht immer schön",
    "fr": "le rapide renard brun saute par dessus le chien paresseux il était "
          "une fois dans un pays lointain la vérité nest pas toujours belle",
    "es": "el rápido zorro marrón salta sobre el perro perezoso érase una vez "
          "en un país muy lejano la verdad no siempre es hermosa",
}


def _trigram_profile(text: str):
    t = " " + "".join(c for c in text.lower() if c.isalpha() or c == " ") + " "
    prof = {}
    for i in range(len(t) - 2):
        g = t[i:i + 3]
        prof[g] = prof.get(g, 0) + 1
    norm = sum(v * v for v in prof.values()) ** 0.5 or 1.0
    return {k: v / norm for k, v in prof.items()}


_TRI_K = 27  # [a-z] + space
_TRI_V = _TRI_K ** 3


class _NgramLangId:
    """Character-trigram cosine language ID (the 'n-gram heuristic' —
    Cavnar & Trenkle-style profiles, cosine instead of rank-distance).

    Fully vectorized: the (n_langs, 27^3) profile-weight matrix is built
    once per worker; per batch, documents normalize to the [a-z ]
    alphabet with Arrow kernels, trigram ids come from one byte-code
    pass over a concatenated buffer, per-doc dot products are
    `np.add.reduceat` gathers of the weight row, and the doc norm is a
    run-length pass over the sorted (doc, trigram) keys — no per-row
    Python, no per-doc dicts. Docs normalize with '[^a-z ]' removal
    (the SQL oracle's rule; profile grams outside that alphabet can
    never match a normalized doc)."""

    def __init__(self, text_col, min_sim=0.05):
        self.text_col = text_col
        self.min_sim = min_sim
        self.langs = list(_SEED_TEXT)  # iteration order = tie priority
        W = np.zeros((len(self.langs), _TRI_V), dtype=np.float64)
        for li, lang in enumerate(self.langs):
            for g, w in _trigram_profile(_SEED_TEXT[lang]).items():
                ids = [26 if c == " " else (ord(c) - 97) for c in g]
                if any(i < 0 or i > 26 for i in ids):
                    continue  # accented seed grams: unreachable post-normalization
                W[li, (ids[0] * _TRI_K + ids[1]) * _TRI_K + ids[2]] = w
        self.W = W

    def __call__(self, batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch[self.text_col])
        body = pc.replace_substring_regex(lower, pattern="[^a-z ]", replacement="")
        n = len(batch)
        sp = pa.array(np.full(n, " "), type=pa.string())
        sep = pc.binary_join_element_wise(sp, body, sp, "")
        texts = sep.to_pylist() if isinstance(sep, pa.Array) else sep.combine_chunks().to_pylist()
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        arr = np.frombuffer("".join(texts).encode("ascii"), dtype=np.uint8)
        ids = np.where(arr == 32, np.uint8(26), arr - np.uint8(97)).astype(np.int64)
        keys_all = ((ids[:-2] * _TRI_K + ids[1:-1]) * _TRI_K + ids[2:]
                    if len(ids) >= 3 else np.empty(0, np.int64))
        n_tri = np.maximum(lens - 2, 0)
        starts = np.zeros(n, np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        t_starts = np.zeros(n, np.int64)
        np.cumsum(n_tri[:-1], out=t_starts[1:])
        pos = (np.arange(int(n_tri.sum()), dtype=np.int64)
               + np.repeat(starts - t_starts, n_tri))
        keys = keys_all[pos]
        nz = np.flatnonzero(n_tri > 0)
        dots = np.zeros((len(self.langs), n), dtype=np.float64)
        if len(nz) and len(keys):
            for li in range(len(self.langs)):
                dots[li, nz] = np.add.reduceat(self.W[li][keys], t_starts[nz])
        # ||doc||: run lengths over sorted (doc, trigram) keys
        sumsq = np.zeros(n, dtype=np.float64)
        if len(keys):
            combined = np.repeat(np.arange(n, dtype=np.int64), n_tri) * _TRI_V + keys
            sc = np.sort(combined)
            bound = np.concatenate(([0], np.flatnonzero(np.diff(sc) != 0) + 1))
            cnts = np.diff(np.concatenate((bound, [len(sc)]))).astype(np.float64)
            rdoc = sc[bound] // _TRI_V
            np.add.at(sumsq, rdoc, cnts * cnts)
        norm = np.sqrt(sumsq)
        pred = np.full(n, "und", dtype=object)
        best = np.full(n, self.min_sim, dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            for li, lang in enumerate(self.langs):
                s = np.where(norm > 0, dots[li] / norm, 0.0)
                pred[s > best] = lang
                best = np.maximum(best, s)
        return batch.append_column("lang_ngram", pa.array(pred, type=pa.string()))


def lang_id_ngram(ds: ray.data.Dataset, text_col: str = "text",
                  concurrency=None) -> ray.data.Dataset:
    """Profile matrix is tiny (4 x 27^3 doubles) — built once per worker
    process via the callable's lazy init, plain task pool."""
    fn = _NgramLangId(text_col)
    return ds.map_batches(fn, batch_format="pyarrow")


FP_BASE = 257
FP_MOD = (1 << 31) - 1  # Mersenne 2^31-1: h*B < 2^40 never wraps uint64


def fingerprint(ds: ray.data.Dataset, text_col: str = "text",
                window: int = 16) -> ray.data.Dataset:
    """Rolling polynomial hash fingerprint (winnowing-style min over
    windows, Schleimer et al. 2003): deterministic doc fingerprint.

    Arithmetic is exact mod 2^31-1 with base 257 (the round-1 constants
    B=1000003 mod 2^61-1 silently wrapped uint64 at h*B ~ 2^81 —
    deterministic but not the stated polynomial; the fixed math is
    SQL-mirrorable, see catalog sql_fingerprint)."""
    B = np.uint64(FP_BASE)
    MOD = np.uint64(FP_MOD)

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        enc = [t.encode("utf-8", "ignore") for t in texts]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n)
        # short docs (< window bytes): whole-doc polynomial, vectorized
        # per distinct length (≤ window-1 passes total)
        for L in np.unique(lens[(lens > 0) & (lens < window)]):
            idx = np.flatnonzero(lens == L)
            m = np.frombuffer(b"".join(enc[i] for i in idx), dtype=np.uint8)
            m = m.astype(np.uint64).reshape(len(idx), int(L))
            h = np.zeros(len(idx), dtype=np.uint64)
            for j in range(int(L)):
                h = (h * B + m[:, j]) % MOD
            out[idx] = h
        # long docs: every window hash from ONE concatenated buffer with
        # `window` vectorized passes (the per-window polynomial equals
        # the old rolling recurrence exactly — same residues mod 2^31-1),
        # then per-doc minima via np.minimum.reduceat.
        long_idx = np.flatnonzero(lens >= window)
        if len(long_idx):
            enc_l = [enc[i] for i in long_idx]
            lens_l = lens[long_idx]
            concat = np.frombuffer(b"".join(enc_l), dtype=np.uint8).astype(np.uint64)
            total = len(concat) - window + 1
            h = np.zeros(total, dtype=np.uint64)
            for j in range(window):
                h = (h * B + concat[j:j + total]) % MOD
            n_w = lens_l - window + 1
            starts = np.zeros(len(long_idx), np.int64)
            np.cumsum(lens_l[:-1], out=starts[1:])
            w_starts = np.zeros(len(long_idx), np.int64)
            np.cumsum(n_w[:-1], out=w_starts[1:])
            pos = (np.arange(int(n_w.sum()), dtype=np.int64)
                   + np.repeat(starts - w_starts, n_w))
            out[long_idx] = np.minimum.reduceat(h[pos], w_starts)
        return batch.append_column("fingerprint", pa.array(out))

    return ds.map_batches(fp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII redaction (training-data pipeline stage: C4/Dolma-style scrubbing)
# ---------------------------------------------------------------------------

# RE2 syntax — Arrow and DuckDB share RE2, so the SQL oracle applies the
# IDENTICAL patterns in the IDENTICAL order (substitution order matters:
# emails first so their digit runs can't be re-matched as phones).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}", "<PHONE>"),
]


def pii_scrub(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Redact emails / IPv4s / phone-shaped numbers, fully vectorized
    (Arrow RE2 kernels; zero Python per row). Adds per-doc match counts
    and replaces `text_col` with the scrubbed text."""

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        for name, pat, repl in PII_PATTERNS:
            n = pc.cast(pc.count_substring_regex(txt, pat), pa.int64())
            batch = batch.append_column(f"n_{name}", n)
            txt = pc.replace_substring_regex(txt, pat, repl)
        idx = batch.column_names.index(text_col)
        return batch.set_column(idx, text_col, txt)

    return ds.map_batches(scrub, batch_format="pyarrow")


def chunk_documents(ds: ray.data.Dataset, window: int, stride: int,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Token-window document chunking with overlap (the standard
    training-data prep step: W-token chunks every S tokens).

    Tokens are split-on-single-space (`string_split(text, ' ')`
    semantics, same contract as token_stats). A doc with n tokens
    emits chunks at starts 0, S, 2S, … while start < n; the last chunk
    may be shorter than W. Split semantics mean every doc has ≥1 token
    (the empty string is one empty token, exactly like DuckDB
    string_split), so every doc emits ≥1 chunk.

    Output rows: (id_col, chunk_id:int64, n_tokens:int64,
    chunk_text:string). Fully vectorized — ragged starts via
    repeat/arange index math, one pc.take gather of the flat token
    array per batch, list-join for the chunk text; no Python per row.
    Each batch chunks independently (embarrassingly parallel, no
    shuffle; a 100-TB corpus streams through map_batches)."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")

    def chunk(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values
        n = offs[1:] - offs[:-1]                     # tokens per doc
        n_chunks = np.where(n > 0, (np.maximum(n, 1) - 1) // stride + 1, 0)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "chunk_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        doc_idx = np.repeat(np.arange(len(n)), n_chunks)
        cum = np.zeros(len(n), np.int64)
        np.cumsum(n_chunks[:-1], out=cum[1:])
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(cum, n_chunks)
        start = chunk_id * stride
        clen = np.minimum(window, n[doc_idx] - start)
        # gather indices: doc token base + start + within-chunk arange
        coffs = np.zeros(total + 1, np.int64)
        np.cumsum(clen, out=coffs[1:])
        within = np.arange(int(coffs[-1]), dtype=np.int64) - np.repeat(coffs[:-1], clen)
        gather = offs[:-1][doc_idx].repeat(clen) + start.repeat(clen) + within
        taken = pc.take(flat, pa.array(gather))
        lst = pa.ListArray.from_arrays(pa.array(coffs, pa.int32()), taken)
        text = pc.binary_join(lst, " ")
        return pa.table({
            id_col: pc.take(batch[id_col], pa.array(doc_idx)),
            "chunk_id": pa.array(chunk_id),
            "n_tokens": pa.array(clen),
            "chunk_text": text,
        })

    return ds.map_batches(chunk, batch_format="pyarrow")


def tfidf_top_terms(ds: ray.data.Dataset, n_docs: int, k: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms (keyword extraction for corpus
    filtering/topic routing). score = tf * ln(N / df).

    Two-pass Ray shape:
      1. DF pass — per-batch (term, partial-df) from an in-batch Arrow
         group_by (docs never span batches, so batch-local distinct
         (doc, term) partials are exact), then one groupby(term) sum;
         the resulting vocabulary table broadcasts once via ray.put
         (vocab-bounded — for an open vocabulary swap the broadcast for
         a hash join on term).
      2. Score pass — per-batch term counts again, score against the
         broadcast DF dict, per-doc top-k by (score desc, term asc)
         with a vectorized lexsort.

    Scores ship as score_c = floor(score * 1e9 + 0.5) (SQL-mirrorable
    integers; rank ties impossible across distinct (tf, df) pairs after
    rounding because the tie-break includes the term)."""
    from ray.data.aggregate import Sum

    def term_counts(batch: pa.Table):
        toks = pc.split_pattern(batch[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        nper = offs[1:] - offs[:-1]
        ids = pc.take(batch[id_col], pa.array(np.repeat(np.arange(len(nper)), nper)))
        t = pa.table({id_col: ids, "term": toks.values})
        tf = t.group_by([id_col, "term"]).aggregate([([], "count_all")])
        return tf.rename_columns([id_col, "term", "tf"])

    def df_partial(batch: pa.Table) -> pa.Table:
        tf = term_counts(batch)
        df = tf.group_by(["term"]).aggregate([([], "count_all")])
        return df.rename_columns(["term", "df"])

    df_ds = (ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("df", alias_name="df")))
    df_tab = df_ds.to_arrow_refs()
    import ray as _ray

    tabs = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
            for t in _ray.get(df_tab)]
    vocab = pa.concat_tables([t for t in tabs if t.num_columns > 0])
    terms = np.asarray(vocab["term"].to_pylist(), dtype=object)
    dfs = vocab["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(terms, kind="stable")
    df_ref = _ray.put((terms[order], dfs[order]))

    def score(batch: pa.Table) -> pa.Table:
        from ..state.worker_cache import get_or_build

        vterms, vdfs = get_or_build("tfidf:" + df_ref.hex(),
                                    lambda: _ray.get(df_ref))
        tf = term_counts(batch)
        t_arr = np.asarray(tf["term"].to_pylist(), dtype=object)
        pos = np.searchsorted(vterms, t_arr)
        tfv = tf["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        sc = tfv * np.log(float(n_docs) / vdfs[pos])
        score_c = np.floor(sc * 1e9 + 0.5).astype(np.int64)
        ids = tf[id_col].to_numpy(zero_copy_only=False)
        # per-doc top-k: lexsort by (id, -score, term)
        o = np.lexsort((t_arr, -score_c, ids))
        ids_s = ids[o]
        starts = np.flatnonzero(np.concatenate(
            [[True], ids_s[1:] != ids_s[:-1]]))
        rank = np.arange(len(ids_s)) - np.repeat(
            starts, np.diff(np.append(starts, len(ids_s)))) + 1
        keep = o[rank <= k]
        return pa.table({
            id_col: pa.array(ids[keep]),
            "rank": pa.array(rank[rank <= k]),
            "term": pa.array(t_arr[keep].tolist(), type=pa.string()),
            "tf": pc.cast(tf["tf"].take(pa.array(keep)), pa.int64()),
            "df": pa.array(vdfs[pos[keep]].astype(np.int64)),
            "score_c": pa.array(score_c[keep]),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_top_terms_join(ds: ray.data.Dataset, n_docs: int, k: int = 3,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> ray.data.Dataset:
    """Open-vocabulary TF-IDF top-k: the 100-TB path when the term
    dictionary does NOT fit one broadcast object. Same math as
    tfidf_top_terms; the DF table stays distributed and joins back onto
    the per-doc term counts with a hash-partitioned join on `term`,
    then a per-doc groupby picks the top-k (one extra shuffle, zero
    driver-side vocabulary materialization)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .relational import bucket_lookup_join

    def term_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch[text_col], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        nper = offs[1:] - offs[:-1]
        ids = pc.take(batch[id_col], pa.array(np.repeat(np.arange(len(nper)), nper)))
        t = pa.table({id_col: ids, "term": toks.values})
        tf = t.group_by([id_col, "term"]).aggregate([([], "count_all")])
        return tf.rename_columns([id_col, "term", "tf"])

    tf_ds = ds.map_batches(term_counts, batch_format="pyarrow")

    def df_partial(batch: pa.Table) -> pa.Table:
        d = batch.group_by(["term"]).aggregate([([], "count_all")])
        return d.rename_columns(["term", "df"])

    df_ds = (tf_ds.map_batches(df_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("df", alias_name="df")))
    # unique-keyed lookup join (bb-bucket groupby; no native join)
    scored = bucket_lookup_join(tf_ds, df_ds, on="term", how="inner")

    def topk_per_doc(df: pd.DataFrame) -> pd.DataFrame:
        tfv = df["tf"].to_numpy().astype(np.float64)
        dfv = df["df"].to_numpy().astype(np.float64)
        score_c = np.floor(tfv * np.log(float(n_docs) / dfv) * 1e9
                           + 0.5).astype(np.int64)
        terms = df["term"].to_numpy()
        o = np.lexsort((terms, -score_c))[:k]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[o],
            "rank": np.arange(1, len(o) + 1),
            "term": terms[o],
            "tf": df["tf"].to_numpy()[o].astype(np.int64),
            "df": df["df"].to_numpy()[o].astype(np.int64),
            "score_c": score_c[o],
        })

    return scored.groupby(id_col).map_groups(topk_per_doc, batch_format="pandas")
