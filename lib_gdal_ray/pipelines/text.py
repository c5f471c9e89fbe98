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
    in RE2-based SQL engines). Regex compiled once per actor."""

    def __init__(self, text_col):
        import re

        self.text_col = text_col
        self.pat = re.compile(BPE_ISH_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        counts = np.asarray([len(self.pat.findall(t)) for t in texts], dtype=np.int64)
        return batch.append_column("n_bpe_tokens", pa.array(counts))


def bpe_token_count(ds: ray.data.Dataset, text_col: str = "text",
                    concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(_BpeIshTokenizer, batch_format="pyarrow",
                          fn_constructor_args=(text_col,), concurrency=concurrency)


class _QualityScorer:
    """Quality heuristics: alpha ratio, digit ratio, mean token length,
    stopword ratio (en), uppercase ratio. Regexes compiled per actor."""

    def __init__(self, text_col):
        import re

        self.text_col = text_col
        self.word = re.compile(r"[A-Za-z]+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        txt = df[self.text_col]
        n = txt.str.len().clip(lower=1)
        df["alpha_ratio"] = txt.str.count(r"[A-Za-z]") / n
        df["digit_ratio"] = txt.str.count(r"[0-9]") / n
        df["space_ratio"] = txt.str.count(r" ") / n
        toks = txt.str.lower().str.findall(r"[a-z]+")
        df["mean_tok_len"] = toks.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        sw = _STOPWORDS["en"]
        df["stopword_ratio"] = toks.map(lambda ws: sum(w in sw for w in ws) / max(1, len(ws)))
        df["quality_score"] = (
            0.4 * df["alpha_ratio"].clip(0, 1)
            + 0.3 * df["stopword_ratio"].clip(0, 0.5) * 2
            + 0.3 * (1.0 - df["digit_ratio"].clip(0, 1))
        )
        return df


def quality_score(ds: ray.data.Dataset, text_col: str = "text",
                  concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(_QualityScorer, batch_format="pandas",
                          fn_constructor_args=(text_col,), concurrency=concurrency)


class _LangId:
    """Stopword-vote language ID over the 4 built-in profiles;
    'und' when no stopword hits."""

    def __init__(self, text_col):
        import re

        self.text_col = text_col
        self.tok = re.compile(r"[a-zà-ÿäöüß]+")
        self.langs = sorted(_STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df[self.text_col].str.lower().str.findall(self.tok)

        def vote(ws):
            best, best_n = "und", 0
            for lang in self.langs:
                nhits = sum(w in _STOPWORDS[lang] for w in ws)
                if nhits > best_n:
                    best, best_n = lang, nhits
            return best

        df["lang_pred"] = toks.map(vote)
        return df


def lang_id(ds: ray.data.Dataset, text_col: str = "text",
            concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(_LangId, batch_format="pandas",
                          fn_constructor_args=(text_col,), concurrency=concurrency)


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


class _NgramLangId:
    """Character-trigram cosine language ID (the 'n-gram heuristic' —
    Cavnar & Trenkle-style profiles, cosine instead of rank-distance).
    Profiles built once per actor."""

    def __init__(self, text_col, min_sim=0.05):
        self.text_col = text_col
        self.min_sim = min_sim
        self.profiles = {lang: _trigram_profile(t) for lang, t in _SEED_TEXT.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        def classify(t):
            p = _trigram_profile(t)
            best, best_s = "und", self.min_sim
            for lang, q in self.profiles.items():
                s = sum(v * q.get(k, 0.0) for k, v in p.items())
                if s > best_s:
                    best, best_s = lang, s
            return best

        df["lang_ngram"] = df[self.text_col].map(classify)
        return df


def lang_id_ngram(ds: ray.data.Dataset, text_col: str = "text",
                  concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(_NgramLangId, batch_format="pandas",
                          fn_constructor_args=(text_col,), concurrency=concurrency)


def fingerprint(ds: ray.data.Dataset, text_col: str = "text",
                window: int = 16) -> ray.data.Dataset:
    """Rolling polynomial hash fingerprint (winnowing-style min over
    windows, Schleimer et al. 2003): deterministic doc fingerprint."""
    B = np.uint64(1000003)
    MOD = np.uint64((1 << 61) - 1)

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
            if len(b) == 0:
                continue
            if len(b) < window:
                h = np.uint64(0)
                for c in b:
                    h = (h * B + c) % MOD
                out[i] = h
                continue
            # rolling hashes of all windows
            h = np.uint64(0)
            pw = np.uint64(1)
            for _ in range(window - 1):
                pw = (pw * B) % MOD
            hashes = np.empty(len(b) - window + 1, dtype=np.uint64)
            for j in range(window):
                h = (h * B + b[j]) % MOD
            hashes[0] = h
            for j in range(window, len(b)):
                h = ((h + MOD * B - (b[j - window] * pw) % MOD) * B + b[j]) % MOD
                hashes[j - window + 1] = h
            out[i] = hashes.min()
        return batch.append_column("fingerprint", pa.array(out))

    return ds.map_batches(fp, batch_format="pyarrow")
