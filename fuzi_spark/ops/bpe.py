"""Byte-pair-encoding tokenizer training at corpus scale.

The standard industrial recipe (fastBPE, HuggingFace tokenizers,
SentencePiece's BPE mode) never iterates the corpus per merge: it first
reduces the corpus to a WORD-COUNT table, then learns merges over that
weighted vocabulary. That split maps perfectly onto Spark:

1. corpus pass: ONE map-side-combinable (word, count) aggregation —
   the same shuffle shape (and the same tokenization contract:
   lowercase, split \\s+, drop empty) as ops/textstats.vocab_table, so
   10^12·L token occurrences reduce to partial pairs per task before
   moving;
2. merge learning: classic BPE over the collected word-count table —
   driver-side on purpose. Word vocabularies are metadata-sized
   (10^5-10^8 unique words under any min_count at web scale is still
   megabytes next to the corpus), the same guarded bounded-collect
   contract as textstats.encode_documents; each merge step touches
   only words containing the merged pair (an inverted pair→words index
   keeps steps near O(affected));
3. apply: Arrow-batched pandas UDF encoding documents with the learned
   ranks, memoizing per-word encodings per batch (Zipf makes the memo
   hit rate ~word-frequency mass) — zero corpus shuffles, narrow map.

Determinism contract (pinned by tests and the SQL oracle): merge
selection is (max weighted count, then lexicographically smallest
(left, right) pair); application merges the lowest-rank adjacent pair
repeatedly, all occurrences left-to-right per step. End-of-word is the
explicit `</w>` symbol.

Reference parity note: the reference (kylehughes/Fuzi) has no
tokenizer surface — this is pipeline-brief scope (training-data
preparation for LLM corpora).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, n:long) — the corpus reduction BPE trains on. Same
    tokenization as vocab_table (lowercase, \\s+ split, drop empty)."""
    toks = df.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def learn_bpe(counts: dict, n_merges: int) -> list:
    """Classic weighted BPE over a word→count dict. Returns the merge
    list [(left, right), ...] in rank order. Deterministic: the merged
    pair is (max count, then lexicographically smallest pair)."""
    vocab = {}
    for w, c in counts.items():
        vocab[tuple(w) + (END,)] = vocab.get(tuple(w) + (END,), 0) + c
    # pair counts + inverted index pair -> words containing it
    pair_n: dict = {}
    where: dict = {}
    for sym, c in vocab.items():
        for p in zip(sym, sym[1:]):
            pair_n[p] = pair_n.get(p, 0) + c
            where.setdefault(p, set()).add(sym)
    merges = []
    for _ in range(n_merges):
        pair_n = {p: n for p, n in pair_n.items() if n > 0}
        if not pair_n:
            break
        maxn = max(pair_n.values())
        best = min(p for p, n in pair_n.items() if n == maxn)
        merges.append(best)
        a, b = best
        ab = a + b
        # rebuild only the words that contain the merged pair
        for sym in list(where.get(best, ())):
            c = vocab.pop(sym, None)
            if c is None:
                continue
            for p in zip(sym, sym[1:]):
                pair_n[p] = pair_n.get(p, 0) - c
                s = where.get(p)
                if s is not None:
                    s.discard(sym)
            out = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == a
                    and sym[i + 1] == b
                ):
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new = tuple(out)
            vocab[new] = vocab.get(new, 0) + c
            for p in zip(new, new[1:]):
                pair_n[p] = pair_n.get(p, 0) + c
                where.setdefault(p, set()).add(new)
    return merges


def apply_bpe(word: str, ranks: dict) -> list:
    """Encode one word with learned merge ranks: repeatedly merge the
    lowest-rank adjacent pair (all occurrences, left-to-right)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_pair = None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        out = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1000,
    min_count: int = 1,
    max_vocab_rows: int = 2_000_000,
    top_n: int | None = None,
) -> list:
    """Corpus pass + merge learning. Returns the rank-ordered merge
    list.

    The word-count collect is metadata-sized for natural language
    (10^5–10^8 unique words), but a noisy web corpus (URLs, hashes,
    code tokens under \\s+ splitting) can blow past that — so the
    collect is FAIL-FAST bounded, mirroring margin_bitext's
    max_tgt_rows contract (ops/similarity.py): more than
    `max_vocab_rows` surviving words raises ValueError instead of
    OOM-ing the driver. Set `top_n` to instead keep the N most
    frequent words (deterministic tie-break on word; distributed
    TakeOrdered, no global sort) — the industrial choice for dirty
    corpora, since BPE merge statistics are dominated by the head of
    the frequency distribution anyway."""
    wc = word_counts(df, text_col, min_count)
    if top_n is not None:
        rows = (
            wc.orderBy(F.col("n").desc(), F.col("word"))
            .limit(int(top_n))
            .collect()
        )
    else:
        rows = wc.limit(max_vocab_rows + 1).collect()
        if len(rows) > max_vocab_rows:
            raise ValueError(
                "train_bpe: surviving vocabulary exceeds "
                f"max_vocab_rows={max_vocab_rows}; raise min_count, "
                "pass top_n= to keep the frequency head, or raise "
                "the cap explicitly"
            )
    return learn_bpe({r["word"]: r["n"] for r in rows}, n_merges)


def bpe_encode(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned merges: (id_col, tokens:array<string>,
    n_tokens:long). Arrow-batched; per-word memo per batch; merge
    ranks ride the closure (metadata-sized). Zero corpus shuffles."""
    from pyspark.sql.pandas.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def _udf(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list = []
            for w in t.lower().split():
                enc = memo.get(w)
                if enc is None:
                    enc = apply_bpe(w, ranks)
                    memo[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    tokens = _udf(F.col(text_col))
    return df.select(
        F.col(id_col),
        tokens.alias("tokens"),
        F.size(tokens).cast("long").alias("n_tokens"),
    )
