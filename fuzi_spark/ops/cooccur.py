"""Frequent token co-occurrence mining (a-priori pruned pair counting).

The corpus-analysis staple behind topic signatures, collocation-aware
dedup keys, and boilerplate phrase discovery: which token PAIRS appear
together in many documents? Naive pair generation is quadratic in
per-doc vocabulary and drowns in stopwords; at 10^12 docs the two
classic prunes are not optional:

1. **A-priori item prune** (Agrawal & Srikant 1994): a pair can only
   be frequent if BOTH items are — so items are df-filtered FIRST and
   the pair join runs over the surviving (doc, item) rows only.
2. **Upper df band**: tokens in more than `max_df_frac` of docs
   (stopwords, template chrome) pair with everything and say nothing;
   dropping them cuts the pair space by orders of magnitude and is
   standard collocation practice.

Spark shape:
- tokenize once, explode per-doc DISTINCT tokens (presence, not
  frequency — document co-occurrence semantics), one groupBy(token)
  for df with map-side partials;
- the df-band item table is dimension-sized → broadcast semi-joined
  back onto the exploded rows;
- pair generation is ONE self-equi-join on doc_id with t1 < t2 (the
  canonical-order dedup), keyed shuffle on doc_id, then a pair-keyed
  count with map-side partials.
- per-doc frequent-token counts bound the join fan-out: fan-out per
  doc is C(f_d, 2) with f_d already df-banded; the doc_id join key is
  the same-size shuffle the extraction pipeline already pays.

Determinism: tokenization is a regex, df thresholds are integers,
dice = 2n/(df1+df2) is a single IEEE division — the DuckDB oracle
replays the identical dataflow hash-exact.

Driver traffic: ONE scalar count() of non-null-text docs resolves the
fractional upper band to an absolute df — a column-pruned scan, the
same metadata-query class as the IVF probe contract. Callers that
already know the corpus size can avoid it by passing max_df_frac
against a pre-computed total (wire a literal instead).

Reference parity note: no counterpart in the reference (Fuzi is a
parse/query library) — pipeline-brief scope (corpus statistics),
same bucket as ops/colloc.py (adjacent-bigram PMI; this module mines
UNORDERED document-level co-occurrence, a different signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z]{3,}"


def doc_tokens(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, token) rows — per-doc DISTINCT lowercase alpha tokens
    (length >= 3; presence semantics)."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(
                        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        F.lit(TOKEN_RE),
                        F.lit(0),
                    )
                )
            ).alias("token"),
        )
    )


def frequent_pairs(
    df: DataFrame,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    min_pair_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-level frequent pair mining. Returns
    (t1, t2, n_docs, df1, df2, dice) for token pairs co-occurring in
    >= min_pair_df documents, items pre-filtered to the
    [min_df, max_df_frac * n_docs] df band. t1 < t2 canonical order.
    """
    toks = doc_tokens(df, text_col, id_col)
    n_docs_total = df.filter(F.col(text_col).isNotNull()).count()
    max_df = int(max_df_frac * n_docs_total)
    items = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    kept = toks.join(F.broadcast(items), "token")
    left = kept.select(
        "doc_id", F.col("token").alias("t1"), F.col("df").alias("df1")
    )
    right = kept.select(
        "doc_id", F.col("token").alias("t2"), F.col("df").alias("df2")
    )
    pairs = (
        left.join(right, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_pair_df)
    )
    return pairs.select(
        "t1",
        "t2",
        "n_docs",
        "df1",
        "df2",
        (
            F.lit(2.0)
            * F.col("n_docs").cast("double")
            / (F.col("df1") + F.col("df2")).cast("double")
        ).alias("dice"),
    )


def skipgram_pairs(
    df: DataFrame,
    window: int = 2,
    min_count: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Skip-gram (center, context) pair counts — the training-pair
    extraction for word2vec/fastText-style embedding pretraining
    (Mikolov et al. 2013): every ordered token pair at distance
    1..window within a document, counted over the corpus.

    Output: (t1, t2, dist, n) with t1 the earlier token; symmetric
    window consumers read each row as both (t1 ctx-> t2) and
    (t2 ctx-> t1) — storing one direction halves the table.

    Spark shape: one posexplode (corpus token count × 1 rows), ONE
    self-equi-join keyed on doc_id with the distance band as a join
    residual, pair-keyed count with map-side partials. Fan-out is
    exactly `window` rows per token — linear in corpus size, bounded
    by construction (never quadratic: the band predicate rides the
    sort-merge join's doc_id key). min_count prunes the long tail
    AFTER the partial agg, where it is a filter on the counted table.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(TOKEN_RE),
                F.lit(0),
            )
        ).alias("pos", "token"),
    )
    a = toks.select(
        "doc_id", F.col("token").alias("t1"), F.col("pos").alias("p1")
    )
    b = toks.select(
        "doc_id", F.col("token").alias("t2"), F.col("pos").alias("p2")
    )
    return (
        a.join(b, "doc_id")
        .filter(
            (F.col("p2") > F.col("p1"))
            & (F.col("p2") - F.col("p1") <= window)
        )
        .groupBy(
            "t1",
            "t2",
            (F.col("p2") - F.col("p1")).cast("int").alias("dist"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
