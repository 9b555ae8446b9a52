"""Retrieval evaluation: recall@k / precision@k / MRR / nDCG@k.

The measurement half of the retrieval surface (bm25_search, cosine
top-k, rrf_fuse produce ranked lists; this scores them against gold
labels). Per-query rows rather than a single macro scalar — the
failure mode that matters operationally is "which query classes
regressed", and macro averages are one groupBy away.

Metric contract (binary relevance):
  recall@k    = |gold hit in top-k| / |gold|
  precision@k = |gold hit in top-k| / k      (k, not retrieved count:
                returning fewer than k results IS a precision loss)
  mrr         = 1 / rank of the first hit at ANY rank (0 if no hit —
                MRR is conventionally uncut; the @k cut applies to the
                set metrics)
  ndcg@k      = sum_hits 1/log2(r+1) / sum_{i=1..min(|gold|,k)}
                1/log2(i+1)
Queries with no gold rows are excluded (their metrics are undefined,
and silently scoring them 0 would poison macro averages).

Dataflow: one rank-filtered join of results against the gold table
(both keyed by query_id — co-partitioned sort-merge at scale), one
query-keyed agg with map-side partials, ideal-DCG as a closed-form
JVM sequence aggregate. No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def retrieval_eval(
    results: DataFrame,
    gold: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query metrics: (query_id, n_gold, n_hits_at_k, recall_at_k,
    precision_at_k, mrr, ndcg_at_k)."""
    r = results.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_col).alias("_doc"),
        F.col(rank_col).cast("int").alias("_rank"),
    )
    g = gold.select(
        F.col(query_col).alias("query_id"), F.col(doc_col).alias("_doc")
    ).distinct()
    n_gold = g.groupBy("query_id").agg(F.count("*").alias("n_gold"))
    hits = r.join(g, ["query_id", "_doc"])
    per_q = hits.groupBy("query_id").agg(
        F.sum((F.col("_rank") <= k).cast("int")).alias("n_hits_at_k"),
        F.min("_rank").alias("_first"),
        F.sum(
            F.when(
                F.col("_rank") <= k,
                F.lit(1.0) / F.log2(F.col("_rank") + F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        ).alias("_dcg"),
    )
    ideal = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_gold"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc
        + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return (
        n_gold.join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.col("n_gold").cast("bigint").alias("n_gold"),
            F.coalesce("n_hits_at_k", F.lit(0))
            .cast("bigint")
            .alias("n_hits_at_k"),
            (
                F.coalesce("n_hits_at_k", F.lit(0)).cast("double")
                / F.col("n_gold")
            ).alias("recall_at_k"),
            (
                F.coalesce("n_hits_at_k", F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("precision_at_k"),
            F.when(
                F.col("_first").isNotNull(),
                F.lit(1.0) / F.col("_first").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("mrr"),
            (F.coalesce("_dcg", F.lit(0.0)) / ideal).alias("ndcg_at_k"),
        )
    )
