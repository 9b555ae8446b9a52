"""Hard-negative mining for retrieval/embedding training data.

Contrastive training (DPR, SBERT, CLIP fine-tuning) needs, for every
query vector, the most-similar corpus items that are NOT true matches
— "hard" negatives near the decision boundary train discrimination;
random negatives teach nothing. The standard recipe (Karpukhin et al.
2020; the sentence-transformers mining loop) is top-k by similarity
among label-mismatched items, with a similarity CEILING to avoid
harvesting false negatives (unlabeled true positives masquerading as
negatives).

Spark shape: the query side is broadcast (a training query set is
metadata-sized next to the corpus); the corpus side streams through
one codegen'd projection per (query, item) pair, and per-query top-k
is a WindowGroupLimit (rank <= k pushed map-side), never a global
sort. For corpus x corpus mining, generate candidate pairs with
cosine_topk_lsh / cosine_topk_ivf first and feed them through the
same filter + rank stages (the margin_bitext scaling contract,
ops/similarity.py).

Determinism: ties break on (cosine desc, candidate id asc) — re-runs
and cluster-size changes reproduce the identical mined set.

Reference parity note: the reference (kylehughes/Fuzi) has no
embedding surface — pipeline-brief scope (contrastive training-data
curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fuzi_spark.ops.similarity import cosine_col


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    ceiling: float = 0.95,
    floor: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, neg_id, cosine, rank) — for each query row, the top-k
    corpus rows with a DIFFERENT label and floor <= cosine <= ceiling.

    `ceiling` is the false-negative guard (items more similar than it
    are suspiciously likely to be unlabeled positives — exclude, don't
    train against); `floor` drops easy negatives that carry no
    gradient signal."""
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("_ql"),
    )
    cs = corpus.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).alias("_cv"),
        F.col(label_col).alias("_cl"),
    )
    pairs = (
        cs.crossJoin(F.broadcast(qs))
        .filter(
            (F.col("_cl") != F.col("_ql"))
            & (F.col("neg_id") != F.col("query_id"))
        )
        .select(
            "query_id",
            "neg_id",
            cosine_col(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
        .filter(
            (F.col("cosine") <= F.lit(float(ceiling)))
            & (F.col("cosine") >= F.lit(float(floor)))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )
