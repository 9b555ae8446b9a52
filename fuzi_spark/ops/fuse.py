"""Reciprocal-rank fusion: combine retrieval rankings without scores.

Hybrid retrieval (lexical BM25 + dense ANN, or several query
reformulations) needs a fusion step that is indifferent to the
incomparable score scales of its inputs. RRF (Cormack et al., SIGIR
2009) uses only the RANKS:

    rrf(d) = sum_i 1 / (k + rank_i(d))        (k = 60 classically)

with a list that does not contain d contributing nothing.

Spark shape: each input ranking is reduced to (id, rank) — rank
assigned by row_number over (score desc, id), ties broken by id so
the rank column is total and deterministic. The rankings are then
unioned (NOT joined n-ways: a union + one groupBy costs one shuffle
total and generalizes to any number of lists, where an n-way full
outer join costs n-1 shuffles and a null-handling pyramid). The
fused score is a sum of 1/(k+rank) doubles; each term is one IEEE
division on integers — bit-identical in any engine — and the sum is
ordered by groupBy over at most n_lists terms per id, so the final
ordering key is engine-stable.

Ranking inputs are top-N lists (bounded per query), so the window's
partition is metadata-sized; the fusion itself is one
map-side-combinable aggregate.

Reference parity note: no counterpart in the reference —
pipeline-brief scope (retrieval), same bucket as ops/bm25.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def to_ranking(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(id, rank): 1-based row_number over (score desc, id) — total
    order even under score ties, so reruns and engines agree."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return scored.select(
        id_col, F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Fuse (id, rank) lists into (id, rrf_score, n_lists, best_rank),
    the top-n by (rrf_score desc, id)."""
    if not rankings:
        raise ValueError("no rankings to fuse")
    tagged = rankings[0]
    for r in rankings[1:]:
        tagged = tagged.unionByName(r)
    contrib = F.lit(1.0) / (F.lit(int(k)) + F.col("rank"))
    return (
        tagged.select(id_col, F.col("rank"), contrib.alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("rrf_score"),
            F.count("*").alias("n_lists"),
            F.min("rank").alias("best_rank"),
        )
        .orderBy(F.col("rrf_score").desc(), id_col)
        .limit(int(top_n))
    )
