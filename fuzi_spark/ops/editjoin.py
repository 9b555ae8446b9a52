"""Edit-distance similarity self-join over short strings.

Entity resolution for the metadata a corpus pipeline keys on — titles,
author names, product/package identifiers: "same thing, one typo
apart" pairs that exact dedup misses and embedding similarity
over-matches. The naive answer is an all-pairs levenshtein — O(n^2)
is dead at any real scale.

This is the symmetric-deletion (SymSpell) blocking scheme: two strings
with edit distance <= k share at least one common variant in their
depth-k DELETION neighborhoods (delete any <= k characters; covers
substitution as delete-on-both-sides, insertion/deletion as
delete-on-one-side). Candidates come from an equi-join on deletion
variants; every candidate is then verified with the JVM levenshtein —
blocking decides the work, exact distance decides the answer, so
recall is 100% by the pigeonhole argument and precision is exact.

Contract: SHORT strings. The neighborhood has O(len^k) variants per
row (len+1 at k=1) — the right cost model for names/titles (tens of
chars), the wrong one for documents (fingerprint/minhash those
instead). Variant generation is pure Catalyst (sequence + transform +
substr concat), so it stays in whole-stage codegen; the only exchange
is the variant equi-join, keyed on the variant string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dels(col):
    """All single-deletion variants of `col` as an array column;
    empty array for the empty string (sequence(1,0) would descend)."""
    return F.when(
        F.length(col) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                col.substr(F.lit(1), i - F.lit(1)),
                col.substr(i + F.lit(1), F.length(col)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def edit_join(
    df: DataFrame,
    k: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs (id_a < id_b, dist) with levenshtein(text_a, text_b)
    <= k. k in {1, 2}; rows with NULL text are ignored."""
    if k not in (1, 2):
        raise ValueError("edit_join supports k = 1 or 2")
    s = F.col("_s")
    base = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_s")
    ).where(s.isNotNull())
    variants = F.array_distinct(F.concat(F.array(s), _dels(s)))
    if k == 2:
        variants = F.array_distinct(
            F.flatten(
                F.transform(
                    variants, lambda v: F.concat(F.array(v), _dels(v))
                )
            )
        )
    sides = base.select("_id", "_s", F.explode(variants).alias("_v"))
    a = sides.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), "_v"
    )
    b = sides.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), "_v"
    )
    cand = (
        a.join(b, "_v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("dist", F.levenshtein(F.col("_sa"), F.col("_sb")))
        .where(F.col("dist") <= k)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
    )
