"""Pareto-frontier (2D skyline) selection over per-document metrics.

Multi-objective data selection: "highest quality at every toxicity
level", "longest document at every perplexity bucket" — the frontier
of (maximize, minimize) metric pairs. A threshold on either metric
alone either drowns the other or discards the corner cases the
frontier keeps; the skyline is the assumption-free answer.

Dominance contract (standard strict skyline): row r is dominated iff
some row s has s.min_col <= r.min_col AND s.max_col >= r.max_col with
at least one strict inequality. Exact (min, max) DUPLICATES dominate
each other in neither direction — all copies stay on the frontier.

Dataflow (two-level grouping, no corpus-wide sort):
 1. groupBy(min_col) -> per-value best max (map-side partials);
 2. cumulative strictly-before max over the DISTINCT-min table,
    ordered by min_col — this is the only single-partition window,
    and it runs over |distinct min values| rows, not the corpus.
    The contract is that min_col is a discretized metric (quality
    buckets, rounded scores, integer costs — what gate pipelines
    actually produce); for a continuous min_col, bucket it first or
    this table degenerates to corpus size;
 3. join the (gmax, prevmax) pair back by min_col: frontier iff
    max_col == gmax (best at my level) AND max_col > prevmax (beats
    everything strictly cheaper).

The DuckDB oracle is an INDEPENDENT formulation (NOT EXISTS dominance
scan), so the window algebra is cross-checked against the definition
itself, not against a replay of the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pareto_frontier(
    df: DataFrame,
    max_col: str,
    min_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag every row with on_frontier (1/0) under the strict-dominance
    skyline over (maximize `max_col`, minimize `min_col`)."""
    g = df.groupBy(F.col(min_col).alias("_mv")).agg(
        F.max(F.col(max_col)).alias("_gmax")
    )
    w = Window.orderBy(F.col("_mv").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = g.select(
        "_mv", "_gmax", F.max("_gmax").over(w).alias("_prevmax")
    )
    joined = df.join(cum, df[min_col] == cum["_mv"])
    frontier = (F.col(max_col) == F.col("_gmax")) & (
        F.col("_prevmax").isNull() | (F.col(max_col) > F.col("_prevmax"))
    )
    return joined.select(
        F.col(id_col),
        F.col(max_col),
        F.col(min_col),
        frontier.cast("int").alias("on_frontier"),
    )
