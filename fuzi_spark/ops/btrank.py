"""Bradley-Terry rating fit over pairwise preference outcomes.

Preference datasets (RLHF reward data, side-by-side eval logs, arena
votes) arrive as (winner, loser) comparison rows. Ranking the items —
candidate responses, model versions, prompt templates — needs a global
strength score that respects the tournament structure, not raw win
rate (which ignores opponent strength and pairing imbalance). The
standard fit is the Bradley-Terry model P(i beats j) = p_i/(p_i+p_j),
estimated here with Hunter's MM iteration (Hunter 2004, "MM algorithms
for generalized Bradley-Terry models"):

    p_i  <-  W_i / sum_j n_ij / (p_i + p_j)

where W_i = total wins of i and n_ij = total comparisons between i and
j. The update is 1-homogeneous (scaling every p scales the update by
the same factor), so normalization commutes with iteration — scores
are normalized ONCE at the end to mean 1, which keeps the per-round
dataflow to exactly one join+agg and lets a SQL oracle unroll the
recurrence round by round.

Scale shape (reference contract: fuzi_spark mirrors the reference's
snapshot-out batching discipline, /root/reference/Sources/Actor.swift:136
— values in, values out, no shared mutable state):
- the comparison table is the big input (one row per human/AI label);
  it is reduced ONCE into the symmetrized pair table n_ij and the
  per-item win table W_i — both groupBy with map-side partials, keyed
  by (item, item) / item;
- each MM round is ONE join of the persisted pair table against the
  (item, score) table on both endpoints, then an item-keyed sum —
  all tables item-cardinality (models/responses), orders of magnitude
  below the comparison count;
- rounds localCheckpoint like domain_rank/dedup_components (the
  iterative plan-growth trap documented at dedup.py), superseded
  score tables released deterministically;
- deterministic up to float addition order: fixed iteration count, no
  randomness, ties in nothing.

Items that never win converge to score 0 (their MM fixed point); items
never observed losing keep growing for n_iter rounds — both are the
model's honest answer on degenerate tournaments, not special cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cache import scoped_persist


def bradley_terry(
    comparisons: DataFrame,
    n_iter: int = 8,
    winner_col: str = "winner",
    loser_col: str = "loser",
    weight_col: str | None = None,
) -> DataFrame:
    """Fit Bradley-Terry strengths from (winner, loser[, weight]) rows.

    Returns one row per item: (item, score double — mean-normalized
    strength, n_wins bigint, n_games bigint). `weight_col` lets
    pre-aggregated inputs count each row as w comparisons.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    comp = comparisons.select(
        F.col(winner_col).alias("_w"), F.col(loser_col).alias("_l"), w.alias("_n")
    )
    # symmetrized pair table: every item sees every opponent from the
    # `a` side, so one groupBy(a) per round covers the full denominator
    edges = scoped_persist(
        comp.select(F.col("_w").alias("a"), F.col("_l").alias("b"), "_n")
        .unionByName(
            comp.select(F.col("_l").alias("a"), F.col("_w").alias("b"), "_n")
        )
        .groupBy("a", "b")
        .agg(F.sum("_n").alias("n"))
    )
    wins = comp.groupBy(F.col("_w").alias("a")).agg(F.sum("_n").alias("W"))
    stats = scoped_persist(
        edges.groupBy("a")
        .agg(F.sum("n").alias("n_games"))
        .join(wins, "a", "left")
        .select(
            "a",
            F.coalesce("W", F.lit(0.0)).alias("W"),
            "n_games",
        )
    )

    sc = comparisons.sparkSession.sparkContext

    def _persist_ids():
        return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids):
        m = sc._jsc.getPersistentRDDs()
        for i in ids:
            h = m.get(i)
            if h is not None:
                h.unpersist(False)

    before = _persist_ids()
    scores = stats.select("a", F.lit(1.0).alias("p")).localCheckpoint()
    score_ids = _persist_ids() - before
    for _ in range(n_iter):
        pb = scores.select(F.col("a").alias("b"), F.col("p").alias("_pb"))
        pa = scores.select("a", F.col("p").alias("_pa"))
        denom = (
            edges.join(pa, "a")
            .join(pb, "b")
            .groupBy("a")
            .agg(F.sum(F.col("n") / (F.col("_pa") + F.col("_pb"))).alias("_d"))
        )
        before = _persist_ids()
        scores = (
            stats.join(denom, "a")
            .select("a", (F.col("W") / F.col("_d")).alias("p"))
            .localCheckpoint()
        )
        new_ids = _persist_ids() - before
        _release(score_ids)
        score_ids = new_ids
    mean = scores.agg(F.avg("p").alias("_m"))
    return (
        scores.crossJoin(F.broadcast(mean))
        .join(stats, "a")
        .select(
            F.col("a").alias("item"),
            (F.col("p") / F.col("_m")).alias("score"),
            F.col("W").cast("bigint").alias("n_wins"),
            F.col("n_games").cast("bigint").alias("n_games"),
        )
    )
