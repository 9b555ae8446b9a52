"""Graph analytics over the link graph: distributed triangle counting.

Triangles are the workhorse local-structure signal on web graphs: link
farms and spam clusters are triangle-dense, organic editorial linking
is triangle-sparse, and per-host triangle counts feed the same
quality-weighting pipeline as domain_rank (clustering coefficient =
triangles / wedges). Naive counting joins the edge list with itself
twice — at web scale the wedge table explodes around high-degree hubs
(a degree-10^6 portal contributes 10^12 wedges).

This is the Schank-Wagner edge-orientation formulation: orient every
undirected edge from its lower-(degree, id) endpoint to the higher
one. Every triangle then has exactly ONE vertex with two outgoing
oriented edges, so counting (u→v, u→w, v→w) patterns counts each
triangle exactly once, and out-degrees are bounded by O(sqrt(m))
regardless of hub degree — the wedge join is safe around any hub.

Dataflow: dedup/symmetrize edges (one shuffle on the edge pair),
degree count (node-keyed, map-side partials), one self-join on the
wedge apex, one closing-edge join — every key a node id or node pair,
no broadcast assumptions, fully relational (the DuckDB oracle replays
it verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the UNDIRECTED simple graph induced
    by `edges` (direction, duplicates, and self-loops are dropped).

    Returns (node string, degree bigint, n_triangles bigint) for every
    node incident to at least one edge; the global triangle count is
    sum(n_triangles) / 3."""
    e = edges.select(
        F.col(src_col).cast("string").alias("a"),
        F.col(dst_col).cast("string").alias("b"),
    ).where(F.col("a") != F.col("b"))
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("deg")
    )
    canon = und.where(F.col("a") < F.col("b"))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("_db"))
    ranked = canon.join(da, "a").join(db, "b")
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("_da")).otherwise(F.col("_db")).alias("_ru"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_rv"),
    )
    o1 = oriented.select("u", F.col("v").alias("x"), F.col("_rv").alias("_rx"))
    o2 = oriented.select("u", F.col("v").alias("y"), F.col("_rv").alias("_ry"))
    # wedge pair ordered BY RANK so the closing edge's orientation is known
    wedges = o1.join(o2, "u").where(
        (F.col("_rx") < F.col("_ry"))
        | ((F.col("_rx") == F.col("_ry")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    per_node = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("deg").cast("bigint").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
        )
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    n_rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core membership over the undirected simple graph: the maximal
    subgraph where every node keeps degree >= k — the standard "dense
    nucleus" detector (link farms and scraper rings live in high
    cores; genuine long-tail sites are low-core), complementing
    triangle_count's local signal with a global one.

    Fixed n_rounds unroll of the peeling recurrence: each round
    recomputes degrees WITHIN the surviving subgraph and drops nodes
    below k; converged=1 iff one more round would drop nobody (the
    token_budget_plan contract — an under-provisioned unroll is
    reported, never silently wrong; peeling cascades need one round
    per layer, so n_rounds bounds the cascade depth, not the k).

    Scale shape: each round is one semi-join of the edge table against
    surviving nodes (both endpoints) + a node-keyed degree count with
    map-side partials; rounds localCheckpoint with superseded-table
    release (domain_rank discipline) so the loop cannot grow the plan.

    Returns (node string, degree bigint — original degree, in_core
    int, converged int)."""
    e = edges.select(
        F.col(src_col).cast("string").alias("a"),
        F.col(dst_col).cast("string").alias("b"),
    ).where(F.col("a") != F.col("b"))
    from .cache import scoped_persist

    und = scoped_persist(
        e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
    )
    deg0 = scoped_persist(
        und.groupBy(F.col("a").alias("node")).agg(
            F.count("*").alias("degree")
        )
    )

    sc = edges.sparkSession.sparkContext

    def _ids():
        return {int(x) for x in sc._jsc.getPersistentRDDs().keySet().toArray()}

    def _release(ids):
        m = sc._jsc.getPersistentRDDs()
        for i in ids:
            h = m.get(i)
            if h is not None:
                h.unpersist(False)

    before = _ids()
    alive = deg0.where(F.col("degree") >= k).select("node").localCheckpoint()
    alive_ids = _ids() - before
    for _ in range(n_rounds):
        sub = und.join(
            alive.select(F.col("node").alias("a")), "a", "left_semi"
        ).join(alive.select(F.col("node").alias("b")), "b", "left_semi")
        deg = sub.groupBy(F.col("a").alias("node")).agg(
            F.count("*").alias("_d")
        )
        before = _ids()
        alive = (
            deg.where(F.col("_d") >= k).select("node").localCheckpoint()
        )
        new_ids = _ids() - before
        _release(alive_ids)
        alive_ids = new_ids
    # converged iff one more peel drops nobody
    sub = und.join(
        alive.select(F.col("node").alias("a")), "a", "left_semi"
    ).join(alive.select(F.col("node").alias("b")), "b", "left_semi")
    survivors = (
        sub.groupBy(F.col("a").alias("node"))
        .agg(F.count("*").alias("_d"))
        .where(F.col("_d") >= k)
        .count()
    )
    converged = 1 if survivors == alive.count() else 0
    return (
        deg0.join(
            alive.select("node", F.lit(1).alias("in_core")), "node", "left"
        )
        .select(
            "node",
            F.col("degree").cast("bigint").alias("degree"),
            F.coalesce("in_core", F.lit(0)).cast("int").alias("in_core"),
            F.lit(converged).cast("int").alias("converged"),
        )
    )
