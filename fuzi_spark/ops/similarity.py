"""Similarity search over embedding columns (array<float>).

Two paths:
- brute-force cosine top-k: broadcast the (small) query set against the
  full table; dot products are pure Catalyst (zip_with + aggregate), so
  the scan whole-stage-codegens — the right baseline at any scale where
  the query set is small.
- LSH-bucketed top-k: random-hyperplane signatures (deterministic seed)
  computed in a vectorized numpy UDF (one matmul per Arrow batch); probing
  joins on the signature bucket first, so the candidate set per query is
  ~table_size / 2^bits instead of the whole table. The scale path for
  query sets too big to broadcast-crossjoin.

Embedding near-duplicate detection reuses the same machinery with a
threshold filter instead of a top-k window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import IntegerType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    """cosine(a, b) as a pure-JVM column expression."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query vector, the k nearest table vectors by cosine.

    queries is expected to be small → broadcast, no shuffle of the big
    side; ranking is a per-query-partition window (top-k heap in AQE)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")
    )
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("v_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def make_hyperplanes(dim: int, bits: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(dim, bits).astype(np.float64)


def lsh_signature_udf(planes: np.ndarray):
    """Vectorized sign-LSH: one (batch × dim) @ (dim × bits) matmul per
    Arrow batch; returns the integer bucket."""
    P = planes

    @pandas_udf(IntegerType())
    def _udf(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int32")
        M = np.stack(vec.to_numpy())
        proj = M.astype(np.float64) @ P
        bits = (proj > 0).astype(np.int64)
        weights = (1 << np.arange(P.shape[1], dtype=np.int64))
        return pd.Series((bits @ weights).astype(np.int32))

    return _udf


def lsh_signatures_udf(planes_per_table: list):
    """Multi-table sign-LSH: ONE (batch × dim) @ (dim × tables·bits)
    matmul per Arrow batch, then per-table bucket ints — array<int>, one
    bucket per table."""
    P = np.concatenate(planes_per_table, axis=1)  # dim × (T*bits)
    bits = planes_per_table[0].shape[1]
    n_tables = len(planes_per_table)
    weights = 1 << np.arange(bits, dtype=np.int64)

    from pyspark.sql.types import ArrayType as _AT, IntegerType as _IT

    @pandas_udf(_AT(_IT()))
    def _udf(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(vec.to_numpy()).astype(np.float64)
        proj = (M @ P > 0).astype(np.int64)  # (n, T*bits)
        proj = proj.reshape(len(M), n_tables, bits)
        buckets = (proj @ weights).astype(np.int32)  # (n, T)
        return pd.Series(list(buckets))

    return _udf


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: multi-table sign-LSH (the E2LSH shape) — n_tables
    independent hyperplane sets; a pair is a candidate if it collides in
    ANY table. Exact cosine re-rank over the deduped candidates.

    Recall tuning: per-table collision is p^bits (p = 1 - θ/π), overall
    1-(1-p^bits)^n_tables — raise n_tables for recall, raise bits to
    shrink buckets. A single table at any bit-width has near-zero recall
    on weakly-clustered data (measured round 2: recall@5 = 0.0 at bits=6
    on the uniform test embeddings); multiple independent tables are what
    make sign-LSH usable. The big side is touched once: signatures for
    all tables come from one matmul, and candidates explode only the
    (table, bucket) keys, never the vectors."""
    planes = [
        make_hyperplanes(dim, bits, seed=42 + 1000 * t) for t in range(n_tables)
    ]
    sig = lsh_signatures_udf(planes)
    tbl = F.explode(
        F.transform(
            F.col("_sigs"),
            lambda b, i: F.struct(i.alias("table"), b.alias("bucket")),
        )
    )
    v = (
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("v_vec"),
            sig(F.col(vec_col)).alias("_sigs"),
        )
        .select("neighbor_id", "v_vec", tbl.alias("tb"))
        .select("neighbor_id", "v_vec", "tb.table", "tb.bucket")
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            sig(F.col(vec_col)).alias("_sigs"),
        )
        .select("query_id", "q_vec", tbl.alias("tb"))
        .select("query_id", "q_vec", "tb.table", "tb.bucket")
    )
    cand = (
        v.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "q_vec", "v_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine", cosine_col(F.col("q_vec"), F.col("v_vec"))
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_assign_udf(centroids: np.ndarray):
    """Vectorized IVF cell assignment: one (batch × dim) @ (dim × C)
    matmul per Arrow batch, argmax over normalized centroids."""
    C = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    CT = C.T

    @pandas_udf(IntegerType())
    def _udf(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int32")
        M = np.stack(vec.to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ CT, axis=1).astype(np.int32))

    return _udf


def ivf_centroids(vectors: DataFrame, n_cells: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic coarse quantizer: the first n_cells vectors by id.
    (Prod path: k-means over a sample; determinism matters more here.)"""
    rows = (
        vectors.orderBy(F.col(id_col).asc()).limit(n_cells).select(vec_col).collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def cosine_topk_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = 10_000,
) -> DataFrame:
    """IVF ANN: assign every vector to its nearest centroid cell, probe the
    query's n_probe nearest cells, exact cosine re-rank inside them.

    Scale shape: the assignment is one matmul per Arrow batch; the probe
    join is an equi-join on cell id, so per-query work is
    ~(n_probe / n_cells) of the table instead of all of it.

    Contract: the probe list is built DRIVER-SIDE, so the query set must
    be metadata-sized (≤ max_query_rows). Guarded with a limit(n+1) probe
    — never a full count — and a fail-fast error instead of a silent
    driver-OOM collect; route larger query sets through cosine_topk_lsh,
    which stays fully distributed."""
    n_q = queries.limit(max_query_rows + 1).count()
    if n_q > max_query_rows:
        raise ValueError(
            f"cosine_topk_ivf builds its probe list on the driver; the "
            f"query set exceeds max_query_rows={max_query_rows}. Use "
            f"cosine_topk_lsh for large query sets, or raise the limit "
            f"explicitly if the driver can hold them."
        )
    cents = ivf_centroids(vectors, n_cells, id_col, vec_col)
    assign = ivf_assign_udf(cents)
    Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_vec"),
        assign(F.col(vec_col)).alias("cell"),
    ).persist()

    # driver-side probe list per query (queries are small by contract)
    q_rows = queries.select(id_col, vec_col).collect()
    probe_rows = []
    for r in q_rows:
        qv = np.array(r[1], dtype=np.float64)
        qv = qv / max(np.linalg.norm(qv), 1e-12)
        cells = np.argsort(-(Cn @ qv))[:n_probe]
        for c in cells:
            probe_rows.append((r[0], list(r[1]), int(c)))
    spark = vectors.sparkSession
    q = spark.createDataFrame(
        probe_rows, schema=f"query_id long, q_vec array<double>, cell int"
    )
    scored = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("v_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dups(
    vectors: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold), LSH-bucketed
    self-join so the candidate set stays sub-quadratic.

    Vectors are L2-normalized ONCE per row before the self-join, so the
    per-candidate-pair work inside the join is a single dot product
    (`aggregate(zip_with)`) instead of dot + two norms — higher-order
    functions are the interpreted part of this plan, and the join output
    is quadratic in bucket size, so tripling per-pair lambda work is the
    difference that shows at scale."""
    sig = lsh_signature_udf(make_hyperplanes(dim, bits))
    keyed = (
        vectors.select(
            F.col(id_col),
            F.col(vec_col),
            F.greatest(_norm(F.col(vec_col)), F.lit(1e-12)).alias("_n"),
            sig(F.col(vec_col)).alias("bucket"),
        )
        .select(
            id_col,
            F.transform(F.col(vec_col), lambda x: x / F.col("_n")).alias("_u"),
            "bucket",
        )
        .persist()  # avoid recomputing the signature UDF per join side
    )
    l = keyed.select(F.col(id_col).alias("id_a"), F.col("_u").alias("va"), "bucket")
    r = keyed.select(F.col(id_col).alias("id_b"), F.col("_u").alias("vb"), "bucket")
    return (
        l.join(r, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", _dot(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
