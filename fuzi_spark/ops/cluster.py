"""Distributed k-means clustering over embedding columns.

Lloyd's algorithm in its Spark-native shape: every iteration is ONE scan
of the corpus — assignment is a vectorized argmin against the broadcast
k×d centroid matrix (one matmul per Arrow batch), and the centroid
update is a map-side-combinable groupBy over (cluster, coordinate)
partial sums (k·d tiny rows through the shuffle, however large the
corpus). Centroids live driver-side under the same metadata-size
contract as IVF (`similarity.py`): k·d doubles, never data-sized.

Init is deterministic farthest-first traversal over a bounded seeded
sample: pick the sample row with the smallest id, then greedily the
sample point farthest from the chosen set. For separated data this
provably lands one seed per cluster (a farthest-first seed set 2-covers
the data), which is exactly the planted-oracle regime; it is also a
standard k-means++-family init with the randomness removed so re-runs
and different cluster sizes produce identical models.

The input DataFrame is scanned once per iteration; callers composing
pipelines should persist it (`cache.scoped_persist` under a
`cache_scope`) — the fit does NOT persist internally because it does not
own the caller's lifecycle.

Reference parity note: kylehughes/Fuzi has no clustering surface; this
is pipeline-brief scope (corpus bucketing for mixture balancing,
near-dup blocking, IVF-style index builds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

_ASSIGN_SCHEMA = StructType(
    [
        StructField("cluster", IntegerType()),
        StructField("dist", DoubleType()),
    ]
)


def _assign_udf(centroids: np.ndarray):
    """(cluster, euclidean dist) per vector: one ‖x−c‖² matrix per Arrow
    batch via the expansion ‖x‖² − 2x·c + ‖c‖² (one matmul)."""
    C = centroids.astype(np.float64)
    cn = (C * C).sum(axis=1)

    @pandas_udf(_ASSIGN_SCHEMA)
    def _udf(vec: pd.Series) -> pd.DataFrame:
        if len(vec) == 0:
            return pd.DataFrame({"cluster": [], "dist": []})
        M = np.stack(vec.to_numpy()).astype(np.float64)
        d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C.T) + cn[None, :]
        best = np.argmin(d2, axis=1)
        dist = np.sqrt(np.maximum(d2[np.arange(len(best)), best], 0.0))
        return pd.DataFrame(
            {"cluster": best.astype(np.int32), "dist": dist}
        )

    return _udf


def _farthest_first(sample: np.ndarray, k: int) -> np.ndarray:
    seeds = [0]  # sample is pre-sorted by id: row 0 is the smallest id
    d = ((sample - sample[0]) ** 2).sum(axis=1)
    while len(seeds) < k:
        nxt = int(np.argmax(d))
        seeds.append(nxt)
        d = np.minimum(d, ((sample - sample[nxt]) ** 2).sum(axis=1))
    return sample[seeds].copy()


def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    max_iter: int = 20,
    tol: float = 1e-6,
    sample_size: int = 10000,
    max_k: int = 4096,
) -> np.ndarray:
    """Fit k centroids (k × d numpy array, driver-side metadata).

    Iterates until the max centroid shift falls below `tol` or
    `max_iter` is reached. An emptied cluster keeps its previous
    centroid (documented Lloyd convention). The init sample is the
    `sample_size` smallest ids — deterministic across runs, re-runs,
    and parallelism levels by construction."""
    if k > max_k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds max_k={max_k}; centroids are a "
            "driver-side metadata contract"
        )
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).filter(F.col("_v").isNotNull())
    sample_rows = (
        base.orderBy("_id").limit(int(sample_size)).select("_v").collect()
    )
    if len(sample_rows) < k:
        raise ValueError(
            f"kmeans_fit: {len(sample_rows)} rows < k={k}"
        )
    sample = np.stack(
        [np.asarray(r["_v"], dtype=np.float64) for r in sample_rows]
    )
    centroids = _farthest_first(sample, k)
    d = centroids.shape[1]

    for _ in range(max_iter):
        assigned = base.select(
            _assign_udf(centroids)(F.col("_v")).alias("a"), "_v"
        ).select(F.col("a.cluster").alias("c"), "_v")
        stats = (
            assigned.select("c", F.posexplode("_v").alias("pos", "x"))
            .groupBy("c", "pos")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        sums = np.zeros((k, d))
        counts = np.zeros(k)
        for r in stats:
            sums[r["c"], r["pos"]] = r["s"]
            counts[r["c"]] = r["n"]
        new = centroids.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        shift = float(np.sqrt(((new - centroids) ** 2).sum(axis=1)).max())
        centroids = new
        if shift < tol:
            break
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, cluster, dist) for every row — one scan, zero shuffles.

    `cluster` is the centroid INDEX; indices depend on init order, so
    cross-run comparisons should canonicalize (see
    `kmeans_canonical_clusters`)."""
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        _assign_udf(centroids)(F.col(vec_col)).alias("_a"),
    ).select(
        id_col,
        F.col("_a.cluster").alias("cluster"),
        F.col("_a.dist").alias("dist"),
    )


def kmeans_canonical_clusters(assigned: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """Relabel arbitrary centroid indices with each cluster's smallest
    member id (content-derived, stable across init orderings), and
    attach cluster sizes — one window exchange on the cluster key."""
    w = Window.partitionBy("cluster")
    return assigned.select(
        id_col,
        F.min(id_col).over(w).alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        "dist",
    )
