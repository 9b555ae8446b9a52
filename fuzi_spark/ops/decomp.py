"""Distributed PCA over embedding columns.

The 100 TB-scale decomposition pattern: the data never moves — one scan
computes per-Arrow-batch partial Gram matrices (d×d outer-product sums),
a metadata-sized shuffle (d²+d+1 doubles per batch) reduces them, and the
eigendecomposition happens driver-side on the d×d covariance (d is
bounded by `max_dim`; an embedding dimension is model-sized, never
data-sized). Projection back over the corpus is one matmul per Arrow
batch. This mirrors how MLlib's RowMatrix PCA works (computeGramianMatrix
→ local eigensolve), re-expressed over DataFrame/Arrow so `array<float>`
embedding columns feed it directly.

Reference parity note: kylehughes/Fuzi has no linear-algebra surface;
this module is pipeline-brief scope (embedding curation at scale:
decorrelation, whitening, dimensionality reduction before clustering /
ANN indexing).

Determinism: the aggregation sums products of the input values — for the
planted oracle constructions (small integers and halves) these partial
sums are exactly representable in double, so the Gram matrix is
bit-identical regardless of partitioning or reduction order. numpy
`eigh` on a deterministic matrix is deterministic; eigenvector SIGN is
conventionalized (the max-|entry| coordinate of each component is made
non-negative) so `fit` output is stable. Callers that need a
data-anchored orientation (the oracle-checked query does) can re-orient
projection columns by the sign of a chosen row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel:
    """Driver-side model: metadata-sized by contract (k·d + d doubles)."""

    def __init__(self, components: np.ndarray, explained_variance: np.ndarray,
                 mean: np.ndarray, n_rows: int):
        self.components = components            # k × d, rows unit-norm
        self.explained_variance = explained_variance  # k, descending
        self.mean = mean                        # d
        self.n_rows = n_rows


def _partial_gram_fn(vec_col: str, d: int):
    def fn(batches):
        for pdf in batches:
            col = pdf[vec_col]
            mask = col.notna()
            if not mask.any():
                continue
            M = np.stack(col[mask].to_numpy()).astype(np.float64)
            if M.shape[1] != d:
                raise ValueError(
                    f"pca_fit: embedding dim {M.shape[1]} != declared {d}"
                )
            flat = np.concatenate(
                [(M.T @ M).ravel(), M.sum(axis=0), [float(M.shape[0])]]
            )
            yield pd.DataFrame({"part": [flat.tolist()]})
    return fn


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
    dim: int | None = None,
    max_dim: int = 1024,
) -> PCAModel:
    """Fit PCA with ONE pass over the corpus.

    Per Arrow batch: a d×d partial Gram + column sums + count, flattened
    into one array row. The partials are posexploded and reduced with a
    map-side-combinable groupBy on the (d²+d+1)-sized position key — the
    shuffle carries kilobytes however large the corpus is. The d×d
    covariance eigendecomposition runs driver-side under an explicit
    `max_dim` guard (same metadata-size contract as IVF centroids).

    NULL vectors are skipped (they contribute to neither Gram nor n)."""
    if dim is None:
        probe = df.select(F.size(F.col(vec_col)).alias("d")).filter(
            F.col("d") > 0
        ).first()
        if probe is None:
            raise ValueError("pca_fit: no non-empty vectors")
        dim = int(probe["d"])
    if dim > max_dim:
        raise ValueError(
            f"pca_fit: dim {dim} exceeds max_dim {max_dim}; the d×d "
            "eigensolve is a driver-side metadata contract"
        )
    if not 1 <= k <= dim:
        raise ValueError(f"pca_fit: k={k} out of range [1, {dim}]")

    parts = df.select(vec_col).mapInPandas(
        _partial_gram_fn(vec_col, dim), schema="part array<double>"
    )
    summed = (
        parts.select(F.posexplode("part").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    flat = np.zeros(dim * dim + dim + 1)
    for r in summed:
        flat[r["pos"]] = r["s"]
    n = flat[-1]
    if n < 2:
        raise ValueError(f"pca_fit: need at least 2 rows, saw {int(n)}")
    G = flat[: dim * dim].reshape(dim, dim)
    s = flat[dim * dim: dim * dim + dim]
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T                      # k × d
    # sign convention: max-|entry| coordinate non-negative
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(comps, np.maximum(eigvals[order], 0.0), mean, int(n))


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append `proj` (array<double>, length k): centered projection onto
    the fitted components — one (batch × d) @ (d × k) matmul per Arrow
    batch. NULL vectors project to NULL."""
    C = model.components.T.copy()   # d × k
    mu = model.mean.copy()

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def _proj(vec: pd.Series) -> pd.Series:
        out = []
        mask = vec.notna()
        if mask.any():
            M = np.stack(vec[mask].to_numpy()).astype(np.float64)
            P = (M - mu) @ C
        pi = 0
        for ok in mask:
            if ok:
                out.append(P[pi].tolist())
                pi += 1
            else:
                out.append(None)
        return pd.Series(out)

    return df.withColumn("proj", _proj(F.col(vec_col)))


def embedding_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Centroid-distance outlier gate over an embedding column — the
    embedding-space analogue of the scalar quality filters: rows whose
    vectors sit far from the corpus centroid are mislabeled modalities,
    encoder failures, or spam clusters, and embedding-curation recipes
    drop or down-weight them before clustering / ANN indexing.

    Two-level statistic: per-row Euclidean distance to the global mean
    vector, then a z-score over the distance distribution; is_outlier
    flags z > z_threshold. A degenerate corpus (zero distance spread)
    has no scorable outliers — z NULL, flag 0 — and NULL vectors pass
    through unscored.

    Scale shape: the data never moves. Pass 1 computes the mean vector
    by posexplode + per-dimension avg (map-side partial agg shrinks the
    shuffle to d rows per task; d is model-sized by contract, enforced
    like pca_fit's metadata-size guards). The mean and the distance
    mean/stddev come back as DRIVER literals (d + 2 doubles — the same
    guarded metadata-collect contract as similarity.ivf), so the
    scoring pass is ONE codegen'd zip_with/aggregate projection per
    row: no joins, no Python. The (id, dist) projection is
    scoped_persist'd so the stats agg and the final select share one
    computation — two corpus scans total (mean pass, distance pass)."""
    v = F.col(vec_col)
    mean_rows = (
        df.select(F.posexplode(v).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    if not mean_rows:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} long, dist double, z double, is_outlier int"
        )
    mu = [r.m for r in sorted(mean_rows, key=lambda r: r.pos)]
    mu_lit = F.array(*[F.lit(float(m)) for m in mu])
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(v, mu_lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    from .cache import scoped_persist

    scored = scoped_persist(df.select(F.col(id_col), dist.alias("dist")))
    stats = scored.agg(
        F.avg("dist").alias("m"), F.stddev_samp("dist").alias("s")
    ).collect()[0]
    d_mean = float(stats.m) if stats.m is not None else None
    d_std = (
        float(stats.s)
        if stats.s is not None and stats.s > 0.0
        else None
    )
    if d_mean is None or d_std is None:
        z = F.lit(None).cast("double")
    else:
        z = F.round((F.col("dist") - F.lit(d_mean)) / F.lit(d_std), 4)
    return scored.select(
        id_col,
        F.round("dist", 4).alias("dist"),
        z.alias("z"),
        F.coalesce(
            (z > F.lit(float(z_threshold))).cast("int"), F.lit(0)
        ).alias("is_outlier"),
    )
