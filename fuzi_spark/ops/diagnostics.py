"""Job-shape diagnostics: predict partition skew BEFORE paying for it.

At 10^12 rows the difference between a job that finishes and one that
straggles for hours is usually one skewed key. `skew_report` computes
the per-partition load a hash-partitioned shuffle WILL produce — row
counts, distinct keys, the heaviest key, and an optional weight column
(bytes) — from a cheap aggregation, so the operator that owns the big
exchange can be re-keyed/salted/AQE-tuned before it runs.

Two hashers:
- 'spark': pmod(hash(key), n) — `F.hash` IS the Murmur3(seed 42) that
  Spark's HashPartitioning uses, so the reported bucket equals the
  physical partition id a `repartition(n, key)` would assign. Pinned
  against actual `spark_partition_id()` in tests.
- 'md5': the repo's cross-engine md5-prefix bucket (same contract as
  ops/sampling.py), so the driver's DuckDB oracle replays the whole
  report relationally.

Shape: groupBy(bucket, key) with map-side partial counts, then one
bucket-keyed window + agg over the PER-KEY table — every exchange
carries metadata-width rows (bucket, key, partials), never the data."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cache import scoped_persist


def bucket_col(key, n_buckets: int, hasher: str = "spark"):
    key = key.cast("string")
    if hasher == "spark":
        return F.pmod(F.hash(key), F.lit(n_buckets)).cast("int")
    if hasher == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint"),
            F.lit(n_buckets),
        ).cast("int")
    raise ValueError(f"unknown hasher: {hasher}")


def skew_report(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    weight_col: str = None,
    hasher: str = "spark",
) -> DataFrame:
    """Per-bucket load report for a prospective hash-partitioning on
    `key_col`: (bucket, n_rows, n_keys, max_key, max_key_rows,
    total_weight). max_key is the heaviest key in the bucket (ties →
    lexicographically smallest, deterministic); total_weight sums
    `weight_col` when given (bytes, token counts) else equals n_rows.
    A bucket whose n_rows is many × the mean — or whose max_key_rows
    approaches its n_rows — is the straggler to salt.

    The corpus is reduced to (bucket, key, count, weight) in ONE
    map-side-combinable shuffle; the totals agg and the heaviest-key
    window both run over that metadata-width table (persisted once)."""
    key = F.col(key_col).cast("string")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    per_key = scoped_persist(
        df.select(
            bucket_col(key, n_buckets, hasher).alias("bucket"),
            key.alias("_k"),
            w.alias("_w"),
        )
        .groupBy("bucket", "_k")
        .agg(F.count(F.lit(1)).alias("_kn"), F.sum("_w").alias("_kw"))
    )
    totals = per_key.groupBy("bucket").agg(
        F.sum("_kn").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_kw").alias("total_weight"),
    )
    win = Window.partitionBy("bucket").orderBy(
        F.col("_kn").desc(), F.col("_k").asc()
    )
    heavy = (
        per_key.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") == 1)
        .select(
            "bucket",
            F.col("_k").alias("max_key"),
            F.col("_kn").alias("max_key_rows"),
        )
    )
    return totals.join(heavy, "bucket").select(
        "bucket", "n_rows", "n_keys", "max_key", "max_key_rows",
        "total_weight",
    )


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    ps: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT per-group quantiles of a numeric column — the corpus
    profiling pass behind length cutoffs, context-window sizing, and
    outlier trims. Quantile convention: lower interpolation, the value
    at 1-based rank floor(p*(n-1)) + 1 — rank arithmetic only, so any
    engine replays it bit-for-bit (midpoint-interpolating definitions
    drag float division into the answer).

    Output: (group..., n, q<p> per requested p — e.g. q50, q90, q99).

    Shape: ONE window sort per group + one map-side-combinable
    groupBy (conditional max at the target ranks). Exactness costs
    the per-group sort: that is the honest price of exact order
    statistics (percentile_approx trades it away with a sketch) —
    use this for audits and bounded group counts; the groups
    themselves parallelize freely."""
    gs = [F.col(g) for g in group_cols]
    # no tie-break needed: rank assignment among equal values is
    # arbitrary, but the VALUE at any rank inside a tie run is the tie
    # value itself — the output is deterministic even though row_number
    # is not
    w = Window.partitionBy(*gs).orderBy(F.col(value_col).asc())
    ranked = (
        df.select(*gs, F.col(value_col))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count("*").over(Window.partitionBy(*gs))
        )
    )
    aggs = [F.max("_n").alias("n")]
    for p in ps:
        target = (
            F.floor(F.lit(float(p)) * (F.col("_n") - 1).cast("double"))
            + 1
        )
        label = f"q{int(round(p * 100))}"
        aggs.append(
            F.max(
                F.when(F.col("_rn") == target, F.col(value_col))
            ).alias(label)
        )
    return ranked.groupBy(*gs).agg(*aggs)


def rollup_report(
    df: DataFrame,
    dims: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
    use_cube: bool = False,
) -> DataFrame:
    """Hierarchical corpus report in ONE pass: per-(dims...) cells plus
    every rollup subtotal and the grand total — the dataset-card table
    (docs/chars by source, by source+language, overall) that would
    otherwise take len(dims)+1 separate scans of a 10^12-row corpus.

    ROLLUP (default) emits prefix subtotals — (a,b), (a), () — the
    hierarchy reading; `use_cube` emits every dim subset for the
    cross-tab reading. Either way Catalyst plans ONE scan: an Expand
    node replicates each row once per grouping set map-side, partial
    hash aggregation collapses the replicas BEFORE the single exchange,
    so the shuffle carries |cells| partial rows, not |corpus| * levels.

    `level` is grouping_id (bit i set = dims[i] rolled up) — the
    unambiguous subtotal marker; dims are also coalesced to the
    '(total)' sentinel so subtotal rows read naturally AND real NULL
    dim values can't collide with rolled-up NULLs.
    """
    gcols = [F.coalesce(F.col(d).cast("string"), F.lit("(null)")).alias(d)
             for d in dims]
    base = df.select(
        *gcols, F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_len")
    )
    grouped = base.cube(*dims) if use_cube else base.rollup(*dims)
    agg = grouped.agg(
        F.grouping_id().cast("int").alias("level"),
        F.count("*").alias("n_docs"),
        F.sum("_len").alias("n_chars"),
        (F.sum("_len") / F.count("*")).alias("avg_chars"),
    )
    return agg.select(
        *[F.coalesce(F.col(d), F.lit("(total)")).alias(d) for d in dims],
        "level",
        "n_docs",
        "n_chars",
        "avg_chars",
    )


_POISSON1_CUM = (
    0.36787944117144233,  # P(X=0), e^-1
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def _poisson1_weight(u):
    """Poisson(1) draw from a uniform via the inverse CDF — literal
    double thresholds (identical constants in any engine), capped at
    7 (P ≈ 8e-5 beyond; the tail's effect on a bootstrap is nil)."""
    from pyspark.sql import functions as F

    expr = F.lit(len(_POISSON1_CUM))
    for k in range(len(_POISSON1_CUM) - 1, -1, -1):
        expr = F.when(u < F.lit(_POISSON1_CUM[k]), F.lit(k)).otherwise(
            expr
        )
    return expr.cast("int")


def poisson_bootstrap(
    df,
    value_col: str,
    key_col: str = "doc_id",
    n_replicates: int = 16,
    salt: str = "boot",
):
    """Error bars for a corpus SUM without resampling the corpus —
    the Poisson bootstrap (Chamandy et al., Google 2012): replicate r
    re-weights every row by an independent Poisson(1) count, and the
    spread of the replicate sums estimates the metric's sampling
    variability. The classic multinomial bootstrap needs the total
    count up front and a shared draw — impossible streaming/sharded;
    Poisson(1) weights are per-row-independent, so the whole thing is
    ONE scan with R extra sum aggregates (map-side partials, zero
    extra shuffles), and replicate weights are content-stable
    (md5(salt:r:key)) so the bars reproduce bit-identically.

    INTEGER values contract: replicate sums stay exact longs; only
    the final mean/std are doubles (spelled left-assoc, replayed
    identically by the oracle). Returns ONE row: exact_sum,
    s_0..s_{R-1}, boot_mean, boot_std (population, over replicates),
    rel_err = boot_std / exact_sum."""
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("long")
    sums = [F.sum(v).alias("exact_sum")]
    for r in range(n_replicates):
        q = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(salt),
                        F.lit(str(r)),
                        F.col(key_col).cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        u = (q.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
        sums.append(
            F.sum(_poisson1_weight(u).cast("long") * v).alias(f"s_{r}")
        )
    one = df.filter(v.isNotNull()).agg(*sums)
    # mean/std over the R replicate columns, left-assoc spelling
    mean = F.col("s_0").cast("double")
    for r in range(1, n_replicates):
        mean = mean + F.col(f"s_{r}").cast("double")
    mean = mean / F.lit(float(n_replicates))
    out = one.withColumn("boot_mean", mean)
    var = (
        F.col("s_0").cast("double") - F.col("boot_mean")
    ) * (F.col("s_0").cast("double") - F.col("boot_mean"))
    for r in range(1, n_replicates):
        d = F.col(f"s_{r}").cast("double") - F.col("boot_mean")
        var = var + d * d
    var = var / F.lit(float(n_replicates))
    return out.select(
        "exact_sum",
        *[f"s_{r}" for r in range(n_replicates)],
        "boot_mean",
        F.sqrt(var).alias("boot_std"),
        (F.sqrt(var) / F.col("exact_sum").cast("double")).alias(
            "rel_err"
        ),
    )
