"""Rate-anomaly detection over event streams: per-group time-bucketed
counts scored by a trailing z-score.

Crawl operations need this constantly: a domain whose fetch-error
rate spikes, an event type whose volume collapses (a broken
extractor), a traffic burst that signals a crawler trap. The standard
first-line detector is the trailing z-score: bucket events into fixed
windows, compare each bucket's count to the mean/stddev of the
previous `trailing` buckets, flag |z| >= threshold.

Spark shape: ONE groupBy (group, time bucket) with map-side partial
counts — 10^12 events reduce to (groups x buckets) rows before the
shuffle — then one window pass per group ordered by bucket with a
ROWS BETWEEN -trailing AND -1 frame (no self-join, no driver state).
The frame is over OBSERVED buckets; silent gaps (a bucket with zero
events) are themselves the anomaly the count collapse surfaces.

Determinism: counts are integers; mean is an exact integer-sum
division; stddev is the only float-sensitive term and rides the
correctness gate's rounding.

Reference parity note: no counterpart in the reference — pipeline-
brief scope (crawl operations telemetry). Streaming twin: the same
groupBy(window(...)) aggregation runs under Structured Streaming with
a watermark (fuzi_spark/streaming.py's windowed-agg pattern); the
z-score pass stays a batch query over the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rate_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    bucket: str = "1 hour",
    trailing: int = 6,
    threshold: float = 3.0,
    min_history: int = 3,
) -> DataFrame:
    """(group, win_start, n, mu, sigma, z, is_anomaly) per observed
    (group, bucket). z is NULL (and is_anomaly false) until
    `min_history` trailing buckets exist or when sigma is 0/NULL —
    a cold start or a perfectly flat history cannot be scored, and
    pretending otherwise manufactures alerts."""
    counts = (
        events.groupBy(
            F.col(group_col).alias("grp"),
            F.window(F.col(ts_col), bucket)["start"].alias("win_start"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("win_start").asc())
        .rowsBetween(-int(trailing), -1)
    )
    scored = counts.select(
        "grp",
        "win_start",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count("n").over(w).alias("_hist"),
    )
    z = F.when(
        (F.col("_hist") >= int(min_history))
        & F.col("sigma").isNotNull()
        & (F.col("sigma") > 0),
        (F.col("n") - F.col("mu")) / F.col("sigma"),
    )
    return scored.select(
        F.col("grp").alias(group_col),
        "win_start",
        "n",
        "mu",
        "sigma",
        z.alias("z"),
        F.coalesce(
            F.abs(z) >= F.lit(float(threshold)), F.lit(False)
        ).alias("is_anomaly"),
    )
