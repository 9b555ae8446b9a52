"""Structured-Streaming operators beyond the extraction job.

The reference is batch-parse only (SURVEY.md §2.8); these are the
pipeline-level streaming capabilities a continuous ingest needs —
watermarked tumbling-window aggregation over an event stream, expressed
with the built-in streaming operators (no custom state)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 day") -> DataFrame:
    """Tumbling-window counts + integer-cent sums per event_type.

    Works on both batch and streaming DataFrames (same plan shape); the
    streaming caller adds the watermark. Sums are aggregated in integer
    cents so results are bit-stable across engines and retries."""
    return (
        events.groupBy(
            F.window("ts", window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_cents",
        )
    )


def streaming_windowed_events(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    window: str = "1 day",
    watermark: str = "2 days",
    query_name: str = "windowed_events",
):
    """Watermarked streaming variant: late events beyond `watermark` are
    dropped, finalized windows are appended. availableNow for backfills."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = spark.readStream.schema(schema).parquet(input_path)
    agg = windowed_event_counts(stream.withWatermark("ts", watermark), window)
    return (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
