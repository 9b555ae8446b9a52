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


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session assignment: a session breaks when the gap to the
    previous event exceeds gap_minutes. Pure window functions (lag +
    running sum) — the classic sessionization shape Catalyst executes as
    one sort per user partition."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond precision so gap comparisons are engine-exact (parquet ts
    # may be TIMESTAMP_NTZ; normalize first)
    tsl = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.lag(tsl).over(w)
    is_new = (gap.isNull() | ((tsl - gap) > gap_minutes * 60 * 1_000_000)).cast("long")
    sess = events.withColumn("session_id", F.sum(is_new).over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_id", "session_start", "session_end", "n_events")
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"


def _session_fn(gap_minutes: int):
    import pandas as pd

    gap_s = gap_minutes * 60

    def fn(key, pdf_iter, state):
        user_id = key[0]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                }
            )
            return
        ts = []
        for pdf in pdf_iter:
            ts.extend(int(t.timestamp()) for t in pdf["ts"])
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s:
                out["user_id"].append(user_id)
                out["session_start"].append(pd.Timestamp(start, unit="s"))
                out["session_end"].append(pd.Timestamp(last, unit="s"))
                out["n_events"].append(n)
                start, last, n = t, t, 1
            else:
                last = t
                n += 1
        state.update((start, last, n))
        state.setTimeoutTimestamp((last + gap_s) * 1000)
        yield pd.DataFrame(out)

    return fn


def sessionize_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    query_name: str = "sessions",
):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user session state (start, last, count) lives in the state store;
    sessions close when the event-time gap exceeds gap_minutes (emitted on
    the next event) or when the event-time timeout fires."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .withWatermark("ts", watermark)
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
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
