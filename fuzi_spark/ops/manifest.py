"""Content-addressed shard manifests + manifest diffing.

Reproducibility bookkeeping for a corpus that is rebuilt continuously:
after every pipeline run, reduce each output shard to a constant-width
fingerprint row — doc count, char mass, an ORDER-INVARIANT content
hash, and the id range. Two runs produced the same corpus iff their
manifests are equal; when they differ, the diff names the shards to
re-validate or re-publish, without reading a single document byte from
the unchanged ones. This is the cheap answer to "did the refactor
change the data?" — the span-level verification join answers it
per-document, the manifest answers it per-shard at metadata cost.

Design choices:
- shard routing and the row digest both use the engine-portable md5
  device shared with sampling.py/sketch.py (first-N hex chars as an
  integer; DuckDB twin ('0x' || substr(md5(x), 1, N))::BIGINT), so the
  whole manifest is reproducible by ANY engine, not just this one —
  a manifest only helps if both sides of a comparison can compute it;
- the content hash is bit_xor of 60-bit row digests: order-invariant
  (shard contents have no canonical order after a shuffle) and
  overflow-free, paired with n_docs because xor alone cancels
  duplicate PAIRS (xor of two equal digests is 0 — count catches the
  cardinality change in the swap scenarios that matter);
- one corpus scan, one groupBy(shard_id) with map-side partials;
  output cardinality = n_shards (metadata-sized at any corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HEX_DIGITS = 15  # 60-bit digests: always positive in an int64


def _digest(*cols) -> F.Column:
    """60-bit portable row digest of the concatenated columns."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, _HEX_DIGITS),
        16,
        10,
    ).cast("bigint")


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One fingerprint row per shard: (shard_id int, n_docs bigint,
    n_chars bigint, content_hash bigint, min_id string, max_id string).

    Shard routing = portable md5 bucket of the doc id (content-
    addressed: a doc lands in the same shard in every run, so diffs
    localize to the shards whose documents actually changed)."""
    sid = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % n_shards
    ).cast("int")
    return (
        docs.select(
            sid.alias("shard_id"),
            F.col(id_col).cast("string").alias("_id"),
            F.coalesce(F.col(text_col), F.lit("")).alias("_t"),
        )
        .withColumn("_h", _digest(F.col("_id"), F.col("_t")))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("_t")).alias("n_chars"),
            F.expr("bit_xor(_h)").alias("content_hash"),
            F.min("_id").alias("min_id"),
            F.max("_id").alias("max_id"),
        )
    )


def manifest_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Shard-level drift report between two manifests: one row per
    shard present in either, status in {'same','changed','added',
    'removed'} — 'added'/'removed' mean the shard exists in only one
    manifest; 'changed' means any fingerprint field moved. Full outer
    join on shard_id: both sides are n_shards rows, so this is a
    metadata-sized operation regardless of corpus size."""
    o = old.select(
        "shard_id",
        F.struct("n_docs", "n_chars", "content_hash").alias("_o"),
    )
    n = new.select(
        "shard_id",
        F.struct("n_docs", "n_chars", "content_hash").alias("_n"),
    )
    return (
        o.join(n, "shard_id", "full_outer")
        .select(
            "shard_id",
            F.when(F.col("_o").isNull(), F.lit("added"))
            .when(F.col("_n").isNull(), F.lit("removed"))
            .when(F.col("_o") == F.col("_n"), F.lit("same"))
            .otherwise(F.lit("changed"))
            .alias("status"),
            F.col("_o.n_docs").alias("old_docs"),
            F.col("_n.n_docs").alias("new_docs"),
        )
    )
