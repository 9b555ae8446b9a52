"""Deterministic sequence packing (context-window assembly).

Pre-training batches are fixed-size token windows; packing assigns each
document to a pack so that packs hold ~budget tokens. The classic greedy
packer is sequential state — unusable at 10^12 docs — so this implements
QUOTA packing, the closed-form rule every distributed pipeline actually
ships:

    bucket   = a deterministic hash bucket of the doc key
    prev_cum = running token total over docs BEFORE this one
               (per bucket, keyed order)
    pack_id  = floor(prev_cum / budget)

i.e. pack boundaries sit at exact multiples of `budget` in the
cumulative token stream and a doc belongs to the pack where it STARTS.
Consequences (pinned in tests): a pack's token sum can overshoot budget
by at most one document; a doc longer than the budget gets its own
pack range; packs within a bucket are dense 0..K and contiguous in key
order. Everything is a pure function of (key, tokens, budget, bucket),
so re-runs, resumes, and cluster-size changes reproduce the identical
packing — the property RNG/state-based packers lack.

Scale shape: ONE shuffle (hash-partition by bucket) over metadata-width
rows (key + token count — never the text), then a per-bucket window
sort. A window partition materializes in a single task, so `n_buckets`
must scale with the corpus: size buckets to ~10^5-10^6 docs (at 10^12
docs, n_buckets ≈ 10^6-10^7). Cross-bucket quota loss is at most one
underfilled pack per bucket — negligible at that bucket size.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    key_col: str = "doc_id",
    bucket: Optional[Column] = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every doc a (bucket, pack_id) under quota packing.

    Returns the input columns plus (bucket:int, pack_id:long,
    pack_pos:long) — pack_pos is the doc's 0-based position inside its
    pack, so a downstream writer can lay out pack contents in order
    without re-sorting.

    `bucket` defaults to pmod(xxhash64(key), n_buckets); pass an
    explicit Column to co-locate packing with an existing layout (or,
    in tests, to make the bucket oracle-recomputable).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    b = (
        bucket
        if bucket is not None
        else F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("bucket", b.cast("int"))
        .withColumn(
            "_prev_cum",
            F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col),
        )
        .withColumn(
            # integer division, not floor(double): exact at ANY per-
            # bucket cumulative size (doubles misplace boundaries past
            # 2^53); _prev_cum >= 0 so div == floor
            "pack_id",
            F.expr(f"_prev_cum div {int(budget)}").cast("long"),
        )
    )
    wp = (
        Window.partitionBy("bucket", "pack_id")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        out.withColumn("pack_pos", (F.count("*").over(wp) - 1).cast("long"))
        .drop("_prev_cum")
    )
