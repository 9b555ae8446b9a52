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


def chunk_documents(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size overlapping character windows —
    the segmentation step before embedding / sequence packing when the
    unit of training is a chunk, not a whole document.

    Chunk i covers [i*stride, i*stride + size) with stride = size −
    overlap; n_chunks = ceil((len − overlap) / stride), floored at 1 so
    EVERY input row survives (an empty/short doc yields one chunk of
    itself — droppable downstream, never silently lost). Output: the id
    plus (chunk_id:int, offset:long 0-based char offset, chunk:string);
    total, deterministic, a pure function of (text, size, overlap).

    Scale shape: ZERO shuffles — the chunk array is built in one
    codegen'd projection and exploded map-side. The full text is bound
    once (hof.bind) and DROPPED before the explode: the generator emits
    (chunk_id, offset, chunk) structs only, so a 10 MB document does
    not ride along with each of its ~100 chunk rows through the
    generate. n_chunks = floor((len − overlap + stride − 1) / stride)
    in doubles — exact here because a single document's char length is
    < 2^31 ≪ 2^53 (pack_id above cannot use this shortcut: its operand
    is a cross-document cumulative sum that does pass 2^53).
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got overlap={overlap}")
    stride = size - overlap

    def mk(text):
        n = F.greatest(
            F.lit(1).cast("long"),
            F.floor(
                (F.length(text) - F.lit(overlap) + F.lit(stride - 1))
                / F.lit(stride)
            ).cast("long"),
        )
        return F.transform(
            F.sequence(F.lit(0).cast("long"), n - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                (i * stride).cast("long").alias("offset"),
                text.substr(
                    (i * stride + 1).cast("int"), F.lit(size)
                ).alias("chunk"),
            ),
        )

    from .hof import bind

    chunks = bind(F.coalesce(F.col(text_col), F.lit("")), mk)
    return (
        df.withColumn("_chunks", chunks)
        .drop(text_col)
        .select(id_col, F.explode("_chunks").alias("_c"))
        .select(id_col, "_c.chunk_id", "_c.offset", "_c.chunk")
    )


def materialize_packs(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    tokens_col: str = "n_tokens",
    key_col: str = "doc_id",
    bucket: Optional[Column] = None,
    n_buckets: int = 64,
    sep: str = "\n\n",
) -> DataFrame:
    """pack_sequences' assignment turned into the actual trainer input:
    one row per (bucket, pack_id) with the member documents concatenated
    in pack_pos order. Returns (bucket:int, pack_id:long, text:string,
    n_docs:long, n_tokens:long).

    Scale shape: pack_sequences' ONE bucket-keyed window shuffle (this
    time carrying the text — materialization is the step where the
    bytes must move), then a (bucket, pack_id)-keyed agg that collects
    each pack's members. A pack holds ~budget tokens by construction,
    so the collected group is bounded by the budget, not by the corpus
    — no unbounded collect_list. Determinism: members sort by
    (pack_pos) inside the aggregate, so output text is a pure function
    of (corpus, budget, bucket), same as the assignment.
    """
    packed = pack_sequences(
        df, budget, tokens_col=tokens_col, key_col=key_col,
        bucket=bucket, n_buckets=n_buckets,
    )
    members = F.array_sort(
        F.collect_list(
            F.struct(F.col("pack_pos"), F.col(text_col).alias("t"))
        )
    )
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.array_join(
                F.transform(members, lambda m: m["t"]), sep
            ).alias("text"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum(tokens_col).cast("long").alias("n_tokens"),
        )
    )


def epoch_order(
    df: DataFrame,
    epoch: int,
    key_cols: tuple[str, ...] = ("bucket", "pack_id"),
    salt: str = "fuzi-epoch",
    n_buckets: int = 4096,
) -> DataFrame:
    """Deterministic global shuffle order for one training epoch: adds
    (epoch:int, epoch_pos:long) where epoch_pos is the row's 0-based
    position in the epoch's permutation. The permutation is the sort
    order of md5(salt:epoch:key) — content-stable pseudo-randomness, so
    every epoch reshuffles differently yet any re-run (or resumed job)
    reproduces the identical order with no RNG state to checkpoint.

    Scale shape: a global position normally means a global sort, but a
    total-order `Window.orderBy` collapses into ONE task. Instead the
    hash's leading hex digits define `n_buckets` contiguous hash ranges
    (bucket b holds exactly the rows whose order-hash starts with b's
    prefix, so bucket order IS global order); positions are then
    offset[bucket] + rank-within-bucket, where the offsets come from a
    metadata-sized per-bucket count aggregate broadcast back. One hash
    shuffle + one tiny agg, every bucket an independent task — same
    layout as pack_sequences, and byte-identical to the single-task
    ROW_NUMBER (pinned by a differential test).

    md5 ties are broken by the key columns, so the order is total even
    on (astronomically unlikely) hash collisions.
    """
    if not (1 <= n_buckets <= 16**6):
        raise ValueError(f"n_buckets must be in [1, 16^6], got {n_buckets}")
    hexw = max(len(format(n_buckets - 1, "x")), 1)
    h = F.md5(
        F.concat_ws(
            ":",
            F.lit(salt),
            F.lit(int(epoch)).cast("string"),
            *[F.col(c).cast("string") for c in key_cols],
        )
    )
    # bucket = the hash's leading hex digits scaled into [0, n_buckets):
    # a PREFIX of the sort key, so (bucket, h) order == h order
    b = (F.conv(F.substring(h, 1, hexw), 16, 10).cast("long") * n_buckets) / (
        16**hexw
    )
    rows = df.withColumn("_eh", h).withColumn("_eb", b.cast("int"))
    counts = rows.groupBy("_eb").count()
    woff = (
        Window.orderBy("_eb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the offsets window runs over <= n_buckets metadata rows — the one
    # place a single-task sort is the RIGHT plan
    offsets = counts.select(
        "_eb", (F.sum("count").over(woff) - F.col("count")).alias("_off")
    )
    wrank = Window.partitionBy("_eb").orderBy(
        "_eh", *[F.col(c).cast("string") for c in key_cols]
    )
    return (
        rows.join(F.broadcast(offsets), "_eb")
        .withColumn(
            "epoch_pos",
            (F.col("_off") + F.row_number().over(wrank) - 1).cast("long"),
        )
        .withColumn("epoch", F.lit(int(epoch)))
        .drop("_eh", "_eb", "_off")
    )


def balanced_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Weight-balanced shard assignment: adds (size_rank:long,
    shard:int) so the output files a writer produces from
    `partitionBy(shard)` come out near-equal in total weight.

    The rule is the deterministic longest-processing-time layout:
    docs in (weight desc, id) order deal boustrophedon across the
    shards — positions 0..n-1 go to shards 0..n-1, positions n..2n-1
    come BACK n-1..0, and so on. The return pass cancels the forward
    pass's bias (shard 0 got the heaviest doc, so it receives the
    lightest of the next wave), giving the classic near-LPT balance
    without any sequential bin state.

    Scale shape: a global weight rank normally means a global sort;
    like epoch_order, the single-task total-order window is replaced
    by order-aligned buckets + broadcast offsets — but here the
    buckets are VALUE RANGES of the sort key (epoch_order's
    hash-prefix trick only works for uniform keys). Range boundaries
    come from percentile_approx over the weights: the boundaries only
    need to be order-ALIGNED cut points, not exact quantiles, because
    ranks are offset[bucket] + rank-within-bucket regardless of where
    the cuts land — approximation shifts work between tasks, never
    the answer (pinned by a ROW_NUMBER differential). Equal weights
    always land in the same bucket, so the (weight desc, id) tie
    order stays total within one window partition.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # ascending sort key: heaviest first, ties on id
    key = -F.col(weight_col).cast("long")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        set(
            df.select(
                F.percentile_approx(
                    key, F.array(*[F.lit(f) for f in fracs]), 2500
                ).alias("b")
            ).first()["b"]
            or []
        )
    )
    # bucket = number of boundaries strictly below the key: equal keys
    # share a bucket, bucket order == key order
    b_arr = F.array(*[F.lit(int(b)) for b in bounds]) if bounds else F.array().cast("array<long>")
    bucket = F.size(F.filter(b_arr, lambda x: x < key))
    rows = df.withColumn("_sk", key).withColumn("_sb", bucket)
    counts = rows.groupBy("_sb").count()
    woff = Window.orderBy("_sb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "_sb", (F.sum("count").over(woff) - F.col("count")).alias("_off")
    )
    wrank = Window.partitionBy("_sb").orderBy("_sk", id_col)
    pos = F.col("_off") + F.row_number().over(wrank) - 1
    wave = pos % (2 * n_shards)
    shard = F.when(wave < n_shards, wave).otherwise(
        2 * n_shards - 1 - wave
    )
    return (
        rows.join(F.broadcast(offsets), "_sb")
        .withColumn("size_rank", pos.cast("long"))
        .withColumn("shard", shard.cast("int"))
        .drop("_sk", "_sb", "_off")
    )


def length_buckets(
    df: DataFrame,
    len_col: str,
    n_buckets: int = 4,
    token_budget: int = 8192,
    n_bins: int = 128,
    lo: int = 0,
    width: int = 8,
) -> DataFrame:
    """Bucketed-batching plan + padding accounting — the "how much
    does length-bucketing save us" table a training-prep pipeline
    reports before materializing batches. Sequences batched at a
    single global max length pad every short row to the longest
    (the classic padding-waste problem); equal-DEPTH length buckets
    (boundaries = histogram-sketch quantiles at i/n_buckets) pad each
    row only to its bucket cap.

    Per bucket: (cap, n_rows, batch_size, n_batches, pad_tokens,
    flat_pad_tokens, saved_tokens) where batch_size =
    max(token_budget div cap, 1), n_batches = ceil-div, pad_tokens =
    Σ(cap − len), flat_* the same against the global cap. Integer
    arithmetic end to end — the oracle replays it bit-for-bit.

    Scale shape: one histogram pass (map-side partials), quantile
    algebra on the ≤ n_bins-row table, caps shipped as ONE broadcast
    single-row array, bucket assignment a codegen'd array_min(filter)
    probe, final stats one |buckets|-row groupBy. Zero sorts, zero
    driver round-trips. Caps are bin-granular (the sketch contract);
    tight distributions may dedupe adjacent quantile caps, collapsing
    buckets — reported as-is rather than fabricating empty ones."""
    from .sketch import histogram_quantiles, histogram_sketch

    rows = df.filter(F.col(len_col).isNotNull()).withColumn(
        "_g", F.lit("all")
    )
    hist = histogram_sketch(rows, len_col, "_g", n_bins, lo, width)
    qs = tuple(i / n_buckets for i in range(1, n_buckets + 1))
    quant = histogram_quantiles(hist, qs, lo, width)
    caps = quant.agg(
        F.array_sort(
            F.array_distinct(F.collect_list(F.col("value_hi") - 1))
        ).alias("caps")
    )
    withcaps = rows.crossJoin(F.broadcast(caps))
    # clamp into the histogram domain (outliers pad as domain-cap
    # rows — the same edge-bin clamp the sketch applied to them)
    v = F.least(
        F.col(len_col).cast("long"),
        F.lit(lo + n_bins * width - 1).cast("long"),
    )
    cap = F.array_min(F.filter("caps", lambda c: c >= v))
    assigned = withcaps.select(
        v.alias("_len"),
        cap.alias("cap"),
        F.array_max("caps").alias("_gcap"),
    )
    bs = F.greatest(
        F.expr(f"CAST({token_budget} AS BIGINT) div cap"), F.lit(1)
    )
    return (
        assigned.groupBy("cap")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("cap") - F.col("_len")).alias("pad_tokens"),
            F.sum(F.col("_gcap") - F.col("_len")).alias(
                "flat_pad_tokens"
            ),
        )
        .select(
            "cap",
            "n_rows",
            bs.alias("batch_size"),
            F.expr(
                "CAST((n_rows + "
                f"greatest(CAST({token_budget} AS BIGINT) div cap, 1)"
                " - 1) div "
                f"greatest(CAST({token_budget} AS BIGINT) div cap, 1)"
                " AS BIGINT)"
            ).alias("n_batches"),
            "pad_tokens",
            "flat_pad_tokens",
            (F.col("flat_pad_tokens") - F.col("pad_tokens")).alias(
                "saved_tokens"
            ),
        )
    )
