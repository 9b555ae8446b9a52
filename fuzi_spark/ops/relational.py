"""Time-series / layout relational operators Spark lacks as builtins:
as-of join, range (interval) join, CDC merge-upsert, and Z-order
layout planning.

These are the table-maintenance operators a 100 TB training-data lake
needs around the extraction engine: align crawl events with the most
recent fetch metadata (as-of), attach points to intervals without a
cartesian explosion (range join), fold a recrawl snapshot into the
corpus with latest-wins semantics (merge-upsert), and cluster files so
two-dimensional predicates prune (Z-order).

Every operator is pure Catalyst — no Python UDFs — and each one's
shuffle story is written next to it, because the shape IS the product:
an as-of join that degenerates into a per-key cross join or a range
join that falls back to broadcast-nested-loop would both melt at
scale.

Reference parity note: the reference (kylehughes/Fuzi,
/root/reference/Sources) is a parse/query library with no relational
surface (SURVEY.md §2.8) — these are pipeline-brief scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    TimestampNTZType,
    TimestampType,
)


def _ts_as_double(df: DataFrame, col: str):
    """Epoch seconds (fractional micros kept) for timestamp columns,
    plain double cast for numerics. TIMESTAMP_NTZ refuses a direct
    double cast in Spark 4; routing it through TIMESTAMP interprets
    the wall time in the session timezone — this engine pins UTC
    everywhere (bench.py/job.py/tests), matching the oracle's
    epoch()."""
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


# --------------------------------------------------------------- as-of join

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    tolerance: float | None = None,
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: for every left row, attach the payload of the
    nearest right row with the same key at-or-before its timestamp
    (`direction="backward"`, the market-data default) or at-or-after
    (`"forward"`). Left rows with no admissible partner keep NULL
    payloads (left-outer semantics).

    Implementation is the UNION-MERGE shape, not a join: tag both
    sides, union, and run ONE window per key ordered by timestamp in
    which right-side payload values are carried across left rows with
    `last(ignorenulls=True)`. At equal timestamps the right row sorts
    first, so "at-or-before" is inclusive.

    Scale shape: exactly one hash exchange on the key plus an
    in-partition sort — the sort-merge-join cost envelope, with NO
    per-key blowup: a key with a million left rows and a million right
    rows costs O(n log n) in the sort, where a naive
    `l.ts >= r.ts` theta-join costs O(n^2). This is the classic
    carry-forward trick (the same shape Flink's event-time operators
    and kdb's aj use); Spark has no asof primitive, so the engine
    composes one from union + window.

    `tolerance` (in the timestamp's native unit — seconds for
    timestamps, plain difference for numerics) nulls out matches
    further than the bound, preserving the row.

    Right rows must be unique per (key, ts) — pre-aggregate otherwise
    (ambiguous same-instant payloads have no deterministic winner).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    payload = list(payload or [c for c in right.columns
                               if c not in (on, right_ts)])
    lstruct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    l2 = left.select(
        lstruct,
        F.col(on).alias("_k"),
        _ts_as_double(left, left_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(right.schema[p].dataType).alias(f"_p_{p}")
            for p in payload
        ],
    )
    r2 = right.select(
        F.lit(None).cast(l2.schema["_l"].dataType).alias("_l"),
        F.col(on).alias("_k"),
        _ts_as_double(right, right_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(p).alias(f"_p_{p}") for p in payload],
    )
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").desc()]
    else:
        order = [F.col("_t").desc(), F.col("_side").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"_p_{p}", ignorenulls=True).over(w).alias(f"_c_{p}")
        for p in payload
    ]
    match_t = F.last(
        F.when(F.col("_side") == 1, F.col("_t")), ignorenulls=True
    ).over(w).alias("_mt")
    u = l2.unionByName(r2).select("_l", "_side", "_t", match_t, *carried)
    out = u.filter(F.col("_side") == 0)
    if tolerance is not None:
        ok = F.abs(F.col("_t") - F.col("_mt")) <= F.lit(float(tolerance))
    else:
        ok = F.col("_mt").isNotNull()
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols += [
        F.when(ok, F.col(f"_c_{p}")).alias(f"{prefix}{p}") for p in payload
    ]
    cols.append(
        F.when(ok, F.col("_mt")).alias(f"{prefix}{left_ts}_matched")
    )
    return out.select(*cols)


# -------------------------------------------------------------- range join

def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    max_bins_per_interval: int = 4096,
) -> DataFrame:
    """Interval-containment join: every (point, interval) pair with
    lo <= point <= hi, WITHOUT the broadcast-nested-loop plan Spark
    picks for a raw inequality join (O(points x intervals) compares —
    a cartesian in disguise).

    Binning strategy: quantize the axis into `bin_width` cells; a
    point lands in exactly one cell, an interval explodes into the
    cells it overlaps, and containment becomes an EQUI-join on the
    cell id plus a residual filter. Each qualifying pair is produced
    exactly once (the point's single cell), so no dedup pass.

    Scale shape: one hash exchange each side on the cell id; the
    interval fan-out is bounded by (hi-lo)/bin_width + 1, checked
    up-front with a metadata-sized aggregate on the intervals side
    (raises rather than silently planning a 10^6-way explode — pick
    bin_width near the median interval length). Cell skew (many
    intervals stacked on one hot cell) is ordinary join skew: AQE's
    skew-join split applies, nothing bespoke.
    """
    wdt = float(bin_width)
    if wdt <= 0:
        raise ValueError("bin_width must be positive")
    lo_bin = F.floor(F.col(lo_col) / wdt).cast("long")
    hi_bin = F.floor(F.col(hi_col) / wdt).cast("long")
    worst = intervals.agg(
        F.max(hi_bin - lo_bin + 1).alias("m")
    ).collect()[0]["m"]
    if worst is not None and worst > max_bins_per_interval:
        raise ValueError(
            f"range_join fan-out {worst} bins exceeds cap "
            f"{max_bins_per_interval}: raise bin_width (intervals are "
            f"wider than the bin grid) or the cap"
        )
    iv = intervals.withColumn("_cell", F.explode(F.sequence(lo_bin, hi_bin)))
    pt = points.withColumn(
        "_cell", F.floor(F.col(point_col) / wdt).cast("long")
    )
    return (
        pt.join(iv, "_cell")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_cell")
    )


# ------------------------------------------------------------ merge-upsert

def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """CDC latest-wins merge (the MERGE INTO kernel): fold an updates
    snapshot into a base table — per key keep the row with the highest
    `version_col` (updates beat base on version ties), and drop keys
    whose winning update carries `delete_col = true`.

    This is how a recrawl lands on the corpus: base = current docs,
    updates = freshly extracted rows stamped with the crawl timestamp,
    deletes = pages that now 404. On Iceberg in production the same
    semantics is `MERGE INTO`; this operator IS that kernel expressed
    as union + one window, for engines/sinks without a MERGE (plain
    parquet dev surface), and it is what guarantees idempotent
    re-application: re-merging the same updates batch is a no-op.

    Scale shape: one hash exchange on the key, rank-1 filter pushed by
    Catalyst into WindowGroupLimit (top-1 per key computed map-side
    before the shuffle) — never a driver-side diff.
    """
    upd = updates
    if delete_col is None:
        delete_col = "_is_delete"
        upd = upd.withColumn(delete_col, F.lit(False))
    b2 = base.withColumn(delete_col, F.lit(False)).withColumn(
        "_src", F.lit(0)
    )
    u2 = upd.withColumn("_src", F.lit(1))
    w = Window.partitionBy(key_col).orderBy(
        F.col(version_col).desc(), F.col("_src").desc()
    )
    return (
        b2.unionByName(u2)
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (~F.col(delete_col)))
        .drop("_rn", "_src", delete_col)
    )


# ------------------------------------------------------------ z-order layout

_SPREAD_STEPS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(col):
    """Interleave-prep: spread a 16-bit int so its bits occupy the even
    positions of a 32-bit word (classic Morton magic-number ladder).
    Pure JVM bit arithmetic — stays inside whole-stage codegen."""
    c = col.cast("long")
    for shift, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def zorder_value(x_col, y_col, x_min, x_max, y_min, y_max, bits: int = 16):
    """Morton/Z-value of two numeric columns, each affinely quantized
    to `bits` bits over [min, max]. Quantization is INTEGER arithmetic
    — ((v - lo) * (2^bits - 1)) div (hi - lo) — so any engine replays
    it bit-for-bit (no float rounding at cell boundaries). x occupies
    the even bit positions, y the odd."""
    if bits > 16:
        raise ValueError("bits > 16 would overflow the 32-bit spread")
    top = (1 << bits) - 1

    def _q(c, lo, hi):
        span = int(hi) - int(lo)
        if span <= 0:
            return F.lit(0).cast("long")
        v = (c.cast("long") - F.lit(int(lo))) * F.lit(top)
        # exact integer division portable across engines: subtract the
        # remainder first so the double division is exact-integer-valued
        # (a raw v/span floor can flip at cell boundaries by one ulp)
        q = ((v - F.pmod(v, F.lit(span))) / F.lit(span)).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit(top), q))

    zx = _spread_bits(_q(x_col, x_min, x_max))
    zy = _spread_bits(_q(y_col, y_min, y_max))
    return zx.bitwiseOR(F.shiftleft(zy, 1))


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_min: int,
    x_max: int,
    y_min: int,
    y_max: int,
    n_files: int = 64,
    bits: int = 16,
) -> DataFrame:
    """Z-order layout plan: assign every row to one of `n_files`
    target files by fixed-width ranges of its Morton value, and report
    per-file (row count, min/max of BOTH dimensions). The min/max
    pairs are exactly the column statistics parquet footers / Iceberg
    manifests carry — so this table IS the data-skipping story: a
    predicate box on (x, y) prunes every file whose ranges miss it,
    and Z-clustering makes those ranges tight in BOTH dimensions
    simultaneously (a plain sort tightens only its leading column).

    Scale shape: the z-value is a codegen'd projection; the summary is
    one map-side-combinable groupBy over n_files keys. The actual
    rewrite is then `df.repartitionByRange/sortWithinPartitions(zval)`
    + write — the plan table is the evidence the rewrite pays off.

    File assignment uses fixed z-ranges (zval >> k), not quantiles: at
    10^12 rows a global ntile would need a total sort; fixed ranges
    need nothing, and uniform-ish quantization keeps them balanced
    (the summary's row counts expose any imbalance).
    """
    n_files = int(n_files)
    if n_files < 1 or (n_files & (n_files - 1)) != 0:
        raise ValueError("n_files must be a power of two")
    shift = 2 * bits - (n_files.bit_length() - 1)
    z = zorder_value(
        F.col(x_col), F.col(y_col), x_min, x_max, y_min, y_max, bits
    )
    return (
        df.withColumn("_z", z)
        .withColumn("file_id", F.shiftright(F.col("_z"), shift))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).alias(f"min_{x_col}"),
            F.max(x_col).alias(f"max_{x_col}"),
            F.min(y_col).alias(f"min_{y_col}"),
            F.max(y_col).alias(f"max_{y_col}"),
        )
    )


def assign_contiguous_ids(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    start: int = 0,
    id_name: str = "new_id",
) -> DataFrame:
    """Contiguous global ids 0..n-1 (plus `start`) in `key_col` order —
    the shard/sample-index assignment step (training-example ids,
    epoch-order materialization) where monotonically_increasing_id()
    is USELESS (non-contiguous, layout-dependent) and a global
    row_number() window is a single-reducer sort of the whole corpus.

    Scale shape — the classic two-pass range-id assignment:
    1. ONE driver approxQuantile on the key → n_buckets-1 split points
       (equal-DEPTH ranges, so a skewed key can't overload a bucket),
       plus one bucket-keyed count agg (map-side partials,
       n_buckets rows out) → cumulative offsets, driver-side.
    2. groupBy(bucket).applyInPandas: each bucket sorts its own slice
       and writes offset + local rank. Work per task is
       O((n/n_buckets) log(n/n_buckets)); NOTHING is globally sorted.

    The OUTPUT is invariant to the split points (they only balance
    load): id == rank of key in the whole table, which is what the
    oracle's ROW_NUMBER() OVER (ORDER BY key) asserts. Contract: keys
    numeric, non-NULL, and UNIQUE — duplicate keys make "the" rank
    ambiguous, so the per-bucket worker raises on them (fail loud,
    never emit layout-dependent ids).
    """
    from functools import reduce

    import pandas as pd

    splits = (
        df.approxQuantile(
            key_col,
            [i / n_buckets for i in range(1, n_buckets)],
            0.001,
        )
        if n_buckets > 1
        else []
    )
    key = F.col(key_col)
    bucket = reduce(
        lambda acc, ib: F.when(key <= F.lit(ib[1]), F.lit(ib[0])).otherwise(
            acc
        ),
        reversed(list(enumerate(splits))),
        F.lit(len(splits)),
    )
    withb = df.withColumn("_bucket", bucket.cast("int"))
    counts = {
        r._bucket: r.n
        for r in withb.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets, acc = {}, start
    for b in range(len(splits) + 1):
        offsets[b] = acc
        acc += counts.get(b, 0)

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{id_name} long"]
    )

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["_bucket"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort").reset_index(
            drop=True
        )
        if pdf[key_col].isna().any():
            raise ValueError(
                f"assign_contiguous_ids: NULL key in {key_col} — a "
                f"NULL has no rank; filter or impute first"
            )
        if pdf[key_col].duplicated().any():
            dup = pdf[key_col][pdf[key_col].duplicated()].iloc[0]
            raise ValueError(
                f"assign_contiguous_ids: duplicate key {dup!r} in "
                f"{key_col} — ranks would be layout-dependent"
            )
        pdf[id_name] = offsets[b] + pdf.index
        return pdf.drop(columns=["_bucket"])

    return withb.groupBy("_bucket").applyInPandas(assign, out_schema)


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int = 64,
    rank_name: str = "rank",
    start: int = 1,
    sample_cap: int = 65536,
    seed: int = 48619,
) -> DataFrame:
    """Distributed global row_number() over a COMPOSITE key — the
    window-free total rank for tables where
    `row_number().over(Window.orderBy(...))` would funnel everything
    through one reducer (the classic single-reducer window, the exact
    shape WindowExec warns about). assign_contiguous_ids (above)
    covers the single-NUMERIC-key case via approxQuantile; this is the
    composite/lexicographic generalization — e.g. a token vocabulary
    ranked by (document_frequency, token), where bucketing on the
    numeric column alone collapses (Zipf: most tokens have df == 1,
    so every equal-depth df split lands the bulk of the vocabulary in
    one bucket) and only the full (df, token) range can split ties.

    Two-pass range-rank, pure Catalyst:
    1. ONE bounded deterministic sample of the key (<= ~sample_cap
       rows to the driver) -> n_buckets-1 boundary LITERALS, evenly
       spaced in the sorted sample (equal-depth). The bucket id is a
       codegen'd when-chain of struct comparisons — range semantics,
       so bucket order IS key order and offsets compose.
    2. ONE bucket-count agg (map-side partials, n_buckets metadata
       rows to the driver) -> cumulative offsets; then PARTITIONED
       per-bucket row_number windows. The largest task sorts the
       largest bucket — ~n/n_buckets by construction, never n.

    The OUTPUT is invariant to the sampled boundaries (they only
    balance load): rank == `start` + global row_number over
    (order_cols) - 1, exactly. Contract: order_cols non-NULL and
    jointly UNIQUE — with duplicates the ranks are still a valid
    total numbering but the tie order is unspecified (same caveat as
    any row_number over a non-unique key).

    Eager like assign_contiguous_ids: the count/sample/count-agg jobs
    run at call time — persist `df` first (scoped_persist) when its
    lineage is expensive, or the passes recompute it. When the table
    fits under sample_cap the "sample" is the whole key set and the
    bucket counts come from it driver-side — two jobs total, no
    count-agg pass (the dev-scale common case); the three-pass shape
    is reserved for tables that actually need sampling.
    """
    from functools import reduce

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    for c in order_cols:
        if c not in df.columns:
            raise ValueError(f"global_rank: no column {c!r} in input")

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    key = F.struct(*[F.col(c) for c in order_cols])

    def _lit_key(vals):
        return F.struct(
            *[
                F.lit(v).cast(dtypes[c]).alias(c)
                for c, v in zip(order_cols, vals)
            ]
        )

    boundaries: list[tuple] = []
    exact_counts: list[int] | None = None
    if n_buckets > 1:
        n = df.count()
        if n > 0:
            fraction = min(1.0, sample_cap / float(n))
            sample = sorted(
                tuple(r)
                for r in (
                    df.select(*order_cols)
                    if fraction >= 1.0
                    else df.select(*order_cols).sample(
                        False, fraction, seed
                    )
                ).collect()
            )
            step = max(1, len(sample) // n_buckets)
            raw = [
                sample[min(i * step, len(sample) - 1)]
                for i in range(1, n_buckets)
            ]
            for b in raw:  # dedupe — equal boundaries = empty buckets
                if not boundaries or b != boundaries[-1]:
                    boundaries.append(b)
            if fraction >= 1.0 and not any(
                isinstance(dtypes[c], (FloatType, DoubleType))
                for c in order_cols
            ):
                # The sample IS the table: bucket counts are exact
                # driver-side — skip the count-agg job entirely.
                # Guard: NaN in float/double order_cols makes Python
                # sorted()/bisect ordering undefined while Spark
                # orders NaN greatest, so the driver-side counts
                # would silently diverge from the Spark-side bucket
                # assignment and corrupt every offset — for float
                # order_cols we always run the count-agg job, whose
                # grouping matches the bucket expression exactly.
                import bisect

                edges = [
                    bisect.bisect_right(sample, b) for b in boundaries
                ]
                exact_counts = [
                    hi - lo
                    for lo, hi in zip([0] + edges, edges + [len(sample)])
                ]

    bname = "_fz_gr_bucket"
    while bname in df.columns:
        bname += "_"
    bucket = reduce(
        lambda acc, ib: F.when(
            key <= _lit_key(ib[1]), F.lit(ib[0])
        ).otherwise(acc),
        reversed(list(enumerate(boundaries))),
        F.lit(len(boundaries)),
    ).cast("int")

    withb = df.withColumn(bname, bucket)
    if not boundaries:
        counts = {}  # single bucket: offset is `start`, no count job
    elif exact_counts is not None:
        counts = dict(enumerate(exact_counts))
    else:
        counts = {
            r[bname]: r.n
            for r in withb.groupBy(bname)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    offsets, acc = {}, int(start)
    for b in range(len(boundaries) + 1):
        offsets[b] = acc
        acc += counts.get(b, 0)
    omap = F.create_map(
        *[
            x
            for b, o in offsets.items()
            for x in (F.lit(b), F.lit(o).cast("long"))
        ]
    )
    rn = F.row_number().over(
        Window.partitionBy(bname).orderBy(
            *[F.col(c).asc() for c in order_cols]
        )
    )
    return withb.withColumn(
        rank_name,
        (F.element_at(omap, F.col(bname)) + rn.cast("long") - F.lit(1)),
    ).drop(bname)


def scd2_history(
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an update stream —
    the recrawl bookkeeping table: each (key, attribute-state) version
    gets [valid_from, valid_to) with valid_to NULL on the current row.
    Consecutive updates with UNCHANGED attributes collapse into one
    version (a recrawl that found the same page extends the validity,
    it does not open a new version).

    Spark shape: everything is key-partitioned windows ordered by
    (ts, tiebreak) — change detection via lag over NULL-safe struct
    equality (<=> — a NULL attribute is a real state, not a wildcard),
    version numbering a running sum of change flags, valid_to the lead
    of the surviving rows. No joins, no global sorts; per-key work is
    bounded by per-key update counts, the bound every SCD build
    carries.

    Output: key, attrs..., version_n (1-based), valid_from, valid_to
    (NULL = current), is_current.
    """
    tb = [F.col(tiebreak_col)] if tiebreak_col else []
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), *[c.asc() for c in tb]
    )
    state = F.struct(*[F.col(c) for c in attr_cols])
    # first row per key: lag is NULL, and eqNullSafe against the NULL
    # struct would wrongly report "unchanged" for an all-NULL state —
    # the explicit row_number()==1 term pins row 1 as a change
    first = F.row_number().over(w) == 1
    marked = updates.withColumn(
        "_chg", (first | ~state.eqNullSafe(F.lag(state).over(w))).cast("int")
    )
    versions = marked.filter(F.col("_chg") == 1).withColumn(
        "version_n",
        F.sum("_chg").over(
            Window.partitionBy(key_col).orderBy(
                F.col(ts_col).asc(), *[c.asc() for c in tb]
            )
        ).cast("int"),
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col("version_n").asc())
    return versions.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        "version_n",
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w2).isNull().cast("int").alias(
            "is_current"
        ),
    )
