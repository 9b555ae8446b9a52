"""Deterministic hash-based sampling (the corpus-mixing primitive).

A training-data pipeline samples by CONTENT-STABLE hash, never by RNG:
the keep/drop decision for a document must be a pure function of its key
so that (a) re-runs, resumes, and cluster-size changes reproduce the
same sample bit-for-bit (Bernoulli `df.sample` depends on partition
layout), (b) downstream joins see a consistent universe, and (c) nested
rates compose — the 10% sample is a strict subset of the 50% sample,
so curriculum mixes can be re-weighted without re-sampling.

Mechanism: keep a row iff the first 8 hex chars of md5(salt ':' key)
are lexicographically below the rate threshold. md5 here is a UNIFORMITY
device, not a security one — any well-mixed hash works; md5 is chosen
because every engine agrees on its value (the DuckDB oracle recomputes
the identical predicate). The comparison stays on the hex STRING:
fixed-width lowercase hex compares in value order, and string-compare is
portable across engines with no 64-bit signedness traps.

Scale shape: a pure per-row predicate on the scan — no shuffle, no
state, no driver round-trip; stratified rates ride a literal
`create_map` (strata counts are small), so the whole operator
whole-stage-codegens into the scan's filter.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_WIDTH = 8
_ONE = 1 << (4 * _HEX_WIDTH)


def hex_threshold(rate: float) -> str:
    """Rate in [0,1] → the 8-hex-char threshold the sampler compares
    against. rate >= 1.0 returns 'g' — lexicographically above every
    hex string, so everything passes (format(2^32,'x') would be 9 chars
    and compare WRONG against an 8-char prefix: 'f…' > '1…')."""
    if rate >= 1.0:
        return "g"
    q = max(0, int(rate * _ONE))
    return format(q, f"0{_HEX_WIDTH}x")


def _bucket(key_col: str, salt: str):
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))),
        1,
        _HEX_WIDTH,
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "fuzi"
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows, decided per key.

    Same key + same salt → same decision on any cluster, any partition
    layout, any Spark version. Different salts give independent samples
    of the same table; nested rates give nested samples."""
    return df.filter(_bucket(key_col, salt) < F.lit(hex_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    salt: str = "fuzi",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source/quality
    re-balancing step of a corpus mix (e.g. downsample en, keep all zh).

    `rates` maps stratum value → keep rate; strata absent from the map
    get `default_rate`. The per-row threshold is a literal map lookup,
    so the filter is still a single codegen'd scan predicate — no join,
    no shuffle. For thousands of strata pass a rates TABLE and broadcast
    -join it instead; at typical mix cardinality (languages, sources)
    the literal map is the cheaper plan."""
    mapping = F.create_map(
        *[
            lit
            for k, v in sorted(rates.items())
            for lit in (F.lit(k), F.lit(hex_threshold(v)))
        ]
    )
    thr = F.coalesce(
        mapping[F.col(stratum_col)], F.lit(hex_threshold(default_rate))
    )
    return df.filter(_bucket(key_col, salt) < thr)


def group_quota(
    df: DataFrame,
    budget: int,
    group_col: str,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "fuzi-quota",
) -> DataFrame:
    """Cap total weight per group at `budget` (the "no single domain may
    exceed X tokens" curation rule).

    Within each group, documents are ranked by their deterministic hash
    bucket (a random-looking but content-stable priority — no RNG, so
    re-runs and resumes keep the identical subset), and a doc is KEPT
    iff the running weight total INCLUDING it stays <= budget. That
    makes the kept set prefix-closed in priority order: shrinking the
    budget only removes docs, never swaps them. A single doc heavier
    than the whole budget is dropped (its inclusive total already
    exceeds the cap) — quota is a hard ceiling, not best-effort.

    Scale shape: ONE hash shuffle on the group key plus a per-group
    window sort over metadata-width rows (the window needs only key +
    weight; text rides along untouched). A window partition
    materializes in one task, so a pathologically hot group (a domain
    with billions of docs) bounds the task size; for that regime
    pre-filter hot groups with `stratified_sample` (rate ≈
    budget/total_weight) to decimate them before the exact pass —
    two-phase quota, same final invariant.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(_bucket(key_col, salt), F.col(key_col).cast("string"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum_w", F.sum(F.col(weight_col)).over(w))
        .filter(F.col("_cum_w") <= F.lit(int(budget)))
        .drop("_cum_w")
    )


def split_assign(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    group_key: Optional[Column] = None,
    salt: str = "fuzi-split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a `split` column.

    `weights` maps split name -> relative weight (normalized here);
    the assignment is the interval the row's hash bucket falls into,
    with interval boundaries at the cumulative weights — so the same
    key always lands in the same split, on any cluster, any run.

    Leakage safety: pass `group_key` (any Column — e.g.
    `F.md5(F.col("text"))` for exact-dup cohesion, or the group id from
    `dedup_components` for near-dup cohesion) and every row of a group
    gets the SAME split — duplicated or near-duplicated documents can
    never straddle train and eval, the classic contamination bug that
    inflates benchmark scores.

    Scale shape: a pure per-row CASE chain on the scan — no shuffle, no
    state; whole-stage-codegens into the scan's filter like
    `hash_sample`. Split names are emitted in the dict's insertion
    order; the LAST split absorbs the tail interval so the partition is
    exhaustive even under float rounding.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(v < 0 for v in weights.values()):
        raise ValueError(f"split weights must be >= 0, got {weights}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"split weights must sum > 0, got {weights}")
    key = (
        group_key
        if group_key is not None
        else F.col(key_col).cast("string")
    )
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))),
        1,
        _HEX_WIDTH,
    )
    names = list(weights)
    expr = F.lit(names[-1])  # tail absorbs rounding
    cum = 0.0
    cases = []
    for name in names[:-1]:
        cum += weights[name] / total
        cases.append((name, hex_threshold(cum)))
    for name, thr in reversed(cases):
        expr = F.when(bucket < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def mixture_rates(
    totals: dict[str, float], shares: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep rates that move the corpus to the target token
    mix while keeping the maximum feasible mass.

    The feasible post-sample total T obeys T*share_s <= totals_s for
    every stratum, so T = min_s(totals_s / share_s) and the binding
    stratum keeps rate 1.0 — nothing is thrown away that the mix could
    have used. Exposed separately so the oracle (and callers with
    pre-aggregated totals) can reproduce the EXACT float sequence:
    every operation below is a single IEEE-754 op mirrored verbatim in
    the SQL twin (t/share, min, T*share/t — same order, same ops)."""
    norm = float(sum(shares.values()))
    if norm <= 0:
        raise ValueError(f"shares must sum > 0, got {shares}")
    normed = {s: w / norm for s, w in shares.items()}
    present = {s: sh for s, sh in normed.items() if totals.get(s)}
    if not present:
        raise ValueError("no stratum in `shares` has any mass in the data")
    t_max = min(float(totals[s]) / sh for s, sh in present.items())
    return {
        s: min(1.0, t_max * sh / float(totals[s])) for s, sh in present.items()
    }


def mixture_by_tokens(
    df: DataFrame,
    shares: dict[str, float],
    stratum_col: str,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "fuzi-mix",
) -> DataFrame:
    """Re-balance the corpus to a target TOKEN mix (the data-mixing step:
    "make the training set 35% en / 25% de / ... by token mass"), by
    deterministic hash downsampling per stratum at `mixture_rates`.

    Strata absent from `shares` are dropped — the mix defines the
    training universe. The realized mix matches the target in
    expectation (hash-uniform thinning); exactness improves with doc
    count per stratum.

    The per-stratum totals are collected driver-side: strata are
    languages/sources/quality buckets — metadata-sized by contract
    (same guarded pattern as encode_documents' vocabulary). The keep
    decision compares the md5 bucket NUMERICALLY (conv(hex,16,10) <
    rate*2^32) rather than against a truncated hex threshold, so the
    oracle can recompute the identical rate arithmetic in SQL and
    match bit-for-bit.

    Scale shape: one map-side-combinable agg over (stratum, weight) for
    the totals, then a pure scan predicate — no corpus shuffle."""
    totals = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col).agg(F.sum(weight_col)).collect()
        if r[0] is not None and r[1] is not None
    }
    rates = mixture_rates(totals, shares)
    bucket_num = F.conv(_bucket(key_col, salt), 16, 10).cast("bigint").cast(
        "double"
    )
    thr = F.create_map(
        *[
            lit
            for s, r in sorted(rates.items())
            for lit in (F.lit(s), F.lit(r * float(_ONE)))
        ]
    )[F.col(stratum_col)]
    return df.filter(bucket_num < thr)


def temperature_shares(totals: dict[str, float], alpha: float) -> dict[str, float]:
    """Temperature-sampling target shares: share_s ∝ totals_s^alpha —
    the multilingual mixing rule of mBERT/XLM-R/mT5 (alpha ∈ (0, 1]
    flattens the natural distribution toward uniform; alpha=1 keeps
    it). Returned UNNORMALIZED (keys in sorted order): the mixture
    rate arithmetic is scale-invariant in the shares (the normalizer
    cancels in t_max·share/t), and skipping it keeps every downstream
    float op a single IEEE instruction an oracle can mirror verbatim."""
    if not totals:
        raise ValueError("temperature_shares: empty totals")
    a = float(alpha)
    if a <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    return {s: float(totals[s]) ** a for s in sorted(totals)}


def temperature_mixture(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    alpha: float = 0.7,
    key_col: str = "doc_id",
    salt: str = "fuzi-mix",
) -> DataFrame:
    """Re-balance the corpus to the temperature-alpha mix: per-stratum
    keep rates that move token mass toward share ∝ mass^alpha, keeping
    the maximum feasible total (the binding stratum — the SMALLEST
    after flattening — keeps rate 1.0; everything else downsamples;
    nothing upsamples, matching the sampling-only reading of the
    recipe).

    Rate arithmetic mirrors mixture_rates WITHOUT the normalization
    step (it cancels mathematically; see temperature_shares):
    t_max = min_s(t_s / share_s), rate_s = min(1, t_max·share_s/t_s) —
    each a single IEEE op so the SQL oracle replays the identical
    sequence. Same scale shape as mixture_by_tokens: one map-side
    combinable totals agg (strata are metadata-sized by contract),
    then a pure scan predicate — no corpus shuffle."""
    totals = {
        r[0]: float(r[1])
        for r in df.groupBy(stratum_col).agg(F.sum(weight_col)).collect()
        if r[0] is not None and r[1] is not None and r[1] > 0
    }
    if not totals:
        raise ValueError("temperature_mixture: no stratum has any mass")
    shares = temperature_shares(totals, alpha)
    t_max = min(totals[s] / sh for s, sh in shares.items())
    rates = {
        s: min(1.0, t_max * sh / totals[s]) for s, sh in shares.items()
    }
    bucket_num = F.conv(_bucket(key_col, salt), 16, 10).cast("bigint").cast(
        "double"
    )
    thr = F.create_map(
        *[
            lit
            for s, r in sorted(rates.items())
            for lit in (F.lit(s), F.lit(r * float(_ONE)))
        ]
    )[F.col(stratum_col)]
    return df.filter(bucket_num < thr)


def domain_weights(
    df: DataFrame,
    domain_col: str,
    loss_col: str,
    ref_col: str,
    temperature: float = 1.0,
) -> DataFrame:
    """DoReMi-flavored domain reweighting (Xie et al. 2023's
    excess-loss principle, one static step): a domain where the proxy
    model's loss EXCEEDS the reference model's is under-learned, so the
    next mix should upweight it; domains the proxy already matches
    contribute no excess and fall back toward uniform.

        excess_g = avg over g of max(0, loss - ref)
        weight_g = exp(excess_g / tau) / sum_h exp(excess_h / tau)

    Returns (domain_col, n_docs:long, excess:double, weight:double),
    weights summing to 1. tau is the usual softmax temperature — small
    tau concentrates the mix on the worst-learned domains, large tau
    flattens toward uniform. (Full DoReMi iterates this against a
    re-trained proxy; the per-step reweighting arithmetic is this.)

    Scale shape: the corpus is touched ONCE with a map-side partial
    aggregate into domain-cardinality rows; the softmax normalizer is
    an unpartitioned window over that metadata-sized table (dozens to
    thousands of domains — single-task by design, never the corpus).
    """
    per = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"),
        F.avg(
            F.greatest(F.col(loss_col) - F.col(ref_col), F.lit(0.0))
        ).alias("excess"),
    )
    e = F.exp(F.col("excess") / F.lit(float(temperature)))
    return per.withColumn(
        "weight", e / F.sum(e).over(Window.partitionBy())
    )


def token_budget_plan(
    per_source: DataFrame,
    budget: float,
    max_epochs: float = 4.0,
    n_rounds: int = 6,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    weight_col: str = "weight",
) -> DataFrame:
    """Water-filling allocation of a token budget across sources under
    per-source repeat caps — the mix-planning step between "we want
    these mixture weights" (domain_weights) and "materialize the
    epochs" (epoch_order/mixture_sample). Drawing budget*w_s tokens
    from source s is only possible while s has data: past max_epochs
    passes, repetition stops paying (data-constrained scaling), so a
    capped source freezes at cap = max_epochs * n_tokens and its
    unused share re-spreads over the UNCAPPED sources in proportion
    to their weights — which can cap further sources, hence rounds.

    Fixed n_rounds unroll of a pure column recurrence (two
    unpartitioned-window sums per round over the |sources|-row table —
    metadata-sized at any corpus scale, the domain_weights precedent):

        W_k = sum of w over uncapped,  R_k = budget - sum of caps
        prov_s = w_s / W_k * R_k
        capped_{k+1} = capped_k OR prov_s > cap_s

    Returns (source, n_tokens, weight, cap_tokens, alloc_tokens,
    epochs, capped int, converged int): alloc = cap for capped
    sources, final-round prov otherwise; converged=0 on any row means
    n_rounds was too small (one more source would cap) — the caller
    raises rounds rather than trusting the plan. If EVERY source caps,
    sum(alloc) < budget states the corpus simply cannot fill the
    budget under the cap. Comparisons against caps have macroscopic
    margins for real token counts; exact prov==cap ties are
    measure-zero and would only flip a source between two valid plans.
    """
    w_all = Window.partitionBy()
    df = per_source.select(
        F.col(source_col).alias("source"),
        F.col(tokens_col).cast("double").alias("n_tokens"),
        F.col(weight_col).cast("double").alias("weight"),
        (F.col(tokens_col).cast("double") * F.lit(float(max_epochs))).alias(
            "cap_tokens"
        ),
        F.lit(False).alias("_capped"),
    )
    B = F.lit(float(budget))
    prov = None
    for _ in range(n_rounds):
        w_active = F.sum(
            F.when(~F.col("_capped"), F.col("weight")).otherwise(F.lit(0.0))
        ).over(w_all)
        r = B - F.sum(
            F.when(F.col("_capped"), F.col("cap_tokens")).otherwise(
                F.lit(0.0)
            )
        ).over(w_all)
        # explicit zero guard: with every source capped w_active = 0,
        # and ANSI mode makes x/0 a task failure, not an IEEE inf
        prov = F.when(
            w_active > 0, F.col("weight") / w_active * r
        ).otherwise(F.lit(0.0))
        df = df.withColumn(
            "_prov", prov
        ).withColumn(
            "_capped",
            F.col("_capped")
            | ((F.col("_prov") > F.col("cap_tokens")) & (w_active > 0)),
        )
    # converged iff a further round would cap nothing new
    w_active = F.sum(
        F.when(~F.col("_capped"), F.col("weight")).otherwise(F.lit(0.0))
    ).over(w_all)
    r = B - F.sum(
        F.when(F.col("_capped"), F.col("cap_tokens")).otherwise(F.lit(0.0))
    ).over(w_all)
    final_prov = F.when(
        w_active > 0, F.col("weight") / w_active * r
    ).otherwise(F.lit(0.0))
    alloc = F.when(F.col("_capped"), F.col("cap_tokens")).otherwise(
        F.greatest(final_prov, F.lit(0.0))
    )
    newly = (~F.col("_capped")) & (final_prov > F.col("cap_tokens"))
    converged = (
        F.sum(newly.cast("int")).over(w_all) == 0
    ).cast("int")
    return df.select(
        "source",
        "n_tokens",
        "weight",
        "cap_tokens",
        alloc.alias("alloc_tokens"),
        (alloc / F.col("n_tokens")).alias("epochs"),
        F.col("_capped").cast("int").alias("capped"),
        converged.alias("converged"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col,
    key_col: str = "doc_id",
    salt: str = "aes",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the top-k
    rows by the Efraimidis–Spirakis key u^(1/w) (u a content-stable
    uniform, w the row's weight). Inclusion probability is proportional
    to weight in the without-replacement sense — the importance-sampled
    corpus subset (quality-weighted, recency-weighted) that re-runs
    bit-identically on any cluster layout, unlike rand()-keyed reservoirs.

    u comes from the first 13 hex chars of md5(salt ':' key):
    q ∈ [0, 2^52), u = (q + 0.5) / 2^52 — strictly inside (0,1), and the
    +0.5 and the divide are EXACT in binary64 (2^52 is a power of two),
    so every engine computes the identical u (the DuckDB oracle casts
    '0x'||hex to BIGINT and replays the same arithmetic). pow(u, 1/w)
    itself is only ~1-ulp portable across libms, so the pow value is
    used for SELECTION but never emitted: adjacent order statistics of
    n uniform keys are ~1/n apart, 12 orders of magnitude above any
    ulp divergence, so the selected SET is stable even where the last
    bit of pow is not.

    The EXACT uniform `u` IS emitted, deliberately, as an audit
    column: it is binary64-exact on every engine (unlike the pow key),
    so downstream replays — and the driver's DuckDB oracle — can
    verify each selected row's draw without recomputing md5. Inputs
    that already carry a `u` (or the internal `_es`) column are
    rejected rather than silently overwritten.

    Scale shape: per-row hash + pow inside the scan, then a global
    top-k — Spark executes orderBy().limit(k) as TakeOrderedAndProject
    (per-partition bounded heaps, driver merges k·n_partitions rows);
    no full sort, no shuffle of the data. Rows with weight <= 0 or NULL
    are excluded (pow(u, 1/w) with w<=0 would invert the ordering).
    """
    for reserved in ("u", "_es"):
        if reserved in df.columns:
            raise ValueError(
                f"weighted_sample: input already has a {reserved!r} "
                f"column — it would collide with the emitted audit "
                f"uniform / internal selection key; rename it first"
            )
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    q = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(salt), F.col(key_col).cast("string")
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (q.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    es_key = F.pow(u, F.lit(1.0) / w.cast("double"))
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("u", u)
        .withColumn("_es", es_key)
        .orderBy(F.col("_es").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("_es")
    )


def group_sample(
    df: DataFrame,
    k: int,
    group_col: str,
    key_col: str = "doc_id",
    salt: str = "gsample",
) -> DataFrame:
    """Deterministic uniform k-sample PER GROUP (per-language eval
    sets, per-source audit slices): rank rows inside each group by the
    content-stable md5 bucket (same uniformity device as hash_sample)
    and keep the first k. Same key + salt → the same sample on any
    cluster layout; different salts → independent per-group samples.

    Scale shape: one window rank per group — Spark's WindowGroupLimit
    pushes the `rank <= k` filter into per-partition bounded top-k
    heaps BEFORE the group exchange, so the shuffle carries at most
    k·n_partitions rows per group, never the group. Adds
    `sample_rank` (1-based within group)."""
    w = Window.partitionBy(group_col).orderBy(
        _bucket(key_col, salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def weighted_draws(
    weights: DataFrame,
    n_draws: int,
    key_col: str = "key",
    weight_col: str = "w",
    salt: str = "draws",
) -> DataFrame:
    """Deterministic sampling WITH replacement, proportional to
    integer weights — the epoch-construction primitive ("draw 1M
    documents per mixture epoch, source s with probability w_s/W")
    that reproduces bit-identically on any layout, unlike rand()
    draws.

    Contract: `weights` is a DIMENSION-sized table (sources,
    languages, shards — not the corpus) with POSITIVE INTEGER
    weights; it ships as ONE broadcast row holding the cumulative
    array. Each draw i gets the content-stable uniform
    u_i = md5('<salt>:<i>') (the weighted_sample device), an integer
    target rank t_i = floor(u_i · W) + 1 ∈ [1, W], and selects the
    first key whose cumulative weight reaches t_i — selection is
    INTEGER compare, so no boundary ulp can flip a draw.

    Scale shape: spark.range(n_draws) is the only big side (narrow,
    no input scan), the cumulative array a broadcast single row, the
    probe a codegen'd array_min(filter) — zero shuffles. Returns
    (draw_id, key)."""
    from pyspark.sql import Window

    w = F.col(weight_col).cast("long")
    cum = weights.select(
        F.col(key_col).alias("key"),
        w.alias("w"),
        F.sum(w)
        .over(
            Window.orderBy(F.col(key_col).asc()).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cumw"),
    )
    row = cum.agg(
        F.array_sort(F.collect_list(F.struct("cumw", "key"))).alias(
            "cdf"
        ),
        F.sum("w").alias("total"),
        F.min("w").alias("_minw"),
    )
    draws = weights.sparkSession.range(n_draws).select(
        F.col("id").alias("draw_id")
    )
    q = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(salt), F.col("draw_id").cast("string")
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    u = (q.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    target = (
        F.floor(u * F.col("total").cast("double")).cast("long") + 1
    )
    pick = F.array_min(
        F.filter("cdf", lambda s: s["cumw"] >= target)
    )["key"]
    # fail loud on a violated weight contract: a zero/negative weight
    # silently corrupts the cumulative table (draws land on the wrong
    # key), so the probe raises instead of mis-sampling
    guarded = F.when(
        F.col("_minw") <= 0,
        F.raise_error(
            F.lit("weighted_draws: weights must be positive integers")
        ),
    ).otherwise(pick)
    return (
        draws.crossJoin(F.broadcast(row))
        .select("draw_id", guarded.alias("key"))
    )
