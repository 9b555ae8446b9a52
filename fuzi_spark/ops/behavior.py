"""User-behavior analytics over event streams: ordered conversion
funnels, retention cohorts, and gap-filled daily time series.

These are the analytics-engine staples a crawl/training-data
operation runs over its own telemetry (the `events` table): did the
fetch→parse→commit funnel degrade, how long do newly discovered
domains stay productive (retention), and which days silently produced
zero events of a type (gap-fill — the absence IS the signal; a plain
groupBy never emits the zero row).

Spark shapes (all audited at the plan level, PLANS.md):

- funnel_stages: ONE exchange. groupBy(user) collects each user's
  (ts, type) pairs, sort_array orders them, and a single
  F.aggregate walk advances a (stage, times) state through the
  ordered step list with strict ts > prev-stage-ts semantics —
  first-touch greedy, which provably yields the minimal timestamp
  chain (each stage takes the earliest qualifying event). No
  per-step self-joins (k steps would cost k exchanges), no window
  passes. Per-user collect is bounded by per-user activity — the
  same bound sessionization already carries.
- retention_cohorts: cohort day via a window MIN over the user
  partition (ONE exchange by user_id, no join against a firsts
  aggregate), then distinct (cohort, offset, user) cells, then the
  count. Cohort sizes come from the offset-0 rows (every user is
  active in their own week 0 by construction) via a broadcast
  self-join of the already-tiny report.
- gap_fill_daily: per-(type, day) counts reduce map-side to a
  types x days frame, then ONE single-row aggregate gathers bounds,
  the group set, and a (group, day) -> n lookup map; the dense grid
  is two explodes + a map probe over that row — one events scan,
  zero joins, nothing collected to the driver. Zero rows are
  materialized exactly where the groupBy was silent.

Determinism: counts are integers; funnel/retention emit timestamps
and exact integer arithmetic only (week offsets use DIV, not float
floor-division — see the repo's oracle-portability notes);
retained_frac is a single int/int IEEE division, identical in any
engine. The funnel walk is insensitive to the order of equal-ts
events because stage advancement requires STRICTLY greater ts.

Reference parity note: no counterpart in the reference (Fuzi is a
parse/query library) — pipeline-brief scope (crawl telemetry
analytics), same bucket as ops/anomaly.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_STEPS = ("view", "click", "purchase")


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str] = DEFAULT_STEPS,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered first-touch funnel: (user_id, n_stages,
    t_1..t_k) where t_i is the earliest step-i event STRICTLY after
    t_{i-1} (t_1 is the earliest step-1 event overall) and n_stages
    is how deep the user got. One row per user with >= 1 event;
    unreached stages are NULL."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    steps = [str(s) for s in steps]
    k = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])

    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et")))
        ).alias("_evs")
    )

    # State: times = timestamps of stages reached so far (size = stage
    # count). An event advances the state iff it matches the NEXT
    # step's type and is strictly later than the last reached stage's
    # ts (vacuous for stage 0). try_element_at: NULL (never a throw)
    # off the end under ANSI mode; the `size(...) < k` guard keeps the
    # comparison semantics explicit anyway.
    init = F.array().cast("array<timestamp>")
    walked = per_user.select(
        "user_id",
        F.aggregate(
            "_evs",
            init,
            lambda acc, e: F.when(
                (F.size(acc) < F.lit(k))
                & (e["et"] == F.try_element_at(steps_lit, F.size(acc) + 1))
                & (
                    (F.size(acc) == 0)
                    | (e["ts"] > F.try_element_at(acc, F.size(acc)))
                ),
                F.array_append(acc, e["ts"]),
            ).otherwise(acc),
        ).alias("_times"),
    )
    cols = [
        "user_id",
        F.size("_times").cast("int").alias("n_stages"),
    ]
    for i in range(1, k + 1):
        cols.append(F.try_element_at("_times", F.lit(i)).alias(f"t{i}"))
    return walked.select(*cols)


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly retention by first-seen-day cohort: (cohort_day,
    week_offset, n_users, cohort_size, retained_frac). week_offset is
    whole 7-day periods since the user's first event DAY (exact
    integer DIV — engine-portable); cohort_size is the cohort's
    offset-0 user count (every user is active in their own week 0 by
    construction)."""
    day = F.to_date(F.col(ts_col))
    w = Window.partitionBy(user_col)
    cells = (
        events.select(
            F.col(user_col).alias("user_id"),
            day.alias("_day"),
            F.min(day).over(w).alias("cohort_day"),
        )
        .select(
            "user_id",
            "cohort_day",
            F.expr("datediff(_day, cohort_day) DIV 7").alias("week_offset"),
        )
        .distinct()
    )
    ret = cells.groupBy("cohort_day", "week_offset").agg(
        F.count("*").alias("n_users")
    )
    # Cohort size = the cohort's own offset-0 count, read out of the
    # ALREADY-AGGREGATED report with a window max — a self-join here
    # would recompute the whole events subtree for the broadcast side
    # (a second 10^12-row scan); the window costs one exchange of the
    # cohorts x offsets frame, which is metadata-sized.
    wc = Window.partitionBy("cohort_day")
    size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_users"))
    ).over(wc)
    return ret.select(
        "cohort_day",
        F.col("week_offset").cast("bigint").alias("week_offset"),
        "n_users",
        size.alias("cohort_size"),
        (F.col("n_users") / size).alias("retained_frac"),
    )


def gap_fill_daily(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Dense per-(group, day) daily counts over the table's global
    [min day, max day] span: (event_type, day, n_events, is_gap) with
    n_events = 0 (is_gap = true) materialized for calendar days where
    the group logged nothing. Single events scan: calendar, group
    set, and counts all unpack from one single-row aggregate of the
    reduced counts frame — generated in the plan, never collected to
    the driver."""
    day = F.to_date(F.col(ts_col))
    counts = (
        events.groupBy(F.col(group_col).alias("grp"), day.alias("day"))
        .agg(F.count("*").alias("n_events"))
    )
    # The bounds, the group list, AND the count lookup all derive from
    # ONE single-row aggregate of the already-reduced counts frame.
    # Consuming `counts` from several branches instead would re-scan
    # the 10^12-row events table per branch (column pruning
    # differentiates the branches' scans, so exchange reuse cannot
    # collapse them — verified in the plan). The single row holds
    # groups x days entries — the same cardinality the dense OUTPUT
    # grid materializes anyway, so if the row doesn't fit, neither
    # does the answer.
    one = counts.agg(
        F.min("day").alias("d0"),
        F.max("day").alias("d1"),
        F.collect_set("grp").alias("grps"),
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.concat_ws(
                        "\x1f", "grp", F.col("day").cast("string")
                    ).alias("key"),
                    F.col("n_events").alias("value"),
                )
            )
        ).alias("m"),
    )
    n = F.coalesce(
        F.try_element_at(
            "m",
            F.concat_ws("\x1f", "grp", F.col("day").cast("string")),
        ),
        F.lit(0),
    )
    return (
        one.select(
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
            "grps",
            "m",
        )
        .select("day", F.explode("grps").alias("grp"), "m")
        .select(
            F.col("grp").alias(group_col),
            "day",
            n.alias("n_events"),
            (n == 0).alias("is_gap"),
        )
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    end_state: str = "(end)",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next event type | current) — the behavior model behind
    "what do users do after X" questions and the generator for
    synthetic session traffic. Every user's LAST event transitions to
    the absorbing `end_state`, so each row's outgoing probabilities
    sum to exactly 1 and session-ending behavior is first-class
    (dropping the tail silently biases P toward mid-session loops).

    Ordering is (ts, event_id) within user — the id tie-break makes
    the chain deterministic under same-timestamp bursts.

    Shape: one user-keyed window (lead) over the event stream, then a
    (cur, next)-keyed count with map-side partials; the probability
    normalizer is a window over the |types|^2-row count table.
    Returns (cur_type, next_type, n bigint, p double)."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = events.select(
        F.col(type_col).alias("cur_type"),
        F.coalesce(
            F.lead(type_col).over(w), F.lit(end_state)
        ).alias("next_type"),
    )
    counts = pairs.groupBy("cur_type", "next_type").agg(
        F.count("*").alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("cur_type"))
    return counts.select(
        "cur_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / total).alias("p"),
    )
