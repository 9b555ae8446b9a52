"""Discussion-thread assembly: turn a flat (post, parent) table into
rendered-order training conversations.

Forum/mailing-list/comment data is a top-tier dialog training source,
and it arrives as a flat edge list: (post_id, parent_id, ts). The
trainer needs each post tagged with its thread root, its depth, and
its DFS (rendered) position — parent before children, siblings in
timestamp order — so threads can be linearized into conversation
episodes.

Distributed shape: ancestor-chain resolution by ITERATIVE JOIN — each
round every unresolved post joins one hop up and prepends the
parent's fixed-width sort segment to its path key. Rounds = tree
depth, each one equi-join + localCheckpoint (the dedup_components
plan-growth discipline, ops/dedup.py); the loop FAILS LOUDLY if
max_depth rounds leave unresolved rows (cycle or deeper-than-declared
data), never silently truncates.

DFS order falls out of plain string ordering of the path keys because
segments are FIXED WIDTH: a parent's key is a strict prefix of its
descendants' keys (prefix sorts first → preorder), and two siblings
differ inside one fixed-width segment, so every descendant of the
earlier sibling sorts before the later sibling. No recursion, no
driver-side tree walk — one window over (root, path) at the end.

The correctness twin is a WITH RECURSIVE walk in the oracle — a
genuinely different mechanism (recursive fixpoint vs bounded
iterative join) that must produce the identical (root, depth, order)
assignment.

Reference parity note: the reference (kylehughes/Fuzi) has no graph
surface — pipeline-brief scope (dialog corpus assembly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _segment(order_col, id_col):
    """Fixed-width '/'-free sort segment: zero-padded order key then
    zero-padded id (ties). 20+1+10 chars, digits only."""
    return F.concat(
        F.lpad(F.col(order_col).cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col(id_col).cast("string"), 10, "0"),
    )


def thread_assembly(
    posts: DataFrame,
    id_col: str = "post_id",
    parent_col: str = "parent_id",
    order_col: str = "ts",
    max_depth: int = 32,
) -> DataFrame:
    """(id_col, root_id, depth, thread_order) for every post.

    `order_col` must be a non-negative integer sort key (epoch micros,
    sequence number); parents must exist for every non-null
    parent_id. Raises RuntimeError if chains have not resolved after
    `max_depth` rounds (cycles / bad data) — a silent partial answer
    would scramble conversation order downstream."""
    edges = posts.select(
        F.col(id_col).alias("_pid"),
        F.col(parent_col).alias("_par"),
        _segment(order_col, id_col).alias("_seg"),
    )
    # state: per post, the next unresolved ancestor (_cur), the root
    # once found, and the path accumulated so far (self + resolved
    # ancestors' segments)
    state = edges.select(
        "_pid",
        F.col("_par").alias("_cur"),
        F.when(F.col("_par").isNull(), F.col("_pid")).alias("_root"),
        F.col("_seg").alias("_path"),
    ).localCheckpoint()
    hop = edges.select(
        F.col("_pid").alias("_hid"),
        F.col("_par").alias("_hpar"),
        F.col("_seg").alias("_hseg"),
    )
    # bound per-round state width: the union would otherwise
    # accumulate shuffle partitions every round (see
    # web.resolve_redirects — measured thousands of tasks for
    # hundreds of rows by the late rounds)
    width = posts.sparkSession.sparkContext.defaultParallelism
    for _ in range(int(max_depth)):
        if state.filter(F.col("_root").isNull()).isEmpty():
            break
        unresolved = state.filter(F.col("_root").isNull())
        resolved = state.filter(F.col("_root").isNotNull())
        stepped = (
            unresolved.join(hop, unresolved["_cur"] == hop["_hid"], "left")
            .select(
                "_pid",
                F.col("_hpar").alias("_cur"),
                F.when(F.col("_hpar").isNull(), F.col("_hid")).alias(
                    "_root"
                ),
                F.concat(
                    F.col("_hseg"), F.lit("/"), F.col("_path")
                ).alias("_path"),
            )
        )
        state = (
            resolved.unionByName(stepped).coalesce(width).localCheckpoint()
        )
    bad = state.filter(F.col("_root").isNull()).count()
    if bad:
        raise RuntimeError(
            f"thread_assembly: {bad} posts unresolved after "
            f"{max_depth} rounds — cycle or depth > max_depth"
        )
    w = Window.partitionBy("_root").orderBy(F.col("_path").asc())
    depth = (
        F.length("_path") - F.length(F.regexp_replace("_path", "/", ""))
    ).cast("int")
    return state.select(
        F.col("_pid").alias(id_col),
        F.col("_root").alias("root_id"),
        depth.alias("depth"),
        F.row_number().over(w).alias("thread_order"),
    )


def render_threads(
    assembled: DataFrame,
    posts: DataFrame,
    id_col: str = "post_id",
    text_col: str = "text",
) -> DataFrame:
    """(root_id, n_posts, dialog) — each thread linearized in rendered
    order, depth shown as '>' quoting prefixes (the standard plain-
    text forum rendering). One join + one groupBy(root)."""
    joined = assembled.join(
        posts.select(F.col(id_col), F.col(text_col)), id_col
    )
    line = F.concat(
        F.repeat(F.lit(">"), F.col("depth")),
        F.when(F.col("depth") > 0, F.lit(" ")).otherwise(F.lit("")),
        F.col(text_col),
    )
    return (
        joined.groupBy("root_id")
        .agg(
            F.count("*").alias("n_posts"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("thread_order"), line.alias("l"))
                        )
                    ),
                    lambda s: s["l"],
                ),
            ).alias("dialog"),
        )
    )


def preference_pairs(
    posts: DataFrame,
    id_col: str = "post_id",
    parent_col: str = "parent_id",
    score_col: str = "score",
    text_col: str = "text",
) -> DataFrame:
    """Chosen/rejected preference-pair mining from scored replies — the
    StackExchange-to-DPO recipe: each ROOT post is a prompt, its
    highest-voted direct reply the chosen response, its lowest-voted
    the rejected one. Community vote scores are the preference label;
    pairs with fewer than two distinct replies emit rejected=NULL (a
    prompt with one answer is SFT data, not preference data — callers
    filter on n_replies >= 2 for the DPO set).

    Election convention (deterministic, engine-replayable): chosen is
    the max (score, then SMALLEST id on ties), rejected the min
    (score, then LARGEST id on ties) — opposite tie directions so a
    fully tied thread still yields a well-defined distinct pair.

    Returns one row per root that has at least one reply:
    (root_id, question, chosen, rejected, chosen_score:long,
    rejected_score:long, n_replies:long).

    Scale shape: replies join their root prompt with ONE equi-join
    keyed on the parent id, and both elections are map-side-combinable
    min/max STRUCT aggregates (score, ±id, text) in a single
    groupBy(root) — no window sort, no per-root explode; 10^12 replies
    reduce to partial extrema per task before the one root-keyed
    exchange.

    Reference parity note: the reference (kylehughes/Fuzi) has no
    forum surface — pipeline-brief scope (preference-data assembly;
    composes with thread_assembly for deeper-than-one-level credit).
    """
    roots = posts.filter(F.col(parent_col).isNull()).select(
        F.col(id_col).alias("root_id"),
        F.col(text_col).alias("question"),
    )
    replies = posts.filter(F.col(parent_col).isNotNull()).select(
        F.col(parent_col).alias("root_id"),
        F.col(score_col).cast("long").alias("_s"),
        F.col(id_col).cast("long").alias("_i"),
        F.col(text_col).alias("_t"),
    )
    elected = replies.groupBy("root_id").agg(
        F.max(
            F.struct(
                F.col("_s"), (-F.col("_i")).alias("_ni"), F.col("_t"), F.col("_i")
            )
        ).alias("_c"),
        F.min(
            F.struct(
                F.col("_s"), (-F.col("_i")).alias("_ni"), F.col("_t"), F.col("_i")
            )
        ).alias("_r"),
        F.count(F.lit(1)).alias("n_replies"),
    )
    two = F.col("n_replies") >= 2
    return roots.join(elected, "root_id").select(
        "root_id",
        "question",
        F.col("_c._t").alias("chosen"),
        F.when(two, F.col("_r._t")).alias("rejected"),
        F.col("_c._s").alias("chosen_score"),
        F.when(two, F.col("_r._s")).alias("rejected_score"),
        "n_replies",
    )


def chat_validate(
    df: DataFrame,
    turns_col: str = "turns",
    id_col: str = "doc_id",
    roles: tuple = ("system", "user", "assistant"),
) -> DataFrame:
    """Structural validation of SFT/chat training records — the schema
    gate every instruction-tuning pipeline runs before the tokenizer
    ever sees a conversation (a single assistant-first or role-repeated
    record silently corrupts the chat template for the whole batch it
    lands in).

    `turns_col` is array<struct<role:string, content:string>>. Checks,
    in FIXED first-failure precedence (deterministic, the reported
    reason is the first one that trips):

      1. no_turns        empty/NULL conversation
      2. unknown_role    any role outside `roles`
      3. bad_start       first turn is 'assistant' (system/user may
                         open; the model must never speak first)
      4. role_repeat     adjacent turns with the same role
      5. empty_content   any NULL or '' content
      6. no_assistant    nothing for the loss mask to train on

    Returns (id_col, n_turns:int, n_assistant:int, valid:int,
    reason:string NULL-when-valid).

    Scale shape: ONE codegen'd projection over the conversations scan —
    every check is exists/filter/zip_with over the in-row array, zero
    shuffles, zero Python; at 10^12 records this runs at scan speed."""
    t = F.col(turns_col)
    sz = F.coalesce(F.size(t), F.lit(0))  # NULL conversation == empty
    role_of = lambda x: x["role"]  # noqa: E731
    allowed = F.array(*[F.lit(r) for r in roles])
    unknown = F.exists(t, lambda x: ~F.array_contains(allowed, role_of(x)))
    bad_start = role_of(F.element_at(t, 1)) == "assistant"
    pair_len = F.greatest(sz - 1, F.lit(0))
    repeat = F.exists(
        F.zip_with(
            F.slice(t, 1, pair_len),
            F.slice(t, 2, pair_len),
            lambda a, b: role_of(a) == role_of(b),
        ),
        lambda x: x,
    )
    empty = F.exists(
        t, lambda x: x["content"].isNull() | (x["content"] == "")
    )
    n_assist = F.coalesce(
        F.size(F.filter(t, lambda x: role_of(x) == "assistant")), F.lit(0)
    )
    reason = (
        F.when(sz <= 0, F.lit("no_turns"))
        .when(unknown, F.lit("unknown_role"))
        .when(bad_start, F.lit("bad_start"))
        .when(repeat, F.lit("role_repeat"))
        .when(empty, F.lit("empty_content"))
        .when(n_assist == 0, F.lit("no_assistant"))
    )
    return df.select(
        F.col(id_col),
        sz.alias("n_turns"),
        n_assist.alias("n_assistant"),
        reason.isNull().cast("int").alias("valid"),
        reason.alias("reason"),
    )
