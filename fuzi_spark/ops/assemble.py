"""Interleaved-sequence assembly: extracted spans → trainer input.

The extraction pipeline emits ordered (kind, text, media_ref, offset)
spans per document (fuzi_spark/extract.py — kinds: heading, paragraph,
list, caption, media, text). A multimodal trainer consumes one string
per document with media positions marked by a sentinel token the
loader later swaps for pixel embeddings. This module is that last
assembly step, plus the media-balance gate interleaved corpora apply
before it (a page that is 40 thumbnails and one sentence is gallery
boilerplate, not a training document).

Everything here is pure Catalyst over the spans array — one codegen'd
projection per operator, zero shuffles, zero Python. At 10^12 docs
these run at scan speed on the extraction output table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def render_spans(spans: Column, image_token: str = "<image>") -> Column:
    """Render an ordered spans array to one training string:

    - media     → the sentinel `image_token` (alt text is metadata for
                  the media table, not trainer input),
    - heading   → '# ' + text (one marker level — the extractor does
                  not preserve h1-h6 depth, so pretending would lie),
    - list      → '- ' + text,
    - all else  → text verbatim (paragraph, caption, text),
    - non-media spans whose text is empty/NULL are dropped,

    joined by blank lines ('\\n\\n'), preserving span order.
    """
    rendered = F.transform(
        spans,
        lambda s: F.when(s["kind"] == "media", F.lit(image_token))
        .when(
            (s["kind"] == "heading") & (F.length(s["text"]) > 0),
            F.concat(F.lit("# "), s["text"]),
        )
        .when(
            (s["kind"] == "list") & (F.length(s["text"]) > 0),
            F.concat(F.lit("- "), s["text"]),
        )
        .otherwise(F.coalesce(s["text"], F.lit(""))),
    )
    return F.coalesce(
        F.array_join(F.filter(rendered, lambda t: t != ""), "\n\n"),
        F.lit(""),  # NULL spans array → empty doc, total either way
    )


def interleaved_training_text(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    image_token: str = "<image>",
) -> DataFrame:
    """One trainer-ready row per document: (id_col, text, n_media:long,
    n_text_chars:long) — n_text_chars counts SOURCE span text (media
    sentinels and the inserted '# '/'- ' markers excluded), so the
    media-balance numbers match `media_balance_filter` exactly."""
    s = F.col(spans_col)
    return df.select(
        F.col(id_col),
        render_spans(s, image_token).alias("text"),
        _n_media(s).alias("n_media"),
        _n_text_chars(s).alias("n_text_chars"),
    )


def _n_media(spans: Column) -> Column:
    return F.coalesce(
        F.size(F.filter(spans, lambda s: s["kind"] == "media")),
        F.lit(0),
    ).cast("long")


def _n_text_chars(spans: Column) -> Column:
    return F.coalesce(
        F.aggregate(
            spans,
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.when(
                s["kind"] != "media",
                F.coalesce(F.length(s["text"]), F.lit(0)),
            ).otherwise(F.lit(0)).cast("long"),
        ),
        F.lit(0).cast("long"),
    )


def media_balance_filter(
    df: DataFrame,
    max_media: int = 32,
    min_chars_per_media: int = 100,
    spans_col: str = "spans",
) -> DataFrame:
    """Interleaved-corpus gate on the media/text balance. Adds
    (n_media:long, n_text_chars:long, keep:int, reject_reason:string)
    — first-failure reason codes, the quality_filter contract:

    - 'too_many_media'   n_media > max_media (gallery/spam pages),
    - 'media_text_ratio' n_media > 0 and n_text_chars <
                         min_chars_per_media * n_media (thumbnails
                         with no prose),
    - text-only docs (n_media = 0) always pass this gate — stack
      quality_filter for pure-text criteria.
    """
    s = F.col(spans_col)
    m = df.withColumn("n_media", _n_media(s)).withColumn(
        "n_text_chars", _n_text_chars(s)
    )
    reason = F.when(
        F.col("n_media") > max_media, F.lit("too_many_media")
    ).when(
        (F.col("n_media") > 0)
        & (
            F.col("n_text_chars")
            < F.lit(min_chars_per_media) * F.col("n_media")
        ),
        F.lit("media_text_ratio"),
    )
    return m.withColumn("reject_reason", reason).withColumn(
        "keep", F.col("reject_reason").isNull().cast("int")
    )


def media_context(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Image-text alignment rows from the interleaved span stream: for
    every media span, its alt text plus the nearest non-empty textual
    span BEFORE and AFTER it in document order — the (image, caption,
    context) triples a caption-contrastive (CLIP-style) trainer pairs
    with the pixels. Complements ops/captions.image_captions (which
    needs the raw markup): this one runs on the already-extracted
    spans table, no re-parse.

    Columns: (doc_id, seq, media_ref, alt_text, context_before,
    context_after) — seq is the span's position in the array; missing
    neighbors and blank alt are NULL.

    Scale shape: pure Catalyst array ops in ONE codegen'd projection —
    for each media span the before/after texts come from filtered
    slices of the SAME bound array (spans arrays are page-sized, so the
    per-element slice is bounded); the explode is a narrow Generate.
    Zero shuffles, zero Python."""
    from .hof import bind

    def is_text(s):
        return (s["kind"] != "media") & s["text"].isNotNull() & (
            F.length(s["text"]) > 0
        )

    def mk(spans):
        n = F.size(spans)
        return F.filter(
            F.transform(
                spans,
                lambda s, i: F.struct(
                    i.cast("int").alias("seq"),
                    s["kind"].alias("kind"),
                    s["media_ref"].alias("media_ref"),
                    F.when(
                        F.length(s["text"]) > 0, s["text"]
                    ).alias("alt_text"),
                    F.try_element_at(
                        F.filter(F.slice(spans, 1, i), is_text),
                        F.lit(-1),
                    )["text"].alias("context_before"),
                    F.try_element_at(
                        F.filter(
                            F.slice(spans, i + 2, n), is_text
                        ),
                        F.lit(1),
                    )["text"].alias("context_after"),
                ),
            ),
            lambda s: s["kind"] == "media",
        )

    rows = bind(F.col(spans_col), mk)
    return df.select(F.col(id_col), F.explode(rows).alias("m")).select(
        id_col,
        "m.seq",
        "m.media_ref",
        "m.alt_text",
        "m.context_before",
        "m.context_after",
    )


def interleave_episodes(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    max_images: int = 8,
    max_chars: int = 4096,
    image_token: str = "<image>",
) -> DataFrame:
    """Split each document's ordered span sequence into trainer
    EPISODES — the interleaved multimodal format (text with
    `image_token` sentinels + an aligned media_refs array) under two
    budgets: at most `max_images` media spans and at most `max_chars`
    SOURCE text chars per episode. Greedy in document order: a span
    that would overflow either budget starts the next episode; an
    episode is never empty, so a single over-budget span still forms
    its own episode (flagged by its counts) rather than being silently
    dropped. Docs with NULL/empty spans emit no rows.

    Returns (id_col, episode_idx:int, text, media_refs:array<string>,
    n_media:long, n_text_chars:long) — counts use the same source-char
    convention as media_balance_filter.

    Pure Catalyst, zero shuffles: ONE sequential `aggregate` pass tags
    every span with its episode id (the greedy state — running chars,
    running media, current-episode size — lives in the fold
    accumulator), then per-episode slices and the render are separate
    PROJECTIONS (one stage per derivation — the chained-HOF expansion
    lesson from the minhash/OPH work: columns are evaluated once per
    row, inline expression trees are not)."""
    s = F.col(spans_col)
    acc0 = F.struct(
        F.lit(0).cast("int").alias("ep"),
        F.lit(0).cast("long").alias("chars"),
        F.lit(0).cast("int").alias("media"),
        F.lit(0).cast("int").alias("cur_n"),
        F.array().cast("array<int>").alias("eps"),
    )

    def step(acc, sp):
        is_media = sp["kind"] == "media"
        add_c = (
            F.when(is_media, F.lit(0))
            .otherwise(F.coalesce(F.length(sp["text"]), F.lit(0)))
            .cast("long")
        )
        add_m = F.when(is_media, F.lit(1)).otherwise(F.lit(0)).cast("int")
        roll = (acc["cur_n"] > 0) & (
            (acc["chars"] + add_c > max_chars)
            | (acc["media"] + add_m > max_images)
        )
        new_ep = (
            F.when(roll, acc["ep"] + 1).otherwise(acc["ep"]).cast("int")
        )
        return F.struct(
            new_ep.alias("ep"),
            F.when(roll, add_c)
            .otherwise(acc["chars"] + add_c)
            .cast("long")
            .alias("chars"),
            F.when(roll, add_m)
            .otherwise(acc["media"] + add_m)
            .cast("int")
            .alias("media"),
            F.when(roll, F.lit(1))
            .otherwise(acc["cur_n"] + 1)
            .cast("int")
            .alias("cur_n"),
            F.concat(acc["eps"], F.array(new_ep)).alias("eps"),
        )

    tagged = (
        df.filter(F.size(s) > 0)
        .select(F.col(id_col), s.alias("_s"))
        .withColumn("_t", F.aggregate(F.col("_s"), acc0, step))
    )
    zipped = tagged.select(
        id_col,
        F.col("_t.ep").alias("_last"),
        F.zip_with(
            F.col("_s"),
            F.col("_t.eps"),
            lambda sp, e: F.struct(
                e.alias("ep"),
                sp["kind"].alias("kind"),
                sp["text"].alias("text"),
                sp["media_ref"].alias("media_ref"),
            ),
        ).alias("_z"),
    )
    exploded = zipped.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_last")),
                lambda e: F.filter(F.col("_z"), lambda z: z["ep"] == e),
            )
        ).alias("episode_idx", "_ep_spans"),
    )
    ep = F.col("_ep_spans")
    return exploded.select(
        id_col,
        F.col("episode_idx").cast("int").alias("episode_idx"),
        render_spans(ep, image_token).alias("text"),
        F.transform(
            F.filter(ep, lambda z: z["kind"] == "media"),
            lambda z: z["media_ref"],
        ).alias("media_refs"),
        _n_media(ep).alias("n_media"),
        _n_text_chars(ep).alias("n_text_chars"),
    )


def loss_mask_spans(
    episodes: DataFrame,
    text_col: str = "text",
    refs_col: str = "media_refs",
    image_token: str = "<image>",
) -> DataFrame:
    """Training loss-mask spans for rendered interleaved episodes: the
    character ranges occupied by `image_token` sentinels must NOT
    contribute to the LM loss (those positions are filled by vision
    embeddings at train time, not predicted). Adds

        mask_starts/mask_ends : array<long>   (parallel, half-open)
        n_trainable_chars     : long          (text minus masked)
        mask_ok               : boolean

    `mask_ok` is the collision guard: the number of sentinel
    occurrences found by scanning must equal size(media_refs) — if the
    SOURCE text itself contained the sentinel literal, counts diverge
    and the row is flagged rather than silently mis-masked (choose a
    sentinel outside the corpus alphabet; the flag is the audit).

    Pure Catalyst, zero shuffles: split on the sentinel, then ONE
    sequential `aggregate` turns the head parts into cumulative start
    offsets (the fold carries the running position), then projections
    derive the ends/counts — one stage per derivation (the chained-HOF
    expansion lesson: columns are evaluated once per row, inline
    expression trees are not)."""
    import re as _re

    sentinel_len = len(image_token)
    parts = F.split(F.col(text_col), _re.escape(image_token), -1)
    heads = F.slice(parts, 1, F.size(parts) - 1)
    acc0 = F.struct(
        F.lit(0).cast("long").alias("run"),
        F.array().cast("array<long>").alias("starts"),
    )

    def step(acc, p):
        start = acc["run"] + F.length(p)
        return F.struct(
            (start + F.lit(sentinel_len)).alias("run"),
            F.concat(acc["starts"], F.array(start)).alias("starts"),
        )

    out = episodes.withColumn(
        "mask_starts", F.aggregate(heads, acc0, step)["starts"]
    )
    out = out.withColumn(
        "mask_ends",
        F.transform(
            F.col("mask_starts"), lambda s: s + F.lit(sentinel_len)
        ),
    )
    n_mask = F.size("mask_starts")
    return (
        out.withColumn(
            "n_trainable_chars",
            (
                F.length(text_col)
                - n_mask.cast("long") * F.lit(sentinel_len)
            ).cast("long"),
        )
        .withColumn(
            "mask_ok",
            n_mask == F.size(F.coalesce(
                F.col(refs_col), F.array().cast("array<string>")
            )),
        )
    )


VALID_KINDS = ("heading", "paragraph", "list", "caption", "media", "text")


def span_validate(
    docs: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Structural gate for the interleaved span table itself — the
    contract every upstream writer (extract, codec round-trip,
    third-party ingest) must satisfy before spans enter the pipeline.

    Checks, in FIXED first-failure precedence (one reason per doc,
    the earliest violated check — the ops/threads.py chat_validate
    discipline, so a reject is always actionable):

      no_spans           NULL or empty spans array
      bad_kind           any span kind outside VALID_KINDS (or NULL)
      missing_media_ref  a media span with NULL/empty media_ref
      missing_text       a non-media span with NULL text (empty
                         string is legal — render_spans drops it)
      offset_disorder    offsets not strictly increasing in array
                         order (span order IS the document order;
                         a tie or inversion scrambles assembly)

    Returns (doc_id, n_spans:int, n_media:int, valid:int, reason) —
    reason NULL when valid. ONE codegen'd projection: exists/zip_with
    over the in-row array, zero shuffles, zero Python — scan speed on
    the 10^12-row input table.
    """
    sp = F.coalesce(
        F.col(spans_col),
        F.array().cast(
            "array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>"
        ),
    )
    kinds = F.array(*[F.lit(k) for k in VALID_KINDS])
    bad_kind = F.exists(
        sp, lambda s: ~F.array_contains(kinds, s["kind"])
        | s["kind"].isNull()
    )
    bad_media = F.exists(
        sp,
        lambda s: (s["kind"] == "media")
        & (s["media_ref"].isNull() | (s["media_ref"] == "")),
    )
    bad_text = F.exists(
        sp, lambda s: (s["kind"] != "media") & s["text"].isNull()
    )
    offs = F.transform(sp, lambda s: s["offset"])
    disorder = F.exists(
        F.zip_with(
            offs,
            F.slice(offs, 2, F.greatest(F.size(offs) - 1, F.lit(0))),
            lambda a, b: b <= a,
        ),
        lambda x: x,
    )
    reason = (
        F.when(F.size(sp) == 0, F.lit("no_spans"))
        .when(bad_kind, F.lit("bad_kind"))
        .when(bad_media, F.lit("missing_media_ref"))
        .when(bad_text, F.lit("missing_text"))
        .when(disorder, F.lit("offset_disorder"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(sp).alias("n_spans"),
        F.size(F.filter(sp, lambda s: s["kind"] == "media")).alias(
            "n_media"
        ),
        reason.isNull().cast("int").alias("valid"),
        reason.alias("reason"),
    )


def span_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    seq_col: str = "seq",
    kind_col: str = "kind",
    text_col: str = "text",
    ref_col: str = "media_ref",
) -> DataFrame:
    """Per-document diff of two span-table extraction runs — the
    north-rule invariant (span-sequence equality on (kind, text,
    media_ref, order)) turned into an OPERATOR, for the question every
    extractor refactor raises: which documents changed, how much, and
    where does the divergence start. shard_manifest answers it
    per-shard at metadata cost; this answers it per-document at span
    granularity, on exactly the shards the manifest flagged.

    One full-outer join on (doc_id, seq) — co-partitioned sort-merge
    on the same key both span tables are already written with — then
    a doc-keyed fold with map-side partials. NULL-safe field compare
    (media spans carry NULL text, text spans NULL media_ref).

    Returns one row per doc appearing in either run: (doc_id, n_same,
    n_changed — both runs have the seq but any of kind/text/media_ref
    differ, n_added — seq only in new, n_removed — seq only in old,
    identical int, first_div_seq — smallest diverging seq, NULL when
    identical)."""
    def side(df, tag):
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.col(seq_col).alias("seq"),
            F.struct(
                F.col(kind_col).alias("kind"),
                F.col(text_col).alias("text"),
                F.col(ref_col).alias("media_ref"),
            ).alias(tag),
        )

    j = side(old, "_o").join(side(new, "_n"), ["doc_id", "seq"], "full_outer")
    # struct equality in Spark is NULL-safe per field via eqNullSafe
    same = F.col("_o").eqNullSafe(F.col("_n"))
    status = (
        F.when(F.col("_o").isNull(), F.lit("added"))
        .when(F.col("_n").isNull(), F.lit("removed"))
        .when(same, F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    per = j.select("doc_id", "seq", status.alias("_st"))
    agg = per.groupBy("doc_id").agg(
        F.sum((F.col("_st") == "same").cast("int")).alias("n_same"),
        F.sum((F.col("_st") == "changed").cast("int")).alias("n_changed"),
        F.sum((F.col("_st") == "added").cast("int")).alias("n_added"),
        F.sum((F.col("_st") == "removed").cast("int")).alias("n_removed"),
        F.min(
            F.when(F.col("_st") != "same", F.col("seq"))
        ).alias("first_div_seq"),
    )
    return agg.select(
        "doc_id",
        F.col("n_same").cast("bigint").alias("n_same"),
        F.col("n_changed").cast("bigint").alias("n_changed"),
        F.col("n_added").cast("bigint").alias("n_added"),
        F.col("n_removed").cast("bigint").alias("n_removed"),
        (
            (F.col("n_changed") + F.col("n_added") + F.col("n_removed"))
            == 0
        )
        .cast("int")
        .alias("identical"),
        F.col("first_div_seq").cast("int").alias("first_div_seq"),
    )
