"""Media-side corpus hygiene for interleaved text+media documents.

An interleaved corpus carries media references inside the span arrays
the extractor emits (fuzi_spark/extract.py). The text side has a full
dedup/quality battery (ops/dedup.py, ops/textstats.py); this module is
the MEDIA twin of the boilerplate problem: the same logo, nav sprite,
tracking pixel, or share button appears on every page of a site (and
site-wide banners appear across the whole crawl). Those spans are
template chrome, not content — a multimodal trainer that keeps them
burns an <image> slot per page on the same logo, exactly like keeping
"© 2024 Example Corp" in the text.

Detection is pure frequency: a media_ref that occurs in many DISTINCT
documents is template chrome; real content images are (near-)unique.
This mirrors how text boilerplate removal keys on cross-document
repetition (repeated_passages in ops/dedup.py) — reference parity note:
Fuzi itself strips <script>/<style> chrome via removal
(Sources/Fuzi/NodeSet.swift's remove surface, Tests covering
script/style strip); this is the corpus-statistical generalization of
that per-document operation.

Scale shape (10^12 docs): the frequency pass explodes media_ref STRINGS
only — span text never leaves its row — and aggregates with map-side
combine keyed on the ref string. The boilerplate set is bounded by
n_occurrences/min_docs (high-frequency by definition ⇒ small relative
to the corpus), so the strip join semi-joins the per-doc distinct refs
against it and rebuilds the spans array with one codegen'd
`filter(spans, ...)` projection; AQE broadcasts the boilerplate side
when it fits. Two shuffles total (ref agg, strip join), both on short
string keys.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _media_refs(spans: Column) -> Column:
    """Distinct non-null media_ref strings of one document's spans."""
    return F.array_distinct(
        F.transform(
            F.filter(
                spans,
                lambda s: (s["kind"] == "media") & s["media_ref"].isNotNull(),
            ),
            lambda s: s["media_ref"],
        )
    )


def media_frequency(
    df: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    domain_col: Optional[str] = None,
) -> DataFrame:
    """Cross-document media-reference frequency table.

    Returns (media_ref, n_docs:long, n_occurrences:long) — n_docs counts
    DISTINCT documents referencing the ref (the boilerplate signal),
    n_occurrences counts total span occurrences (a gallery page that
    repeats one image 40 times is one doc, not 40). With `domain_col`
    the grouping key becomes (domain, media_ref) — site-scoped chrome
    (per-site logos) — and the output carries the domain column.

    Only (id, ref) pairs travel: refs are exploded AFTER per-doc
    dedup-by-ref collapses gallery repetition locally, with per-doc
    occurrence counts carried as ints, so the shuffle rows are
    (ref, 1, k) — never one row per span occurrence.
    """
    spans = F.col(spans_col)
    per_doc = df.select(
        *( [F.col(domain_col)] if domain_col else [] ),
        F.col(id_col),
        F.explode(
            F.transform(
                _media_refs(spans),
                lambda r: F.struct(
                    r.alias("media_ref"),
                    F.size(
                        F.filter(spans, lambda s: s["media_ref"] == r)
                    ).alias("occ"),
                ),
            )
        ).alias("m"),
    ).select(
        *( [domain_col] if domain_col else [] ),
        F.col("m.media_ref").alias("media_ref"),
        F.col("m.occ").alias("occ"),
    )
    keys = ([domain_col] if domain_col else []) + ["media_ref"]
    return per_doc.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("occ").cast("long").alias("n_occurrences"),
    )


def strip_boilerplate_media(
    df: DataFrame,
    min_docs: int = 100,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    domain_col: Optional[str] = None,
) -> DataFrame:
    """Remove template-chrome media spans from the spans arrays.

    A media_ref occurring in >= min_docs distinct documents (within its
    domain when `domain_col` is given, corpus-wide otherwise) is
    boilerplate; every media span carrying it is dropped from the array
    — order and all other spans (including media spans with NULL
    media_ref) preserved. Adds n_media_stripped:long. Documents with no
    media pass through untouched (left join ⇒ no shuffle row for them
    beyond the probe).

    Threshold semantics: min_docs is an absolute distinct-doc count,
    deliberately NOT a fraction — at 10^12 docs "0.1% of the corpus" is
    a billion documents, while chrome detection needs only "appears on
    more pages than any plausible editorial reuse" (hundreds). Absolute
    counts also keep the decision stable under corpus growth.
    """
    spans = F.col(spans_col)
    freq_keys = ([domain_col] if domain_col else []) + ["media_ref"]
    boiler = (
        media_frequency(df, spans_col, id_col, domain_col)
        .filter(F.col("n_docs") >= F.lit(min_docs))
        .select(*freq_keys)
    )
    refs = df.select(
        *( [F.col(domain_col)] if domain_col else [] ),
        F.col(id_col),
        F.explode(_media_refs(spans)).alias("media_ref"),
    )
    bad_per_doc = (
        refs.join(boiler, on=freq_keys, how="inner")
        .groupBy(id_col)
        .agg(F.collect_set("media_ref").alias("_bad_refs"))
    )
    out = df.join(bad_per_doc, on=id_col, how="left")
    bad = F.coalesce(F.col("_bad_refs"), F.array().cast("array<string>"))
    kept = F.filter(
        spans,
        lambda s: (s["kind"] != "media")
        | s["media_ref"].isNull()
        | ~F.array_contains(bad, s["media_ref"]),
    )
    n_stripped = (
        F.coalesce(F.size(spans), F.lit(0))
        - F.coalesce(F.size(kept), F.lit(0))
    ).cast("long")
    return out.withColumn("n_media_stripped", n_stripped).withColumn(
        spans_col, kept
    ).drop("_bad_refs")


def media_ref_integrity(
    docs: DataFrame,
    media: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    media_id_col: str = "media_id",
) -> DataFrame:
    """Referential-integrity check between the span table and the
    media asset table: every media span's media_ref must resolve to a
    row in `media`, or the <image> slot the trainer reserves for it
    dereferences to nothing at batch-assembly time — a crash at best,
    a silently black image at worst. Run after every ingest/compact
    cycle (asset stores and span tables are written by different jobs;
    drift between them is an operational fact, not a hypothetical).

    Returns one row per doc: (doc_id, n_media_refs:int distinct refs,
    n_resolved:int, n_orphans:int, orphan_refs sorted array — the
    actionable re-fetch list). Docs without media spans report zeros.

    Scale shape: refs explode as STRINGS after a map-side
    kind='media' filter and per-doc array_distinct (span text never
    leaves its row); resolution is a LEFT join on the ref against the
    media table's key projection — ref-hash co-partitioned sort-merge,
    NO broadcast (the asset table at 10^12 docs is itself huge);
    the per-doc fold and the final left join are doc_id-keyed."""
    refs = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_media_refs(F.col(spans_col))).alias("_ref"),
        )
    )
    keys = media.select(
        F.col(media_id_col).alias("_ref"), F.lit(True).alias("_hit")
    ).distinct()
    per_doc = (
        refs.join(keys, "_ref", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_media_refs"),
            F.sum(F.col("_hit").isNotNull().cast("int")).alias(
                "n_resolved"
            ),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_hit").isNull(), F.col("_ref"))
                )
            ).alias("orphan_refs"),
        )
    )
    zero = F.lit(0)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_media_refs", zero).cast("int").alias(
                "n_media_refs"
            ),
            F.coalesce("n_resolved", zero).cast("int").alias(
                "n_resolved"
            ),
            (
                F.coalesce("n_media_refs", zero)
                - F.coalesce("n_resolved", zero)
            ).cast("int").alias("n_orphans"),
            F.coalesce(
                "orphan_refs", F.array().cast("array<string>")
            ).alias("orphan_refs"),
        )
    )
