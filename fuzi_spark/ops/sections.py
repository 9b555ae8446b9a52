"""Section chunking over interleaved span sequences.

The pipeline's extraction stage (fuzi_spark/extract.py,
fastextract.py) emits ordered (kind, text, media_ref, offset) spans
per document with kind ∈ {heading, text, media, ...}. Downstream
consumers — RAG indexing, section-aware packing, caption-context
mining — want the document re-cut into SECTIONS: each heading opens a
new unit carrying that heading, the text under it re-joined in span
order, and the media that falls inside it counted. This is the
span-native version of "chunk by heading path": the unit of retrieval
becomes a titled section instead of an arbitrary char window
(ops/packing.py chunk_documents is the char-window complement).

Section assignment: a span's section_id is the number of heading
spans at-or-before it in span order — the running heading count.
Spans before the first heading form section 0 (the "preamble") with a
NULL heading; each heading opens its own section and belongs to it.

Distributed shape — ONE shuffle:

- posexplode of the in-row spans array is map-side,
- the running heading count is a window over (doc_id, span position)
  — the single hash(doc_id) exchange,
- the per-section fold (ordered text re-join, media count, min
  offset) is a groupBy(doc_id, section_id) whose required clustering
  is satisfied by the window's hashpartitioning(doc_id) — Catalyst
  reuses the exchange, no second shuffle (pinned in tests via the
  plan's Exchange count),
- in-group text order is restored by sorting the collected
  (pos, text) structs, never by trusting collect_list order.

Reference parity note: the reference (kylehughes/Fuzi) has no
span/section surface — pipeline-brief scope (extraction downstream),
same bucket as ops/assemble.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def section_chunks(
    docs: DataFrame,
    spans_col: str = "spans",
    id_col: str = "doc_id",
    sep: str = "\n",
    heading_kind: str = "heading",
    text_kind: str = "text",
    media_kind: str = "media",
) -> DataFrame:
    """(doc_id, section_id, heading, text, n_media, first_offset) —
    one row per section in span order; section 0 only exists when
    spans precede the first heading (its heading is NULL)."""
    sp = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(spans_col).alias("pos", "s"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sec = F.sum(
        (F.col("s.kind") == heading_kind).cast("int")
    ).over(w)
    rows = sp.select(
        "doc_id",
        "pos",
        sec.alias("section_id"),
        "s.kind",
        "s.text",
        "s.media_ref",
        "s.offset",
    )
    texts = F.array_sort(
        F.collect_list(
            F.when(
                F.col("kind") == text_kind,
                F.struct("pos", F.col("text").alias("t")),
            )
        )
    )
    return (
        rows.groupBy("doc_id", "section_id")
        .agg(
            F.max(
                F.when(F.col("kind") == heading_kind, F.col("text"))
            ).alias("heading"),
            F.array_join(
                F.transform(texts, lambda x: x["t"]), sep
            ).alias("text"),
            F.sum((F.col("kind") == media_kind).cast("long")).alias(
                "n_media"
            ),
            F.min("offset").alias("first_offset"),
        )
    )
