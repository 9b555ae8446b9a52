"""Cross-document site-template (boilerplate) detection.

The per-document heuristics in fuzi_spark.extract.strip_boilerplate
score each page in isolation (tag-class, link-density, text-density —
the north_star triple). This module adds the web-scale signal those
heuristics cannot see: a text block that repeats across MANY pages of
the SAME site is template chrome (nav, footer, cookie banner,
"related articles" rail) even when its local density stats look like
content. This is the frequency-based template detection of
Gibson/Punera/Tomkins (WWW 2005, "The volume and evolution of web page
templates") re-expressed relationally: no pairwise page comparison,
just doc-frequency counts over block digests.

Input is a SPAN table — the output of the extraction pipeline
(fuzi_spark.udfs.extract_markup_df) with a domain column joined on —
so template detection composes downstream of the same extraction pass
everything else uses; it never re-parses markup.

Scale shape (10^12 docs, ~10^8 domains):
- block digests are one codegen'd projection (whitespace-normalized
  text -> xxhash64, 8 bytes per block);
- doc-frequency per (domain, digest) and page-count per domain are two
  map-side-combinable aggregations — the (domain, digest) key space is
  |distinct blocks|, far smaller than the span table;
- the flag table joins back on (domain, digest): both sides are
  compact keys, and AQE picks the strategy (per-domain flag tables are
  heavy-hitter-sized, not corpus-sized). No driver-side state, no
  collect, no pairwise joins anywhere.
- the span input is scoped_persist()ed because three plan branches
  consume it (two aggs + the tag join); release via cache_scope().

Reference tie-in: the blocks being counted are the reference's span
texts — Fuzi's stringValue() semantics (Element.swift:129-141) define
what "the same block" means across pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cache import scoped_persist

__all__ = ["block_digests", "template_flags", "template_stats"]


def _norm_text(text_col):
    # whitespace-normalized digest basis: minified and pretty-printed
    # renderings of the same template block must collide
    return F.trim(F.regexp_replace(text_col, r"\s+", " "))


def block_digests(
    spans: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_col: str = "seq",
) -> DataFrame:
    """spans -> (domain, _id, seq, block_digest, block_text): one row per
    non-empty text block, digest = xxhash64 of the normalized text.
    Empty/NULL blocks (media spans, parse-error rows) are dropped — an
    absent block is never evidence of templating."""
    norm = _norm_text(F.col(text_col))
    return (
        spans.select(
            F.col(domain_col).alias("domain"),
            F.col(id_col).alias("_id"),
            F.col(seq_col).alias("seq"),
            norm.alias("block_text"),
        )
        .filter(F.col("block_text").isNotNull() & (F.col("block_text") != ""))
        .withColumn("block_digest", F.xxhash64("block_text"))
    )


def template_flags(
    blocks: DataFrame,
    min_docs: int = 2,
    min_frac: float = 0.5,
) -> DataFrame:
    """(domain, block_digest, block_docs, domain_docs, is_template):
    a block is template when it appears in >= max(min_docs,
    ceil(min_frac * domain_docs)) DISTINCT documents of its domain.

    min_docs floors the rule so single-page domains (the long tail of
    the crawl) never self-template; min_frac scales the bar with site
    size so a passage syndicated onto 3 of a site's 10k pages stays
    content."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    per_block = blocks.groupBy("domain", "block_digest").agg(
        F.count_distinct("_id").alias("block_docs")
    )
    per_domain = blocks.groupBy("domain").agg(
        F.count_distinct("_id").alias("domain_docs")
    )
    thresh = F.greatest(
        F.lit(min_docs).cast("long"),
        F.ceil(F.lit(float(min_frac)) * F.col("domain_docs")),
    )
    return per_block.join(per_domain, "domain").select(
        "domain",
        "block_digest",
        "block_docs",
        "domain_docs",
        (F.col("block_docs") >= thresh).alias("is_template"),
    )


def template_stats(
    spans: DataFrame,
    min_docs: int = 2,
    min_frac: float = 0.5,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-document template rollup + template-stripped main text.

    Returns one row per document:
    (doc_id, n_spans:long, n_template:long, template_frac:double,
     main_text:string) — main_text is the seq-ordered newline join of
    the NON-template blocks (normalized text, the digest basis)."""
    blocks = scoped_persist(
        block_digests(spans, domain_col, id_col, text_col, seq_col)
    )
    flags = template_flags(blocks, min_docs, min_frac)
    tmpl = flags.filter(F.col("is_template")).select(
        "domain", "block_digest", F.lit(True).alias("_t")
    )
    tagged = blocks.join(tmpl, ["domain", "block_digest"], "left")
    kept = F.when(
        F.col("_t").isNull(),
        F.struct(F.col("seq").alias("seq"), F.col("block_text").alias("text")),
    )
    return tagged.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count("_t").alias("n_template"),
        (F.count("_t") / F.count(F.lit(1))).alias("template_frac"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda s: s["text"]
            ),
            "\n",
        ).alias("main_text"),
    )
