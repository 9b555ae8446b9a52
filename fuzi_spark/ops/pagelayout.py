"""Running header/footer removal for paginated documents.

PDF and OCR extraction (fuzi_spark/pdf.py) leaves running headers and
footers — the journal name, chapter title, "Page 17" — repeated on
every page. They are page CHROME, not content: left in, they poison
n-gram stats, dedup signatures, and the training text itself (the
classic pdfminer/GROBID cleanup step; ops/template.py site_template is
the same idea for same-site HTML, this is the within-document,
cross-PAGE variant).

A line is RUNNING when its page-number-normalized form (digits
squashed to '#', whitespace collapsed, lowered — "Page 3" and
"Page 14" must unify) recurs in the same page zone (first `band`
lines = header zone, last `band` = footer zone) on at least
max(min_pages, ceil(min_frac · n_pages)) distinct pages of the SAME
document.

Input is the relational page-line table (doc_id, page, line_no,
n_lines, text); output is the same rows with an `is_running` flag —
callers filter or re-join as they need (flag, don't delete: the
verification surface wants to see what was removed).

Distributed shape — every key starts with doc_id, so the whole op is
per-document parallel with no corpus-wide state:

- boundary lines are filtered MAP-SIDE before any shuffle (interior
  lines can never be running and never enter the aggregation),
- recurrence is groupBy(doc, zone, norm) with count(DISTINCT page)
  folded to count(*) over a pre-distinct projection (partial aggs
  survive),
- per-doc page counts ride the same doc_id partitioning,
- the final flag is a left join of the input rows against the
  runner set on (doc, zone, norm) — runner sets are tiny (chrome
  variants per doc), the join is doc-co-partitioned, never broadcast
  of anything corpus-sized.

Reference parity note: the reference (kylehughes/Fuzi) has no
pagination surface — pipeline-brief scope (extraction cleanup), same
bucket as ops/template.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), "[0-9]+", "#"), r"\s+", " "
        )
    )


def strip_running_lines(
    lines: DataFrame,
    band: int = 2,
    min_pages: int = 3,
    min_frac: float = 0.6,
) -> DataFrame:
    """(doc_id, page, line_no, n_lines, text, is_running) — input rows
    flagged; a line is running iff its normalized form recurs in the
    same zone on enough distinct pages of its document."""
    if band < 1:
        raise ValueError(f"band must be >= 1, got {band}")
    zone = (
        F.when(F.col("line_no") < band, F.lit("h"))
        .when(F.col("line_no") >= F.col("n_lines") - band, F.lit("f"))
        .otherwise(F.lit(None))
    )
    tagged = lines.select(
        "doc_id", "page", "line_no", "n_lines", "text",
        zone.alias("_zone"),
        _norm(F.col("text")).alias("_norm"),
    )
    boundary = tagged.where(F.col("_zone").isNotNull())
    # distinct first so count(*) IS the distinct-page count (keeps the
    # map-side partial agg that count(DISTINCT ...) would forfeit)
    recur = (
        boundary.select("doc_id", "_zone", "_norm", "page")
        .distinct()
        .groupBy("doc_id", "_zone", "_norm")
        .agg(F.count("*").alias("_n_pages_seen"))
    )
    pages = (
        lines.select("doc_id", "page")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("_n_pages"))
    )
    runners = (
        recur.join(pages, "doc_id")
        .where(
            (F.col("_n_pages_seen") >= min_pages)
            & (
                F.col("_n_pages_seen")
                >= F.ceil(F.col("_n_pages") * F.lit(min_frac))
            )
        )
        .select("doc_id", "_zone", "_norm", F.lit(True).alias("_run"))
    )
    return (
        tagged.join(runners, ["doc_id", "_zone", "_norm"], "left")
        .select(
            "doc_id", "page", "line_no", "n_lines", "text",
            F.coalesce("_run", F.lit(False)).alias("is_running"),
        )
    )
