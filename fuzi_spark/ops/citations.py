"""Scholarly / standards citation extraction: DOI, arXiv, RFC ids.

Corpus curation wants citation identifiers per document for three
jobs: routing academic text to a high-quality bucket (papers and
their discussions are top-tier pretraining data), building
citation-graph features (in-degree as a quality prior, the
"citation-informed selection" lens), and joining web text to
canonical metadata (a DOI is a stable key where a URL is not).

Everything is ONE codegen'd projection — three regexp_extract_all
calls plus array normalization, zero shuffles, zero Python, scan
speed at any scale. The patterns live in the Java-regex ∩ RE2
portable subset (the ops/redact.py discipline: no lookaround, no
backreferences, `(?i)`/`(?:)` only) so the DuckDB oracle runs the
IDENTICAL patterns — the oracle check IS the portability proof.

Normalization contract (deterministic, engine-neutral):
- DOI: matched verbatim, case preserved (DOI suffixes are
  case-insensitive per Crossref but dedup here is exact — a CASE
  squash would merge legitimately distinct display forms; callers
  wanting Crossref semantics lower() downstream). Registrant code is
  4-9 digits; the suffix must END in [A-Za-z0-9] so trailing
  sentence punctuation never rides along.
- arXiv: new-style ids only (YYMM.NNNNN, 4-5 digit number, optional
  vN), matched case-insensitively, emitted lower()ed — the canonical
  form.
- RFC: `rfc` + optional space/hyphen + 3-5 digits, case-insensitive,
  emitted as 'rfc' + digits (the join key form).

Each array is distinct()ed then sort()ed — output is a deterministic
set, independent of match order and partitioning.

Reference parity note: no counterpart in the reference
(kylehughes/Fuzi) — pipeline-brief scope (corpus metadata), same
bucket as ops/license.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex ∩ RE2 portable (no lookaround/backrefs); the oracle runs
# these byte-identical.
DOI_RE = r"10\.[0-9]{4,9}/[-._;()/:A-Za-z0-9]*[A-Za-z0-9]"
ARXIV_RE = r"(?i)arxiv:[0-9]{4}\.[0-9]{4,5}(?:v[0-9]+)?"
RFC_RE = r"(?i)rfc[ -]?[0-9]{3,5}"


def extract_citations(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dois, arxiv_ids, rfcs, n_refs) — each id column a
    sorted-distinct array<string>, n_refs the total distinct ids."""
    txt = F.coalesce(F.col(text_col), F.lit(""))

    def norm(pattern, post=None):
        arr = F.regexp_extract_all(txt, F.lit(pattern), 0)
        if post is not None:
            arr = F.transform(arr, post)
        return F.array_sort(F.array_distinct(arr))

    dois = norm(DOI_RE)
    arxiv = norm(ARXIV_RE, lambda m: F.lower(m))
    rfcs = norm(
        RFC_RE,
        lambda m: F.concat(
            F.lit("rfc"), F.regexp_replace(m, r"[^0-9]", "")
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        dois.alias("dois"),
        arxiv.alias("arxiv_ids"),
        rfcs.alias("rfcs"),
        (F.size(dois) + F.size(arxiv) + F.size(rfcs)).alias("n_refs"),
    )
