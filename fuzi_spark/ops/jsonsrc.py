"""JSONL source: schema-on-read line records with a parse-error
surface instead of task failures.

Training corpora overwhelmingly ship as JSON-lines (one record per
line); at 10^12 lines some fraction is ALWAYS malformed — truncated
uploads, encoding damage, concatenation seams. The engine's standing
error contract (xmlparser/pdf/multimodal: recover, flag, never kill
the task) applies here too: every line yields a row, malformed ones
carry parse_ok = false and NULL fields, and the raw line is preserved
for quarantine/repair instead of being dropped.

Spark shape: `from_json` with an explicit schema — JVM-side Jackson
parsing inside codegen, NO Python, no schema inference pass (at
corpus scale `spark.read.json`'s sampling inference is a full extra
scan AND nondeterministic under sampling; an explicit schema is both
faster and reproducible). Corrupt detection: a malformed line makes
from_json return NULL (checked against a null-input guard so missing
lines and broken lines are distinguishable).

Reference parity note: the reference (kylehughes/Fuzi) parses XML/HTML
only; JSONL is pipeline-brief scope (corpus delivery format), but the
error-surface DESIGN is the reference's recovering-parser contract
(Sources/Document.swift:126 RECOVER|NOWARNING|NOERROR) carried over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_jsonl(
    df: DataFrame,
    schema: str,
    line_col: str = "line",
    keep_raw: bool = True,
) -> DataFrame:
    """Parse a string column of JSONL records against `schema` (a DDL
    string, e.g. "id BIGINT, lang STRING, n BIGINT").

    Output: one column per schema field, plus
      parse_ok : boolean — false for malformed (non-NULL) lines
      raw      : the original line when keep_raw and parse failed,
                 else NULL (quarantine without doubling storage)
    NULL input lines yield parse_ok = NULL (absent, not broken).

    Malformed-line detection uses the corrupt-record column contract:
    Spark 4's from_json in PERMISSIVE mode returns a struct of NULL
    FIELDS for a broken line (not a NULL struct — a null-check on the
    struct silently passes garbage), so the parse is run with an
    appended `_corrupt` field and columnNameOfCorruptRecord pointing
    at it; a non-NULL `_corrupt` IS the failure signal. The schema
    must not already contain a `_corrupt` field."""
    if "_corrupt" in schema:
        raise ValueError("schema must not define _corrupt (reserved)")
    rec = F.from_json(
        F.col(line_col),
        schema + ", _corrupt STRING",
        {"columnNameOfCorruptRecord": "_corrupt", "mode": "PERMISSIVE"},
    )
    out = df.withColumn("_rec", rec)
    ok = F.when(
        F.col(line_col).isNull(), F.lit(None).cast("boolean")
    ).otherwise(F.col("_rec._corrupt").isNull())
    out = out.withColumn("parse_ok", ok)
    fields = [
        f for f in out.schema["_rec"].dataType.fieldNames()
        if f != "_corrupt"
    ]
    cols = [c for c in df.columns if c != line_col]
    cols += [
        F.when(F.col("parse_ok"), F.col(f"_rec.{f}")).alias(f)
        for f in fields
    ]
    cols.append("parse_ok")
    if keep_raw:
        cols.append(
            F.when(F.col("parse_ok") == False, F.col(line_col))  # noqa: E712
            .alias("raw")
        )
    return out.select(*cols)
