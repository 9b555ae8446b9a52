"""Vectorized Spark operators over document tables.

The distribution contract mirrors the reference's actor layer
(kylehughes/Fuzi Sources/Actor.swift:136-405): one DOM per document per
task, built transiently inside an Arrow batch, with only flat value
snapshots crossing the executor boundary. There are NO row-at-a-time
Python UDFs anywhere (input_hint hard requirement) — everything is
`pandas_udf` / `mapInPandas` over Arrow batches.

XPath/CSS expressions are compiled ONCE per executor process
(lru_cache in xpath.py / css.py) and reused across every batch — an
optimization the reference lacks (it re-compiles per query,
Queryable.swift:299).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- schemas

SPAN_FIELDS = [
    StructField("kind", StringType()),
    StructField("text", StringType()),
    StructField("media_ref", StringType()),
    StructField("offset", IntegerType()),
]
SPAN_STRUCT = StructType(SPAN_FIELDS)
SPANS_ARRAY = ArrayType(SPAN_STRUCT)

# ElementSnapshot (reference Sources/Actor.swift:31-62)
SNAPSHOT_STRUCT = StructType(
    [
        StructField("attributes", MapType(StringType(), StringType())),
        StructField("line_number", IntegerType()),
        StructField("namespace", StringType()),
        StructField("raw_xml", StringType()),
        StructField("string_value", StringType()),
        StructField("tag", StringType()),
    ]
)
SNAPSHOT_ARRAY = ArrayType(SNAPSHOT_STRUCT)

# XPathResult (reference Sources/Actor.swift:91-110)
XPATH_RESULT_STRUCT = StructType(
    [
        StructField("bool_value", BooleanType()),
        StructField("double_value", DoubleType()),
        StructField("string_value", StringType()),
    ]
)

# output of the extraction stage: one row per extracted span
EXTRACTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("seq", IntegerType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
        StructField("parse_error", IntegerType()),
    ]
)


def _parse_doc(markup: str, doc_type: Optional[str]):
    """Batch-local parse helper (never raises)."""
    from .extract import sniff_doc_type
    from .htmlparser import parse_html
    from .xmlparser import parse_xml

    if doc_type not in ("html", "xml"):
        doc_type = sniff_doc_type(markup)
    try:
        return parse_html(markup) if doc_type == "html" else parse_xml(markup)
    except Exception:
        return None


# ---------------------------------------------------------------- extraction


def markup_from_spans_col(spans_col: str = "spans"):
    """JVM-side span⇄markup codec: sort by offset, concat text — the hot
    codec runs inside whole-stage codegen, so only ONE string column
    crosses the Arrow boundary instead of an array-of-structs (which costs
    a Python dict per span per row)."""
    sorted_spans = F.array_sort(
        F.col(spans_col),
        lambda l, r: F.when(l["offset"] < r["offset"], -1)
        .when(l["offset"] > r["offset"], 1)
        .otherwise(0),
    )
    return F.array_join(
        F.transform(sorted_spans, lambda s: F.coalesce(s["text"], F.lit(""))), ""
    )


def make_extract_markup_fn(doc_type: Optional[str] = None):
    """mapInPandas function: (doc_id, markup[, doc_type]) batches →
    extracted span rows.

    One input row (a whole document) produces N output rows (its content
    spans, seq-ordered). parse_error rows keep the doc_id with seq=-1 so
    lineage can count failures without a second pass over the data."""
    from .extract import extract_spans

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "seq": [],
                "kind": [],
                "text": [],
                "media_ref": [],
                "offset": [],
                "parse_error": [],
            }
            has_type = "doc_type" in pdf.columns
            doc_ids = pdf["doc_id"].to_numpy()
            markups = pdf["markup"].to_numpy()
            types = pdf["doc_type"].to_numpy() if has_type else None
            for i in range(len(pdf)):
                doc_id = doc_ids[i]
                markup = markups[i]
                dt = types[i] if types is not None else doc_type
                if markup is None or not markup:
                    extracted, err = [], 1
                else:
                    extracted, err = extract_spans(markup, dt)
                if err or not extracted:
                    out["doc_id"].append(doc_id)
                    out["seq"].append(-1)
                    out["kind"].append("error" if err else "empty")
                    out["text"].append(None)
                    out["media_ref"].append(None)
                    out["offset"].append(-1)
                    out["parse_error"].append(int(err))
                    continue
                for seq, s in enumerate(extracted):
                    out["doc_id"].append(doc_id)
                    out["seq"].append(seq)
                    out["kind"].append(s["kind"])
                    out["text"].append(s["text"])
                    out["media_ref"].append(s["media_ref"])
                    out["offset"].append(s["offset"])
                    out["parse_error"].append(0)
            yield pd.DataFrame(out)

    return fn


def extract_spans_df(docs: DataFrame, doc_type: Optional[str] = None) -> DataFrame:
    """docs(doc_id, spans[, doc_type]) → extracted spans, one row per span.
    The span→markup reassembly happens JVM-side (markup_from_spans_col)."""
    cols = [F.col("doc_id"), markup_from_spans_col("spans").alias("markup")]
    if "doc_type" in docs.columns:
        cols.append(F.col("doc_type"))
    return extract_markup_df(docs.select(*cols), doc_type)


def extract_markup_df(docs: DataFrame, doc_type: Optional[str] = None) -> DataFrame:
    """docs(doc_id, markup[, doc_type]) → extracted spans, for callers that
    already ran the span→markup codec (run_extraction_pipeline applies it
    BEFORE the salting shuffle so the exchange carries one string column,
    not the array-of-structs spans payload)."""
    cols = [F.col("doc_id"), F.col("markup")]
    if "doc_type" in docs.columns:
        cols.append(F.col("doc_type"))
    return docs.select(*cols).mapInPandas(
        make_extract_markup_fn(doc_type), schema=EXTRACTED_SCHEMA
    )


# ---------------------------------------------------------------- query UDFs


def _snapshot_series(markup_series: pd.Series, expr: str, doc_type, ns, is_css: bool):
    from .css import css_to_xpath
    from .query import element_snapshot, xpath as run_xpath

    xp = css_to_xpath(expr) if is_css else expr
    out = []
    for markup in markup_series:
        if markup is None:
            out.append([])
            continue
        doc = _parse_doc(markup, doc_type)
        if doc is None:
            out.append([])
            continue
        if ns:
            doc.namespaces.update(ns)
        out.append([element_snapshot(n) for n in run_xpath(doc, xp)])
    return pd.Series(out)


def xpath_select(expr: str, doc_type: Optional[str] = None, ns: Optional[dict] = None):
    """Column function: markup string → array<ElementSnapshot> of XPath hits."""

    @pandas_udf(SNAPSHOT_ARRAY)
    def _udf(markup: pd.Series) -> pd.Series:
        return _snapshot_series(markup, expr, doc_type, ns, is_css=False)

    return _udf


def css_select(selector: str, doc_type: Optional[str] = None, ns: Optional[dict] = None):
    """Column function: markup string → array<ElementSnapshot> of CSS hits.
    The selector is compiled to XPath at plan-build time (driver side)."""
    from .css import css_to_xpath

    compiled = css_to_xpath(selector)

    @pandas_udf(SNAPSHOT_ARRAY)
    def _udf(markup: pd.Series) -> pd.Series:
        return _snapshot_series(markup, compiled, doc_type, ns, is_css=False)

    return _udf


def xpath_string(expr: str, doc_type: Optional[str] = None, ns: Optional[dict] = None):
    """Column function: markup → string(XPath expr). The cheap common case:
    only a string crosses Arrow, not full snapshots."""
    from .query import eval_xpath

    @pandas_udf(StringType())
    def _udf(markup: pd.Series) -> pd.Series:
        out = []
        for m in markup:
            doc = _parse_doc(m, doc_type) if m is not None else None
            if doc is None:
                out.append(None)
                continue
            if ns:
                doc.namespaces.update(ns)
            r = eval_xpath(doc, expr)
            out.append(r.string_value if r is not None else None)
        return pd.Series(out, dtype=object)

    return _udf


def xpath_double(expr: str, doc_type: Optional[str] = None, ns: Optional[dict] = None):
    """Column function: markup → number(XPath expr) (count/sum/...)."""
    from .query import eval_xpath

    @pandas_udf(DoubleType())
    def _udf(markup: pd.Series) -> pd.Series:
        out = []
        for m in markup:
            doc = _parse_doc(m, doc_type) if m is not None else None
            if doc is None:
                out.append(None)
                continue
            if ns:
                doc.namespaces.update(ns)
            r = eval_xpath(doc, expr)
            out.append(r.double_value if r is not None else None)
        return pd.Series(out, dtype="float64")

    return _udf


def xpath_eval(expr: str, doc_type: Optional[str] = None, ns: Optional[dict] = None):
    """Column function: markup → XPathResult struct (bool, double, string)
    — the reference's eval(xpath:) surface (Queryable.swift:252-257)."""
    from .query import eval_xpath

    @pandas_udf(XPATH_RESULT_STRUCT)
    def _udf(markup: pd.Series) -> pd.DataFrame:
        rows = {"bool_value": [], "double_value": [], "string_value": []}
        for m in markup:
            doc = _parse_doc(m, doc_type) if m is not None else None
            r = eval_xpath(doc, expr) if doc is not None else None
            rows["bool_value"].append(r.bool_value if r else None)
            rows["double_value"].append(r.double_value if r else None)
            rows["string_value"].append(r.string_value if r else None)
        return pd.DataFrame(rows)

    return _udf


def doc_meta(doc_type: Optional[str] = None):
    """Column function: markup → struct(version, encoding, root_tag,
    title, parse_error) — DocumentSnapshot surface (Actor.swift:67-86)."""
    schema = StructType(
        [
            StructField("version", StringType()),
            StructField("encoding", StringType()),
            StructField("root_tag", StringType()),
            StructField("title", StringType()),
            StructField("parse_error", IntegerType()),
        ]
    )

    @pandas_udf(schema)
    def _udf(markup: pd.Series) -> pd.DataFrame:
        rows = {"version": [], "encoding": [], "root_tag": [], "title": [], "parse_error": []}
        for m in markup:
            doc = _parse_doc(m, doc_type) if m is not None else None
            if doc is None or doc.root is None:
                rows["version"].append(None)
                rows["encoding"].append(None)
                rows["root_tag"].append(None)
                rows["title"].append(None)
                rows["parse_error"].append(1)
            else:
                rows["version"].append(doc.version)
                rows["encoding"].append(doc.encoding)
                rows["root_tag"].append(doc.root.tag)
                rows["title"].append(doc.title if doc.is_html else None)
                rows["parse_error"].append(0)
        return pd.DataFrame(rows)

    return _udf
