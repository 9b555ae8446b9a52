"""Structure-preserving HTML → Markdown rendering.

LLM training corpora increasingly keep document STRUCTURE (headings,
lists, tables, code fences, links) instead of flattening to plain
text — markdown is the interchange form. This module renders the
engine's own DOM (htmlparser.py) to deterministic GitHub-flavored
markdown, reusing the north_star boilerplate strip (extract.py) so
chrome never reaches the rendered text.

Reference parity note: the reference (kylehughes/Fuzi) has no
renderer — /root/reference/Sources exposes stringValue/rawXML only
(Node.swift:126-141); this is pipeline-brief scope built ON the parity
surface (same DOM, same mutation strip).

Deterministic rendering rules (pinned by tests and the SQL oracle):
- h1..h6 -> "#"*n + " " + flattened inline text
- p / generic blocks -> paragraph per inline run; blocks joined "\n\n"
- ul/ol -> "- item" / "k. item" lines; nested blocks indented 2 spaces
- blockquote -> every line of the inner rendering prefixed "> "
- pre -> fenced ``` block with the RAW (un-normalized) text subtree
- table -> pipe table; first row is the header row; "|" in cells escaped
- a -> "[text](href)" (no href: bare text; empty text: dropped)
- img/media -> "![alt](ref)" inline (no ref: dropped)
- strong/b -> **text**, em/i -> *text*, inline code -> `text`
  (inner text stripped so markers hug — "a<b> b </b>c" -> "a**b**c")
- br -> newline within the paragraph; hr -> "---"
- script/style/noscript/template subtrees never render
- document title (when present) renders as a leading "# " heading,
  mirroring extract_spans' leading-heading convention (extract.py)

All walks are ITERATIVE (explicit stacks): a depth-1500 div chain must
render, not blow the recursion limit — the 10^12-doc skew tail makes
deep documents a certainty (same rationale as extract.py:_walk_html).

Pure Python called only inside Arrow-batch UDFs; the Spark surface is
one pandas_udf pass (never per-row Python at the plan level).
"""

from __future__ import annotations

import re
from typing import Optional

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..dom import ELEMENT_NODE, TEXT_NODE, Document, Element
from ..errors import XMLError
from ..extract import (
    BLOCK_TAGS,
    HEADING_TAGS,
    MEDIA_TAGS,
    _media_ref,
    sniff_doc_type,
    strip_boilerplate,
)
from ..htmlparser import parse_html

_EMPH = {"strong": "**", "b": "**", "em": "*", "i": "*"}
# hard-skipped by the RENDERER regardless of `strip`: their text is
# never content. nav/form/... are content-model decisions and belong
# to strip_boilerplate (strip=True), not the renderer.
_NEVER_RENDER = frozenset(("script", "style", "noscript", "template"))
_HEADING_LEVEL = {t: int(t[1]) for t in HEADING_TAGS}
_LIST_ITEM = frozenset(("li", "dt", "dd"))
_TABLE_SECTIONS = frozenset(("thead", "tbody", "tfoot"))
_CELL_TAGS = frozenset(("th", "td"))
_WS_RE = re.compile(r"\s+")
_SPACE_RE = re.compile(r"[ \t]+")


def _ws(text: str) -> str:
    """Collapse whitespace runs to single spaces, KEEPING boundary
    spaces — inter-piece spacing is resolved at line normalization."""
    return _WS_RE.sub(" ", text)


def _norm_lines(s: str) -> str:
    """Finalize an inline run: collapse spaces, strip each line (br
    produces the newlines), collapse blank-line runs, trim the ends."""
    lines = [ln.strip() for ln in _SPACE_RE.sub(" ", s).split("\n")]
    out: list[str] = []
    for ln in lines:
        if ln == "" and (not out or out[-1] == ""):
            continue
        out.append(ln)
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)


def _raw_text(el: Element) -> str:
    """Un-normalized text of a subtree (code fences), iteratively."""
    parts: list[str] = []
    stack = [el]
    while stack:
        node = stack.pop()
        for c in reversed(node.children):
            if c.type == TEXT_NODE:
                parts.append(c.content)
            elif c.type == ELEMENT_NODE:
                stack.append(c)
    # one leading/trailing newline is markup formatting, not content
    return "".join(parts).strip("\n").rstrip()


def _assemble(el: Element, results: dict) -> tuple[list[str], str]:
    """Walk direct children: completed blocks + the unflushed tail
    inline run (normalized). The container decides what to do with
    the tail (paragraph, list-item line, heading text...)."""
    blocks: list[str] = []
    buf: list[str] = []

    def flush():
        s = _norm_lines("".join(buf))
        buf.clear()
        if s:
            blocks.append(s)

    for c in el.children:
        if c.type == TEXT_NODE:
            buf.append(_ws(c.content))
        elif c.type == ELEMENT_NODE:
            mode, v = results[id(c)]
            if mode == "inline":
                buf.append(v)
            elif v:  # block child: flush the run, splice its blocks
                flush()
                blocks.extend(v)
    tail = _norm_lines("".join(buf))
    return blocks, tail


def _flatten(blocks: list[str], tail: str) -> str:
    """One-line view of a subtree (headings, anchors, table cells)."""
    parts = [" ".join(b.split()) for b in blocks if b]
    if tail:
        parts.append(" ".join(tail.split()))
    return " ".join(p for p in parts if p)


def _finalize_list(el: Element, results: dict) -> list[str]:
    lines: list[str] = []
    k = 0
    for c in el.children:
        if c.type != ELEMENT_NODE:
            continue
        if c.tag in _LIST_ITEM:
            k += 1
            marker = f"{k}. " if el.tag == "ol" else "- "
            blocks, tail = _assemble(c, results)
            if tail:
                blocks = blocks + [tail]
            if not blocks:
                lines.append(marker.rstrip())
                continue
            first, *rest = blocks
            fl, *fl_rest = first.split("\n")
            lines.append(marker + fl)
            lines.extend("  " + ln for ln in fl_rest)
            for b in rest:
                lines.extend("  " + ln for ln in b.split("\n"))
        else:  # non-item child (nested list w/o li, stray block)
            mode, v = results[id(c)]
            if mode == "block":
                for b in v:
                    lines.extend(b.split("\n"))
    return ["\n".join(lines)] if lines else []


def _finalize_table(el: Element, results: dict) -> list[str]:
    trs: list[Element] = []
    for c in el.children:
        if c.type != ELEMENT_NODE:
            continue
        if c.tag == "tr":
            trs.append(c)
        elif c.tag in _TABLE_SECTIONS:
            trs.extend(
                g for g in c.children
                if g.type == ELEMENT_NODE and g.tag == "tr"
            )
    rows: list[list[str]] = []
    for tr in trs:
        cells = []
        for c in tr.children:
            if c.type == ELEMENT_NODE and c.tag in _CELL_TAGS:
                blocks, tail = _assemble(c, results)
                cells.append(_flatten(blocks, tail).replace("|", "\\|"))
        rows.append(cells)
    rows = [r for r in rows if r]
    if not rows:
        return []
    header, *body = rows
    lines = [
        "| " + " | ".join(header) + " |",
        "| " + " | ".join("---" for _ in header) + " |",
    ]
    lines.extend("| " + " | ".join(r) + " |" for r in body)
    return ["\n".join(lines)]


def _render(root: Element) -> list[str]:
    """Post-order iterative render; one results entry per element."""
    results: dict[int, tuple] = {}
    todo: list[tuple[Element, bool]] = [(root, False)]
    while todo:
        node, done = todo.pop()
        if not done:
            todo.append((node, True))
            if node.tag not in _NEVER_RENDER and node.tag != "pre":
                todo.extend(
                    (c, False)
                    for c in node.children
                    if c.type == ELEMENT_NODE
                )
            continue
        tag = node.tag
        if tag in _NEVER_RENDER:
            results[id(node)] = ("inline", "")
        elif tag in _HEADING_LEVEL:
            text = _flatten(*_assemble(node, results))
            results[id(node)] = (
                "block",
                ["#" * _HEADING_LEVEL[tag] + " " + text] if text else [],
            )
        elif tag == "pre":
            raw = _raw_text(node)
            results[id(node)] = (
                "block", [f"```\n{raw}\n```"] if raw else []
            )
        elif tag == "hr":
            results[id(node)] = ("block", ["---"])
        elif tag == "br":
            results[id(node)] = ("inline", "\n")
        elif tag in MEDIA_TAGS:
            ref = _media_ref(node)
            alt = " ".join(_ws(node.attrs.get("alt", "")).split())
            results[id(node)] = (
                "inline", f"![{alt}]({ref})" if ref else ""
            )
        elif tag == "a":
            inner = _flatten(*_assemble(node, results))
            href = node.attrs.get("href")
            if href and inner:
                results[id(node)] = ("inline", f"[{inner}]({href})")
            else:
                results[id(node)] = ("inline", inner)
        elif tag in _EMPH:
            inner = _flatten(*_assemble(node, results))
            m = _EMPH[tag]
            results[id(node)] = ("inline", f"{m}{inner}{m}" if inner else "")
        elif tag == "code":
            inner = _flatten(*_assemble(node, results))
            results[id(node)] = ("inline", f"`{inner}`" if inner else "")
        elif tag in ("ul", "ol", "dl"):
            results[id(node)] = ("block", _finalize_list(node, results))
        elif tag == "table":
            results[id(node)] = ("block", _finalize_table(node, results))
        elif tag in _TABLE_SECTIONS or tag == "tr" or tag in _CELL_TAGS:
            # consumed structurally by _finalize_table; inert elsewhere
            results[id(node)] = ("inline", "")
        elif tag == "blockquote":
            blocks, tail = _assemble(node, results)
            if tail:
                blocks = blocks + [tail]
            if blocks:
                quoted = "\n".join(
                    ("> " + ln).rstrip()
                    for ln in "\n\n".join(blocks).split("\n")
                )
                results[id(node)] = ("block", [quoted])
            else:
                results[id(node)] = ("block", [])
        elif tag in _LIST_ITEM:
            # li outside ul/ol (tag soup): render as its own blocks
            blocks, tail = _assemble(node, results)
            if tail:
                blocks = blocks + [tail]
            results[id(node)] = ("block", blocks)
        elif tag in BLOCK_TAGS:
            blocks, tail = _assemble(node, results)
            if tail:
                blocks = blocks + [tail]
            results[id(node)] = ("block", blocks)
        else:  # unknown/inline container (span, u, sup, ...)
            if any(
                c.type == ELEMENT_NODE and results[id(c)][0] == "block"
                for c in node.children
            ):
                blocks, tail = _assemble(node, results)
                if tail:
                    blocks = blocks + [tail]
                results[id(node)] = ("block", blocks)
            else:
                # raw (un-normalized) concat: boundary spaces belong to
                # the surrounding run ("a<span> b </span>c" -> "a b c");
                # normalization happens once, at the block flush
                raw = "".join(
                    _ws(c.content) if c.type == TEXT_NODE
                    else results[id(c)][1]
                    for c in node.children
                    if c.type in (TEXT_NODE, ELEMENT_NODE)
                )
                results[id(node)] = ("inline", raw)
    mode, v = results[id(root)]
    return v if mode == "block" else ([_norm_lines(v)] if v.strip() else [])


def to_markdown(
    markup: str, doc_type: Optional[str] = None, strip: bool = True
) -> tuple[str, int]:
    """Render one document to markdown. Returns (markdown, parse_error).

    Never raises (house recovery contract — extract.py:extract_spans):
    a parse failure yields ("", 1). XML documents degrade to plain
    paragraphs (one per text block) — markdown structure is an HTML
    concept."""
    if doc_type not in ("html", "xml"):
        doc_type = sniff_doc_type(markup)
    if doc_type == "xml":
        from ..extract import extract_spans

        spans, err = extract_spans(markup, "xml")
        return "\n\n".join(s["text"] for s in spans if s["text"]), err
    try:
        doc = parse_html(markup, assign_order=False)
    except XMLError:
        return "", 1
    except Exception:
        return "", 1
    if doc.root is None:
        return "", 1
    try:
        if strip:
            strip_boilerplate(doc)
        body = doc.body or doc.root
        blocks = _render(body)
        title = doc.title
        if title and title.strip():
            blocks.insert(0, "# " + " ".join(title.split()))
    except RecursionError:
        return "", 1
    return "\n\n".join(blocks), 0


_MD_SCHEMA = "markdown: string, parse_error: int"


def markdown_udf(
    doc_type: Optional[str] = None, strip: bool = True
):
    """Column function: markup -> struct(markdown, parse_error).
    One Arrow-batched pass; the per-doc Python IS the renderer."""

    @pandas_udf(_MD_SCHEMA)
    def _udf(markup: pd.Series) -> pd.DataFrame:
        out = []
        for m in markup:
            if m is None:
                out.append(("", 1))
            else:
                out.append(to_markdown(m, doc_type=doc_type, strip=strip))
        return pd.DataFrame(out, columns=["markdown", "parse_error"])

    return _udf


def to_markdown_df(
    docs: DataFrame,
    markup_col: str = "markup",
    id_col: str = "doc_id",
    doc_type: Optional[str] = None,
    strip: bool = True,
) -> DataFrame:
    """(id, markdown, parse_error, n_chars) per document.

    Scale shape: narrow map — no shuffle, no driver traffic; the plan
    is Scan -> Project(ArrowEvalPython) -> Project, so it composes with
    any downstream agg without an extra exchange."""
    st = markdown_udf(doc_type=doc_type, strip=strip)(F.col(markup_col))
    return docs.select(
        F.col(id_col),
        st["markdown"].alias("markdown"),
        st["parse_error"].alias("parse_error"),
        F.length(st["markdown"]).cast("long").alias("n_chars"),
    )
