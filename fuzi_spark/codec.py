"""Span ⇄ markup codec (M0 in SURVEY.md §7).

The pipeline's input table stores each document as interleaved spans
(BASELINE.json:input_hint):

    doc_id string,
    spans  array<struct<kind string, text string, media_ref string, offset int>>

Encoding rule (FIXTURES.md §A): markup is split at media-bearing elements
(img, script[src], link[href], video/audio/source/embed/iframe); each split
piece becomes a `text` span, each media element a `media` span. To keep the
codec LOSSLESS the media span's `text` carries the original element markup
(its media_ref carries the extracted URL), so reassembly is simply the
concatenation of `text` in offset order. Single-span documents (whole markup
at offset 0) are valid and are the common fast path.
"""

from __future__ import annotations

import re

# media-bearing elements that become split points, with the attribute that
# carries the reference
# (?<![\w-]) instead of \b: hyphen is a word boundary, so plain \b would
# let lazy-load attributes (data-src=, data-href=) match as the real ref
_MEDIA_SPLIT_RE = re.compile(
    r"<(?:img|embed|source|track)\b[^>]*>"
    r"|<(?:script|iframe|video|audio|object)\b[^>]*(?<![\w\-])src\s*=[^>]*>(?:</(?:script|iframe|video|audio|object)>)?"
    r"|<link\b[^>]*(?<![\w\-])href\s*=[^>]*>",
    re.I | re.S,
)
_REF_RE = re.compile(
    r"""(?<![\w\-])(?:src|href|data)\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""", re.I
)


def media_ref_of(element_markup: str) -> str:
    """Extract the URL/asset reference from a media element's markup."""
    m = _REF_RE.search(element_markup)
    if not m:
        return ""
    v = m.group(1)
    if v[:1] in "\"'" and v[:1] == v[-1:]:
        v = v[1:-1]
    elif v.endswith("/"):
        # unquoted value in a self-closing tag: the '/' belongs to '/>'
        v = v[:-1]
    return v


def encode_spans(markup: str) -> list[dict]:
    """Split a document's markup into interleaved text+media spans."""
    spans: list[dict] = []
    pos = 0
    off = 0
    for m in _MEDIA_SPLIT_RE.finditer(markup):
        if m.start() > pos:
            spans.append(
                {"kind": "text", "text": markup[pos : m.start()], "media_ref": None, "offset": off}
            )
            off += 1
        spans.append(
            {
                "kind": "media",
                "text": m.group(0),
                "media_ref": media_ref_of(m.group(0)),
                "offset": off,
            }
        )
        off += 1
        pos = m.end()
    if pos < len(markup) or not spans:
        spans.append({"kind": "text", "text": markup[pos:], "media_ref": None, "offset": off})
    return spans


def reassemble(spans) -> str:
    """spans (any iterable of dicts/Rows with text+offset) → original markup.

    Lossless inverse of encode_spans; tolerant of unordered input (sorts by
    offset), since Spark shuffles do not guarantee array builder order when
    spans were collected via collect_list."""
    items = sorted(
        (s if isinstance(s, dict) else s.asDict() for s in spans),
        key=lambda s: s["offset"] if s["offset"] is not None else 0,
    )
    return "".join(s["text"] or "" for s in items)
