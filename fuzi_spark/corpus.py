"""Deterministic test corpus: interleaved-document rows seeded from the
reference's own test corpus (FIXTURES.md §B). Seed 42, no external data.

Two sources:
- the 5 resource fixtures, read from the reference checkout when present
  (never copied into this repo),
- the inline hardening corpus, transcribed from the reference's test code
  (Tests/ActorHardeningTests.swift, Tests/ActorTests.swift — citations on
  each row below).

Each document is encoded into interleaved (kind, text, media_ref, offset)
spans via codec.encode_spans; multi-span variants + a deterministic skew
tail exercise the salting path.
"""

from __future__ import annotations

import os
import random

from .codec import encode_spans

REFERENCE_RESOURCES = "/root/reference/Tests/Resources"

# (doc_id, doc_type, markup) — citations per FIXTURES.md §B
HARDENING_DOCS: list[tuple[str, str, str]] = [
    ("hard-truncated", "xml", '<?xml version="1.0"?><root><child>content</chi'),
    ("hard-mismatched", "xml", "<root><a></b></root>"),
    ("hard-longtag", "xml", "<" + "a" * 10000 + "/>"),
    (
        "hard-deep-1000",
        "xml",
        "".join(f"<level{i}>" for i in range(1000))
        + "deep"
        + "".join(f"</level{i}>" for i in reversed(range(1000))),
    ),
    (
        "hard-wide-5000",
        "xml",
        "<root>" + "".join(f"<child{i}/>" for i in range(5000)) + "</root>",
    ),
    (
        "hard-empty-forms",
        "xml",
        "<root><self-closing/><explicit></explicit><ws>   </ws></root>",
    ),
    ("hard-entities-num", "xml", "<root>&#60;&#62;&#38;&#x3C;&#x3E;</root>"),
    ("hard-entities-named", "xml", "<root>&lt;&gt;&amp;&quot;&apos;</root>"),
    ("hard-cdata", "xml", "<root><![CDATA[<not>xml</not>]]></root>"),
    ("hard-mixed", "xml", "<root>Hello <b>World</b>!</root>"),
    (
        "hard-unicode",
        "xml",
        "<root><latin>héllo wörld</latin><greek>γειά σου κόσμος</greek>"
        "<cyrillic>привет мир</cyrillic><cjk>中文字符</cjk>"
        "<arabic>مرحبا العالم</arabic><hebrew>שלום עולם</hebrew>"
        "<emoji>🎉🚀💻</emoji><math>∑∫∂√∞</math></root>",
    ),
    ("hard-utf8-bom", "xml", "﻿<?xml version=\"1.0\"?><root>bom</root>"),
    ("hard-ns-default", "xml", '<root xmlns="http://default.ns"><child/></root>'),
    (
        "hard-ns-redefined",
        "xml",
        '<root xmlns:ns="http://outer"><ns:a/>'
        '<child xmlns:ns="http://inner"><ns:b/></child></root>',
    ),
    (
        "hard-ns-complex",
        "xml",
        '<root xmlns="http://default" xmlns:a="http://a" xmlns:b="http://b">'
        '<a:x><b:y xmlns:c="http://c"><c:z/></b:y></a:x></root>',
    ),
    (
        "hard-ns-attrs",
        "xml",
        '<root xmlns:xlink="http://www.w3.org/1999/xlink">'
        '<a xlink:href="http://example.com" title="plain"/></root>',
    ),
    ("hard-html-malformed", "html", "<html><body><div><p>Paragraph<div>Nested"),
    (
        "hard-html-entities",
        "html",
        "<html><body>&nbsp;&copy;&reg;&trade;</body></html>",
    ),
    (
        "hard-html-scriptstyle",
        "html",
        "<html>\n<head>\n<style>body { color: red; }</style>\n"
        "<script>var x = 1 < 2;</script>\n</head>\n<body>Content</body>\n</html>",
    ),
    ("hard-html-case", "html", "<HTML><BODY><DIV>Content</DIV></BODY></HTML>"),
    (
        "hard-html-boolattr",
        "html",
        '<html><body><input type="checkbox" checked disabled></body></html>',
    ),
    (
        "hard-html-void",
        "html",
        '<html><body>\n<br>\n<hr>\n<img src="test.jpg">\n'
        '<input type="text">\n<meta name="test">\n</body></html>',
    ),
    (
        "hard-html-css-combinators",
        "html",
        "<html><body><div><p>Direct child</p></div>"
        "<div><span><p>Descendant</p></span></div></body></html>",
    ),
    (
        "hard-html-css-siblings",
        "html",
        "<html><body><h1>Title</h1><p>First para</p><p>Second para</p>"
        "<div>Not a p</div><p>Third para</p></body></html>",
    ),
    (
        "hard-html-css-attrs",
        "html",
        '<html><body><a href="http://example.com">Link 1</a>'
        '<a href="https://secure.com">Link 2</a><a>No href</a></body></html>',
    ),
    (
        "hard-html-css-complex",
        "html",
        '<html><body><div id="main" class="container"><ul class="list">'
        '<li class="item active">First</li><li class="item">Second</li>'
        "</ul></div></body></html>",
    ),
    (
        "hard-preds",
        "xml",
        "<root>"
        '<item id="1" category="a" priority="high">First</item>'
        '<item id="2" category="b" priority="low">Second</item>'
        '<item id="3" category="a" priority="high">Third</item>'
        "</root>",
    ),
    ("hard-axes", "xml", "<a><b><c><d>deep</d></c></b></a>"),
    (
        "hard-position",
        "xml",
        "<r><i>1</i><i>2</i><i>3</i><i>4</i><i>5</i></r>",
    ),
    ("hard-numeric", "xml", "<r><n>10</n><n>20</n><n>30</n></r>"),
    (
        "hard-large-items",
        "xml",
        "<root>"
        + "".join(f'<item id="{i}" category="cat{i % 10}"/>' for i in range(1000))
        + "</root>",
    ),
]

FIXTURE_FILES = [
    ("xml-spec", "xml", "xml.xml"),
    ("web-github", "html", "web.html"),
    ("atom-feed", "xml", "atom.xml"),
    ("ocf-container", "xml", "ocf.xml"),
    ("vmap", "xml", "vmap.xml"),
]


def _skew_tail(rng: random.Random) -> list[tuple[str, str, str]]:
    """Deterministic giant docs (powers of two) to exercise salting."""
    out = []
    for k in range(3, 7):  # widths 8k..64k elements
        width = (2**k) * 1000
        body = "".join(f"<c{i}>w{i}</c{i}>" for i in range(width))
        out.append((f"hard-wide-{width}", "xml", f"<root>{body}</root>"))
    paras = []
    for i in range(2000):
        words = " ".join(f"w{rng.randint(0, 99)}" for _ in range(20))
        paras.append(f"<p>{words}</p>")
        if i % 50 == 0:
            paras.append(f'<img src="media/{i}.jpg" alt="image {i}">')
    out.append(
        (
            "hard-media-heavy",
            "html",
            "<html><head><title>Media heavy</title></head><body>"
            + "".join(paras)
            + "</body></html>",
        )
    )
    return out


def corpus_rows(include_fixtures: bool = True, skew: bool = True) -> list[dict]:
    """The full deterministic corpus as rows of the interleaved input table:
    (doc_id, doc_type, spans)."""
    rng = random.Random(42)
    docs: list[tuple[str, str, str]] = list(HARDENING_DOCS)
    if include_fixtures and os.path.isdir(REFERENCE_RESOURCES):
        for doc_id, doc_type, fname in FIXTURE_FILES:
            path = os.path.join(REFERENCE_RESOURCES, fname)
            with open(path, "rb") as f:
                from .xmlparser import decode_bytes

                docs.append((doc_id, doc_type, decode_bytes(f.read())))
    if skew:
        docs.extend(_skew_tail(rng))
    rows = []
    for doc_id, doc_type, markup in docs:
        rows.append(
            {"doc_id": doc_id, "doc_type": doc_type, "spans": encode_spans(markup)}
        )
    return rows


def corpus_df(spark, include_fixtures: bool = True, skew: bool = True):
    """Corpus as a Spark DataFrame in the input_hint schema."""
    from pyspark.sql.types import StringType, StructField, StructType

    from .udfs import SPANS_ARRAY

    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("doc_type", StringType()),
            StructField("spans", SPANS_ARRAY),
        ]
    )
    return spark.createDataFrame(corpus_rows(include_fixtures, skew), schema=schema)
