"""PDF layout-parse tests (north_rule "PDF/layout parse").

Pure-engine tests on hand-built PDFs (the builder itself is exercised as
the deterministic corpus generator) plus recovery behavior on garbage.
"""

import zlib

import pytest

from fuzi_spark.pdf import build_simple_pdf, extract_pdf_spans


def kinds(spans):
    return [s["kind"] for s in spans]


def texts(spans):
    return [s["text"] for s in spans]


class TestBasicExtraction:
    def test_title_and_paragraphs(self):
        pdf = build_simple_pdf("My Title", ["first paragraph", "second paragraph"])
        spans, err = extract_pdf_spans(pdf)
        assert err == 0
        assert kinds(spans) == ["heading", "paragraph", "paragraph"]
        assert texts(spans) == ["My Title", "first paragraph", "second paragraph"]
        assert [s["offset"] for s in spans] == [0, 1, 2]

    def test_single_paragraph(self):
        pdf = build_simple_pdf("T", ["body text here"])
        spans, err = extract_pdf_spans(pdf)
        assert err == 0
        assert kinds(spans) == ["heading", "paragraph"]

    def test_compressed_stream_matches_uncompressed(self):
        plain = extract_pdf_spans(build_simple_pdf("T", ["a b", "c d"]))
        comp = extract_pdf_spans(build_simple_pdf("T", ["a b", "c d"], compress=True))
        assert plain == comp

    def test_escaped_parens_and_backslash(self):
        pdf = build_simple_pdf("A (nested) title", ["back\\slash (x) y"])
        spans, _ = extract_pdf_spans(pdf)
        assert texts(spans) == ["A (nested) title", "back\\slash (x) y"]

    def test_image_media_span(self):
        pdf = build_simple_pdf("T", ["p"], image=True)
        spans, err = extract_pdf_spans(pdf)
        assert err == 0
        assert kinds(spans) == ["heading", "paragraph", "media"]
        assert spans[-1]["media_ref"] == "pdf:obj6"


class TestContentOperators:
    def _wrap(self, content: bytes) -> bytes:
        return (
            b"1 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        )

    def test_tj_array_and_tstar(self):
        cs = b"BT /F1 12 Tf 72 700 Td [(Hel) -20 (lo)] TJ T* (world) Tj ET"
        spans, err = extract_pdf_spans(self._wrap(cs))
        assert err == 0
        # T* moves one leading (14.4 < 1.8*12=21.6): same block, one span
        assert texts(spans) == ["Hel lo world"]

    def test_quote_operator_newline(self):
        cs = b"BT /F1 12 Tf 72 700 Td (a) Tj (b) ' ET"
        spans, _ = extract_pdf_spans(self._wrap(cs))
        assert texts(spans) == ["a b"]

    def test_hex_string(self):
        cs = b"BT /F1 12 Tf 72 700 Td <48656C6C6F> Tj ET"
        spans, _ = extract_pdf_spans(self._wrap(cs))
        assert texts(spans) == ["Hello"]

    def test_octal_escape(self):
        cs = rb"BT /F1 12 Tf 72 700 Td (A\101B) Tj ET"
        spans, _ = extract_pdf_spans(self._wrap(cs))
        assert texts(spans) == ["AAB"]

    def test_utf16be_string(self):
        s = "héllo".encode("utf-16-be")
        cs = b"BT /F1 12 Tf 72 700 Td (\xfe\xff" + s.replace(b"\\", rb"\\").replace(
            b"(", rb"\(").replace(b")", rb"\)") + b") Tj ET"
        spans, _ = extract_pdf_spans(self._wrap(cs))
        assert texts(spans) == ["héllo"]

    def test_tm_scale_makes_heading(self):
        cs = (b"BT /F1 12 Tf 2 0 0 2 72 700 Tm (Big) Tj ET "
              b"BT /F1 12 Tf 72 600 Td (small one) Tj "
              b"T* (more body) Tj T* (even more) Tj ET")
        spans, _ = extract_pdf_spans(self._wrap(cs))
        assert kinds(spans)[0] == "heading"
        assert texts(spans)[0] == "Big"

    def test_block_break_on_large_gap(self):
        cs = (b"BT /F1 12 Tf 72 700 Td (first block) Tj ET"
              b" BT /F1 12 Tf 72 500 Td (second block) Tj ET")
        spans, _ = extract_pdf_spans(self._wrap(cs))
        assert texts(spans) == ["first block", "second block"]


class TestNonLatinRoundtrip:
    @pytest.mark.parametrize(
        "title,paras",
        [
            ("Überschrift — straße", ["中文段落内容测试", "русский (скобки) и \\ слэш"]),
            ("עברית", ["نص عربي هنا"]),
            ("plain", ["paren (x) and \\ back", "ünïcödé ok"]),
        ],
    )
    def test_builder_survives_non_latin1(self, title, paras):
        """build_simple_pdf must never raise on text above U+00FF (it runs
        inside the bench pandas UDF — ADVICE r1); the UTF-16BE literal
        strings it emits round-trip bit-exact through the extractor."""
        for compress in (False, True):
            pdf = build_simple_pdf(title, paras, compress=compress)
            spans, err = extract_pdf_spans(pdf)
            got = texts(spans)
            assert err == 0
            assert got[0] == title
            for p in paras:
                assert p in got


class TestRecovery:
    def test_empty_input(self):
        assert extract_pdf_spans(b"") == ([], 1)

    def test_garbage_input(self):
        assert extract_pdf_spans(b"\x00\xffnot a pdf at all")[1] == 1

    def test_truncated_pdf_recovers_found_objects(self):
        pdf = build_simple_pdf("T", ["visible text"])
        # cut off the xref/trailer entirely — regex object scan survives
        cut = pdf[: pdf.rindex(b"xref")]
        spans, err = extract_pdf_spans(cut)
        assert err == 0
        assert "visible text" in texts(spans)

    def test_corrupt_flate_stream_skipped(self):
        pdf = build_simple_pdf("Good", ["kept"])
        bad = (b"9 0 obj\n<< /Filter /FlateDecode /Length 8 >>\n"
               b"stream\n\xde\xad\xbe\xef\xde\xad\xbe\xef\nendstream\nendobj\n")
        spans, err = extract_pdf_spans(pdf + bad)
        assert err == 0
        assert "kept" in " ".join(texts(spans))

    def test_missing_length_key(self):
        cs = b"BT /F1 12 Tf 72 700 Td (no length) Tj ET"
        raw = (b"1 0 obj\n<< >>\nstream\n" + cs + b"\nendstream\nendobj\n")
        spans, err = extract_pdf_spans(raw)
        assert err == 0
        assert texts(spans) == ["no length"]


class TestSparkSurface:
    @pytest.fixture(scope="class")
    def spark(self):
        from pyspark.sql import SparkSession

        s = (
            SparkSession.builder.master("local[4]")
            .appName("fuzi-tests")
            .config("spark.sql.shuffle.partitions", "8")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("ERROR")
        yield s

    def test_pdf_extract_df(self, spark):
        from fuzi_spark.pdf import pdf_extract_df

        rows = [
            ("d1", build_simple_pdf("Title One", ["alpha beta", "gamma"])),
            ("d2", build_simple_pdf("Title Two", ["delta"], compress=True)),
            ("bad", b"\x01\x02 garbage"),
        ]
        df = spark.createDataFrame(rows, "doc_id string, content binary")
        out = pdf_extract_df(df).orderBy("doc_id", "seq").collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert [r["kind"] for r in by_doc["d1"]] == [
            "heading", "paragraph", "paragraph"
        ]
        assert by_doc["d1"][0]["text"] == "Title One"
        assert [r["kind"] for r in by_doc["d2"]] == ["heading", "paragraph"]
        assert by_doc["bad"][0]["parse_error"] == 1
        assert by_doc["bad"][0]["seq"] == -1


class TestNeverRaisesFuzz:
    """The recovering parser's contract: ANY bytes → (spans, err), never
    an exception. Truncations, bit-flips, pure garbage, and keyword soup
    (validated clean on 3000 inputs before pinning)."""

    @pytest.mark.parametrize("seed", range(3))
    def test_hostile_bytes(self, seed):
        import random

        rng = random.Random(40_000 + seed)
        for _ in range(250):
            mode = rng.randrange(5)
            if mode == 0:
                data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
            elif mode == 1:
                pdf = build_simple_pdf("Tt", ["body text"], compress=bool(rng.randrange(2)))
                data = pdf[: rng.randrange(0, len(pdf))]
            elif mode == 2:
                pdf = bytearray(build_simple_pdf("T", ["x y z"], compress=True))
                for _ in range(rng.randrange(1, 20)):
                    pdf[rng.randrange(len(pdf))] = rng.randrange(256)
                data = bytes(pdf)
            elif mode == 3:
                data = b"%PDF-1.4\n" + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(0, 300))
                )
            else:
                frags = [b"stream\n", b"endstream", b"obj", b"endobj",
                         b"<< /Length 5 >>", b"BT", b"ET", b"(text", b")Tj",
                         b"[1 2]", b"%PDF", bytes([rng.randrange(256)]) * 7]
                data = b"".join(rng.choice(frags) for _ in range(rng.randrange(1, 25)))
            spans, err = extract_pdf_spans(data)
            assert isinstance(spans, list) and err in (0, 1)


class TestToUnicodeCMap:
    """Round-3: subset-font glyph codes must decode through /ToUnicode
    CMaps (the most common real-PDF failure mode for text extraction)."""

    def test_subset_font_roundtrip(self):
        from fuzi_spark.pdf import build_subset_font_pdf, extract_pdf_spans

        title = "Café Über — Heading"
        paras = ["naïve résumé body text here", "中文内容 second paragraph"]
        spans, err = extract_pdf_spans(build_subset_font_pdf(title, paras))
        assert err == 0
        assert spans[0]["kind"] == "heading" and spans[0]["text"] == title
        got = [s["text"] for s in spans]
        for p in paras:
            assert p in got

    def test_subset_font_compressed(self):
        from fuzi_spark.pdf import build_subset_font_pdf, extract_pdf_spans

        a, _ = extract_pdf_spans(build_subset_font_pdf("T", ["ab ab"]))
        b, _ = extract_pdf_spans(
            build_subset_font_pdf("T", ["ab ab"], compress=True)
        )
        assert [s["text"] for s in a] == ["T", "ab ab"]
        assert a == b

    def test_bfrange_both_forms_and_bfchar(self):
        from fuzi_spark.pdf import _parse_cmap

        cm = _parse_cmap(
            b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfrange\n"
            b"<0001> <0003> [<0041> <0058> <005A>]\n"
            b"<0010> <0012> <0061>\n"
            b"endbfrange\n"
            b"1 beginbfchar <0020> <20> endbfchar\n"
        )
        assert cm.nbytes == 2
        assert cm.decode(bytes.fromhex("000100020003")) == "AXZ"
        assert cm.decode(bytes.fromhex("001000110012")) == "abc"
        assert cm.decode(bytes.fromhex("0020")) == " "

    def test_astral_and_multichar_dst(self):
        from fuzi_spark.pdf import _parse_cmap

        cm = _parse_cmap(
            b"2 beginbfchar <01> <D83DDE00> <02> <006600660069> endbfchar"
        )
        assert cm.decode(b"\x01") == "\U0001F600"  # surrogate pair joined
        assert cm.decode(b"\x02") == "ffi"  # ligature expands to 3 chars

    def test_unmapped_codes_degrade_not_drop(self):
        from fuzi_spark.pdf import _parse_cmap

        cm = _parse_cmap(b"1 beginbfchar <41> <0058> endbfchar")
        # 0x41 mapped to X; 0x42 missing → latin-1 fallback, text kept
        assert cm.decode(b"\x41\x42") == "XB"

    def test_font_without_tounicode_untouched(self):
        from fuzi_spark.pdf import build_simple_pdf, extract_pdf_spans

        spans, err = extract_pdf_spans(build_simple_pdf("Plain", ["body"]))
        assert err == 0 and spans[0]["text"] == "Plain"

    def test_cmap_hostile_inputs_never_raise(self):
        # fuzz pin incl. the chr() overflow on continuous bfrange dst
        import random

        from fuzi_spark.pdf import _parse_cmap

        # dst DBFFDFFF = UTF-16BE surrogate pair for U+10FFFF: code 0000
        # maps exactly there, any higher code would overflow chr()
        cm = _parse_cmap(b"1 beginbfrange <0000> <FFFF> <DBFFDFFF> endbfrange")
        out = cm.decode(bytes.fromhex("0000" "0001" "F000"))
        assert out[0] == "\U0010FFFF" and isinstance(out, str)
        # overflowed codes degrade to the latin-1 byte fallback
        assert "\x00\x01" in out

        rng = random.Random(99)
        frags = [b"beginbfchar", b"endbfchar", b"beginbfrange", b"endbfrange",
                 b"begincodespacerange", b"endcodespacerange", b"<", b">",
                 b"[", b"]", b"<00", b"<GGGG>", b"<>", b"<0041>", b"<D800>",
                 b"<10FFFF>", b"\xff\x00", b" ", b"\n", b"1 ", b"999999 "]
        for _ in range(3000):
            data = b"".join(
                rng.choice(frags) for _ in range(rng.randrange(1, 30))
            )
            c = _parse_cmap(data)
            if c is not None:
                c.decode(bytes(rng.randrange(256)
                               for _ in range(rng.randrange(0, 9))))
