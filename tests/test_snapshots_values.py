"""Snapshot/value-surface tests, transcribed from the reference's
Tests/ActorTests.swift (snapshot semantics, equality, raw serialization)
and the value-conversion operators P10/P11 (Element.swift:155-162)."""

import datetime

import pytest

import fuzi_spark as fz
from fuzi_spark.query import XPathResult, document_snapshot, element_snapshot

from conftest import fixture_bytes


class TestElementSnapshot:
    def test_captures_raw_xml(self):
        d = fz.parse_xml('<?xml version="1.0"?><root><child>text</child></root>')
        child = fz.first_child_xpath(d, "//child")
        assert element_snapshot(child)["raw_xml"] == "<child>text</child>"

    def test_captures_namespace_prefix(self):
        d = fz.parse_xml(fixture_bytes("atom.xml"))
        d.define_prefix("dc", "http://purl.org/dc/elements/1.1/")
        lang = fz.first_child_xpath(d, "//dc:language")
        assert element_snapshot(lang)["namespace"] == "dc"

    def test_captures_line_number(self):
        d = fz.parse_xml(fixture_bytes("xml.xml"))
        header = fz.first_child_xpath(d, "/spec/header")
        assert element_snapshot(header)["line_number"] == 120

    def test_equality_and_hashability(self):
        d = fz.parse_xml("<root><child>same</child></root>")
        s1 = element_snapshot(fz.first_child_xpath(d, "//child"))
        s2 = element_snapshot(fz.first_child_xpath(d, "//child"))
        assert s1 == s2  # dict equality = value semantics
        d2 = fz.parse_xml("<root><a/><b/></root>")
        snaps = [element_snapshot(e) for e in fz.xpath(d2, "/root/*")]
        distinct = {tuple(sorted((k, str(v)) for k, v in s.items())) for s in snaps}
        assert len(distinct) == 2

    def test_large_snapshot_collection(self):
        xml = "<root>" + "".join(
            f'<item id="{i}">value{i}</item>' for i in range(1000)
        ) + "</root>"
        d = fz.parse_xml(xml)
        snaps = [element_snapshot(e) for e in fz.xpath(d, "//item")]
        assert len(snaps) == 1000
        assert len({s["attributes"]["id"] for s in snaps}) == 1000

    def test_preserves_all_attributes(self):
        d = fz.parse_xml(
            '<root attr1="value1" attr2="value2" attr3="value3" '
            'data-custom="custom-value" xmlns:ns="http://example.com"></root>'
        )
        a = d.root.attributes
        assert a["attr1"] == "value1"
        assert a["attr2"] == "value2"
        assert a["attr3"] == "value3"
        assert a["data-custom"] == "custom-value"
        assert "xmlns:ns" not in a  # ns decls are not attributes


class TestDocumentSnapshot:
    def test_fields(self):
        d = fz.parse_xml('<?xml version="1.0" encoding="UTF-8"?><root a="1">x</root>')
        s = document_snapshot(d)
        assert s["version"] == "1.0"
        assert s["encoding"] == "utf-8"
        assert s["root"]["tag"] == "root"
        assert s["root"]["string_value"] == "x"

    def test_snapshots_independent(self):
        d1 = fz.parse_xml("<root><child>original</child></root>")
        s1 = document_snapshot(d1)
        d2 = fz.parse_xml("<root><child>modified</child></root>")
        s2 = document_snapshot(d2)
        assert s1["root"]["string_value"] == "original"
        assert s2["root"]["string_value"] == "modified"


class TestXPathResult:
    def test_triple_coercion(self):
        d = fz.parse_xml("<r><n>5</n><n>7</n></r>")
        r = fz.eval_xpath(d, "sum(//n)")
        assert r == XPathResult(bool_value=True, double_value=12.0, string_value="12")

    def test_string_functions_triple(self):
        d = fz.parse_xml("<r/>")
        r = fz.eval_xpath(d, "concat('a', 'b')")
        assert r.string_value == "ab"
        assert r.bool_value is True
        r = fz.eval_xpath(d, "string-length('')")
        assert r.double_value == 0.0
        assert r.bool_value is False


class TestValueConversions:
    def test_number_value(self):
        d = fz.parse_xml("<r><n>42.5</n><s>abc</s><e/></r>")
        assert fz.first_child_xpath(d, "//n").number_value == 42.5
        assert fz.first_child_xpath(d, "//s").number_value is None
        assert fz.first_child_xpath(d, "//e").number_value is None

    def test_date_value_atom_golden(self):
        # pinned: Tests/AtomTests.swift:71-86 — Dec 13 2003 18:30:02 UTC
        d = fz.parse_xml(fixture_bytes("atom.xml"))
        el = d.root.first_child("updated")
        dt = el.date_value
        assert dt is not None
        dt = dt.astimezone(datetime.timezone.utc)
        assert (dt.year, dt.month, dt.day, dt.hour, dt.minute, dt.second) == (
            2003, 12, 13, 18, 30, 2,
        )

    def test_date_value_invalid(self):
        d = fz.parse_xml("<r><d>not a date</d></r>")
        assert fz.first_child_xpath(d, "//d").date_value is None


class TestMutation:
    def test_remove_strips_subtree(self):
        d = fz.parse_xml("<root><keep>a</keep><drop><x>b</x></drop></root>")
        fz.first_child_xpath(d, "//drop").remove()
        assert d.root.string_value == "a"
        assert fz.xpath(d, "//drop") == []

    def test_remove_safely_parentless(self):
        d = fz.parse_xml("<root><a/></root>")
        el = fz.first_child_xpath(d, "//a")
        el.remove()
        el.remove()  # second remove is a no-op (removeSafely semantics)

    def test_deep_copy_independent(self):
        d = fz.parse_xml('<root><src a="1"><inner>t</inner></src></root>')
        src = fz.first_child_xpath(d, "//src")
        cp = src.deep_copy()
        src.remove()
        assert cp.attr("a") == "1"
        assert cp.string_value == "t"
        assert cp.raw_xml == '<src a="1"><inner>t</inner></src>'


class TestErrorMessages:
    def test_pinned_error_messages(self):
        # Tests/XMLTests.swift:69-89 matches code AND message
        d = fz.parse_xml("<r><x/></r>")
        with pytest.raises(fz.XPathError) as ei:
            fz.try_xpath(d, "////")
        assert ei.value.code == 1207
        assert ei.value.message == "Invalid expression"
        with pytest.raises(fz.XPathError) as ei:
            fz.try_xpath(d, "//*[unknown()]")
        assert ei.value.code == 1209
        assert ei.value.message == "Unregistered function"


class TestEncodings:
    def test_utf16_le_bom(self):
        data = "<root>héllo</root>".encode("utf-16-le")
        d = fz.parse_xml(b"\xff\xfe" + data)
        assert d.root.string_value == "héllo"

    def test_utf16_be_bom(self):
        data = "<root>héllo</root>".encode("utf-16-be")
        d = fz.parse_xml(b"\xfe\xff" + data)
        assert d.root.string_value == "héllo"

    def test_declared_latin1(self):
        data = '<?xml version="1.0" encoding="ISO-8859-1"?><root>caf\xe9</root>'.encode(
            "latin-1"
        )
        d = fz.parse_xml(data)
        assert d.root.string_value == "café"

    def test_invalid_utf8_recovers(self):
        d = fz.parse_xml(b'<?xml version="1.0"?><root>ok</root>' + b"\xff\xfe")
        assert d.root is not None


class TestRemainingSurface:
    def test_index_subscript(self):
        # N8: element[idx] positional child access (Element.swift:171-173)
        d = fz.parse_xml("<root><a/><b/><c/></root>")
        assert d.root[0].tag == "a"
        assert d.root[2].tag == "c"
        assert d.root[3] is None

    def test_attr_subscript(self):
        # P4: element["name"] (Element.swift:182-184)
        d = fz.parse_xml('<root x="1"/>')
        assert d.root["x"] == "1"
        assert d.root["missing"] is None

    def test_node_type_names(self):
        # P8: node kind surface (Node.swift:27-73)
        d = fz.parse_xml("<root>text<!--c--><?pi d?><x/></root>")
        kinds = [c.type_name for c in d.root.children]
        assert kinds == ["Text", "Comment", "Pi", "Element"]

    def test_is_html_flag(self):
        # P14 (Node.swift:121-123)
        assert fz.parse_html("<div>x</div>").root.is_html is True
        assert fz.parse_xml("<r/>").root.is_html is False

    def test_unicode_element_name_xpath(self):
        d = fz.parse_xml("<r><日本語>txt</日本語></r>")
        r = fz.xpath(d, "//日本語")
        assert len(r) == 1 and r[0].string_value == "txt"
