"""Golden-fixture tests over the reference's own 5 resource documents.

Every assertion is a transcription of the reference's fixture tests:
Tests/XMLTests.swift, Tests/HTMLTests.swift, Tests/AtomTests.swift,
Tests/DefaultNamespaceXPathTests.swift, Tests/VMAPTests.swift."""

import pytest

import fuzi_spark as fz
from fuzi_spark.dom import ELEMENT_NODE, TEXT_NODE

from conftest import fixture_bytes


@pytest.fixture(scope="module")
def xml_spec():
    return fz.parse_xml(fixture_bytes("xml.xml"))


@pytest.fixture(scope="module")
def web():
    return fz.parse_html(fixture_bytes("web.html"))


@pytest.fixture(scope="module")
def atom():
    d = fz.parse_xml(fixture_bytes("atom.xml"))
    d.define_prefix("atom", "http://www.w3.org/2005/Atom")
    return d


class TestXMLSpec:
    def test_version_encoding(self, xml_spec):
        assert xml_spec.version == "1.0"
        assert xml_spec.encoding == "utf-8"

    def test_root(self, xml_spec):
        assert xml_spec.root.tag == "spec"
        assert xml_spec.root.attributes["w3c-doctype"] == "rec"
        assert xml_spec.root.attributes["lang"] == "en"

    def test_title(self, xml_spec):
        t = xml_spec.root.first_child("header").first_child("title")
        assert t is not None
        assert t.string_value == "Extensible Markup Language (XML)"

    def test_xpath_title(self, xml_spec):
        elts = fz.xpath(xml_spec, "/spec/header/title")
        assert len(elts) == 1
        assert elts[0].tag == "title"

    def test_line_number_120(self, xml_spec):
        assert xml_spec.root.first_child("header").line == 120

    def test_five_authors(self, xml_spec):
        authlist = xml_spec.root.first_child("header").first_child("authlist")
        assert len(authlist.children_with_tag("author")) == 5

    def test_invalid_xpath_1207(self, xml_spec):
        with pytest.raises(fz.XPathError) as ei:
            fz.try_xpath(xml_spec, "////")
        assert ei.value.code == 1207

    def test_unknown_function_1209(self, xml_spec):
        with pytest.raises(fz.XPathError) as ei:
            fz.try_xpath(xml_spec, "//*[unknown()]")
        assert ei.value.code == 1209


class TestWebHTML:
    def test_root(self, web):
        assert web.root.tag == "html"

    def test_root_children(self, web):
        kids = web.root.element_children
        assert len(kids) == 2
        assert kids[0].tag == "head"
        assert kids[1].tag == "body"

    def test_title_xpath(self, web):
        r = fz.xpath(web, "//head/title")
        assert len(r) == 1
        assert r[0].string_value == "mattt/Ono"

    def test_title_css(self, web):
        r = fz.css(web, "head title")
        assert len(r) == 1
        assert r[0].string_value == "mattt/Ono"

    def test_id_css(self, web):
        r = fz.css(web, "#account_settings")
        assert len(r) == 1
        assert r[0].attr("href") == "/settings/profile"

    def test_title_property(self, web):
        assert web.title == "mattt/Ono"

    def test_head_counts(self, web):
        head = web.head
        assert len(head.children_with_tag("link")) == 13
        assert len(head.children_with_tag("meta")) == 38
        scripts = head.children_with_tag("script")
        assert len(scripts) == 2
        assert scripts[0].attr("src") == (
            "https://github.global.ssl.fastly.net/assets/"
            "frameworks-3d18c504ea97dc018d44d64d8fce147a96a944b8.js"
        )
        assert scripts[1].attr("src") == (
            "https://github.global.ssl.fastly.net/assets/"
            "github-602f74794536bf3e30e883a2cf268ca8e05b651d.js"
        )
        assert head.attr("prefix") == (
            "og: http://ogp.me/ns# fb: http://ogp.me/ns/fb# "
            "object: http://ogp.me/ns/object# article: http://ogp.me/ns/article# "
            "profile: http://ogp.me/ns/profile#"
        )

    def test_body(self, web):
        body = web.body
        assert body.attr("class") == "logged_in  env-production macintosh vis-public"
        assert len(body.children_with_tag("div")) == 4

    def test_mixed_child_nodes(self, web):
        mixed = fz.first_child_css(web, "#ajax-error-message")
        cn = mixed.child_nodes((ELEMENT_NODE, TEXT_NODE))
        assert len(cn) == 5
        assert len([c for c in cn if c.type == ELEMENT_NODE]) == 2
        assert len([c for c in cn if c.type == TEXT_NODE]) == 3

    def test_sibling_walk_terminates(self, web):
        child = web.root.children[0]
        n = 0
        while child is not None and n < 10000:
            child = child.next_sibling
            n += 1
        assert child is None


class TestAtom:
    def test_basics(self, atom):
        assert atom.version == "1.0"
        assert atom.encoding == "utf-8"
        assert atom.root.tag == "feed"

    def test_title(self, atom):
        t = atom.root.first_child("title")
        assert t.string_value == "Example Feed"

    def test_xpath_title(self, atom):
        t = fz.first_child_xpath(atom, "/atom:feed/atom:title")
        assert t is not None
        assert t.tag == "title"
        assert t.string_value == "Example Feed"

    def test_links(self, atom):
        links = atom.root.children_with_tag("link")
        assert len(links) == 2
        assert links[0].string_value == ""
        assert links[0].attr("href") != links[1].attr("href")

    def test_updated_date(self, atom):
        import pandas as pd

        el = atom.root.first_child("updated")
        ts = pd.to_datetime(el.string_value, format="%Y-%m-%dT%H:%M:%S%z")
        assert (ts.year, ts.month, ts.day, ts.hour, ts.minute, ts.second) == (
            2003, 12, 13, 18, 30, 2,
        )

    def test_namespace_prefix(self, atom):
        entry = atom.root.first_child("entry")
        lang = entry.first_child("language", "dc")
        assert lang is not None
        assert lang.prefix == "dc"
        assert lang.string_value == "en-us"

    def test_xpath_with_namespaces(self, atom):
        r = fz.xpath(atom, "//dc:language")
        assert len(r) == 1
        assert r[0].prefix == "dc"

    def test_namespace_aliases(self, atom):
        atom.define_prefix("atom-alias", "http://www.w3.org/2005/Atom")
        atom.define_prefix("dc-alias", "http://purl.org/dc/elements/1.1/")
        r = fz.xpath(atom, "//atom-alias:entry/dc-alias:language")
        assert [e.raw_xml for e in r] == ["<dc:language>en-us</dc:language>"]
        assert r[0].prefix == "dc"
        r = fz.xpath(atom, "//atom:entry/dc:language")
        assert [e.raw_xml for e in r] == ["<dc:language>en-us</dc:language>"]


class TestDefaultNamespace:
    @pytest.fixture()
    def ocf(self):
        d = fz.parse_xml(fixture_bytes("ocf.xml"))
        d.define_prefix("ocf", "urn:oasis:names:tc:opendocument:xmlns:container")
        return d

    def test_absolute(self, ocf):
        r = fz.xpath(ocf, "/ocf:container/ocf:rootfiles/ocf:rootfile")
        assert len(r) == 1
        assert r[0].tag == "rootfile"

    def test_relative(self, ocf):
        outer = fz.xpath(ocf, "/ocf:container/ocf:rootfiles")
        assert len(outer) == 1
        rel = fz.xpath(outer[0], "./ocf:rootfile")
        assert len(rel) == 1
        assert rel[0].tag == "rootfile"

    def test_child_default_ns(self, ocf):
        ocf.define_prefix("dc", "http://purl.org/dc/elements/1.1/")
        r = fz.xpath(ocf, "/ocf:container/dc:metadata/dc:identifier")
        assert [e.raw_xml for e in r] == [
            '<identifier id="pub-id">urn:uuid:pubid</identifier>'
        ]
        assert r[0].prefix is None


class TestVMAP:
    @pytest.fixture()
    def vmap(self):
        return fz.parse_xml(fixture_bytes("vmap.xml"))

    def test_absolute_ns_xpath(self, vmap):
        r = fz.xpath(vmap, "/vmap:VMAP/vmap:Extensions/uo:unicornOnce")
        assert len(r) == 1
        assert r[0].tag == "unicornOnce"

    def test_relative_ns_xpath(self, vmap):
        ext = fz.xpath(vmap, "/vmap:VMAP/vmap:Extensions")
        rel = fz.xpath(ext[0], "./uo:unicornOnce")
        assert len(rel) == 1

    def test_unicorn_once_blank(self, vmap):
        el = fz.first_child_xpath(vmap, "/vmap:VMAP/vmap:Extensions/uo:unicornOnce")
        assert el is not None
        assert el.is_blank


class TestXPathFunctionResults:
    """Transcribed from Tests/XPathFunctionResultTests.swift:38-48."""

    @pytest.fixture()
    def atom_fn(self):
        d = fz.parse_xml(fixture_bytes("atom.xml"))
        d.define_prefix("atom", "http://www.w3.org/2005/Atom")
        return d

    def test_bool_value(self, atom_fn):
        assert fz.eval_xpath(atom_fn.root, "starts-with('Ono','O')").bool_value is True

    def test_double_value(self, atom_fn):
        assert fz.eval_xpath(atom_fn.root, "count(./atom:link)").double_value == 2.0

    def test_string_value(self, atom_fn):
        r = fz.eval_xpath(
            atom_fn.root, "string(./atom:entry[1]/dc:language[1]/text())"
        )
        assert r.string_value == "en-us"
