"""HTML parser: tag-soup recovery, structure implication, CSS combinators.

Assertions transcribed from the reference's
Tests/ActorHardeningTests.swift:871-1062."""

import fuzi_spark as fz


def test_malformed_html_recovery():
    h = fz.parse_html("<html><body><div><p>Paragraph<div>Nested")
    assert h.body is not None


def test_html_entities():
    h = fz.parse_html("<html><body>&nbsp;&copy;&reg;&trade;</body></html>")
    assert h.body is not None
    assert h.body.string_value == "\xa0©®™"


def test_script_style_content():
    h = fz.parse_html(
        "<html>\n<head>\n<style>body { color: red; }</style>\n"
        "<script>var x = 1 < 2;</script>\n</head>\n<body>Content</body>\n</html>"
    )
    assert h.body.string_value == "Content"


def test_case_insensitive_tags():
    h = fz.parse_html("<HTML><BODY><DIV>Content</DIV></BODY></HTML>")
    assert h.body is not None
    assert h.body.string_value == "Content"


def test_boolean_attributes():
    h = fz.parse_html('<html><body><input type="checkbox" checked disabled></body></html>')
    inp = fz.first_child_css(h, "input")
    assert inp is not None
    assert inp.attributes.get("checked") is not None


def test_void_elements():
    h = fz.parse_html(
        '<html><body><br><hr><img src="test.jpg"><input type="text">'
        '<meta name="test"></body></html>'
    )
    assert fz.first_child_css(h, "br") is not None
    img = fz.first_child_css(h, "img")
    assert img is not None
    assert img.attributes["src"] == "test.jpg"


def test_implied_structure_fragment():
    h = fz.parse_html("<div>test</div>")
    assert h.root.tag == "html"
    assert h.body is not None
    assert h.body.string_value == "test"


def test_unclosed_tags_nest():
    h = fz.parse_html("<html><body><p>One<p>Two<p>Three</body></html>")
    assert len(fz.css(h, "p")) == 3  # p auto-closes p


def test_li_autoclose():
    h = fz.parse_html("<html><body><ul><li>a<li>b<li>c</ul></body></html>")
    assert len(fz.css(h, "ul > li")) == 3


def test_multiple_classes_via_xpath():
    h = fz.parse_html(
        '<html><body><div class="a b c">Multiple classes</div>'
        '<div class="a">A</div><div class="b">B</div></body></html>'
    )
    r = fz.xpath(
        h,
        "//*[contains(concat(' ', @class, ' '), ' a ') and "
        "contains(concat(' ', @class, ' '), ' b ')]",
    )
    assert len(r) == 1
    assert r[0].string_value == "Multiple classes"


def test_descendant_vs_child_combinator():
    h = fz.parse_html(
        "<html><body><div><p>Direct child</p></div>"
        "<div><span><p>Descendant</p></span></div></body></html>"
    )
    assert len(fz.css(h, "div p")) == 2
    ch = fz.css(h, "div > p")
    assert len(ch) == 1
    assert ch[0].string_value == "Direct child"


def test_attribute_selectors():
    h = fz.parse_html(
        '<html><body><a href="http://example.com">Link 1</a>'
        '<a href="https://secure.com">Link 2</a><a>No href</a></body></html>'
    )
    assert len(fz.css(h, "a[href]")) == 2
    assert len(fz.xpath(h, "//a[@href='http://example.com']")) == 1


def test_complex_combined_selectors():
    h = fz.parse_html(
        '<html><body><div id="main" class="container"><ul class="list">'
        '<li class="item active">First</li><li class="item">Second</li>'
        "</ul></div></body></html>"
    )
    assert len(fz.css(h, "#main .list .item")) == 2


def test_sibling_combinators():
    h = fz.parse_html(
        "<html><body><h1>Title</h1><p>First para</p><p>Second para</p>"
        "<div>Not a p</div><p>Third para</p></body></html>"
    )
    adj = fz.css(h, "h1 + p")
    assert len(adj) == 1
    assert adj[0].string_value == "First para"
    assert len(fz.css(h, "h1 ~ p")) == 3


def test_head_body_routing():
    h = fz.parse_html("<title>T</title><p>body text</p>")
    assert h.head is not None and h.title == "T"
    assert h.body is not None and "body text" in h.body.string_value


def test_raw_xml_html_void():
    h = fz.parse_html('<html><body><img src="x.png"></body></html>')
    img = fz.first_child_css(h, "img")
    assert img.raw_xml == '<img src="x.png">'
