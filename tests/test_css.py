"""CSS→XPath compiler golden pairs.

Transcribed from the reference's Tests/CSSTests.swift:26-88 — the compiler
output dialect must match character-for-character."""

import pytest

from fuzi_spark.css import css_to_xpath

GOLDEN = [
    ("*", ".//*"),
    ("div", ".//div"),
    (
        ".highlighted",
        ".//*[contains(concat(' ',normalize-space(@class),' '),' highlighted ')]",
    ),
    (
        "span.highlighted",
        ".//span[contains(concat(' ',normalize-space(@class),' '),' highlighted ')]",
    ),
    ("h1#logo", ".//h1[@id = 'logo']"),
    ("#logo", ".//*[@id = 'logo']"),
    ("html *", ".//html//*"),
    ("body p", ".//body/descendant::p"),
    ("ul > li", ".//ul/li"),
    ("h1 + p", ".//h1/following-sibling::*[1]/self::p"),
    ("p ~ p", ".//p/following-sibling::p"),
    ("img[alt]", ".//img[@alt]"),
    ("a[rel='next']", ".//a[@rel='next']"),
    ("a[rel='next'][href='/foo/bar']", ".//a[@rel='next'][@href='/foo/bar']"),
    ("ul, ol", ".//ul | .//ol"),
    (
        "div#test .note",
        ".//div[@id = 'test']/descendant::*"
        "[contains(concat(' ',normalize-space(@class),' '),' note ')]",
    ),
]


@pytest.mark.parametrize("css,expected", GOLDEN, ids=[c for c, _ in GOLDEN])
def test_css_golden(css, expected):
    assert css_to_xpath(css) == expected
