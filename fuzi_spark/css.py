"""CSS selector → XPath 1.0 compiler.

Re-creates the exact output dialect of the reference's compiler
(kylehughes/Fuzi Sources/Queryable.swift:306-362), pinned by the 17 golden
string pairs in Tests/CSSTests.swift:26-88. This deliberately does NOT use
any external cssselect-style library — the reference's dialect differs
(e.g. `.cls` → `[contains(concat(' ',normalize-space(@class),' '),' cls ')]`,
`a + b` → `following-sibling::*[1]/self::b`).

Pure string→string, driver-side; compiled results are embedded into UDF
closures so executors never re-compile.
"""

from __future__ import annotations

import re
from functools import lru_cache

_ID_RE = re.compile(r"#([\w\-_]+)")
_CLASS_RE = re.compile(r"\.([^.]+)")
_ATTR_RE = re.compile(r"\[([^\[\]]+)\]")
_SYMBOL_CHARS = set("#.[]")


def _rewrite_token(token: str) -> str:
    """Rewrite one simple selector (element/#id/.class/[attr] compound)."""
    sym_idx = None
    for i, ch in enumerate(token):
        if ch in _SYMBOL_CHARS:
            sym_idx = i
            break
    if sym_idx is None:
        return token
    symbol = "*" if sym_idx == 0 else ""
    out = token[:sym_idx]
    m = _ID_RE.search(token)
    if m:
        out += f"{symbol}[@id = '{m.group(1)}']"
    for m in _CLASS_RE.finditer(token):
        # greedy [^.]+ group intentionally mirrors the reference's regex
        cls = m.group(1)
        out += (
            f"{symbol}[contains(concat(' ',normalize-space(@class),' '),' {cls} ')]"
        )
    for m in _ATTR_RE.finditer(token):
        out += f"[@{m.group(1)}]"
    return out


@lru_cache(maxsize=4096)
def css_to_xpath(css: str) -> str:
    """Compile a CSS selector group to the reference's XPath dialect."""
    xpath_expressions = []
    for expression in css.split(","):
        if not expression:
            continue
        xpath_components = ["./"]
        prefix = None
        tokens = expression.strip().split()
        for idx, token in enumerate(tokens):
            if token == "*" and idx != 0:
                xpath_components.append("/*")
            elif token == ">":
                prefix = ""
            elif token == "+":
                prefix = "following-sibling::*[1]/self::"
            elif token == "~":
                prefix = "following-sibling::"
            else:
                if prefix is None and idx != 0:
                    prefix = "descendant::"
                token = _rewrite_token(token)
                if prefix is not None:
                    token = prefix + token
                    prefix = None
                xpath_components.append(token)
        xpath_expressions.append("/".join(xpath_components))
    return " | ".join(xpath_expressions)
