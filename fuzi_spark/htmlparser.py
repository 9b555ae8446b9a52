"""Tag-soup-recovering HTML parser → DOM.

A from-scratch equivalent of the reference's HTML path
(`htmlReadMemory(..., RECOVER | NOWARNING | NOERROR)`,
kylehughes/Fuzi Sources/Document.swift:211-213): case-insensitive tags,
void elements, boolean attributes, implied <html>/<head>/<body> structure,
unclosed-tag recovery (Tests/ActorHardeningTests.swift:871-952).

Built on the stdlib's event-driven tokenizer (html.parser.HTMLParser —
itself a pure-Python state machine over the HTML5 tokenization states),
with a libxml2-style tree builder on top: auto-closing rules for p/li/td/…,
head-vs-body placement, script/style raw-text handling.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Optional

from .dom import Comment, Document, Element, PI, Text, VOID_ELEMENTS
from .errors import XMLError, ERR_DOCUMENT_EMPTY

# Elements whose start tag implies <head> if neither head nor body is open
# (cf. libxml2 htmlCheckImplied + head-element table).
_HEAD_ONLY = frozenset({"title", "base", "link", "meta", "style", "isindex"})

# p is closed by any of these openers (subset of libxml2 htmlNoContentElements
# / block-level close rules — enough for the reference corpus + real pages).
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre "
    "section table ul".split()
)
# tag -> set of open tags it auto-closes (nearest first)
_AUTO_CLOSE = {
    "li": {"li"},
    "dt": {"dt", "dd"},
    "dd": {"dt", "dd"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "option": {"option"},
    "optgroup": {"option", "optgroup"},
    "thead": {"tbody", "tfoot"},
    "tbody": {"thead", "tfoot"},
    "tfoot": {"tbody"},
}


class _TreeBuilder(HTMLParser):
    def __init__(self, doc: Document):
        super().__init__(convert_charrefs=True)
        self.doc = doc
        self.stack: list[Element] = []
        self._html: Optional[Element] = None
        self._head: Optional[Element] = None
        self._body: Optional[Element] = None
        self._head_closed = False

    # --- structure implication ---
    def _ensure_html(self) -> Element:
        if self._html is None:
            el = Element("html", self.doc, self.getpos()[0])
            self.doc.children.append(el)
            self.doc.root = el
            self._html = el
            self.stack = [el]
        return self._html

    def _ensure_head(self) -> Element:
        html = self._ensure_html()
        if self._head is None:
            el = Element("head", self.doc, self.getpos()[0])
            html.append(el)
            self._head = el
        return self._head

    def _ensure_body(self) -> Element:
        html = self._ensure_html()
        if self._body is None:
            self._head_closed = True
            el = Element("body", self.doc, self.getpos()[0])
            html.append(el)
            self._body = el
            # anything still open above body level collapses
            self.stack = [html, el]
        return self._body

    def _current(self, for_tag: Optional[str] = None, is_text: bool = False) -> Element:
        """Return the insertion point, implying html/head/body as needed."""
        if self._html is None:
            self._ensure_html()
        top = self.stack[-1] if self.stack else self._ensure_html()
        if top is self._html:
            # directly under <html>: route into head or body
            if for_tag in ("head", "body", "html"):
                return top
            if not self._head_closed and (
                for_tag in _HEAD_ONLY or (is_text is False and for_tag in ("script", "noscript"))
            ):
                h = self._ensure_head()
                self.stack.append(h)
                return h
            b = self._ensure_body()
            return b
        return top

    # --- token handlers ---
    def handle_starttag(self, tag: str, attrs):
        tag = tag.lower()
        line = self.getpos()[0]
        if tag == "html":
            self._ensure_html()
            for k, v in attrs:
                self._html.attrs[k] = v if v is not None else ""
            return
        if tag == "head":
            h = self._ensure_head()
            if self.stack and self.stack[-1] is self._html:
                self.stack.append(h)
            for k, v in attrs:
                h.attrs[k] = v if v is not None else ""
            return
        if tag == "body":
            b = self._ensure_body()
            for k, v in attrs:
                b.attrs[k] = v if v is not None else ""
            return
        # head→body transition: body-only element while head is open
        if not self._head_closed and tag not in _HEAD_ONLY and tag not in (
            "script",
            "noscript",
            "template",
        ):
            if self._head is not None and any(e is self._head for e in self.stack):
                # close out of head
                while self.stack and self.stack[-1] is not self._html:
                    self.stack.pop()
            self._ensure_body()

        # auto-close rules
        if tag in _P_CLOSERS:
            for k in range(len(self.stack) - 1, -1, -1):
                if self.stack[k].tag == "p":
                    del self.stack[k:]
                    break
                if self.stack[k].tag in ("body", "html", "td", "th", "li"):
                    break
        closes = _AUTO_CLOSE.get(tag)
        if closes:
            for k in range(len(self.stack) - 1, -1, -1):
                t = self.stack[k].tag
                if t in closes:
                    del self.stack[k:]
                    break
                if t in ("body", "html", "table") and tag not in ("td", "th", "tr"):
                    break
                if t in ("body", "html"):
                    break

        parent = self._current(for_tag=tag)
        el = Element(tag, self.doc, line)
        for k, v in attrs:
            el.attrs[k.lower()] = v if v is not None else ""
        parent.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs):
        tag = tag.lower()
        if tag in VOID_ELEMENTS or True:
            # <foo/> in HTML: treated as empty element
            parent = self._current(for_tag=tag)
            el = Element(tag, self.doc, self.getpos()[0])
            for k, v in attrs:
                el.attrs[k.lower()] = v if v is not None else ""
            parent.append(el)

    def handle_endtag(self, tag: str):
        tag = tag.lower()
        if tag == "head":
            self._head_closed = True
        for k in range(len(self.stack) - 1, -1, -1):
            if self.stack[k].tag == tag:
                del self.stack[k:]
                return
        # unmatched close tag ignored (recovery)

    def handle_data(self, data: str):
        if not data:
            return
        if self._body is None and not data.strip():
            # whitespace before content: keep only if inside an open element
            if not self.stack or self.stack[-1] is self._html:
                return
        top = self.stack[-1] if self.stack else None
        if top is None or top is self._html:
            if not data.strip():
                return
            top = self._current(is_text=True)
            if top is self._html:
                top = self._ensure_body()
        top.append(Text(data, self.doc, self.getpos()[0]))

    def handle_comment(self, data: str):
        parent = self.stack[-1] if self.stack else self._ensure_html()
        parent.append(Comment(data, self.doc, self.getpos()[0]))

    def handle_decl(self, decl: str):
        pass  # <!DOCTYPE html> — no tree node

    def handle_pi(self, data: str):
        parts = data.split(None, 1)
        if parts:
            parent = self.stack[-1] if self.stack else self._ensure_html()
            parent.append(
                PI(parts[0], parts[1] if len(parts) > 1 else "", self.doc, self.getpos()[0])
            )


def parse_html(source, user_namespaces=None) -> Document:
    """Parse HTML (str/bytes) into a Document; never raises on malformed
    markup, raises XMLError only for empty input."""
    if isinstance(source, (bytes, bytearray)):
        from .xmlparser import decode_bytes

        source = decode_bytes(bytes(source))
    doc = Document(is_html=True)
    if user_namespaces:
        doc.namespaces.update(user_namespaces)
    if not source.strip():
        raise XMLError(ERR_DOCUMENT_EMPTY, "Document is empty")
    tb = _TreeBuilder(doc)
    try:
        tb.feed(source)
        tb.close()
    except Exception as e:  # tokenizer blowups must never kill a task
        doc.errors.append((1, f"html tokenizer: {e}"))
    if doc.root is None:
        tb._ensure_html()
        tb._ensure_body()
    doc.assign_order()
    return doc
