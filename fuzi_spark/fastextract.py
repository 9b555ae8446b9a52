"""Fused event-driven HTML extraction: tokenizer events → spans, no DOM.

The standard path (htmlparser.parse_html → strip_boilerplate → _walk_html)
materializes ~2 objects per markup token; at 10^12 documents the extractor
is the job, so this module drives the SAME tokenizer (htmlparser._tokenize,
single source of truth for tag-soup recovery) into a frame stack that
computes the boilerplate-strip stats post-order, scores candidates on
close, and emits/retracts spans inline. Output is REQUIRED to be
bit-identical to the DOM path — tests/test_fastextract.py runs a
randomized differential plus the frozen goldens, and extract.extract_spans
falls back to the DOM path automatically if this module ever raises.

Structural rules (implied html/head/body, auto-close, head→body
transition) are transcribed from htmlparser._TreeBuilder — comments there
are authoritative; a frame here plays the role of an Element on the
builder stack (tag + aggregation state, no children, no attr dicts).
"""

from __future__ import annotations

from typing import Optional

from .dom import VOID_ELEMENTS
from .errors import XMLError, ERR_DOCUMENT_EMPTY
from .htmlparser import _AUTO_CLOSE, _HEAD_ONLY, _P_CLOSERS, _tokenize
from .xmlparser import decode_bytes

from .extract import (
    BLOCK_TAGS,
    CAPTION_TAGS,
    HEADING_TAGS,
    LIST_ITEM_TAGS,
    MEDIA_TAGS,
    STRIP_TAGS,
    _LINK_DENSITY_CANDIDATES,
    _extract_spans_dom,
    _norm,
)


def _norm_len(s: str) -> int:
    return len("".join(s.split()))


# tag → emission class, one dict probe in the starttag hot path; insertion
# order encodes the original elif-chain priority (cap > media > title > li
# > block), later writes overwrite earlier ones
_K_CAP, _K_MEDIA, _K_TITLE, _K_LI, _K_BLOCK = 1, 2, 3, 4, 5
_TAG_CLASS: dict = {}
for _t in BLOCK_TAGS:
    _TAG_CLASS[_t] = _K_BLOCK
for _t in LIST_ITEM_TAGS:
    _TAG_CLASS[_t] = _K_LI
_TAG_CLASS["title"] = _K_TITLE
for _t in MEDIA_TAGS:
    _TAG_CLASS[_t] = _K_MEDIA
for _t in HEADING_TAGS | CAPTION_TAGS:
    _TAG_CLASS[_t] = _K_CAP
del _t

# ONE dict probe per start tag replaces the whole membership chain:
# (p_closer, auto_closes, is_strip, klass, ld_candidate, is_void, is_media)
_DEFAULT_INFO = (False, None, False, None, False, False, False)
_TAG_INFO: dict = {}
for _t in (
    set(_TAG_CLASS)
    | _P_CLOSERS
    | set(_AUTO_CLOSE)
    | STRIP_TAGS
    | _LINK_DENSITY_CANDIDATES
    | VOID_ELEMENTS
    | MEDIA_TAGS
):
    _TAG_INFO[_t] = (
        _t in _P_CLOSERS,
        _AUTO_CLOSE.get(_t),
        _t in STRIP_TAGS,
        _TAG_CLASS.get(_t),
        _t in _LINK_DENSITY_CANDIDATES,
        _t in VOID_ELEMENTS,
        _t in MEDIA_TAGS,
    )
del _t


class _Frame:
    __slots__ = (
        "tag", "spans_start", "cap_start", "pre_span", "saved_buf",
        "nlen", "alen", "dcount", "mflag", "kind_saved", "cap", "skip",
        "media",
    )

    def __init__(self, tag: str):
        self.tag = tag
        self.spans_start = -1  # candidate retraction point, -1 = not tracked
        self.cap_start = -1  # retraction point within an enclosing capture
        self.pre_span = -1  # span emitted by this candidate's open-flush
        self.saved_buf = None  # raw buf at open, to restore on removal
        self.nlen = 0
        self.alen = 0
        self.dcount = 0
        self.mflag = False
        self.kind_saved = None  # list-item frames restore emitter kind
        self.cap = None  # heading/caption capture buffer
        self.skip = False  # STRIP_TAGS subtree
        self.media = False  # non-void media element subtree


class _ExtractBuilder:
    """Tokenizer sink: frame stack + span emitter + strip scoring."""

    def __init__(self):
        self.line = 1  # written by the tokenizer; unused here
        self.stack: list[_Frame] = []
        self._has_html = False
        self._has_body = False
        self._html_popped = False  # a </html> already cleared the stack
        self._head_open = False  # a head frame is on the stack
        self._head_created = False  # a real <head> ELEMENT exists
        self._dead_head = False  # doc.head is an empty <head/> — no title
        self._head_closed = False
        self._has_body = False  # once true, emission is permanently on —
        # the DOM builder routes ALL later content into the body element,
        # even after an explicit </body> (recovery re-append)
        self._dead_body = False  # <body/> at top level: doc.body is that
        # EMPTY element, so the walk emits nothing (later content lands in
        # a second body the walk never visits)
        self._skip_depth = 0
        self._media_depth = 0
        self._cap_stack: list[list[str]] = []
        self._title_buf: Optional[list[str]] = None
        self._title_frame = None  # the frame whose close finalizes doc.title
        self._title_done = False
        self._title_text: Optional[str] = None
        # emitter state
        self.spans: list[dict] = []
        self.buf: list[str] = []
        self.kind = "paragraph"

    # ---- emitter ----
    def _flush(self):
        if not self.buf:
            return
        text = _norm(self.buf)
        self.buf.clear()
        if text:
            self.spans.append(
                {"kind": self.kind, "text": text, "media_ref": None,
                 "offset": len(self.spans)}
            )

    def _emit(self, kind, text, media_ref):
        self.spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref,
             "offset": len(self.spans)}
        )

    # ---- structure implication (transcribed from _TreeBuilder) ----
    def _ensure_html(self):
        if not self._has_html:
            self._has_html = True
            self.stack = [_Frame("html")]

    def _close_frames_from(self, k: int):
        """Close stack[k:], innermost first, folding each into its parent."""
        for j in range(len(self.stack) - 1, k - 1, -1):
            self._close_frame(self.stack[j], self.stack[j - 1] if j else None)
        del self.stack[k:]

    def _enter_body(self):
        """Imply <body>. First entry collapses everything above <html>
        (matching _TreeBuilder._ensure_body) and pushes the one body frame.
        After </body> pops that frame, late recovery content parents
        directly under <html> on the stack — exactly the DOM builder's
        stack shape — while still emitting (the DOM appends such nodes to
        the existing body element, which the walk emits)."""
        self._ensure_html()
        if self._has_body:
            return
        self._head_closed = True
        self._close_frames_from(1)
        self._has_body = True
        # creating <body> resets the DOM stack to [html, body] — html is
        # back on the stack, so a later </html> pops again
        self._html_popped = False
        # discard head-phase text: once a body exists, the walk starts at
        # <body> and head content is never emitted
        self.buf.clear()
        self.stack.append(_Frame("body"))

    def _route_at_html(self, tag: Optional[str], is_text: bool = False):
        """Mirror of _TreeBuilder._current when insertion would happen
        directly under <html>: head-only tags open/join head, everything
        else implies body."""
        self._ensure_html()
        if len(self.stack) != 1:
            return
        if tag in ("head", "body", "html"):
            return
        if not self._head_closed and (
            tag in _HEAD_ONLY
            or (is_text is False and tag in ("script", "noscript"))
        ):
            if not self._head_open:
                self.stack.append(_Frame("head"))
                self._head_open = True
                self._head_created = True
            return
        self._enter_body()

    # ---- frame close: emission + strip scoring + stats folding ----
    def _close_frame(self, f: _Frame, parent: Optional[_Frame]):
        tag = f.tag
        if f.skip:
            self._skip_depth -= 1
            return
        if f.cap is not None:
            self._cap_stack.pop()
            if not self._cap_stack and self._has_body \
                    and not self._media_depth and not self._head_open:
                kind = "heading" if tag in HEADING_TAGS else "caption"
                self._emit(kind, _norm(f.cap), None)
            elif self._cap_stack:
                # nested heading inside a capture: its text belongs to the
                # outer capture (string_value semantics)
                self._cap_stack[-1].extend(f.cap)
        elif f.media:
            self._media_depth -= 1
        elif f is self._title_frame:
            # only the frame that STARTED the capture finalizes it — a
            # nested <title> inside the title closes without ending it
            self._title_text = "".join(self._title_buf or [])
            self._title_buf = None
            self._title_frame = None
            self._title_done = True
        elif tag in LIST_ITEM_TAGS and f.kind_saved is not None:
            if self._has_body and not self._cap_stack \
                    and not self._media_depth and not self._head_open:
                self._flush()
            self.kind = f.kind_saved
        elif tag in BLOCK_TAGS and tag != "body" and self._has_body \
                and not self._cap_stack and not self._media_depth \
                and not self._head_open:
            self._flush()
        # body close: NO flush and emission stays on — the DOM walk emits
        # body as the traversal ROOT (one trailing flush at the end), and
        # post-</body> recovery content re-appends into the body element
        if tag == "head":
            self._head_open = False

        # candidate scoring — identical conditions to strip_boilerplate
        removed = False
        if (
            f.spans_start >= 0
            and f.nlen < 200
            and not f.mflag
        ):
            nlen, alen, dcount = f.nlen, f.alen, f.dcount
            if (nlen > 0 and alen / nlen > 0.75) or (
                dcount >= 3
                and nlen < 80
                and nlen / dcount < 2.0
                and (alen > 0 or nlen == 0)
            ):
                del self.spans[f.spans_start:]
                if f.cap_start >= 0 and self._cap_stack:
                    # candidate removed inside a heading/caption capture:
                    # its text vanishes from the capture too (the DOM strip
                    # removes the subtree before string_value is taken)
                    del self._cap_stack[-1][f.cap_start:]
                if f.saved_buf is not None:
                    # undo the open-flush boundary: restore the raw
                    # pre-block buffer (and retract the span it emitted) so
                    # text after the removed block continues the span that
                    # preceded it — adjacency after subtree removal
                    if f.pre_span >= 0:
                        del self.spans[f.pre_span:]
                    self.buf = f.saved_buf
                removed = True

        if not removed and parent is not None:
            alen_out = f.alen + (f.nlen if tag == "a" else 0)
            parent.nlen += f.nlen
            parent.alen += alen_out
            parent.dcount += f.dcount + 1
            parent.mflag = parent.mflag or f.mflag or tag in MEDIA_TAGS

    # ---- token handlers ----
    def handle_starttag(self, tag, attrs):
        if tag == "html":
            self._ensure_html()
            return
        if tag == "head":
            self._ensure_html()
            # an explicit <head> always creates the head ELEMENT (the DOM
            # _ensure_head runs even when nothing is pushed)...
            self._head_created = True
            # ...but the DOM pushes it only while <html> is atop its
            # stack — never after a </html> popped it (head can still
            # re-enter via head-only ROUTING, which _route_at_html mirrors)
            if len(self.stack) == 1 and not self._head_open \
                    and not self._html_popped:
                self.stack.append(_Frame("head"))
                self._head_open = True
            return
        if tag == "body":
            self._enter_body()
            return
        # head→body transition (transcribed; applies even while a skipped
        # subtree is open — tag-soup noscript-in-head can trigger it)
        if not self._head_closed and tag not in _HEAD_ONLY and tag not in (
            "script", "noscript", "template",
        ):
            if self._head_open:
                self._close_frames_from(1)
            self._enter_body()

        info = _TAG_INFO.get(tag, _DEFAULT_INFO)
        # auto-close rules (transcribed; frames close properly)
        if info[0]:  # p-closer
            for k in range(len(self.stack) - 1, -1, -1):
                t = self.stack[k].tag
                if t == "p":
                    self._close_frames_from(k)
                    break
                if t in ("body", "html", "td", "th", "li"):
                    break
        closes = info[1]
        if closes:
            for k in range(len(self.stack) - 1, -1, -1):
                t = self.stack[k].tag
                if t in closes:
                    self._close_frames_from(k)
                    break
                if t in ("body", "html", "table"):
                    break
                if tag in ("li", "dt", "dd") and t in ("ul", "ol", "dl"):
                    break

        if len(self.stack) < 2:
            self._route_at_html(tag)
        parent = self.stack[-1] if self.stack else None
        f = _Frame(tag)

        if self._skip_depth or info[2]:  # strip subtree
            f.skip = True
            self._skip_depth += 1
        else:
            emitting = (
                self._has_body and not self._cap_stack
                and not self._media_depth and not self._head_open
            )
            saved_buf_before = None
            spans_before = 0
            klass = info[3]
            if klass == _K_CAP:
                if not self._media_depth:
                    if emitting:
                        self._flush()
                    f.cap = []
                    self._cap_stack.append(f.cap)
            elif klass == _K_MEDIA:
                if emitting:
                    self._flush()
                    self._emit(
                        "media",
                        _norm([_attr_get(attrs, "alt") or ""]),
                        _media_ref_attrs(attrs),
                    )
                if not info[5]:  # non-void media element subtree
                    f.media = True
                    self._media_depth += 1
            elif klass == _K_TITLE:
                if (
                    self._head_open
                    and not self._title_done
                    and parent is not None
                    and parent.tag == "head"
                ):
                    self._title_buf = []
                    self._title_frame = f
            elif klass == _K_LI:
                if emitting:
                    self._flush()
                f.kind_saved = self.kind
                self.kind = "list"
            elif klass == _K_BLOCK:
                if emitting:
                    saved_buf_before = self.buf[:]
                    spans_before = len(self.spans)
                    self._flush()
            if info[4]:  # link-density candidate
                f.spans_start = len(self.spans)
                if self._cap_stack:
                    f.cap_start = len(self._cap_stack[-1])
                elif emitting:
                    # if this candidate is later REMOVED, its open-flush
                    # boundary must be undone: the DOM strip removes the
                    # subtree BEFORE the walk, so text on both sides of a
                    # removed block is adjacent and merges into one span
                    if saved_buf_before is not None:
                        f.saved_buf = saved_buf_before
                        if len(self.spans) > spans_before:
                            f.pre_span = spans_before
                            f.spans_start = len(self.spans)

        if not info[5]:  # non-void: frame goes on the stack
            self.stack.append(f)
        elif not f.skip and parent is not None:
            # void element: fold immediately into the enclosing frame
            parent.dcount += 1
            parent.mflag = parent.mflag or info[6]
        elif f.skip:
            self._skip_depth -= 1  # no frame pushed, nothing to unwind

    def handle_startendtag(self, tag, attrs):
        # <foo/>: empty element (no auto-close in the DOM builder either).
        # The walk still treats it by tag class: blocks are boundaries,
        # empty headings/captions emit an empty-text span, strip tags
        # vanish entirely (removed before the walk, so no boundary and no
        # stats contribution) — but their body-implication side effect on
        # the builder persists.
        if self._skip_depth:
            return
        self._route_at_html(tag)
        if tag in STRIP_TAGS:
            return
        if tag == "head":
            if len(self.stack) <= 1 and not self._head_created:
                # html-level empty <head/>: becomes doc.head (FIRST head
                # child of html) — doc.title resolves against it forever,
                # so later <title>s (which land in a second head) never
                # surface; any deeper <head/> is just an empty element
                self._head_created = True
                self._dead_head = True
            if self.stack:
                p = self.stack[-1]
                p.dcount += 1
            return
        if tag == "body":
            if len(self.stack) <= 1:
                # html-level empty body: becomes doc.body (first body
                # child) — the walk root is empty, nothing ever emits
                if not self._has_body:
                    self._dead_body = True
                return
            # nested empty body inside real body: plain block boundary
        if tag == "title" and self._head_open and not self._title_done \
                and self.stack and self.stack[-1].tag == "head":
            self._title_text = ""
            self._title_done = True
            return
        emitting = (
            self._has_body and not self._cap_stack
            and not self._media_depth and not self._head_open
        )
        if tag in MEDIA_TAGS:
            if emitting:
                self._flush()
                self._emit(
                    "media",
                    _norm([_attr_get(attrs, "alt") or ""]),
                    _media_ref_attrs(attrs),
                )
        elif tag in HEADING_TAGS or tag in CAPTION_TAGS:
            if emitting:
                self._flush()
                self._emit(
                    "heading" if tag in HEADING_TAGS else "caption", "", None
                )
        elif emitting and (tag in BLOCK_TAGS or tag in LIST_ITEM_TAGS):
            self._flush()
        if self.stack:
            p = self.stack[-1]
            p.dcount += 1
            p.mflag = p.mflag or tag in MEDIA_TAGS

    def handle_endtag(self, tag):
        if tag == "head":
            self._head_closed = True
        if tag == "html":
            # the DOM builder pops the WHOLE stack at </html> (its close
            # scan includes index 0), so every open element — captures,
            # strip subtrees, media, list items — closes here, and later
            # content re-parents under html/body exactly like
            # post-</body> recovery. The frame loop below never reaches
            # index 0, so mirror it explicitly. ONE-SHOT: after that pop
            # the html element never re-enters the DOM stack (elements
            # re-parent under body but only they are stacked), so a
            # second </html> is a no-op there — and here. A stray </html>
            # before any markup is likewise ignored.
            if self._has_html and not self._html_popped:
                self._html_popped = True
                self._close_frames_from(1)
            return
        for k in range(len(self.stack) - 1, 0, -1):
            if self.stack[k].tag == tag:
                self._close_frames_from(k)
                return
        # unmatched close tag ignored (recovery)

    def handle_data(self, data):
        if not data:
            return
        if self._skip_depth:
            return
        if self._title_buf is not None:
            self._title_buf.append(data)
        if not self.stack:
            self._ensure_html()
        if len(self.stack) == 1:
            # directly under <html>: whitespace is dropped, content implies
            # (or re-enters) body — _TreeBuilder.handle_data semantics
            if not data.strip():
                return
            self._route_at_html(None, is_text=True)
            if len(self.stack) == 1:
                self._enter_body()
        top = self.stack[-1]
        top.nlen += _norm_len(data)
        if self._cap_stack:
            self._cap_stack[-1].append(data)
        elif self._media_depth:
            return
        elif not self._head_open:
            # body-subtree text (and html-level recovery text, which the
            # DOM appends to body); head text is never emitted here — docs
            # that stay body-less take the DOM fallback, and post-body
            # <head> content is an html-child the walk never visits
            self.buf.append(data)

    def handle_comment(self, data):
        pass

    def handle_pi(self, data):
        pass

    # ---- finish ----
    def finish(self) -> list[dict]:
        if self.stack:
            self._close_frames_from(1)
        self._flush()
        if self._dead_body:
            self.spans.clear()
        title = None if self._dead_head else self._title_text
        if title and title.strip():
            self.spans.insert(
                0,
                {"kind": "heading", "text": _norm([title]), "media_ref": None,
                 "offset": -1},
            )
            for i, s in enumerate(self.spans):
                s["offset"] = i
        return self.spans


def _attr_get(attrs, name):
    for k, v in attrs:
        if k == name:
            return v
    return None


def _media_ref_attrs(attrs) -> Optional[str]:
    for want in ("src", "href", "poster", "data"):
        v = _attr_get(attrs, want)
        if v:
            return v
    return None


def extract_spans_html_fast(markup) -> tuple[list[dict], int]:
    """HTML fast path: identical output contract to extract.extract_spans
    with doc_type='html'. Raises XMLError on empty input (same as
    parse_html); any other failure propagates for the caller's fallback."""
    if isinstance(markup, (bytes, bytearray)):
        markup = decode_bytes(bytes(markup))
    if markup[:1] == "﻿":
        markup = markup[1:]
    if not markup.strip():
        raise XMLError(ERR_DOCUMENT_EMPTY, "Document is empty")
    tb = _ExtractBuilder()
    _tokenize(markup, tb)
    if not tb._has_body:
        # Body-less document: the DOM path's no-body fallback walks
        # doc.root — head included — so head-resident startend tags emit
        # spans there ('<style>x</style><h1/>' → [heading ""]) interleaved
        # with head text in document order. Reconstructing that event-side
        # would mean replaying the walk; body-less docs are rare (any flow
        # content or text implies <body>), so run the DOM reference
        # instead. <body/> dead-body docs also land here and the DOM walk
        # of the empty body element yields the same ([], 0).
        return _extract_spans_dom(markup, "html")
    return tb.finish(), 0
