"""Error surface, mirroring the reference's XMLError enum
(kylehughes/Fuzi Sources/Error.swift:28-48) and the libxml2 codes its
tests pin (Tests/XMLTests.swift:69-89): 1207 = invalid XPath expression,
1209 = unregistered XPath function. Parse failure for empty docs uses
libxml2's XML_ERR_DOCUMENT_EMPTY (4)."""

from __future__ import annotations

ERR_DOCUMENT_EMPTY = 4
ERR_XPATH_INVALID_EXPR = 1207
ERR_XPATH_UNKNOWN_FUNC = 1209


_CANONICAL_MESSAGES = {
    ERR_XPATH_INVALID_EXPR: "Invalid expression",
    ERR_XPATH_UNKNOWN_FUNC: "Unregistered function",
}


class XMLError(Exception):
    """message carries libxml2's canonical text for pinned codes
    (Tests/XMLTests.swift:69-89 matches code AND message); the free-form
    diagnostic detail lives in .detail."""

    def __init__(self, code: int, message: str = ""):
        canonical = _CANONICAL_MESSAGES.get(code)
        self.code = code
        self.message = canonical if canonical is not None else message
        self.detail = message
        super().__init__(f"[{code}] {self.message}" + (f": {message}" if canonical else ""))


class XPathError(XMLError):
    pass
