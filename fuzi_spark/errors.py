"""Error surface, mirroring the reference's XMLError enum
(kylehughes/Fuzi Sources/Error.swift:28-48) and the libxml2 codes its
tests pin (Tests/XMLTests.swift:69-89): 1207 = invalid XPath expression,
1209 = unregistered XPath function. Parse failure for empty docs uses
libxml2's XML_ERR_DOCUMENT_EMPTY (4)."""

from __future__ import annotations

ERR_DOCUMENT_EMPTY = 4
ERR_XPATH_INVALID_EXPR = 1207
ERR_XPATH_UNKNOWN_FUNC = 1209


class XMLError(Exception):
    def __init__(self, code: int, message: str = ""):
        super().__init__(f"[{code}] {message}")
        self.code = code
        self.message = message


class XPathError(XMLError):
    pass
