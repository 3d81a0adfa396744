"""Shared HTML-walking machinery for the RDFa and Microdata parsers
(``sources/rdfa.py``, ``sources/microdata.py``): the lenient scope stack,
void-element handling, text-content literal buffers, and unclosed-tag
recovery live here ONCE so a fix to the recovery logic cannot silently
miss one of the two parsers.

Subclass contract: implement ``handle_starttag`` (ending with
``self._finish_starttag(tag, scope)``) and ``_flush_literal(scope)``;
scopes must expose ``tag`` and ``literal`` attributes where ``literal``
is ``None`` or a tuple whose LAST element is the text buffer list."""

from __future__ import annotations

import re
from html.parser import HTMLParser

ABSOLUTE_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

#: HTML elements with no end tag (processed, flushed, never pushed)
VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class QuadHtmlParser(HTMLParser):
    #: blank-node label prefix, per subclass (PN_CHARS-safe)
    BNODE_PREFIX = "genid_html_"

    def __init__(self, base_iri: str | None):
        super().__init__(convert_charrefs=True)
        self.base = base_iri
        self.quads: list[tuple] = []
        self._bnode_n = 0
        self.stack: list = []  # subclass seeds the root scope

    def _fresh_bnode(self) -> tuple[str, str]:
        self._bnode_n += 1
        return ("BlankNode", f"{self.BNODE_PREFIX}{self._bnode_n}")

    def _emit(self, s, p, o, dt=None, lang=None):
        self.quads.append(
            (s[0], s[1], p, o[0], o[1], dt, lang, None, len(self.quads))
        )

    def _resolve(self, iri: str) -> str:
        if ABSOLUTE_IRI.match(iri) or self.base is None:
            return iri
        from rdf_dataset_fragmenter_js_spark.functions.iri import resolve_iri

        return resolve_iri(iri, self.base)

    def _finish_starttag(self, tag: str, scope) -> None:
        """Push the scope, or — for void elements, which have no end tag —
        flush its literal immediately and drop it."""
        if tag in VOID_ELEMENTS:
            self._flush_literal(scope)
        else:
            self.stack.append(scope)

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self.handle_endtag(tag)

    def handle_data(self, data):
        for scope in self.stack:
            if scope.literal is not None:
                scope.literal[-1].append(data)

    def handle_endtag(self, tag):
        # lenient recovery: pop to the nearest matching open tag (real-world
        # HTML closes <p>/<li> implicitly); unmatched end tags are ignored
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                for scope in reversed(self.stack[i:]):
                    self._flush_literal(scope)
                del self.stack[i:]
                return

    def close(self):
        super().close()
        for scope in reversed(self.stack[1:]):
            self._flush_literal(scope)

    def _flush_literal(self, scope) -> None:  # pragma: no cover - abstract
        raise NotImplementedError
