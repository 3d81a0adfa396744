"""HTML Microdata source (the reference's rdf-parse v3 bundles
microdata-rdf-streaming-parser next to the RDFa parser for ``text/html``;
``lib/io/QuadSourceFile.ts:19-25``). Driver/executor per-file parsing on
stdlib ``html.parser``, like ``sources/rdfa.py``.

Coverage — the registry-less core of the W3C *Microdata to RDF* note:

* ``itemscope`` items (blank nodes, or ``itemid`` subjects resolved
  against the base IRI);
* ``itemtype`` (space-separated absolute IRIs → ``rdf:type``);
* ``itemprop`` names: absolute-IRI names pass through; plain names
  concatenate onto the item's vocabulary (derived from the first
  ``itemtype``: up to and including ``#``, else the last ``/``); names
  with neither are dropped like the note's unresolvable terms;
* values per element kind: ``a``/``area``/``link`` → ``href`` IRI;
  ``img``/``audio``/``video``/``embed``/``iframe``/``source``/``track``
  → ``src`` IRI; ``meta`` → ``content``; ``data``/``meter`` → ``value``;
  ``time`` → ``datetime`` (or text); anything else → text content
  (``lang``-inherited plain literal);
* nested ``itemscope`` + ``itemprop`` → the nested item as object.

``itemref`` (forward references to elements by id — a second pass over
the document) fails fast rather than silently dropping the referenced
properties. Microdata has no named graphs and no typed literals; all
literals are plain or language-tagged, matching the note.
"""

from __future__ import annotations

from rdf_dataset_fragmenter_js_spark.sources._htmlbase import (
    ABSOLUTE_IRI as _ABSOLUTE_IRI,
)
from rdf_dataset_fragmenter_js_spark.sources._htmlbase import QuadHtmlParser

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_SRC_ELEMENTS = frozenset("img audio video embed iframe source track".split())


def _vocab_of(type_iri: str) -> str:
    """Vocabulary base for plain property names, per the note's
    registry-less rule: through the ``#``, else through the last ``/``."""
    if "#" in type_iri:
        return type_iri[: type_iri.index("#") + 1]
    return type_iri[: type_iri.rfind("/") + 1]


class _Scope:
    __slots__ = ("tag", "item", "prop_base", "lang", "literal")

    def __init__(self, tag, item, prop_base, lang, literal=None):
        self.tag = tag
        self.item = item  # (type, value) of the nearest enclosing itemscope
        self.prop_base = prop_base
        self.lang = lang
        #: open text-content literal: (item, [pred IRIs], lang, buf)
        self.literal = literal


class _MicrodataParser(QuadHtmlParser):
    BNODE_PREFIX = "genid_md_"

    def __init__(self, base_iri: str | None):
        super().__init__(base_iri)
        self.stack.append(_Scope(None, None, None, None))

    def _prop_iris(self, itemprop: str, prop_base: str | None) -> list[str]:
        out = []
        for name in itemprop.split():
            if _ABSOLUTE_IRI.match(name):
                out.append(name)
            elif prop_base:
                out.append(prop_base + name)
        return out

    def handle_starttag(self, tag, attrs):
        a = {}
        for k, v in attrs:
            if k not in a:
                a[k] = v  # presence attrs (itemscope) arrive as None
        if "itemref" in a:
            raise NotImplementedError(
                "microdata @itemref (by-id forward references) is not "
                "supported — inline the referenced properties"
            )
        parent = self.stack[-1]
        lang = parent.lang
        if "lang" in a or "xml:lang" in a:
            lang = a.get("lang") or a.get("xml:lang") or None
        scope = _Scope(tag, parent.item, parent.prop_base, lang)

        props = (
            self._prop_iris(a["itemprop"], parent.prop_base)
            if a.get("itemprop")
            else []
        )
        if "itemscope" in a:
            item = (
                ("NamedNode", self._resolve(a["itemid"].strip()))
                if a.get("itemid")
                else self._fresh_bnode()
            )
            types = [t for t in (a.get("itemtype") or "").split() if _ABSOLUTE_IRI.match(t)]
            for t in types:
                self._emit(item, RDF_NS + "type", ("NamedNode", t))
            if props and parent.item is not None:
                for p in props:
                    self._emit(parent.item, p, item)
            scope.item = item
            scope.prop_base = _vocab_of(types[0]) if types else parent.prop_base
        elif props and parent.item is not None:
            if tag in ("a", "area", "link") and a.get("href") is not None:
                o = ("NamedNode", self._resolve(a["href"]))
                for p in props:
                    self._emit(parent.item, p, o)
            elif tag in _SRC_ELEMENTS and a.get("src") is not None:
                o = ("NamedNode", self._resolve(a["src"]))
                for p in props:
                    self._emit(parent.item, p, o)
            elif tag == "meta":
                for p in props:
                    self._emit(parent.item, p, ("Literal", a.get("content") or ""), lang=lang)
            elif tag in ("data", "meter") and a.get("value") is not None:
                for p in props:
                    self._emit(parent.item, p, ("Literal", a["value"]), lang=lang)
            elif tag == "time" and a.get("datetime") is not None:
                for p in props:
                    self._emit(parent.item, p, ("Literal", a["datetime"]), lang=lang)
            else:
                scope.literal = (parent.item, props, lang, [])

        self._finish_starttag(tag, scope)

    def _flush_literal(self, scope):
        if scope.literal is None:
            return
        item, props, lang, buf = scope.literal
        text = "".join(buf)
        for p in props:
            self._emit(item, p, ("Literal", text), lang=lang)
        scope.literal = None


def parse_microdata(text: str, base_iri: str | None = None) -> list[tuple]:
    """Parse HTML Microdata → quad tuples in the engine schema
    (s_type, s, p, o_type, o, o_datatype, o_lang, g, seq)."""
    p = _MicrodataParser(base_iri)
    p.feed(text)
    p.close()
    return p.quads


def serialize_microdata(rows: list[tuple]) -> str:
    """Quad tuples → Microdata HTML (per-subject ``div[itemscope][itemid]``
    with ``meta``/``link`` children). Only the shapes Microdata can carry:
    IRI subjects, absolute-IRI properties, plain/lang literals and IRI
    objects — no named graphs, datatypes, or blank-node subjects. Used by
    the ``source_microdata_roundtrip`` gate entry."""
    import html as _html

    def esc(v):
        return _html.escape(v, quote=True)

    parts = ["<html><body>"]
    for r in rows:
        s_type, s, p, o_type, o, dt, lang, g = r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]
        if g is not None or dt is not None or s_type != "NamedNode" or o_type == "BlankNode":
            raise ValueError(
                "microdata cannot express named graphs, typed literals, or "
                f"blank-node subjects/objects (quad {r!r})"
            )
        if p == RDF_NS + "type" and o_type == "NamedNode":
            parts.append(
                f'<div itemscope itemid="{esc(s)}" itemtype="{esc(o)}"></div>'
            )
        elif o_type == "Literal":
            lg = f' lang="{lang}"' if lang else ""
            parts.append(
                f'<div itemscope itemid="{esc(s)}">'
                f'<meta itemprop="{esc(p)}" content="{esc(o)}"{lg}></div>'
            )
        else:
            parts.append(
                f'<div itemscope itemid="{esc(s)}">'
                f'<link itemprop="{esc(p)}" href="{esc(o)}"></div>'
            )
    parts.append("</body></html>")
    return "\n".join(parts)


def read_microdata(spark, path: str, base_iri: str | None = None):
    """Microdata reader for ``.html`` files. NOT auto-dispatched by
    ``read_rdf`` (``.html`` defaults to the RDFa parser, matching
    rdf-parse's primary HTML route) — select it explicitly, or via
    ``"format": "microdata"`` on a ``QuadSourceFile`` spec."""
    from rdf_dataset_fragmenter_js_spark.sources.driverfile import read_driver_parsed
    from rdf_dataset_fragmenter_js_spark.sources.nquads import RDFA_EXTENSIONS

    return read_driver_parsed(
        spark,
        path,
        RDFA_EXTENSIONS,
        base_iri,
        lambda text, base: parse_microdata(text, base_iri=base),
        "read_microdata",
    )
