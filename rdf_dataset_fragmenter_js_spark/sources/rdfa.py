"""RDFa source (``lib/io/QuadSourceFile.ts:19-25`` delegates ``.html`` /
``.xhtml`` to rdf-parse, which routes them to rdfa-streaming-parser).
Driver/executor per-file parsing like the other non-splittable sources,
built on stdlib ``html.parser``.

Coverage — RDFa 1.1 **Lite** plus the attributes real markup leans on:

* ``vocab`` / ``prefix`` (space-separated ``pfx: iri`` pairs, scoped and
  inherited) / the RDFa 1.1 initial-context prefixes;
* ``about`` / ``resource`` (safe-CURIE ``[pfx:ref]``, CURIE, IRI, and
  ``_:label`` blank nodes) and ``href`` / ``src`` resource objects;
* ``typeof`` (rdf:type; a ``typeof`` without a subject mints a blank
  node, as object of an enclosing ``property`` per RDFa Core §7.5/11);
* ``property`` with ``content=``, with a resource object, or with the
  element's text content as a plain literal (``lang`` inherited);
* ``datatype=``, and HTML5 ``<time datetime=>`` with the spec's lexical
  datatype inference (xsd:date/dateTime/time/gYear/gYearMonth/duration);
* ``<base href>`` overriding the document base IRI;
* JSON-LD data islands (``<script type="application/ld+json">``, JSON-LD
  1.1 §HTML content) — rdf-parse's ``text/html`` route emits these
  alongside the RDFa annotations, extractAllScripts semantics: all islands
  form one merged document (shared authored-bnode scope), disjoint from
  the RDFa blank-node scope.

* ``rel`` / ``rev`` **with an explicit resource on the same element**
  (``resource`` / ``href`` / ``src``): exact RDFa Core §7.5 step-6
  semantics — ``rel`` links subject→resource, ``rev`` the reverse, and
  the object resource becomes the subject for descendants (chaining with
  an explicit resource). ``typeof`` applies to ``about`` when present,
  else to the object resource (the spec's *typed resource*). Term values
  resolve like ``property`` (CURIE / absolute IRI / ``vocab``-scoped
  NCName) plus the RDFa 1.1 initial-context term mappings
  (``describedby`` / ``license`` / ``role``); plain HTML link relations
  (``rel="stylesheet"``, ``rel="next"`` with no in-scope vocab) resolve
  to no term and the attribute is ignored, per Core §7.4.3
  term-expansion failure — they are HTML hyperlinks, not RDFa.

RDFa Core features OUTSIDE this subset fail fast with the offending
attribute rather than silently mis-parse: a *hanging* ``rel`` / ``rev``
(no resource on the element → incomplete-triple chaining), ``rel`` /
``rev`` combined with ``property`` on one element (HTML+RDFa's
property-copies-rel special case), and ``inlist``. Unknown *terms* (a
bare ``property="foo"`` with no in-scope ``vocab``) are dropped like the
spec's term-expansion failure, not errors.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from rdf_dataset_fragmenter_js_spark.sources._htmlbase import (
    ABSOLUTE_IRI as _ABSOLUTE_IRI,
)
from rdf_dataset_fragmenter_js_spark.sources._htmlbase import (
    VOID_ELEMENTS as _VOID,
)
from rdf_dataset_fragmenter_js_spark.sources._htmlbase import QuadHtmlParser

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"

#: RDFa 1.1 initial context (W3C-published default prefix declarations) —
#: the widely-used subset; markup can always declare its own via @prefix.
INITIAL_CONTEXT = {
    "rdf": RDF_NS,
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": XSD,
    "owl": "http://www.w3.org/2002/07/owl#",
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "schema": "http://schema.org/",
    "og": "http://ogp.me/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "prov": "http://www.w3.org/ns/prov#",
    "void": "http://rdfs.org/ns/void#",
    "cc": "http://creativecommons.org/ns#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
}

_UNSUPPORTED_ATTRS = ("inlist",)
_PREFIX_DECL = re.compile(r"([A-Za-z][\w.\-]*):\s+(\S+)")
_NCNAME = re.compile(r"^[A-Za-z_][\w.\-]*$")

#: RDFa 1.1 initial-context TERM mappings (w3.org/2011/rdfa-context/
#: rdfa-1.1) — resolved case-insensitively per Core §7.4.3, and checked
#: BEFORE @vocab (local term mappings take precedence over vocab).
_INITIAL_TERMS = {
    "describedby": "http://www.w3.org/2007/05/powder-s#describedby",
    "license": "http://www.w3.org/1999/xhtml/vocab#license",
    "role": "http://www.w3.org/1999/xhtml/vocab#role",
}

#: HTML5 <time datetime=> lexical → xsd datatype (html-rdfa §3.1)
_DATETIME_TYPES = (
    (re.compile(r"^-?\d{4,}-\d{2}-\d{2}T"), XSD + "dateTime"),
    (re.compile(r"^-?\d{4,}-\d{2}-\d{2}$"), XSD + "date"),
    (re.compile(r"^\d{2}:\d{2}(:\d{2})?"), XSD + "time"),
    (re.compile(r"^-?\d{4,}-\d{2}$"), XSD + "gYearMonth"),
    (re.compile(r"^-?\d{4,}$"), XSD + "gYear"),
    (re.compile(r"^-?P"), XSD + "duration"),
)


class _Scope:
    __slots__ = ("tag", "subject", "prefixes", "vocab", "lang", "literal")

    def __init__(self, tag, subject, prefixes, vocab, lang, literal=None):
        self.tag = tag
        self.subject = subject  # (type, value) parent subject for children
        self.prefixes = prefixes
        self.vocab = vocab
        self.lang = lang
        #: open text-content literal: (subject, [preds], datatype, lang, buf)
        self.literal = literal


class _RdfaParser(QuadHtmlParser):
    BNODE_PREFIX = "genid_rdfa_"

    def __init__(self, base_iri: str | None):
        super().__init__(base_iri)
        self._bnode_map: dict[str, str] = {}
        # the document node: its IRI when a base is known, else a blank
        # node (read_driver_parsed always passes the file URI as base)
        self._doc = (
            ("NamedNode", base_iri) if base_iri else ("BlankNode", "genid_rdfa_doc")
        )
        self.stack.append(_Scope(None, self._doc, dict(INITIAL_CONTEXT), None, None))

    # -- term machinery ----------------------------------------------------

    def _curie_or_iri(self, value: str, scope: _Scope):
        """@about/@resource value → subject/object term (safe-CURIE, CURIE,
        _:bnode, or IRI resolved against base)."""
        value = value.strip()
        if value.startswith("[") and value.endswith("]"):
            value = value[1:-1].strip()
        if value.startswith("_:"):
            label = value[2:] or "anon"
            return ("BlankNode", self._bnode_map.setdefault(label, f"b_{label}"))
        if ":" in value:
            prefix, suffix = value.split(":", 1)
            if not suffix.startswith("//") and prefix in scope.prefixes:
                return ("NamedNode", scope.prefixes[prefix] + suffix)
        return ("NamedNode", self._resolve(value))

    def _term_or_curie(self, value: str, scope: _Scope) -> str | None:
        """@property/@typeof/@datatype item → IRI, or None when a bare term
        has no in-scope vocab (dropped, per term-expansion failure)."""
        if ":" in value:
            prefix, suffix = value.split(":", 1)
            if not suffix.startswith("//") and prefix in scope.prefixes:
                return scope.prefixes[prefix] + suffix
            if _ABSOLUTE_IRI.match(value):
                return value
        if _NCNAME.match(value):
            return scope.vocab + value if scope.vocab else None
        return None

    def _terms(self, attr_value: str, scope: _Scope) -> list[str]:
        out = []
        for item in attr_value.split():
            iri = self._term_or_curie(item, scope)
            if iri is not None:
                out.append(iri)
        return out

    def _link_terms(self, attr_value: str, scope: _Scope) -> list[str]:
        """@rel/@rev items → IRIs. Initial-context term mappings win over
        @vocab (Core §7.4.3); an item that resolves to no term (a plain
        HTML link relation like ``stylesheet``) is dropped — a fully
        unresolvable @rel/@rev means the attribute is ignored."""
        out = []
        for item in attr_value.split():
            if ":" not in item and _NCNAME.match(item):
                mapped = _INITIAL_TERMS.get(item.lower())
                if mapped is not None:
                    out.append(mapped)
                elif scope.vocab:
                    out.append(scope.vocab + item)
                continue
            iri = self._term_or_curie(item, scope)
            if iri is not None:
                out.append(iri)
        return out

    # -- tree walk ---------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        a = {}
        for k, v in attrs:
            if v is not None and k not in a:  # first wins, like browsers
                a[k] = v
        # the fail-fast must see valueless (bare) attributes too: @inlist
        # is DEFINED by presence ('<span property="p" inlist>') — checking
        # only the value-carrying dict would silently mis-parse those
        # documents. (A bare/valueless @rel resolves to zero terms and is
        # ignored per Core §7.4.3 term-expansion failure, so it need not.)
        present = {k for k, _ in attrs}
        for bad in _UNSUPPORTED_ATTRS:
            if bad in present:
                raise NotImplementedError(
                    f"RDFa attribute @{bad} (chaining/list semantics) is "
                    "outside the RDFa Lite subset this engine parses"
                )
        parent = self.stack[-1]
        prefixes, vocab, lang = parent.prefixes, parent.vocab, parent.lang
        if "prefix" in a:
            prefixes = dict(prefixes)
            for pfx, iri in _PREFIX_DECL.findall(a["prefix"]):
                prefixes[pfx] = iri
        if "vocab" in a:
            vocab = a["vocab"] or None
        if "lang" in a or "xml:lang" in a:
            lang = a.get("lang") or a.get("xml:lang") or None
        if tag == "base" and a.get("href"):
            # rebase the document node: scopes still pointing at it, open
            # literal buffers, AND any quads already emitted against it
            # (legal head order puts <meta property content> before <base>)
            self.base = a["href"]
            new_doc = ("NamedNode", self.base)
            old_t, old_v = self._doc
            for sc in self.stack:
                if sc.subject == self._doc:
                    sc.subject = new_doc
                if sc.literal is not None and sc.literal[0] == self._doc:
                    sc.literal = (new_doc,) + sc.literal[1:]
            self.quads = [
                (
                    (new_doc[0] if (q[0], q[1]) == (old_t, old_v) else q[0]),
                    (new_doc[1] if (q[0], q[1]) == (old_t, old_v) else q[1]),
                    q[2],
                    (new_doc[0] if (q[3], q[4]) == (old_t, old_v) else q[3]),
                    (new_doc[1] if (q[3], q[4]) == (old_t, old_v) else q[4]),
                )
                + q[5:]
                for q in self.quads
            ]
            self._doc = new_doc
        scope = _Scope(tag, parent.subject, prefixes, vocab, lang)

        explicit_res = next(
            (
                self._curie_or_iri(a[k], scope) if k in ("about", "resource") else ("NamedNode", self._resolve(a[k]))
                for k in ("resource", "href", "src")
                if k in a
            ),
            None,
        )
        about = self._curie_or_iri(a["about"], scope) if "about" in a else None
        types = self._terms(a["typeof"], scope) if "typeof" in a else []
        props = self._terms(a["property"], scope) if "property" in a else []
        datatype = None
        if "datatype" in a:
            datatype = self._term_or_curie(a["datatype"], scope) if a["datatype"] else None

        rels = self._link_terms(a.get("rel") or "", scope)
        revs = self._link_terms(a.get("rev") or "", scope)
        if rels or revs:
            # RDFa Core §7.5 step 6: @rel/@rev with an explicit resource.
            if props:
                raise NotImplementedError(
                    "@rel/@rev combined with @property on one element "
                    "(HTML+RDFa property-copies special case) is outside "
                    "the subset this engine parses"
                )
            if explicit_res is None:
                raise NotImplementedError(
                    "hanging @rel/@rev (no @resource/@href/@src on the "
                    "element → incomplete-triple chaining) is outside the "
                    "subset this engine parses"
                )
            subject = about if about is not None else parent.subject
            # the spec's *typed resource*: @about when present, else the
            # current object resource (step 6's typeof placement)
            typed = about if about is not None else explicit_res
            for t in types:
                self._emit(typed, RDF_NS + "type", ("NamedNode", t))
            for r in rels:
                self._emit(subject, r, explicit_res)
            for r in revs:
                self._emit(explicit_res, r, subject)
            # current object resource becomes the subject for descendants
            # (<div about=A rel=knows resource=B><span property=name>
            # describes B) — same chaining rule as property+resource above
            scope.subject = explicit_res
            self._finish_starttag(tag, scope)
            return

        if not props:
            subject = about or explicit_res or (self._fresh_bnode() if types else None)
            if subject is not None:
                for t in types:
                    self._emit(subject, RDF_NS + "type", ("NamedNode", t))
                scope.subject = subject
        else:
            subject = about or parent.subject
            if types and about is None:
                # typed resource as the OBJECT of the property (Lite's
                # <div property="p" typeof="T"> pattern)
                typed = explicit_res or self._fresh_bnode()
                for p in props:
                    self._emit(subject, p, typed)
                for t in types:
                    self._emit(typed, RDF_NS + "type", ("NamedNode", t))
                scope.subject = typed
            elif explicit_res is not None:
                # reaching here types is non-empty only with @about present
                # (typeof without @about took the typed-object branch), and
                # RDFa Core types the @about resource in that case
                for t in types:
                    self._emit(subject, RDF_NS + "type", ("NamedNode", t))
                for p in props:
                    self._emit(subject, p, explicit_res)
                # @resource/@href/@src with @property is the current object
                # resource — RDFa Core 7.5 step 6 makes it the new subject
                # for descendants (<div about=s property=knows resource=o>
                # <span property=name> describes o, not s)
                scope.subject = explicit_res
            else:
                if types:  # typeof with about: type the subject itself
                    for t in types:
                        self._emit(subject, RDF_NS + "type", ("NamedNode", t))
                content = a.get("content")
                if content is None and tag == "time" and "datetime" in a:
                    content = a["datetime"]
                    if datatype is None and "datatype" not in a:
                        datatype = next(
                            (dt for rx, dt in _DATETIME_TYPES if rx.match(content)),
                            None,
                        )
                if content is not None:
                    self._emit(
                        subject,
                        props[0],
                        ("Literal", content),
                        datatype,
                        None if datatype else lang,
                    )
                    for p in props[1:]:
                        self._emit(
                            subject, p, ("Literal", content),
                            datatype, None if datatype else lang,
                        )
                else:
                    # plain literal = element text content, collected until
                    # the matching end tag (children still produce their own
                    # triples; their text also feeds this buffer)
                    scope.literal = (subject, props, datatype, lang, [])
                scope.subject = subject

        self._finish_starttag(tag, scope)

    def _flush_literal(self, scope: _Scope):
        if scope.literal is None:
            return
        subject, props, datatype, lang, buf = scope.literal
        text = "".join(buf)
        for p in props:
            self._emit(
                subject, p, ("Literal", text), datatype, None if datatype else lang
            )
        scope.literal = None


class _JsonLdIslandFinder(HTMLParser):
    """Collect the raw text of ``<script type="application/ld+json">``
    elements. ``html.parser`` switches to CDATA mode inside ``script``, so
    the island body arrives verbatim via ``handle_data``."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._in_island = False
        self._buf: list[str] = []
        self.islands: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "script":
            mime = (dict(attrs).get("type") or "").strip().lower()
            if mime == "application/ld+json":
                self._in_island = True
                self._buf = []

    def handle_data(self, data):
        if self._in_island:
            self._buf.append(data)

    def handle_endtag(self, tag):
        if tag == "script" and self._in_island:
            self._in_island = False
            self.islands.append("".join(self._buf))


def _parse_jsonld_islands(
    text: str, base_iri: str | None, seq_start: int
) -> list[tuple]:
    from rdf_dataset_fragmenter_js_spark.sources.jsonld import (
        parse_jsonld_documents,
    )

    finder = _JsonLdIslandFinder()
    finder.feed(text)
    finder.close()
    docs = [i for i in finder.islands if i.strip()]
    if not docs:
        return []
    out = []
    for i, q in enumerate(parse_jsonld_documents(docs, base_iri=base_iri)):
        s_type, s, p, o_type, o, dt, lang, g, _seq = q
        # The JSON-LD islands and the RDFa annotations are separate
        # serializations sharing one file, so their blank-node scopes are
        # DISJOINT (RDF Concepts: labels are document-scoped per parser —
        # rdf-parse gives each sub-parser its own bnode factory). RDFa-side
        # labels start with 'b_'/'genid_rdfa_'/'genid_html_'; prefixing the
        # island side with 'json_' keeps the namespaces provably disjoint
        # while staying PN_CHARS-legal.
        if s_type == "BlankNode":
            s = "json_" + s
        if o_type == "BlankNode":
            o = "json_" + o
        out.append((s_type, s, p, o_type, o, dt, lang, g, seq_start + i))
    return out


def parse_rdfa(
    text: str, base_iri: str | None = None, extract_script_jsonld: bool = True
) -> list[tuple]:
    """Parse RDFa-annotated (X)HTML → quad tuples in the engine schema
    (s_type, s, p, o_type, o, o_datatype, o_lang, g, seq).

    Like rdf-parse's ``text/html`` route, the HTML surface yields BOTH the
    RDFa annotations and any JSON-LD data islands
    (``<script type="application/ld+json">``, JSON-LD 1.1 §HTML content,
    extractAllScripts semantics: all islands form one merged document with
    a shared authored-bnode scope). ``extract_script_jsonld=False`` gives
    annotations only."""
    p = _RdfaParser(base_iri)
    p.feed(text)
    p.close()
    quads = p.quads
    if extract_script_jsonld:
        quads = quads + _parse_jsonld_islands(text, base_iri, len(quads))
    return quads


def serialize_rdfa(rows: list[tuple]) -> str:
    """Quad tuples → RDFa-annotated HTML (one ``meta``/``link`` element per
    quad: ``meta/@content`` for literals, ``link/@resource`` for IRI and
    blank-node objects — alternating ``property=`` / ``rel=`` on the links
    so a round-trip exercises BOTH resource-object code paths in
    :func:`parse_rdfa`). Round-trips through :func:`parse_rdfa` —
    property-tested; used by the ``source_rdfa_roundtrip`` gate entry.
    RDFa has no named-graph syntax, so quads with a graph are rejected."""
    import html as _html

    def esc(v: str) -> str:
        return _html.escape(v, quote=True)

    def ref(t_type: str, value: str) -> str:
        return f"_:{value}" if t_type == "BlankNode" else value

    parts = ["<html><body>"]
    n_links = 0
    for r in rows:
        s_type, s, p, o_type, o, dt, lang, g = r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]
        if g is not None:
            raise ValueError(
                f"RDFa cannot express named graphs (quad in graph {g!r}) — "
                "serialize as TriG/N-Quads/JSON-LD instead"
            )
        about, prop = esc(ref(s_type, s)), esc(p)
        if o_type == "Literal":
            attrs = f' datatype="{esc(dt)}"' if dt else ""
            if lang:
                attrs += f' lang="{lang}"'
            parts.append(
                f'<meta about="{about}" property="{prop}" content="{esc(o)}"{attrs}>'
            )
        else:
            # alternate property=/rel= — an absolute-IRI @rel resolves
            # identically, so the round-trip covers Core §7.5 step 6 too
            link_attr = "rel" if n_links % 2 else "property"
            n_links += 1
            parts.append(
                f'<link about="{about}" {link_attr}="{prop}" resource="{esc(ref(o_type, o))}">'
            )
    parts.append("</body></html>")
    return "\n".join(parts)


def read_rdfa(spark, path: str, base_iri: str | None = None):
    """``QuadSourceFile`` for ``.html``/``.xhtml`` — per-file parsed
    (driver for one file, distributed for globs/directories); ``base_iri``
    defaults per file to its URI like rdf-parse's ``path`` option."""
    from rdf_dataset_fragmenter_js_spark.sources.driverfile import read_driver_parsed
    from rdf_dataset_fragmenter_js_spark.sources.nquads import RDFA_EXTENSIONS

    return read_driver_parsed(
        spark,
        path,
        RDFA_EXTENSIONS,
        base_iri,
        lambda text, base: parse_rdfa(text, base_iri=base),
        "read_rdfa",
    )
