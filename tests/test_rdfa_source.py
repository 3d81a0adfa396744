"""RDFa source parity: the reference delegates .html/.xhtml to rdf-parse's
RDFa path (lib/io/QuadSourceFile.ts:19-25); our parser covers the RDFa 1.1
Lite subset over stdlib html.parser."""

from __future__ import annotations

import pytest

from rdf_dataset_fragmenter_js_spark.sources.nquads import read_rdf
from rdf_dataset_fragmenter_js_spark.sources.rdfa import parse_rdfa, serialize_rdfa

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
S = "http://schema.org/"
B = "http://base.org/page"


def _vals(rows):
    return {(r[0], r[1], r[2], r[3], r[4], r[5], r[6]) for r in rows}


def test_schema_org_lite_markup():
    html = """
    <html><body>
      <div vocab="http://schema.org/" typeof="Person" about="#me">
        <span property="name">Alice</span>
        <a property="url" href="https://alice.example/">home</a>
        <img property="image" src="/alice.png">
        <span property="jobTitle" content="Engineer">works as an engineer</span>
      </div>
    </body></html>"""
    vals = _vals(parse_rdfa(html, base_iri=B))
    me = B + "#me"
    assert ("NamedNode", me, RDF_NS + "type", "NamedNode", S + "Person", None, None) in vals
    assert ("NamedNode", me, S + "name", "Literal", "Alice", None, None) in vals
    assert ("NamedNode", me, S + "url", "NamedNode", "https://alice.example/", None, None) in vals
    assert ("NamedNode", me, S + "image", "NamedNode", "http://base.org/alice.png", None, None) in vals
    assert ("NamedNode", me, S + "jobTitle", "Literal", "Engineer", None, None) in vals


def test_nested_typeof_as_object_and_bnode():
    html = """
    <div vocab="http://schema.org/" about="http://ex.org/book" typeof="Book">
      <div property="author" typeof="Person">
        <span property="name">Bob</span>
      </div>
    </div>"""
    rows = parse_rdfa(html, base_iri=B)
    author = [r for r in rows if r[2] == S + "author"]
    assert len(author) == 1 and author[0][3] == "BlankNode"
    bnode = author[0][4]
    vals = _vals(rows)
    assert ("BlankNode", bnode, RDF_NS + "type", "NamedNode", S + "Person", None, None) in vals
    assert ("BlankNode", bnode, S + "name", "Literal", "Bob", None, None) in vals


def test_prefix_curie_lang_datatype_time():
    html = """
    <html lang="en"><body prefix="ex: http://ex.org/ dbp: http://dbpedia.org/prop/">
      <p about="[ex:s]" property="ex:label">Hello</p>
      <p about="ex:s" property="dbp:count" datatype="xsd:integer" content="7">seven</p>
      <p about="ex:s" property="ex:de" lang="de">Hallo</p>
      <time about="ex:s" property="ex:born" datetime="1990-05-01">May Day 1990</time>
      <time about="ex:s" property="ex:when" datetime="1990-05-01T10:00:00">then</time>
    </body></html>"""
    vals = _vals(parse_rdfa(html, base_iri=B))
    E = "http://ex.org/"
    assert ("NamedNode", E + "s", E + "label", "Literal", "Hello", None, "en") in vals
    assert ("NamedNode", E + "s", "http://dbpedia.org/prop/count", "Literal", "7", XSD + "integer", None) in vals
    assert ("NamedNode", E + "s", E + "de", "Literal", "Hallo", None, "de") in vals
    assert ("NamedNode", E + "s", E + "born", "Literal", "1990-05-01", XSD + "date", None) in vals
    assert ("NamedNode", E + "s", E + "when", "Literal", "1990-05-01T10:00:00", XSD + "dateTime", None) in vals


def test_initial_context_meta_og_and_base():
    html = """
    <html><head>
      <base href="http://moved.org/doc">
      <meta property="og:title" content="The Title">
    </head><body>
      <span property="foaf:name" about="">N</span>
    </body></html>"""
    vals = _vals(parse_rdfa(html, base_iri=B))
    doc = "http://moved.org/doc"
    assert ("NamedNode", doc, "http://ogp.me/ns#title", "Literal", "The Title", None, None) in vals
    assert ("NamedNode", doc, "http://xmlns.com/foaf/0.1/name", "Literal", "N", None, None) in vals


def test_text_literal_includes_nested_text_and_recovers_unclosed_tags():
    html = """
    <div vocab="http://schema.org/" about="http://ex.org/r">
      <p property="description">A <b>bold</b> claim
      <li property="keywords">spark
    </div>"""
    rows = parse_rdfa(html, base_iri=B)
    desc = next(r for r in rows if r[2] == S + "description")
    assert "A bold claim" in " ".join(desc[4].split())
    kw = next(r for r in rows if r[2] == S + "keywords")
    assert kw[4].strip() == "spark"


def test_bare_term_without_vocab_dropped_and_html_link_rel_ignored():
    assert parse_rdfa('<span property="name">x</span>', base_iri=B) == []
    # rel="next" with no in-scope vocab is a plain HTML link relation —
    # it resolves to no term and the attribute is ignored (Core §7.4.3
    # term-expansion failure), not an error and not a triple
    assert parse_rdfa('<a rel="next" href="http://n.org/">n</a>', base_iri=B) == []


def test_rel_rev_with_explicit_resource():
    html = (
        '<div vocab="http://schema.org/" about="http://ex.org/a">'
        '<a rel="knows" href="http://ex.org/b">B</a>'
        '<link rev="parent" resource="http://ex.org/c">'
        "</div>"
    )
    rows = {(r[1], r[2], r[4]) for r in parse_rdfa(html, base_iri=B)}
    assert rows == {
        ("http://ex.org/a", S + "knows", "http://ex.org/b"),
        ("http://ex.org/c", S + "parent", "http://ex.org/a"),
    }


def test_rel_chaining_descendants_describe_object_resource():
    html = (
        '<div vocab="http://schema.org/" about="http://ex.org/a">'
        '<div rel="knows" resource="http://ex.org/b" typeof="Person">'
        '<span property="name">Bee</span></div></div>'
    )
    rows = {(r[1], r[2], r[4]) for r in parse_rdfa(html, base_iri=B)}
    assert rows == {
        ("http://ex.org/a", S + "knows", "http://ex.org/b"),
        ("http://ex.org/b", RDF_NS + "type", S + "Person"),
        ("http://ex.org/b", S + "name", "Bee"),
    }


def test_rel_initial_context_term_and_curie():
    # Core §7.4.3: a local @vocab resolves a bare term FIRST; the RDFa 1.1
    # initial-context TERM mappings apply only when no vocab is in scope.
    # CURIEs resolve through in-scope prefixes as usual.
    html = (
        '<div vocab="http://schema.org/" about="http://ex.org/a">'
        '<a rel="license" href="http://ex.org/l">L</a>'
        '<a rel="foaf:knows" href="http://ex.org/b">B</a></div>'
    )
    rows = {(r[1], r[2], r[4]) for r in parse_rdfa(html, base_iri=B)}
    assert rows == {
        ("http://ex.org/a", S + "license", "http://ex.org/l"),
        ("http://ex.org/a", "http://xmlns.com/foaf/0.1/knows", "http://ex.org/b"),
    }
    no_vocab = '<div about="http://ex.org/a"><a rel="license" href="http://ex.org/l">L</a></div>'
    rows = {(r[1], r[2], r[4]) for r in parse_rdfa(no_vocab, base_iri=B)}
    assert rows == {
        ("http://ex.org/a", "http://www.w3.org/1999/xhtml/vocab#license", "http://ex.org/l"),
    }


def test_hanging_rel_completed_by_descendant_subjects():
    """§7.5 steps 10+12: a hanging @rel stores incomplete triples; EVERY
    descendant that establishes a new subject completes them."""
    html = (
        '<div vocab="http://schema.org/" about="http://ex.org/a" rel="knows">'
        '<span about="http://ex.org/b">b</span>'
        '<span about="http://ex.org/c">c</span></div>'
    )
    rows = {(r[1], r[2], r[4]) for r in parse_rdfa(html, base_iri=B)}
    assert rows == {
        ("http://ex.org/a", S + "knows", "http://ex.org/b"),
        ("http://ex.org/a", S + "knows", "http://ex.org/c"),
    }


def test_hanging_rel_chains_through_minted_bnode():
    """A descendant that merely continues the scope (bare @property) takes
    the step-10 minted bnode as its subject, completing through it."""
    html = (
        '<div vocab="http://schema.org/" about="http://ex.org/a" rel="knows">'
        '<span property="name">Bob</span></div>'
    )
    rows = parse_rdfa(html, base_iri=B)
    knows = next(r for r in rows if r[2] == S + "knows")
    assert knows[3] == "BlankNode"
    vals = _vals(rows)
    assert ("BlankNode", knows[4], S + "name", "Literal", "Bob", None, None) in vals
    assert len(rows) == 2


def test_hanging_rev_reverses_completion():
    html = (
        '<div vocab="http://schema.org/" about="http://ex.org/a" rev="parent">'
        '<span about="http://ex.org/kid">k</span></div>'
    )
    rows = {(r[1], r[2], r[4]) for r in parse_rdfa(html, base_iri=B)}
    assert rows == {("http://ex.org/kid", S + "parent", "http://ex.org/a")}


def test_rel_with_property_drops_terms_keeps_curies():
    """HTML+RDFa 1.1 §3.1: with @property present, TERM values in @rel are
    ignored (the resource then belongs to @property); CURIE/IRI values
    survive and consume the resource, @property falling back to the text
    literal."""
    html = (
        '<div vocab="http://schema.org/" about="http://ex.org/a">'
        '<a rel="knows" property="url" href="http://ex.org/b">b</a></div>'
    )
    rows = {(r[1], r[2], r[3], r[4]) for r in parse_rdfa(html, base_iri=B)}
    assert rows == {("http://ex.org/a", S + "url", "NamedNode", "http://ex.org/b")}
    html = (
        '<div vocab="http://schema.org/" about="http://ex.org/a">'
        '<a rel="foaf:knows" property="name" href="http://ex.org/b">Bob</a></div>'
    )
    rows = {(r[1], r[2], r[3], r[4]) for r in parse_rdfa(html, base_iri=B)}
    assert rows == {
        ("http://ex.org/a", "http://xmlns.com/foaf/0.1/knows", "NamedNode", "http://ex.org/b"),
        ("http://ex.org/a", S + "name", "Literal", "Bob"),
    }


def test_inlist_property_builds_rdf_list():
    html = (
        '<div about="http://ex.org/s" prefix="lx: http://lists.example/">'
        '<span inlist property="lx:items" content="one"></span>'
        '<span inlist property="lx:items">two</span>'
        '<link inlist rel="lx:links" href="http://ex.org/o1"></div>'
    )
    rows = parse_rdfa(html, base_iri=B)
    FIRST, REST, NIL = RDF_NS + "first", RDF_NS + "rest", RDF_NS + "nil"
    items_head = next(r[4] for r in rows if r[2] == "http://lists.example/items")
    firsts = {r[1]: r[4] for r in rows if r[2] == FIRST}
    rests = {r[1]: (r[3], r[4]) for r in rows if r[2] == REST}
    assert firsts[items_head] == "one"
    nxt = rests[items_head]
    assert nxt[0] == "BlankNode" and firsts[nxt[1]] == "two"
    assert rests[nxt[1]] == ("NamedNode", NIL)
    links_head = next(r[4] for r in rows if r[2] == "http://lists.example/links")
    assert firsts[links_head] == "http://ex.org/o1"
    assert rests[links_head] == ("NamedNode", NIL)


def test_hanging_rel_inlist_collects_descendant_subjects():
    html = (
        '<div about="http://ex.org/s" inlist rel="http://ex.org/p">'
        '<span about="http://ex.org/x">x</span>'
        '<span about="http://ex.org/y">y</span></div>'
    )
    rows = parse_rdfa(html, base_iri=B)
    FIRST = RDF_NS + "first"
    head = next(r[4] for r in rows if r[2] == "http://ex.org/p")
    firsts = [r[4] for r in rows if r[2] == FIRST]
    assert firsts == ["http://ex.org/x", "http://ex.org/y"]
    assert any(r[1] == head and r[2] == FIRST for r in rows)


def test_hanging_rel_inlist_uncompleted_is_nil():
    html = '<div about="http://ex.org/s" inlist rel="http://ex.org/p"></div>'
    rows = parse_rdfa(html, base_iri=B)
    assert [(r[1], r[2], r[4]) for r in rows] == [
        ("http://ex.org/s", "http://ex.org/p", RDF_NS + "nil")
    ]


def test_xmlliteral_captures_verbatim_inner_markup():
    """Core §7.5 step 11 "as an XML literal": the value is the raw inner
    markup — tags intact, entity references unexpanded — and @content is
    not consulted."""
    rows = parse_rdfa(
        '<div about="http://ex.org/s" property="http://ex.org/p"'
        ' content="IGNORED" datatype="rdf:XMLLiteral">one <b>two</b>'
        " &amp; three</div>",
        base_iri=B,
    )
    assert [(r[1], r[2], r[4], r[5]) for r in rows] == [
        (
            "http://ex.org/s",
            "http://ex.org/p",
            "one <b>two</b> &amp; three",
            RDF_NS + "XMLLiteral",
        )
    ]


def test_xmlliteral_descendants_still_processed():
    """RDFa 1.1 dropped 1.0's descendant suppression: children inside an
    XML literal still emit their own triples, and the literal keeps their
    markup verbatim (including nested same-name tags)."""
    rows = parse_rdfa(
        '<div about="http://ex.org/s" property="http://ex.org/p"'
        ' datatype="rdf:XMLLiteral">a<div property="http://ex.org/q"'
        ' content="c"></div>b</div>',
        base_iri=B,
    )
    assert (
        "http://ex.org/s",
        "http://ex.org/q",
        "c",
    ) in [(r[1], r[2], r[4]) for r in rows]
    xml = next(r for r in rows if r[5] == RDF_NS + "XMLLiteral")
    assert xml[4] == 'a<div property="http://ex.org/q" content="c"></div>b'


def test_xmlliteral_on_void_element_is_empty():
    rows = parse_rdfa(
        '<meta about="http://ex.org/s" property="http://ex.org/p"'
        ' datatype="rdf:XMLLiteral">',
        base_iri=B,
    )
    assert [(r[4], r[5]) for r in rows] == [("", RDF_NS + "XMLLiteral")]


def test_xmlliteral_roundtrips_through_serializer():
    rows = [
        (
            "NamedNode",
            "http://ex.org/s",
            "http://ex.org/p",
            "Literal",
            "one <b>two</b> &amp; x",
            RDF_NS + "XMLLiteral",
            None,
            None,
        )
    ]
    back = parse_rdfa(serialize_rdfa(rows))
    assert [tuple(r[:8]) for r in back] == rows


def test_read_rdf_dispatches_html_e2e(spark, tmp_path):
    doc = tmp_path / "page.html"
    doc.write_text(
        '<div vocab="http://schema.org/" about="http://ex.org/w" typeof="Thing">'
        '<span property="name">W</span></div>'
    )
    rows = {(r.s, r.p, r.o) for r in read_rdf(spark, str(doc)).collect()}
    assert rows == {
        ("http://ex.org/w", RDF_NS + "type", S + "Thing"),
        ("http://ex.org/w", S + "name", "W"),
    }


def test_base_after_meta_rebases_emitted_quads():
    """Legal head order puts metas before <base>; the og:title emitted
    against the original base must be rewritten onto the rebased document
    node (one document node, not two subjects)."""
    html = (
        '<html><head><meta property="og:title" content="T">'
        '<base href="http://moved.org/doc"></head>'
        '<body><span property="foaf:name" about="">N</span></body></html>'
    )
    rows = parse_rdfa(html, base_iri=B)
    assert {r[1] for r in rows} == {"http://moved.org/doc"}


def test_bare_inlist_attr_is_seen_and_builds_list():
    """@inlist is defined by PRESENCE (valueless) — it must be read from
    the raw attribute pairs, not only the value-carrying dict."""
    rows = parse_rdfa(
        '<div vocab="http://schema.org/" about="http://ex.org/s">'
        '<span property="name" inlist>A</span></div>',
        base_iri=B,
    )
    head = next(r[4] for r in rows if r[2] == S + "name" and r[1] == "http://ex.org/s")
    firsts = {r[1]: r[4] for r in rows if r[2] == RDF_NS + "first"}
    assert firsts[head] == "A"
    # a bare/valueless @rel resolves to zero terms → ignored, not an error
    assert parse_rdfa('<a rel href="http://n.org/">n</a>', base_iri=B) == []


def test_typeof_with_about_property_and_resource():
    """@about + @typeof + @property + @resource: RDFa Core types the @about
    resource, @resource is the property's OBJECT, and descendants keep the
    @about subject — §7.5 only makes an object resource the descendants'
    subject from step 6 (@rel/@rev) or step 5.1's typeof-without-about
    case, never from plain @property + @resource."""
    rows = parse_rdfa(
        '<div vocab="http://schema.org/" about="http://ex.org/s"'
        ' typeof="Person" property="knows" resource="http://ex.org/o">'
        '<span property="name">N</span></div>',
        base_iri=B,
    )
    triples = {(r[1], r[2], r[4]) for r in rows}
    assert triples == {
        ("http://ex.org/s", RDF_NS + "type", S + "Person"),
        ("http://ex.org/s", S + "knows", "http://ex.org/o"),
        ("http://ex.org/s", S + "name", "N"),
    }


def test_jsonld_script_islands_merge_with_annotations():
    """rdf-parse's text/html route yields BOTH the RDFa annotations and any
    JSON-LD data islands (JSON-LD 1.1 §HTML content, extractAllScripts):
    islands share ONE authored-bnode scope with each other but are DISJOINT
    from the RDFa scope; non-ld+json scripts are ignored."""
    html = (
        "<html><head>"
        '<script type="application/ld+json">'
        '{"@id": "_:x", "http://schema.org/name": "Island"}'
        "</script>"
        '<script type="application/ld+json">'
        '{"@id": "_:x", "http://schema.org/age":'
        ' {"@value": "30", "@type": "http://www.w3.org/2001/XMLSchema#integer"}}'
        "</script>"
        '<script type="text/javascript">var ld = "{}";</script>'
        "</head><body>"
        '<link about="_:x" property="http://schema.org/seeAlso"'
        ' resource="http://ex.org/more">'
        "</body></html>"
    )
    rows = parse_rdfa(html, base_iri=B)
    by_subj = {}
    for r in rows:
        by_subj.setdefault(r[1], set()).add(r[2])
    # RDFa-scope _:x and island-scope _:x are different blank nodes...
    assert by_subj["b_x"] == {S + "seeAlso"}
    # ...while the two islands share one scope (same subject label)
    assert by_subj["json_b_x"] == {S + "name", S + "age"}
    # seq stays dense and ordered (annotations first, then islands)
    assert [r[8] for r in rows] == list(range(len(rows)))
    # opt-out gives annotations only
    assert len(parse_rdfa(html, base_iri=B, extract_script_jsonld=False)) == 1


def test_jsonld_script_island_malformed_json_fails_fast():
    """Invalid island JSON is a documented loading error (ValueError via
    json.JSONDecodeError), not a silent drop."""
    with pytest.raises(ValueError):
        parse_rdfa(
            '<script type="application/ld+json">{not json}</script>',
            base_iri=B,
        )
