"""Microdata source: the reference's rdf-parse v3 bundles a microdata
parser for text/html next to RDFa (lib/io/QuadSourceFile.ts:19-25); ours
covers the registry-less core of the W3C Microdata-to-RDF note."""

from __future__ import annotations

import pytest

from rdf_dataset_fragmenter_js_spark.sources.microdata import (
    parse_microdata,
    serialize_microdata,
)

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
S = "http://schema.org/"
B = "http://base.org/page"


def _vals(rows):
    return {(r[0], r[1], r[2], r[3], r[4], r[6]) for r in rows}


def test_schema_org_item():
    html = """
    <div itemscope itemtype="http://schema.org/Person" itemid="http://ex.org/me">
      <span itemprop="name">Alice</span>
      <a itemprop="url" href="/home">home</a>
      <img itemprop="image" src="/a.png">
      <meta itemprop="jobTitle" content="Engineer">
      <time itemprop="birthDate" datetime="1990-05-01">May 1990</time>
      <data itemprop="rank" value="3">third</data>
    </div>"""
    vals = _vals(parse_microdata(html, base_iri=B))
    me = "http://ex.org/me"
    assert ("NamedNode", me, RDF_NS + "type", "NamedNode", S + "Person", None) in vals
    assert ("NamedNode", me, S + "name", "Literal", "Alice", None) in vals
    assert ("NamedNode", me, S + "url", "NamedNode", "http://base.org/home", None) in vals
    assert ("NamedNode", me, S + "image", "NamedNode", "http://base.org/a.png", None) in vals
    assert ("NamedNode", me, S + "jobTitle", "Literal", "Engineer", None) in vals
    assert ("NamedNode", me, S + "birthDate", "Literal", "1990-05-01", None) in vals
    assert ("NamedNode", me, S + "rank", "Literal", "3", None) in vals


def test_nested_item_bnode_and_vocab_inheritance():
    html = """
    <div itemscope itemtype="http://schema.org/Book">
      <span itemprop="name">The Book</span>
      <div itemprop="author" itemscope>
        <span itemprop="name">Bob</span>
      </div>
    </div>"""
    rows = parse_microdata(html, base_iri=B)
    author = [r for r in rows if r[2] == S + "author"]
    assert len(author) == 1 and author[0][3] == "BlankNode"
    bnode = author[0][4]
    # the nested untyped item inherits the parent's vocabulary for names
    assert ("BlankNode", bnode, S + "name", "Literal", "Bob", None) in _vals(rows)


def test_absolute_prop_names_lang_and_hash_vocab():
    html = """
    <div itemscope itemtype="http://ex.org/vocab#Thing" lang="en">
      <span itemprop="label">tagged</span>
      <span itemprop="http://other.org/p" lang="de">anders</span>
      <span itemprop="no-vocab-needed">kept</span>
    </div>"""
    rows = parse_microdata(html, base_iri=B)
    vals = _vals(rows)
    item = rows[0][1]
    # '#' vocab: up to and including the hash
    assert (rows[0][0], item, "http://ex.org/vocab#label", "Literal", "tagged", "en") in vals
    assert (rows[0][0], item, "http://other.org/p", "Literal", "anders", "de") in vals
    assert (rows[0][0], item, "http://ex.org/vocab#no-vocab-needed", "Literal", "kept", "en") in vals


def test_itemprop_outside_item_dropped():
    assert parse_microdata('<span itemprop="name">x</span>', base_iri=B) == []


def test_itemref_basic_forward_and_backward():
    """itemref pulls by-id elements into the item's property crawl; names
    resolve against the REFERRING item's vocabulary, and the referenced
    element's own document lang applies."""
    html = """
    <p id="a" itemprop="name" lang="de">Amanda</p>
    <div itemscope itemtype="http://schema.org/Person"
         itemid="http://ex.org/me" itemref="a b missing"></div>
    <div id="b"><meta itemprop="jobTitle" content="Engineer"></div>
    """
    vals = _vals(parse_microdata(html, base_iri=B))
    me = "http://ex.org/me"
    assert ("NamedNode", me, S + "name", "Literal", "Amanda", "de") in vals
    assert ("NamedNode", me, S + "jobTitle", "Literal", "Engineer", None) in vals


def test_itemref_shared_element_two_items_one_generation():
    """Two items referencing the same element both get the property; a
    referenced nested itemscope is the SAME item (one term, one set of
    content triples) for both referrers."""
    html = """
    <div id="x" itemprop="author" itemscope>
      <span itemprop="http://schema.org/name">Bob</span>
    </div>
    <div itemscope itemtype="http://schema.org/Book"
         itemid="http://ex.org/b1" itemref="x"></div>
    <div itemscope itemtype="http://schema.org/Book"
         itemid="http://ex.org/b2" itemref="x"></div>
    """
    rows = parse_microdata(html, base_iri=B)
    authors = [r for r in rows if r[2] == S + "author"]
    assert {r[1] for r in authors} == {"http://ex.org/b1", "http://ex.org/b2"}
    assert len({r[4] for r in authors}) == 1  # one shared item term
    names = [r for r in rows if r[2] == S + "name"]
    assert len(names) == 1 and names[0][4] == "Bob"


def test_itemref_loop_is_dropped_not_infinite():
    """A reference loop (item refers to its own ancestor) is the spec's
    microdata error: the repeated element is skipped, parsing terminates."""
    html = """
    <div id="outer">
      <div itemscope itemtype="http://schema.org/Thing" itemref="outer">
        <span itemprop="name">n</span>
      </div>
    </div>
    """
    rows = parse_microdata(html, base_iri=B)
    names = [r for r in rows if r[2] == S + "name"]
    assert len(names) == 1 and names[0][4] == "n"


def test_serializer_roundtrip_and_rejections():
    rows = [
        ("NamedNode", "http://ex.org/s", RDF_NS + "type", "NamedNode", S + "Thing", None, None, None, 0),
        ("NamedNode", "http://ex.org/s", S + "name", "Literal", 'a "quoted" <name>', None, None, None, 1),
        ("NamedNode", "http://ex.org/s", S + "alt", "Literal", "Name", None, "en", None, 2),
        ("NamedNode", "http://ex.org/s", S + "url", "NamedNode", "http://o.org/", None, None, None, 3),
    ]
    parsed = parse_microdata(serialize_microdata(rows), base_iri=B)
    assert {tuple(r[:7]) for r in parsed} == {tuple(r[:7]) for r in rows}
    with pytest.raises(ValueError, match="cannot express"):
        serialize_microdata(
            [("BlankNode", "b0", S + "name", "Literal", "x", None, None, None, 0)]
        )
    with pytest.raises(ValueError, match="cannot express"):
        serialize_microdata(
            [("NamedNode", "http://s", S + "p", "Literal", "x", "http://dt", None, None, 0)]
        )


def test_config_format_override_e2e(spark, tmp_path):
    """A QuadSourceFile spec with format=microdata routes .html through the
    microdata parser instead of RDFa."""
    from rdf_dataset_fragmenter_js_spark.plans.pipeline import build_source

    doc = tmp_path / "page.html"
    doc.write_text(
        '<div itemscope itemtype="http://schema.org/Thing" itemid="http://ex.org/w">'
        '<span itemprop="name">W</span></div>'
    )
    spec = {
        "@type": "QuadSourceFile",
        "filePath": str(doc),
        "format": "microdata",
    }
    rows = {(r.s, r.p, r.o) for r in build_source(spark, spec).collect()}
    assert rows == {
        ("http://ex.org/w", RDF_NS + "type", S + "Thing"),
        ("http://ex.org/w", S + "name", "W"),
    }


def test_config_unknown_format_rejected(spark, tmp_path):
    """An explicit-but-unknown format must raise, not silently fall back
    to extension dispatch."""
    from rdf_dataset_fragmenter_js_spark.plans.pipeline import build_source

    doc = tmp_path / "p.html"
    doc.write_text("<div itemscope></div>")
    with pytest.raises(ValueError, match="not a recognized override"):
        build_source(
            spark,
            {"@type": "QuadSourceFile", "filePath": str(doc), "format": "Microdata"},
        )
