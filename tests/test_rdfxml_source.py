"""RDF/XML source parity: N-Triples twin equality + feature coverage +
fail-fast on unsupported constructs (the reference delegates .rdf to
rdf-parse, lib/io/QuadSourceFile.ts:19-25)."""

from __future__ import annotations

import pytest

from rdf_dataset_fragmenter_js_spark.sources.nquads import read_nquads, read_rdf
from rdf_dataset_fragmenter_js_spark.sources.rdfxml import parse_rdfxml

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
E = "http://ex.org/"


def test_rdfxml_twin_of_nt(spark, tmp_path):
    nt = tmp_path / "twin.nt"
    nt.write_text(
        f'<{E}a> <{RDF_NS}type> <{E}Person> .\n'
        f'<{E}a> <{E}name> "Alice"@en .\n'
        f'<{E}a> <{E}age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        f'<{E}a> <{E}knows> <{E}b> .\n'
    )
    xml = tmp_path / "twin.rdf"
    xml.write_text(
        f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{E}">\n'
        f'  <ex:Person rdf:about="{E}a" xml:lang="en">\n'
        '    <ex:name>Alice</ex:name>\n'
        f'    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>\n'
        f'    <ex:knows rdf:resource="{E}b"/>\n'
        "  </ex:Person>\n"
        "</rdf:RDF>\n"
    )
    a = sorted(tuple(r)[:7] for r in read_nquads(spark, str(nt)).collect())
    b = sorted(tuple(r)[:7] for r in read_rdf(spark, str(xml)).collect())
    assert a == b


def test_rdfxml_feature_coverage():
    quads = parse_rdfxml(
        f"""
<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{E}" xml:base="http://base.org/dir/x">
  <rdf:Description rdf:about="rel">
    <ex:p rdf:parseType="Resource">
      <ex:inner>v</ex:inner>
    </ex:p>
    <ex:q>
      <ex:Thing rdf:nodeID="n1">
        <ex:r rdf:resource="other"/>
      </ex:Thing>
    </ex:q>
    <ex:attrs ex:k="v2"/>
  </rdf:Description>
  <rdf:Seq rdf:about="http://abs.org/seq">
    <rdf:li>one</rdf:li>
    <rdf:li>two</rdf:li>
  </rdf:Seq>
</rdf:RDF>
"""
    )
    vals = {(q[0], q[1], q[2], q[3], q[4], q[5], q[6]) for q in quads}
    # xml:base resolution of rdf:about / rdf:resource
    s = "http://base.org/dir/rel"
    assert any(q[1] == s and q[2] == E + "p" and q[0] == "NamedNode" for q in quads)
    inner = [q for q in quads if q[2] == E + "inner"]
    assert inner and inner[0][0] == "BlankNode" and inner[0][4] == "v"
    assert ("BlankNode", "b_n1", RDF_NS + "type", "NamedNode", E + "Thing", None, None) in vals
    assert ("BlankNode", "b_n1", E + "r", "NamedNode", "http://base.org/dir/other", None, None) in vals
    # property attributes → anonymous bnode
    attrs = [q for q in quads if q[2] == E + "k"]
    assert attrs and attrs[0][0] == "BlankNode" and attrs[0][4] == "v2"
    # rdf:li numbering + typed node element
    assert ("NamedNode", "http://abs.org/seq", RDF_NS + "type", "NamedNode", RDF_NS + "Seq", None, None) in vals
    assert ("NamedNode", "http://abs.org/seq", RDF_NS + "_1", "Literal", "one", None, None) in vals
    assert ("NamedNode", "http://abs.org/seq", RDF_NS + "_2", "Literal", "two", None, None) in vals


def test_rdfxml_parse_type_literal_xmlliteral():
    quads = parse_rdfxml(
        f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{E}">'
        f'<rdf:Description rdf:about="{E}a">'
        '<ex:p rdf:parseType="Literal">pre<b>x</b>post</ex:p>'
        "</rdf:Description></rdf:RDF>"
    )
    assert len(quads) == 1
    q = quads[0]
    assert q[3] == "Literal" and q[5] == RDF_NS + "XMLLiteral"
    assert q[4] == "pre<b>x</b>post"


def test_rdfxml_fail_fast():
    with pytest.raises(NotImplementedError, match="parseType"):
        parse_rdfxml(
            f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{E}">'
            f'<rdf:Description rdf:about="{E}a">'
            '<ex:p rdf:parseType="Other">x</ex:p>'
            "</rdf:Description></rdf:RDF>"
        )
    with pytest.raises(ValueError, match="un-namespaced"):
        parse_rdfxml(f'<rdf:RDF xmlns:rdf="{RDF_NS}"><Thing/></rdf:RDF>')


def test_rdfxml_config_end_to_end(spark, tmp_path):
    from rdf_dataset_fragmenter_js_spark.plans.pipeline import compile_pipeline

    xml = tmp_path / "data.rdf"
    xml.write_text(
        f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{E}">'
        f'<rdf:Description rdf:about="{E}a"><ex:p rdf:resource="{E}b"/></rdf:Description>'
        "</rdf:RDF>"
    )
    spec = {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(xml)},
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
    }
    got = [(r.doc, r.s, r.p, r.o) for r in compile_pipeline(spark, spec).collect()]
    assert got == [(E + "a", E + "a", E + "p", E + "b")]


def test_rdfxml_scoped_base_and_lang_reset():
    """Review regressions: a RELATIVE xml:base resolves against the
    in-scope base (XML Base §4.3); xml:lang='' cancels inheritance; mixed
    resource/text content fails fast instead of dropping triples."""
    quads = parse_rdfxml(
        f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{E}" xml:base="http://b.org/data/" xml:lang="en">'
        f'<rdf:Description xml:base="items/" rdf:about="i1">'
        f'<ex:p rdf:resource="j2"/>'
        '<ex:name xml:lang="">plain</ex:name>'
        "</rdf:Description></rdf:RDF>"
    )
    vals = {(q[1], q[2], q[4], q[6]) for q in quads}
    assert ("http://b.org/data/items/i1", E + "p", "http://b.org/data/items/j2", None) in vals
    name = [q for q in quads if q[2] == E + "name"]
    assert name[0][6] is None  # xml:lang="" resets; no empty-string tag

    with pytest.raises(ValueError, match="mixes"):
        parse_rdfxml(
            f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{E}">'
            f'<rdf:Description rdf:about="{E}a"><ex:p rdf:resource="{E}x">text</ex:p></rdf:Description>'
            "</rdf:RDF>"
        )


def test_driver_sources_accept_globs_and_dirs(spark, tmp_path):
    """read_turtle/read_rdfxml accept globs and directories like the
    N-Quads reader (review finding), with seq re-indexed across files."""
    d = tmp_path / "ttls"
    d.mkdir()
    (d / "a.ttl").write_text("<http://s1> <http://p> <http://o> .")
    (d / "b.ttl").write_text("<http://s2> <http://p> <http://o> .")
    rows = read_rdf(spark, str(d / "*.ttl")).collect()
    assert {r.s for r in rows} == {"http://s1", "http://s2"}
    assert len({r.seq for r in rows}) == 2  # re-indexed, not colliding

    from rdf_dataset_fragmenter_js_spark.sources.turtle import read_turtle

    assert read_turtle(spark, str(d)).count() == 2  # directory expansion


def test_rdfxml_property_reification():
    """rdf:ID on a property element reifies the statement (RDF/XML §7.3):
    base triple + rdf:Statement/subject/predicate/object quads, with the
    statement IRI resolved against the in-scope base."""
    xml = (
        f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{E}" xml:base="http://b.org/doc">'
        f'<rdf:Description rdf:about="{E}s">'
        f'<ex:p rdf:ID="st1" rdf:resource="{E}o"/>'
        f'<ex:q rdf:ID="st2">hello</ex:q>'
        "</rdf:Description></rdf:RDF>"
    )
    vals = {(q[0], q[1], q[2], q[3], q[4], q[5]) for q in parse_rdfxml(xml)}
    st1, st2 = "http://b.org/doc#st1", "http://b.org/doc#st2"
    assert ("NamedNode", E + "s", E + "p", "NamedNode", E + "o", None) in vals
    assert ("NamedNode", st1, RDF_NS + "type", "NamedNode", RDF_NS + "Statement", None) in vals
    assert ("NamedNode", st1, RDF_NS + "subject", "NamedNode", E + "s", None) in vals
    assert ("NamedNode", st1, RDF_NS + "predicate", "NamedNode", E + "p", None) in vals
    assert ("NamedNode", st1, RDF_NS + "object", "NamedNode", E + "o", None) in vals
    assert ("NamedNode", st2, RDF_NS + "object", "Literal", "hello", None) in vals
    assert len(vals) == 10  # 2 base triples + 4 reification quads each
