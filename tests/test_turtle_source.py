"""Turtle source parity: the reference delegates .ttl to rdf-parse
(lib/io/QuadSourceFile.ts:19-25); our driver-side parser must produce the
same quad multisets as the N-Quads twin and run end-to-end from a config."""

from __future__ import annotations

import pytest

from rdf_dataset_fragmenter_js_spark.sources.nquads import read_nquads, read_rdf
from rdf_dataset_fragmenter_js_spark.sources.turtle import parse_turtle

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _vals(rows):
    return sorted((r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows)


def test_turtle_twin_of_reference_fixture(spark, tmp_path):
    """The reference jest fixture (test/unit/io/rdf_files/test.nt) and its
    Turtle twin parse to identical quad multisets."""
    nt = tmp_path / "test.nt"
    nt.write_text(
        "<http://one.example/subject1> <http://one.example/predicate1> <http://one.example/object1> .\n"
        '_:subject1 <http://an.example/predicate1> "object1" .\n'
        '_:subject2 <http://an.example/predicate2> "object2" .\n'
    )
    ttl = tmp_path / "test.ttl"
    ttl.write_text(
        "@prefix one: <http://one.example/> .\n"
        "@prefix an: <http://an.example/> .\n"
        "one:subject1 one:predicate1 one:object1 .\n"
        '_:subject1 an:predicate1 "object1" .\n'
        '_:subject2 an:predicate2 "object2" .\n'
    )
    a = _vals(tuple(r)[:8] for r in read_nquads(spark, str(nt)).collect())
    # The Turtle parser maps authored labels into the disjoint 'b_' namespace
    # (collision-proof vs generated 'genid_ttl_N'); bnode labels are
    # document-scoped, so compare modulo that bijective rename.
    def _debnode(r):
        s = r[1][2:] if r[0] == "BlankNode" and r[1].startswith("b_") else r[1]
        o = r[4][2:] if r[3] == "BlankNode" and r[4].startswith("b_") else r[4]
        return (r[0], s, r[2], r[3], o, r[5], r[6], r[7])
    b = _vals(_debnode(tuple(r)[:8]) for r in read_rdf(spark, str(ttl)).collect())
    assert a == b


def test_turtle_feature_coverage():
    quads = parse_turtle(
        """
@prefix ex: <http://ex.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@base <http://base.org/dir/> .
PREFIX sp: <http://sparql.example/>

ex:s a ex:T ;                       # 'a' + predicate-object list
     ex:num 42, 3.14, 1.0e3 ;      # object list + numeric shorthands
     ex:flag true ;
     ex:lang "bonjour"@fr ;
     ex:typed "5"^^xsd:byte ;
     ex:long \"\"\"multi
line \\"quoted\\"\"\"\" ;
     ex:rel <child> .               # relative IRI vs @base
<../up> sp:p [ ex:inner "x" ; ex:inner2 ex:v ] .
ex:list ex:items ( ex:a "b" 3 ) .
ex:empty ex:items () .
_:named ex:p ex:o .
""",
        base_iri="http://ignored.example/",
    )
    vals = {(q[0], q[1], q[2], q[3], q[4], q[5], q[6]) for q in quads}
    E = "http://ex.org/"
    assert ("NamedNode", E + "s", RDF_NS + "type", "NamedNode", E + "T", None, None) in vals
    assert ("NamedNode", E + "s", E + "num", "Literal", "42", XSD + "integer", None) in vals
    assert ("NamedNode", E + "s", E + "num", "Literal", "3.14", XSD + "decimal", None) in vals
    assert ("NamedNode", E + "s", E + "num", "Literal", "1.0e3", XSD + "double", None) in vals
    assert ("NamedNode", E + "s", E + "flag", "Literal", "true", XSD + "boolean", None) in vals
    assert ("NamedNode", E + "s", E + "lang", "Literal", "bonjour", None, "fr") in vals
    assert ("NamedNode", E + "s", E + "typed", "Literal", "5", XSD + "byte", None) in vals
    assert ("NamedNode", E + "s", E + "long", "Literal", 'multi\nline "quoted"', None, None) in vals
    # relative IRIs resolve against the ACTIVE @base, not the initial one
    assert ("NamedNode", E + "s", E + "rel", "NamedNode", "http://base.org/dir/child", None, None) in vals
    up = [q for q in quads if q[1] == "http://base.org/up"]
    assert up and up[0][2] == "http://sparql.example/p" and up[0][3] == "BlankNode"
    inner_b = up[0][4]
    assert ("BlankNode", inner_b, E + "inner", "Literal", "x", None, None) in vals
    assert ("BlankNode", inner_b, E + "inner2", "NamedNode", E + "v", None, None) in vals
    # collection → rdf:first/rest chain ending in rdf:nil
    firsts = [q for q in quads if q[2] == RDF_NS + "first"]
    assert [(q[3], q[4]) for q in firsts] == [
        ("NamedNode", E + "a"), ("Literal", "b"), ("Literal", "3")
    ]
    rests = [q for q in quads if q[2] == RDF_NS + "rest"]
    assert sum(1 for q in rests if q[4] == RDF_NS + "nil") == 1
    assert ("NamedNode", E + "empty", E + "items", "NamedNode", RDF_NS + "nil", None, None) in vals
    assert ("BlankNode", "b_named", E + "p", "NamedNode", E + "o", None, None) in vals


def test_turtle_errors():
    with pytest.raises(ValueError, match="undefined prefix"):
        parse_turtle("nope:s <http://p> <http://o> .")
    with pytest.raises(ValueError, match="unterminated string"):
        parse_turtle('<http://s> <http://p> "oops .')
    with pytest.raises(ValueError, match="expected '\\.'"):
        parse_turtle("<http://s> <http://p> <http://o>")


def test_base_iri_option_nquads(spark, tmp_path):
    """The reference's baseIRI source option (QuadSourceFile.ts:12,35-37)
    resolves relative IRIs in line-based files — natively, no UDF."""
    nt = tmp_path / "rel.nt"
    nt.write_text(
        "<a> <http://p.org/p> <../b> .\n"
        '<http://abs.org/s> <http://p.org/p> "lit" .\n'
    )
    rows = read_nquads(spark, str(nt), base_iri="http://base.org/x/y/").collect()
    vals = {(r.s, r.p, r.o) for r in rows}
    assert ("http://base.org/x/y/a", "http://p.org/p", "http://base.org/x/b") in vals
    assert ("http://abs.org/s", "http://p.org/p", "lit") in vals


def test_turtle_config_end_to_end(spark, tmp_path):
    """A ported config pointing at a .ttl source runs the full pipeline."""
    from rdf_dataset_fragmenter_js_spark.plans.pipeline import compile_pipeline

    ttl = tmp_path / "data.ttl"
    ttl.write_text(
        "@prefix ex: <http://example.org/> .\n"
        "ex:a ex:p ex:b ; ex:q ex:c .\n"
        "ex:b ex:p ex:a .\n"
    )
    spec = {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(ttl)},
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
    }
    routed = compile_pipeline(spark, spec)
    got = sorted((r.doc, r.s, r.p, r.o) for r in routed.collect())
    E = "http://example.org/"
    assert got == sorted(
        [
            (E + "a", E + "a", E + "p", E + "b"),
            (E + "a", E + "a", E + "q", E + "c"),
            (E + "b", E + "b", E + "p", E + "a"),
        ]
    )


def test_turtle_lexer_edge_cases():
    """Regression coverage for lexer edges found in review: statement dot
    glued to names/numbers, long strings ending in quotes, generated bnode
    labels disjoint from document labels."""
    E = "http://ex.org/"
    # no space before the terminating dot — PN_LOCAL/labels/numbers must
    # not swallow it
    quads = parse_turtle(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:s ex:p ex:o.\n"
        "ex:s ex:n 1.\n"
        "ex:s ex:d 1.5.\n"
        "_:b1 ex:p ex:o2.\n"
        "ex:s ex:b _:b2.\n"
    )
    vals = {(q[0], q[1], q[2], q[3], q[4], q[5]) for q in quads}
    assert ("NamedNode", E + "s", E + "p", "NamedNode", E + "o", None) in vals
    assert ("NamedNode", E + "s", E + "n", "Literal", "1", XSD + "integer") in vals
    assert ("NamedNode", E + "s", E + "d", "Literal", "1.5", XSD + "decimal") in vals
    assert ("BlankNode", "b_b1", E + "p", "NamedNode", E + "o2", None) in vals
    assert ("NamedNode", E + "s", E + "b", "BlankNode", "b_b2", None) in vals

    # long string whose content ends in quote characters (maximal munch)
    quads = parse_turtle('<http://s> <http://p> """abc"""" .')
    assert quads[0][4] == 'abc"'
    quads = parse_turtle('<http://s> <http://p> """abc""""" .')
    assert quads[0][4] == 'abc""'

    # generated labels stay distinct from authored ones and use only
    # PN_CHARS (so the N-Quads sink can serialize them for conformant
    # downstream parsers — no '!' or other illegal label characters)
    quads = parse_turtle(
        "@prefix ex: <http://ex.org/> .\n"
        "_:genid1 ex:p [ ex:q ex:v ] .\n"
    )
    labels = {q[1] for q in quads if q[0] == "BlankNode"}
    gen = {l for l in labels if l != "b_genid1"}  # authored '_:genid1' → 'b_genid1'
    assert len(gen) == 1
    import re

    assert re.fullmatch(r"[A-Za-z0-9_]+", next(iter(gen)))

    # adversarial: a document authoring the generator's own label pattern
    # must NOT merge with an anonymous bnode (authored → 'b_' namespace)
    quads = parse_turtle(
        "@prefix ex: <http://ex.org/> .\n"
        "_:genid_ttl_1 ex:p [ ex:q ex:v ] .\n"
    )
    labels = {q[1] for q in quads if q[0] == "BlankNode"}
    assert labels == {"b_genid_ttl_1", "genid_ttl_1"}


# -- TriG (graph blocks; W3C TriG is a syntactic superset of Turtle) --------


def test_trig_graph_blocks():
    quads = parse_turtle(
        """
@prefix ex: <http://ex.org/> .
ex:s0 ex:p ex:o0 .                      # top-level → default graph
GRAPH ex:g1 { ex:s1 ex:p ex:o1 . ex:s2 ex:p ex:o2 }
ex:g2 { ex:s3 ex:p ex:o3 }              # label without GRAPH keyword
{ ex:s4 ex:p ex:o4 . }                  # anonymous → default graph
graph ex:g3 { ex:s5 ex:p [ ex:q ex:v ] }
"""
    )
    E = "http://ex.org/"
    by_s = {q[1]: q[7] for q in quads if q[2] == E + "p"}
    assert by_s[E + "s0"] is None
    assert by_s[E + "s1"] == E + "g1"
    assert by_s[E + "s2"] == E + "g1"  # optional final '.' before '}'
    assert by_s[E + "s3"] == E + "g2"
    assert by_s[E + "s4"] is None
    assert by_s[E + "s5"] == E + "g3"  # case-insensitive keyword
    # quads emitted INSIDE the bnode property list inherit the block graph
    inner = [q for q in quads if q[2] == E + "q"]
    assert inner and inner[0][7] == E + "g3"
    # graph resets after each block
    assert parse_turtle("<http://s> <http://p> <http://o> .")[0][7] is None


def test_trig_bnode_graph_labels():
    """Blank-node graph labels encode in-band as '_:<label>' in the g
    column (quads.py) — GRAPH _:b, bare _:b { }, and ANON [] { } forms."""
    q = parse_turtle("GRAPH _:g { <http://s> <http://p> <http://o> . }")
    assert [r[7] for r in q] == ["_:b_g"]
    q = parse_turtle("_:g { <http://s> <http://p> <http://o> . }")
    assert [r[7] for r in q] == ["_:b_g"]
    q = parse_turtle(
        "GRAPH [] { <http://s> <http://p> <http://o> . }\n"
        "[] { <http://s2> <http://p> <http://o2> . }\n"
    )
    gs = [r[7] for r in q]
    assert all(g.startswith("_:genid_ttl_") for g in gs) and gs[0] != gs[1]
    # a bare '[] :p :o .' subject (empty ANON property list) still parses
    # as a triple, not a graph block
    q = parse_turtle("[] <http://p> <http://o> .")
    assert q[0][0] == "BlankNode" and q[0][7] is None
    # same authored label: s/o occurrences and the graph label are the
    # SAME blank node (modulo the in-band '_:' marker)
    q = parse_turtle(
        "_:g <http://p> <http://o> .\n_:g { <http://s> <http://p> <http://o> . }"
    )
    assert q[0][1] == "b_g" and q[1][7] == "_:b_g"


def test_trig_errors():
    with pytest.raises(ValueError, match="unterminated|expected"):
        parse_turtle("GRAPH <http://g> { <http://s> <http://p> <http://o> .")
    # GRAPH as a prefixed name must still parse as a subject
    quads = parse_turtle(
        "@prefix GRAPH: <http://kw.org/> .\nGRAPH:s GRAPH:p GRAPH:o .\n"
    )
    assert quads[0][1] == "http://kw.org/s"


def test_trig_dispatch_e2e(spark, tmp_path):
    p = tmp_path / "d.trig"
    p.write_text(
        "@prefix ex: <http://ex.org/> .\n"
        "GRAPH ex:g { ex:s ex:p ex:o . }\n"
        "ex:s2 ex:p ex:o2 .\n"
    )
    rows = {(r.s, r.g) for r in read_rdf(spark, str(p)).collect()}
    assert rows == {
        ("http://ex.org/s", "http://ex.org/g"),
        ("http://ex.org/s2", None),
    }


def test_n3_turtle_subset():
    from rdf_dataset_fragmenter_js_spark.sources.turtle import parse_n3

    quads = parse_n3(
        "@prefix ex: <http://ex.org/> .\n"
        "# a comment with {braces} and =>\n"
        'ex:s a ex:T ; ex:name "curly {brace} and = inside" ; ex:next ( 1 2 ) .\n'
    )
    vals = {(q[1], q[2], q[4]) for q in quads}
    assert ("http://ex.org/s", "http://ex.org/name", "curly {brace} and = inside") in vals
    assert any(q[2].endswith("#first") for q in quads)


def test_n3_formulas_implications_and_sameas():
    """N3 formulas project onto quads the way n3.js does: contents quoted
    into a fresh bnode-named graph ('_:<label>' in g), the formula term
    participating in the outer statement as that bnode; '=>' / '<=' are
    log:implies (reversed for '<='); '=' is owl:sameAs."""
    from rdf_dataset_fragmenter_js_spark.sources.turtle import parse_n3

    LOG = "http://www.w3.org/2000/10/swap/log#"
    OWL = "http://www.w3.org/2002/07/owl#"
    base = "@prefix ex: <http://ex.org/> .\n"

    q = parse_n3(base + "ex:x ex:says { ex:a ex:b ex:c . ex:d ex:e ex:f } .\n")
    says = next(r for r in q if r[2] == "http://ex.org/says")
    assert says[3] == "BlankNode"
    inner = [r for r in q if r[7] == "_:" + says[4]]
    assert {(r[1], r[4]) for r in inner} == {
        ("http://ex.org/a", "http://ex.org/c"),
        ("http://ex.org/d", "http://ex.org/f"),
    }

    q = parse_n3(base + "{ ex:p ex:q ex:r } => { ex:s ex:t ex:u } .\n")
    imp = next(r for r in q if r[2] == LOG + "implies")
    assert ("http://ex.org/p", "_:" + imp[1]) in {(r[1], r[7]) for r in q}
    assert ("http://ex.org/s", "_:" + imp[4]) in {(r[1], r[7]) for r in q}

    # '<=' states the converse: consequent <= antecedent
    q = parse_n3(base + "{ ex:h ex:i ex:j } <= { ex:k ex:l ex:m } .\n")
    imp = next(r for r in q if r[2] == LOG + "implies")
    assert ("http://ex.org/k", "_:" + imp[1]) in {(r[1], r[7]) for r in q}
    assert ("http://ex.org/h", "_:" + imp[4]) in {(r[1], r[7]) for r in q}

    q = parse_n3(base + "ex:x = ex:y .\n")
    assert [(r[1], r[2], r[4]) for r in q] == [
        ("http://ex.org/x", OWL + "sameAs", "http://ex.org/y")
    ]


def test_n3_quantification_fails_fast():
    import pytest as _pytest

    from rdf_dataset_fragmenter_js_spark.sources.turtle import parse_n3

    base = "@prefix ex: <http://ex.org/> .\n"
    for doc, tok in [
        (base + "@forAll ex:x .\n", "@forAll"),
        (base + "@forSome ex:x .\n", "@forSome"),
        (base + "?x ex:b ex:c .\n", "variable"),
        ("@keywords a .\n", "@keywords"),
    ]:
        with _pytest.raises(NotImplementedError, match=tok):
            parse_n3(doc)


def test_n3_dispatch_e2e(spark, tmp_path):
    p = tmp_path / "d.n3"
    p.write_text(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:s ex:p ex:o .\n"
        'ex:s2 ex:p "lit"@en .\n'
    )
    rows = {(r.s, r.o, r.o_lang) for r in read_rdf(spark, str(p)).collect()}
    assert rows == {
        ("http://ex.org/s", "http://ex.org/o", None),
        ("http://ex.org/s2", "lit", "en"),
    }


def test_n3_pn_local_escapes_not_flagged():
    """PN_LOCAL escapes (ex:a\\=b is legal Turtle) must not trip the
    N3-only-token pre-scan."""
    from rdf_dataset_fragmenter_js_spark.sources.turtle import parse_n3

    quads = parse_n3("@prefix ex: <http://ex.org/> .\nex:a\\=b ex:p ex:o .\n")
    assert quads[0][1] == "http://ex.org/a=b"
