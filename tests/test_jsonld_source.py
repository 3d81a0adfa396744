"""JSON-LD source parity: the reference delegates .jsonld to rdf-parse
(lib/io/QuadSourceFile.ts:19-25); our parser must produce the same quad
multisets as the Turtle/N-Quads twins and run end-to-end from a config."""

from __future__ import annotations

import pytest

from rdf_dataset_fragmenter_js_spark.sources.jsonld import parse_jsonld
from rdf_dataset_fragmenter_js_spark.sources.nquads import read_rdf
from rdf_dataset_fragmenter_js_spark.sources.turtle import parse_turtle

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
E = "http://ex.org/"


def _vals(rows):
    return sorted((r[0], r[1], r[2], r[3], r[4], r[5], r[6], r[7]) for r in rows)


def test_expanded_form_basics():
    doc = """[
      {"@id": "http://ex.org/s",
       "@type": ["http://ex.org/T"],
       "http://ex.org/name": [{"@value": "Alice", "@language": "en"}],
       "http://ex.org/age": [{"@value": 30}],
       "http://ex.org/knows": [{"@id": "http://ex.org/o"}]}
    ]"""
    vals = {(q[0], q[1], q[2], q[3], q[4], q[5], q[6]) for q in parse_jsonld(doc)}
    assert ("NamedNode", E + "s", RDF_NS + "type", "NamedNode", E + "T", None, None) in vals
    assert ("NamedNode", E + "s", E + "name", "Literal", "Alice", None, "en") in vals
    assert ("NamedNode", E + "s", E + "age", "Literal", "30", XSD + "integer", None) in vals
    assert ("NamedNode", E + "s", E + "knows", "NamedNode", E + "o", None, None) in vals


def test_compacted_matches_turtle_twin():
    doc = """{
      "@context": {
        "ex": "http://ex.org/",
        "name": "http://ex.org/name",
        "knows": {"@id": "http://ex.org/knows", "@type": "@id"},
        "tags": {"@id": "http://ex.org/tags", "@container": "@list"},
        "score": {"@id": "http://ex.org/score", "@type": "http://www.w3.org/2001/XMLSchema#decimal"}
      },
      "@id": "ex:alice",
      "@type": "ex:Person",
      "name": "Alice",
      "knows": "ex:bob",
      "score": "9.5",
      "tags": ["x", "y"]
    }"""
    ttl = (
        "@prefix ex: <http://ex.org/> .\n"
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        "ex:alice a ex:Person ;\n"
        '  ex:name "Alice" ;\n'
        "  ex:knows ex:bob ;\n"
        '  ex:score "9.5"^^xsd:decimal ;\n'
        '  ex:tags ( "x" "y" ) .\n'
    )

    def canon(rows):
        mapping: dict[str, str] = {}

        def m(t, v):
            return mapping.setdefault(v, f"c{len(mapping)}") if t == "BlankNode" else v

        return sorted(
            (r[0], m(r[0], r[1]), r[2], r[3], m(r[3], r[4]), r[5], r[6], r[7])
            for r in rows
        )

    assert canon(parse_jsonld(doc)) == canon(parse_turtle(ttl))


def test_vocab_base_graph_and_bnodes():
    doc = """{
      "@context": {"@vocab": "http://vocab.org/", "@base": "http://base.org/"},
      "@id": "http://ex.org/g1",
      "@graph": [
        {"@id": "rel", "p": {"@value": "v"}},
        {"@id": "_:b0", "p": {"@id": "_:b1"}}
      ]
    }"""
    vals = {(q[0], q[1], q[2], q[3], q[4], q[7]) for q in parse_jsonld(doc)}
    assert ("NamedNode", "http://base.org/rel", "http://vocab.org/p", "Literal", "v", "http://ex.org/g1") in vals
    assert ("BlankNode", "b_b0", "http://vocab.org/p", "BlankNode", "b_b1", "http://ex.org/g1") in vals


def test_nested_nodes_and_doubles():
    doc = """{
      "@context": {"ex": "http://ex.org/"},
      "@id": "ex:s",
      "ex:child": {"ex:weight": 1.5, "ex:flag": true}
    }"""
    rows = parse_jsonld(doc)
    vals = {(q[2], q[3], q[4], q[5]) for q in rows}
    assert (E + "weight", "Literal", "1.5E0", XSD + "double") in vals
    assert (E + "flag", "Literal", "true", XSD + "boolean") in vals
    child = [q for q in rows if q[2] == E + "child"]
    assert len(child) == 1 and child[0][3] == "BlankNode"


def test_exotic_features_fail_fast():
    with pytest.raises(NotImplementedError, match="remote @context"):
        parse_jsonld('{"@context": "http://schema.org/", "@id": "http://s"}')
    with pytest.raises(NotImplementedError, match="@container combination"):
        parse_jsonld(
            '{"@context": {"p": {"@id": "http://p",'
            ' "@container": ["@language", "@id"]}},'
            ' "@id": "http://s", "p": {"http://g": {"http://q": "v"}}}'
        )


RDF_JSON = "http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON"


def test_json_literals_jcs_canonical():
    # term-coerced @json: the WHOLE raw value is ONE rdf:JSON literal,
    # keys JCS-sorted, numbers in ECMAScript form (RFC 8785)
    rows = parse_jsonld(
        '{"@context": {"p": {"@id": "http://p", "@type": "@json"}},'
        ' "@id": "http://s", "p": {"b": 1e21, "a": [true, null, 100.0]}}'
    )
    assert rows == [(
        "NamedNode", "http://s", "http://p",
        "Literal", '{"a":[true,null,100],"b":1e+21}', RDF_JSON, None, None, 0,
    )]
    # an array under a @json term is the literal's content, not a value list
    rows = parse_jsonld(
        '{"@context": {"p": {"@id": "http://p", "@type": "@json"}},'
        ' "@id": "http://s", "p": [1, 2]}'
    )
    assert [(r[3], r[4], r[5]) for r in rows] == [("Literal", "[1,2]", RDF_JSON)]
    # value-object form, incl. null (which JCS-serializes, not null-drops)
    rows = parse_jsonld(
        '{"@id": "http://s", "http://p": {"@value": null, "@type": "@json"}}'
    )
    assert [(r[4], r[5]) for r in rows] == [("null", RDF_JSON)]


def test_direction_accepted_and_dropped():
    # toRDF default mode (rdfDirection null): @direction in the context,
    # in term definitions, and in value objects is dropped — language tags
    # survive untouched
    rows = parse_jsonld(
        '{"@context": {"@language": "en", "@direction": "rtl",'
        ' "t": {"@id": "http://t", "@language": "de", "@direction": "ltr"}},'
        ' "@id": "http://s", "t": "hallo",'
        ' "http://q": {"@value": "hi", "@language": "en", "@direction": "rtl"}}'
    )
    assert {(r[2], r[4], r[6]) for r in rows} == {
        ("http://t", "hallo", "de"),
        ("http://q", "hi", "en"),
    }


def test_graph_container():
    # each value of a @graph-container term lands in a FRESH bnode-named
    # graph, linked from the subject by the term's predicate
    rows = parse_jsonld(
        '{"@context": {"claims": {"@id": "http://claims",'
        ' "@container": ["@graph", "@set"]}},'
        ' "@id": "http://s",'
        ' "claims": [{"@id": "http://n1", "http://p": "v1"},'
        '            {"@graph": {"@id": "http://n2", "http://p": "v2"}}]}'
    )
    links = [r for r in rows if r[2] == "http://claims"]
    assert len(links) == 2 and all(r[3] == "BlankNode" for r in links)
    inner = {r[1]: r[7] for r in rows if r[2] == "http://p"}
    # the inner triples sit inside the graphs named by those two bnodes
    assert inner == {
        "http://n1": "_:" + links[0][4],
        "http://n2": "_:" + links[1][4],
    }
    assert links[0][4] != links[1][4]


def test_graph_id_container_map():
    # ["@graph", "@id"]: map keys NAME the graphs (IRI or bnode); @none
    # falls back to a fresh bnode graph like plain @graph
    rows = parse_jsonld(
        '{"@context": {"claims": {"@id": "http://claims",'
        ' "@container": ["@graph", "@id"]}},'
        ' "@id": "http://s",'
        ' "claims": {'
        '   "http://g1": {"@id": "http://n1", "http://p": "v1"},'
        '   "_:gb":      {"@id": "http://n2", "http://p": "v2"},'
        '   "@none":     {"@id": "http://n3", "http://p": "v3"}}}'
    )
    links = {(r[3], r[4]) for r in rows if r[2] == "http://claims"}
    inner = {r[1]: (r[4], r[7]) for r in rows if r[2] == "http://p"}
    assert inner["http://n1"] == ("v1", "http://g1")
    assert ("NamedNode", "http://g1") in links
    # the bnode key names the graph AND is linked from the subject
    g2 = inner["http://n2"][1]
    assert g2.startswith("_:") and ("BlankNode", g2[2:]) in links
    # @none gets a fresh bnode graph, also linked
    g3 = inner["http://n3"][1]
    assert g3.startswith("_:") and ("BlankNode", g3[2:]) in links and g3 != g2


def test_graph_index_container_map():
    # ["@graph", "@index"]: keys are semantics-free indexes; each value
    # becomes a fresh-bnode-named graph linked from the subject
    rows = parse_jsonld(
        '{"@context": {"claims": {"@id": "http://claims",'
        ' "@container": ["@graph", "@index", "@set"]}},'
        ' "@id": "http://s",'
        ' "claims": {"a": {"@id": "http://n1", "http://p": "v1"},'
        '            "b": [{"@id": "http://n2", "http://p": "v2"}]}}'
    )
    links = [r for r in rows if r[2] == "http://claims"]
    assert len(links) == 2 and all(r[3] == "BlankNode" for r in links)
    inner = {r[1]: r[7] for r in rows if r[2] == "http://p"}
    assert set(inner.values()) == {"_:" + r[4] for r in links}
    assert len(set(inner.values())) == 2


def test_reverse_node_key_and_term():
    # node-level @reverse: the VALUE is the triple's subject
    rows = parse_jsonld(
        '{"@id": "http://ex.org/s",'
        ' "@reverse": {"http://ex.org/parentOf": [{"@id": "http://ex.org/o"},'
        '   {"@id": "http://ex.org/o2", "http://ex.org/name": "kid"}]}}'
    )
    vals = {(q[1], q[2], q[4]) for q in rows}
    assert (E + "o", E + "parentOf", E + "s") in vals
    assert (E + "o2", E + "parentOf", E + "s") in vals
    assert (E + "o2", E + "name", "kid") in vals
    # term-level {"@reverse": ...} definition, compacted usage
    rows = parse_jsonld(
        '{"@context": {"children": {"@reverse": "http://ex.org/parentOf"}},'
        ' "@id": "http://ex.org/mom", "children": [{"@id": "http://ex.org/kid"}]}'
    )
    assert {(q[1], q[2], q[4]) for q in rows} == {(E + "kid", E + "parentOf", E + "mom")}
    # literals cannot be reversed
    with pytest.raises(ValueError, match="reverse"):
        parse_jsonld('{"@id": "http://s", "@reverse": {"http://p": [{"@value": "x"}]}}')


def test_language_container_map():
    rows = parse_jsonld(
        '{"@context": {"label": {"@id": "http://ex.org/label",'
        ' "@container": "@language"}},'
        ' "@id": "http://ex.org/s",'
        ' "label": {"en": "tree", "de": ["Baum", "Strauch"], "@none": "X"}}'
    )
    vals = {(q[4], q[6]) for q in rows}
    assert vals == {("tree", "en"), ("Baum", "de"), ("Strauch", "de"), ("X", None)}


def test_language_map_keys_lowercased():
    """The expansion algorithm lowercases language-map KEYS — 'EN-US' must
    come out as the 'en-us' tag (exact-value parity with the reference
    parser's toRDF output)."""
    rows = parse_jsonld(
        '{"@context": {"label": {"@id": "http://ex.org/label",'
        ' "@container": "@language"}},'
        ' "@id": "http://ex.org/s",'
        ' "label": {"EN-US": "tree"}}'
    )
    assert {(q[4], q[6]) for q in rows} == {("tree", "en-us")}


def test_id_and_type_container_maps():
    rows = parse_jsonld(
        '{"@context": {"ex": "http://ex.org/",'
        ' "post": {"@id": "http://ex.org/post", "@container": "@id"},'
        ' "by": {"@id": "http://ex.org/by", "@container": ["@type", "@set"]}},'
        ' "@id": "ex:s",'
        ' "post": {"ex:p1": {"http://ex.org/title": "one"},'
        '          "@none": {"http://ex.org/title": "anon"}},'
        ' "by": {"ex:Person": {"@id": "ex:alice"}}}'
    )
    vals = {(q[0], q[1], q[2], q[3], q[4]) for q in rows}
    assert ("NamedNode", E + "p1", E + "title", "Literal", "one") in vals
    assert ("NamedNode", E + "s", E + "post", "NamedNode", E + "p1") in vals
    # @none key → no injected @id: the node stays anonymous
    anon = [q for q in rows if q[4] == "anon"]
    assert len(anon) == 1 and anon[0][0] == "BlankNode"
    assert ("NamedNode", E + "alice", RDF_NS + "type", "NamedNode", E + "Person") in vals
    assert ("NamedNode", E + "s", E + "by", "NamedNode", E + "alice") in vals


def test_nest_keyword_and_alias():
    rows = parse_jsonld(
        '{"@id": "http://ex.org/s",'
        ' "@nest": {"http://ex.org/a": "va", "http://ex.org/b": {"@value": "vb"}}}'
    )
    assert {(q[1], q[2], q[4]) for q in rows} == {
        (E + "s", E + "a", "va"),
        (E + "s", E + "b", "vb"),
    }
    # nest-alias term (term whose @id is "@nest") + @included block
    rows = parse_jsonld(
        '{"@context": {"meta": "@nest", "ex": "http://ex.org/"},'
        ' "@id": "ex:s", "meta": {"ex:c": "vc"},'
        ' "@included": [{"@id": "ex:t", "ex:d": "vd"}]}'
    )
    assert {(q[1], q[2], q[4]) for q in rows} == {
        (E + "s", E + "c", "vc"),
        (E + "t", E + "d", "vd"),
    }


def test_version_protected_prefix_are_inert():
    rows = parse_jsonld(
        '{"@context": {"@version": 1.1, "@protected": true,'
        ' "ex": {"@id": "http://ex.org/", "@prefix": true},'
        ' "name": {"@id": "http://ex.org/name", "@protected": true}},'
        ' "@id": "ex:s", "name": "n"}'
    )
    assert {(q[1], q[2], q[4]) for q in rows} == {(E + "s", E + "name", "n")}


def test_read_rdf_dispatches_jsonld_e2e(spark, tmp_path):
    """A .jsonld file runs through read_rdf + the full pipeline spec."""
    doc = tmp_path / "people.jsonld"
    doc.write_text(
        '{"@context": {"ex": "http://ex.org/"},'
        ' "@graph": ['
        '  {"@id": "ex:s1", "ex:p": {"@id": "ex:o1"}},'
        '  {"@id": "ex:s2", "ex:p": {"@value": "lit"}}'
        "]}"
    )
    df = read_rdf(spark, str(doc))
    rows = df.collect()
    assert _vals(tuple(r)[:8] for r in rows) == _vals(
        [
            ("NamedNode", E + "s1", E + "p", "NamedNode", E + "o1", None, None, None),
            ("NamedNode", E + "s2", E + "p", "Literal", "lit", None, None, None),
        ]
    )

    from rdf_dataset_fragmenter_js_spark.plans.pipeline import run_pipeline_spec

    out = tmp_path / "out"
    spec = {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(doc)},
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
        "quadSink": {
            "@type": "QuadSinkFile",
            "outputFormat": "parquet",
            "iriToPath": {"^http://ex\\.org/": "pods/"},
        },
    }
    run_pipeline_spec(spark, spec, str(out))
    written = spark.read.parquet(str(out))
    assert {r.path for r in written.select("path").distinct().collect()} == {
        "pods/s1",
        "pods/s2",
    }


def test_multi_file_jsonld_distributed(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    for i in range(2):
        (d / f"d{i}.jsonld").write_text(
            '{"@context": {"ex": "http://ex.org/"},'
            f' "@id": "ex:s{i}", "ex:p": {{"@id": "_:x"}}}}'
        )
    rows = read_rdf(spark, str(d)).collect()
    assert {(r.s, r.o) for r in rows} == {
        (E + "s0", "f0_b_x"),
        (E + "s1", "f1_b_x"),
    }


def test_null_values_are_dropped():
    """JSON-LD expansion drops null property values, {"@value": null}
    objects, and nulls inside list arrays — spec-valid documents the
    reference's parser accepts must not raise."""
    doc = """{
      "@context": {"ex": "http://ex.org/", "l": {"@id": "ex:l", "@container": "@list"}},
      "@id": "ex:s",
      "ex:gone": null,
      "ex:mixed": ["keep", null],
      "ex:vnull": {"@value": null},
      "l": [null],
      "ex:explicit": {"@list": ["a", null]}
    }"""
    quads = parse_jsonld(doc)
    E = "http://ex.org/"
    preds = {q[2] for q in quads}
    assert E + "gone" not in preds
    assert E + "vnull" not in preds
    mixed = [q for q in quads if q[2] == E + "mixed"]
    assert [(q[3], q[4]) for q in mixed] == [("Literal", "keep")]
    # all-null authored list → rdf:nil (the surviving item set is empty)
    lvals = [q for q in quads if q[2] == E + "l"]
    assert [(q[3], q[4]) for q in lvals] == [
        ("NamedNode", "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil")
    ]
    firsts = [q for q in quads if q[2].endswith("#first")]
    assert [(q[3], q[4]) for q in firsts] == [("Literal", "a")]


def test_index_container_maps():
    """@index containers are semantics-free in toRDF (JSON-LD 1.1 §4.6.1):
    the map values pass through, index keys (incl. @none) are dropped."""
    doc = """{
      "@context": {
        "schema": "http://schema.org/",
        "athletes": {"@id": "schema:athlete", "@container": "@index"}
      },
      "@id": "http://ex.org/team",
      "athletes": {
        "catcher": {"@id": "http://ex.org/p1", "schema:name": "Molina"},
        "pitcher": {"@id": "http://ex.org/p2", "schema:name": "Wainwright"},
        "@none": {"@id": "http://ex.org/p3"},
        "retired": null
      }
    }"""
    quads = parse_jsonld(doc)
    athletes = sorted(
        q[4] for q in quads if q[2] == "http://schema.org/athlete"
    )
    assert athletes == ["http://ex.org/p1", "http://ex.org/p2", "http://ex.org/p3"]
    names = sorted(q[4] for q in quads if q[2] == "http://schema.org/name")
    assert names == ["Molina", "Wainwright"]
    # node-level @index entries are ignored, not errors
    assert parse_jsonld(
        '{"@id": "http://ex.org/s", "@index": "k", '
        '"http://ex.org/p": {"@value": "v", "@index": "j"}}'
    )[0][4] == "v"


def test_remote_context_offline_documentloader(spark, tmp_path):
    """Remote context URLs resolve through the offline contexts= mapping
    (documentLoader style); unmapped URLs still fail fast."""
    from rdf_dataset_fragmenter_js_spark.sources.jsonld import read_jsonld

    ctxs = {
        "http://ctx.example/v1": {
            "@context": {"name": "http://ex.org/name", "ex": "http://ex.org/"}
        }
    }
    doc = (
        '{"@context": "http://ctx.example/v1", "@id": "ex:s", "name": "N"}'
    )
    rows = parse_jsonld(doc, contexts=ctxs)
    assert {(q[1], q[2], q[4]) for q in rows} == {(E + "s", E + "name", "N")}
    # array-of-contexts mixing a remote URL with an inline override
    rows = parse_jsonld(
        '{"@context": ["http://ctx.example/v1", {"name": "http://o.org/n"}],'
        ' "@id": "ex:s", "name": "N"}',
        contexts=ctxs,
    )
    assert {(q[2]) for q in rows} == {"http://o.org/n"}
    with pytest.raises(NotImplementedError, match="remote @context"):
        parse_jsonld(doc, contexts={})

    # threads through the distributed multi-file read
    d = tmp_path / "docs"
    d.mkdir()
    for i in range(2):
        (d / f"p{i}.jsonld").write_text(
            '{"@context": "http://ctx.example/v1",'
            f' "@id": "http://ex.org/s{i}", "name": "N{i}"}}'
        )
    got = {
        (r.s, r.o)
        for r in read_jsonld(spark, str(d), contexts=ctxs).collect()
    }
    assert got == {(E + "s0", "N0"), (E + "s1", "N1")}
