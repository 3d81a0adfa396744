"""Parity tests for stateless transformers and matchers (jest ports:
``test/unit/transform/*``, ``test/unit/quadmatcher/*``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.operators import transformers as T
from rdf_dataset_fragmenter_js_spark.operators.matchers import (
    match_predicate,
    match_resource_type,
    match_term_value,
)
from rdf_dataset_fragmenter_js_spark.quads import RDF_TYPE, quad, quads_df


def svo(df):
    return sorted((r.s_type, r.s, r.p, r.o_type, r.o) for r in df.collect())


def test_replace_iri(spark):
    # README.md:511-522 example: person IRI → pod profile IRI
    df = quads_df(spark, [quad("http://www.ldbc.eu/data/pers0495", "ex:p", "lit", o_type="Literal")])
    out = T.replace_iri(
        "^http://www.ldbc.eu/data/pers([0-9]*)$",
        "http://www.ldbc.eu/pods/$1/profile/card#me",
    )(df)
    assert svo(out) == [
        ("NamedNode", "http://www.ldbc.eu/pods/0495/profile/card#me", "ex:p", "Literal", "lit")
    ]


def test_replace_iri_first_occurrence_only(spark):
    # JS String.replace without /g replaces only the first occurrence.
    df = quads_df(spark, [quad("ex:aXaXa", "ex:p", "ex:o")])
    out = T.replace_iri("X", "Y")(df)
    assert svo(out)[0][1] == "ex:aYaXa"


def test_distribute_iri(spark):
    # QuadTransformerDistributeIri-test.ts:19-77 / README.md:529-554
    rows = [quad(f"http://example.org/pers{i}", "ex:p", "ex:o") for i in (0, 1, 2, 3, 4)]
    df = quads_df(spark, rows)
    out = T.distribute_iri(
        "^http://example.org/pers([0-9]*)$",
        ["http://host-a/pers$1", "http://host-b/pers$1"],
    )(df)
    subjects = sorted(r.s for r in out.collect())
    assert subjects == [
        "http://host-a/pers0",
        "http://host-a/pers2",
        "http://host-a/pers4",
        "http://host-b/pers1",
        "http://host-b/pers3",
    ]


def test_distribute_iri_requires_group():
    import pytest

    with pytest.raises(ValueError):
        T.distribute_iri("^nogroup$", ["a"])


def test_set_iri_extension(spark):
    df = quads_df(
        spark,
        [
            quad("http://ex.org/file.ttl", "http://ex.org/p.x", "http://ex.org/file"),
            quad("http://ex.org/other", "ex:p2", "lit", o_type="Literal"),
        ],
    )
    out = T.set_iri_extension("nq", iri_pattern="^http://ex.org/(file|other)")(df)
    got = svo(out)
    assert ("NamedNode", "http://ex.org/file.nq", "http://ex.org/p.x", "NamedNode", "http://ex.org/file.nq") in got
    assert ("NamedNode", "http://ex.org/other.nq", "ex:p2", "Literal", "lit") in got


def test_blank_to_named(spark):
    df = quads_df(spark, [quad("pod123", "ex:p", "other", s_type="BlankNode", o_type="BlankNode")])
    out = T.blank_to_named("^pod(.*)$", "http://pods.example/$1")(df)
    assert svo(out) == [("NamedNode", "http://pods.example/123", "ex:p", "BlankNode", "other")]


def test_clone_and_identity(spark):
    df = quads_df(spark, [quad("ex:s", "ex:p", "ex:o")])
    assert T.identity(df).count() == 1
    assert T.clone(df).count() == 2


def test_append_quad(spark):
    # README reverse-containerOf example: append <o> <containedIn> <s>
    df = quads_df(
        spark,
        [
            quad("ex:container", "ex:containerOf", "ex:item"),
            quad("ex:x", "ex:other", "ex:y"),
        ],
    )
    out = T.append_quad(
        match_predicate("containerOf$"),
        s={"component": "object"},
        p={"value": "ex:containedIn"},
        o={"component": "subject"},
    )(df)
    got = svo(out)
    assert len(got) == 3
    assert ("NamedNode", "ex:item", "ex:containedIn", "NamedNode", "ex:container") in got


def test_append_quad_predicate_component_type(spark):
    """A non-literal template referencing the predicate/graph component must
    mint a NamedNode (the component term's own type — TermTemplateQuadComponent
    returns the term as-is), never inherit the subject's term type."""
    df = quads_df(
        spark,
        [quad("b0", "ex:p", "ex:o", s_type="BlankNode")],  # bnode subject
    )
    out = T.append_quad(
        match_predicate("^ex:p$"),
        s={"component": "predicate"},
        p={"value": "ex:derivedFrom"},
        o={"component": "object"},
    )(df)
    appended = [r for r in out.collect() if r.p == "ex:derivedFrom"]
    assert len(appended) == 1
    assert appended[0].s == "ex:p"
    assert appended[0].s_type == "NamedNode"  # not the subject's BlankNode


def test_append_quad_link_and_resource_link(spark):
    df = quads_df(spark, [quad("http://ex.org/pods/1/profile/card#me", RDF_TYPE, "ex:Person")])
    out = T.append_resource_link("Person$", "ex:postsIndex", "../posts", link_type="ldp:Container")(df)
    got = svo(out)
    assert len(got) == 3
    assert (
        "NamedNode",
        "http://ex.org/pods/1/profile/card#me",
        "ex:postsIndex",
        "NamedNode",
        "http://ex.org/pods/1/posts",
    ) in got
    assert ("NamedNode", "http://ex.org/pods/1/posts", RDF_TYPE, "NamedNode", "ldp:Container") in got


def test_append_resource_scl(spark):
    df = quads_df(spark, [quad("ex:s", RDF_TYPE, "ex:Person")])
    out = T.append_resource_scl("Person$", "ex:policy1", "mypolicy")(df)
    rows = {(r.s, r.p, r.o, r.o_type, r.o_datatype) for r in out.collect()}
    assert ("ex:policy1", T.SCL_APPLIES_TO, "ex:s", "NamedNode", None) in rows
    assert ("ex:policy1", T.SCL_SCOPE, "mypolicy", "Literal", T.SCL_DATATYPE) in rows


def test_distinct_produced(spark):
    df = quads_df(
        spark,
        [
            quad("ex:a", RDF_TYPE, "ex:Person", seq=1),
            quad("ex:b", RDF_TYPE, "ex:Person", seq=2),
        ],
    )
    # both resources append the same link target quad → deduplicated once
    t = T.append_resource_scl("Person$", "ex:policy1", "p")
    out = T.distinct_produced(t)(df)
    scl_scope = [r for r in out.collect() if r.p == T.SCL_SCOPE]
    assert len(scl_scope) == 1


def test_match_term_value_probability(spark):
    # QuadMatcherTermValue-test.ts:49-61 semantics with the REAL murmur hash:
    # deterministic, repeatable sampling.
    rows = [quad(f"ex:s{i}", "ex:p", "ex:o", seq=i) for i in range(200)]
    df = quads_df(spark, rows)
    m = match_term_value("subject", "^ex:s([0-9]+)$", probability=0.5)
    got1 = sorted(r.s for r in m(df).filter(F.col("__match")).collect())
    got2 = sorted(r.s for r in m(df).filter(F.col("__match")).collect())
    assert got1 == got2  # deterministic
    assert 60 <= len(got1) <= 140  # roughly p=0.5 of 200
    # probability 1 keeps everything matching the regex
    m1 = match_term_value("subject", "^ex:s([0-9]+)$", probability=1.0)
    assert m1(df).filter(F.col("__match")).count() == 200


def test_match_resource_type_full(spark):
    df = quads_df(
        spark,
        [
            quad("ex:post1", RDF_TYPE, "ex:Post"),
            quad("ex:post1", "ex:content", "hello", o_type="Literal"),
            quad("ex:other", "ex:content", "bye", o_type="Literal"),
        ],
    )
    m = match_resource_type("Post$", match_full_resource=True)
    matched = sorted(r.s for r in m(df).filter(F.col("__match")).collect())
    assert matched == ["ex:post1", "ex:post1"]
    m2 = match_resource_type("Post$", match_full_resource=False)
    assert m2(df).filter(F.col("__match")).count() == 1


def test_append_quad_copies_graph_when_unspecified(spark):
    """g=None copies the matched quad's graph, uniformly with s/p/o (the
    reference's graph param is a required term template whose copy form is
    TermTemplateQuadComponent on 'graph')."""
    from rdf_dataset_fragmenter_js_spark.operators.matchers import match_predicate
    from rdf_dataset_fragmenter_js_spark.operators.transformers import append_quad
    from rdf_dataset_fragmenter_js_spark.quads import quad, quads_df

    df = quads_df(
        spark,
        [
            quad("ex:s", "ex:p", "ex:o", g="http://g.org/1"),
            quad("ex:s2", "ex:p", "ex:o2"),
        ],
    )
    out = append_quad(match_predicate("^ex:p$"), p={"value": "ex:added"})(df)
    added = {(r.s, r.g) for r in out.collect() if r.p == "ex:added"}
    assert added == {("ex:s", "http://g.org/1"), ("ex:s2", None)}


def test_match_term_value_graph_default_graph_matches(spark):
    """JS DefaultGraph.value is '', so `.*` on the graph component matches
    default-graph quads; the engine's NULL g must coalesce to ''."""
    from rdf_dataset_fragmenter_js_spark.operators.matchers import match_term_value
    from rdf_dataset_fragmenter_js_spark.quads import quad, quads_df

    df = quads_df(
        spark,
        [
            quad("ex:s", "ex:p", "ex:o"),
            quad("ex:s2", "ex:p", "ex:o2", g="http://g.org/1"),
        ],
    )
    marked = match_term_value("graph", ".*")(df).collect()
    assert all(r["__match"] for r in marked)
    anchored = match_term_value("graph", "^$")(df).collect()
    assert {(r.s, r["__match"]) for r in anchored} == {("ex:s", True), ("ex:s2", False)}
