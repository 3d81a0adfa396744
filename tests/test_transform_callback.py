"""transformCallback config wire-up: the reference's TransformCallbackMap
lineage CSV (README.md "Map Transform Callback",
lib/transformCallback/TransformCallbackMap.ts:33-67) produced from a
componentsjs-shaped config with a RemapResourceIdentifier chain."""

from __future__ import annotations

import csv

import pytest

from rdf_dataset_fragmenter_js_spark.plans.pipeline import run_pipeline_spec

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
VOC = "http://ex.org/vocabulary/"
NQ = f"""\
<http://ldbc/post1> <{RDF_TYPE}> <{VOC}Post> .
<http://ldbc/post1> <{VOC}id> "618"^^<http://www.w3.org/2001/XMLSchema#long> .
<http://ldbc/post1> <{VOC}hasCreator> <http://pods/933/profile/card#me> .
<http://ldbc/note1> <{RDF_TYPE}> <{VOC}Note> .
<http://ldbc/note1> <{VOC}id> "7"^^<http://www.w3.org/2001/XMLSchema#long> .
<http://ldbc/note1> <{VOC}hasCreator> <http://pods/7/profile/card#me> .
"""


@pytest.fixture()
def spec(tmp_path):
    nq = tmp_path / "posts.nq"
    nq.write_text(NQ)
    return {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(nq)},
        "transformers": [
            {
                "@type": "QuadTransformerRemapResourceIdentifier",
                "newIdentifierSeparator": "../posts#",
                "typeRegex": "vocabulary/Post$",
                "identifierPredicateRegex": "vocabulary/id$",
                "targetPredicateRegex": "vocabulary/hasCreator$",
            }
        ],
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
        "quadSink": {
            "@type": "QuadSinkFile",
            "outputFormat": "parquet",
            "iriToPath": {"^http://": str(tmp_path) + "/out/"},
        },
        "transformCallback": [
            {
                "@type": "TransformCallbackMap",
                "file": str(tmp_path / "out-fragments" / "subject-mapping.csv"),
                "fieldToMap": "subject",
                "columns": ["originalSubject", "mappedSubject"],
                "matchers": [
                    {
                        "@type": "QuadMatcherResourceType",
                        "typeRegex": "vocabulary/Post$",
                        "matchFullResource": False,
                    },
                    {
                        "@type": "QuadMatcherResourceType",
                        "typeRegex": "vocabulary/Comment$",
                        "matchFullResource": False,
                    },
                ],
            }
        ],
    }


def test_transform_callback_map_csv(spark, spec, tmp_path):
    run_pipeline_spec(spark, spec, str(tmp_path / "frags"))
    with open(tmp_path / "out-fragments" / "subject-mapping.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["originalSubject", "mappedSubject"]
    # only the remapped Post resource is recorded (Note is not remapped;
    # the Comment matcher matches nothing)
    assert rows[1:] == [["http://ldbc/post1", "http://pods/933/posts#618"]]


def test_transform_callback_identity_chain(spark, spec, tmp_path):
    """With no transformers, each original quad's transformedQuads is just
    itself — a matching quad records original,original (the reference would
    do exactly this; no lineage requirement)."""
    spec = dict(spec, transformers=[])
    run_pipeline_spec(spark, spec, str(tmp_path / "frags2"))
    with open(tmp_path / "out-fragments" / "subject-mapping.csv") as f:
        rows = [line.rstrip("\n") for line in f]
    assert rows == [
        "originalSubject,mappedSubject",
        "http://ldbc/post1,http://ldbc/post1",
    ]


def test_transform_callback_multi_match_row_shape(spark, tmp_path):
    """Exact reference row semantics (TransformCallbackMap.ts:33-43): one
    row per original quad with ALL matching transformed quads comma-joined
    — here clone makes each type quad match twice, and an appended quad
    matching the matcher joins onto its trigger's row."""
    nq = tmp_path / "d.nq"
    nq.write_text(
        f"<http://ldbc/post1> <{RDF_TYPE}> <{VOC}Post> .\n"
        f'<http://ldbc/post1> <{VOC}id> "618" .\n'
    )
    out_csv = tmp_path / "map.csv"
    spec = {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(nq)},
        "transformers": [{"@type": "QuadTransformerClone"}],
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
        "quadSink": {
            "@type": "QuadSinkFile",
            "outputFormat": "parquet",
            "iriToPath": {"^http://": str(tmp_path) + "/out/"},
        },
        "transformCallback": [
            {
                "@type": "TransformCallbackMap",
                "file": str(out_csv),
                "fieldToMap": "subject",
                "columns": ["original", "matches"],
                "matchers": [
                    {
                        "@type": "QuadMatcherResourceType",
                        "typeRegex": "vocabulary/Post$",
                        "matchFullResource": False,
                    }
                ],
            }
        ],
    }
    run_pipeline_spec(spark, spec, str(tmp_path / "frags"))
    with open(out_csv) as f:
        rows = [line.rstrip("\n") for line in f]
    # the type quad was cloned: both copies match -> orig,match,match;
    # the id quad matches nothing -> no row
    assert rows == [
        "original,matches",
        "http://ldbc/post1,http://ldbc/post1,http://ldbc/post1",
    ]


def test_transform_callback_predicate_field(spark, tmp_path):
    """fieldToMap accepts every quad component now (the reference allows
    subject|predicate|object|graph)."""
    nq = tmp_path / "d.nq"
    nq.write_text(f"<http://ldbc/post1> <{RDF_TYPE}> <{VOC}Post> .\n")
    out_csv = tmp_path / "map.csv"
    spec = {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(nq)},
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
        "quadSink": {
            "@type": "QuadSinkFile",
            "outputFormat": "parquet",
            "iriToPath": {"^http://": str(tmp_path) + "/out/"},
        },
        "transformCallback": [
            {
                "@type": "TransformCallbackMap",
                "file": str(out_csv),
                "fieldToMap": "predicate",
                "columns": ["originalPredicate", "mappedPredicate"],
                "matchers": [
                    {
                        "@type": "QuadMatcherPredicate",
                        "predicateRegex": "type$",
                    }
                ],
            }
        ],
    }
    run_pipeline_spec(spark, spec, str(tmp_path / "frags"))
    with open(out_csv) as f:
        rows = [line.rstrip("\n") for line in f]
    assert rows == [
        "originalPredicate,mappedPredicate",
        f"{RDF_TYPE},{RDF_TYPE}",
    ]


def test_transform_callback_core_first_ordering(spark, tmp_path):
    """When both the rewritten original AND an appended quad match, the
    reference emits [rewritten original, appended] — assert that exact
    order (the core-chain reconstruction, not value sorting: 'P' sorts
    after 'http://...' so a lexical sort would flip it)."""
    nq = tmp_path / "d.nq"
    nq.write_text(f"<http://ldbc/post1> <{RDF_TYPE}> <{VOC}Post> .\n")
    out_csv = tmp_path / "map.csv"
    spec = {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(nq)},
        "transformers": [
            {
                "@type": "QuadTransformerAppendQuad",
                "matcher": {
                    "@type": "QuadMatcherPredicate",
                    "predicateRegex": "type$",
                },
                "predicate": {"value": VOC + "appended"},
                "object": {"value": "http://marker/x"},
            }
        ],
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
        "quadSink": {
            "@type": "QuadSinkFile",
            "outputFormat": "parquet",
            "iriToPath": {"^http://": str(tmp_path) + "/out/"},
        },
        "transformCallback": [
            {
                "@type": "TransformCallbackMap",
                "file": str(out_csv),
                "fieldToMap": "object",
                "columns": ["original", "matches"],
                "matchers": [
                    # matches BOTH the type quad (object=...Post) and the
                    # appended quad (object=http://marker/x)
                    {
                        "@type": "QuadMatcherPredicate",
                        "predicateRegex": "type$|appended$",
                    }
                ],
            }
        ],
    }
    run_pipeline_spec(spark, spec, str(tmp_path / "frags"))
    with open(out_csv) as f:
        rows = [line.rstrip("\n") for line in f]
    # rewritten original (vocabulary/Post) BEFORE the appended marker,
    # although 'h' < 'v' lexically — proves core-first, not sorted
    assert rows == [
        "original,matches",
        f"{VOC}Post,{VOC}Post,http://marker/x",
    ]


def test_transform_callback_graph_field_default_graph(spark, tmp_path):
    """fieldToMap='graph' on a DEFAULT-graph quad: the reference writes
    quad.graph.value === '' — the CSV row must keep the empty fields, not
    silently drop NULL columns from concat_ws."""
    nq = tmp_path / "d.nq"
    nq.write_text(f"<http://ldbc/post1> <{RDF_TYPE}> <{VOC}Post> .\n")
    out_csv = tmp_path / "gmap.csv"
    spec = {
        "quadSource": {"@type": "QuadSourceFile", "filePath": str(nq)},
        "fragmentationStrategy": {"@type": "FragmentationStrategySubject"},
        "quadSink": {
            "@type": "QuadSinkFile",
            "outputFormat": "parquet",
            "iriToPath": {"^http://": str(tmp_path) + "/out/"},
        },
        "transformCallback": [
            {
                "@type": "TransformCallbackMap",
                "file": str(out_csv),
                "fieldToMap": "graph",
                "columns": ["originalGraph", "mappedGraph"],
                "matchers": [
                    {
                        "@type": "QuadMatcherPredicate",
                        "predicateRegex": "type$",
                    }
                ],
            }
        ],
    }
    run_pipeline_spec(spark, spec, str(tmp_path / "frags"))
    with open(out_csv) as f:
        rows = [line.rstrip("\n") for line in f]
    assert rows == ["originalGraph,mappedGraph", ","]
