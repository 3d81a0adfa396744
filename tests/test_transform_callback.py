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


def test_transform_callback_requires_lineage(spark, spec, tmp_path):
    spec = dict(spec, transformers=[])
    with pytest.raises(NotImplementedError, match="identifier lineage"):
        run_pipeline_spec(spark, spec, str(tmp_path / "frags2"))
