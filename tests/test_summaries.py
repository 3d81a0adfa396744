"""Parity tests for VoID / Bloom dataset summaries (jest ports:
``test/unit/summary/DatasetSummaryVoID-test.ts``,
``DatasetSummaryBloom-test.ts``,
``test/unit/strategy/FragmentationStrategyDatasetSummary*-test.ts``).

The VoID fixture pins the imurmurhash fragment IRIs (golden hex digests);
the Bloom fixture asserts the reference test's own contract — round-trip
membership of every registered NamedNode through the serialized base64
bitfield."""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.functions.hashing import bloem_has, imurmurhash_hex
from rdf_dataset_fragmenter_js_spark.quads import RDF_TYPE, quad, quads_df
from rdf_dataset_fragmenter_js_spark.strategies.summaries import (
    MEM,
    VOID,
    XSD_BASE64,
    assign_datasets,
    bloom_summary,
    void_summary,
)

DATASET = "http://example.org/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

FIXTURE = [
    quad("ex:s", RDF_TYPE, "ex:c", seq=1),
    quad("ex:s", "ex:p", "ex:o", seq=2),
    quad("ex:s", "ex:p", "ex:o", seq=3),
    quad("ex:s", "ex:p", "example", o_type="Literal", seq=4),
]


def _with_dataset(spark, rows, dataset=DATASET):
    return quads_df(spark, rows).withColumn("dataset", F.lit(dataset))


def test_void_summary_golden(spark):
    out = void_summary(_with_dataset(spark, FIXTURE))
    rows = {(r.s, r.p, r.o, r.o_type, r.o_datatype) for r in out.collect()}
    docs = {r.doc for r in out.collect()}
    assert docs == {DATASET}

    pp_rdftype = f"{DATASET}#{imurmurhash_hex(RDF_TYPE)}"
    pp_pred = f"{DATASET}#{imurmurhash_hex('ex:p')}"
    cp = f"{DATASET}#{imurmurhash_hex('ex:c')}"

    expected = {
        (DATASET, RDF_TYPE, VOID + "Dataset", "NamedNode", None),
        (DATASET, VOID + "uriSpace", DATASET, "Literal", None),
        (DATASET, VOID + "classes", "1", "Literal", XSD_INT),
        (DATASET, VOID + "triples", "4", "Literal", XSD_INT),
        (DATASET, VOID + "properties", "2", "Literal", XSD_INT),
        (DATASET, VOID + "distinctSubjects", "1", "Literal", XSD_INT),
        (DATASET, VOID + "distinctObjects", "3", "Literal", XSD_INT),
        (DATASET, VOID + "vocabulary", "ex:", "NamedNode", None),
        (
            DATASET,
            VOID + "vocabulary",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns",
            "NamedNode",
            None,
        ),
        (DATASET, VOID + "propertyPartition", pp_pred, "NamedNode", None),
        (DATASET, VOID + "propertyPartition", pp_rdftype, "NamedNode", None),
        (DATASET, VOID + "classPartition", cp, "NamedNode", None),
        (pp_pred, RDF_TYPE, VOID + "Dataset", "NamedNode", None),
        (pp_pred, VOID + "property", "ex:p", "NamedNode", None),
        (pp_pred, VOID + "triples", "3", "Literal", XSD_INT),
        (pp_pred, VOID + "distinctSubjects", "1", "Literal", XSD_INT),
        (pp_pred, VOID + "distinctObjects", "2", "Literal", XSD_INT),
        (pp_rdftype, RDF_TYPE, VOID + "Dataset", "NamedNode", None),
        (pp_rdftype, VOID + "property", RDF_TYPE, "NamedNode", None),
        (pp_rdftype, VOID + "triples", "1", "Literal", XSD_INT),
        (pp_rdftype, VOID + "distinctSubjects", "1", "Literal", XSD_INT),
        (pp_rdftype, VOID + "distinctObjects", "1", "Literal", XSD_INT),
        (cp, RDF_TYPE, VOID + "Dataset", "NamedNode", None),
        (cp, VOID + "class", "ex:c", "NamedNode", None),
        (cp, VOID + "entities", "1", "Literal", XSD_INT),
    }
    assert rows == expected


def test_assign_datasets_groups_and_bnodes(spark):
    # FragmentationStrategyDatasetSummary.ts:27-38: all match groups of all
    # matching patterns become dataset keys.
    rows = [
        quad("http://ex.org/pods/7/posts/1", "ex:p", "ex:o", seq=1),
        quad("http://ex.org/pods/7/posts/1", "ex:p", "b1", o_type="BlankNode", seq=2),
        quad("b1", "ex:q", "lit", s_type="BlankNode", o_type="Literal", seq=3),
        quad("other:iri", "ex:p", "ex:o", seq=4),
    ]
    df = quads_df(spark, rows)
    got = assign_datasets(df, [r"^(http://ex\.org/pods/[0-9]+/)"])
    pairs = sorted((r.dataset, r.s, r.seq) for r in got.collect())
    assert pairs == [
        ("http://ex.org/pods/7/", "b1", 3),  # bnode attributed via owner
        ("http://ex.org/pods/7/", "http://ex.org/pods/7/posts/1", 1),
        ("http://ex.org/pods/7/", "http://ex.org/pods/7/posts/1", 2),
    ]


def test_bloom_summary_membership_roundtrip(spark):
    hash_bits, hash_count = 256, 4
    out = bloom_summary(_with_dataset(spark, FIXTURE), hash_bits, hash_count).cache()
    rows = out.collect()
    bitfields = [
        base64.b64decode(r.o)
        for r in rows
        if r.p == MEM + "binaryRepresentation" and r.o_datatype == XSD_BASE64
    ]
    assert bitfields
    # every NamedNode term of every registered quad must be a member of at
    # least one serialized filter (DatasetSummaryBloom-test.ts:29-47)
    for term in ["ex:s", "ex:p", "ex:o", "ex:c", RDF_TYPE]:
        assert any(
            bloem_has(bf, term.encode(), hash_bits, hash_count) for bf in bitfields
        ), term
    # structure: hash-function quads present, routed at the location
    preds = {r.p for r in rows}
    assert MEM + "hashSize" in preds
    assert {r.doc for r in rows} == {DATASET}
    # filters exist per (kind, key): resources ex:s, ex:o, ex:c + properties
    keys = {
        (r.p, r.o)
        for r in rows
        if r.p in (MEM + "projectedResource", MEM + "projectedProperty")
    }
    assert (MEM + "projectedResource", "ex:s") in keys
    assert (MEM + "projectedProperty", "ex:p") in keys
    assert (MEM + "projectedProperty", RDF_TYPE) in keys
    out.unpersist()


def test_bloom_empty_input_no_output(spark):
    df = _with_dataset(spark, []).limit(0)
    assert bloom_summary(df, 64, 2).count() == 0


def test_bloem_bitfield_non_multiple_of_8_bits():
    """Ceil byte allocation: bit positions in the last partial byte must
    not IndexError (bloem's BitBuffer allocates ceil(bits/8))."""
    from rdf_dataset_fragmenter_js_spark.functions.hashing import (
        bloem_bit_indexes,
        bloem_bitfield,
    )

    bits = 100
    members = [f"m{i}".encode() for i in range(50)]
    field = bloem_bitfield(members, bits, 4)
    assert len(field) == 13
    # at least one member must actually hit the partial last byte
    assert any(
        idx >= 96 for m in members for idx in bloem_bit_indexes(m, bits, 4)
    )
