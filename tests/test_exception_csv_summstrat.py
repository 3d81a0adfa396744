"""Parity: exception routing first-match semantics
(``FragmentationStrategyException-test.ts`` / README.md:197-228),
resource-object strategy (``FragmentationStrategyResourceObject-test.ts``),
CSV sink projection (``QuadSinkCsv-test.ts``), composite strategy tee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.operators.matchers import (
    match_predicate,
    match_term_value,
)
from rdf_dataset_fragmenter_js_spark.quads import quad, quads_df
from rdf_dataset_fragmenter_js_spark.sinks.paths import sink_csv, sink_filtered
from rdf_dataset_fragmenter_js_spark.strategies import (
    route_composite,
    route_constant,
    route_exception,
    route_object,
    route_resource_object,
    route_subject,
)
from tests.conftest import collect_routed, routed


def test_exception_first_match_wins(spark):
    df = quads_df(
        spark,
        [
            quad("ex:s1", "ex:both", "ex:o1"),  # matches m1 AND m2 → m1's strategy
            quad("ex:s2", "ex:second", "ex:o2"),  # only m2 → object strategy
            quad("ex:s3", "ex:none", "ex:o3"),  # base → subject
        ],
    )
    out = route_exception(
        df,
        base=route_subject,
        exceptions=[
            (match_predicate("both"), lambda d: route_constant(d, "ex:c1")),
            (match_predicate("both|second"), route_object),
        ],
    )
    assert collect_routed(out) == sorted(
        [
            routed("ex:c1", "ex:s1", "ex:both", "ex:o1"),
            routed("ex:o2", "ex:s2", "ex:second", "ex:o2"),
            routed("ex:s3", "ex:s3", "ex:none", "ex:o3"),
        ]
    )


def test_resource_object_grouping_and_missing_target(spark):
    df = quads_df(
        spark,
        [
            # pre-target quads buffered, then routed to the target's doc
            quad("ex:r1", "ex:content", "hello", o_type="Literal", seq=1),
            quad("ex:r1", "ex:hasMaliciousCreator", "ex:creatorA", seq=2),
            quad("ex:r1", "ex:after", "ex:x", seq=3),
            # two target quads → FIRST wins (seq order)
            quad("ex:r2", "ex:hasMaliciousCreator", "ex:creatorB", seq=4),
            quad("ex:r2", "ex:hasMaliciousCreator", "ex:creatorC", seq=5),
            # no target → dropped with warning in the reference
            quad("ex:r3", "ex:content", "bye", o_type="Literal", seq=6),
        ],
    )
    out = route_resource_object(df, "hasMaliciousCreator$")
    got = collect_routed(out)
    docs = {(r[0], r[2]) for r in got}
    assert ("ex:creatorA", "ex:r1") in docs
    assert all(doc != "ex:creatorC" for doc, _ in docs)  # first target wins
    assert sum(1 for _, s in docs if s == "ex:r2") == 1
    assert all(s != "ex:r3" for _, s in docs)  # unrouted subject dropped
    assert len(got) == 5  # 3 × r1 + 2 × r2


def test_composite_strategy_tee(spark):
    df = quads_df(spark, [quad("ex:s", "ex:p", "ex:o")])
    out = route_composite(df, [route_subject, route_object])
    assert collect_routed(out) == sorted(
        [routed("ex:s", "ex:s", "ex:p", "ex:o"), routed("ex:o", "ex:s", "ex:p", "ex:o")]
    )


def test_sink_filtered_and_csv(spark, tmp_path):
    df = quads_df(
        spark,
        [
            quad("ex:s1", "ex:keep", "ex:o1"),
            quad("ex:s2", "ex:drop", "ex:o2"),
        ],
    ).withColumn("doc", F.col("s"))
    kept = sink_filtered(df, match_predicate("keep"))
    assert [r.s for r in kept.collect()] == ["ex:s1"]

    # QuadSinkCsv: selected term columns with header (QuadSinkCsv.ts:42-60)
    path = str(tmp_path / "csv_out")
    sink_csv(df, ["subject", "object"], path)
    back = spark.read.option("header", True).csv(path)
    assert back.columns == ["subject", "object"]
    assert sorted((r.subject, r.object) for r in back.collect()) == [
        ("ex:s1", "ex:o1"),
        ("ex:s2", "ex:o2"),
    ]


def test_term_value_matcher_group_sampling_golden(spark):
    """Golden parity with the reference algorithm: hash(group1 ?? value) —
    verify the Spark column path equals the pure-python imurmurhash on the
    extracted group."""
    from rdf_dataset_fragmenter_js_spark.functions.hashing import (
        MURMURHASH3_MAX_VALUE,
        imurmurhash,
    )

    rows = [quad(f"http://ex.org/pers{i}", "ex:p", "ex:o", seq=i) for i in range(50)]
    df = quads_df(spark, rows)
    p = 0.4
    m = match_term_value("subject", r"^http://ex\.org/pers([0-9]+)$", probability=p)
    got = sorted(r.s for r in m(df).filter(F.col("__match")).collect())
    expected = sorted(
        f"http://ex.org/pers{i}"
        for i in range(50)
        if imurmurhash(str(i)) / MURMURHASH3_MAX_VALUE <= p
    )
    assert got == expected


def test_single_file_guards(spark, tmp_path, monkeypatch):
    """Round-4: single-file parity outputs fail fast above the size guard
    (naming the parquet alternative) instead of grinding the driver."""
    import rdf_dataset_fragmenter_js_spark.plans.pipeline as plmod
    import rdf_dataset_fragmenter_js_spark.sinks.paths as pmod

    df = spark.createDataFrame(
        [("NamedNode", f"ex:s{i}", "ex:p", "NamedNode", "ex:o", None, None, None, i) for i in range(50)],
        "s_type string, s string, p string, o_type string, o string, "
        "o_datatype string, o_lang string, g string, seq long",
    ).withColumn("doc", F.col("s"))

    monkeypatch.setattr(pmod, "SINGLE_FILE_MAX_BYTES", 10)
    with pytest.raises(ValueError, match="parquet"):
        sink_csv(df, ["subject"], str(tmp_path / "big_csv"), max_bytes=10)

    lines = df.select("seq", F.col("s").alias("line"))
    with pytest.raises(ValueError, match="parquet"):
        plmod._write_single_text(lines, "h", str(tmp_path / "big.txt"))

    # under the guard the merged single CSV file round-trips with header
    out = str(tmp_path / "ok_csv")
    sink_csv(df, ["subject"], out)
    import glob as g
    import os

    files = [p for p in g.glob(os.path.join(out, "part-*")) if os.path.getsize(p) > 0]
    assert len(files) == 1  # merged to one part
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 50


def test_resource_object_non_named_target_raises(spark):
    """Reference parity (FragmentationStrategyResourceObject.ts:41-43): a
    literal value under the target predicate raises; with the check off it
    routes to the literal verbatim."""
    from rdf_dataset_fragmenter_js_spark.quads import quad, quads_df
    from rdf_dataset_fragmenter_js_spark.strategies.routing import (
        route_resource_object,
    )

    df = quads_df(
        spark,
        [
            quad("ex:s", "ex:target", "not-an-iri", o_type="Literal", seq=1),
            quad("ex:s", "ex:target", "ex:doc", seq=2),
        ],
    )
    with pytest.raises(Exception, match="NamedNode"):
        route_resource_object(df, "target$").collect()
    rows = route_resource_object(df, "target$", check_named_target=False).collect()
    assert {r.doc for r in rows} == {"not-an-iri"}
