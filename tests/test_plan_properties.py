"""Physical-plan guards: the PLANS.md claims, asserted on .explain output
so optimizer-visible regressions (a Python node sneaking into a per-quad
path, a lost pushdown, a cartesian product) fail CI instead of silently
costing 100x at scale."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as E

    return E.queries()


def test_per_quad_resolver_paths_have_no_python(spark, queries):
    """relativePath routing and AppendQuadLink resolve IRIs per QUAD — the
    native Column resolver must keep Python out of those plans (the 100 TB
    hazard is an Arrow crossing per quad)."""
    for name in ("frag_subject_relative", "transform_append_quad_link"):
        plan = plan_of(queries[name](spark, SF))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_remap_mapping_uses_arrow_resolver(spark, queries):
    """The remap mapping table is per-RESOURCE (small side) where the
    Arrow-batched resolver measured 2-4x faster than the codegen-giant
    native expression (BENCH.md round-3 A/B) — assert the measured choice
    stays."""
    plan = plan_of(queries["transform_remap_resource"](spark, SF))
    assert "ArrowEvalPython" in plan


def test_no_cartesian_products_anywhere(spark, queries):
    """No operator may fall back to a cartesian/nested-loop join on the
    gate corpus — candidate generation is always bucketed/blocked."""
    for name in (
        "dedup_minhash_lsh",
        "sim_cosine_topk_lsh",
        "sim_embedding_near_dups",
        "kg_entity_link",
        "frag_resource_object",
        # distributed canonicalization: candidate pairs must come from the
        # token-block equi-join, never an all-pairs form×form product
        "kg_canonical_mapping",
    ):
        plan = plan_of(queries[name](spark, SF))
        assert "CartesianProduct" not in plan, name


def test_column_pruning_reaches_scan(spark, queries):
    """Dedup reads only (doc_id, text) — scan width scales with used
    columns, not table width."""
    plan = plan_of(queries["dedup_exact"](spark, SF))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines and all(
        "lang" not in l and "source" not in l for l in scan_lines
    ), plan[:2000]


def test_predicate_pushdown_reaches_scan(spark, queries):
    """The ANN query side (vec_id < 10) must reach the parquet reader as a
    pushed filter."""
    plan = plan_of(queries["sim_cosine_topk"](spark, SF))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("vec_id" in l for l in pushed), pushed


def test_ivf_centroid_init_is_take_ordered(spark, queries):
    """IVF centroid INIT must compile to TakeOrderedAndProject (per-partition
    top-K, driver merge) — never a corpus-wide single-partition Window/Sort.
    The final gate query plan is checkpoint-truncated, so assert on the init
    expression directly."""
    from rdf_dataset_fragmenter_js_spark.textops.similarity import quantize_col
    from pyspark.sql import functions as F

    qc = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(
            F.col("vec_id").alias("vid"),
            quantize_col(F.col("embedding"), 4096).alias("qvec"),
        )
    )
    init = qc.select("vid", "qvec").sort("vid").limit(8)
    plan = plan_of(init)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    # Every Window in the full gate plan must be PARTITIONED (by query_id
    # for the final top-k rank, or by vid for the per-vector probe rank);
    # an unpartitioned windowspec would be a corpus-wide single-partition
    # sort. (The K-row centroid-numbering window is checkpoint-truncated
    # out of this plan and never touches the corpus.)
    full = plan_of(queries["sim_cosine_topk_ivf"](spark, SF))
    for frag in full.split("windowspecdefinition(")[1:]:
        assert frag.startswith(("query_id", "vid")), frag[:120]


def test_summary_aggregates_are_partial(spark, queries):
    """VoID property partitions must map-side combine (partial aggregates)
    — the shuffle carries per-group rows, not the exploded input."""
    plan = plan_of(queries["summary_void_properties"](spark, SF))
    assert "partial_" in plan
