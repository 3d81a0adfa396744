"""Force-run the distributed physical strategies at bench scale.

Three operators keep a driver fast path below a row threshold with a
distributed loop above it (`near_dup_clusters`, `surface_canonical_mapping`
/ `canonical_mapping`, `bnode_owners`). Small-scale equality tests exist in
tests/; this script publishes TIMINGS for the distributed paths at bench
scale (VERDICT r1 #7) and re-asserts result equality on the same inputs.

Prints one JSON line; numbers are copied into BENCH.md.

Usage: python tools/distributed_paths_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 2), out


def main():
    from pyspark.sql import functions as F

    from bench import build_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from rdf_dataset_fragmenter_js_spark.kg.canonicalize import (
        surface_canonical_mapping,
    )
    from rdf_dataset_fragmenter_js_spark.plans import testdata as TD
    from rdf_dataset_fragmenter_js_spark.strategies.bnode import bnode_owners
    from rdf_dataset_fragmenter_js_spark.textops import dedup as D

    results: dict = {"sf_dir": sf_dir, "cpus": cpus}

    # ---- bnode ownership closure -----------------------------------------
    quads = TD.bnode_quads(spark, sf_dir).localCheckpoint(eager=True)
    args = (quads, "s", "s_type", "o", "o_type")
    drv_sec, drv = timed(lambda: bnode_owners(*args).toPandas())
    dist_sec, dist = timed(lambda: bnode_owners(*args, driver_threshold=0).toPandas())
    a = set(map(tuple, drv.itertuples(index=False, name=None)))
    b = set(map(tuple, dist.itertuples(index=False, name=None)))
    assert a == b, f"bnode_owners paths disagree: {len(a)} vs {len(b)}"
    results["bnode_owners"] = {
        "rows": len(a),
        "driver_sec": drv_sec,
        "distributed_sec": dist_sec,
        "equal": True,
    }

    # ---- near-dup connected components -----------------------------------
    TD.register_views(spark, sf_dir)
    docs = spark.table("documents")
    pairs = D.lsh_candidate_pairs(docs, k=8, bands=4, shingle_size=8)
    drv_sec, drv = timed(lambda: D.near_dup_clusters(pairs).toPandas())
    dist_sec, dist = timed(
        lambda: D.near_dup_clusters(pairs, driver_threshold=0).toPandas()
    )
    a = set(map(tuple, drv.itertuples(index=False, name=None)))
    b = set(map(tuple, dist.itertuples(index=False, name=None)))
    assert a == b, "near_dup_clusters paths disagree"
    results["near_dup_clusters"] = {
        "pairs": int(pairs.count()),
        "rows": len(a),
        "driver_sec": drv_sec,
        "distributed_sec": dist_sec,
        "equal": True,
    }

    # ---- canonical mapping over an above-threshold vocabulary ------------
    # 150k distinct surfaces (> the 100k driver threshold) with clusterable
    # alias variants — the real-corpus vocabulary shape, synthesized so the
    # distributed blocking/containment/CC path is exercised at a size the
    # driver path can also still run for the equality check.
    n_base = 50_000
    mentions = (
        spark.range(3 * n_base)
        .select(
            F.when(
                F.col("id") % 3 == 0,
                F.concat(F.lit("acme corp "), (F.col("id") / 3).cast("long").cast("string")),
            )
            .when(
                F.col("id") % 3 == 1,
                F.concat(F.lit("the acme corp "), (F.col("id") / 3).cast("long").cast("string")),
            )
            .otherwise(
                F.concat(F.lit("Acme Corp "), (F.col("id") / 3).cast("long").cast("string"))
            )
            .alias("surface")
        )
        .localCheckpoint(eager=True)
    )
    drv_sec, drv = timed(
        lambda: surface_canonical_mapping(mentions, driver_threshold=1_000_000).toPandas()
    )
    dist_sec, dist = timed(
        lambda: surface_canonical_mapping(mentions, driver_threshold=0).toPandas()
    )
    a = dict(zip(drv["surface"], drv["canonical_id"]))
    b = dict(zip(dist["surface"], dist["canonical_id"]))
    assert a == b, "surface_canonical_mapping paths disagree"
    results["surface_canonical_mapping"] = {
        "surfaces": 3 * n_base,
        "driver_sec": drv_sec,
        "distributed_sec": dist_sec,
        "equal": True,
    }

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
