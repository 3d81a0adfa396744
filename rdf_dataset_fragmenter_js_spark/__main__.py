"""CLI entry point — the reference's UX (``bin/runner.ts:5``,
``lib/CliRunner.ts:37-44``: ``rdf-dataset-fragmenter config.json``):

    python -m rdf_dataset_fragmenter_js_spark <config.json> <output_dir>

The config is the componentsjs-shaped pipeline spec of
``plans/pipeline.py`` (same ``@type`` names and options as the reference's
JSON-LD config). Spark session parameters come from the environment:
``SPARK_GRAFT_CPUS`` (default all cores), ``spark.sql.shuffle.partitions``
sized to match.
"""

from __future__ import annotations

import os
import sys


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(
            "Missing config path or output dir.\n"
            "Usage: python -m rdf_dataset_fragmenter_js_spark <config.json> <output_dir>",
            file=sys.stderr,
        )
        return 1
    config_path, output_dir = argv

    from pyspark.sql import SparkSession

    from rdf_dataset_fragmenter_js_spark.plans.pipeline import run_pipeline_spec

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    builder = SparkSession.builder.appName("rdf-dataset-fragmenter-js-spark")
    # only default to local mode when no master was provided externally:
    # under `spark-submit --master yarn/k8s --py-files …` (the north rule's
    # deployment shape) spark.master arrives via the driver JVM's system
    # properties — spark-submit's PythonRunner marks that by exporting
    # PYSPARK_GATEWAY_PORT — and forcing local[N] here would silently turn
    # the cluster job single-node. SPARK_GRAFT_MASTER overrides explicitly.
    master_env = os.environ.get("SPARK_GRAFT_MASTER")
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master_env:
        builder = builder.master(master_env)
    elif not under_submit:
        builder = builder.master(f"local[{cpus}]").config(
            "spark.sql.shuffle.partitions", str(max(int(cpus), 8))
        )
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        run_pipeline_spec(spark, config_path, output_dir)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
