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
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rdf-dataset-fragmenter-js-spark")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    try:
        run_pipeline_spec(spark, config_path, output_dir)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
