from __future__ import annotations

import os
import sys

import pytest

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]")
        .appName("rdf-dataset-fragmenter-js-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def collect_routed(df):
    """(doc, s, p, o) multiset — the parity contract: per-doc quad multisets
    (FIXTURES.md §2)."""
    rows = df.select("doc", "s_type", "s", "p", "o_type", "o", "o_datatype", "o_lang", "g").collect()
    return sorted(
        (r.doc, r.s_type, r.s, r.p, r.o_type, r.o, r.o_datatype, r.o_lang, r.g) for r in rows
    )


def routed(doc, s, p, o, s_type="NamedNode", o_type="NamedNode", o_datatype=None, o_lang=None, g=None):
    return (doc, s_type, s, p, o_type, o, o_datatype, o_lang, g)
