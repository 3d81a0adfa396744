"""Deterministic quad relations derived from the driver's TPC-H-ish
testdata (TESTDATA.md). The derivation is written once as engine-portable
ANSI SQL (runs verbatim on Spark SQL and DuckDB) so the DuckDB oracle and
the Spark engine consume *identical* inputs — the correctness check then
isolates the operator under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

VOCAB = "http://ex.org/vocab#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Order resources: (order a Order; hasId <okey>; hasCreator <pod>; status <s>)
ORDER_QUADS_SQL = f"""
SELECT 'NamedNode' AS s_type,
       'http://ex.org/order/' || CAST(o_orderkey AS STRING) AS s,
       '{RDF_TYPE}' AS p,
       'NamedNode' AS o_type,
       '{VOCAB}Order' AS o,
       CAST(NULL AS STRING) AS o_datatype,
       CAST(NULL AS STRING) AS o_lang,
       CAST(NULL AS STRING) AS g,
       o_orderkey * 10 + 1 AS seq
FROM orders
UNION ALL
SELECT 'NamedNode',
       'http://ex.org/order/' || CAST(o_orderkey AS STRING),
       '{VOCAB}hasId',
       'Literal',
       CAST(o_orderkey AS STRING),
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       o_orderkey * 10 + 2
FROM orders
UNION ALL
SELECT 'NamedNode',
       'http://ex.org/order/' || CAST(o_orderkey AS STRING),
       '{VOCAB}hasCreator',
       'NamedNode',
       'http://ex.org/pods/' || CAST(o_custkey AS STRING) || '/profile/card#me',
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       o_orderkey * 10 + 3
FROM orders
UNION ALL
SELECT 'NamedNode',
       'http://ex.org/order/' || CAST(o_orderkey AS STRING),
       '{VOCAB}status',
       'Literal',
       o_orderstatus,
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       o_orderkey * 10 + 4
FROM orders
"""

#: Blank-node graph: order --lines--> _:b<okey>; _:b --item--> part IRIs;
#: chain _:b<okey> --meta--> _:c<okey> --note--> "n" (depth-2 ownership).
BNODE_QUADS_SQL = f"""
SELECT 'NamedNode' AS s_type,
       'http://ex.org/order/' || CAST(o_orderkey AS STRING) AS s,
       '{VOCAB}lines' AS p,
       'BlankNode' AS o_type,
       'b' || CAST(o_orderkey AS STRING) AS o,
       CAST(NULL AS STRING) AS o_datatype,
       CAST(NULL AS STRING) AS o_lang,
       CAST(NULL AS STRING) AS g,
       o_orderkey * 100 + 1 AS seq
FROM orders
UNION ALL
SELECT 'BlankNode',
       'b' || CAST(l_orderkey AS STRING),
       '{VOCAB}item',
       'NamedNode',
       'http://ex.org/part/' || CAST(l_partkey AS STRING),
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       l_orderkey * 100 + 10 + l_linenumber
FROM lineitem
UNION ALL
SELECT 'BlankNode',
       'b' || CAST(o_orderkey AS STRING),
       '{VOCAB}meta',
       'BlankNode',
       'c' || CAST(o_orderkey AS STRING),
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       o_orderkey * 100 + 90
FROM orders
UNION ALL
SELECT 'BlankNode',
       'c' || CAST(o_orderkey AS STRING),
       '{VOCAB}note',
       'Literal',
       'n',
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       o_orderkey * 100 + 91
FROM orders
"""

#: Pod-scoped order resources (for dataset-summary queries):
#: subjects live under http://ex.org/pods/<cust>/ namespaces.
POD_QUADS_SQL = f"""
SELECT 'NamedNode' AS s_type,
       'http://ex.org/pods/' || CAST(o_custkey AS STRING) || '/order/' || CAST(o_orderkey AS STRING) AS s,
       '{RDF_TYPE}' AS p,
       'NamedNode' AS o_type,
       '{VOCAB}Order' AS o,
       CAST(NULL AS STRING) AS o_datatype,
       CAST(NULL AS STRING) AS o_lang,
       CAST(NULL AS STRING) AS g,
       o_orderkey * 10 + 1 AS seq
FROM orders
UNION ALL
SELECT 'NamedNode',
       'http://ex.org/pods/' || CAST(o_custkey AS STRING) || '/order/' || CAST(o_orderkey AS STRING),
       '{VOCAB}status',
       'Literal',
       o_orderstatus,
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       o_orderkey * 10 + 2
FROM orders
UNION ALL
SELECT 'NamedNode',
       'http://ex.org/pods/' || CAST(o_custkey AS STRING) || '/order/' || CAST(o_orderkey AS STRING),
       '{VOCAB}priority',
       'NamedNode',
       'http://ex.org/priority/' || o_orderpriority,
       CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING),
       o_orderkey * 10 + 3
FROM orders
"""


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata parquet tables as temp views.

    The local fixture files are single-row-group parquet, which Spark cannot
    split — every scan would be one partition and all map-side work (quad
    generation, shingling, hashing, regex scoring) would run on one core. On
    a real cluster the input is thousands of splits; emulate that here by
    repartitioning any under-split scan up to ``defaultParallelism``. The
    shuffle this adds is tiny (the fixtures are KBs); the downstream plans
    then exercise the same all-cores execution shape they'd have at scale.
    """
    target = spark.sparkContext.defaultParallelism
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
        df.createOrReplaceTempView(t)


def order_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(ORDER_QUADS_SQL)


def bnode_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(BNODE_QUADS_SQL)


def pod_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(POD_QUADS_SQL)
