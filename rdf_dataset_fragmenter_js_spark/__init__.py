"""PySpark-native knowledge-graph construction & fragmentation engine.

A from-scratch, Spark-first re-expression of the capabilities of
SolidBench/rdf-dataset-fragmenter.js (reference at /root/reference, v2.10.0):
quad transformers, fragmentation strategies, matchers, sinks and dataset
summaries — plus the upstream KG-construction pipeline (web pages → text →
triples → canonical entities) and large-scale training-data operators
(dedup, similarity search, text analysis).

Everything is expressed as lazy DataFrame plans (Catalyst optimizes the
composed DAG); per-row Python is avoided — custom scalar logic lives in
vectorized pandas/Arrow UDFs.
"""

__version__ = "0.1.0"

from rdf_dataset_fragmenter_js_spark.quads import QUAD_COLUMNS, QUAD_SCHEMA, quads_df

__all__ = ["QUAD_COLUMNS", "QUAD_SCHEMA", "quads_df", "__version__"]
