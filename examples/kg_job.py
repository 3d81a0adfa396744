"""Example cluster job: synthetic pages -> KG quads -> fragment write.
Run: spark-submit --py-files engine.zip kg_job.py <n_pages> <out_dir>"""
import sys
from pyspark.sql import SparkSession

from rdf_dataset_fragmenter_js_spark.kg.pipeline import build_quads, fragment_and_write
from rdf_dataset_fragmenter_js_spark.kg.webpages import synthetic_webpages

n_pages, out = int(sys.argv[1]), sys.argv[2]
spark = SparkSession.builder.appName("kg-construct").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
pages = synthetic_webpages(spark, n_pages, pods=max(n_pages // 100, 10))
metrics = fragment_and_write(build_quads(pages), out)
print("FRAGMENT_METRICS", metrics)
spark.stop()
