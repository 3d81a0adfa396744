"""Example cluster job: training-data preparation over a documents table.
Reads (doc_id, text, lang) parquet, runs the full hygiene composition —
quality filter -> benchmark decontamination -> exact dedup -> token-budget
shard packing — and writes the packed survivor manifest partitioned by
(stream, shard_id), plus the top-k corpus vocabulary.

Run: spark-submit --py-files engine.zip dataprep_job.py \
         <docs.parquet> <benchmark.parquet> <out_dir> [budget_tokens]
"""
import sys

from pyspark.sql import SparkSession

from rdf_dataset_fragmenter_js_spark.textops.corpus import corpus_vocab, prepare_corpus

docs_path, bench_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
budget = int(sys.argv[4]) if len(sys.argv) > 4 else 100_000

spark = SparkSession.builder.appName("dataprep").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(docs_path)
bench = spark.read.parquet(bench_path)

packed = prepare_corpus(docs, bench, budget_tokens=budget)
packed.write.mode("overwrite").partitionBy("stream", "shard_id").parquet(
    f"{out}/shards"
)
corpus_vocab(docs, top_k=10_000).write.mode("overwrite").parquet(f"{out}/vocab")

stats = packed.groupBy("stream").count().collect()
print("PACKED_STREAMS", {r["stream"]: r["count"] for r in stats})
spark.stop()
