"""Incremental (Structured Streaming) execution of a pipeline spec.

The reference is a one-pass stream processor; its ``eagerFlushing`` mode
(``lib/strategy/FragmentationBlankNodeBuffer.ts``) flushes buffered state
as data arrives instead of holding the full dataset. The batch engine's
streaming analog: an append-only directory of N-Quads files is consumed by
``readStream`` and every micro-batch runs the FULL compiled pipeline
(transformers → strategy → path mapping) with an append write — per-batch
state scope, exactly eagerFlushing's windowed semantics (bnode ownership
and resource remapping resolve within each batch).

Checkpointing makes the job resumable: re-running with the same
``checkpoint_dir`` skips already-processed files (the north rule's
"resumable from per-partition checkpoints" in streaming form — the batch
path has its own manifest-based resume, ``kg/pipeline.py``).

``trigger=availableNow`` drains everything present and stops — the
batch-of-streams deployment shape (cron-style incremental runs); omit it
for a long-running continuous job.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

_NQ_EXTENSIONS = (".nt", ".nq")


def _check_nquads_path(path: str) -> None:
    """The line reader consumes N-Quads/N-Triples only; a directory of
    ``.ttl`` files would be silently lexed as malformed lines and dropped,
    so fail fast on anything else (Turtle/RDF-XML: convert upstream)."""
    base = path.rstrip("/")
    if base.lower().endswith(_NQ_EXTENSIONS) or any(c in base for c in "*?["):
        return
    if os.path.isdir(base):
        bad = [
            f
            for f in os.listdir(base)
            if "." in f and not f.lower().endswith(_NQ_EXTENSIONS)
        ]
        if bad:
            raise ValueError(
                f"stream_pipeline_spec reads N-Quads/N-Triples lines, but "
                f"{base!r} contains {bad[:3]!r} — convert other RDF "
                "serializations to .nt/.nq before streaming them"
            )
        return
    raise ValueError(
        f"stream_pipeline_spec source filePath {path!r} must target "
        ".nt/.nq files (file, glob, or directory)"
    )

from rdf_dataset_fragmenter_js_spark.plans.pipeline import (
    build_strategy,
    build_transformer,
)
from rdf_dataset_fragmenter_js_spark.sinks.paths import map_doc_to_path
from rdf_dataset_fragmenter_js_spark.sources.nquads import (
    parse_nquads_lines,
    resolve_terms_against_base,
)


def stream_pipeline_spec(
    spark: SparkSession,
    spec: dict[str, Any],
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Run a pipeline spec incrementally over an append-only N-Quads
    directory. Returns the started StreamingQuery (caller awaits/stops).

    ``spec`` is the same componentsjs-shaped spec as ``run_pipeline_spec``;
    the source ``filePath`` must be a directory (or glob) of ``.nq``/``.nt``
    files, and the sink must be a ``QuadSinkFile`` (parquet append,
    partitioned by mapped path)."""
    src = spec["quadSource"]
    if src["@type"] != "QuadSourceFile":
        raise NotImplementedError(
            "stream_pipeline_spec consumes one append-only QuadSourceFile "
            "directory (composite sources: union upstream into one dir)"
        )
    src_path = src["filePath"]
    _check_nquads_path(src_path)
    sink = spec["quadSink"]
    if sink["@type"] != "QuadSinkFile" or sink.get("outputFormat") != "parquet":
        raise NotImplementedError(
            "stream_pipeline_spec writes the partitioned-parquet QuadSinkFile "
            "layout — set outputFormat='parquet' explicitly (the batch "
            "runner's default N-Quads file layout cannot append "
            "incrementally); compose other sinks over the written table"
        )
    # Build once; the per-batch closure re-applies the same lazy combinators
    # to each micro-batch frame (they are pure DataFrame -> DataFrame).
    transformer_specs = spec.get("transformers", [])
    strategy_spec = spec["fragmentationStrategy"]
    base_iri = src.get("baseIRI")

    def process(batch_lines: DataFrame, batch_id: int) -> None:
        df = parse_nquads_lines(batch_lines)
        if base_iri:
            # same relative-IRI semantics as the batch read_rdf path
            df = resolve_terms_against_base(df, base_iri)
        for tr in transformer_specs:
            df = build_transformer(tr)(df)
        routed = build_strategy(strategy_spec)(df)
        with_path = map_doc_to_path(
            routed, sink["iriToPath"], file_extension=sink.get("fileExtension")
        )
        with_path.write.mode("append").partitionBy("path").parquet(output_dir)

    lines = spark.readStream.text(src_path)
    writer = (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
