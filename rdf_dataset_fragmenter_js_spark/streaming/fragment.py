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
    the source is a ``QuadSourceFile`` (directory/glob of ``.nq``/``.nt``
    files) or a ``QuadSourceComposite`` of them (per-child ``baseIRI``
    honored), and the sink a ``QuadSinkFile`` — ``outputFormat='parquet'``
    appends exactly-once partitioned parquet; the default N-Quads layout
    appends per-fragment ``.nq`` files (at-least-once under batch replay,
    like the reference's append streams)."""
    from pyspark.sql import functions as F

    src = spec["quadSource"]
    if src["@type"] == "QuadSourceFile":
        children = [src]
    elif src["@type"] == "QuadSourceComposite":
        children = list(src["sources"])
        for c in children:
            if c["@type"] != "QuadSourceFile":
                raise NotImplementedError(
                    "stream_pipeline_spec composite sources must be "
                    "QuadSourceFile children (nested composites: flatten)"
                )
    else:
        raise NotImplementedError(
            f"stream_pipeline_spec cannot consume source @type {src['@type']!r}"
        )
    for c in children:
        _check_nquads_path(c["filePath"])
    sink = spec["quadSink"]
    if sink["@type"] != "QuadSinkFile":
        raise NotImplementedError(
            "stream_pipeline_spec writes QuadSinkFile layouts only "
            "(parquet or per-fragment N-Quads); compose other sinks over "
            "the written table"
        )
    parquet_sink = sink.get("outputFormat") == "parquet"
    # Build once; the per-batch closure re-applies the same lazy combinators
    # to each micro-batch frame (they are pure DataFrame -> DataFrame).
    transformer_specs = spec.get("transformers", [])
    strategy_spec = spec["fragmentationStrategy"]
    base_iris = [c.get("baseIRI") for c in children]

    def process(batch_lines: DataFrame, batch_id: int) -> None:
        parts = []
        for i, base_iri in enumerate(base_iris):
            part = parse_nquads_lines(
                batch_lines.filter(F.col("__src") == i).select("value")
            )
            if base_iri:
                # same relative-IRI semantics as the batch read_rdf path
                part = resolve_terms_against_base(part, base_iri)
            parts.append(part)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        for tr in transformer_specs:
            df = build_transformer(tr)(df)
        routed = build_strategy(strategy_spec)(df)
        with_path = map_doc_to_path(
            routed, sink["iriToPath"], file_extension=sink.get("fileExtension")
        )
        if parquet_sink:
            with_path.write.mode("append").partitionBy("path").parquet(output_dir)
        else:
            from rdf_dataset_fragmenter_js_spark.sinks.paths import (
                append_fragment_nquads,
            )

            append_fragment_nquads(with_path, output_dir).collect()

    lines = None
    for i, c in enumerate(children):
        part = spark.readStream.text(c["filePath"]).withColumn("__src", F.lit(i))
        lines = part if lines is None else lines.unionByName(part)
    writer = (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
