"""Document-IRI → filesystem path mapping (``lib/io/QuadSinkFile.ts:42-78``).

Semantics replicated exactly, all JVM-side Column expressions:

1. strip the hash fragment (:44-47);
2. among the configured ``iriToPath`` regexes, the one whose FIRST match in
   the IRI is LONGEST wins (:50-59) — strictly-greater comparison, so ties
   keep the earliest-configured regex;
3. no match → error (:62-64) — here a null path the plan layer asserts on;
4. regex-substitute with the winning replacement (:67);
5. illegal filename chars ``[*|"<>?:]`` → ``_`` (:70);
6. optionally append ``fileExtension`` (:73-75) — note the reference's
   guard tests the *extension* against ``/\\.[a-z]$/i`` (appends unless the
   extension is exactly dot+one letter), replicated verbatim.

The longest-match arbitration uses ``regexp_extract(iri, pat, 0)`` (the full
first match, same as JS ``exec()[0]``) and an argmax over
``struct(length, -index)`` — pure expressions, whole-stage codegen, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ILLEGAL_CHARS = r'[*|"<>?:]'


def strip_hash_col(iri: Column) -> Column:
    return F.when(
        F.instr(iri, "#") > 0, F.substring_index(iri, "#", 1)
    ).otherwise(iri)


def iri_to_path_col(iri: Column, iri_to_path: dict[str, str], file_extension: str | None = None) -> Column:
    """Build the path Column for a document IRI. Null when no regex matches
    (the reference throws ``No IRI mapping found``)."""
    stripped = strip_hash_col(iri)

    entries = list(iri_to_path.items())
    # argmax over (match length, -position) — earliest wins ties because the
    # reference only replaces on strictly-greater match length.
    candidates = [
        F.struct(
            F.length(F.regexp_extract(stripped, pat, 0)).alias("len"),
            F.lit(-i).alias("neg_idx"),
            F.lit(i).alias("idx"),
        )
        for i, (pat, _) in enumerate(entries)
    ]
    best = F.greatest(*candidates) if len(candidates) > 1 else candidates[0]
    best_idx = best["idx"]
    matched = best["len"] > 0

    path = F.lit(None).cast("string")
    expr = None
    for i, (pat, repl) in enumerate(entries):
        branch = F.regexp_replace(stripped, pat, repl)
        expr = F.when(best_idx == i, branch) if expr is None else expr.when(best_idx == i, branch)
    path = F.when(matched, expr)

    path = F.regexp_replace(path, ILLEGAL_CHARS, "_")
    if file_extension and not re.search(r"\.[a-z]$", file_extension, re.IGNORECASE):
        path = F.concat(path, F.lit(file_extension))
    return path


def map_doc_to_path(
    routed: DataFrame,
    iri_to_path: dict[str, str],
    file_extension: str | None = None,
    strict: bool = True,
) -> DataFrame:
    """Append a ``path`` column mapped from ``doc``. With ``strict``, raise at
    action time if any doc has no mapping (reference: hard error,
    ``QuadSinkFile.ts:62-64``) — expressed with ``raise_error`` inside the
    plan so it needs no extra pass over the data."""
    path = iri_to_path_col(F.col("doc"), iri_to_path, file_extension)
    if strict:
        path = F.when(
            path.isNull() & F.col("doc").isNotNull(),
            F.raise_error(F.concat(F.lit("No IRI mapping found for "), F.col("doc"))),
        ).otherwise(path)
    return routed.withColumn("path", path)


def write_fragments(
    routed_with_path: DataFrame,
    output_dir: str,
    partitions: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write per-fragment parquet, partitioned by path hash.

    The reference bounds open file descriptors with a 128-stream LRU
    (``lib/io/ParallelFileWriter.ts:24-32``); Spark's FileFormatWriter sorts
    rows by partition key within each task, so one file is open at a time —
    we only bound the number of output *partitions* via repartition on the
    path, which also co-locates each fragment's quads.
    """
    df = routed_with_path
    if partitions:
        df = df.repartition(partitions, F.col("path"))
    writer = df.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy("path").parquet(output_dir)


def sink_csv(routed: DataFrame, columns: list[str], path: str) -> None:
    """``QuadSinkCsv`` (``lib/io/QuadSinkCsv.ts:42-60``): write selected quad
    term values as CSV with header; single file for parity with the
    reference's one-file output."""
    from rdf_dataset_fragmenter_js_spark.operators.matchers import TERM_COLUMNS

    cols = [F.col(TERM_COLUMNS[c][0]).alias(c) for c in columns]
    routed.select(*cols).coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def sink_filtered(routed: DataFrame, marker) -> DataFrame:
    """``QuadSinkFiltered`` (``lib/io/QuadSinkFiltered.ts:21-25``)."""
    return marker(routed).filter(F.col("__match")).drop("__match")
