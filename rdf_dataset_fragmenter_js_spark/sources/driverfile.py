"""Shared tail for the driver-parsed sources (Turtle, RDF/XML): glob/dir
expansion, the driver-parse size guard, per-file parsing with a running
``seq`` offset, and distribution of the parsed rows."""

from __future__ import annotations

import glob as _glob
import logging
import os
from collections.abc import Callable

logger = logging.getLogger(__name__)

#: parse warning threshold — these formats parse on the driver
LARGE_FILE_BYTES = 128 * 1024 * 1024


def expand_paths(path: str, extensions: tuple[str, ...]) -> list[str]:
    """One file path, a glob, or a directory → ordered concrete file list
    (keeps the N-Quads reader's glob/directory ergonomics for the
    driver-side formats)."""
    if any(c in path for c in "*?["):
        files = sorted(_glob.glob(path))
    elif os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.lower().endswith(extensions)
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no files match {path!r}")
    return files


def read_driver_parsed(
    spark,
    path: str,
    extensions: tuple[str, ...],
    base_iri: str | None,
    parse_fn: Callable[[str, str], list[tuple]],
    format_name: str,
):
    """Read + parse each matched file on the driver (``parse_fn(text,
    base_iri) -> quad tuples``) and distribute the rows. ``base_iri``
    defaults per file to its file URI, like rdf-parse's ``path`` option."""
    from rdf_dataset_fragmenter_js_spark.quads import QUAD_SCHEMA

    rows: list[tuple] = []
    for file_path in expand_paths(path, extensions):
        size = os.path.getsize(file_path)
        if size > LARGE_FILE_BYTES:
            logger.warning(
                "%s: %s is %d MB and parses on the driver — convert large "
                "inputs to N-Quads for splittable, vectorized reads",
                format_name,
                file_path,
                size >> 20,
            )
        with open(file_path, encoding="utf-8") as f:
            text = f.read()
        base = base_iri if base_iri is not None else "file://" + os.path.abspath(file_path)
        offset = len(rows)
        for q in parse_fn(text, base):
            # re-index seq across files (source arrival order)
            rows.append(q[:-1] + (offset + q[-1],))
    df = spark.createDataFrame(rows, QUAD_SCHEMA)
    target = spark.sparkContext.defaultParallelism
    if len(rows) > 10 * target:
        df = df.repartition(target)
    return df
