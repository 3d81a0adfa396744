"""JS-regex compatibility layer (SURVEY.md §4.2.2).

The reference compiles user patterns as JS ``new RegExp(pattern, 'u')`` and
replaces with NON-global ``String.replace`` — i.e. first occurrence only,
``$n`` group references (``lib/transform/QuadTransformerReplaceIri.ts:20-26``).
Spark's ``regexp_replace`` uses the Java dialect and replaces ALL
occurrences. Differences that can be observed by real configs:

* first-occurrence-only replace  → ``replace_first_col`` below;
* ``$n`` references              → same syntax in Java, pass-through;
* JS ``u``-flag                  → Java regex is already code-point based for
  the constructs the reference configs use (no observable difference for the
  IRI-shaped patterns in the fixture corpus).

``replace_first_col`` stays JVM-side: Java's ``regexp_replace`` semantics are
emulated by anchoring via ``regexp_extract`` of the full remainder — but the
general, always-correct implementation is a vectorized pandas ``re.sub(...,
count=1)``. Patterns that are anchored (``^...$``) — the overwhelming
majority in reference configs — can use plain ``regexp_replace`` (at most one
match), which `replace_iri` chooses automatically.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_JS_GROUP_REF = re.compile(r"\$(\d+)")


def js_replacement_to_python(replacement: str) -> str:
    r"""JS ``$1`` group references → Python ``\1``."""
    return _JS_GROUP_REF.sub(r"\\\1", replacement)


def is_effectively_anchored(pattern: str) -> bool:
    """True when the pattern can match at most once per string, making
    Spark's replace-all equal to JS's replace-first."""
    return pattern.startswith("^") or pattern.endswith("$")


def replace_first_col(col: Column, pattern: str, replacement: str) -> Column:
    """JS ``String.replace(new RegExp(pattern,'u'), replacement)`` — first
    occurrence only, ``$n`` backrefs. Uses native ``regexp_replace`` when the
    pattern is anchored (hot path, whole-stage codegen); otherwise an
    Arrow-batched pandas UDF with ``re.sub(count=1)``.
    """
    if is_effectively_anchored(pattern):
        return F.regexp_replace(col, pattern, replacement)

    py_repl = js_replacement_to_python(replacement)
    compiled = re.compile(pattern)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else compiled.sub(py_repl, v, count=1))

    return _udf(col)
