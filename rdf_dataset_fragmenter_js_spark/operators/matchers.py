"""Quad matchers (``lib/quadmatcher/*``) — boolean predicates over quads.

A *marker* is ``DataFrame -> DataFrame`` appending a boolean ``__match``
column. Stateless matchers are pure Column expressions; the full-resource
matcher needs a self-join and therefore the DataFrame form. Markers compose
with ``route_exception`` and ``sink_filtered``.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.functions.hashing import murmur_prob_col
from rdf_dataset_fragmenter_js_spark.quads import RDF_TYPE

Marker = Callable[[DataFrame], DataFrame]

#: quad component name (RDF/JS QuadTermName) → (value column, type column)
TERM_COLUMNS = {
    "subject": ("s", "s_type"),
    "predicate": ("p", None),
    "object": ("o", "o_type"),
    "graph": ("g", None),
}


def _marker_from_expr(expr_fn: Callable[[DataFrame], Column]) -> Marker:
    def marker(df: DataFrame) -> DataFrame:
        return df.withColumn("__match", F.coalesce(expr_fn(df), F.lit(False)))

    return marker


def match_predicate(regex: str) -> Marker:
    """``QuadMatcherPredicate`` (``lib/quadmatcher/QuadMatcherPredicate.ts:14-16``):
    JS ``regex.test(predicate.value)`` — an unanchored search, which is
    exactly Spark's ``rlike``."""
    return _marker_from_expr(lambda df: F.col("p").rlike(regex))


def match_term_value(term: str, regex: str, probability: float = 1.0) -> Marker:
    """``QuadMatcherTermValue`` (``lib/quadmatcher/QuadMatcherTermValue.ts:22-31``):
    regex on the chosen component; on match, deterministic sampling —
    ``MurmurHash3(group1 ?? value) / (MAX_SAFE_INTEGER>>>0) <= probability``.

    The murmur hash is the bit-exact imurmurhash UDF (Spark's ``hash()`` is a
    different Murmur3 variant).

    Graph component: the JS ``DefaultGraph`` term has ``value === ""``, while
    the engine stores the default graph as NULL — coalesced here so
    ``regex.test("")`` semantics (e.g. ``.*`` matching default-graph quads)
    carry over. Known edge: a capture group that PARTICIPATES but captures
    the empty string is indistinguishable from a non-participating group in
    Spark's ``regexp_extract`` (both return ``""``); JS hashes ``""`` for the
    former — for such regexes the sampling hash input falls back to the full
    value here."""
    value_col, _ = TERM_COLUMNS[term]
    has_group = re.compile(regex).groups >= 1

    def expr(df: DataFrame) -> Column:
        col = F.col(value_col)
        if term == "graph":
            col = F.coalesce(col, F.lit(""))
        matched = col.rlike(regex)
        if probability >= 1.0:
            return matched
        if has_group:
            extracted = F.regexp_extract(col, regex, 1)
            # JS `match.at(1) ?? value`: non-participating group → full value.
            hash_input = F.when(extracted != "", extracted).otherwise(col)
        else:
            hash_input = col
        return matched & (murmur_prob_col(hash_input) <= F.lit(float(probability)))

    return _marker_from_expr(expr)


def match_resource_type(type_regex: str, match_full_resource: bool = False) -> Marker:
    """``QuadMatcherResourceType`` (``lib/quadmatcher/QuadMatcherResourceType.ts:31-44``):
    matches ``?s rdf:type <Type~regex>`` quads; with ``match_full_resource``,
    every quad whose subject is such a typed resource matches (the
    reference "remembers subjects" — in batch this is a semi-join against the
    typed-subjects table, order-independent and strictly more general than
    the stream's types-first assumption, SURVEY.md §4.3)."""
    type_quad = (F.col("p") == RDF_TYPE) & F.col("o").rlike(type_regex)
    if not match_full_resource:
        return _marker_from_expr(lambda df: type_quad)

    def marker(df: DataFrame) -> DataFrame:
        typed = (
            df.filter(type_quad)
            .select(F.col("s").alias("__typed_s"))
            .distinct()
        )
        # AQE decides broadcast vs shuffle-hash from the typed-set's real size.
        out = df.join(typed, df["s"] == typed["__typed_s"], "left")
        return out.withColumn("__match", F.col("__typed_s").isNotNull()).drop("__typed_s")

    return marker
