"""The quad relation — the engine's core data model.

The reference processes RDF/JS quad object streams
(``lib/io/IQuadSink.ts:12``, ``lib/transform/IQuadTransformer.ts:13``).
We flatten each quad into one DataFrame row; flattened string columns (not a
nested struct) so Catalyst predicate pushdown / column pruning reach the
parquet scan and Arrow paths stay fast.

Columns
-------
s_type      'NamedNode' | 'BlankNode'             (subject term type)
s           subject IRI or blank-node label
p           predicate IRI (always a NamedNode in reference data)
o_type      'NamedNode' | 'BlankNode' | 'Literal'
o           object IRI / label / literal lexical form
o_datatype  literal datatype IRI (nullable)
o_lang      literal language tag (nullable)
g           graph IRI (nullable; null = default graph). Blank-node graph
            labels encode in-band as '_:<label>' — g has no companion
            type column, and '_:' can never prefix an absolute IRI
seq         source arrival order — makes the reference's stream-order-
            sensitive semantics (SURVEY.md §4.3) deterministic in batch

Routed outputs add ``doc`` (fragment document IRI) — the reference's sink
contract ``push(iri, quad)`` (``lib/io/IQuadSink.ts:6-17``).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

NAMED_NODE = "NamedNode"
BLANK_NODE = "BlankNode"
LITERAL = "Literal"

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
RDF_LANG_STRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

QUAD_COLUMNS = ["s_type", "s", "p", "o_type", "o", "o_datatype", "o_lang", "g", "seq"]

#: Columns identifying the quad itself (used for multiset comparisons / distinct).
QUAD_VALUE_COLUMNS = ["s_type", "s", "p", "o_type", "o", "o_datatype", "o_lang", "g"]

QUAD_SCHEMA = StructType(
    [
        StructField("s_type", StringType(), False),
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o_type", StringType(), False),
        StructField("o", StringType(), False),
        StructField("o_datatype", StringType(), True),
        StructField("o_lang", StringType(), True),
        StructField("g", StringType(), True),
        StructField("seq", LongType(), False),
    ]
)


def quad(
    s: str,
    p: str,
    o: str,
    *,
    s_type: str = NAMED_NODE,
    o_type: str = NAMED_NODE,
    o_datatype: str | None = None,
    o_lang: str | None = None,
    g: str | None = None,
    seq: int = 0,
) -> tuple:
    """Build one quad row tuple (test/fixture helper)."""
    return (s_type, s, p, o_type, o, o_datatype, o_lang, g, seq)


def quads_df(spark: SparkSession, rows: Iterable[tuple]) -> DataFrame:
    """Materialize quad rows into a DataFrame with the canonical schema.

    ``seq`` is assigned from iteration order when the provided value is 0
    for every row beyond the first (fixture convenience).
    """
    rows = list(rows)
    if rows and all(r[-1] == 0 for r in rows):
        rows = [(*r[:-1], i) for i, r in enumerate(rows)]
    return spark.createDataFrame(rows, QUAD_SCHEMA)
