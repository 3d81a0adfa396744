"""Stateless quad transformers (``lib/transform/*``) — each is a pure
``DataFrame[quads] -> DataFrame[quads]`` (the reference's per-quad flatMap
``quad -> quad[]``, ``lib/transform/IQuadTransformer.ts:13``, becomes
filter/select/union combinators that Catalyst fuses into one stage).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.functions.iri import resolve_iri_col
from rdf_dataset_fragmenter_js_spark.functions.regex_compat import replace_first_col
from rdf_dataset_fragmenter_js_spark.quads import (
    BLANK_NODE,
    NAMED_NODE,
    QUAD_VALUE_COLUMNS,
    RDF_TYPE,
)

Transformer = Callable[[DataFrame], DataFrame]

#: (value column, type column or None) for the four quad components.
_COMPONENTS = [("s", "s_type"), ("p", None), ("o", "o_type"), ("g", None)]


def identity(df: DataFrame) -> DataFrame:
    """``QuadTransformerIdentity`` (``lib/transform/QuadTransformerIdentity.ts:9-11``)."""
    return df


def clone(df: DataFrame) -> DataFrame:
    """``QuadTransformerClone`` (``lib/transform/QuadTransformerClone.ts:9-11``):
    emits each quad twice."""
    return df.unionByName(df)


def compose(*transformers: Transformer) -> Transformer:
    """``QuadTransformerCompositeSequential``
    (``lib/transform/QuadTransformerCompositeSequential.ts:16-23``)."""

    def transform(df: DataFrame) -> DataFrame:
        for t in transformers:
            df = t(df)
        return df

    return transform


def _map_named(df: DataFrame, fn: Callable[[Column], Column]) -> DataFrame:
    """Apply ``fn`` to the value of every NamedNode component (the
    ``QuadTransformerTerms`` pattern, ``lib/transform/QuadTransformerTerms.ts:10-14``;
    predicates and graphs are NamedNodes whenever present)."""
    out = df
    for value_col, type_col in _COMPONENTS:
        cond = F.col(type_col) == NAMED_NODE if type_col else F.col(value_col).isNotNull()
        out = out.withColumn(
            value_col, F.when(cond, fn(F.col(value_col))).otherwise(F.col(value_col))
        )
    return out


def replace_iri(pattern: str, replacement: str) -> Transformer:
    """``QuadTransformerReplaceIri`` (``lib/transform/QuadTransformerReplaceIri.ts:20-26``):
    JS first-occurrence regex replace with ``$n`` refs on every NamedNode."""
    return lambda df: _map_named(df, lambda c: replace_first_col(c, pattern, replacement))


def distribute_iri(pattern: str, replacements: Sequence[str]) -> Transformer:
    """``QuadTransformerDistributeIri`` (``lib/transform/QuadTransformerDistributeIri.ts:26-42``):
    for NamedNodes matching ``pattern`` (group 1 must be a number ``n``),
    replace using ``replacements[n % len(replacements)]``. Non-numeric group-1
    values raise in the reference; here they surface as nulls the plan layer
    asserts on (fail-fast at action time, not per row)."""
    if re.compile(pattern).groups < 1:
        raise ValueError(
            "'searchRegex' did not contain any groups, while "
            "QuadTransformerDistributeIri requires at least one group-based "
            "replacement, of which the first group must match a number."
        )
    k = len(replacements)

    def fn(c: Column) -> Column:
        matched = c.rlike(pattern)
        n = F.regexp_extract(c, pattern, 1).cast("long")
        chain = F.lit(None).cast("string")
        # build when-chain: idx == i -> replace with replacements[i]
        expr = None
        idx = F.pmod(n, F.lit(k))
        for i, repl in enumerate(replacements):
            branch = replace_first_col(c, pattern, repl)
            expr = F.when(idx == i, branch) if expr is None else expr.when(idx == i, branch)
        del chain
        return F.when(matched, expr).otherwise(c)

    return lambda df: _map_named(df, fn)


def set_iri_extension(extension: str, iri_pattern: str | None = None) -> Transformer:
    """``QuadTransformerSetIriExtension``
    (``lib/transform/QuadTransformerSetIriExtension.ts:21-31``): strip an
    existing ``.ext`` suffix (``/\\.[a-z]*$/i``), append ``.extension`` on
    NamedNodes (optionally only those matching ``iri_pattern``)."""

    def fn(c: Column) -> Column:
        new = F.concat(
            F.regexp_replace(c, r"\.[a-zA-Z]*$", ""), F.lit("." + extension)
        )
        if iri_pattern is not None:
            return F.when(c.rlike(iri_pattern), new).otherwise(c)
        return new

    return lambda df: _map_named(df, fn)


def blank_to_named(pattern: str, replacement: str) -> Transformer:
    """``QuadTransformerBlankToNamed`` (``lib/transform/QuadTransformerBlankToNamed.ts:21-29``):
    regex-replace BlankNode labels; promote to NamedNode iff the value
    changed."""

    def transform(df: DataFrame) -> DataFrame:
        out = df
        for value_col, type_col in _COMPONENTS:
            if type_col is None:
                continue  # predicates/graphs are never blank in reference data
            replaced = replace_first_col(F.col(value_col), pattern, replacement)
            changed = (F.col(type_col) == BLANK_NODE) & (replaced != F.col(value_col))
            # single select: both columns derive from the ORIGINAL type/value
            out = out.withColumns(
                {
                    type_col: F.when(changed, F.lit(NAMED_NODE)).otherwise(F.col(type_col)),
                    value_col: F.when(changed, replaced).otherwise(F.col(value_col)),
                }
            )
        return out

    return transform


def distinct_produced(transformer: Transformer) -> Transformer:
    """``QuadTransformerDistinct`` (``lib/transform/QuadTransformerDistinct.ts:19-34``):
    wraps a transformer and drops duplicate *produced* quads, while quads
    identical to their input always pass through.

    Batch semantics: rows unchanged by the wrapped transformer pass through
    untouched (with multiplicity); changed/new rows are deduplicated on quad
    value."""

    def transform(df: DataFrame) -> DataFrame:
        produced = transformer(df)
        unchanged = produced.join(
            df.select(*QUAD_VALUE_COLUMNS).distinct(), on=QUAD_VALUE_COLUMNS, how="left_semi"
        )
        new = produced.join(
            df.select(*QUAD_VALUE_COLUMNS).distinct(), on=QUAD_VALUE_COLUMNS, how="left_anti"
        ).dropDuplicates(QUAD_VALUE_COLUMNS)
        return unchanged.unionByName(new)

    return transform


# ---------------------------------------------------------------------------
# Append-family transformers
# ---------------------------------------------------------------------------


def _append(df: DataFrame, appended: DataFrame) -> DataFrame:
    return df.unionByName(appended.select(*df.columns))


def append_quad(
    marker: Callable[[DataFrame], DataFrame],
    s=None,
    p=None,
    o=None,
    g=None,
) -> Transformer:
    """``QuadTransformerAppendQuad`` (``lib/transform/QuadTransformerAppendQuad.ts:21-39``):
    for every matcher-matching quad, append one quad built from term
    templates. Each template is either None (copy that component — the
    ``TermTemplateQuadComponent`` template) or a dict:
    ``{"component": "subject"}`` | ``{"value": "<iri>"}`` |
    ``{"component": "object", "literal": True, "datatype": ..., "language": ...}``
    (the three ``lib/transform/termtemplate/*`` templates)."""

    def template(df: DataFrame, spec, comp: str):
        from rdf_dataset_fragmenter_js_spark.operators.matchers import TERM_COLUMNS

        value_col, type_col = TERM_COLUMNS[comp]
        if spec is None:
            cols = {
                "subject": (F.col("s_type"), F.col("s")),
                "predicate": (F.lit(NAMED_NODE), F.col("p")),
                "object": (F.col("o_type"), F.col("o")),
                "graph": (F.lit(NAMED_NODE), F.col("g")),
            }
            return cols[comp] + (
                (F.col("o_datatype"), F.col("o_lang")) if comp == "object" else (F.lit(None), F.lit(None))
            )
        if "value" in spec:
            return F.lit(NAMED_NODE), F.lit(spec["value"]), F.lit(None), F.lit(None)
        src_value, _ = TERM_COLUMNS[spec["component"]]
        if spec.get("literal"):
            return (
                F.lit("Literal"),
                F.col(src_value),
                F.lit(spec.get("datatype")),
                F.lit(spec.get("language")),
            )
        # component reference keeps the source term's own type; predicate and
        # graph components are always NamedNodes (TermTemplateQuadComponent
        # returns the component term as-is — lib/transform/termtemplate/
        # TermTemplateQuadComponent.ts:12-17)
        src_type_col = TERM_COLUMNS[spec["component"]][1]
        src_type = F.col(src_type_col) if src_type_col else F.lit(NAMED_NODE)
        return src_type, F.col(src_value), F.lit(None), F.lit(None)

    def transform(df: DataFrame) -> DataFrame:
        matched = marker(df).filter(F.col("__match")).drop("__match")
        s_t, s_v, _, _ = template(matched, s, "subject")
        _, p_v, _, _ = template(matched, p, "predicate")
        o_t, o_v, o_dt, o_lang = template(matched, o, "object")
        # None = copy, uniformly with s/p/o (the reference's graph param is
        # a required ITermTemplate; TermTemplateQuadComponent on 'graph' is
        # its copy form — QuadTransformerAppendQuad.ts:18,37)
        g_v = template(matched, g, "graph")[1]
        appended = matched.select(
            s_t.alias("s_type"),
            s_v.alias("s"),
            p_v.alias("p"),
            o_t.alias("o_type"),
            o_v.alias("o"),
            o_dt.cast("string").alias("o_datatype"),
            o_lang.cast("string").alias("o_lang"),
            g_v.cast("string").alias("g"),
            F.col("seq"),
        )
        return _append(df, appended)

    return transform


def append_quad_link(
    marker: Callable[[DataFrame], DataFrame],
    predicate: str,
    link: str,
    identifier: str = "subject",
    reverse: bool = False,
    link_type: str | None = None,
    remove_trailing_slash: bool = False,
) -> Transformer:
    """``QuadTransformerAppendQuadLink``
    (``lib/transform/QuadTransformerAppendQuadLink.ts:43-76``): for each
    matching quad, append ``identifierTerm --predicate--> resolve(link,
    identifier + '/')``; ``reverse`` flips subject/object (:66-70); optional
    ``rdf:type`` triple on the link target (:73-75); optionally strip the
    identifier's trailing slash in the minted link (:60-62)."""
    from rdf_dataset_fragmenter_js_spark.operators.matchers import TERM_COLUMNS

    id_col, _ = TERM_COLUMNS[identifier]

    def transform(df: DataFrame) -> DataFrame:
        matched = marker(df).filter(F.col("__match")).drop("__match")
        base = F.when(
            F.col(id_col).endswith("/"), F.col(id_col)
        ).otherwise(F.concat(F.col(id_col), F.lit("/")))
        target = resolve_iri_col(F.lit(link), base)
        ident = (
            F.regexp_replace(F.col(id_col), "/$", "")
            if remove_trailing_slash
            else F.col(id_col)
        )
        s_v, o_v = (target, ident) if reverse else (ident, target)
        link_quads = matched.select(
            F.lit(NAMED_NODE).alias("s_type"),
            s_v.alias("s"),
            F.lit(predicate).alias("p"),
            F.lit(NAMED_NODE).alias("o_type"),
            o_v.alias("o"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("g"),
            F.col("seq"),
        )
        out = _append(df, link_quads)
        if link_type is not None:
            type_quads = matched.select(
                F.lit(NAMED_NODE).alias("s_type"),
                target.alias("s"),
                F.lit(RDF_TYPE).alias("p"),
                F.lit(NAMED_NODE).alias("o_type"),
                F.lit(link_type).alias("o"),
                F.lit(None).cast("string").alias("o_datatype"),
                F.lit(None).cast("string").alias("o_lang"),
                F.lit(None).cast("string").alias("g"),
                F.col("seq"),
            )
            out = _append(out, type_quads)
        return out

    return transform


def typed_resource_marker(type_regex: str):
    """Marker for ``QuadTransformerAppendResourceAdapter``
    (``lib/transform/QuadTransformerAppendResourceAdapter.ts:19-30``):
    matches ``?s rdf:type <Type~regex>`` quads."""
    from rdf_dataset_fragmenter_js_spark.operators.matchers import _marker_from_expr

    return _marker_from_expr(
        lambda df: (F.col("p") == RDF_TYPE) & F.col("o").rlike(type_regex)
    )


def append_resource_link(
    type_regex: str,
    predicate: str,
    link: str,
    reverse: bool = False,
    link_type: str | None = None,
    remove_trailing_slash: bool = False,
) -> Transformer:
    """``QuadTransformerAppendResourceLink``
    (``lib/transform/QuadTransformerAppendResourceLink.ts:37-57``)."""
    return append_quad_link(
        typed_resource_marker(type_regex),
        predicate,
        link,
        identifier="subject",
        reverse=reverse,
        link_type=link_type,
        remove_trailing_slash=remove_trailing_slash,
    )


SCL_APPLIES_TO = "https://w3id.org/scl/vocab#appliesTo"
SCL_SCOPE = "https://w3id.org/scl/vocab#scope"
SCL_DATATYPE = "https://w3id.org/scl/vocab#SCL"


def append_resource_scl(type_regex: str, policy_iri: str, policy_scope: str) -> Transformer:
    """``QuadTransformerAppendResourceScl``
    (``lib/transform/QuadTransformerAppendResourceScl.ts:32-42``): appends
    ``<policy> scl:appliesTo ?s`` and ``<policy> scl:scope "scope"^^scl:SCL``
    per typed resource."""
    marker = typed_resource_marker(type_regex)

    def transform(df: DataFrame) -> DataFrame:
        matched = marker(df).filter(F.col("__match")).drop("__match")
        pairs = matched.select(
            F.col("s").alias("__res"), F.col("seq")
        ).select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(NAMED_NODE).alias("s_type"),
                        F.lit(policy_iri).alias("s"),
                        F.lit(SCL_APPLIES_TO).alias("p"),
                        F.lit(NAMED_NODE).alias("o_type"),
                        F.col("__res").alias("o"),
                        F.lit(None).cast("string").alias("o_datatype"),
                        F.lit(None).cast("string").alias("o_lang"),
                        F.lit(None).cast("string").alias("g"),
                        F.col("seq").alias("seq"),
                    ),
                    F.struct(
                        F.lit(NAMED_NODE).alias("s_type"),
                        F.lit(policy_iri).alias("s"),
                        F.lit(SCL_SCOPE).alias("p"),
                        F.lit("Literal").alias("o_type"),
                        F.lit(policy_scope).alias("o"),
                        F.lit(SCL_DATATYPE).cast("string").alias("o_datatype"),
                        F.lit(None).cast("string").alias("o_lang"),
                        F.lit(None).cast("string").alias("g"),
                        F.col("seq").alias("seq"),
                    ),
                )
            ).alias("q")
        ).select("q.*")
        return _append(df, pairs)

    return transform
