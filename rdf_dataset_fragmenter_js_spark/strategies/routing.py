"""Fragmentation strategies as pure DataFrame → DataFrame routing functions.

Each returns a DataFrame with a leading ``doc`` column (the fragment
document IRI — the reference sink contract ``push(iri, quad)``,
``lib/io/IQuadSink.ts:6-17``) followed by the quad columns.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.functions.iri import resolve_iri_col
from rdf_dataset_fragmenter_js_spark.quads import NAMED_NODE
from rdf_dataset_fragmenter_js_spark.strategies.bnode import route_bnode_quads

Strategy = Callable[[DataFrame], DataFrame]


def _with_doc(df: DataFrame, doc) -> DataFrame:
    return df.select(doc.alias("doc"), *df.columns)


def route_subject(quads: DataFrame, relative_path: str | None = None) -> DataFrame:
    """Subject fragmentation (``lib/strategy/FragmentationStrategySubject.ts:20-38``).

    * NamedNode subjects: doc = subject IRI; with ``relative_path``, doc =
      resolve(relative_path, subject-with-trailing-slash) (:24-25).
    * BlankNode subjects: routed to every owning named subject's **raw IRI**
      (the reference flushes to ``key.value``, not the resolved doc —
      FragmentationBlankNodeBuffer.ts:80).
    * Other subject term types are dropped.
    """
    named = quads.filter(F.col("s_type") == NAMED_NODE)
    if relative_path is not None:
        base = F.when(F.col("s").endswith("/"), F.col("s")).otherwise(F.concat(F.col("s"), F.lit("/")))
        doc = resolve_iri_col(F.lit(relative_path), base)
    else:
        doc = F.col("s")
    routed_named = _with_doc(named, doc)
    routed_bnodes = route_bnode_quads(quads, "s", "s_type", "o", "o_type")
    return routed_named.unionByName(routed_bnodes)


def route_object(quads: DataFrame) -> DataFrame:
    """Object fragmentation (``lib/strategy/FragmentationStrategyObject.ts``):
    doc = object IRI for NamedNode objects; bnode objects routed via the
    symmetric ownership buffer (object key, subject value)."""
    named = quads.filter(F.col("o_type") == NAMED_NODE)
    routed_named = _with_doc(named, F.col("o"))
    routed_bnodes = route_bnode_quads(quads, "o", "o_type", "s", "s_type")
    return routed_named.unionByName(routed_bnodes)


def route_constant(quads: DataFrame, path: str) -> DataFrame:
    """Constant routing (``lib/strategy/FragmentationConstant.ts:19-21``)."""
    return _with_doc(quads, F.lit(path))


def route_composite(quads: DataFrame, strategies: Sequence[Strategy]) -> DataFrame:
    """Tee fan-out (``lib/strategy/FragmentationStrategyComposite.ts:18-26``):
    every quad goes through every strategy; results are unioned. Catalyst
    reuses the shared scan; callers running multiple actions should
    ``.persist()`` the input."""
    out = None
    for strategy in strategies:
        routed = strategy(quads)
        out = routed if out is None else out.unionByName(routed)
    if out is None:
        raise ValueError("route_composite requires at least one strategy")
    return out


def route_exception(
    quads: DataFrame,
    base: Strategy,
    exceptions: Sequence[tuple[Callable[[DataFrame], DataFrame], Strategy]],
) -> DataFrame:
    """First-match exception routing
    (``lib/strategy/FragmentationStrategyException.ts:69-78``): a quad goes to
    the FIRST exception whose matcher matches, else to the base strategy.

    ``exceptions`` is a list of ``(marker, strategy)`` where ``marker(df)``
    appends a boolean column named ``__match`` (see operators.matchers).
    Implemented as disjoint filters — ``m1``, ``¬m1∧m2``, …, ``¬m1∧…∧¬mk`` —
    so each quad lands in exactly one branch, preserving first-match wins.
    """
    marked = quads
    names = []
    for i, (marker, _) in enumerate(exceptions):
        name = f"__m{i}"
        marked = marker(marked).withColumnRenamed("__match", name)
        names.append(name)

    out = None
    prior_not = F.lit(True)
    for name, (_, strategy) in zip(names, exceptions):
        branch = marked.filter(prior_not & F.col(name)).drop(*names)
        routed = strategy(branch)
        out = routed if out is None else out.unionByName(routed)
        prior_not = prior_not & ~F.col(name)
    base_branch = marked.filter(prior_not).drop(*names)
    routed = base(base_branch)
    return routed if out is None else out.unionByName(routed)


def route_resource_object(
    quads: DataFrame,
    target_predicate_regex: str,
    check_named_target: bool = True,
) -> DataFrame:
    """Resource-object routing
    (``lib/strategy/FragmentationStrategyResourceObject.ts:23-70``): group all
    quads by subject; the document is the object of the subject's FIRST quad
    (stream order = ``seq``) whose predicate matches ``targetPredicateRegex``.
    Subjects with no target are dropped (reference warns, :55-59); a
    non-NamedNode target raises in the reference (:41-43) — replicated as
    an in-plan ``raise_error`` that fires at action time. Pass
    ``check_named_target=False`` to skip the check (literal targets then
    become document IRIs verbatim).
    """
    matches = quads.filter(F.col("p").rlike(target_predicate_regex))
    if check_named_target:
        matches = matches.withColumn(
            "o",
            F.when(
                F.col("o_type") != NAMED_NODE,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "FragmentationStrategyResourceObject: target "
                            "predicate value must be a NamedNode, got "
                        ),
                        F.col("o_type"),
                        F.lit(" on subject "),
                        F.col("s"),
                    )
                ),
            ).otherwise(F.col("o")),
        )
    targets = matches.groupBy("s").agg(F.min_by("o", "seq").alias("doc"))
    return quads.join(targets, on="s", how="inner").select(
        "doc", *[c for c in quads.columns]
    )
