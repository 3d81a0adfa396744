"""Stateful transformers re-expressed as per-resource joins.

The reference's stateful operators buffer quads per resource in a stream;
batch semantics group by subject instead (order-independent, and identical
on inputs satisfying the reference's documented types-first assumption —
``README.md:618-620``, SURVEY.md §4.3). "First occurrence" is defined by the
``seq`` column via ``min_by`` wherever observable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.functions.iri import (
    resolve_iri_udf_col,
)
from rdf_dataset_fragmenter_js_spark.quads import NAMED_NODE, RDF_TYPE


def resource_table(
    quads: DataFrame,
    type_regex: str,
    target_predicate_regex: str,
    id_predicate_regex: str | None = None,
) -> DataFrame:
    """The shared per-resource join pattern
    (``lib/transform/identifier/ResourceIdentifier.ts:32-132``): subjects
    typed by ``rdf:type ~ type_regex`` (NamedNode subjects only, :56-59) with
    their first target object (``tryStoringTarget``, NamedNode enforced
    :73-89) and optionally their first identifier literal.

    Returns DataFrame[res, res_type, target(, id)]."""
    typed = (
        quads.filter(
            (F.col("s_type") == NAMED_NODE)
            & (F.col("p") == RDF_TYPE)
            & (F.col("o_type") == NAMED_NODE)
            & F.col("o").rlike(type_regex)
        )
        .groupBy(F.col("s").alias("res"))
        .agg(F.min_by("o", "seq").alias("res_type"))
    )
    targets = (
        quads.filter(F.col("p").rlike(target_predicate_regex) & (F.col("o_type") == NAMED_NODE))
        .groupBy(F.col("s").alias("res"))
        .agg(F.min_by("o", "seq").alias("target"))
    )
    out = typed.join(targets, on="res", how="inner")
    if id_predicate_regex is not None:
        ids = (
            quads.filter(F.col("p").rlike(id_predicate_regex))
            .groupBy(F.col("s").alias("res"))
            .agg(F.min_by("o", "seq").alias("id"))
        )
        out = out.join(ids, on="res", how="inner")
    return out


class RemapResourceIdentifier:
    """``QuadTransformerRemapResourceIdentifier``
    (``lib/transform/QuadTransformerRemapResourceIdentifier.ts:58-139``) — the
    flagship URI-prefix/resource remapper (LDBC post → pod IRIs).

    For every resource ``(s a <Type~regex>; <idPred> ?id; <targetPred>
    ?target)`` mints ``resolve(separator + id, target)`` (:98-100), optionally
    inheriting the original subject's ``#fragment`` (:104-110), then rewrites
    the resource IRI across ALL quads in subject and object position
    (:126-135).

    The mapping table (``mapping_table``) is exactly the reference's
    ``TransformCallbackMap`` lineage side-output
    (``lib/transformCallback/TransformCallbackMap.ts:33-43``) — persist it
    for original→pod IRI lineage.
    """

    def __init__(
        self,
        new_identifier_separator: str,
        type_regex: str,
        identifier_predicate_regex: str,
        target_predicate_regex: str,
        identifier_value_modifier: tuple[str, str] | None = None,
        keep_subject_fragment: bool = False,
    ):
        self.separator = new_identifier_separator
        self.type_regex = type_regex
        self.id_regex = identifier_predicate_regex
        self.target_regex = target_predicate_regex
        self.value_modifier = identifier_value_modifier  # (regex, replacement)
        self.keep_subject_fragment = keep_subject_fragment

    def mapping_table(self, quads: DataFrame) -> DataFrame:
        """DataFrame[res (original IRI), mapped (minted IRI)]."""
        res = resource_table(quads, self.type_regex, self.target_regex, self.id_regex)
        id_col = F.col("id")
        if self.value_modifier is not None:
            # ValueModifierRegexReplaceGroup (lib/transform/value/
            # ValueModifierRegexReplaceGroup.ts:17-19): value.replace(re, '$1')
            pattern, repl = self.value_modifier
            id_col = F.regexp_replace(id_col, pattern, repl)
        # Resolver choice is MEASURED, not dogma: this is the small side
        # (one row per resource), where the Arrow-batched UDF resolver runs
        # ~2x faster than the codegen-heavy native expression (one-window
        # A/B at sf0.1: mapping 5.4s vs 9.4s, full remap 4.7-5.1s vs
        # 19-24s — the expression also re-evaluates once per apply_mapping
        # join). Corpus-sized resolve sites (relativePath routing,
        # AppendQuadLink, baseIRI) keep the native resolve_iri_col, where
        # per-batch Python would cross the Arrow boundary per quad. Both
        # resolvers are property-tested equal (tests/test_properties.py).
        minted = resolve_iri_udf_col(F.concat(F.lit(self.separator), id_col), F.col("target"))
        if self.keep_subject_fragment:
            frag = F.when(
                F.instr(F.col("res"), "#") > 0,
                F.concat(F.lit("#"), F.substring_index(F.col("res"), "#", -1)),
            ).otherwise(F.lit(""))
            minted = F.concat(minted, frag)
        return res.select(F.col("res"), minted.alias("mapped"))

    def __call__(self, quads: DataFrame) -> DataFrame:
        return apply_mapping(quads, self.mapping_table(quads))

    def validate(self, quads: DataFrame) -> None:
        """Reference error semantics, checked as one aggregate action:
        * multiple identifier quads per resource → 'Illegal overwrite of
          identifier value' (:82-84);
        * typed resources missing id or target at end → 'Detected
          non-finalized resources' (ResourceIdentifier.ts:127-132)."""
        typed = quads.filter(
            (F.col("s_type") == NAMED_NODE)
            & (F.col("p") == RDF_TYPE)
            & (F.col("o_type") == NAMED_NODE)  # same filter as resource_table:
            # a literal rdf:type object never registers a resource
            & F.col("o").rlike(self.type_regex)
        ).select(F.col("s").alias("res")).distinct()
        ids = quads.join(typed, quads["s"] == typed["res"], "left_semi").filter(
            F.col("p").rlike(self.id_regex)
        )
        dup = ids.groupBy("s").count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(f"Illegal overwrite of identifier value on resource '{dup[0]['s']}'")
        complete = self.mapping_table(quads).select(F.col("res"))
        unfinished = typed.join(complete, on="res", how="left_anti").limit(20).collect()
        if unfinished:
            names = " ".join(r["res"] for r in unfinished)
            raise ValueError(f"Detected non-finalized resources in the buffer: {names}")


def apply_mapping(
    quads: DataFrame,
    mapping: DataFrame,
    apply_subject: bool = True,
    apply_object: bool = True,
) -> DataFrame:
    """Rewrite NamedNode subjects/objects through an (res → mapped) table.
    Two left joins + coalesce; AQE picks broadcast-hash when the mapping side
    is small and splits skewed keys otherwise (hot pod IRIs)."""
    out = quads
    if apply_subject:
        m = mapping.select(F.col("res").alias("__ms"), F.col("mapped").alias("__mapped_s"))
        out = (
            out.join(m, (out["s"] == m["__ms"]) & (out["s_type"] == NAMED_NODE), "left")
            .withColumn("s", F.coalesce(F.col("__mapped_s"), F.col("s")))
            .drop("__ms", "__mapped_s")
        )
    if apply_object:
        m = mapping.select(F.col("res").alias("__mo"), F.col("mapped").alias("__mapped_o"))
        out = (
            out.join(m, (out["o"] == m["__mo"]) & (out["o_type"] == NAMED_NODE), "left")
            .withColumn("o", F.coalesce(F.col("__mapped_o"), F.col("o")))
            .drop("__mo", "__mapped_o")
        )
    return out


def blank_to_fragment(quads: DataFrame, validate: bool = False) -> DataFrame:
    """``QuadTransformerBlankToFragment``
    (``lib/transform/QuadTransformerBlankToFragment.ts:18-36``): the FIRST
    (namedSubject, bnodeObject) quad mints ``subject-without-fragment#label``
    and has its object rewritten; later named-subject quads referencing the
    same bnode pass through UNCHANGED (reference quirk: only the minting quad
    is rewritten); bnode-subject quads are rewritten via the mapping
    (reference errors on unmapped bnode subjects — here dropped unless
    ``validate``).

    First-occurrence identity is ``(o == bnode, seq == min seq)`` — it
    assumes ``seq`` is unique per row. Expanding transformers that
    deliberately REUSE the original quad's seq as its identity (``clone``,
    ``append_quad`` — the TransformCallbackMap contract) therefore rewrite
    every copy of the minting quad when composed BEFORE this transformer,
    where the reference's stream walk rewrites only the first copy. Compose
    blank-to-fragment first (the reference configs do) to avoid the edge."""
    first_owner = (
        quads.filter((F.col("s_type") == NAMED_NODE) & (F.col("o_type") == "BlankNode"))
        .groupBy(F.col("o").alias("bnode"))
        .agg(F.min("seq").alias("first_seq"), F.min_by("s", "seq").alias("owner"))
        .withColumn(
            "fragment_iri",
            F.concat(F.substring_index(F.col("owner"), "#", 1), F.lit("#"), F.col("bnode")),
        )
    )

    if validate:
        unmapped = (
            quads.filter(F.col("s_type") == "BlankNode")
            .join(first_owner, quads["s"] == first_owner["bnode"], "left_anti")
            .limit(1)
            .collect()
        )
        if unmapped:
            raise ValueError(f"Unmapped blank node: {unmapped[0]['s']}")

    m = first_owner.select("bnode", "first_seq", "fragment_iri")
    # rewrite the minting quad's object
    out = quads.join(
        m,
        (quads["o"] == m["bnode"]) & (quads["seq"] == m["first_seq"]) & (quads["o_type"] == "BlankNode"),
        "left",
    )
    out = (
        out.withColumn(
            "o", F.when(F.col("fragment_iri").isNotNull(), F.col("fragment_iri")).otherwise(F.col("o"))
        )
        .withColumn(
            "o_type",
            F.when(F.col("fragment_iri").isNotNull(), F.lit(NAMED_NODE)).otherwise(F.col("o_type")),
        )
        .drop("bnode", "first_seq", "fragment_iri")
    )
    # rewrite bnode subjects via the mapping (drop unmapped)
    m2 = first_owner.select(F.col("bnode").alias("__b2"), F.col("fragment_iri").alias("__f2"))
    out = out.join(m2, (out["s"] == m2["__b2"]) & (out["s_type"] == "BlankNode"), "left")
    out = (
        out.filter((F.col("s_type") != "BlankNode") | F.col("__f2").isNotNull())
        .withColumn("s", F.coalesce(F.col("__f2"), F.col("s")))
        .withColumn(
            "s_type",
            F.when(F.col("__f2").isNotNull(), F.lit(NAMED_NODE)).otherwise(F.col("s_type")),
        )
        .drop("__b2", "__f2")
    )
    return out


def codepoint_sum_col(col: Column) -> Column:
    """JS ``for (i) creatorHash += value.codePointAt(i)`` then ``abs``
    (``QuadTransformerCompositeVaryingResource.ts:60-65``) — a pure Spark
    expression: aggregate over the string's code points (BMP-exact; the
    reference double-counts astral surrogates, absent from IRI data)."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def composite_varying_mapping(
    quads: DataFrame,
    type_regex: str,
    target_predicate_regex: str,
    transformers: Sequence[RemapResourceIdentifier],
) -> DataFrame | None:
    """The union of the per-branch mapping tables of
    ``QuadTransformerCompositeVaryingResource`` — exposed separately so the
    transform-callback lineage CSV (TransformCallbackMap) can reuse it."""
    n = len(transformers)
    res = resource_table(quads, type_regex, target_predicate_regex)
    res = res.withColumn("branch", F.pmod(codepoint_sum_col(F.col("target")), F.lit(n)))

    mapping = None
    for i, child in enumerate(transformers):
        branch_subjects = res.filter(F.col("branch") == i).select("res")
        branch_quads = quads.join(
            branch_subjects, quads["s"] == branch_subjects["res"], "left_semi"
        )
        m = child.mapping_table(branch_quads)
        mapping = m if mapping is None else mapping.unionByName(m)
    return mapping


def composite_varying_resource(
    quads: DataFrame,
    type_regex: str,
    target_predicate_regex: str,
    transformers: Sequence[RemapResourceIdentifier],
) -> DataFrame:
    """``QuadTransformerCompositeVaryingResource``
    (``lib/transform/QuadTransformerCompositeVaryingResource.ts:32-108``):
    captures resources by type, routes each resource to
    ``transformers[abs(codepoint_sum(target)) % N]``, and applies that
    child's remapping to the resource's quads (and references to them).

    Batch form: each child computes its mapping table over only the
    resources hashed to it; the union of mapping tables is applied globally
    (equivalent to the reference's fixpoint re-mapping loop, :73-100)."""
    mapping = composite_varying_mapping(
        quads, type_regex, target_predicate_regex, transformers
    )
    if mapping is None:
        return quads
    return apply_mapping(quads, mapping)


SOLID = "http://www.w3.org/ns/solid/terms#"


def append_resource_solid_type_index(
    quads: DataFrame,
    type_regex: str,
    profile_predicate_regex: str,
    type_index: str,
    entry_suffix: str,
    entry_reference: str,
    entry_container: bool,
) -> DataFrame:
    """``QuadTransformerAppendResourceSolidTypeIndex``
    (``lib/transform/QuadTransformerAppendResourceSolidTypeIndex.ts:60-122``):
    per typed resource with a profile target, append the 6 type-index quads.
    The reference emits them once per resource (buffer cleared on
    completion); duplicates across resources sharing a profile are expected
    and README advises wrapping in Distinct (``README.md:798-799``)."""
    res = resource_table(quads, type_regex, profile_predicate_regex)
    # per-resource (small side) → Arrow-batched resolver, like the remap
    # mapping table (see RemapResourceIdentifier.mapping_table for the
    # measured rationale)
    res = res.withColumn("type_index", resolve_iri_udf_col(F.lit(type_index), F.col("target")))
    res = res.withColumn("entry", F.concat(F.col("type_index"), F.lit(entry_suffix)))
    res = res.withColumn("instance", resolve_iri_udf_col(F.lit(entry_reference), F.col("target")))
    instance_pred = SOLID + ("instanceContainer" if entry_container else "instance")

    def q(s, p, o):
        return F.struct(
            F.lit(NAMED_NODE).alias("s_type"),
            s.alias("s"),
            p.alias("p"),
            F.lit(NAMED_NODE).alias("o_type"),
            o.alias("o"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("g"),
            F.lit(0).cast("long").alias("seq"),
        )

    appended = res.select(
        F.explode(
            F.array(
                q(F.col("target"), F.lit(SOLID + "publicTypeIndex"), F.col("type_index")),
                q(F.col("type_index"), F.lit(RDF_TYPE), F.lit(SOLID + "TypeIndex")),
                q(F.col("type_index"), F.lit(RDF_TYPE), F.lit(SOLID + "ListedDocument")),
                q(F.col("entry"), F.lit(RDF_TYPE), F.lit(SOLID + "TypeRegistration")),
                q(F.col("entry"), F.lit(SOLID + "forClass"), F.col("res_type")),
                q(F.col("entry"), F.lit(instance_pred), F.col("instance")),
            )
        ).alias("q")
    ).select("q.*")
    return quads.unionByName(appended.select(*quads.columns))
