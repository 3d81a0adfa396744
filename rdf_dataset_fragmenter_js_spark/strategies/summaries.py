"""Dataset summaries: VoID statistics and Bloom membership filters.

Reference: ``lib/strategy/FragmentationStrategyDatasetSummary.ts`` (dataset
assignment + bnode attribution), ``lib/summary/DatasetSummaryVoID.ts`` and
``lib/summary/DatasetSummaryBloom.ts`` (per-dataset aggregate state).

Spark design: dataset assignment is an explode over the configured regex
patterns (ALL match groups of every matching pattern become dataset keys,
``FragmentationStrategyDatasetSummary.ts:27-38``); the per-dataset
"register/serialize" UDAF pattern becomes ``groupBy(dataset).agg(...)``
(exact countDistinct — fixture parity; swap in ``approx_count_distinct``
via ``exact=False`` at the 100 TB scale point where ±2% is acceptable),
and the summary-quad generation is a column-level explode of struct arrays.
All counting stays JVM-side; only the murmur fragment IRIs and the Bloom
bitfields cross into vectorized Arrow UDFs.
"""

from __future__ import annotations

import base64
import re
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from rdf_dataset_fragmenter_js_spark.quads import (
    BLANK_NODE,
    LITERAL,
    NAMED_NODE,
    RDF_TYPE,
    XSD_INTEGER,
)

VOID = "http://rdfs.org/ns/void#"
MEM = "http://semweb.mmlab.be/ns/membership#"
XSD_BASE64 = "http://www.w3.org/2001/XMLSchema#base64Binary"


# ---------------------------------------------------------------------------
# Dataset assignment (FragmentationStrategyDatasetSummary.ts:27-58)
# ---------------------------------------------------------------------------


def assign_datasets(quads: DataFrame, dataset_patterns: list[str]) -> DataFrame:
    """Quads × datasets. NamedNode subjects map through every pattern; all
    match groups (including the full match, group 0) of each matching
    pattern are dataset keys — deduplicated per quad (:29-38).

    BlankNode-subject quads are attributed to the datasets of owning bnodes
    (bnode appears as object of a named-subject quad in dataset d), chased
    transitively (:69-94). The reference's chain inheritance is
    order-dependent (first-seen dataset only); batch semantics inherit the
    full union — identical on single-dataset chains (the tested case).
    """
    arrays = []
    for pat in dataset_patterns:
        groups = re.compile(pat).groups
        extracted = F.array(*[F.regexp_extract(F.col("s"), pat, g) for g in range(groups + 1)])
        arrays.append(
            F.when(F.col("s").rlike(pat), extracted).otherwise(
                F.array().cast("array<string>")
            )
        )
    all_keys = F.array_distinct(F.flatten(F.array(*arrays)))

    named = quads.filter(F.col("s_type") == NAMED_NODE).withColumn(
        "dataset", F.explode(all_keys)
    ).filter(F.col("dataset") != "")

    # bnode attribution: base links from named-subject quads with bnode objects
    bnode_quads = quads.filter(F.col("s_type") == BLANK_NODE)
    # short-circuit: no blank-node subjects → no attribution loop (saves the
    # per-iteration checkpoint jobs on bnode-free corpora, the common case)
    if bnode_quads.isEmpty():
        return named.select("dataset", *quads.columns)
    base = (
        named.filter(F.col("o_type") == BLANK_NODE)
        .select(F.col("o").alias("bnode"), F.col("dataset"))
        .distinct()
    )
    # checkpointed once: the loop re-joins edges every iteration and must
    # not re-derive the link table from the quad scan each time
    edges = (
        bnode_quads.filter(F.col("o_type") == BLANK_NODE)
        .select(F.col("s").alias("src"), F.col("o").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    owners = base.localCheckpoint(eager=True)
    frontier = owners
    for _ in range(50):
        grown = (
            frontier.join(edges, frontier["bnode"] == edges["src"])
            .select(F.col("dst").alias("bnode"), F.col("dataset"))
            .distinct()
            .join(owners, on=["bnode", "dataset"], how="left_anti")
            .localCheckpoint(eager=True)
        )
        if grown.isEmpty():
            break
        owners = owners.unionByName(grown).localCheckpoint(eager=True)
        frontier = grown

    attributed = bnode_quads.join(
        owners.withColumnRenamed("bnode", "__b"), bnode_quads["s"] == F.col("__b"), "inner"
    ).select("dataset", *[bnode_quads[c] for c in quads.columns])
    return named.select("dataset", *quads.columns).unionByName(attributed)


# ---------------------------------------------------------------------------
# VoID (DatasetSummaryVoID.ts)
# ---------------------------------------------------------------------------

def _murmur_hex(col):
    """Vectorized + batch-deduplicated murmur hex (functions/hashing.py) —
    the fragment-IRI hash (DatasetSummaryVoID.ts:180-182)."""
    from rdf_dataset_fragmenter_js_spark.functions.hashing import murmur_hex_col

    return murmur_hex_col(col)


def _term_str(type_col, value_col, dt_col=None, lang_col=None):
    """Injective term serialization for distinct-counting (the reference uses
    rdf-string ``termToString``; exact format is unobservable — only
    distinctness matters)."""
    parts = [type_col, F.lit("\x1f"), value_col]
    if dt_col is not None:
        parts += [F.lit("\x1f"), F.coalesce(dt_col, F.lit("")), F.lit("\x1f"), F.coalesce(lang_col, F.lit(""))]
    return F.concat(*parts)


_VOCAB_TRIM = r"#?(\w+)$"


def _vocab(col):
    """``vocabularyFromIri`` (DatasetSummaryVoID.ts:189-191)."""
    return F.regexp_replace(col, _VOCAB_TRIM, "")


def void_property_partitions(quads_with_dataset: DataFrame, exact: bool = True) -> DataFrame:
    """The per-(dataset, predicate) VoID partition statistics
    (``DatasetSummaryVoID.ts:58-99,139-165``): quad count + exact distinct
    subjects/objects. Exposed separately — it is the engine's canonical
    grouped-aggregation operator."""
    cd = F.countDistinct if exact else (lambda c: F.approx_count_distinct(c))
    subj_ok = F.col("s_type").isin(NAMED_NODE, BLANK_NODE)
    obj_ok = F.col("o_type").isin(NAMED_NODE, BLANK_NODE, LITERAL)
    s_str = _term_str(F.col("s_type"), F.col("s"))
    o_str = _term_str(F.col("o_type"), F.col("o"), F.col("o_datatype"), F.col("o_lang"))
    return quads_with_dataset.groupBy("dataset", "p").agg(
        F.count(F.lit(1)).alias("triples"),
        cd(F.when(subj_ok, s_str)).alias("distinct_subjects"),
        cd(F.when(obj_ok, o_str)).alias("distinct_objects"),
    )


def void_summary(quads_with_dataset: DataFrame, exact: bool = True) -> DataFrame:
    """Per-dataset VoID summary quads (``DatasetSummaryVoID.ts:104-175``),
    routed at ``doc = dataset``. Input must carry a ``dataset`` column
    (see :func:`assign_datasets`)."""
    q = quads_with_dataset
    cd = F.countDistinct if exact else (lambda c: F.approx_count_distinct(c))

    subj_ok = F.col("s_type").isin(NAMED_NODE, BLANK_NODE)
    obj_ok = F.col("o_type").isin(NAMED_NODE, BLANK_NODE, LITERAL)
    s_str = _term_str(F.col("s_type"), F.col("s"))
    o_str = _term_str(F.col("o_type"), F.col("o"), F.col("o_datatype"), F.col("o_lang"))
    is_type_quad = (F.col("p") == RDF_TYPE) & (F.col("o_type") == NAMED_NODE) & subj_ok

    ds = q.groupBy("dataset").agg(
        F.count(F.lit(1)).alias("triples"),
        cd(F.when(subj_ok, s_str)).alias("distinct_subjects"),
        cd(F.when(obj_ok, o_str)).alias("distinct_objects"),
        cd(F.col("p")).alias("properties"),
        cd(F.when(is_type_quad, F.col("o"))).alias("classes"),
        # collect_SET: the agg buffer is bounded by the distinct (p-vocab,
        # o-vocab) pairs (vocabulary-sized), not the quad count — collect_list
        # would concatenate one array per QUAD before array_distinct ran,
        # an O(dataset) single-buffer build at 100 TB. Downstream explodes
        # the array into per-vocabulary quads, so order is immaterial.
        F.array_distinct(
            F.flatten(
                F.collect_set(
                    F.when(is_type_quad, F.array(_vocab(F.col("p")), _vocab(F.col("o"))))
                    .otherwise(F.array(_vocab(F.col("p"))))
                )
            )
        ).alias("vocabularies"),
    )

    pred = void_property_partitions(q, exact=exact).withColumn(
        "partition_iri", F.concat(F.col("dataset"), F.lit("#"), _murmur_hex(F.col("p")))
    )

    cls = (
        q.filter(is_type_quad)
        .groupBy("dataset", F.col("o").alias("rdfclass"))
        .agg(cd(s_str).alias("entities"))
        .withColumn("partition_iri", F.concat(F.col("dataset"), F.lit("#"), _murmur_hex(F.col("rdfclass"))))
    )

    def sq(s, p, o, o_type=NAMED_NODE, dt=None):
        return F.struct(
            F.lit(NAMED_NODE).alias("s_type"),
            s.alias("s"),
            F.lit(p).alias("p"),
            F.lit(o_type).alias("o_type"),
            o.cast("string").alias("o"),
            (F.lit(dt) if dt else F.lit(None)).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("g"),
            F.lit(0).cast("long").alias("seq"),
        )

    d = F.col("dataset")
    ds_quads = ds.select(
        d.alias("doc"),
        F.explode(
            F.concat(
                F.array(
                    sq(d, RDF_TYPE, F.lit(VOID + "Dataset")),
                    sq(d, VOID + "uriSpace", d, o_type=LITERAL),
                    sq(d, VOID + "classes", F.col("classes"), o_type=LITERAL, dt=XSD_INTEGER),
                    sq(d, VOID + "triples", F.col("triples"), o_type=LITERAL, dt=XSD_INTEGER),
                    sq(d, VOID + "properties", F.col("properties"), o_type=LITERAL, dt=XSD_INTEGER),
                    sq(d, VOID + "distinctSubjects", F.col("distinct_subjects"), o_type=LITERAL, dt=XSD_INTEGER),
                    sq(d, VOID + "distinctObjects", F.col("distinct_objects"), o_type=LITERAL, dt=XSD_INTEGER),
                ),
                F.transform(F.col("vocabularies"), lambda v: sq(d, VOID + "vocabulary", v)),
            )
        ).alias("q"),
    )

    pi = F.col("partition_iri")
    pred_quads = pred.select(
        d.alias("doc"),
        F.explode(
            F.array(
                sq(d, VOID + "propertyPartition", pi),
                sq(pi, RDF_TYPE, F.lit(VOID + "Dataset")),
                sq(pi, VOID + "property", F.col("p")),
                sq(pi, VOID + "triples", F.col("triples"), o_type=LITERAL, dt=XSD_INTEGER),
                sq(pi, VOID + "distinctSubjects", F.col("distinct_subjects"), o_type=LITERAL, dt=XSD_INTEGER),
                sq(pi, VOID + "distinctObjects", F.col("distinct_objects"), o_type=LITERAL, dt=XSD_INTEGER),
            )
        ).alias("q"),
    )

    cls_quads = cls.select(
        d.alias("doc"),
        F.explode(
            F.array(
                sq(d, VOID + "classPartition", pi),
                sq(pi, RDF_TYPE, F.lit(VOID + "Dataset")),
                sq(pi, VOID + "class", F.col("rdfclass")),
                sq(pi, VOID + "entities", F.col("entities"), o_type=LITERAL, dt=XSD_INTEGER),
            )
        ).alias("q"),
    )

    return reduce(DataFrame.unionByName, [ds_quads, pred_quads, cls_quads]).select(
        "doc", "q.*"
    )


# ---------------------------------------------------------------------------
# Bloom (DatasetSummaryBloom.ts)
# ---------------------------------------------------------------------------


def bloom_summary(
    quads_with_dataset: DataFrame,
    hash_bits: int,
    hash_count: int,
    location_patterns: list[str] | None = None,
) -> DataFrame:
    """Per-dataset Bloom membership summaries (``DatasetSummaryBloom.ts``),
    routed at ``doc = location``.

    Each quad contributes up to 6 (kind, key, member) projections over its
    NamedNode terms (:55-71); per (dataset, kind, key) a bloem-compatible
    bitfield is aggregated in numpy inside ``applyInPandas`` and serialized
    as base64 (:97-138) with murmur fragment IRIs (:159-165).
    """
    q = quads_with_dataset
    s_ok = F.col("s_type") == NAMED_NODE
    o_ok = F.col("o_type") == NAMED_NODE

    def proj(cond, kind, key, member):
        return F.when(
            cond,
            F.struct(F.lit(kind).alias("kind"), key.alias("key"), member.alias("member")),
        )

    s, p, o = F.col("s"), F.col("p"), F.col("o")
    projections = F.array_compact(
        F.array(
            proj(s_ok, "resource", s, p),
            proj(s_ok, "property", p, s),
            proj(s_ok & o_ok, "resource", s, o),
            proj(s_ok & o_ok, "resource", o, s),
            proj(o_ok, "property", p, o),
            proj(o_ok, "resource", o, p),
        )
    )
    exploded = q.select("dataset", F.explode(projections).alias("pr")).select(
        "dataset", "pr.kind", "pr.key", "pr.member"
    )

    # Aggregation shape: per-member bit positions in one Arrow-batched UDF
    # (one Python call per ~10k-row batch), bit-set union via JVM-side
    # collect_set (map-side partial aggregation — only distinct positions
    # cross the shuffle), then one small UDF over the final group rows to
    # pack+base64. A per-group applyInPandas would instead pay one Python
    # round-trip per (dataset, kind, key) — thousands of tiny crossings.
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    from rdf_dataset_fragmenter_js_spark.functions.hashing import bloem_bit_indexes

    @pandas_udf(ArrayType(IntegerType()))
    def bit_positions(members: pd.Series) -> pd.Series:
        return members.map(
            lambda m: bloem_bit_indexes(m.encode("utf-8"), hash_bits, hash_count)
        )

    @pandas_udf(StringType())
    def pack_b64(position_sets: pd.Series) -> pd.Series:
        def build(positions):
            buf = bytearray((hash_bits + 7) // 8)  # ceil, like bloem's BitBuffer
            for idx in positions:
                buf[idx >> 3] |= 1 << (idx & 7)
            return base64.b64encode(bytes(buf)).decode("ascii")

        return position_sets.map(build)

    filters = (
        exploded.withColumn("pos", F.explode(bit_positions(F.col("member"))))
        .groupBy("dataset", "kind", "key")
        .agg(F.collect_set("pos").alias("__positions"))
        .withColumn("bitfield_b64", pack_b64(F.col("__positions")))
        .drop("__positions")
    )

    # location = first matching location pattern's full match, else dataset
    loc = F.col("dataset")
    if location_patterns:
        expr = None
        for pat in location_patterns:
            m = F.regexp_extract(F.col("dataset"), pat, 0)
            cond = F.col("dataset").rlike(pat)
            expr = F.when(cond, m) if expr is None else expr.when(cond, m)
        loc = expr.otherwise(F.col("dataset"))
    filters = filters.withColumn("location", loc)
    filters = filters.withColumn(
        "projection",
        F.when(F.col("kind") == "property", F.lit(MEM + "projectedProperty")).otherwise(
            F.lit(MEM + "projectedResource")
        ),
    )

    # fragment IRIs: base#hex(murmur(concat(values))) — incremental murmur
    # over multiple values equals murmur of their concatenation.
    hf_iri = F.concat(
        F.col("location"), F.lit("#"), _murmur_hex(F.concat(F.col("dataset"), F.lit(MEM + "HashFunction")))
    )
    coll_iri = F.concat(
        F.col("location"),
        F.lit("#"),
        _murmur_hex(
            F.concat(F.col("dataset"), F.lit(MEM + "MemberCollection"), F.col("projection"), F.col("key"))
        ),
    )
    filt_iri = F.concat(
        F.col("location"),
        F.lit("#"),
        _murmur_hex(
            F.concat(F.col("dataset"), F.lit(MEM + "BloomFilter"), F.col("projection"), F.col("key"))
        ),
    )

    def sq(s, p, o, o_type=NAMED_NODE, dt=None):
        return F.struct(
            F.lit(NAMED_NODE).alias("s_type"),
            s.alias("s"),
            F.lit(p).alias("p"),
            F.lit(o_type).alias("o_type"),
            o.cast("string").alias("o"),
            (F.lit(dt) if dt else F.lit(None)).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(None).cast("string").alias("g"),
            F.lit(0).cast("long").alias("seq"),
        )

    per_dataset = filters.select("dataset", "location", hf_iri.alias("hf")).distinct()
    hf_quads = per_dataset.select(
        F.col("location").alias("doc"),
        F.explode(
            F.array(
                sq(F.col("hf"), RDF_TYPE, F.lit(MEM + "HashFunction")),
                sq(F.col("hf"), RDF_TYPE, F.lit(MEM + "FowlerNollVo")),
                sq(F.col("hf"), MEM + "hashSize", F.lit(hash_count), o_type=LITERAL, dt=XSD_INTEGER),
            )
        ).alias("q"),
    )

    filter_quads = filters.select(
        F.col("location").alias("doc"),
        F.explode(
            F.array(
                sq(coll_iri, RDF_TYPE, F.lit(MEM + "MemberCollection")),
                sq(coll_iri, MEM + "sourceCollection", F.col("dataset")),
                F.struct(
                    F.lit(NAMED_NODE).alias("s_type"),
                    coll_iri.alias("s"),
                    F.col("projection").alias("p"),
                    F.lit(NAMED_NODE).alias("o_type"),
                    F.col("key").cast("string").alias("o"),
                    F.lit(None).cast("string").alias("o_datatype"),
                    F.lit(None).cast("string").alias("o_lang"),
                    F.lit(None).cast("string").alias("g"),
                    F.lit(0).cast("long").alias("seq"),
                ),
                sq(filt_iri, RDF_TYPE, F.lit(MEM + "MembershipFunction")),
                sq(filt_iri, RDF_TYPE, F.lit(MEM + "ApproximateMembershipFunction")),
                sq(filt_iri, RDF_TYPE, F.lit(MEM + "BloomFilter")),
                sq(filt_iri, MEM + "hashFunction", hf_iri),
                sq(filt_iri, MEM + "memberCollection", coll_iri),
                sq(filt_iri, MEM + "bitSize", F.lit(hash_bits), o_type=LITERAL, dt=XSD_INTEGER),
                sq(filt_iri, MEM + "binaryRepresentation", F.col("bitfield_b64"), o_type=LITERAL, dt=XSD_BASE64),
            )
        ).alias("q"),
    )

    return hf_quads.select("doc", "q.*").unionByName(
        filter_quads.select("doc", "q.*")
    )
