"""Pipeline-spec compiler: the reference's componentsjs JSON-LD config
(``config/config-example.json``, ``lib/CliRunner.ts:11-19``) re-expressed as
a declarative JSON spec compiled to ONE lazy DataFrame plan.

The reference instantiates an object graph and pumps a quad stream through
it; here the same ``@type`` names compile to DataFrame combinators, so the
whole configured pipeline is a single Catalyst-optimized logical plan:
read → transformers (fused select/filter/union stages) → strategy routing →
sink (path mapping + partitioned write).

A user of the reference can port a config by keeping the same @type names
and options. Unsupported reference types raise with the file:line of the
reference component they correspond to.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from rdf_dataset_fragmenter_js_spark.operators import transformers as T
from rdf_dataset_fragmenter_js_spark.operators import stateful as ST
from rdf_dataset_fragmenter_js_spark.operators.matchers import (
    match_predicate,
    match_resource_type,
    match_term_value,
)
from rdf_dataset_fragmenter_js_spark.sinks.paths import (
    map_doc_to_path,
    sink_csv,
    sink_filtered,
    write_fragment_nquads,
    write_fragments,
)
from rdf_dataset_fragmenter_js_spark.sources.nquads import composite_source, read_rdf
from rdf_dataset_fragmenter_js_spark.strategies import (
    route_composite,
    route_constant,
    route_exception,
    route_object,
    route_resource_object,
    route_subject,
)
from rdf_dataset_fragmenter_js_spark.strategies.summaries import (
    assign_datasets,
    bloom_summary,
    void_summary,
)

Marker = Callable[[DataFrame], DataFrame]


def build_matcher(spec: dict[str, Any]) -> Marker:
    t = spec["@type"]
    if t == "QuadMatcherPredicate":
        return match_predicate(spec["predicateRegex"])
    if t == "QuadMatcherTermValue":
        return match_term_value(
            spec["term"], spec["regex"], float(spec.get("probability", 1.0))
        )
    if t == "QuadMatcherResourceType":
        return match_resource_type(
            spec["typeRegex"], bool(spec.get("matchFullResource", False))
        )
    raise ValueError(f"Unknown matcher @type {t} (lib/quadmatcher/)")


def build_transformer(spec: dict[str, Any]) -> T.Transformer:
    t = spec["@type"]
    if t == "QuadTransformerIdentity":
        return T.identity
    if t == "QuadTransformerClone":
        return T.clone
    if t == "QuadTransformerReplaceIri":
        return T.replace_iri(spec["searchRegex"], spec["replacementString"])
    if t == "QuadTransformerDistributeIri":
        return T.distribute_iri(spec["searchRegex"], spec["replacementStrings"])
    if t == "QuadTransformerSetIriExtension":
        return T.set_iri_extension(spec["extension"], spec.get("iriPattern"))
    if t == "QuadTransformerBlankToNamed":
        return T.blank_to_named(spec["searchRegex"], spec["replacementString"])
    if t == "QuadTransformerBlankToFragment":
        return lambda df: ST.blank_to_fragment(df)
    if t == "QuadTransformerCompositeSequential":
        return T.compose(*[build_transformer(s) for s in spec["transformers"]])
    if t == "QuadTransformerDistinct":
        return T.distinct_produced(build_transformer(spec["transformer"]))
    if t == "QuadTransformerAppendQuadLink":
        return T.append_quad_link(
            build_matcher(spec["matcher"]),
            spec["predicate"],
            spec["link"],
            identifier=spec.get("identifier", "subject"),
            reverse=bool(spec.get("reverse", False)),
            link_type=spec.get("linkType"),
            remove_trailing_slash=bool(spec.get("removeTrailingSlash", False)),
        )
    if t == "QuadTransformerAppendResourceLink":
        return T.append_resource_link(
            spec["typeRegex"],
            spec["predicate"],
            spec["link"],
            reverse=bool(spec.get("reverse", False)),
            link_type=spec.get("linkType"),
            remove_trailing_slash=bool(spec.get("removeTrailingSlash", False)),
        )
    if t == "QuadTransformerAppendResourceScl":
        return T.append_resource_scl(
            spec["typeRegex"], spec["identifierSuffix"], spec["sclPolicy"]
        )
    if t == "QuadTransformerAppendResourceSolidTypeIndex":
        return lambda df: ST.append_resource_solid_type_index(
            df,
            spec["typeRegex"],
            spec["profilePredicateRegex"],
            spec["typeIndex"],
            spec["entrySuffix"],
            spec["entryReference"],
            bool(spec.get("entryContainer", False)),
        )
    if t == "QuadTransformerRemapResourceIdentifier":
        modifier = None
        if "identifierValueModifier" in spec:
            vm = spec["identifierValueModifier"]
            modifier = (vm["regex"], vm.get("replacement", "$1"))
        return ST.RemapResourceIdentifier(
            spec["newIdentifierSeparator"],
            spec["typeRegex"],
            spec["identifierPredicateRegex"],
            spec["targetPredicateRegex"],
            identifier_value_modifier=modifier,
            keep_subject_fragment=bool(spec.get("keepSubjectFragment", False)),
        )
    if t == "QuadTransformerCompositeVaryingResource":
        children = [build_transformer(s) for s in spec["transformers"]]
        return lambda df: ST.composite_varying_resource(
            df, spec["typeRegex"], spec["targetPredicateRegex"], children
        )
    raise ValueError(f"Unknown transformer @type {t} (lib/transform/)")


def build_strategy(spec: dict[str, Any]):
    t = spec["@type"]
    if t == "FragmentationStrategySubject":
        return lambda df: route_subject(df, spec.get("relativePath"))
    if t == "FragmentationStrategyObject":
        return route_object
    if t == "FragmentationConstant":
        return lambda df: route_constant(df, spec["path"])
    if t == "FragmentationStrategyComposite":
        children = [build_strategy(s) for s in spec["strategies"]]
        return lambda df: route_composite(df, children)
    if t == "FragmentationStrategyResourceObject":
        return lambda df: route_resource_object(df, spec["targetPredicateRegex"])
    if t == "FragmentationStrategyException":
        base = build_strategy(spec["strategy"])
        exceptions = [
            (build_matcher(e["matcher"]), build_strategy(e["strategy"]))
            for e in spec["exceptions"]
        ]
        return lambda df: route_exception(df, base, exceptions)
    if t == "FragmentationStrategyDatasetSummaryVoID":
        # lib/strategy/FragmentationStrategyDatasetSummaryVoID.ts:10-12 —
        # dataset assignment (datasetPatterns) + per-dataset VoID summary
        # quads, routed at doc = dataset. Usually composed with a base
        # strategy via FragmentationStrategyComposite, exactly as in the
        # reference's SolidBench configs.
        patterns = list(spec["datasetPatterns"])
        return lambda df: void_summary(assign_datasets(df, patterns))
    if t == "FragmentationStrategyDatasetSummaryBloom":
        # lib/strategy/FragmentationStrategyDatasetSummaryBloom.ts:10-38
        patterns = list(spec["datasetPatterns"])
        hash_bits = int(spec["hashBits"])
        hash_count = int(spec["hashCount"])
        location_patterns = list(spec.get("locationPatterns") or []) or None
        return lambda df: bloom_summary(
            assign_datasets(df, patterns),
            hash_bits=hash_bits,
            hash_count=hash_count,
            location_patterns=location_patterns,
        )
    raise ValueError(f"Unknown strategy @type {t} (lib/strategy/)")


def build_source(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    t = spec["@type"]
    if t == "QuadSourceFile":
        # extension-dispatched (.nt/.nq vectorized, .ttl driver-parsed) with
        # the optional baseIRI resolve (QuadSourceFile.ts:12,19-25,35-37)
        return read_rdf(spark, spec["filePath"], base_iri=spec.get("baseIRI"))
    if t == "QuadSourceComposite":
        return composite_source([build_source(spark, s) for s in spec["sources"]])
    raise ValueError(f"Unknown source @type {t} (lib/io/)")


def _apply_transformer(
    tr_spec: dict[str, Any], df: DataFrame, lineage_sink: list[DataFrame] | None
) -> DataFrame:
    """Apply one transformer spec; when ``lineage_sink`` is given, record the
    (original IRI → minted IRI) mapping tables of the remap-family
    transformers as they see their actual input — the batch form of the
    reference's per-quad transform-callback lineage
    (``lib/transformCallback/TransformCallbackMap.ts:33-43``)."""
    t = tr_spec["@type"]
    if lineage_sink is not None:
        if t == "QuadTransformerCompositeSequential":
            for s in tr_spec["transformers"]:
                df = _apply_transformer(s, df, lineage_sink)
            return df
        if t == "QuadTransformerRemapResourceIdentifier":
            remap = build_transformer(tr_spec)
            # build the mapping plan ONCE and reuse it for both the rewrite
            # and the lineage CSV (remap(df) would re-derive it internally)
            m = remap.mapping_table(df)
            lineage_sink.append(m)
            return ST.apply_mapping(df, m)
        if t == "QuadTransformerCompositeVaryingResource":
            children = [build_transformer(s) for s in tr_spec["transformers"]]
            m = ST.composite_varying_mapping(
                df, tr_spec["typeRegex"], tr_spec["targetPredicateRegex"], children
            )
            if m is None:
                return df
            lineage_sink.append(m)
            return ST.apply_mapping(df, m)
    return build_transformer(tr_spec)(df)


def compile_transformed(
    spark: SparkSession, spec: dict[str, Any], lineage_sink: list[DataFrame] | None = None
) -> DataFrame:
    """Source → transformer chain (no strategy/sink) as one lazy plan."""
    df = build_source(spark, spec["quadSource"])
    for tr in spec.get("transformers", []):
        df = _apply_transformer(tr, df, lineage_sink)
    return df


def compile_pipeline(
    spark: SparkSession, spec: dict[str, Any], lineage_sink: list[DataFrame] | None = None
) -> DataFrame:
    """Spec → routed (doc, quad) DataFrame — one lazy plan, no actions."""
    transformed = compile_transformed(spark, spec, lineage_sink)
    strategy = build_strategy(spec["fragmentationStrategy"])
    return strategy(transformed)


def run_pipeline_spec(spark: SparkSession, spec: dict[str, Any] | str, output_dir: str) -> None:
    """Compile and execute a pipeline spec end-to-end, including the sink
    (iriToPath mapping + partitioned write) and any ``transformCallback``
    lineage CSVs (``Fragmenter.ts:18,31``)."""
    if isinstance(spec, str):
        with open(spec) as f:
            spec = json.load(f)
    callbacks = spec.get("transformCallback") or []
    lineage: list[DataFrame] | None = [] if callbacks else None
    transformed = compile_transformed(spark, spec, lineage_sink=lineage)
    if callbacks:
        # the mapping tables feed both the rewrite joins (inside
        # `transformed`) and the callback CSVs; the transformed frame feeds
        # the sink and every callback's matcher pass — persist both layers
        # so the source is not re-scanned per consumer
        lineage = [m.persist() for m in lineage or []]
        transformed = transformed.persist()
    try:
        strategy = build_strategy(spec["fragmentationStrategy"])
        run_sink(spark, strategy(transformed), spec["quadSink"], output_dir)
        for cb in callbacks:
            run_transform_callback(spark, cb, lineage or [], transformed)
    finally:
        if callbacks:
            transformed.unpersist()
            for m in lineage or []:
                m.unpersist()


def run_transform_callback(
    spark: SparkSession,
    cb: dict[str, Any],
    lineage_tables: list[DataFrame],
    transformed: DataFrame,
) -> None:
    """``TransformCallbackMap`` (``lib/transformCallback/
    TransformCallbackMap.ts:33-43``): write original→transformed field-value
    pairs to CSV for transformed quads matching any configured matcher.

    Batch semantics: the pairs come from the remap-family mapping tables
    (exact value lineage for identifier rewrites — the reference's
    documented original→pod-IRI workflow, ``README.md`` "Map Transform
    Callback"); a pair is written when some transformed quad carries the
    mapped value in ``fieldToMap`` and matches a matcher. Rows are distinct
    (original, mapped) pairs — the reference emits one row per matching
    quad with all matches comma-joined; for identifier remaps both forms
    carry the same single mapped value."""
    from rdf_dataset_fragmenter_js_spark.operators.matchers import TERM_COLUMNS

    t = cb["@type"]
    if t != "TransformCallbackMap":
        raise ValueError(f"Unknown transformCallback @type {t} (lib/transformCallback/)")
    field = cb["fieldToMap"]
    if field not in ("subject", "object"):
        raise NotImplementedError(
            f"TransformCallbackMap fieldToMap={field!r}: the batch lineage "
            "tracks identifier rewrites, which only touch subjects/objects"
        )
    if not lineage_tables:
        raise NotImplementedError(
            "transformCallback requires a QuadTransformerRemapResourceIdentifier "
            "or QuadTransformerCompositeVaryingResource in the transformer "
            "chain — no identifier lineage exists for this pipeline"
        )
    from functools import reduce

    from pyspark.sql import functions as F

    mapping = reduce(DataFrame.unionByName, lineage_tables).distinct()
    value_col = TERM_COLUMNS[field][0]
    matched = None
    for mspec in cb["matchers"]:
        marker = build_matcher(mspec)
        mdf = marker(transformed).filter(F.col("__match")).drop("__match")
        matched = mdf if matched is None else matched.unionByName(mdf)
    if matched is None:
        # reference semantics: no matchers → nothing ever matches → the
        # callback writes only the CSV header (TransformCallbackMap.ts:38)
        rows = mapping.select("res", "mapped").limit(0)
    else:
        matched_values = matched.select(F.col(value_col).alias("__v")).distinct()
        rows = (
            mapping.join(matched_values, mapping["mapped"] == F.col("__v"), "left_semi")
            .select("res", "mapped")
            .distinct()
        )
    _write_single_csv(rows, list(cb["columns"]), cb["file"])


def _write_single_csv(rows: DataFrame, columns: list[str], file_path: str) -> None:
    """One exact-path CSV file with header — the reference writes a plain
    file stream (TransformCallbackMap.ts:45-67); Spark writes a part file
    which is then moved into place (shared-filesystem assumption, same as
    the N-Quads fixture layout)."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="tcb_csv_")
    rows.coalesce(1).write.mode("overwrite").csv(tmp)
    parts = glob.glob(os.path.join(tmp, "part-*"))
    parent = os.path.dirname(file_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(file_path, "w") as out:
        out.write(",".join(columns) + "\n")
        for part in parts:
            with open(part) as inp:
                shutil.copyfileobj(inp, out)
    shutil.rmtree(tmp)


def _contains_file_sink(sink: dict[str, Any]) -> bool:
    """True when the sink spec (transitively) writes files under the shared
    ``output_dir`` — used to give composite children isolated subtrees."""
    t = sink["@type"]
    if t == "QuadSinkFile":
        return True
    if t == "QuadSinkFiltered":
        return _contains_file_sink(sink["sink"])
    if t == "QuadSinkComposite":
        return any(_contains_file_sink(c) for c in sink["sinks"])
    return False


def _is_nquads_chain(sink: dict[str, Any]) -> bool:
    """A QuadSinkFile in the reference N-Quads layout, possibly wrapped in
    QuadSinkFiltered layers — these children can share one output tree with
    true append semantics (below)."""
    t = sink["@type"]
    if t == "QuadSinkFiltered":
        return _is_nquads_chain(sink["sink"])
    return t == "QuadSinkFile" and sink.get("outputFormat") != "parquet"


def _nquads_chain_frame(sink: dict[str, Any], routed: DataFrame) -> DataFrame:
    """Mapped (path, quad) frame for an N-Quads chain (filters applied)."""
    if sink["@type"] == "QuadSinkFiltered":
        return _nquads_chain_frame(
            sink["sink"], sink_filtered(routed, build_matcher(sink["matcher"]))
        )
    return map_doc_to_path(
        routed, sink["iriToPath"], file_extension=sink.get("fileExtension")
    )


def run_sink(spark: SparkSession, routed: DataFrame, sink: dict[str, Any], output_dir: str) -> None:
    """Execute one sink spec over a routed (doc, quad) DataFrame.

    Supported ``@type``s (``lib/io/``): ``QuadSinkFile`` (iriToPath mapping;
    ``outputFormat`` ``application/n-quads`` → one N-Quads file per path,
    ``parquet`` → partitioned scale write), ``QuadSinkCsv`` (column
    selection), ``QuadSinkFiltered`` (matcher-gated wrap), and
    ``QuadSinkComposite`` (fan-out — the routed frame is persisted so the
    shared upstream computes once across the N write actions, the batch
    analog of the reference's sequential ``push`` fan-out,
    ``QuadSinkComposite.ts:14-24``). ``QuadSinkHdt`` is recognized but
    unsupported (external dockerized rdf2hdt post-processing,
    ``lib/io/QuadSinkHdt.ts:61-125`` — SURVEY.md §2.2)."""
    t = sink["@type"]
    if t == "QuadSinkHdt":
        raise NotImplementedError(
            "QuadSinkHdt (lib/io/QuadSinkHdt.ts:61-125) converts written "
            "N-Quads files to HDT by shelling out to a dockerized rdf2hdt "
            "binary — out of scope for this engine (SURVEY.md §2.2). Use "
            "QuadSinkFile and run rdf2hdt over the written files as a "
            "post-processing step."
        )
    if t == "QuadSinkFile":
        with_path = map_doc_to_path(
            routed, sink["iriToPath"], file_extension=sink.get("fileExtension")
        )
        if sink.get("outputFormat") == "parquet":
            # scale path: per-fragment parquet partitions + manifest-friendly
            write_fragments(with_path, output_dir)
        else:
            # reference-parity path: one N-Quads file per mapped path
            # (QuadSinkFile's on-disk layout, lib/io/QuadSinkFile.ts:67-78)
            write_fragment_nquads(with_path, output_dir).collect()
    elif t == "QuadSinkCsv":
        sink_csv(routed, sink["columns"], sink["filePath"])
    elif t == "QuadSinkFiltered":
        filtered = sink_filtered(routed, build_matcher(sink["matcher"]))
        run_sink(spark, filtered, sink["sink"], output_dir)
    elif t == "QuadSinkComposite":
        # The reference's file sinks APPEND into one tree
        # (QuadSinkComposite.ts:14-24 fans out to independently configured
        # sinks). Batch equivalents:
        # * N-Quads children — union their mapped (path, quad) frames and
        #   write ONCE: quads from different children targeting the same
        #   path land in the same file, which IS the reference's append
        #   semantics, and the on-disk layout matches the reference's.
        # * parquet children each write a whole dataset root in overwrite
        #   mode, so when the composite has more than one file output they
        #   get isolated child_<i> subtrees instead of clobbering.
        import os as _os

        children = sink["sinks"]
        nq_children = [i for i, c in enumerate(children) if _is_nquads_chain(c)]
        parquet_children = [
            i
            for i, c in enumerate(children)
            if i not in nq_children and _contains_file_sink(c)
        ]
        n_file_outputs = len(parquet_children) + (1 if nq_children else 0)
        routed = routed.persist()
        try:
            if nq_children:
                frames = [
                    _nquads_chain_frame(children[i], routed) for i in nq_children
                ]
                union = frames[0]
                for f in frames[1:]:
                    union = union.unionByName(f)
                write_fragment_nquads(union, output_dir).collect()
            for i, child in enumerate(children):
                if i in nq_children:
                    continue
                child_dir = (
                    _os.path.join(output_dir, f"child_{i}")
                    if i in parquet_children and n_file_outputs > 1
                    else output_dir
                )
                run_sink(spark, routed, child, child_dir)
        finally:
            routed.unpersist()
    else:
        raise ValueError(f"Unknown sink @type {t} (lib/io/)")
