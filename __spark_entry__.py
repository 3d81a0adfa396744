"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (fragmentation strategies, transformers, summaries, sinks) plus
the training-data operators (dedup / similarity / text analysis) and the
sessionization window op. Each has a matching independent DuckDB oracle in
``oracle_sql()``.

Inputs: quad relations are derived from the driver's TPC-H-ish testdata with
engine-portable SQL (``rdf_dataset_fragmenter_js_spark/plans/testdata.py``)
that runs verbatim on Spark SQL and DuckDB, so both sides consume identical
quads and the comparison isolates the operator under test.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.operators import transformers as T
from rdf_dataset_fragmenter_js_spark.operators.matchers import match_predicate
from rdf_dataset_fragmenter_js_spark.operators.stateful import RemapResourceIdentifier
from rdf_dataset_fragmenter_js_spark.plans import testdata as TD
from rdf_dataset_fragmenter_js_spark.strategies import (
    route_constant,
    route_exception,
    route_object,
    route_resource_object,
    route_subject,
)
from rdf_dataset_fragmenter_js_spark.strategies.summaries import (
    VOID,
    assign_datasets,
    void_property_partitions,
    void_summary,
)
from rdf_dataset_fragmenter_js_spark.textops import dedup as D
from rdf_dataset_fragmenter_js_spark.textops import quality as Q
from rdf_dataset_fragmenter_js_spark.textops import similarity as S

VOCAB = TD.VOCAB
RDF_TYPE = TD.RDF_TYPE
POD_PATTERN = r"^(http://ex\.org/pods/[0-9]+/)"

QUAD_OUT = ["doc", "s_type", "s", "p", "o_type", "o"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    TD.register_views(spark, sf_dir)
    return spark.table("documents")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    TD.register_views(spark, sf_dir)
    return spark.table("embeddings")


# ---------------------------------------------------------------------------
# Fragmentation strategies
# ---------------------------------------------------------------------------


def q_frag_subject(spark, sf_dir):
    return route_subject(TD.order_quads(spark, sf_dir)).select(*QUAD_OUT)


def q_frag_subject_bnodes(spark, sf_dir):
    return route_subject(TD.bnode_quads(spark, sf_dir)).select(*QUAD_OUT)


def q_frag_object(spark, sf_dir):
    return route_object(TD.order_quads(spark, sf_dir)).select(*QUAD_OUT)


def q_frag_constant(spark, sf_dir):
    return route_constant(TD.order_quads(spark, sf_dir), "http://ex.org/all").select(*QUAD_OUT)


def q_frag_exception(spark, sf_dir):
    quads = TD.order_quads(spark, sf_dir)
    return route_exception(
        quads,
        base=route_subject,
        exceptions=[(match_predicate("hasCreator$"), route_object)],
    ).select(*QUAD_OUT)


def q_frag_resource_object(spark, sf_dir):
    quads = TD.order_quads(spark, sf_dir)
    return route_resource_object(quads, "hasCreator$").select(*QUAD_OUT)


# ---------------------------------------------------------------------------
# Transformers
# ---------------------------------------------------------------------------


def q_transform_replace_iri(spark, sf_dir):
    quads = TD.order_quads(spark, sf_dir)
    out = T.replace_iri(r"^http://ex\.org/order/([0-9]+)$", "http://ex.org/o/$1")(quads)
    return out.select("s", "p", "o_type", "o")


def q_transform_distribute_iri(spark, sf_dir):
    quads = TD.order_quads(spark, sf_dir)
    out = T.distribute_iri(
        r"^http://ex\.org/order/([0-9]+)$",
        ["http://host-a.ex/order/$1", "http://host-b.ex/order/$1"],
    )(quads)
    return out.select("s", "p", "o_type", "o")


def q_transform_set_iri_extension(spark, sf_dir):
    quads = TD.order_quads(spark, sf_dir)
    out = T.set_iri_extension("nq", iri_pattern=r"^http://ex\.org/order/")(quads)
    return out.select("s", "p", "o_type", "o")


def q_transform_append_quad_link(spark, sf_dir):
    quads = TD.order_quads(spark, sf_dir)
    out = T.append_quad_link(
        match_predicate("hasCreator$"),
        VOCAB + "postsIndex",
        "../posts",
        identifier="object",
    )(quads)
    return out.select("s", "p", "o_type", "o")


def q_transform_remap_resource(spark, sf_dir):
    quads = TD.order_quads(spark, sf_dir)
    remap = RemapResourceIdentifier("#Order", "Order$", "hasId$", "hasCreator$")
    return remap(quads).select("s", "p", "o_type", "o")


# ---------------------------------------------------------------------------
# Dataset summaries (aggregations)
# ---------------------------------------------------------------------------


def q_summary_void_dataset(spark, sf_dir):
    quads = assign_datasets(TD.pod_quads(spark, sf_dir), [POD_PATTERN])
    out = void_summary(quads)
    return out.filter(
        (F.col("s") == F.col("doc"))
        & ~F.col("p").isin(VOID + "propertyPartition", VOID + "classPartition")
    ).select("doc", "p", "o_type", "o")


def q_summary_void_properties(spark, sf_dir):
    quads = assign_datasets(TD.pod_quads(spark, sf_dir), [POD_PATTERN])
    return void_property_partitions(quads).select(
        "dataset",
        "p",
        F.col("triples").cast("long").alias("triples"),
        F.col("distinct_subjects").cast("long").alias("distinct_subjects"),
        F.col("distinct_objects").cast("long").alias("distinct_objects"),
    )


# ---------------------------------------------------------------------------
# Training-data operators: dedup / text analysis / similarity
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir)).select(
        "doc_id", "content_hash", "canonical_id", "is_duplicate"
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    return D.lsh_candidate_pairs(_docs(spark, sf_dir), k=8, bands=4, shingle_size=8)


def q_dedup_ngram_jaccard(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(docs, k=8, bands=4, shingle_size=8)
    return D.ngram_jaccard_pairs(docs, pairs, shingle_size=8)


def q_dedup_simhash(spark, sf_dir):
    return D.simhash16(_docs(spark, sf_dir))


def q_text_quality(spark, sf_dir):
    out = Q.quality_features(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_chars_m").cast("long").alias("n_chars_m"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "punct_ratio",
        "alpha_ratio",
        "stopword_ratio",
        "mean_token_len",
    )


def q_text_lang_id(spark, sf_dir):
    return Q.lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_text_fingerprint(spark, sf_dir):
    return Q.fingerprint(_docs(spark, sf_dir))


def q_sim_cosine_topk(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.cosine_topk_bruteforce(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank")
    )


def q_sim_cosine_topk_lsh(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.cosine_topk_lsh(emb, queries, k=5, bits=8, probe_hamming=1)
    return out.select(
        "query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank")
    )


def q_sim_embedding_near_dups(spark, sf_dir):
    return S.embedding_near_dups(_embeddings(spark, sf_dir), threshold=0.25, bits=8)


def q_events_sessionize(spark, sf_dir):
    from rdf_dataset_fragmenter_js_spark.streaming.sessions import sessionize_counts

    TD.register_views(spark, sf_dir)
    return sessionize_counts(spark.table("events"), gap_seconds=1800)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: LDBC-style resource remap + subject fragmentation over the
    sf0.001 order quads (the reference's headline pipeline, README.md:607+)."""
    sf_dir = "/root/testdata/sf0.001"
    quads = TD.order_quads(spark, sf_dir)
    remap = RemapResourceIdentifier("#Order", "Order$", "hasId$", "hasCreator$")
    return route_subject(remap(quads)).select(*QUAD_OUT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frag_subject": q_frag_subject,
        "frag_subject_bnodes": q_frag_subject_bnodes,
        "frag_object": q_frag_object,
        "frag_constant": q_frag_constant,
        "frag_exception": q_frag_exception,
        "frag_resource_object": q_frag_resource_object,
        "transform_replace_iri": q_transform_replace_iri,
        "transform_distribute_iri": q_transform_distribute_iri,
        "transform_set_iri_extension": q_transform_set_iri_extension,
        "transform_append_quad_link": q_transform_append_quad_link,
        "transform_remap_resource": q_transform_remap_resource,
        "summary_void_dataset": q_summary_void_dataset,
        "summary_void_properties": q_summary_void_properties,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_simhash": q_dedup_simhash,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "sim_cosine_topk": q_sim_cosine_topk,
        "sim_cosine_topk_lsh": q_sim_cosine_topk_lsh,
        "sim_embedding_near_dups": q_sim_embedding_near_dups,
        "events_sessionize": q_events_sessionize,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_ORDER_QUADS = TD.ORDER_QUADS_SQL
_BNODE_QUADS = TD.BNODE_QUADS_SQL
_POD_QUADS = TD.POD_QUADS_SQL

_SHINGLES = """
shingles AS (
  SELECT DISTINCT doc_id, substring(text, g, 8) AS shingle
  FROM (
    SELECT doc_id, text,
           unnest(generate_series(1, greatest(length(text) - 7, 1))) AS g
    FROM documents
  )
)
"""

_MINHASH_SIG = (
    "sig AS (SELECT doc_id, "
    + ", ".join(f"min(md5('{i}:' || shingle)) AS mh_{i}" for i in range(8))
    + " FROM shingles GROUP BY doc_id)"
)

_BANDED = (
    "banded AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(mh_{2 * b} || '|' || mh_{2 * b + 1}) AS band_key FROM sig"
        for b in range(4)
    )
    + ")"
)

_LSH_PAIRS = f"""
WITH {_SHINGLES.strip().rstrip()},
{_MINHASH_SIG},
{_BANDED}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def _stopword_hits_sql(lang: str) -> str:
    words = Q.STOPWORDS[lang]
    terms = " + ".join(
        f"(len(regexp_split_to_array(' ' || lower(text) || ' ', '\\s{w}\\s')) - 1)"
        for w in words
    )
    return f"({terms})"


_LANG_CASE = f"""
CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
     WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
     WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
     WHEN h_en >= h_de THEN 'en'
     ELSE 'de' END
"""

_SIMHASH_BITS = ", ".join(
    "CASE WHEN sum(CASE WHEN (floor((instr('0123456789abcdef', substring(md5(tok), {c}, 1)) - 1) / {p}) % 2) = 1 "
    "THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END AS sb_{b}".format(
        c=(b // 4) + 1, p=2 ** (b % 4), b=b
    )
    for b in range(16)
)

_COSINE = (
    "floor(1000 * list_dot_product(qvec, cvec) / "
    "(sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(cvec, cvec)))) / 1000"
)

_BUCKET8 = " || ".join(
    f"CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(8)
)


def oracle_sql() -> dict[str, str]:
    return {
        "frag_subject": f"""
            WITH quads AS ({_ORDER_QUADS})
            SELECT s AS doc, s_type, s, p, o_type, o FROM quads
        """,
        "frag_subject_bnodes": f"""
            WITH quads AS ({_BNODE_QUADS})
            SELECT CASE WHEN s_type = 'NamedNode' THEN s
                        ELSE 'http://ex.org/order/' || substring(s, 2) END AS doc,
                   s_type, s, p, o_type, o
            FROM quads
        """,
        "frag_object": f"""
            WITH quads AS ({_ORDER_QUADS})
            SELECT o AS doc, s_type, s, p, o_type, o FROM quads WHERE o_type = 'NamedNode'
        """,
        "frag_constant": f"""
            WITH quads AS ({_ORDER_QUADS})
            SELECT 'http://ex.org/all' AS doc, s_type, s, p, o_type, o FROM quads
        """,
        "frag_exception": f"""
            WITH quads AS ({_ORDER_QUADS})
            SELECT CASE WHEN p LIKE '%hasCreator' THEN o ELSE s END AS doc,
                   s_type, s, p, o_type, o
            FROM quads
        """,
        "frag_resource_object": f"""
            WITH quads AS ({_ORDER_QUADS}),
            targets AS (
              SELECT s, min_by(o, seq) AS doc FROM quads
              WHERE p LIKE '%hasCreator' AND o_type = 'NamedNode' GROUP BY s
            )
            SELECT t.doc, q.s_type, q.s, q.p, q.o_type, q.o
            FROM quads q JOIN targets t ON q.s = t.s
        """,
        "transform_replace_iri": f"""
            WITH quads AS ({_ORDER_QUADS})
            SELECT regexp_replace(s, '^http://ex\\.org/order/([0-9]+)$', 'http://ex.org/o/\\1') AS s,
                   p, o_type,
                   CASE WHEN o_type = 'NamedNode'
                        THEN regexp_replace(o, '^http://ex\\.org/order/([0-9]+)$', 'http://ex.org/o/\\1')
                        ELSE o END AS o
            FROM quads
        """,
        "transform_distribute_iri": f"""
            WITH quads AS ({_ORDER_QUADS})
            SELECT CASE WHEN regexp_matches(s, '^http://ex\\.org/order/[0-9]+$')
                        THEN CASE WHEN CAST(regexp_extract(s, '^http://ex\\.org/order/([0-9]+)$', 1) AS BIGINT) % 2 = 0
                                  THEN regexp_replace(s, '^http://ex\\.org/order/([0-9]+)$', 'http://host-a.ex/order/\\1')
                                  ELSE regexp_replace(s, '^http://ex\\.org/order/([0-9]+)$', 'http://host-b.ex/order/\\1') END
                        ELSE s END AS s,
                   p, o_type, o
            FROM quads
        """,
        "transform_set_iri_extension": f"""
            WITH quads AS ({_ORDER_QUADS})
            SELECT CASE WHEN s LIKE 'http://ex.org/order/%' THEN s || '.nq' ELSE s END AS s,
                   p, o_type, o
            FROM quads
        """,
        "transform_append_quad_link": f"""
            WITH quads AS ({_ORDER_QUADS})
            SELECT s, p, o_type, o FROM quads
            UNION ALL
            SELECT o AS s, '{VOCAB}postsIndex' AS p, 'NamedNode' AS o_type,
                   regexp_replace(o, '/profile/card#me$', '/posts') AS o
            FROM quads WHERE p LIKE '%hasCreator'
        """,
        "transform_remap_resource": f"""
            WITH quads AS ({_ORDER_QUADS}),
            mapping AS (
              SELECT t.s AS res,
                     split_part(t.o, '#', 1) || '#Order' || i.o AS mapped
              FROM quads t JOIN quads i ON t.s = i.s
              WHERE t.p LIKE '%hasCreator' AND i.p LIKE '%hasId'
            )
            SELECT coalesce(ms.mapped, q.s) AS s, q.p, q.o_type,
                   CASE WHEN q.o_type = 'NamedNode' THEN coalesce(mo.mapped, q.o) ELSE q.o END AS o
            FROM quads q
            LEFT JOIN mapping ms ON q.s = ms.res
            LEFT JOIN mapping mo ON q.o = mo.res AND q.o_type = 'NamedNode'
        """,
        "summary_void_dataset": f"""
            WITH quads AS ({_POD_QUADS}),
            dq AS (
              SELECT 'http://ex.org/pods/' || CAST(o.o_custkey AS STRING) || '/' AS dataset, q.*
              FROM quads q
              JOIN orders o ON q.s = 'http://ex.org/pods/' || CAST(o.o_custkey AS STRING)
                               || '/order/' || CAST(o.o_orderkey AS STRING)
            ),
            agg AS (
              SELECT dataset,
                     COUNT(*) AS triples,
                     COUNT(DISTINCT s) AS distinct_subjects,
                     COUNT(DISTINCT o_type || chr(31) || o) AS distinct_objects,
                     COUNT(DISTINCT p) AS properties,
                     COUNT(DISTINCT CASE WHEN p = '{RDF_TYPE}' THEN o END) AS classes
              FROM dq GROUP BY dataset
            )
            SELECT dataset AS doc, '{RDF_TYPE}' AS p, 'NamedNode' AS o_type, '{VOID}Dataset' AS o FROM agg
            UNION ALL SELECT dataset, '{VOID}uriSpace', 'Literal', dataset FROM agg
            UNION ALL SELECT dataset, '{VOID}classes', 'Literal', CAST(classes AS STRING) FROM agg
            UNION ALL SELECT dataset, '{VOID}triples', 'Literal', CAST(triples AS STRING) FROM agg
            UNION ALL SELECT dataset, '{VOID}properties', 'Literal', CAST(properties AS STRING) FROM agg
            UNION ALL SELECT dataset, '{VOID}distinctSubjects', 'Literal', CAST(distinct_subjects AS STRING) FROM agg
            UNION ALL SELECT dataset, '{VOID}distinctObjects', 'Literal', CAST(distinct_objects AS STRING) FROM agg
            UNION ALL SELECT dataset, '{VOID}vocabulary', 'NamedNode', 'http://ex.org/vocab' FROM agg
            UNION ALL SELECT dataset, '{VOID}vocabulary', 'NamedNode', 'http://www.w3.org/1999/02/22-rdf-syntax-ns' FROM agg
        """,
        "summary_void_properties": f"""
            WITH quads AS ({_POD_QUADS}),
            dq AS (
              SELECT regexp_extract(s, '^(http://ex\\.org/pods/[0-9]+/)', 1) AS dataset, q.*
              FROM quads q
            )
            SELECT dataset, p,
                   COUNT(*) AS triples,
                   COUNT(DISTINCT s) AS distinct_subjects,
                   COUNT(DISTINCT o_type || chr(31) || o) AS distinct_objects
            FROM dq GROUP BY dataset, p
        """,
        "dedup_exact": """
            WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
            canon AS (SELECT content_hash, min(doc_id) AS canonical_id FROM h GROUP BY content_hash)
            SELECT h.doc_id, h.content_hash, c.canonical_id,
                   h.doc_id <> c.canonical_id AS is_duplicate
            FROM h JOIN canon c ON h.content_hash = c.content_hash
        """,
        "dedup_minhash_lsh": _LSH_PAIRS,
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLES.strip()},
            {_MINHASH_SIG},
            {_BANDED},
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
            inter AS (
              SELECT p.doc_a, p.doc_b, COUNT(*) AS i
              FROM pairs p
              JOIN shingles sa ON sa.doc_id = p.doc_a
              JOIN shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
              GROUP BY p.doc_a, p.doc_b
            )
            SELECT i.doc_a, i.doc_b,
                   CAST(floor(i.i * 10000.0 / (na.n + nb.n - i.i)) AS BIGINT) AS jaccard_bp
            FROM inter i
            JOIN sizes na ON na.doc_id = i.doc_a
            JOIN sizes nb ON nb.doc_id = i.doc_b
        """,
        "dedup_simhash": f"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
              FROM documents
            ), t AS (SELECT doc_id, tok FROM toks WHERE tok <> '')
            SELECT doc_id, {" || ".join(f"sb_{b}" for b in range(16))} AS simhash
            FROM (SELECT doc_id, {_SIMHASH_BITS} FROM t GROUP BY doc_id)
        """,
        "text_quality": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_m,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
                   round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                         / greatest(length(text), 1), 6) AS punct_ratio,
                   round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                         / greatest(length(text), 1), 6) AS alpha_ratio,
                   round(CAST(__EN_HITS__ AS DOUBLE)
                         / greatest(CASE WHEN trim(text) = '' THEN 0
                                         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1), 6)
                     AS stopword_ratio,
                   round(CAST(length(text) AS DOUBLE)
                         / greatest(CASE WHEN trim(text) = '' THEN 0
                                         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1), 6)
                     AS mean_token_len
            FROM documents
        """.replace("__EN_HITS__", _stopword_hits_sql("en")),
        "text_lang_id": f"""
            WITH h AS (
              SELECT doc_id,
                     {_stopword_hits_sql("de")} AS h_de,
                     {_stopword_hits_sql("en")} AS h_en,
                     {_stopword_hits_sql("es")} AS h_es,
                     {_stopword_hits_sql("fr")} AS h_fr
              FROM documents
            )
            SELECT doc_id, {_LANG_CASE} AS lang_pred FROM h
        """,
        "text_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents
        """,
        "sim_cosine_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cvec FROM embeddings),
            scored AS (
              SELECT query_id, neighbor_id, {_COSINE} AS score
              FROM q, c WHERE query_id <> neighbor_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, score,
                     row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
              FROM scored
            )
            SELECT query_id, neighbor_id, score, CAST(rn AS BIGINT) AS rank
            FROM ranked WHERE rn <= 5
        """,
        "sim_embedding_near_dups": f"""
            WITH v AS (
              SELECT vec_id, embedding::DOUBLE[] AS vec, {_BUCKET8} AS bucket
              FROM embeddings
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     floor(1000 * list_dot_product(a.vec, b.vec) /
                           (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec)))) / 1000 AS score
              FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, score FROM pairs WHERE score >= 0.25
        """,
        "events_sessionize": """
            WITH lagged AS (
              SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            ),
            flags AS (
              SELECT user_id,
                     CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800 THEN 1 ELSE 0 END AS new_s
              FROM lagged
            )
            SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM flags GROUP BY user_id
        """,
    }
