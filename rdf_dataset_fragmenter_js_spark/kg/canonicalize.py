"""Entity canonicalization: surface forms → canonical entity ids.

Pipeline (north rule: "salted groupBy + MinHash/connected-components"):

1. normalize surfaces (lower, strip punctuation/initials);
2. salted exact grouping — the groupBy key is ``(norm, salt)`` with
   ``salt = md5(surface) % SALTS`` so one hot surface form ("Acme Corp" on
   half the web) never lands on a single reducer; partial aggregates merge
   in a second, tiny groupBy over at most SALTS rows per key;
3. MinHash-LSH over name character shingles to produce candidate pairs of
   *different* normalized forms that are likely the same entity
   ("alice johnson" ~ "alice r johnson");
4. connected components over candidate pairs (iterative min-label
   propagation) → cluster id = lexicographic min normalized form;
5. entity id = cluster representative, slugged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.textops.dedup import (
    lsh_candidate_pairs,
    near_dup_clusters,
    ngram_jaccard_pairs,
)

SALTS = 64


def normalize_surface_col(col):
    """Normalization rule: lowercase; drop single-letter initials (tokens
    like 'a.'/'r.'); strip non-alpha except spaces; collapse whitespace."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"\b[a-z]\.\s*", "")  # initials
    c = F.regexp_replace(c, r"[^a-z ]", "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def surface_counts(mentions: DataFrame, surface_col: str = "surface") -> DataFrame:
    """Salted two-phase count of surface forms → (norm, n). The first
    groupBy key carries the salt (hot keys spread over SALTS reducers), the
    second merges partials."""
    norm = normalize_surface_col(F.col(surface_col)).alias("norm")
    salted = mentions.select(
        norm,
        (
            F.conv(F.substring(F.md5(F.col(surface_col).cast("binary")), 1, 8), 16, 10).cast("long")
            % SALTS
        ).alias("salt"),
    )
    partial = salted.groupBy("norm", "salt").agg(F.count(F.lit(1)).alias("pn"))
    return partial.groupBy("norm").agg(F.sum("pn").alias("n"))


def canonical_mapping(
    mentions: DataFrame,
    surface_col: str = "surface",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Build the surface → canonical-id mapping. Returns
    (norm, canonical_id). MinHash-LSH proposes cross-form candidates; exact
    shingle Jaccard filters them; connected components merge transitive
    clusters."""
    forms = (
        mentions.select(normalize_surface_col(F.col(surface_col)).alias("norm"))
        .filter(F.col("norm") != "")
        .distinct()
    )
    docs = forms.select(F.col("norm").alias("doc_id"), F.col("norm").alias("text"))
    pairs = lsh_candidate_pairs(docs, k=8, bands=4, shingle_size=3)
    verified = ngram_jaccard_pairs(docs, pairs, shingle_size=3).filter(
        F.col("jaccard_bp") >= int(jaccard_threshold * 10000)
    )
    clusters = near_dup_clusters(verified.select("doc_a", "doc_b"))
    mapping = forms.join(
        clusters.withColumnRenamed("doc_id", "norm").withColumnRenamed(
            "cluster_id", "canonical_id"
        ),
        on="norm",
        how="left",
    ).select("norm", F.coalesce(F.col("canonical_id"), F.col("norm")).alias("canonical_id"))
    return mapping.withColumn(
        "canonical_id", F.regexp_replace(F.col("canonical_id"), " ", "_")
    )


def apply_canonicalization(
    triples: DataFrame,
    mapping: DataFrame,
    cols: tuple[str, str] = ("subj_surface", "obj_surface"),
) -> DataFrame:
    """Rewrite surface columns to canonical entity ids (two AQE-managed
    joins; the mapping side is usually broadcastable)."""
    out = triples
    for c in cols:
        m = mapping.select(
            F.col("norm").alias(f"__n_{c}"), F.col("canonical_id").alias(f"__c_{c}")
        )
        out = (
            out.withColumn(f"__norm_{c}", normalize_surface_col(F.col(c)))
            .join(m, F.col(f"__norm_{c}") == F.col(f"__n_{c}"), "left")
            .withColumn(
                c.replace("_surface", "_id"),
                F.coalesce(F.col(f"__c_{c}"), F.col(f"__norm_{c}")),
            )
            .drop(f"__norm_{c}", f"__n_{c}", f"__c_{c}")
        )
    return out
