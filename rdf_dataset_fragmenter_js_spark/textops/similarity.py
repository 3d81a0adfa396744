"""Similarity search over embedding columns (``array<float>``).

Two paths:

* ``cosine_topk_bruteforce`` — exact: query×corpus cross join with the dot
  product as a native ``F.aggregate``/``zip_with`` fold (JVM-side, no UDF).
  Correctness baseline and fine whenever |queries| is small (the cross join
  is broadcast on the query side).
* ``cosine_topk_lsh`` — the scale path: deterministic sign-bucket LSH (the
  bucket key is the sign pattern of the first ``b`` components, i.e. a
  fixed-hyperplane random projection). Queries only join their own bucket —
  the shuffle is per-bucket, not all-pairs. Recall is tunable with
  ``probe_bits`` (multi-probe: also search buckets at Hamming distance 1).

At 100 TB the brute-force path is only for re-ranking candidates; the
LSH/IVF bucketing bounds each task's candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _trunc(c: Column, digits: int) -> Column:
    """Engine-portable fixed-point truncation: floor(x*10^d)/10^d gives
    bit-identical results on Spark and DuckDB for the same input double,
    whereas round() differs (Spark rounds the decimal string HALF_UP,
    DuckDB rounds the binary double)."""
    scale = 10 ** digits
    return F.floor(c * scale) / scale


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).
    Returns (query_id, neighbor_id, score, rank). Scores are floor-truncated
    before ranking (rank ties broken by neighbor id) so results are stable
    across engines and float summation orders — floor(x*10^d)/10^d is exact
    on identical doubles, unlike decimal-string round()."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _trunc(cosine_col(F.col("qvec"), F.col("cvec")), round_digits).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def sign_bucket_col(vec: Column, bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign pattern of the first ``bits``
    components as a '0'/'1' string."""
    slice_ = F.slice(vec, 1, bits)
    return F.concat_ws(
        "", F.transform(slice_, lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")))
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors whose sign-bucket
    is within Hamming distance ``probe_hamming`` of the query's bucket
    (multi-probe). Same output schema as the brute-force path."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        sign_bucket_col(F.col(vec_col), bits).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket_col(F.col(vec_col), bits).alias("qbucket"),
    )
    # multi-probe: explode the query into its own bucket + Hamming-1 buckets
    probes = [F.col("qbucket")]
    if probe_hamming >= 1:
        for i in range(bits):
            flipped = F.concat(
                F.substring(F.col("qbucket"), 1, i),
                F.when(F.substring(F.col("qbucket"), i + 1, 1) == "1", F.lit("0")).otherwise(
                    F.lit("1")
                ),
                F.substring(F.col("qbucket"), i + 2, bits - i - 1),
            )
            probes.append(flipped)
    q = q.select(
        "query_id", "qvec", F.explode(F.array(*probes)).alias("bucket")
    ).distinct()
    scored = (
        q.join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _trunc(cosine_col(F.col("qvec"), F.col("cvec")), round_digits).alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket self-join (same
    sign-bucket) + cosine ≥ threshold. Returns (id_a, id_b, score)."""
    c = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        sign_bucket_col(F.col(vec_col), bits).alias("bucket"),
    )
    a = c.select(F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
    b = c.select(F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _trunc(cosine_col(F.col("vec_a"), F.col("vec_b")), round_digits).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
