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


def random_hyperplanes(bits: int, proj_dim: int, seed: int = 0) -> list[list[float]]:
    """Deterministic Rademacher (±1) random hyperplanes, seeded via md5 —
    genuine random projections (unlike raw component signs, whose recall
    collapses when individual dimensions are uninformative), yet exactly
    reproducible by any engine: entry (j, i) is the parity of
    md5('{seed}:{j}:{i}'). ±1 entries keep the projection a sequence of
    exact IEEE add/subtract steps, so Spark's aggregate fold and an SQL
    left-associated sum produce bit-identical signs."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
            for i in range(proj_dim)
        ]
        for j in range(bits)
    ]


def hyperplane_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket key: sign pattern of ``vec`` projected on each hyperplane
    ('1' when the ±1-weighted sum of the first len(plane) components is
    ≥ 0). Pure Column fold — JVM-side, no UDF."""
    bits = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(w) for w in plane])
        dot = F.aggregate(
            F.zip_with(F.slice(vec, 1, len(plane)), lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _hamming_probes(bucket: Column, bits: int, probe_hamming: int) -> list[Column]:
    """The bucket plus (when probe_hamming ≥ 1) its ``bits`` Hamming-1
    flips, as string Columns."""
    probes = [bucket]
    if probe_hamming >= 1:
        for i in range(bits):
            probes.append(
                F.concat(
                    F.substring(bucket, 1, i),
                    F.when(F.substring(bucket, i + 1, 1) == "1", F.lit("0")).otherwise(
                        F.lit("1")
                    ),
                    F.substring(bucket, i + 2, bits - i - 1),
                )
            )
    return probes


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    probe_hamming: int = 1,
    tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
    proj_dim: int | None = None,
    seed: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates restricted to vectors sharing an LSH
    bucket with the query in ANY of ``tables`` independent hash tables
    (classic L-table LSH — recall grows with L at linear candidate cost),
    each probed at its own bucket plus Hamming-``probe_hamming`` neighbors.
    Buckets are seeded random-hyperplane projections over the first
    ``proj_dim`` components (default 2×bits, per-table seeds) — see
    :func:`random_hyperplanes`. Every join is keyed on (table, bucket):
    the shuffle is bucket-local, never all-pairs. Same output schema as the
    brute-force path."""
    all_planes = [
        random_hyperplanes(bits, proj_dim or 2 * bits, seed=seed + 1000 * t)
        for t in range(tables)
    ]
    c_structs = [
        F.struct(
            F.lit(t).alias("t"),
            hyperplane_bucket_col(F.col(vec_col), planes).alias("bucket"),
        )
        for t, planes in enumerate(all_planes)
    ]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.explode(F.array(*c_structs)).alias("tb"),
    ).select("neighbor_id", "cvec", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))

    probe_structs = []
    for t, planes in enumerate(all_planes):
        qbucket = hyperplane_bucket_col(F.col(vec_col), planes)
        for probe in _hamming_probes(qbucket, bits, probe_hamming):
            probe_structs.append(F.struct(F.lit(t).alias("t"), probe.alias("bucket")))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(F.array(*probe_structs)).alias("tb"),
        )
        .select("query_id", "qvec", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket"))
        .distinct()
    )
    scored = (
        q.join(c, on=["t", "bucket"])
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


def quantize_col(vec: Column, scale: int) -> Column:
    """Fixed-point quantization ``floor(x·scale)`` per component (long).

    IVF's clustering arithmetic runs on these integers so every engine
    computes bit-identical centroids: integer dot products and sums are
    exactly representable in doubles at these magnitudes (|comp| ≤ scale,
    dim ≤ a few hundred → partial sums ≪ 2^53), which makes the result
    independent of summation order — the property float arithmetic lacks
    and the reason a naive distributed k-means cannot be oracle-checked."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def _qdot(a: Column, b: Column) -> Column:
    """Dot product of quantized (integer) vectors, evaluated in doubles —
    exact at IVF magnitudes (see :func:`quantize_col`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _nearest_centroids(vectors: DataFrame, centroids: DataFrame, n: int) -> DataFrame:
    """For each (vid, qvec) row: the ``n`` centroids maximizing the
    normalized integer dot product (ties → lower cid). Centroid side is
    broadcast (K rows)."""
    # deliberate K-row broadcast nested-loop: every vector scores every
    # centroid (that IS the coarse quantizer); K stays tiny by design
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vid",
        "cid",
        (_qdot(F.col("qvec"), F.col("cvec")) / F.sqrt(_qdot(F.col("cvec"), F.col("cvec")))).alias(
            "cscore"
        ),
    )
    w = Window.partitionBy("vid").orderBy(F.desc("cscore"), F.asc("cid"))
    return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n).select(
        "vid", "cid"
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 3,
    iterations: int = 2,
    scale: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 3,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the classic coarse-quantizer
    scale path: Lloyd-iterated centroids partition the corpus into K
    inverted lists; a query scores only the lists of its ``n_probe``
    nearest centroids, then candidates are re-ranked by exact cosine.

    Deterministic and engine-portable by construction (DuckDB oracle runs
    the identical algorithm): init = the ``n_centroids`` lowest-id vectors,
    all clustering arithmetic on fixed-point integers (exact in any
    summation order), centroid update = per-component ``floor(mean)``,
    empty clusters keep their previous centroid.

    At scale: centroid set is K rows (broadcast everywhere); each Lloyd
    iteration is one broadcast-join argmax + one (cid, pos) aggregation —
    shuffles carry K·dim rows; the probe join is list-local, never
    all-pairs. Recall tunes with ``n_probe``/``n_centroids``."""
    qc = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        quantize_col(F.col(vec_col), scale).alias("qvec"),
    )
    # Init = the n_centroids lowest-id vectors. sort().limit(K) compiles to
    # TakeOrderedAndProject — a per-partition top-K merged on the driver —
    # so no corpus-wide single-partition Sort/Window ever runs. Ranking the
    # K checkpointed seed rows into cids uses an explicit one-partition
    # sort + monotonically_increasing_id (0..K-1 in row order within the
    # single partition) instead of a global row_number window: same result,
    # no WindowExec at all (Spark folds constant partition keys, so even
    # Window.partitionBy(lit(0)) would plan — and warn — as unpartitioned).
    seed = (
        qc.select("vid", "qvec")
        .sort("vid")
        .limit(n_centroids)
        .localCheckpoint(eager=True)
    )
    centroids = (
        seed.coalesce(1)
        .sortWithinPartitions("vid")
        .withColumn("cid", F.monotonically_increasing_id())
        .select("cid", F.col("qvec").alias("cvec"))
        .localCheckpoint(eager=True)
    )
    members = qc.select("vid", "qvec")
    for _ in range(iterations):
        assigned = _nearest_centroids(members, centroids, 1)
        dims = members.join(assigned, on="vid").select(
            "cid", F.posexplode("qvec").alias("pos", "val")
        )
        comp = dims.groupBy("cid", "pos").agg(
            F.floor(F.sum("val").cast("double") / F.count(F.lit(1))).cast("long").alias("c")
        )
        new_c = (
            comp.groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("cid", F.transform("pc", lambda s: s["c"]).alias("cvec"))
        )
        centroids = (
            centroids.select("cid", F.col("cvec").alias("__old"))
            .join(new_c, on="cid", how="left")
            .select("cid", F.coalesce(F.col("cvec"), F.col("__old")).alias("cvec"))
            .localCheckpoint(eager=True)  # K rows; truncate iterative lineage
        )
    inv = (
        qc.join(_nearest_centroids(qc.select("vid", "qvec"), centroids, 1), on="vid")
        .select("cid", F.col("vid").alias("neighbor_id"), F.col("vec").alias("cvec_f"))
    )
    qq = queries.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("qvec_f"),
        quantize_col(F.col(vec_col), scale).alias("qvec"),
    )
    probes = (
        _nearest_centroids(qq.select("vid", "qvec"), centroids, n_probe)
        .join(qq.select("vid", "qvec_f"), on="vid")
        .select(F.col("vid").alias("query_id"), "qvec_f", "cid")
    )
    scored = (
        probes.join(inv, on="cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _trunc(cosine_col(F.col("qvec_f"), F.col("cvec_f")), round_digits).alias("score"),
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
