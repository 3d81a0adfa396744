"""Persist-lifecycle and driver/distributed-path discipline for the dedup
operators: repeated invocations must not accumulate session-lifetime cache
(VERDICT r1 #9 / ADVICE), and both near-dup-cluster physical strategies must
agree."""

from __future__ import annotations


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog!"),
        (3, "a completely different document about spark"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "yet another unrelated text body here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_pipeline_releases_cache(spark):
    from rdf_dataset_fragmenter_js_spark.textops import dedup as D

    # other test modules cache fixtures session-wide; this test asserts the
    # DEDUP calls add nothing, so start from a clean CacheManager
    spark.catalog.clearCache()
    docs = _docs(spark)
    for _ in range(2):  # repeated calls must not accumulate cache entries
        pairs = D.lsh_candidate_pairs(docs, k=8, bands=4, shingle_size=4)
        scored = D.ngram_jaccard_pairs(docs, pairs, shingle_size=4)
        assert scored.count() >= 1
    # DataFrame-level persist goes through the shared CacheManager — after
    # the calls return it must hold nothing (results are localCheckpoint'ed
    # RDDs owned by the returned frames, not cached plans)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_near_dup_clusters_driver_vs_distributed(spark):
    from rdf_dataset_fragmenter_js_spark.textops import dedup as D

    docs = _docs(spark)
    pairs = D.lsh_candidate_pairs(docs, k=8, bands=4, shingle_size=4)
    drv = {
        (r.doc_id, r.cluster_id)
        for r in D.near_dup_clusters(pairs, driver_threshold=1_000_000).collect()
    }
    dist = {
        (r.doc_id, r.cluster_id)
        for r in D.near_dup_clusters(pairs, driver_threshold=0).collect()
    }
    assert drv == dist
    assert drv  # the exact-duplicate docs 1 and 4 share a cluster
    clusters = dict(drv)
    assert clusters[1] == clusters[4]


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF ANN recall@5 vs exact brute force on the fixture corpus — the
    documented quality number for the coarse-quantizer scale path (the
    LSH variant's counterpart)."""
    from rdf_dataset_fragmenter_js_spark.plans import testdata as TD
    from rdf_dataset_fragmenter_js_spark.textops import similarity as S

    TD.register_views(spark, "/root/testdata/sf0.001")
    emb = spark.table("embeddings")
    queries = emb.filter("vec_id < 10")
    exact = S.cosine_topk_bruteforce(emb, queries, k=5)
    ivf = S.cosine_topk_ivf(emb, queries, k=5, n_centroids=8, n_probe=3, iterations=2)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(e & a) / len(e)
    # 3-of-8-list probing must recover a solid share of the exact set
    assert recall >= 0.5, recall
