"""Operators must not leak SQL-cache entries: every df.persist() needs a
matching unpersist (or an eager localCheckpoint, whose blocks the
ContextCleaner reclaims on GC). A bare persist pins blocks in CacheManager
for the life of the session — at 100 TB that is an executor-memory leak."""

from __future__ import annotations

from pyspark.sql import functions as F


def _sql_cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_dedup_and_similarity_leave_no_cached_plans(spark, sf_dir):
    from cardinalsin_spark.operators import dedup_docs as dd
    from cardinalsin_spark.operators import similarity as sim

    spark.catalog.clearCache()  # isolate from other modules' fixtures
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    cands = dd.minhash_lsh_candidates(docs)
    dd.jaccard_for_pairs(docs, cands).count()
    dd.near_dedup(docs, threshold=0.6).count()
    dd.near_dedup_cc(docs, threshold=0.6).count()
    dd.ngram_jaccard_for_pairs(docs, cands).count()
    sim.ivf_train_centroids(emb.limit(64), k=4, iters=1)
    sim.cosine_near_dup_pairs(emb, dim=64, n_planes=4).count()

    assert _sql_cache_empty(spark), (
        "an operator left a persisted plan in CacheManager"
    )
