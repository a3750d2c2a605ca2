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


def test_index_cache_lru_bound(spark, sf_dir, tmp_path, monkeypatch):
    """The session index caches are LRU-bounded (VERDICT r5 watch item): a
    session touching more datasets than the cap evicts the oldest entry —
    releasing the Python reference so the ContextCleaner can reclaim its
    checkpoint blocks — and a re-query after eviction rebuilds the index
    with identical results."""
    import os

    from cardinalsin_spark import queries_llm as ql

    # unit: LRU order + bound
    c = ql._IndexCache(maxsize=2)
    c.put("a", 1), c.put("b", 2)
    assert c.get("a") == 1          # refresh 'a'
    c.put("c", 3)                   # evicts 'b', the least recent
    assert "b" not in c and "a" in c and "c" in c and len(c) == 2

    # integration: a second dataset path evicts the first under cap=1;
    # a symlink to the same fixtures is a distinct key with equal data
    alias = tmp_path / "alias_sf"
    alias.symlink_to(sf_dir)
    monkeypatch.setattr(ql, "_SIMS_CACHE", ql._IndexCache(maxsize=1))
    first = ql._minhash_sims(spark, sf_dir)
    key1 = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    assert key1 in ql._SIMS_CACHE
    baseline = sorted(map(tuple, first.collect()))
    ql._minhash_sims(spark, str(alias))
    assert key1 not in ql._SIMS_CACHE, "oldest entry must be evicted"
    assert len(ql._SIMS_CACHE) == 1
    # rebuilt after eviction: same pairs
    rebuilt = sorted(map(tuple, ql._minhash_sims(spark, sf_dir).collect()))
    assert rebuilt == baseline
