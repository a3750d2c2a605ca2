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
    """The session stored indexes are LRU-bounded (VERDICT r5 watch item,
    r15 stored-index API): a session touching more datasets than the cap
    evicts the oldest entry — releasing the Python reference so the
    ContextCleaner can reclaim its checkpoint blocks — and a re-query
    after eviction rebuilds the index with identical results."""
    from cardinalsin_spark import queries_llm as ql
    from cardinalsin_spark.indexes import StoredIndex

    # unit: LRU order + bound (plain-value index, no Spark needed)
    c = StoredIndex("t", "unit", checkpoint=False, maxsize=2)
    c.build(spark, "a", lambda: 1), c.build(spark, "b", lambda: 2)
    assert c.read(spark, "a") == 1          # refresh 'a'
    c.build(spark, "c", lambda: 3)          # evicts 'b', the least recent
    assert c.read(spark, "b") is None
    assert c.read(spark, "a") == 1 and c.read(spark, "c") == 3 and len(c) == 2
    # build() on a live entry returns it WITHOUT calling the builder
    assert c.build(spark, "a", lambda: (_ for _ in ()).throw(AssertionError)) == 1

    # integration: a second dataset path evicts the first under cap=1;
    # a symlink to the same fixtures is a distinct key with equal data
    alias = tmp_path / "alias_sf"
    alias.symlink_to(sf_dir)
    monkeypatch.setattr(
        ql, "_SIMS_CACHE", StoredIndex("t_sims", "test twin", maxsize=1)
    )
    first = ql._minhash_sims(spark, sf_dir)
    assert ql._SIMS_CACHE.read(spark, sf_dir) is not None
    baseline = sorted(map(tuple, first.collect()))
    ql._minhash_sims(spark, str(alias))
    assert ql._SIMS_CACHE.read(spark, sf_dir) is None, (
        "oldest entry must be evicted"
    )
    assert len(ql._SIMS_CACHE) == 1
    # rebuilt after eviction: same pairs
    rebuilt = sorted(map(tuple, ql._minhash_sims(spark, sf_dir).collect()))
    assert rebuilt == baseline


def test_stored_index_api_surface(spark, sf_dir, tmp_path):
    """The r15 stored-index surface (VERDICT r14 item 5): every session
    index is registered by name with a description, is listable, and
    supports explicit invalidation; a dataset rewrite (mtime bump)
    invalidates implicitly via the key."""
    import shutil
    import time

    from cardinalsin_spark import indexes

    names = {ix["name"] for ix in indexes.list_indexes()}
    assert {
        "docs_minhash_pairs", "docs_simhash_sigs", "docs_simhash_pairs",
        "emb_near_dup_pairs", "emb_ivf_centroids", "emb_pq_codebooks",
        "emb_ivf_corpus", "emb_ivfpq_corpus", "emb_pq_residual_codebooks",
    } <= names, names
    for ix in indexes.list_indexes():
        assert ix["description"], f"{ix['name']} has no description"

    # explicit invalidate: per-dataset and global
    idx = indexes.StoredIndex("t_api", "api test", checkpoint=False)
    idx.build(spark, str(tmp_path), lambda: 41)
    assert idx.invalidate(spark, str(tmp_path)) is True
    assert idx.read(spark, str(tmp_path)) is None
    assert idx.invalidate(spark, str(tmp_path)) is False

    # implicit invalidation on rewrite: the key carries the dataset mtime
    data = tmp_path / "ds"
    data.mkdir()
    (data / "part").write_text("v1")
    idx.build(spark, str(data), lambda: "v1")
    time.sleep(0.01)
    shutil.rmtree(data)
    data.mkdir()
    (data / "part").write_text("v2")
    assert idx.read(spark, str(data)) is None, (
        "a rewritten dataset must not serve the old index"
    )
