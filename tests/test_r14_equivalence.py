"""Bit-equality regressions for the r14 optimization restructures: each
rewritten operator must return EXACTLY the rows of the formulation it
replaced (the DuckDB oracle pins the contract too — these tests pin the
equivalence argument itself, so a future edit to either form fails loudly
next to the optimization it undoes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_MEDIUM


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pair_jaccard_array_matches_exploded_form(spark, sf_dir):
    """jaccard_for_pairs (array_intersect over per-doc distinct-shingle
    sets) == the old exploded-join formulation, bit for bit."""
    from cardinalsin_spark.operators import dedup_docs as dd

    docs = spark.read.parquet(f"{SF_DIR_MEDIUM}/documents.parquet")
    cands = dd.minhash_lsh_candidates(docs).localCheckpoint()

    new = dd.jaccard_for_pairs(docs, cands)

    # the pre-r14 exploded formulation, inlined
    sh = dd.exploded_shingles(
        dd._candidate_docs(docs, cands, "doc_id"), "text", "doc_id"
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh"))
    sh_b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh"))
    inter = (
        cands.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    old = (
        cands.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(
            sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "n_sh", "n_a"
            ),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "n_sh", "n_b"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    )

    assert new.columns == old.columns
    assert [f.dataType for f in new.schema] == [f.dataType for f in old.schema]
    new_rows = _rows(new)
    assert len(new_rows) > 0
    assert new_rows == _rows(old)


def test_ngram_jaccard_array_matches_exploded_form(spark, sf_dir):
    """ngram_jaccard_for_pairs over word-2-gram sets: array form == the
    exploded-join form."""
    from cardinalsin_spark.operators import dedup_docs as dd

    docs = spark.read.parquet(f"{SF_DIR_MEDIUM}/documents.parquet")
    cands = dd.minhash_lsh_candidates(docs).localCheckpoint()

    new = dd.ngram_jaccard_for_pairs(docs, cands, n=2)

    grams = dd.exploded_word_ngrams(
        dd._candidate_docs(docs, cands, "doc_id"), 2, "text", "doc_id"
    ).distinct()
    sets_from_stream = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    # cross-check just the set sizes and intersection counts via the old
    # stream join (full old pipeline mirrored in the shingle test above)
    g_a = grams.select(F.col("doc_id").alias("id_a"), "sh")
    g_b = grams.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        cands.join(g_a, "id_a")
        .join(g_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    old_inter = {
        (r.id_a, r.id_b): r.n_inter for r in inter.collect()
    }
    old_sizes = {r.doc_id: r.n_sh for r in sets_from_stream.collect()}
    for r in new.collect():
        assert r.n_inter == old_inter.get((r.id_a, r.id_b), 0)
        assert r.n_a == old_sizes[r.id_a]
        assert r.n_b == old_sizes[r.id_b]


def test_ts_mad_single_agg_matches_percentile_join_form(spark):
    """q_ts_mad's one-pass collected-array MAD == the two-pass exact
    percentile + join formulation it replaced, bit for bit."""
    from cardinalsin_spark.operators.promql import _mad_expr
    from cardinalsin_spark.functions.core import time_bucket
    from cardinalsin_spark.queries import _events_cents

    ev = _events_cents(spark, SF_DIR_MEDIUM)
    day = time_bucket(F.col("ts"), 86_400)
    base = ev.select(
        day.alias("day"), "event_type", F.col("value_cents").alias("vc")
    )

    new = base.groupBy("day", "event_type").agg(
        (F.expr(_mad_expr("vc")) / F.lit(100.0)).alias("mad"),
        F.count(F.lit(1)).alias("n"),
    )

    med = base.groupBy("day", "event_type").agg(
        F.expr("percentile(vc, 0.5)").alias("med")
    )
    old = (
        base.join(med, ["day", "event_type"])
        .groupBy("day", "event_type")
        .agg(
            (F.expr("percentile(abs(vc - med), 0.5)") / F.lit(100.0)).alias(
                "mad"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
    new_rows = _rows(new.orderBy("day", "event_type"))
    assert len(new_rows) > 0
    assert new_rows == _rows(old.orderBy("day", "event_type"))


def test_ivf_corpus_param_matches_inline_encode(spark):
    """cosine_topk_ivf / cosine_topk_ivfpq / semdedup return identical rows
    whether the corpus index frame is prebuilt (the session cache path) or
    encoded inline; and the prebuilt frame IS the inline frame."""
    from cardinalsin_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR_MEDIUM}/embeddings.parquet")
    centroids = sim.ivf_train_centroids_local(
        emb.orderBy("vec_id").limit(200), k=4, iters=2
    )
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    corpus = sim.ivf_corpus(emb, centroids).localCheckpoint()
    inline = sim.cosine_topk_ivf(emb, queries, centroids, k=5, nprobe=2)
    cached = sim.cosine_topk_ivf(
        emb, queries, centroids, k=5, nprobe=2, corpus=corpus
    )
    assert _rows(inline) == _rows(cached)

    sd_inline = sim.semdedup(emb, centroids, threshold=0.4)
    sd_cached = sim.semdedup(emb, centroids, threshold=0.4, corpus=corpus)
    assert _rows(sd_inline) == _rows(sd_cached)

    codebooks = sim.pq_train_codebooks_local(emb, m=8, ks=8, iters=2, sample=200)
    pq_corpus = sim.ivfpq_corpus(emb, centroids, codebooks).localCheckpoint()
    pq_inline = sim.cosine_topk_ivfpq(
        emb, queries, centroids, codebooks, k=5, nprobe=2
    )
    pq_cached = sim.cosine_topk_ivfpq(
        emb, queries, centroids, codebooks, k=5, nprobe=2, corpus=pq_corpus
    )
    assert _rows(pq_inline) == _rows(pq_cached)


def test_near_dup_bucket_gemm_matches_self_join(spark):
    """cosine_near_dup_pairs (per-bucket applyInPandas GEMM) == the old
    bucket self-join + per-pair scoring, bit for bit."""
    from cardinalsin_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR_MEDIUM}/embeddings.parquet")
    new = sim.cosine_near_dup_pairs(emb, dim=64, threshold=0.4, n_planes=4)

    # the pre-r14 self-join formulation, inlined
    c = (
        emb.selectExpr("vec_id", f"{sim.sql_quantize('embedding')} AS qv")
        .selectExpr(
            "*",
            f"{sim.sql_hyperplane_signature('qv', 64, 4)} AS bucket",
            f"{sim.sql_norm_q('qv')} AS norm",
        )
        .localCheckpoint()
    )
    a, b = c.alias("a"), c.alias("b")
    old = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cosine",
            sim.dot_q_vectorized()(F.col("a.qv"), F.col("b.qv"))
            / (F.col("a.norm") * F.col("b.norm")),
        )
        .filter(F.col("cosine") >= F.lit(0.4))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            "cosine",
        )
    )
    new_rows = _rows(new)
    assert len(new_rows) > 0
    assert new_rows == _rows(old)


def test_semdedup_cell_gemm_matches_self_join(spark):
    """semdedup (per-cell applyInPandas flag GEMM) == the old self-join +
    distinct + flag join-back, bit for bit."""
    from cardinalsin_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR_MEDIUM}/embeddings.parquet")
    centroids = sim.ivf_train_centroids_local(
        emb.orderBy("vec_id").limit(200), k=4, iters=2
    )
    new = sim.semdedup(emb, centroids, threshold=0.4)

    c = sim.ivf_corpus(emb, centroids).localCheckpoint()
    a, b = c.alias("a"), c.alias("b")
    dups = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .withColumn(
            "cosine",
            sim.dot_q_vectorized()(F.col("a.qv"), F.col("b.qv"))
            / (F.col("a.norm") * F.col("b.norm")),
        )
        .filter(F.col("cosine") >= F.lit(0.4))
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    old = c.join(dups, "vec_id", "left").select(
        "vec_id",
        F.col("cell").cast("long").alias("cell"),
        F.coalesce(F.col("_dup"), F.lit(0)).cast("long").alias("is_dup"),
    )
    new_rows = _rows(new)
    assert len(new_rows) == emb.count()
    assert new_rows == _rows(old)


def test_ivf_corpus_cache_evicts_and_rebuilds(spark, tmp_path):
    """_ivf_corpus honors the stored-index doctrine: keyed by (app,
    dataset, mtime), LRU-evicted, rebuilt identically after eviction."""
    from cardinalsin_spark import queries_llm as ql

    sfd = SF_DIR_MEDIUM
    ql._IVF_CORPUS_CACHE.clear()
    first = ql._ivf_corpus(spark, sfd)
    assert ql._IVF_CORPUS_CACHE.read(spark, sfd) is not None
    baseline = _rows(first)
    ql._IVF_CORPUS_CACHE.clear()
    rebuilt = _rows(ql._ivf_corpus(spark, sfd))
    assert rebuilt == baseline
