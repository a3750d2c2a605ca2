"""Inverted-index search: correctness vs a brute-force scan, and the
bucketed-posting layout's exchange-free lookup property."""

from __future__ import annotations

from pyspark.sql import functions as F

from cardinalsin_spark.operators import index as ix
from cardinalsin_spark.operators.text import normalize_text


def _docs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


TERMS = ["hash", "join", "spark"]


def test_search_matches_bruteforce_scan(spark, sf_dir):
    """Index-served AND search returns exactly the docs a full-corpus
    token scan finds, identically ranked."""
    docs = _docs(spark, sf_dir)
    postings = ix.build_inverted_index(docs)
    got = ix.search_all_terms(postings, TERMS, k=1000).collect()

    toks = docs.select(
        "doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("t")
    )
    brute = (
        toks.filter(F.col("t").isin(TERMS))
        .groupBy("doc_id")
        .agg(F.count_distinct("t").alias("nt"), F.count(F.lit(1)).alias("tf"))
        .filter(F.col("nt") == len(TERMS))
        .orderBy(F.desc("tf"), F.asc("doc_id"))
        .collect()
    )
    assert [(r.doc_id, r.total_tf) for r in got] == [
        (r.doc_id, r.tf) for r in brute
    ]


def test_posting_tf_totals(spark, sf_dir):
    """Σtf over the posting table equals the corpus token count — the
    index is lossless."""
    docs = _docs(spark, sf_dir)
    postings = ix.build_inverted_index(docs)
    n_tokens = (
        docs.select(F.explode(F.split(normalize_text("text"), " ")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    assert postings.agg(F.sum("tf")).collect()[0][0] == n_tokens


def test_bucketed_postings_search_without_exchange(spark, sf_dir, tmp_path):
    """Postings persisted bucketBy(term): the search's term-filtered
    aggregation must not reshuffle on term (the groupBy keys on doc_id —
    one exchange total for the agg, none for the term lookup)."""
    from cardinalsin_spark.sources.ingest import write_bucketed

    postings = ix.build_inverted_index(_docs(spark, sf_dir))
    write_bucketed(postings, "postings_idx", ["term"], n_buckets=8)
    try:
        served = ix.search_all_terms(spark.table("postings_idx"), TERMS)
        plan = served._jdf.queryExecution().executedPlan().toString()
        # exactly the doc-keyed aggregation exchange (+ the top-k single
        # partition exchange), never a term-keyed one
        assert "hashpartitioning(term" not in plan, plan
        rows = served.collect()
        direct = ix.search_all_terms(postings, TERMS).collect()
        assert [tuple(r) for r in rows] == [tuple(r) for r in direct]
    finally:
        spark.sql("DROP TABLE IF EXISTS postings_idx")
