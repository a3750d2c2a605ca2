"""Connected-components near-dedup: fixpoint convergence, and the case
where greedy drop and transitive closure disagree."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cardinalsin_spark.operators.dedup_docs import (
    connected_components,
    near_dedup,
    near_dedup_cc,
)


def _pairs(spark, edges):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])


def test_cc_labels_min_reachable(spark):
    # two components: {1,3,5} via a chain (needs >1 propagation round)
    # and {10, 12}
    labels = {
        r.id: r.comp
        for r in connected_components(
            _pairs(spark, [(3, 5), (1, 3), (10, 12)])
        ).collect()
    }
    assert labels == {1: 1, 3: 1, 5: 1, 10: 10, 12: 10}


def test_cc_long_chain_converges(spark):
    # path 0-1-2-...-7: min label must travel the full diameter
    chain = [(i, i + 1) for i in range(7)]
    labels = {r.id: r.comp for r in connected_components(_pairs(spark, chain)).collect()}
    assert labels == {i: 0 for i in range(8)}


def test_cc_vs_greedy_divergence(spark):
    """Edges (A,C),(B,C) with A<B<C: greedy keeps A and B (B never matches
    a lower id), CC merges {A,B,C} through C and keeps only A."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in (1, 2, 3)]
    )
    sims = spark.createDataFrame(
        [
            Row(id_a=1, id_b=3, jaccard=0.9),
            Row(id_a=2, id_b=3, jaccard=0.9),
            Row(id_a=1, id_b=2, jaccard=0.1),
        ]
    )
    cc_survivors = {
        r.doc_id for r in near_dedup_cc(docs, threshold=0.6, sims=sims).collect()
    }
    assert cc_survivors == {1}
    # greedy semantics on the same sims frame: drop id_b of matching pairs
    greedy_losers = {
        r.id_b for r in sims.filter(F.col("jaccard") >= 0.6).collect()
    }
    greedy_survivors = {1, 2, 3} - greedy_losers
    assert greedy_survivors == {1, 2}  # the documented difference


def test_cc_pipeline_subset_of_greedy(spark, sf_dir):
    """On the real fixture the CC survivor set is a subset of greedy's
    (transitive closure can only drop more), with identical pair input."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    greedy = {r.doc_id for r in near_dedup(docs, threshold=0.6).collect()}
    cc = {r.doc_id for r in near_dedup_cc(docs, threshold=0.6).collect()}
    assert cc <= greedy
    assert len(cc) > 0


def test_winnowing_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= k + window - 1 must share at
    least one fingerprint; unrelated docs (different alphabets) none."""
    from cardinalsin_spark.operators.dedup_docs import winnowed_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"AAAA {shared} BBBB"),
            Row(doc_id=2, text=f"CCCC {shared} DDDD"),
            Row(doc_id=3, text="0123456789" * 9),
        ]
    )
    fps = winnowed_fingerprints(docs, shingle_k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    # short doc still yields at least one fingerprint
    tiny = spark.createDataFrame([Row(doc_id=9, text="abcdefgh")])
    assert winnowed_fingerprints(tiny).count() == 1
