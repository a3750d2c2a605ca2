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
