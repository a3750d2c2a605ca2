"""Bit-equality regressions for the r15 optimization restructures — same
doctrine as tests/test_r14_equivalence.py: every rewritten operator must
return EXACTLY the rows of the formulation it replaced."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR_MEDIUM


def _rows(df):
    return sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# Blocked per-bucket GEMM (VERDICT r14 item 3 / ADVICE r14 #1)
# ---------------------------------------------------------------------------


def _dense_cosine_pairs(M, thr):
    """The pre-r15 full-matrix formulation, inlined as the reference."""
    G = M @ M.T
    dn = np.sqrt(G.diagonal().astype(np.float64))
    C = G.astype(np.float64) / np.outer(dn, dn)
    iu, ju = np.triu_indices(M.shape[0], k=1)
    cos = C[iu, ju]
    keep = cos >= thr
    return iu[keep], ju[keep], cos[keep]


def _dense_dup_flags(M, thr):
    G = M @ M.T
    dn = np.sqrt(G.diagonal().astype(np.float64))
    C = G.astype(np.float64) / np.outer(dn, dn)
    return np.tril(C >= thr, k=-1).any(axis=1).astype("int64")


@pytest.mark.parametrize("block_bytes", [1 << 8, 1 << 12, 1 << 30])
def test_blocked_cosine_pairs_bitwise_equals_dense(block_bytes):
    """Row-blocked Gram == full-matrix Gram, bit for bit, across block
    sizes that force 1, several, and many blocks (including blocks of a
    single row)."""
    from cardinalsin_spark.operators.similarity import _blocked_cosine_pairs

    rng = np.random.RandomState(7)
    M = rng.randint(-1_000_000, 1_000_000, size=(403, 16)).astype(np.int64)
    ri, rj, rc = _dense_cosine_pairs(M, 0.15)
    bi, bj, bc = _blocked_cosine_pairs(M, 0.15, block_bytes=block_bytes)
    assert np.array_equal(ri, bi) and np.array_equal(rj, bj)
    # bit-identical floats, not approx — the same exact int64 dots and
    # the same float chain
    assert np.array_equal(rc, bc)


@pytest.mark.parametrize("block_bytes", [1 << 8, 1 << 30])
def test_blocked_dup_flags_bitwise_equals_dense(block_bytes):
    from cardinalsin_spark.operators.similarity import _blocked_dup_flags

    rng = np.random.RandomState(11)
    M = rng.randint(-1_000_000, 1_000_000, size=(257, 8)).astype(np.int64)
    ref = _dense_dup_flags(M, 0.2)
    got = _blocked_dup_flags(M, 0.2, block_bytes=block_bytes)
    assert np.array_equal(ref, got)


def test_blocked_gram_memory_is_block_bounded():
    """A hot bucket far beyond the dense form's memory reach completes:
    at n=60k rows a dense float64 cosine matrix alone would be 28.8 GB
    (plus two n²/2 triu index arrays), while the blocked kernel peaks at
    O(block·n) — the 64 MB default budget ⇒ ~130-row blocks here. Uses
    dim=2 so the test is CPU-cheap; asserts the block sizing math and
    that the kernel completes and agrees with the dense form on the
    leading sub-bucket."""
    from cardinalsin_spark.operators.similarity import (
        _blocked_cosine_pairs,
        _gram_block_rows,
    )

    n = 60_000
    assert _gram_block_rows(n) * n * 8 <= (64 << 20) + n * 8
    rng = np.random.RandomState(3)
    M = rng.randint(1, 1_000_000, size=(n, 2)).astype(np.int64)
    # threshold 1.0: only exactly-parallel pairs survive — keeps the
    # output tiny while every one of the n²/2 cosines is still computed
    bi, bj, bc = _blocked_cosine_pairs(M, 1.0, block_bytes=1 << 20)
    head = M[:500]
    ri, rj, rc = _dense_cosine_pairs(head, 1.0)
    sub = bj < 500
    assert np.array_equal(bi[sub & (bi < 500)], ri)
    assert np.array_equal(bj[sub & (bi < 500)], rj)
    assert np.array_equal(bc[sub & (bi < 500)], rc)


def test_near_dup_pairs_and_semdedup_unchanged_by_blocking(spark):
    """End-to-end: the blocked operators return exactly the r14 rows on
    the medium fixture (which the r14 equivalence tests pinned against
    the ORIGINAL self-join forms — transitivity gives three-way
    equality), under a block size small enough to force multi-block
    execution per bucket."""
    from cardinalsin_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR_MEDIUM}/embeddings.parquet")
    baseline_pairs = _rows(
        sim.cosine_near_dup_pairs(emb, dim=64, threshold=0.4, n_planes=4)
    )
    cents = sim.ivf_train_centroids_local(
        emb.orderBy("vec_id").limit(200), k=4, iters=1
    )
    baseline_flags = _rows(sim.semdedup(emb, cents, threshold=0.4))

    import cardinalsin_spark.operators.similarity as s

    old = s.GRAM_BLOCK_BYTES
    s.GRAM_BLOCK_BYTES = 1 << 10  # ~couple rows per block at dim 64
    try:
        assert (
            _rows(
                sim.cosine_near_dup_pairs(
                    emb, dim=64, threshold=0.4, n_planes=4
                )
            )
            == baseline_pairs
        )
        assert _rows(sim.semdedup(emb, cents, threshold=0.4)) == baseline_flags
    finally:
        s.GRAM_BLOCK_BYTES = old


# ---------------------------------------------------------------------------
# NULL-element intersect (ADVICE r14 #2)
# ---------------------------------------------------------------------------


def test_pair_jaccard_null_text_docs_do_not_intersect(spark):
    """Two NULL-text docs share NO shingles: the exploded equi-join
    dropped NULL shingles, so the array form must too (array_intersect
    alone would count the shared [null] element as jaccard 1.0)."""
    from cardinalsin_spark.operators import dedup_docs as dd

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    rows = {
        (r.id_a, r.id_b): (r.n_inter, r.jaccard)
        for r in dd.jaccard_for_pairs(docs, pairs).collect()
    }
    assert rows[(1, 2)][0] == 0, rows
    assert rows[(1, 3)][0] == 0, rows


# ---------------------------------------------------------------------------
# Single-subtree contamination (VERDICT r14 item 8)
# ---------------------------------------------------------------------------


def test_contamination_groupby_matches_semijoin_form(spark):
    """The r15 one-pass groupBy(fp) contamination == the r14 two-arm
    semi-join formulation, bit for bit (and == the salted arm, which the
    plan-quality test already pins against the default)."""
    from cardinalsin_spark.operators import sampling as smp
    from cardinalsin_spark.operators.dedup_docs import (
        cross_split_contamination,
        winnowed_fingerprints,
    )

    docs = spark.read.parquet(f"{SF_DIR_MEDIUM}/documents.parquet")
    label = smp.split_expr("doc_id")
    new = cross_split_contamination(docs, label)

    # the pre-r15 semi-join formulation, inlined
    fps = winnowed_fingerprints(docs)
    labeled = fps.withColumn("_split", label)
    train_fps = (
        labeled.filter(F.col("_split") == "train").select("fp").distinct()
    )
    test_fps = labeled.filter(F.col("_split") == "test")
    old = (
        test_fps.join(train_fps, on="fp", how="leftsemi")
        .groupBy("doc_id")
        .agg(F.countDistinct("fp").alias("n_shared_fps"))
        .orderBy("doc_id")
    )
    assert _rows(new) == _rows(old)


# ---------------------------------------------------------------------------
# Grid-bounded MAD (VERDICT r14 item 4)
# ---------------------------------------------------------------------------


def test_ts_mad_grid_matches_collect_list_form(spark, sf_dir):
    """The r15 counts-per-cents-grid MAD == the r14 collect_list MAD ==
    (transitively, via test_r14_equivalence) the original percentile/join
    form — bit for bit, including groups with even/odd counts and
    repeated values."""
    from cardinalsin_spark import queries as q
    from cardinalsin_spark.operators.promql import _mad_expr, _mad_grid_expr
    from cardinalsin_spark.functions.core import time_bucket

    ev = q._events_cents(spark, sf_dir)
    day = time_bucket(F.col("ts"), 86_400)
    base = ev.select(
        day.alias("day"), "event_type", F.col("value_cents").alias("vc")
    )
    old = (
        base.groupBy("day", "event_type")
        .agg(
            (F.expr(_mad_expr("vc")) / F.lit(100.0)).alias("mad"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    new = q.q_ts_mad(spark, sf_dir)
    assert _rows(new) == _rows(old)


def test_mad_grid_expr_unit_cases(spark):
    """Unit pins for the rank-walk grid MAD: odd/even counts, repeated
    values, a NULL value excluded from ranks, a single-value group."""
    from cardinalsin_spark.operators.promql import _mad_expr, _mad_grid_expr

    rows = [
        ("g1", v)
        for v in [1, 1, 2, 9, 10, 10, 10, 400]      # even, heavy ties
    ] + [
        ("g2", v) for v in [5, 7, 11]                # odd
    ] + [
        ("g3", 42),                                  # singleton
    ] + [
        ("g4", v) for v in [3, None, 4, None, 100]   # NULLs dropped
    ]
    df = spark.createDataFrame(rows, "k string, vc long")
    grid = df.groupBy("k", "vc").count().withColumnRenamed("count", "c")
    got = {
        r["k"]: r["mad"]
        for r in grid.groupBy("k")
        .agg(F.expr(_mad_grid_expr("vc", "c")).alias("mad"))
        .collect()
    }
    ref = {
        r["k"]: r["mad"]
        for r in df.groupBy("k")
        .agg(F.expr(_mad_expr("vc")).alias("mad"))
        .collect()
    }
    assert got == ref, (got, ref)


def test_corpus_stamp_rejects_mismatched_quantizer(spark):
    """ADVICE r14 #4: a prebuilt corpus encoded with DIFFERENT centroids
    raises instead of silently scoring against the wrong cells."""
    from cardinalsin_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR_MEDIUM}/embeddings.parquet")
    c1 = sim.ivf_train_centroids_local(
        emb.orderBy("vec_id").limit(200), k=4, iters=1
    )
    c2 = sim.ivf_train_centroids_local(
        emb.orderBy("vec_id").limit(100), k=4, iters=1
    )
    corpus1 = sim.ivf_corpus(emb, c1)
    # matching stamp: fine
    sim.semdedup(emb, c1, corpus=corpus1)
    with pytest.raises(ValueError, match="different quantizer"):
        sim.semdedup(emb, c2, corpus=corpus1)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="different quantizer"):
        sim.cosine_topk_ivf(emb, queries, c2, corpus=corpus1)
