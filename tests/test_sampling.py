"""Deterministic sampling / split / quality-gate operators
(operators.sampling): stability properties that matter at corpus scale —
assignment must not depend on partition layout or corpus growth, and the
split/filter paths must stay shuffle-free.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.operators import sampling as smp
from cardinalsin_spark.plans.inspect import plan_string


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from cardinalsin_spark.queries import ensure_session_conf

    ensure_session_conf(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_assign_partition_layout_independent(docs):
    a = {
        (r.doc_id, r.split)
        for r in smp.split_assign(docs).select("doc_id", "split").collect()
    }
    b = {
        (r.doc_id, r.split)
        for r in smp.split_assign(docs.repartition(13))
        .select("doc_id", "split")
        .collect()
    }
    assert a == b and len(a) > 0


def test_split_assign_stable_under_append(docs):
    """Assignments of existing docs never change when the corpus grows —
    the property randomSplit lacks."""
    full = {
        (r.doc_id, r.split)
        for r in smp.split_assign(docs).select("doc_id", "split").collect()
    }
    half = {
        (r.doc_id, r.split)
        for r in smp.split_assign(docs.filter(F.col("doc_id") % 2 == 0))
        .select("doc_id", "split")
        .collect()
    }
    assert half <= full


def test_split_assign_proportions(docs):
    n = docs.count()
    counts = dict(
        smp.split_assign(docs)
        .groupBy("split")
        .count()
        .rdd.map(lambda r: (r["split"], r["count"]))
        .collect()
    )
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.9) < 0.05
    assert abs(counts["val"] / n - 0.05) < 0.03
    assert abs(counts["test"] / n - 0.05) < 0.03


def test_split_assign_no_shuffle(docs):
    plan = plan_string(smp.split_assign(docs), "formatted")
    assert "Exchange" not in plan, plan


def test_stratified_sample_exact_n_and_deterministic(docs):
    out = smp.stratified_sample(docs, ["lang"], 10)
    sizes = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    avail = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    for lang, n in sizes.items():
        assert n == min(10, avail[lang])
    again = smp.stratified_sample(docs.repartition(7), ["lang"], 10)
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}


def test_quality_filter_flags_consistent(docs):
    out = smp.quality_filter(docs, min_tokens=20, max_punct_density=0.1).collect()
    assert len(out) > 0
    for r in out:
        assert r.keep == (
            not (r.fail_tokens or r.fail_token_len or r.fail_punct or r.fail_stopwords)
        )
    assert any(r.keep for r in out) and any(not r.keep for r in out)


def test_quality_filter_no_shuffle_no_python(docs):
    plan = plan_string(smp.quality_filter(docs), "formatted")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "BatchEvalPython" not in plan, plan


def test_pack_stream_offsets_partition_invariant(spark):
    """The two-pass prefix sum must produce identical offsets whatever the
    range-partition count — the property that makes it safe at scale."""
    from pyspark.sql import Row

    from cardinalsin_spark.operators.sampling import pack_stream_offsets

    df = spark.createDataFrame(
        [Row(doc_id=i, n_tokens=(i * 37) % 90 + 10) for i in range(200)]
    )
    outs = []
    for n in (1, 3, 8):
        got = {
            r.doc_id: (r.stream_offset, r.shard)
            for r in pack_stream_offsets(df, 256, n_ranges=n).collect()
        }
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    # exact sequential semantics: offset(i) = sum of tokens of ids < i
    toks = {i: (i * 37) % 90 + 10 for i in range(200)}
    acc = 0
    for i in range(200):
        assert outs[0][i] == (acc, acc // 256)
        acc += toks[i]


def test_temperature_mixture_rebalances(spark, sf_dir):
    """alpha=0.5 pulls source shares toward uniform while preserving the
    total corpus size in expectation; rates derive from the data; output
    is deterministic across runs."""
    from cardinalsin_spark.operators.sampling import temperature_mixture

    # the parquet fixture's sources are near-uniform (rates would all be
    # ~1); build a deliberately skewed corpus so the rebalance is visible
    docs = spark.range(0, 920).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 800, "src_big")
        .when(F.col("id") < 900, "src_mid")
        .otherwise("src_small")
        .alias("source"),
    )
    before = {r.source: r.n for r in
              docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    out = temperature_mixture(docs, alpha=0.5)
    after = {r.source: r.n for r in
             out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_before = sum(before.values())
    n_after = sum(after.values())
    # total preserved in expectation (hash-gated fractional copies)
    assert abs(n_after - n_before) / n_before < 0.1
    # shares move toward uniform: the dominant source's share shrinks,
    # the rarest source's share grows
    big = max(before, key=before.get)
    small = min(before, key=before.get)
    assert after[big] / n_after < before[big] / n_before
    assert after[small] / n_after > before[small] / n_before
    # deterministic
    again = {r.source: r.n for r in
             temperature_mixture(docs, alpha=0.5)
             .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == after
    # epoch column counts copies: max epoch+1 == ceil(rate) for upsampled
    assert out.filter(F.col("epoch") < 0).count() == 0
