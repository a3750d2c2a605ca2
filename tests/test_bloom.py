"""Bloom-filter semi-join pre-filter (operators.bloom).

The output contract is EXACT semi-join equality — the bloom stage only
prunes, the verify stage removes every false positive — so each test
compares against a plain left_semi join on the same frames.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from cardinalsin_spark.operators.bloom import bloom_bitmap, bloom_semi_join


def _ids(df):
    return sorted(r.k for r in df.select("k").collect())


def test_bloom_semi_join_equals_exact_semi_join(spark):
    probe = spark.createDataFrame(
        [Row(k=f"key{i}", payload=i) for i in range(200)]
    )
    keys = spark.createDataFrame(
        [Row(k=f"key{i}") for i in range(0, 200, 3)]  # every third key
    )
    got = bloom_semi_join(probe, keys, "k", m_bits=1 << 12, k_hashes=4)
    want = probe.join(keys, "k", "left_semi")
    assert _ids(got) == _ids(want)
    # payload columns survive untouched
    assert set(got.columns) == {"k", "payload"}


def test_bloom_false_positives_are_verified_away(spark):
    """A deliberately TINY bitmap (64 bits, 1 hash) over many keys is
    saturated — nearly every probe key is a bloom candidate — yet the
    verify stage keeps the output exact."""
    probe = spark.createDataFrame([Row(k=f"p{i}") for i in range(300)])
    keys = spark.createDataFrame([Row(k=f"r{i}") for i in range(300)])
    got = bloom_semi_join(probe, keys, "k", m_bits=64, k_hashes=1)
    assert got.count() == 0  # disjoint sets: every candidate was a FP


def test_bloom_nulls_and_numeric_keys(spark):
    probe = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=None), Row(k=7)],
        "k bigint",
    )
    keys = spark.createDataFrame([Row(k=2), Row(k=None), Row(k=9)], "k bigint")
    got = bloom_semi_join(probe, keys, "k", m_bits=1 << 10, k_hashes=3)
    # null keys never match (SQL semantics — same as IN / left_semi)
    assert [r.k for r in got.collect()] == [2]


def test_bloom_bitmap_is_mergeable_and_bounded(spark):
    """Bitmaps over two key batches union-merge (bit_or per word) into the
    bitmap of the union — the incremental-build property — and the row
    count never exceeds m_bits/64."""
    m = 1 << 10
    a = spark.createDataFrame([Row(k=f"a{i}") for i in range(50)])
    b = spark.createDataFrame([Row(k=f"b{i}") for i in range(50)])
    merged = (
        bloom_bitmap(a, "k", m_bits=m, k_hashes=3)
        .unionByName(bloom_bitmap(b, "k", m_bits=m, k_hashes=3))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_bitmap(a.unionByName(b), "k", m_bits=m, k_hashes=3)
    mm = {r.word: r.bits for r in merged.collect()}
    dd = {r.word: r.bits for r in direct.collect()}
    assert mm == dd
    assert len(dd) <= m // 64
