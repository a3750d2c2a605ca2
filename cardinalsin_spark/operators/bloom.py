"""Distributed Bloom-filter semi-join pre-filter.

The classic 100 TB dedup/contamination shape: before shuffling a huge probe
table against a reference key set, test each probe key against a compact
Bloom bitmap of the reference keys — false positives are removed by an exact
verify on the (tiny) candidate set, so the OUTPUT is exactly the semi-join,
while the probe table itself never shuffles on the key.

Everything is built-in JVM expressions — ``xxhash64`` for the hash family,
``shiftleft``/``bit_or`` for the bitmap words — no UDF, no driver-side
collection (Spark's own ``DataFrame.stat.bloomFilter`` collects the filter
to the driver; Catalyst's runtime bloom join
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects the same idea
automatically for equi-joins, but only as an opaque physical optimization —
this operator makes the bitmap a first-class DataFrame you can persist,
reuse across jobs, and union-merge incrementally, which the runtime filter
cannot).

The reference engine has no Bloom machinery anywhere (its pruning is
chunk-level min/max stats, ``metadata/catalog.rs``); this is a deliberate
superset for the training-data pipeline tier (SURVEY §2 LLM ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 22,
    k_hashes: int = 5,
) -> DataFrame:
    """Aggregate a key set into Bloom bitmap words: one row per touched
    64-bit word, ``(word: long, bits: long)``.

    The k hash positions come from ``xxhash64(key, seed)`` for seed in
    0..k-1 — deterministic, JVM-side, and mergeable: bitmaps built over
    different key batches union-merge with ``groupBy(word).agg(bit_or)``.
    The aggregate output is at most ``m_bits/64`` rows (512 KiB of longs at
    the default m = 4M bits), independent of |keys| — broadcastable by
    construction.
    """
    seeds = F.array(*[F.lit(i) for i in range(k_hashes)])
    pos = (
        keys.select(F.col(key_col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .select(F.explode(seeds).alias("_seed"), "_k")
        .select(F.pmod(F.xxhash64("_k", "_seed"), F.lit(m_bits)).alias("_pos"))
    )
    return (
        pos.select(
            F.expr("_pos div 64").alias("word"),
            F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_semi_join(
    probe: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 22,
    k_hashes: int = 5,
) -> DataFrame:
    """Exact semi-join of ``probe`` against ``keys`` on ``key_col``,
    executed as Bloom pre-filter → exact verify → broadcast semi-join.

    Plan shape (the point of the operator):
      1. distinct probe keys × k seeds equi-join the broadcast bitmap on
         the word index — a map-side broadcast hash join, NO shuffle of
         the probe table;
      2. keys passing all k bit tests (the Bloom candidates: true matches
         + ~|probe keys|·(1−e^(−kn/m))^k false positives) are exactly
         verified with a left-semi join against the reference keys —
         only the candidate KEY STRINGS shuffle, never probe payloads;
      3. verified keys broadcast back onto the probe table.

    CONTRACT: the verified intersection must be broadcast-sized (dedup /
    contamination overlaps are, by assumption — a probe that is MOSTLY
    contained in the reference should use a plain shuffle semi-join
    instead, the bloom saves nothing there).
    """
    bitmap = bloom_bitmap(keys, key_col, m_bits, k_hashes)
    seeds = F.array(*[F.lit(i) for i in range(k_hashes)])
    probed = (
        probe.select(F.col(key_col).alias("_k"))
        .filter(F.col("_k").isNotNull())
        .distinct()
        .select("_k", F.explode(seeds).alias("_seed"))
        .select(
            "_k",
            F.pmod(F.xxhash64("_k", "_seed"), F.lit(m_bits)).alias("_pos"),
        )
        .select(
            "_k",
            F.expr("_pos div 64").alias("word"),
            F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))").alias("bit"),
        )
    )
    hits = (
        probed.join(F.broadcast(bitmap), "word")
        .filter((F.col("bits").bitwiseAND(F.col("bit"))) == F.col("bit"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_nhit"))
        .filter(F.col("_nhit") == k_hashes)
        .select("_k")
    )
    verified = hits.join(
        keys.select(F.col(key_col).alias("_k")).filter(
            F.col("_k").isNotNull()
        ),
        "_k",
        "left_semi",
    )
    return probe.join(
        F.broadcast(verified.withColumnRenamed("_k", key_col)),
        key_col,
        "left_semi",
    )
