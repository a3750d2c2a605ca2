"""Invariant tests for the round-4 pipeline operators: chunk tiling,
mixture copy counts, binned-range-join equivalence to brute force."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from cardinalsin_spark.operators.sampling import chunk_windows, mixture_sample
from cardinalsin_spark.operators.timeseries import interval_overlap_join


def test_chunk_windows_tile_documents(spark):
    """Chunks must tile every document: starts advance by the stride,
    first chunk at 0, every token covered, the final chunk truncated to
    the doc end, full chunks exactly chunk_tokens long."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(f"t{j}" for j in range(n)))
            for i, n in enumerate([1, 47, 48, 49, 64, 65, 200])
        ]
    )
    C, O = 64, 16
    stride = C - O
    out = chunk_windows(docs, chunk_tokens=C, overlap=O).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = dict(enumerate([1, 47, 48, 49, 64, 65, 200]))
    for doc_id, rows in by_doc.items():
        n = lens[doc_id]
        rows.sort(key=lambda r: r.chunk_idx)
        starts = [r.start_tok for r in rows]
        assert starts == list(range(0, n, stride)), (doc_id, starts)
        for r in rows:
            want = min(C, n - r.start_tok)
            assert r.n_chunk_tokens == want, (doc_id, r)
        # coverage: the last chunk reaches the document end
        assert rows[-1].start_tok + rows[-1].n_chunk_tokens == n


def test_mixture_sample_copy_counts(spark):
    """Every row's copy count is floor(rate) or ceil(rate); dropped
    sources vanish; epoch indexes are dense 0..copies-1."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, source=f"src{i % 4}") for i in range(400)]
    )
    rates = {"src0": 2.5, "src1": 0.4, "src2": 0.0}
    out = mixture_sample(docs, rates).groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("copies"), F.max("epoch").alias("max_epoch")
    ).collect()
    seen_sources = {r.source for r in out}
    assert "src2" not in seen_sources
    for r in out:
        rate = rates.get(r.source, 1.0)
        lo, hi = int(rate), int(rate) + (0 if rate == int(rate) else 1)
        assert lo <= r.copies <= max(hi, 1), r
        assert r.max_epoch == r.copies - 1
    # determinism: same call twice = identical multiset
    again = mixture_sample(docs, rates).groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("copies")
    ).collect()
    assert sorted((r.doc_id, r.copies) for r in again) == sorted(
        (r.doc_id, r.copies) for r in out
    )


def test_interval_overlap_equals_bruteforce(spark):
    """Binned range join == brute-force overlap predicate on adversarial
    intervals (bin-boundary touching, containment, multi-bin spans,
    disjoint)."""
    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [
            Row(lid=i, ls=ts(a), le=ts(b))
            for i, (a, b) in enumerate(
                [
                    (0, 10),
                    (3599, 3600),          # touches a bin boundary
                    (0, 7200),             # spans 3 bins
                    (10000, 10001),
                    (7200, 7200),          # zero-length
                ]
            )
        ]
    )
    right = spark.createDataFrame(
        [
            Row(rid=i, rs=ts(a), re_=ts(b))
            for i, (a, b) in enumerate(
                [
                    (5, 6),
                    (3600, 3650),
                    (7199, 7201),
                    (20000, 20100),
                    (0, 50000),            # contains everything
                ]
            )
        ]
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re_", bin_seconds=3600
        ).collect()
    )
    brute = sorted(
        (r.lid, r.rid)
        for r in left.crossJoin(right)
        .filter((F.col("ls") <= F.col("re_")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    assert got == brute and brute  # non-empty sanity


def test_cusum_reflection_identity_matches_recursion(spark):
    """The windowed closed form S_i = P_i − min(0, min P_j) must equal the
    literal recursion S_i = max(0, S_{i-1} + d_i) replayed in Python."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.timeseries import MetricsCols, cusum_alarm

    t0 = dt.datetime(2024, 1, 1)
    vals = [3, -5, 10, 2, -20, 7, 7, 7, -1, 0, 40, -100, 5]
    rows = [
        Row(ts=t0 + dt.timedelta(hours=i), metric_name="m", value=v, eid=i)
        for i, v in enumerate(vals)
    ]
    k, h = 2, 10
    out = cusum_alarm(
        spark.createDataFrame(rows),
        k_units=k,
        h_units=h,
        bucket_seconds=86_400 * 365,
        cols=MetricsCols(ts="ts", name="metric_name", value="value"),
        tiebreak=["eid"],
    ).collect()
    s, mx, alarms = 0, 0, 0
    for v in vals:
        s = max(0, s + (v - k))
        mx = max(mx, s)
        alarms += int(s > h)
    assert len(out) == 1
    assert (out[0].max_cusum, out[0].n_alarm, out[0].final_cusum) == (
        mx,
        alarms,
        s,
    )
