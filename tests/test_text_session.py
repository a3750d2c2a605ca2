"""Unit semantics for pii_scrub (mask + count, pattern precedence) and
sessionize (gap boundary inclusivity, tie-broken ordering)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from cardinalsin_spark.operators.text import pii_scrub
from cardinalsin_spark.operators.timeseries import MetricsCols, sessionize


def test_pii_scrub_counts_and_masks(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="mail bob@example.com or +1 555 123 4567 now"),
            Row(id=2, text="ssn 123-45-6789 plain text"),
            Row(id=3, text="nothing sensitive here"),
        ]
    )
    out = {r.id: r for r in pii_scrub(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert "bob@example.com" not in out[1].scrubbed
    assert "<EMAIL>" in out[1].scrubbed and "<PHONE>" in out[1].scrubbed
    # the SSN must be taken by the SSN pattern, not eaten by phone
    assert out[2].n_ssn == 1 and "<SSN>" in out[2].scrubbed
    assert out[3].n_email == out[3].n_phone == out[3].n_ssn == 0
    assert out[3].scrubbed == "nothing sensitive here"


def test_sessionize_gap_boundary(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: events at 0s, 60s (same session), 60+1801s (new session:
        # gap strictly greater than 1800)
        Row(k=1, ts=t0, eid=1),
        Row(k=1, ts=t0 + dt.timedelta(seconds=60), eid=2),
        Row(k=1, ts=t0 + dt.timedelta(seconds=1861), eid=3),
        # user 2: exactly-1800s gap stays in the SAME session (> not >=)
        Row(k=2, ts=t0, eid=4),
        Row(k=2, ts=t0 + dt.timedelta(seconds=1800), eid=5),
    ]
    out = sessionize(
        spark.createDataFrame(rows),
        1800,
        key_cols=["k"],
        cols=MetricsCols(ts="ts", name="x", value="x"),
        order_tiebreak=["eid"],
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.k, []).append((r.session_idx, r.n_events, r.duration_s))
    assert by_user[1] == [(0, 2, 60), (1, 1, 0)]
    assert by_user[2] == [(0, 2, 1800)]
