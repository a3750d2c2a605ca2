"""The external driver's correctness gate checks only the FIRST 50 entries
of ``queries()`` (verified against CORRECTNESS_r03..r06: their keys were
exactly registry[:50]).  These tests pin the round-7 window composition:

* every registry query with NO past green driver CORRECTNESS row must be
  windowed (or carry an explicit exception naming a sibling that pins the
  same machinery);
* every windowed slot that *is* already green must be justified in RECHECK —
  a changed-since-green or stale-green rationale — so slots are spent
  deliberately, not by drift.

Structural de-fuse (VERDICT r6 item 1): ``_past_driver_green()`` reads ONLY
CORRECTNESS files from rounds strictly before ``WINDOW_ROUND``.  The r5 and
r6 versions of this file globbed *all* CORRECTNESS files, so the moment the
driver dropped the current round's (all-green) artifact into the repo, the
already-green set grew and the RECHECK assert armed itself — two rounds in a
row.  With the pinned cutoff, the suite's verdict is frozen at
window-planning time: CORRECTNESS_r07.json landing green changes nothing.
Window rotation for r8 is a planning task (bump WINDOW_ROUND, rewrite
_DRIVER_WINDOW and RECHECK together; see scripts/check_parity.py --ages).
"""

from __future__ import annotations

import json
import os
import re

from cardinalsin_spark import queries as q

WINDOW = 50

# The round whose driver gate this window is aimed at.  _past_driver_green
# only reads CORRECTNESS files from rounds < WINDOW_ROUND, so the driver
# landing this round's artifact cannot re-arm these tests.
WINDOW_ROUND = 7

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _first_window() -> list[str]:
    return list(q.queries().keys())[:WINDOW]


def _past_driver_green() -> set[str]:
    """Names with a fully-green driver CORRECTNESS row in any round BEFORE
    the one this window targets (pinned — see module docstring)."""
    green: set[str] = set()
    for fname in sorted(os.listdir(_REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m or int(m.group(1)) >= WINDOW_ROUND:
            continue
        with open(os.path.join(_REPO, fname)) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


# Queries deliberately left without driver coverage this round (window
# space): each must name the sibling — windowed or past-driver-green —
# that exercises the same machinery, and remains covered by the
# builder-side parity sweep.  Empty at the start of round 7: after round 6
# every registry query has a green driver row.
WINDOW_EXCEPTIONS: dict[str, str] = {}


# Justification for every windowed slot that already has a green driver row
# (VERDICT r6 item 1: this window is pure stale-green re-verification).
# Keyed by query name → reason tag.  Reasons:
#   stale-r3     — last green row is CORRECTNESS_r03, four code rounds ago;
#                  promql.py, timeseries.py, compaction.py and the TPC-H
#                  suite all changed in rounds 4-6.
#   dedup-churn  — last green r4; dedup_docs.py / queries_llm.py changed in
#                  r5 (skew rewrites, session index) and r6 (LRU caches).
#   ann-churn    — last green r4; similarity.py changed in r5 (IVF-PQ
#                  residual, semdedup) and r6 (hamming tier, LRU caches).
#   stale-r4     — last green r4; owning module changed less, but three
#                  rounds of adjacent churn (compaction snapshot-awareness,
#                  timeseries NaN guards) warrant re-verification.
RECHECK: dict[str, str] = {
    # -- stale-r3 (all 27)
    "ts_bucket_avg": "stale-r3",
    "ts_filter_range": "stale-r3",
    "ts_instant_sum": "stale-r3",
    "ts_latest_per_series": "stale-r3",
    "ts_rate": "stale-r3",
    "ts_increase": "stale-r3",
    "ts_deriv": "stale-r3",
    "ts_stddev": "stale-r3",
    "ts_topk": "stale-r3",
    "ts_dedup_first": "stale-r3",
    "ts_distinct_values": "stale-r3",
    "ts_distinct_series": "stale-r3",
    "ts_resets_changes": "stale-r3",
    "ts_sessionize": "stale-r3",
    "ts_gapfill_locf": "stale-r3",
    "ts_heatmap": "stale-r3",
    "promql_over_time": "stale-r3",
    "sql_cube": "stale-r3",
    "tpch_q3ish": "stale-r3",
    "tpch_q5ish": "stale-r3",
    "tpch_q6": "stale-r3",
    "tpch_q10ish": "stale-r3",
    "tpch_q14ish": "stale-r3",
    "maint_l0_plan": "stale-r3",
    "maint_leveled_plan": "stale-r3",
    "maint_time_prune": "stale-r3",
    "maint_downsample": "stale-r3",
    # -- r4-stale, churn-prioritised
    "docs_exact_dedup": "dedup-churn",
    "docs_minhash_pairs": "dedup-churn",
    "docs_near_dedup": "dedup-churn",
    "docs_ngram_jaccard": "dedup-churn",
    "docs_simhash": "dedup-churn",
    "docs_simhash_pairs": "dedup-churn",
    "docs_span_dedup": "dedup-churn",
    "docs_winnow": "dedup-churn",
    "emb_cosine_topk": "ann-churn",
    "emb_cosine_lsh": "ann-churn",
    "emb_ivf_topk": "ann-churn",
    "emb_ivfpq_topk": "ann-churn",
    "emb_knn_classify": "ann-churn",
    "emb_near_dup": "ann-churn",
    "emb_near_dup_cc": "ann-churn",
    "maint_small_files": "stale-r4",
    "maint_zorder_key": "stale-r4",
    "sql_rollup": "stale-r4",
    "promql_delta_faithful": "stale-r4",
    "promql_resets": "stale-r4",
    "promql_absent_over_time": "stale-r4",
    "promql_holt_winters": "stale-r4",
    "promql_predict_linear": "stale-r4",
}


def test_never_driver_checked_queries_are_windowed():
    """Every registry query must have driver coverage: a past green
    CORRECTNESS row, a slot in this round's window, or an explicit
    exception naming the sibling that pins its machinery."""
    window = set(_first_window())
    covered = window | _past_driver_green() | set(WINDOW_EXCEPTIONS)
    missing = [n for n in q.REGISTRY if n not in covered]
    assert not missing, f"queries with no driver coverage path: {missing}"
    for name, sibling in WINDOW_EXCEPTIONS.items():
        assert sibling in window or sibling in _past_driver_green(), (
            f"exception {name}: sibling {sibling} neither windowed nor green"
        )


def test_windowed_green_slots_are_justified():
    """A window slot spent on an already-green query must carry a RECHECK
    rationale; conversely RECHECK must not list unwindowed or stale names."""
    window = _first_window()
    green = _past_driver_green()
    unjustified = [n for n in window if n in green and n not in RECHECK]
    assert not unjustified, f"green window slots without rationale: {unjustified}"
    not_windowed = [n for n in RECHECK if n not in window]
    assert not_windowed == [], f"RECHECK entries not in window: {not_windowed}"


def test_past_green_ignores_current_round_artifact():
    """Regression guard for the r5/r6 self-arming failure: a CORRECTNESS
    file for WINDOW_ROUND (or later) must NOT influence the green set."""
    fname = f"CORRECTNESS_r{WINDOW_ROUND:02d}.json"
    assert int(re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname).group(1)) >= WINDOW_ROUND
    # Simulate the driver landing an all-green artifact for this round:
    # _past_driver_green must return the same set with or without it.
    before = _past_driver_green()
    path = os.path.join(_REPO, fname)
    existed = os.path.exists(path)
    if not existed:
        fake = {
            name: {"rows_match": True, "schema_match": True, "hash_match": True}
            for name in _first_window()
        }
        with open(path, "w") as f:
            json.dump(fake, f)
    try:
        after = _past_driver_green()
    finally:
        if not existed:
            os.unlink(path)
    assert after == before


def test_window_entries_all_have_oracles():
    oracles = q.oracle_sql()
    missing = [n for n in _first_window() if n not in oracles]
    assert not missing, f"windowed queries without oracle SQL: {missing}"


def test_window_entries_have_list_free_schemas():
    """The driver's pandas canonicalizer crashes on array-typed output
    columns (r4's emb_centroids red row). Static guard: no windowed query
    may declare an array/map/struct column. Checked lazily — schemas via
    the sf0.001 fixtures without collecting."""
    import pytest

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("fixtures missing")
    from cardinalsin_spark.session import get_spark

    spark = get_spark()
    bad = []
    for name in _first_window():
        fn, _ = q.REGISTRY[name]
        df = fn(spark, sf_dir)
        for f_ in df.schema.fields:
            t = f_.dataType.simpleString()
            if t.startswith(("array", "map", "struct")):
                bad.append((name, f_.name, t))
    assert not bad, f"windowed queries with non-scalar columns: {bad}"


def test_registry_has_no_duplicates_and_all_callable():
    names = list(q.REGISTRY.keys())
    assert len(names) == len(set(names))
    for name, (fn, _) in q.REGISTRY.items():
        assert callable(fn), name


def test_bench_order_covers_registry():
    """Every registry query must run in bench (appended if not explicitly
    ordered), and BENCH_ORDER must not carry stale names."""
    import bench

    names = set(q.queries())
    seq = bench._bench_sequence(q.queries())
    assert set(seq) == names
    assert len(seq) == len(names)
    stale = [n for n in bench.BENCH_ORDER if n not in names]
    assert not stale, f"stale BENCH_ORDER entries: {stale}"
