"""The external driver's correctness gate checks only the FIRST 50 entries
of ``queries()`` (verified against CORRECTNESS_r03..r08: their keys were
exactly registry[:50]).  These tests pin the round-9 window composition:

* every registry query with NO past green driver CORRECTNESS row must be
  windowed (or carry an explicit exception naming a sibling that pins the
  same machinery);
* every windowed slot that *is* already green must be justified in RECHECK —
  a changed-since-green or stale-green rationale — so slots are spent
  deliberately, not by drift.

Structural de-fuse (VERDICT r6 item 1): ``_past_driver_green()`` reads ONLY
CORRECTNESS files from rounds strictly before ``WINDOW_ROUND``, so the
driver landing this round's (all-green) artifact cannot re-arm these tests
— the r5/r6 self-arming failure.  The simulation regression below runs
against a COPY of the artifacts in a temp directory (ADVICE r7: writing the
fake artifact into the live repo root risked leaving a forged driver file
behind on a hard kill).  Window rotation for r10 is a planning task (bump
WINDOW_ROUND, rewrite _DRIVER_WINDOW and RECHECK together; see
``scripts/check_parity.py --ages --before 10``).
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
WINDOW_ROUND = 9

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _first_window() -> list[str]:
    return list(q.queries().keys())[:WINDOW]


def _past_driver_green(repo: str = _REPO) -> set[str]:
    """Names with a fully-green driver CORRECTNESS row in any round BEFORE
    the one this window targets (pinned — see module docstring)."""
    green: set[str] = set()
    for fname in sorted(os.listdir(repo)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m or int(m.group(1)) >= WINDOW_ROUND:
            continue
        with open(os.path.join(repo, fname)) as f:
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
# builder-side parity sweep.  Empty entering round 9.
WINDOW_EXCEPTIONS: dict[str, str] = {}


# Justification for every windowed slot that already has a green driver row.
# Keyed by query name → reason tag.  Reasons:
#   stale-r5      — last green row is CORRECTNESS_r05, four code rounds
#                   ago; the oldest coverage tier entering round 9
#                   (VERDICT r8 item 1 names this exact set).
#   media-churn   — last green r6; multimodal.py changed in r8 (sparse
#                   SAD scene-change, ffmpeg resample routing).
#   sim-churn     — last green r6; similarity.py changed in r8 (ann_recall
#                   yardstick, MMR re-rank, MIPS top-k).
#   sketch-churn  — last green r6; sketches.py changed in r8 (KMV null
#                   filter, theta-style set ops).
#   maint-churn   — last green r6; snapshots/compaction changed heavily
#                   in r8 (_data-v* output, CAS seam, merge_upsert).
#   flagship      — last green r6; the headline query re-verifies every
#                   few rounds on principle.
RECHECK: dict[str, str] = {
    # -- stale-r5 (the full 43-row tier)
    "ts_apdex": "stale-r5",
    "ts_autocorr_lag1": "stale-r5",
    "ts_burn_rate": "stale-r5",
    "ts_crosscorr": "stale-r5",
    "ts_cusum": "stale-r5",
    "ts_error_budget": "stale-r5",
    "ts_funnel": "stale-r5",
    "ts_gap_stats": "stale-r5",
    "ts_json_props": "stale-r5",
    "ts_lttb": "stale-r5",
    "ts_mad": "stale-r5",
    "ts_retention_cohorts": "stale-r5",
    "ts_seasonal_residual": "stale-r5",
    "ts_session_incidents": "stale-r5",
    "ts_time_weighted_avg": "stale-r5",
    "ts_value_quartiles": "stale-r5",
    "ts_weekday_profile": "stale-r5",
    "docs_bigram_lift": "stale-r5",
    "docs_bm25": "stale-r5",
    "docs_chunk_windows": "stale-r5",
    "docs_containment": "stale-r5",
    "docs_dup_cluster_stats": "stale-r5",
    "docs_edit_distance": "stale-r5",
    "docs_mixture_sample": "stale-r5",
    "docs_search_and": "stale-r5",
    "docs_source_quality": "stale-r5",
    "docs_tfidf_topterms": "stale-r5",
    "emb_centroids": "stale-r5",
    "emb_ivfpq_residual_topk": "stale-r5",
    "emb_norm_stats": "stale-r5",
    "emb_pca_project": "stale-r5",
    "emb_random_projection": "stale-r5",
    "emb_semdedup": "stale-r5",
    "tpch_q4ish": "stale-r5",
    "tpch_q7ish": "stale-r5",
    "tpch_q8ish": "stale-r5",
    "tpch_q12ish": "stale-r5",
    "tpch_q15ish": "stale-r5",
    "tpch_q16ish": "stale-r5",
    "tpch_q17ish": "stale-r5",
    "tpch_q18ish": "stale-r5",
    "tpch_q19ish": "stale-r5",
    "tpch_q22ish": "stale-r5",
    # -- r6-tier picks
    "flagship_minute_p99": "flagship",
    "media_frame_sample": "media-churn",
    "emb_hamming_topk": "sim-churn",
    "maint_retention": "maint-churn",
    "docs_kmv_sample": "sketch-churn",
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


def test_past_green_ignores_current_round_artifact(tmp_path):
    """Regression guard for the r5/r6 self-arming failure: a CORRECTNESS
    file for WINDOW_ROUND (or later) must NOT influence the green set.
    The simulation runs against a tmp COPY of the repo's artifacts — never
    the live working tree (ADVICE r7: a hard kill mid-test must not leave
    a forged driver artifact behind)."""
    import shutil

    for fname in os.listdir(_REPO):
        if re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname):
            shutil.copy(os.path.join(_REPO, fname), tmp_path / fname)
    before = _past_driver_green(str(tmp_path))
    assert before == _past_driver_green()  # the copy is faithful
    # Simulate the driver landing an all-green artifact for this round
    # (and a future one): the green set must not change.
    for rnd in (WINDOW_ROUND, WINDOW_ROUND + 1):
        fake = {
            name: {"rows_match": True, "schema_match": True, "hash_match": True}
            for name in q.REGISTRY
        }
        with open(tmp_path / f"CORRECTNESS_r{rnd:02d}.json", "w") as f:
            json.dump(fake, f)
    assert _past_driver_green(str(tmp_path)) == before


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
