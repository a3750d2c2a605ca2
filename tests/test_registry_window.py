"""The external driver's correctness gate checks only the FIRST 50 entries
of ``queries()`` (verified against CORRECTNESS_r03..r11: their keys were
exactly registry[:50]).  These tests pin the round-13 window composition:

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
behind on a hard kill).  Window rotation for r14 is a planning task (bump
WINDOW_ROUND, rewrite _DRIVER_WINDOW and RECHECK together; see
``scripts/check_parity.py --ages --before 14`` — the r10-green tier is
next, AND docs_containment MUST lead the r14 window: it is the one
r9-green row displaced from r13 to make room for the two maint routing
rows, so its gap is already 5 rounds).
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
WINDOW_ROUND = 13

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
# builder-side parity sweep.  Empty entering round 13.
WINDOW_EXCEPTIONS: dict[str, str] = {}


# Justification for every windowed slot that already has a green driver row.
# Keyed by query name → reason tag.  Reasons:
#   stale-r9          — last green row is CORRECTNESS_r09, four code
#                       rounds ago; the oldest coverage tier entering
#                       round 13 (VERDICT r12 item 3 names this set;
#                       docs_containment is the one r9 row displaced —
#                       its candidate-pair machinery is pinned in-window
#                       by docs_edit_distance and by the r12-green
#                       docs_dedup_eval — and must lead the r14 window).
#   serving-gate-r13  — maint_rollup_rate_routed is r12-green, but the
#                       serving gate every rollup route passes through
#                       (engine._serving_state) gained the completeness-
#                       covenant check this round; VERDICT r12 item 3
#                       demands ≥1 counter-routing row stay windowed
#                       while the rollup serving tier churns.
RECHECK: dict[str, str] = {
    "docs_bigram_lift": "stale-r9",
    "docs_bm25": "stale-r9",
    "docs_chunk_windows": "stale-r9",
    "docs_dup_cluster_stats": "stale-r9",
    "docs_edit_distance": "stale-r9",
    "docs_kmv_sample": "stale-r9",
    "docs_mixture_sample": "stale-r9",
    "docs_search_and": "stale-r9",
    "docs_source_quality": "stale-r9",
    "docs_tfidf_topterms": "stale-r9",
    "emb_centroids": "stale-r9",
    "emb_hamming_topk": "stale-r9",
    "emb_ivf_recall": "stale-r9",
    "emb_ivfpq_recall": "stale-r9",
    "emb_ivfpq_residual_topk": "stale-r9",
    "emb_norm_stats": "stale-r9",
    "emb_pca_project": "stale-r9",
    "emb_random_projection": "stale-r9",
    "emb_semdedup": "stale-r9",
    "maint_retention": "stale-r9",
    "media_frame_sample": "stale-r9",
    "tpch_q4ish": "stale-r9",
    "tpch_q7ish": "stale-r9",
    "tpch_q8ish": "stale-r9",
    "tpch_q12ish": "stale-r9",
    "tpch_q15ish": "stale-r9",
    "tpch_q16ish": "stale-r9",
    "tpch_q17ish": "stale-r9",
    "tpch_q18ish": "stale-r9",
    "tpch_q19ish": "stale-r9",
    "tpch_q22ish": "stale-r9",
    "ts_apdex": "stale-r9",
    "ts_autocorr_lag1": "stale-r9",
    "ts_burn_rate": "stale-r9",
    "ts_crosscorr": "stale-r9",
    "ts_cusum": "stale-r9",
    "ts_error_budget": "stale-r9",
    "ts_funnel": "stale-r9",
    "ts_gap_stats": "stale-r9",
    "ts_json_props": "stale-r9",
    "ts_lttb": "stale-r9",
    "ts_mad": "stale-r9",
    "ts_retention_cohorts": "stale-r9",
    "ts_seasonal_residual": "stale-r9",
    "ts_session_incidents": "stale-r9",
    "ts_time_weighted_avg": "stale-r9",
    "ts_value_quartiles": "stale-r9",
    "ts_weekday_profile": "stale-r9",
    "maint_rollup_rate_routed": "serving-gate-r13",
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
