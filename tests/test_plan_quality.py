"""Plan-quality audit over the headline registry queries: the 100 TB
contract is that filters and projections reach the parquet scan, small dims
broadcast, aggregates partial-aggregate map-side, and Python only appears
in plans that are supposed to contain it.

These tests pin the *shape* of the plan, not timings — a regression here
is a scale regression even if sf0.1 wall-clock looks fine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark import queries as q
from cardinalsin_spark.plans.inspect import (
    is_broadcast_join,
    plan_string,
    pushed_filters,
    scan_read_schema,
)


def _df(spark, sf_dir, name):
    return q.REGISTRY[name][0](spark, sf_dir)


def test_flagship_pushdown_and_partial_agg(spark, sf_dir):
    df = _df(spark, sf_dir, "flagship_minute_p99")
    plan = plan_string(df, "formatted")
    # the time-RANGE predicate (not just IsNotNull) must reach the scan:
    # it compares the raw int64 ns column, so parquet row-group stats prune
    pf = pushed_filters(df)
    assert any("GreaterThanOrEqual(ts" in f for f in pf), pf
    assert any("LessThan(ts" in f for f in pf), pf
    # partial (map-side) aggregation before the shuffle
    assert "partial_" in plan


def test_filter_range_scan_prunes_columns(spark, sf_dir):
    df = _df(spark, sf_dir, "ts_filter_range")
    cols = scan_read_schema(df)
    # a narrow projection must not drag the full events schema through I/O
    assert 0 < len(cols) <= 6, cols
    assert pushed_filters(df)


def test_promql_range_pushes_ns_bounds(spark, sf_dir):
    df = _df(spark, sf_dir, "promql_rate_range")
    pf = pushed_filters(df)
    assert any("GreaterThanOrEqual(ts" in f for f in pf), pf
    assert any("LessThan(ts" in f for f in pf), pf


def test_tpch_joins_broadcast_small_dims(spark, sf_dir):
    df = _df(spark, sf_dir, "tpch_q3ish")
    assert is_broadcast_join(df), plan_string(df, "simple")


def test_no_python_in_relational_paths(spark, sf_dir):
    """Time-series/relational/maintenance queries must stay JVM-side; only
    the explicitly-Python operators (vector scoring, media decode,
    remote-write parse) may plan Python evaluation."""
    jvm_only = [
        "flagship_minute_p99", "ts_bucket_avg", "ts_rate_faithful",
        "ts_latest_per_series", "ts_dedup_first", "promql_range_sum_by",
        "tpch_q1", "maint_downsample", "docs_exact_dedup", "docs_lang_id",
        "docs_minhash_pairs", "docs_simhash",
        # round-4 relational additions
        "docs_span_dedup", "maint_zorder_key", "ts_holt_winters",
        "promql_quantile_over_time", "promql_subquery_max_rate",
        "promql_absent_over_time",
        # late round-4: analytics / sketches / term stats / TPC-H widening
        "ts_funnel", "ts_retention_cohorts", "ts_json_props",
        "ts_moving_avg", "ts_time_weighted_avg", "ts_lttb", "ts_mad",
        "ts_burn_rate", "ts_cusum", "ts_session_incidents", "ts_topk_by",
        "tpch_q7ish", "tpch_q8ish", "tpch_q12ish", "tpch_q15ish",
        "tpch_q17ish", "tpch_q18ish", "tpch_q19ish", "tpch_q22ish",
        "promql_timestamp_hour", "promql_day_of_week",
        "promql_scalar_arith", "promql_present_over_time",
        "docs_chunk_windows", "docs_mixture_sample", "docs_search_and",
        "docs_edit_distance", "docs_source_quality", "docs_tfidf_topterms",
        "docs_bm25", "docs_hll_distinct", "docs_hll_overlap",
        "docs_cms_heavy_hitters",
        # round-5 additions (mad's collect_list/transform chain is JVM
        # higher-order functions, not Python)
        "ts_ewma", "tpch_q9ish", "tpch_q13ish", "tpch_q21ish",
        "promql_mad_over_time", "promql_at_pinned",
        # round-6 additions: @-pinned range is instant + broadcast grid
        # (emb_hamming_topk moved to the sanctioned Arrow-GEMM category in
        # r14: its 60-bit signature is a GEMM pandas_udf — vector scoring —
        # while the distance stays xor+popcount in codegen; see
        # test_hamming_signature_udf_matches_sql_expression)
        "promql_at_start", "promql_range_at_end",
        "promql_set_unless", "promql_set_or", "docs_kmv_sample", "promql_cmp_vector",
        "docs_temperature_mixture", "promql_scalar_fold",
        # emb_random_projection / emb_pca_project are deliberately Arrow
        # GEMM paths (vector scoring — the sanctioned Python category)
    ]
    for name in jvm_only:
        plan = plan_string(_df(spark, sf_dir, name), "simple")
        assert "Python" not in plan, f"{name} plans Python eval:\n{plan}"


def test_latest_per_series_single_shuffle_for_window(spark, sf_dir):
    """Per-series latest point should cost one shuffle for the window (plus
    AQE reads), not repeated exchanges of the same data."""
    df = _df(spark, sf_dir, "ts_latest_per_series")
    plan = plan_string(df, "simple")
    # window over series key then filter — no join, no extra aggregation
    assert "Window" in plan or "row_number" in plan
    assert plan.count("Exchange") <= 3, plan


def test_minhash_partition_widening(spark, sf_dir):
    """The shingle-hash stage must not run on 1-2 input partitions."""
    from cardinalsin_spark.operators.dedup_docs import minhash_signatures_df

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures_df(docs)
    assert "Exchange" in plan_string(sigs, "simple")  # repartition present


def test_media_features_scan_prunes_blob_metadata(spark, sf_dir):
    """image_features reads only the columns the UDF consumes."""
    from cardinalsin_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = mm.image_features(mm.documents_as_media(docs))
    cols = scan_read_schema(feats)
    assert "lang" not in cols and "source" not in cols, cols


def test_binary_ratio_broadcasts_and_pushes_both_sides(spark, sf_dir):
    """Vector matching must plan as a broadcast join of two pre-aggregated
    sides, each with metric + ns-range predicates at its own scan."""
    df = _df(spark, sf_dir, "promql_binary_ratio")
    assert is_broadcast_join(df), plan_string(df, "simple")
    plan = plan_string(df, "formatted")
    assert plan.count("EqualTo(event_type,purchase)") == 1
    assert plan.count("EqualTo(event_type,view)") == 1
    assert "partial_sum" in plan


def test_rollup_partial_aggregates(spark, sf_dir):
    plan = plan_string(_df(spark, sf_dir, "sql_rollup"), "formatted")
    assert "Expand" in plan  # grouping-sets expansion, not N scans
    # one scan feeds all rollup levels (simple form lists each node once)
    assert plan_string(_df(spark, sf_dir, "sql_rollup"), "simple").count(
        "FileScan parquet"
    ) == 1
    assert "partial_" in plan


def test_split_by_time_pushes_both_halves(spark, sf_dir):
    from cardinalsin_spark.sources.ingest import split_by_time
    from cardinalsin_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    before, after = split_by_time(ev, 1705000000 * 10**9)
    # the ts_ns predicate aliases back to the stored int64 `ts` column and
    # reaches the scan on both halves
    assert any(f.startswith("LessThan(ts") for f in pushed_filters(before))
    assert any(
        f.startswith("GreaterThanOrEqual(ts") for f in pushed_filters(after)
    )


def test_faithful_promql_single_window_shuffle(spark, sf_dir):
    """faithful rate through the transpiler: one window shuffle keyed on the
    series, one hash agg — no joins, no Python."""
    df = _df(spark, sf_dir, "promql_rate_faithful")
    plan = plan_string(df, "simple")
    assert "Python" not in plan
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_join_single_window_shuffle(spark, sf_dir):
    """The union+LOCF asof formulation must cost exactly ONE exchange (the
    window shuffle on the join key) — no join operator, no range-join
    candidate blowup, no Python."""
    df = _df(spark, sf_dir, "ts_asof_join")
    plan = plan_string(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan


def test_tpch_q5ish_all_joins_broadcast(spark, sf_dir):
    """Every dimension in the 6-table star join stays broadcast — a single
    SortMergeJoin here would be a 100 TB shuffle regression."""
    df = _df(spark, sf_dir, "tpch_q5ish")
    plan = plan_string(df, "simple")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 5, plan


def test_gapfill_grid_is_executor_side(spark, sf_dir):
    """The dense (series x bucket) grid must come from sequence+explode on
    executors (no collected bucket list, no Python), and the bucket
    aggregation must partial-aggregate map-side."""
    df = _df(spark, sf_dir, "ts_gapfill_locf")
    plan = plan_string(df, "formatted")
    assert "Generate explode" in plan or "Generate" in plan, plan
    assert "partial_" in plan
    assert "Python" not in plan


def test_bucketed_tables_join_without_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must hash/merge-join with ZERO
    Exchange operators — the co-located layout that replaces a full
    shuffle for recurring fact-to-fact joins at scale."""
    from cardinalsin_spark.sources.ingest import write_bucketed
    from cardinalsin_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            ev.select("user_id", "ts", "value"), "ev_a", ["user_id"], 8,
            sort_cols=["user_id"],
        )
        write_bucketed(
            ev.select(
                F.col("user_id"), F.col("value").alias("v2")
            ).groupBy("user_id").agg(F.sum("v2").alias("total")),
            "ev_b", ["user_id"], 8, sort_cols=["user_id"],
        )
        joined = spark.table("ev_a").join(spark.table("ev_b"), "user_id")
        plan = plan_string(joined, "simple")
        assert "Exchange" not in plan, plan
        assert joined.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS ev_a")
        spark.sql("DROP TABLE IF EXISTS ev_b")


def test_pii_scrub_stays_jvm_side(spark, sf_dir):
    """Regex PII scrub is pure regexp_extract_all/regexp_replace — no
    Python evaluation may appear in its plan."""
    plan = plan_string(_df(spark, sf_dir, "docs_pii_scrub"), "simple")
    assert "Python" not in plan, plan


def test_simhash_pairs_no_cartesian(spark, sf_dir):
    """The banded self-joins must plan as equi-joins on (band, value) keys
    — a CartesianProduct or BroadcastNestedLoopJoin here is the all-pairs
    explosion the banding exists to avoid."""
    plan = plan_string(_df(spark, sf_dir, "docs_simhash_pairs"), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_media_resize_prunes_blob_metadata(spark, sf_dir):
    """The resize path reads only what it needs from the documents scan —
    doc_id + text (the fake-decode source); the lang/source metadata
    columns must be pruned."""
    df = _df(spark, sf_dir, "media_resize")
    cols = scan_read_schema(df)
    assert "lang" not in cols and "source" not in cols, cols


def test_semi_anti_join_strategies(spark, sf_dir):
    """The q4/q16 shapes must plan LeftSemi / LeftAnti joins — a rewrite
    to inner-join+distinct would duplicate-then-dedup at scale."""
    p4 = plan_string(_df(spark, sf_dir, "tpch_q4ish"), "simple")
    assert "LeftSemi" in p4, p4
    p16 = plan_string(_df(spark, sf_dir, "tpch_q16ish"), "simple")
    assert "LeftAnti" in p16, p16


def test_q19_disjunction_stays_hash_join(spark, sf_dir):
    """q19's OR-of-ANDs is a residual on an equi-join — the planner must
    NOT degrade to a nested-loop/cartesian product, and the join must
    broadcast the part side."""
    df = _df(spark, sf_dir, "tpch_q19ish")
    plan = plan_string(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert is_broadcast_join(df), plan


def test_q7_both_nation_branches_broadcast(spark, sf_dir):
    """The same dimension joined twice (supplier-nation and customer-
    nation) must produce TWO independent broadcast branches."""
    plan = plan_string(_df(spark, sf_dir, "tpch_q7ish"), "simple")
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q22_scalar_subquery_broadcasts_not_collects(spark, sf_dir):
    """The global-average threshold must enter the plan as a broadcast
    1-row aggregate (a join), never via a driver collect — and the
    no-orders probe must stay LeftAnti."""
    df = _df(spark, sf_dir, "tpch_q22ish")
    plan = plan_string(df, "simple")
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_sketches_and_term_weights_stay_jvm_side(spark, sf_dir):
    """HLL register build, CMS counters, TF-IDF and BM25 are pure
    column-expression pipelines — no Python evaluation node may appear."""
    for name in (
        "docs_hll_distinct",
        "docs_cms_heavy_hitters",
        "docs_tfidf_topterms",
        "docs_bm25",
    ):
        plan = plan_string(_df(spark, sf_dir, name), "simple")
        assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan, (
            name,
            plan,
        )
        assert "BatchEvalPython" not in plan, (name, plan)


def test_cms_counter_joins_broadcast(spark, sf_dir):
    """The counter table (d·w = 192 cells) must broadcast onto the vocab
    probe — a shuffle join against constant-size sketch state would be
    backwards at 100 TB. Since r14 the d counter branches are ONE stacked
    (hash-row, bucket) aggregate joined once (guide §2.4: one broadcast
    build instead of three), so the pin is ≥1 broadcast join and NO
    shuffle join anywhere in the estimate path."""
    df = _df(spark, sf_dir, "docs_cms_heavy_hitters")
    plan = plan_string(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_scalar_arith_adds_no_join(spark, sf_dir):
    """`sum by (...) (m) / 100` folds the literal into the projection —
    the plan must contain NO join at all."""
    plan = plan_string(_df(spark, sf_dir, "promql_scalar_arith"), "simple")
    assert "Join" not in plan, plan


def test_funnel_windows_share_one_exchange(spark, sf_dir):
    """The four stacked funnel step-windows partition on the same user_id
    key — they must share ONE exchange; with the per-user dedup and the
    depth aggregate the whole plan stays within 3 exchanges."""
    df = _df(spark, sf_dir, "ts_funnel")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 4, plan
    assert plan.count("Exchange") <= 3, plan


def test_interval_overlap_join_is_binned_hash_join(spark, sf_dir):
    """The session×incident range join must execute as the binned
    EQUI-join — no nested-loop/cartesian node (what a raw inequality
    join would plan as)."""
    plan = plan_string(_df(spark, sf_dir, "ts_session_incidents"), "simple")
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_crossdup_has_no_gram_keyed_join(spark, sf_dir):
    """docs_crossdup must keep its skew-proof shape: the only join is the
    per-doc (n_grams ⟕ n_unique) merge on doc_id — no join keyed on the
    gram hash `sh`, where a boilerplate 8-gram would pile every matching
    row on one reducer. The gram-side work must be pure partial-aggregable
    groupBys (hot keys combine map-side)."""
    df = _df(spark, sf_dir, "docs_crossdup")
    plan = plan_string(df, "formatted")
    for line in plan.splitlines():
        if "Join" in line and "doc_id" not in line:
            assert "sh#" not in line, line
    # both gram aggregations partial-aggregate before their shuffle
    assert plan.count("partial_count") >= 2, plan


def test_contamination_salted_path_equivalent_and_salted(spark, sf_dir):
    """The opt-in salted fingerprint join must (a) actually salt — the join
    keys include the salt column, spreading a hot fp over n partitions —
    and (b) return exactly the unsalted results."""
    import os

    from cardinalsin_spark.functions.skew import SALT_COL
    from cardinalsin_spark.operators import sampling as smp
    from cardinalsin_spark.operators.dedup_docs import cross_split_contamination

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    label = smp.split_expr("doc_id")
    base = cross_split_contamination(docs, label).collect()
    salted_df = cross_split_contamination(docs, label, salt_n=8)
    assert SALT_COL in plan_string(salted_df, "formatted")
    assert salted_df.collect() == base


def test_q9ish_dims_broadcast_fact_never_shuffled_by_key(spark, sf_dir):
    """q9ish is a 5-way star: part/supplier/nation must broadcast so the
    lineitem fact reaches the year×nation aggregate without a single
    join-key shuffle (orders is the one allowed non-broadcast side)."""
    df = _df(spark, sf_dir, "tpch_q9ish")
    plan = plan_string(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "partial_" in plan_string(df, "formatted")


def test_q21ish_semi_and_anti_strategies(spark, sf_dir):
    """q21ish's decorrelated EXISTS/NOT EXISTS must plan as real LeftSemi
    and LeftAnti joins — not as aggregate-then-join rewrites that would
    materialize the full self-join."""
    df = _df(spark, sf_dir, "tpch_q21ish")
    plan = plan_string(df, "simple")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q13ish_left_outer_conserves_customers(spark, sf_dir):
    """The outer-join count must keep customers with no qualifying orders:
    the plan must retain a LeftOuter join (an inner rewrite would silently
    drop them — at sf0.001 every customer happens to have orders, so only
    the plan shape discriminates) and Σcustdist must equal the customer
    count exactly."""
    import os

    df = _df(spark, sf_dir, "tpch_q13ish")
    assert "LeftOuter" in plan_string(df, "simple")
    total = df.agg(F.sum("custdist")).first()[0]
    n_cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()
    assert total == n_cust


def test_ewma_single_window_shuffle(spark, sf_dir):
    """The K-lag EWMA stack must share ONE (event_type)-ordered window —
    a single Exchange, not one per lag."""
    df = _df(spark, sf_dir, "ts_ewma")
    plan = plan_string(df, "formatted")
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 1, plan
    assert plan.count("Window") <= 2, plan  # one window op (+header line)


def test_kmv_partial_group_limit_before_exchange(spark, sf_dir):
    """KMV bottom-k's rank filter must compile to the two-phase
    WindowGroupLimit: the PARTIAL phase runs map-side before the per-key
    window exchange, so each task ships at most k rows per key — the
    sketch's merge law realized by the optimizer (VERDICT r7 item 7)."""
    df = _df(spark, sf_dir, "docs_kmv_sample")
    plan = plan_string(df, "simple")
    assert "WindowGroupLimit" in plan, plan
    partial = plan.find("Partial")
    exchange = plan.find("Exchange hashpartitioning")
    assert partial != -1 and exchange != -1
    # physical plans print top-down: the Partial limit appears BELOW
    # (after) its exchange in the text, i.e. executes before it
    assert partial > exchange, plan


def test_range_fn_at_broadcasts_grid_not_vector(spark, sf_dir):
    """The @-pinned range function replicates its instant vector over the
    bucket grid via a BROADCAST of the (bounded, step-count-sized) grid —
    the distributed side must stay the vector; and the pinned time bounds
    must reach the scan as pushed filters."""
    df = _df(spark, sf_dir, "promql_range_fn_at")
    plan = plan_string(df, "formatted")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    pf = pushed_filters(df)
    assert any("GreaterThanOrEqual" in f for f in pf), pf
    assert any("LessThanOrEqual" in f or "LessThan" in f for f in pf), pf


def test_range_scalar_broadcasts_per_step_frame(spark, sf_dir):
    """Per-step scalar() joins the (one-row-per-step) scalar frame into
    the vector side on time_bucket as a BROADCAST hash join — the fold
    must never shuffle the vector side by time_bucket."""
    df = _df(spark, sf_dir, "promql_range_scalar")
    plan = plan_string(df, "formatted")
    assert "BroadcastHashJoin" in plan, plan


def test_derived_partsupp_tpch_plans(spark, sf_dir):
    """The derived-partsupp TPC-H shapes must keep their dims broadcast:
    q11/q20 fully broadcast-joined (the only hash exchanges are
    aggregations), q2's one sort-merge join is the per-part min re-join —
    per-part aggregates outgrow broadcast at scale, so SMJ is the
    correct shape there, but supplier/nation/region/part must never
    shuffle-join."""
    for name, max_smj in (("tpch_q2ish", 1), ("tpch_q11ish", 0), ("tpch_q20ish", 0)):
        df = _df(spark, sf_dir, name)
        plan = plan_string(df, "simple")
        assert plan.count("BroadcastHashJoin") >= 3, (name, plan)
        assert plan.count("SortMergeJoin") <= max_smj, (name, plan)


def test_bloom_semi_join_broadcasts_never_shuffles_fact_by_key(spark, sf_dir):
    """ts_bloom_join's contract: the fact table reaches its aggregate
    without ever shuffling on user_id for the JOIN — the bitmap probe and
    the verified key set both arrive as broadcasts. The only exchanges on
    the fact side are the aggregation's own."""
    p = plan_string(_df(spark, sf_dir, "ts_bloom_join"), "simple")
    assert "BroadcastHashJoin" in p, p
    # the final probe join is a broadcast LEFT-SEMI, not a shuffled one
    assert "LeftSemi, BuildRight" in p, p
    assert "SortMergeJoin" not in p, p
    # nothing in this plan may fall back to a nested-loop product
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_char_diversity_is_exchange_free(spark, sf_dir):
    """The letter-histogram diversity is 26 constant-width counters folded
    per row — a pure map: the plan must contain NO exchange and NO Python
    node (whole-stage codegen end to end)."""
    plan = plan_string(_df(spark, sf_dir, "docs_char_diversity"), "simple")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "ArrowEval" not in plan, plan


def test_zipf_ranks_partial_top_k_and_shared_scan(spark, sf_dir):
    """The global rank<=100 must compile to TakeOrderedAndProject (the
    distributed top-k with map-side partials — stronger than the
    WindowGroupLimit fallback), term counts must partial-aggregate, and
    at runtime AQE must REUSE the term-count shuffle between the top-100
    branch and the corpus-total branch — the corpus explode runs ONCE."""
    df = _df(spark, sf_dir, "docs_zipf_ranks")
    plan = plan_string(df, "formatted")
    assert "TakeOrderedAndProject" in plan, plan
    assert "partial_count" in plan, plan
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final


def test_winsorize_bounds_broadcast(spark, sf_dir):
    """The per-group p05/p95 bounds frame is group-count-sized: it must
    come back as a broadcast join, never a shuffled one."""
    df = _df(spark, sf_dir, "ts_winsorize")
    assert is_broadcast_join(df), plan_string(df, "simple")


def test_ohlc_windows_share_one_exchange(spark, sf_dir):
    """The asc/desc row_number orders partition on the same
    (day, event_type) key — ONE hash exchange feeds both sorts; the final
    aggregate reuses the partitioning (AQE), keeping the plan ≤ 2
    hash exchanges."""
    df = _df(spark, sf_dir, "ts_ohlc")
    plan = plan_string(df, "formatted")
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_pivot_is_single_aggregate(spark, sf_dir):
    """Pinned-category PIVOT must plan as one partial-aggregated hash
    aggregate — no hidden distinct scan over the category column, no
    join."""
    df = _df(spark, sf_dir, "sql_pivot")
    plan = plan_string(df, "formatted")
    assert "partial_" in plan
    assert "Join" not in plan, plan


def test_mmr_candidate_vectors_broadcast(spark, sf_dir):
    """MMR's vector fetch joins the ≤ |queries|·n_candidates id set back
    onto the corpus — it must be a broadcast hash join (the corpus never
    shuffles on vec_id); the greedy runs in exactly one
    FlatMapGroupsInPandas."""
    df = _df(spark, sf_dir, "emb_mmr_rerank")
    plan = plan_string(df, "simple")
    assert is_broadcast_join(df), plan
    assert plan.count("FlatMapGroupsInPandas") == 1, plan


def test_scene_change_prunes_doc_metadata(spark, sf_dir):
    """Scene change reads only the blob source + dims from the documents
    scan; lang/source must be pruned."""
    df = _df(spark, sf_dir, "media_scene_change")
    cols = scan_read_schema(df)
    assert "lang" not in cols and "source" not in cols, cols


def test_otlp_bucket_expansion_stays_jvm_side(spark):
    """The OTLP/JSON histogram-bucket expansion (posexplode + prefix-sum
    aggregate over the bucket arrays) must compile to pure JVM
    expressions — a Python eval node in an ingest path would cap 100 TB
    throughput at Arrow-transfer speed for no reason."""
    from cardinalsin_spark.sources.otlp import otlp_json_flatten

    payloads = spark.createDataFrame([("{}",)], "payload string")
    plan = plan_string(
        otlp_json_flatten(payloads, histogram_buckets=True), "formatted"
    )
    assert "EvalPython" not in plan, plan


def test_rollup_routed_scans_rollup_not_base(spark, sf_dir):
    """maint_rollup_routed must serve from the downsample rollup parquet
    — the whole point of continuous-aggregate routing.  The raw events
    scan appearing here would mean the router silently fell back (the
    query's pick() guard would normally raise first)."""
    df = _df(spark, sf_dir, "maint_rollup_routed")
    plan = plan_string(df, "formatted")
    assert "cardinalsin-rollup-" in plan, plan
    assert "events.parquet" not in plan, plan


def test_sql_door_rollup_scans_rollup_not_base(spark, sf_dir):
    """maint_rollup_sql_door (VERDICT r10 missing #3): the SQL-door
    routed aggregation must serve from the rollup parquet, never the
    reshaped metrics table (the query's route guard would normally raise
    first, this pins the plan itself)."""
    df = _df(spark, sf_dir, "maint_rollup_sql_door")
    plan = plan_string(df, "formatted")
    assert "cardinalsin-sqldoor-" in plan and "/rollup" in plan, plan
    assert "/metrics" not in plan, plan
    assert "events.parquet" not in plan, plan


def test_rate_routed_scans_rollup_not_base(spark, sf_dir):
    """maint_rollup_rate_routed (VERDICT r11 item 1): FAITHFUL
    rate/increase must serve from the rollup's counter moments, never
    the reshaped metrics table or raw events (the query's route guard
    would normally raise first, this pins the plan itself)."""
    df = _df(spark, sf_dir, "maint_rollup_rate_routed")
    plan = plan_string(df, "formatted")
    assert "cardinalsin-sqldoor-" in plan and "/rollup" in plan, plan
    assert "/metrics" not in plan, plan
    assert "events.parquet" not in plan, plan


def test_ann_recall_joins_broadcast_topk_frames(spark, sf_dir):
    """Recall measurement joins two k·|queries|-row result frames — the
    approximate side must broadcast so recall never costs a shuffle of
    anything corpus-sized."""
    df = _df(spark, sf_dir, "emb_ivf_recall")
    assert is_broadcast_join(df), plan_string(df, "formatted")


def test_range_histogram_quantile_single_shuffle_per_window_chain(spark):
    """The range-grid quantile is two stacked windows + a filter on the
    same (step, series) key: one Exchange for the aggregation and one for
    the window chain — no Python, no extra shuffles."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols

    rows = [
        Row(
            timestamp=dt.datetime(2024, 1, 1, 0, 0, 0),
            metric_name="lat_bucket",
            le=le,
            value=float(c),
        )
        for le, c in zip(["0.1", "0.2", "+Inf"], [10, 18, 20])
    ]
    df = spark.createDataFrame(rows)
    out = promql_range(
        df, "histogram_quantile(0.9, lat_bucket)",
        1704067200.0, 1704067260.0, 60, MetricsCols(),
    )
    plan = plan_string(out, "formatted")
    assert "EvalPython" not in plan, plan
    import re as _re

    # formatted output lists each node once in the tree and once in the
    # detail section — count detail headers (one per physical node)
    n_exchanges = len(_re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 3, plan  # agg + window chain + final sort


def test_range_topk_partial_group_limit(spark):
    """Per-step topk must pre-reduce map-side: the rank<=k filter
    compiles to a two-phase WindowGroupLimit, so each task ships at most
    k rows per (step, series) into the window exchange."""
    import datetime as dt

    from pyspark.sql import Row

    from cardinalsin_spark.operators.promql import promql_range
    from cardinalsin_spark.operators.timeseries import MetricsCols

    rows = [
        Row(
            timestamp=dt.datetime(2024, 1, 1, 0, 0, 0),
            metric_name="m",
            svc=s,
            value=float(i),
        )
        for i, s in enumerate("abcd")
    ]
    out = promql_range(
        spark.createDataFrame(rows),
        "topk by (svc) (2, m)",
        1704067200.0, 1704067260.0, 60, MetricsCols(),
    )
    plan = plan_string(out, "formatted")
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan, plan  # the map-side phase below the exchange


def test_sketch_routed_scans_sketch_not_metrics(spark, sf_dir):
    """maint_sketch_quantile_routed (VERDICT r12 item 2): the SERVING arm
    must read the quantile-sketch parquet, never the reshaped metrics
    table (the query's inputFiles guard would normally raise first, this
    pins the plan itself). events.parquet legitimately appears — the
    EXACT arm is the evaluation harness, not the serving path."""
    df = _df(spark, sf_dir, "maint_sketch_quantile_routed")
    plan = plan_string(df, "formatted")
    assert "cardinalsin-qsketch-" in plan, plan
    assert "/metrics" not in plan, plan


def test_sql_sketch_door_one_window_sketch_only(spark, sf_dir):
    """SQL-door quantile routing (VERDICT r12 item 5): a two-quantile
    approx_percentile query over an aligned time_bucket grid must (a)
    scan ONLY the sketch parquet and (b) answer BOTH quantiles from ONE
    rank-walk window over the re-bucketed slot counts — a second Window
    (or a raw metrics scan) is a scale regression at 100 TB dashboards."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.queries import _sketch_fixture, _sql_door_fixture

    mpath, _ = _sql_door_fixture(spark, sf_dir)
    spath = _sketch_fixture(spark, sf_dir)
    eng = CardinalSin(spark, mpath)
    eng.attach_quantile_sketch(spath, 21600, alpha=0.01, subsecond=True)
    out = eng.sql(
        "SELECT time_bucket(timestamp, 86400) AS tb, metric_name, "
        "approx_percentile(value, 0.5) AS p50, "
        "approx_percentile(value, 0.9) AS p90 FROM metrics "
        "WHERE timestamp >= timestamp_micros(1704067200000000) "
        "AND timestamp <= timestamp_micros(1705276799999999) "
        "GROUP BY tb, metric_name ORDER BY tb, metric_name"
    )
    plan = plan_string(out, "formatted")
    assert "cardinalsin-qsketch-" in plan, plan
    assert "/metrics" not in plan and "events.parquet" not in plan, plan
    # the simple tree prints each physical node once — ONE rank-walk
    # pass answers both quantiles: Spark splits the running cumsum and
    # the whole-partition total into two Window nodes, but they share
    # the same partitioning + sort (no exchange between them), so the
    # whole route is two rollup-sized hash shuffles (slot re-bucket,
    # rank-walk partition) + the final ORDER BY range exchange
    simple = plan_string(out, "simple")
    assert simple.count("Window") == 2, simple
    assert simple.count("Exchange hashpartitioning") == 2, simple
    first = simple.index("Window")
    between = simple[first:simple.index("Window", first + 1)]
    assert "Exchange" not in between, simple  # the pair shares one shuffle


def test_promql_approx_quantile_door_sketch_only_one_rank_walk(spark, sf_dir):
    """PromQL opt-in approximate quantile serving (VERDICT r13 item 2):
    a quantile_over_time grid with approx_quantile_alpha must (a) scan
    ONLY the attached sketch parquet — never the metrics reshape — and
    (b) answer through the same single rank-walk shape the SQL door
    pins: two Window nodes (running cumsum + whole-partition total)
    sharing one hash shuffle, so the whole route is two rollup-sized
    exchanges plus the final ORDER BY. A raw scan or an extra exchange
    here is a 100 TB dashboard regression."""
    from cardinalsin_spark.engine import CardinalSin
    from cardinalsin_spark.queries import _sketch_fixture, _sql_door_fixture

    mpath, _ = _sql_door_fixture(spark, sf_dir)
    spath = _sketch_fixture(spark, sf_dir)
    eng = CardinalSin(spark, mpath)
    eng.attach_quantile_sketch(spath, 21600, alpha=0.01, subsecond=True)
    out = eng.promql_range(
        'quantile_over_time(0.95, {__name__=~".+"}[86400s])',
        1704067200, 1705276799.999999, 86400, approx_quantile_alpha=0.01,
    )
    assert eng.last_quantile_route["routed"] is True
    plan = plan_string(out, "formatted")
    assert "cardinalsin-qsketch-" in plan, plan
    assert "/metrics" not in plan and "events.parquet" not in plan, plan
    simple = plan_string(out, "simple")
    assert simple.count("Window") == 2, simple
    first = simple.index("Window")
    between = simple[first:simple.index("Window", first + 1)]
    assert "Exchange" not in between, simple  # the pair shares one shuffle
